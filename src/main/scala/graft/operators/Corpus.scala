package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Corpus-preparation operators for the training-data pipeline: fixed-size
  * token chunking (the step that turns documents into model-ready windows)
  * and TF-IDF term scoring (the classic quality/relevance signal).
  *
  * Both are pure Column-function plans — tokenization happens once per
  * row inside whole-stage codegen, rows fan out via explode, and every
  * aggregation is map-side partial. Nothing here holds per-document state
  * outside the row, so the operators scale with partition count.
  */
object Corpus {

  /** Split each document into overlapping windows of `chunkTokens`
    * whitespace tokens, stepping by `chunkTokens - overlap` (the standard
    * sliding-window chunker for LLM context preparation). Every document
    * produces at least one chunk (the tail chunk may be short); documents
    * with no tokens produce none.
    *
    * Output: (id, chunk_id, chunk_text, n_tokens), totally ordered.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame =
    chunkUnordered(docs, idCol, textCol, chunkTokens, overlap)
      .orderBy(col(idCol), col("chunk_id"))

  /** `chunk` without the final total order — for consumers that reshuffle
    * anyway (e.g. passage dedup keys by fingerprint next), where the sort's
    * range-partition exchange would be pure wasted shuffle. */
  def chunkUnordered(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), TF.tokens(col(textCol)).as("toks"))
      .withColumn("ntok", size(col("toks")).cast("long"))
      .filter(col("ntok") > 0)
      // ceil((ntok - overlap) / stride) starts, minimum 1 — integer
      // arithmetic so engines can't disagree on the boundary
      .withColumn("n_chunks", greatest(lit(1L),
        expr(s"(ntok - $overlap + ${stride - 1}) DIV $stride")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens.toLong), col("ntok") - col("chunk_id") * stride)
          .as("n_tokens"))
  }

  /** Concat-and-cut sequence packing: rows (documents or chunks) are laid
    * end-to-end in a deterministic order within each `groupCol` partition
    * and cut into bins of `contextTokens` — each row lands in the bin
    * holding its first token. This is the packing pretraining pipelines
    * actually use (concatenate, then split at the context length), and
    * unlike greedy first-fit it is a pure window cumsum: parallel across
    * groups, one sort per group, no sequential bin state.
    *
    * Returns the input with a `bin` column appended. */
  def pack(rows: DataFrame, groupCol: String, orderCols: Seq[String],
           tokenCol: String, contextTokens: Int): DataFrame = {
    require(contextTokens > 0, "contextTokens must be positive")
    require(orderCols.nonEmpty, "need a deterministic order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Long.MinValue, -1)
    rows
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum_before DIV $contextTokens"))
      .drop("__cum_before")
  }

  /** Deterministic shard assignment for training-data export: shard =
    * (first 16 bits of md5(key || salt)) mod nShards. Stateless and
    * layout-independent — no global sort or row_number barrier, so a
    * write partitioned by this column produces identical shards on any
    * cluster size, and re-runs are reproducible (the property a training
    * job needs to resume mid-corpus). Balanced in expectation like any
    * hash partitioner; 16 bits of entropy caps nShards at 65536.
    */
  def shardExpr(key: org.apache.spark.sql.Column, nShards: Int,
                salt: String = "graft"): org.apache.spark.sql.Column = {
    require(nShards > 0 && nShards <= 65536, s"nShards out of range: $nShards")
    (conv(substring(md5(concat(key.cast("string"), lit(salt))
      .cast("binary")), 1, 4), 16, 10).cast("long") % nShards).cast("int")
  }

  /** Deterministic global training-order shuffle: every doc gets a
    * position 1..N under the order md5(seed:id) — reproducible across
    * engines, runs, and physical layouts (the property a training job
    * needs to resume or re-shard mid-epoch), and changing the seed
    * re-shuffles without touching the data.
    *
    * Global enumeration WITHOUT a global window: a single row_number over
    * the full order would drag the corpus into one partition. Instead the
    * hex key's first byte splits the order into 256 contiguous ranges;
    * positions are per-range row_numbers plus broadcast range offsets (a
    * 256-row aggregate — the only driver-scale state). The expensive part
    * is one hash-partitioned window per range, exactly a distributed
    * sort's shape. */
  def shuffleOrder(docs: DataFrame, idCol: String, seed: Long): DataFrame = {
    val tiny = org.apache.spark.sql.expressions.Window
      .orderBy("bkt").rowsBetween(Long.MinValue, -1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bkt").orderBy(col("skey"), col(idCol))
    val keyed = docs.select(col(idCol),
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))
          .cast("binary")).as("skey"))
      .withColumn("bkt", substring(col("skey"), 1, 2))
    val offs = keyed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(tiny), lit(0L)))
      .select("bkt", "off")
    keyed.join(broadcast(offs), "bkt")
      .withColumn("pos", (col("off") + row_number().over(w)).cast("long"))
      .select("pos", idCol, "skey")
      .orderBy("pos")
  }

  /** Frequency-ranked vocabulary: (token_id, term, ctf) with contiguous
    * ids assigned by corpus term frequency (descending, term ascending on
    * ties — a total, engine-portable order). Ids start at 1; 0 is reserved
    * for out-of-vocabulary tokens in `encode`.
    *
    * The corpus-wide term count is a partial-aggregated groupBy (shuffle
    * volume = distinct terms, not token instances). The id assignment is a
    * global row_number — deliberately: contiguous ids REQUIRE a total
    * order, and the sort runs over the post-min-count VOCABULARY (at most
    * a few million rows for real corpora), never over the corpus. */
  def vocab(docs: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ctf").desc, col("term").asc)
    docs
      .select(explode(TF.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("ctf"))
      .filter(col("ctf") >= minCount)
      .withColumn("token_id", row_number().over(w).cast("long"))
      .select("token_id", "term", "ctf")
      .orderBy("token_id")
  }

  /** Encode each document as its token-id sequence under `vocabDf` (the
    * output of `vocab`): (id, n_tokens, n_oov, ids) where `ids` is the
    * space-joined id string in document order and OOV tokens map to 0.
    *
    * With `broadcastVocab` (the default) the vocabulary joins BROADCAST
    * onto the exploded (doc, pos, term) stream — no shuffle of the corpus
    * for the lookup; the only shuffle is the per-document reassembly,
    * carrying (id, pos, token_id) triples (~16 bytes/token) rather than
    * text. `vocab()` can reach millions of rows on a real corpus, where a
    * forced broadcast blows the driver/executor broadcast limit — pass
    * broadcastVocab = false there and the lookup becomes a plain shuffle
    * hash join on `term` (AQE still downgrades to broadcast at runtime if
    * the vocabulary turns out small). Documents with zero tokens produce
    * no row, matching `chunk`. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabDf: DataFrame, broadcastVocab: Boolean = true): DataFrame = {
    val v = vocabDf.select("term", "token_id")
    docs
      .select(col(idCol),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos", "term")))
      .join(if (broadcastVocab) broadcast(v) else v, Seq("term"), "left")
      .withColumn("tid", coalesce(col("token_id"), lit(0L)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          x => x.getField("tid").cast("string")), " ").as("ids"))
      .orderBy(idCol)
  }

  /** TF-IDF term scores: term frequency per document, document frequency
    * per term, score = tf * ln(N / df), rounded to 6 places.
    *
    * The corpus size N reaches every row via a broadcast of the 1-row
    * count aggregate (no driver-side action); df comes from a second
    * partial-aggregated pass over the distinct (doc, term) pairs. Shuffle
    * volume is bounded by distinct pairs, never raw token instances.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc_id"),
        explode(TF.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    pairs.join(docFreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "term")
  }
}
