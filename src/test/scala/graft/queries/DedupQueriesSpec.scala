package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** The winnowing guarantee (Schleimer et al. 2003): with k = 5, w = 4,
  * any shared token run of length >= w + k - 1 = 8 leaves at least one
  * shared fingerprint — and a run well past the guarantee length must
  * clear the query's shared_fps >= 2 reporting threshold. Constructed
  * corpus: docs 0 and 1 embed the same 20-token run inside otherwise
  * disjoint text; doc 2 shares nothing and must be absent.
  */
class DedupQueriesSpec extends SparkSpec {

  test("dedup_winnowing catches the long shared run and nothing else") {
    val s = spark
    import s.implicits._
    val shared = (1 to 20).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha beta gamma $shared delta epsilon zeta"),
      (1L, s"one two three four five $shared six seven eight"),
      (2L, "completely different text with nothing in common at all " +
        "more unrelated words continue here for quite a while longer"))
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("winnow").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = DedupQueries.defs("dedup_winnowing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((0L, 1L))
  }
}
