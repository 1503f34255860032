package graft.core

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** core.Memo: the session-scoped materialization the dedup/ANN families
  * lean on. The contract under test: one build per (session, key),
  * result identity with the un-memoized plan, and key isolation.
  */
class MemoSpec extends SparkSpec {

  test("builds once per key and returns identical rows") {
    val builds = new AtomicInteger(0)
    def make() = Memo.dataFrame(spark, "memospec:k1") {
      builds.incrementAndGet()
      Tables.documents(spark, sfDir)
        .groupBy("source").agg(count(lit(1)).as("n"))
    }
    val a = make()
    val b = make()
    builds.get() shouldBe 1
    val fresh = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted
    a.collect().map(_.toString).sorted shouldBe fresh
    b.collect().map(_.toString).sorted shouldBe fresh
  }

  test("different keys build independently") {
    val builds = new AtomicInteger(0)
    def make(key: String, src: String) =
      Memo.dataFrame(spark, s"memospec:$key") {
        builds.incrementAndGet()
        Tables.documents(spark, sfDir).filter(col("source") === src)
          .select("doc_id")
      }
    val s0 = make("a", "src_0").count()
    val s1 = make("b", "src_1").count()
    builds.get() shouldBe 2
    // and re-requesting either does not rebuild
    make("a", "src_0").count() shouldBe s0
    make("b", "src_1").count() shouldBe s1
    builds.get() shouldBe 2
  }

  test("once() runs its body a single time per key") {
    val runs = new AtomicInteger(0)
    Memo.once(spark, "memospec:once")(runs.incrementAndGet())
    Memo.once(spark, "memospec:once")(runs.incrementAndGet())
    runs.get() shouldBe 1
    Memo.once(spark, "memospec:once2")(runs.incrementAndGet())
    runs.get() shouldBe 2
  }

  test("LRU eviction bounds live entries and rebuilds after eviction") {
    val builds = new AtomicInteger(0)
    def make(i: Int) = Memo.dataFrame(spark, s"memospec:evict:$i") {
      builds.incrementAndGet()
      Tables.documents(spark, sfDir).select("doc_id").limit(1)
    }
    // overflow the cap: entry 0 must age out
    (0 to Memo.MaxEntries).foreach(make)
    Memo.liveEntries should be <= Memo.MaxEntries
    val before = builds.get()
    make(Memo.MaxEntries).count() // newest: still cached, no rebuild
    builds.get() shouldBe before
    make(0).count() // oldest: evicted, rebuilds and still answers
    builds.get() shouldBe before + 1
  }

  test("memoized dedup pair relation equals the un-memoized operator") {
    // the real consumer path: the registry's memoized Jaccard pairs must
    // be row-identical to a fresh end-to-end run of the operator
    val docs = Tables.documents(spark, sfDir)
    val fresh = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(_.toString).sorted
    val viaRegistry = graft.queries.DedupQueries
      .defs("dedup_ngram_jaccard")(spark, sfDir)
      .collect().map(_.toString).sorted
    viaRegistry shouldBe fresh
  }
}
