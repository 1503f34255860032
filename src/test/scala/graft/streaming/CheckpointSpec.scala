package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.sources.VersionedStore

/** Exactly-once across restart: the rebuild's answer to the reference's
  * kill-a-VM fault injection (cs425_mp4.pdf Fig. 2B). Crane replays
  * un-acked tuples and can double-count (at-least-once); a restarted
  * Structured Streaming query resumes from checkpointed offsets + state,
  * so counts over the union of inputs are exact. */
class CheckpointSpec extends SparkSpec {

  private def writeFile(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = Files.createTempFile("stage", ".txt")
    Files.write(tmp, String.join("\n", lines: _*).getBytes)
    // atomic move in so the file source never sees a partial file
    Files.move(tmp, dir.resolve(name))
  }

  test("wordCount counts survive stop + restart without double counting") {
    val root = Files.createTempDirectory("ckpt")
    val inDir = Files.createDirectory(root.resolve("in"))
    val store = VersionedStore(root.resolve("store").toString)
    val ckpt = root.resolve("ckpt").toString

    def start() = CraneStream.start(
      CraneStream.fileLines(spark, inDir.toString), "wordCount", store,
      checkpointDir = ckpt, k = 10, period = "0 seconds")

    writeFile(inDir, "part1.txt", Seq("a a b", "c"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // "failure": the query is gone; new data arrives while it is down
    writeFile(inDir, "part2.txt", Seq("a b b", "c c"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val counts = store.get(spark, "wordCount_result").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact totals over part1 ∪ part2 — part1 NOT re-counted
      counts shouldBe Map("a" -> 3L, "b" -> 3L, "c" -> 3L)
    } finally q2.stop()
  }

  test("bounded top-K (mapGroupsWithState) resumes exactly across stop + restart") {
    // the kill-and-restart assertion for the third state/output mode
    // (CraneStream.startTopKBounded): per-key counts live in
    // mapGroupsWithState, the sink holds a K-row snapshot. After a
    // mid-stream stop, the restarted query must restore the keyed state
    // — if it were lost, the monotone-merge argument breaks and the
    // resumed counts undercount part1.
    val root = Files.createTempDirectory("ckpt2")
    val inDir = Files.createDirectory(root.resolve("in"))
    val store = VersionedStore(root.resolve("store").toString)
    val ckpt = root.resolve("ckpt").toString

    def start() = CraneStream.startTopKBounded(
      CraneStream.fileLines(spark, inDir.toString), "wordCount", store,
      checkpointDir = ckpt, k = 2, period = "0 seconds")

    writeFile(inDir, "part1.txt", Seq("a a b", "c a"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    writeFile(inDir, "part2.txt", Seq("b b b c", "c c"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val snap = store.get(spark, "wordCount_topk").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact totals a=3 b=4 c=4 over part1 ∪ part2; the bounded
      // snapshot holds exactly the top-2 (count desc, key asc), with
      // 'a' correctly evicted by the newly-risen keys
      snap shouldBe Map("b" -> 4L, "c" -> 4L)
    } finally q2.stop()
  }
}
