package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** put/get/get-versions/delete/ls roundtrip — the SDFS capability surface
  * (server/sdfs.go) on a local filesystem URI. */
class VersionedStoreSpec extends SparkSpec {

  test("put auto-increments versions; get reads the newest") {
    import spark.implicits._
    val store = VersionedStore(Files.createTempDirectory("vs").toString)
    store.put(spark, "t", Seq(1, 2).toDF("x")) shouldBe 0L
    store.put(spark, "t", Seq(3).toDF("x")) shouldBe 1L
    store.get(spark, "t").collect().map(_.getInt(0)).toSeq shouldBe Seq(3)
  }

  test("getVersions returns the newest n, version-tagged, clamped") {
    import spark.implicits._
    val store = VersionedStore(Files.createTempDirectory("vs").toString)
    (0 until 3).foreach(i => store.put(spark, "t", Seq(i).toDF("x")))
    val two = store.getVersions(spark, "t", 2)
    two.select("version").distinct().collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L)
    // n larger than history: clamp to all versions (sdfs.go:316-318)
    store.getVersions(spark, "t", 99).select("version").distinct().count() shouldBe 3
  }

  test("putVersion is idempotent per version (replayed batch overwrites)") {
    import spark.implicits._
    val store = VersionedStore(Files.createTempDirectory("vs").toString)
    store.putVersion("t", 7, Seq(1).toDF("x"))
    store.putVersion("t", 7, Seq(2).toDF("x"))
    store.versions(spark, "t") shouldBe Seq(7L)
    store.get(spark, "t").collect().map(_.getInt(0)).toSeq shouldBe Seq(2)
  }

  test("ls lists datasets; delete removes all versions") {
    import spark.implicits._
    val store = VersionedStore(Files.createTempDirectory("vs").toString)
    store.put(spark, "a", Seq(1).toDF("x"))
    store.put(spark, "b", Seq(1).toDF("x"))
    store.ls(spark) shouldBe Seq("a", "b")
    store.delete(spark, "a") shouldBe true
    store.ls(spark) shouldBe Seq("b")
    store.versions(spark, "a") shouldBe empty
  }
}
