package graft.core

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Testdata-flavor guard (VERDICT r5 item 2).
  *
  * The driver has regenerated events.parquet with different parquet
  * timestamp encodings across rounds — INT64 TIMESTAMP(NANOS) (read as
  * LongType under spark.sql.legacy.parquet.nanosAsLong=true), INT64 micros
  * with isAdjustedToUTC=false (read as TIMESTAMP_NTZ), and UTC micros
  * (TimestampType). Round 5 broke 5 queries and 3 suites because the
  * loader silently assumed one flavor. This spec writes the same instants
  * in all three flavors and asserts Tables.events always yields a
  * TimestampType `ts` with identical values — it fails if the loader
  * normalization is ever removed.
  */
class TablesSpec extends SparkSpec {

  // instants chosen to exercise the nanos-truncation edge: the second one
  // has nanos just under a microsecond boundary (truncate, don't round)
  private val microsUtc = Seq(
    1704067200000000L,          // 2024-01-01 00:00:00
    1704067201123456L,          // 00:00:01.123456
    1704153599999999L)          // 2024-01-01 23:59:59.999999

  private def writeFlavor(flavor: String): String = {
    val dir = Files.createTempDirectory(s"tables_$flavor").toString
    val s = spark
    import s.implicits._
    val ids = microsUtc.indices.map(_.toLong)
    val df = flavor match {
      case "nanos_long" =>
        // what the vectorized reader yields for INT64 TIMESTAMP(NANOS)
        // under nanosAsLong=true: a plain Long column of nanos (+999 ns
        // below the next micro — must truncate away, not round up)
        ids.zip(microsUtc.map(_ * 1000L + 999L)).toDF("event_id", "ts")
      case "micros_ntz" =>
        val rows = ids.zip(microsUtc).map { case (i, us) =>
          Row(i, LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1),
          StructType(Seq(StructField("event_id", LongType),
            StructField("ts", TimestampNTZType))))
      case "micros_utc" =>
        ids.zip(microsUtc).toDF("event_id", "us")
          .select($"event_id", timestamp_micros($"us").as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events normalizes all three parquet flavors to TimestampType") {
    // compare via unix_micros, not java.sql.Timestamp equality, so the
    // check is exact at microsecond resolution
    val perFlavor = Seq("nanos_long", "micros_ntz", "micros_utc").map { f =>
      val dir = writeFlavor(f)
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"flavor $f: ts resolved to ${df.schema("ts").dataType}")
      val got = df.orderBy("event_id")
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      f -> got
    }
    perFlavor.foreach { case (f, got) =>
      assert(got == microsUtc, s"flavor $f: micros $got != $microsUtc")
    }
  }

  test("the real testdata events table resolves ts to TimestampType") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    // and it is actually usable by the round-5 casualties' key expression
    df.select(unix_micros(col("ts"))).limit(1).collect()
  }
}
