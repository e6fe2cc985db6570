package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The driver's events.parquet has shipped `ts` in a different parquet
  * encoding twice already (INT64 TIMESTAMP(NANOS) in rounds ≤6, then
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ in round
  * 7, which silently killed every `unix_micros`/watermark consumer).
  * `Fx.eventTs` is the single normalization point; this spec writes
  * the SAME instants in all three flavors and pins that every flavor
  * loads through `Tables.events` as identical TimestampType micros —
  * so a third encoding change costs one new case in one function.
  */
class EventTsSpec extends SparkSpec {
  import spark.implicits._

  // instants with sub-second micros; the nanos flavor adds sub-µs
  // noise that ns→µs truncation (DuckDB-identical) must drop
  private val micros = Seq(1700000000123456L, 1700003600999999L, 0L)

  private def writeFixture(dir: java.nio.file.Path, flavor: String): String = {
    val base = micros.toDF("us")
    val df = flavor match {
      case "long-nanos" => base.select(($"us" * 1000L + 789L).as("ts"))
      case "ntz" => base.select(
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      case "timestamp" => base.select(timestamp_micros($"us").as("ts"))
    }
    df.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def loadedMicros(df: DataFrame): Seq[Long] =
    df.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted

  for (flavor <- Seq("long-nanos", "ntz", "timestamp")) {
    test(s"Tables.events normalizes the $flavor parquet encoding to TimestampType") {
      val dir = java.nio.file.Files.createTempDirectory(s"evts-$flavor")
      val d = writeFixture(dir, flavor)
      val events = Tables.events(spark, d)
      assert(events.schema("ts").dataType === TimestampType)
      assert(loadedMicros(events) === micros.sorted)
      // the round-7 regression shape: watermark + unix_micros must
      // analyze (watermark is a no-op on batch, but it type-checks)
      assert(events.withWatermark("ts", "1 hour")
        .select(unix_micros($"ts")).count() === micros.size)
    }
  }

  test("Fx.eventTs fails loudly on an unknown fourth encoding") {
    val bad = micros.toDF("us").select(($"us" / 1e6).as("ts"))
    val e = intercept[IllegalArgumentException](Fx.eventTs(bad))
    assert(e.getMessage.contains("unsupported type"))
  }
}
