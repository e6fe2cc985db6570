package graft

import java.nio.file.Files

/** Operational streaming semantics a 100 TB pipeline leans on but
  * rarely tests: (1) the static side of a stream-static join is
  * re-read every micro-batch, so dimension updates apply to the NEXT
  * batch without restarting the query; (2) the parquet file sink's
  * _spark_metadata commit log makes uncommitted/orphan files invisible
  * to batch readers — partial output from a crashed executor can
  * never be double-counted downstream. */
class StreamSemanticsSpec extends SparkSpec {

  test("stream-static join re-reads the dimension between AvailableNow runs") {
    import spark.implicits._
    val src = Files.createTempDirectory("ssj_src").toString
    val dim = Files.createTempDirectory("ssj_dim").toString
    val ckpt = Files.createTempDirectory("ssj_ckpt").toString
    Seq((1L, "v1")).toDF("k", "label").write.mode("overwrite").parquet(dim)

    def run(): Seq[(Long, String)] = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val q = spark.readStream.schema(schema).option("header", "true").csv(src)
        .join(spark.read.parquet(dim), "k")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("k", "label").as[(Long, String)].collect()
          out.synchronized { out ++= rows }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
      out.toSeq
    }

    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"), "k\n1\n")
    assert(run() == Seq((1L, "v1")))
    // dimension UPDATE between runs — the next batch must see v2
    Seq((1L, "v2")).toDF("k", "label").write.mode("overwrite").parquet(dim)
    Files.writeString(java.nio.file.Path.of(s"$src/b2.csv"), "k\n1\n")
    assert(run() == Seq((1L, "v2")),
      "static side must be re-read per run, not frozen at query start")
  }

  test("file-sink commit log hides orphan files from batch readers") {
    import spark.implicits._
    val src = Files.createTempDirectory("sink_src").toString
    val out = Files.createTempDirectory("sink_out").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    Files.writeString(java.nio.file.Path.of(s"$src/b1.csv"), "k\n1\n2\n3\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
    val q = spark.readStream.schema(schema).option("header", "true").csv(src)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000))
    assert(spark.read.parquet(out).count() == 3)

    // simulate a crashed task's orphan: a valid parquet file dropped
    // into the sink dir WITHOUT a commit-log entry
    Seq(99L, 100L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/__orphan_tmp")
    val part = new java.io.File(s"$out/__orphan_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Path.of(s"$out/part-orphan.snappy.parquet"))

    // the _spark_metadata log governs the batch read: still 3 rows
    assert(spark.read.parquet(out).count() == 3,
      "uncommitted file must be invisible through the sink's commit log")
  }
}
