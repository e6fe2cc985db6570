package graft

import graft.sources.DeletionVectors
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: positional deletes subtract on
  * read via a broadcast anti-join; data files are never rewritten. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String): Unit =
    (1L to 100L).map(i => (i, s"row$i", i % 7))
      .toDF("id", "payload", "grp")
      .repartition(4, $"id")
      .write.mode("overwrite").parquet(dir)

  private def dataFiles(dir: String): Map[String, Long] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap

  test("deleteWhere subtracts on read; base data files are untouched") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toString + "/t"
    mkTable(dir)
    val before = dataFiles(dir)
    val n = DeletionVectors.deleteWhere(spark, dir, col("grp") === 3)
    assert(n == (1L to 100L).count(_ % 7 == 3))
    val live = DeletionVectors.read(spark, dir)
    assert(live.count() == 100 - n)
    assert(live.filter($"grp" === 3).isEmpty)
    // merge-on-read contract: no data file rewritten, none added
    assert(dataFiles(dir) == before)
    // deleted metadata columns never leak into the live schema
    assert(!live.columns.exists(c => c == "_file" || c == "_pos"))
  }

  test("deletes accumulate across calls and re-deleting is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toString + "/t"
    mkTable(dir)
    val n1 = DeletionVectors.deleteWhere(spark, dir, col("id") <= 10)
    val n2 = DeletionVectors.deleteWhere(spark, dir, col("id") <= 20)
    assert(n1 == 10 && n2 == 10, "second delete only hits still-live rows")
    assert(DeletionVectors.deleteWhere(spark, dir, col("id") <= 20) == 0)
    val live = DeletionVectors.read(spark, dir)
    assert(live.count() == 80 && live.agg(min($"id")).head().getLong(0) == 21L)
    val st = DeletionVectors.stats(spark, dir).collect()
    assert(st.map(_.getLong(1)).sum == 100 && st.map(_.getLong(2)).sum == 20)
  }

  test("read plan uses a broadcast LEFT ANTI join, not a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toString + "/t"
    mkTable(dir)
    DeletionVectors.deleteWhere(spark, dir, col("id") === 1)
    val plan = DeletionVectors.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("compact folds deletes into fresh files; live rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toString + "/t"
    mkTable(dir)
    DeletionVectors.deleteWhere(spark, dir, col("grp") === 0)
    val liveBefore = DeletionVectors.read(spark, dir)
      .orderBy("id").collect().toSeq
    val target = dir + "-compacted"
    DeletionVectors.compact(spark, dir, target, numFiles = 2)
    assert(!new java.io.File(target, DeletionVectors.DvDir).exists())
    val liveAfter = DeletionVectors.read(spark, target)
      .orderBy("id").collect().toSeq
    assert(liveAfter == liveBefore)
  }

  test("delete an entire file's rows — that file contributes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toString + "/t"
    mkTable(dir)
    // pick one physical file and delete every row in it by position
    val oneFile = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("f")).distinct()
      .head().getString(0)
    val n = DeletionVectors.deleteWhere(spark, dir,
      col("_file") === oneFile)
    assert(n > 0)
    val live = DeletionVectors.read(spark, dir)
    assert(live.count() == 100 - n)
  }
}
