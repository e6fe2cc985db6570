package graft

import graft.sources.Sinks

/** Crash-recovery behavior of the staging-then-swap sinks: a leftover
  * staging directory from an interrupted run must never corrupt or
  * block the next run, and successful runs must leave no staging
  * residue (at 100 TB a stale __staging is real storage AND a real
  * correctness trap if a later run could read it as data). */
class UpsertRecoverySpec extends SparkSpec {

  test("mergeUpsert recovers from a leftover staging dir and cleans it up") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_rec").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(dir)

    // simulate a crashed previous run: stale garbage in __staging
    val staging = dir + "__staging"
    Seq((99L, "stale")).toDF("k", "v").write.parquet(staging)

    Sinks.mergeUpsert(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), dir, "k")

    val rows = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      s"stale staging leaked into the table: ${rows.toSeq}")
    assert(!new java.io.File(staging).exists(),
      "staging dir must be removed after a successful merge")
  }

  test("compact is idempotent and a second pass is a no-op on file count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_rec").toString + "/t"
    spark.range(10000).select($"id", ($"id" % 7).as("g"))
      .repartition(40).write.parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles()
    Sinks.compact(spark, dir)
    val afterOnce = parquetFiles()
    assert(afterOnce < before, s"compaction did not reduce files: $before -> $afterOnce")
    assert(spark.read.parquet(dir).count() == 10000)
    Sinks.compact(spark, dir)
    assert(parquetFiles() == afterOnce, "second compaction must be stable")
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().map(_._1).sorted.toSeq
      == (0L until 10000L).toSeq)
  }
}
