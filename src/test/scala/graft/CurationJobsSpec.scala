package graft

import org.apache.spark.sql.functions._

/** End-to-end curation lifecycle: documents → repetition/quality gates
  * → keep-best dedup → weighted sample → redacted, lang-partitioned
  * training slice.
  */
class CurationJobsSpec extends SparkSpec {

  test("curate runs end-to-end on sf0.001 with a monotone stage funnel") {
    val outDir = java.nio.file.Files.createTempDirectory("curated").toString
    val (out, report) =
      CurationJobs.curate(spark, "/root/testdata/sf0.001", outDir)

    assert(report.total == 500, "sf0.001 documents row count")
    // funnel can only shrink
    assert(report.afterRepetition <= report.total)
    assert(report.afterQuality <= report.afterRepetition)
    assert(report.afterDedup <= report.afterQuality)
    assert(report.sampled <= report.afterDedup)
    assert(report.sampled > 0, "the pipeline must keep something")
    assert(out.count() == report.sampled)

    // lang partitioning materialized on disk
    val langDirs = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    assert(langDirs.nonEmpty)

    // dedup: no two survivors share a 5-word prefix fingerprint
    val fps = out
      .select(graft.functions.TextAnalysis.prefixFingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count(), "prefix clusters resolved")

    // quality column survives for downstream mixing decisions
    assert(out.columns.contains("quality"))
  }

  test("curationTransform runs through the config-driven JobRunner") {
    val outDir = java.nio.file.Files.createTempDirectory("jr_curated").toString
    val config =
      """{"data_sources": {"parquet": {"docs": "/root/testdata/sf0.001/documents.parquet"}}}"""
    val results = JobRunner.run(
      spark, config,
      transforms = Map("docs" -> CurationJobs.curationTransform),
      load = (_, df) => df.write.mode("overwrite").parquet(outDir))
    // the config-driven run keeps exactly what the direct job keeps
    val direct = CurationJobs.curate(spark, "/root/testdata/sf0.001",
      java.nio.file.Files.createTempDirectory("direct").toString)._2
    assert(results("docs") == Right(direct.sampled))
    assert(spark.read.parquet(outDir).count() == direct.sampled)
  }

  test("curate is idempotent: re-running overwrites to the same slice") {
    val outDir = java.nio.file.Files.createTempDirectory("curated2").toString
    val (_, r1) = CurationJobs.curate(spark, "/root/testdata/sf0.001", outDir)
    val (_, r2) = CurationJobs.curate(spark, "/root/testdata/sf0.001", outDir)
    assert(r1 == r2, "deterministic pipeline, deterministic report")
  }
}
