package graft

import java.nio.file.{Files, Path}

import graft.sources.{ListingParser, Sources}
import graft.sources.v2.ListingDataSource
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class V2SourceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val fmt = classOf[ListingDataSource].getName

  private def detailPage(name: String, city: String) =
    s"""<html><body>
       |<span data-testid="home-details-summary-headline">$name</span>
       |<span data-testid="home-details-summary-city-state">8400 Beech Dr</span>
       |<span data-testid="home-details-summary-city-state">$city, TX 78746</span>
       |<div data-testid="home-description-text-description-text">Nice.</div>
       |<li class="FeatureList__FeatureListItem-x">Pool</li>
       |<table data-testid="floor-plan-group">
       |<tr>
       |  <div color="highlight">Unit 1</div>
       |  <td class="FloorPlanFloorSpaceCell-x">525 sqft</td>
       |  <td class="FloorPlanFeaturesCell-x">1bd</td>
       |  <td class="FloorPlanFeaturesCell-x">1ba</td>
       |  <td class="FloorPlanSMCell-x">$$850</td>
       |</tr>
       |</table>
       |</body></html>""".stripMargin

  private def archive(): String = {
    val dir = Files.createTempDirectory("v2pages").toString
    Files.writeString(Path.of(s"$dir/a.html"), detailPage("Alpha", "Austin"))
    Files.writeString(Path.of(s"$dir/b.html"), detailPage("Beta", "Waco"))
    Files.writeString(Path.of(s"$dir/broken.html"), "<html>junk</html>")
    dir
  }

  private def readV2(dir: String) =
    spark.read.format(fmt).option("path", dir).option("date", "2020-01-08").load()

  test("V2 table parses the archive with row parity vs the flatMap path") {
    val dir = archive()
    val v2 = readV2(dir).drop("url").orderBy("name")
    val flat = ListingParser
      .parsePages(Sources.pageArchive(spark, dir), "2020-01-08")
      .drop("url").orderBy("name")
    assert(v2.columns.toSeq == flat.columns.toSeq)
    assert(v2.collect().toSeq == flat.collect().toSeq)
    assert(v2.count() == 2)
  }

  test("one input partition per archive page") {
    val dir = archive()
    assert(readV2(dir).rdd.getNumPartitions == 3)
  }

  test("equality filter pushes into the reader: no residual FilterExec") {
    val dir = archive()
    val q = readV2(dir).filter($"city" === "Austin")
    assert(q.collect().map(_.getAs[String]("name")).toSeq == Seq("Alpha"))
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty,
      s"pushed filter re-applied:\n$plan")
    val scan = plan.collect { case b: BatchScanExec => b }.head
    assert(scan.scan.description().contains("EqualTo(city,Austin)"))
  }

  test("unsupported filters stay in the plan (and stay correct)") {
    val dir = archive()
    val q = readV2(dir).filter(length($"name") > 4)
    assert(q.collect().map(_.getAs[String]("name")).toSeq.sorted == Seq("Alpha"))
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }.nonEmpty)
  }

  test("column pruning reaches the scan") {
    val dir = archive()
    val q = readV2(dir).select($"city")
    val scan = q.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("city"))
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("Austin", "Waco"))
  }
}
