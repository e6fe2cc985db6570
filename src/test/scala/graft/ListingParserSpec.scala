package graft

import java.nio.file.Files
import graft.sources.{ListingParser, Sources}
import graft.operators.Cleaning

class ListingParserSpec extends SparkSpec {

  private val listPage =
    """<html><body>
      |<a class="xx jLNYlr" href="/apt/1">card1</a>
      |<a class="jLNYlr yy" href="/apt/2">card2</a>
      |<a aria-label="Next Page" href="/rent/p2">next</a>
      |</body></html>""".stripMargin

  private val lastPage = """<html><a class="jLNYlr" href="/apt/3">c</a></html>"""

  private def detailPage(name: String = "The Sofia Apartments") =
    s"""<html><body>
       |<span data-testid="home-details-summary-headline">$name</span>
       |<span data-testid="home-details-summary-city-state">8400 Beech Dr</span>
       |<span data-testid="home-details-summary-city-state">West Lake Hills, TX 78746</span>
       |<div data-testid="home-description-text-description-text">Nice place.</div>
       |<li class="FeatureList__FeatureListItem-iipbki-0">Apartment</li>
       |<li class="FeatureList__FeatureListItem-iipbki-0">Pool</li>
       |<table data-testid="floor-plan-group">
       |<tr><td>h</td></tr>
       |<tr>
       |  <div color="highlight">Unit 210</div>
       |  <td class="FloorPlanTable__FloorPlanFloorSpaceCell-sc-1ghu3y7-5">525 sqft</td>
       |  <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">1bd</td>
       |  <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">1ba</td>
       |  <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">Contact</td>
       |  <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">$$850</td>
       |</tr>
       |<tr>
       |  <div color="highlight">Unit 211</div>
       |  <td class="FloorPlanTable__FloorPlanFloorSpaceCell-sc-1ghu3y7-5">1,050 sqft</td>
       |  <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">2bd</td>
       |  <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">1.5ba</td>
       |  <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">Contact</td>
       |  <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">$$1,200+</td>
       |</tr>
       |</table>
       |</body></html>""".stripMargin

  test("S2: listing URL extraction with site-root concat (F9)") {
    val urls = ListingParser.extractListingUrls(listPage, "https://x.com")
    assert(urls == Seq("https://x.com/apt/1", "https://x.com/apt/2"))
  }

  test("S3: next-page cursor present/absent") {
    assert(ListingParser.nextPageUrl(listPage).contains("/rent/p2"))
    assert(ListingParser.nextPageUrl(lastPage).isEmpty)
  }

  test("S4: floor-plan rows — one RawListing per <tr>, page fields repeated") {
    val rows = ListingParser.parseFloorPlans(detailPage(), "u", "2020-01-08")
    assert(rows.length == 2)
    val r = rows.head
    assert(r.name == "The Sofia Apartments")
    assert(r.city == "West Lake Hills" && r.state == "TX" && r.zipcode == "78746")
    assert(r.unit == "Unit 210" && r.sqft == "525 sqft" && r.bed == "1bd"
      && r.bath == "1ba" && r.price == "$850")
    assert(r.details == "Apartment ,Pool")
    assert(rows(1).price == "$1,200+")
  }

  test("S4: malformed page yields zero rows (error isolation)") {
    assert(ListingParser.parseFloorPlans("<html>junk</html>", "u", "d").isEmpty)
  }

  test("end-to-end: page archive → distributed parse → clean → typed rows") {
    val dir = Files.createTempDirectory("pages").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/p1.html"), detailPage())
    Files.writeString(java.nio.file.Path.of(s"$dir/p2.html"), "<html>broken</html>")
    val pages = Sources.pageArchive(spark, dir)
    val raw = ListingParser.parsePages(pages, "2020-01-08")
    val cleaned = Cleaning.cleanListings(raw.selectExpr(Cleaning.rawColumns: _*))
    val out = cleaned.orderBy("sqft").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("sqft") == 525 && out(0).getAs[Int]("price") == 850)
    assert(out(1).getAs[Int]("sqft") == 1050 && out(1).getAs[Int]("price") == 1200)
    assert(out(1).getAs[Float]("bath") == 1.5f)
  }
}
