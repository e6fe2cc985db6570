package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import scala.util.matching.Regex

/** Listing-page parser — the zero-egress Spark form of the reference's
  * scrape loop (SURVEY §2.1 S1-S4): pre-fetched HTML pages flow in as a
  * `(path, content)` archive (Sources.pageArchive); URL extraction and
  * floor-plan row generation run distributed as `flatMap` over the page
  * Dataset (the reference's only table-generating operator,
  * trulia_scrape.py:107-149).
  *
  * Selector semantics mirror the reference's BS4 queries
  * (trulia_scrape.py:67-75, 77-88, 115-143) via regex on the same
  * class/data-testid anchors. Parse failures yield zero rows (the
  * reference's try/except-continue, :206-211).
  */
object ListingParser {

  final case class RawListing(
      name: String, address: String, unit: String, sqft: String,
      bed: String, bath: String, price: String, city: String,
      state: String, zipcode: String, description: String,
      details: String, url: String, date: String)

  private val cardHref: Regex =
    """<a[^>]*class="[^"]*jLNYlr[^"]*"[^>]*href="([^"]+)"""".r
  private val nextHref: Regex =
    """<a[^>]*aria-label="Next Page"[^>]*href="([^"]+)"""".r
  private val headline: Regex =
    """<span[^>]*data-testid="home-details-summary-headline"[^>]*>([^<]*)</span>""".r
  private val cityState: Regex =
    """<span[^>]*data-testid="home-details-summary-city-state"[^>]*>([^<]*)</span>""".r
  private val descriptionRe: Regex =
    """<div[^>]*data-testid="home-description-text-description-text"[^>]*>([^<]*)</div>""".r
  private val featureItem: Regex =
    """<li[^>]*class="[^"]*FeatureList__FeatureListItem[^"]*"[^>]*>([^<]*)</li>""".r
  private val floorPlanTable: Regex =
    """(?s)<table[^>]*data-testid="floor-plan-group"[^>]*>(.*?)</table>""".r
  private val tableRow: Regex = """(?s)<tr[^>]*>(.*?)</tr>""".r
  private val unitDiv: Regex =
    """<div[^>]*color="highlight"[^>]*>([^<]*)</div>""".r
  private val sqftCell: Regex =
    """<td[^>]*class="[^"]*FloorPlanFloorSpaceCell[^"]*"[^>]*>([^<]*)</td>""".r
  private val featuresCell: Regex =
    """<td[^>]*class="[^"]*FloorPlanFeaturesCell[^"]*"[^>]*>([^<]*)</td>""".r
  private val priceCell: Regex =
    """<td[^>]*class="[^"]*FloorPlanSMCell[^"]*"[^>]*>([^<]*)</td>""".r

  /** S2: listing URLs on a list page (reference prepends the site root,
    * trulia_scrape.py:57). */
  def extractListingUrls(html: String, root: String = ""): Seq[String] =
    cardHref.findAllMatchIn(html).map(m => root + m.group(1)).toSeq

  /** S3: the next-page cursor, absent on the last page. */
  def nextPageUrl(html: String, root: String = ""): Option[String] =
    nextHref.findFirstMatchIn(html).map(m => root + m.group(1))

  /** S4: one RawListing per floor-plan row; page-level fields repeat per
    * row (trulia_scrape.py:115-147). Malformed pages → Nil. */
  def parseFloorPlans(html: String, url: String, date: String): Seq[RawListing] =
    try {
      val name = headline.findFirstMatchIn(html).map(_.group(1)).getOrElse(return Nil)
      val csSpans = cityState.findAllMatchIn(html).map(_.group(1)).toSeq
      if (csSpans.length < 2) return Nil
      val address = csSpans.head
      // rsplit(maxsplit=2) parity (trulia_scrape.py:136)
      val csz = csSpans(1).replace(",", "").trim
      val i2 = csz.lastIndexOf(' ')
      val i1 = if (i2 > 0) csz.lastIndexOf(' ', i2 - 1) else -1
      if (i1 < 0) return Nil
      val (city, state, zipcode) =
        (csz.substring(0, i1), csz.substring(i1 + 1, i2), csz.substring(i2 + 1))
      val description = descriptionRe.findFirstMatchIn(html).map(_.group(1)).getOrElse("")
      val details = featureItem.findAllMatchIn(html).map(_.group(1)).mkString(" ,")
      for {
        table <- floorPlanTable.findAllMatchIn(html).map(_.group(1)).toSeq
        tr <- tableRow.findAllMatchIn(table).map(_.group(1)).toSeq
        unit <- unitDiv.findFirstMatchIn(tr).map(_.group(1)).toSeq
        sqft <- sqftCell.findFirstMatchIn(tr).map(_.group(1)).toSeq
        features = featuresCell.findAllMatchIn(tr).map(_.group(1)).toSeq
        if features.length >= 2
        price <- priceCell.findAllMatchIn(tr).map(_.group(1)).toSeq.lift(1).orElse(
          priceCell.findFirstMatchIn(tr).map(_.group(1)))
      } yield RawListing(name, address, unit, sqft, features(0), features(1),
        price, city, state, zipcode, description, details, url, date)
    } catch { case _: Exception => Nil }

  /** Distributed parse: page archive (path, content) → raw listing rows
    * (flatMap — multiple rows per page, zero on failure). */
  def parsePages(pages: DataFrame, date: String): DataFrame = {
    import pages.sparkSession.implicits._
    pages.select("path", "content").as[(String, String)]
      .flatMap { case (path, content) => parseFloorPlans(content, path, date) }
      .toDF()
  }
}
