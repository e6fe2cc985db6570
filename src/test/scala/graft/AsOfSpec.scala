package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import scala.util.Random

/** All three merge_asof directions against a brute-force oracle on a
  * randomized keyed timeline (collisions included: the corpus is drawn
  * from a small ts domain so equal-timestamp and equidistant ties
  * actually occur and pin the tie rules). */
class AsOfSpec extends SparkSpec {

  private val rnd = new Random(42)
  private val leftRows = (1L to 200L).map(i => (i % 5L, rnd.nextInt(500).toLong, i))
  private val rightRows = (1L to 300L).map(i => (i % 5L, rnd.nextInt(500).toLong, 1000L + i))

  // idCol must carry the same name on both sides (the union aligns on
  // it); rid/rv ride as value columns
  private def frames() = {
    import spark.implicits._
    val l = leftRows.toDF("k", "ts", "id")
    val r = rightRows.toDF("k", "ts", "id")
      .withColumn("rid", col("id")).withColumn("rv", col("id") * 10)
    (l, r)
  }

  // brute force per left row over the full right list
  private def expected(dir: String): Map[Long, Option[Long]] =
    leftRows.map { case (k, lts, lid) =>
      val cands = rightRows.filter(_._1 == k)
      val pick = dir match {
        case "backward" =>
          val c = cands.filter(_._2 <= lts)
          // latest ts; tie → largest rid (sort order ts, oid puts it last)
          if (c.isEmpty) None else Some(c.maxBy(x => (x._2, x._3))._3)
        case "forward" =>
          val c = cands.filter(_._2 >= lts)
          // earliest ts; tie → smallest rid (first in sort order)
          if (c.isEmpty) None else Some(c.minBy(x => (x._2, x._3))._3)
        case "nearest" =>
          val b = cands.filter(_._2 <= lts)
          val f = cands.filter(_._2 > lts) // equal ts is distance 0 via backward
          val bPick = if (b.isEmpty) None else Some(b.maxBy(x => (x._2, x._3)))
          val fPick = if (f.isEmpty) None else Some(f.minBy(x => (x._2, x._3)))
          (bPick, fPick) match {
            case (None, None) => None
            case (Some(x), None) => Some(x._3)
            case (None, Some(y)) => Some(y._3)
            case (Some(x), Some(y)) =>
              if (lts - x._2 <= y._2 - lts) Some(x._3) else Some(y._3)
          }
      }
      lid -> pick
    }.toMap

  private def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("id"), col("asof_rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("backward direction matches brute force (incl. equal-ts inclusivity)") {
    val (l, r) = frames()
    assert(got(AsOf.asofJoin(l, r, "k", "ts", "id", Seq("rid", "rv"))) ==
      expected("backward"))
  }

  test("forward direction matches brute force (equal-ts right row IS a match)") {
    val (l, r) = frames()
    assert(got(AsOf.asofJoinForward(l, r, "k", "ts", "id", Seq("rid", "rv"))) ==
      expected("forward"))
  }

  test("nearest direction matches brute force with backward tie preference") {
    val (l, r) = frames()
    val df = AsOf.asofJoinNearest(l, r, "k", "ts", "id", Seq("rid", "rv"))
    assert(got(df) == expected("nearest"))
    // asof_dist is |Δts| of the chosen row, null only when no right row
    val bad = df.filter(col("asof_rid").isNotNull &&
      (col("asof_dist").isNull || col("asof_dist") < 0)).count()
    assert(bad == 0, "asof_dist must be a non-negative distance for every match")
  }

  test("a null in one carried column of the matched row stays null — no splice from older rows") {
    import spark.implicits._
    // ts=9 is the backward match; its rv is NULL. Per-column
    // last(ignoreNulls) would reach past it and return ts=5's rv=7 —
    // a value from a DIFFERENT row than asof_rid reports.
    val l = Seq((0L, 10L, 100L)).toDF("k", "ts", "id")
    val r = Seq((0L, 5L, 1L, Some(7L)), (0L, 9L, 2L, None))
      .toDF("k", "ts", "id", "rv")
      .withColumn("rid", col("id"))
    for (df <- Seq(
        AsOf.asofJoin(l, r, "k", "ts", "id", Seq("rid", "rv")),
        AsOf.asofJoinNearest(l, r, "k", "ts", "id", Seq("rid", "rv")))) {
      val row = df.select(col("asof_rid"), col("asof_rv")).head
      assert(row.getLong(0) == 2L, "must match the ts=9 row")
      assert(row.isNullAt(1),
        "matched row's null rv must stay null — got a spliced value from ts=5")
    }
  }

  test("nearest carries values consistently from the chosen side") {
    val (l, r) = frames()
    val mismatched = AsOf.asofJoinNearest(l, r, "k", "ts", "id", Seq("rid", "rv"))
      .filter(col("asof_rid").isNotNull && col("asof_rv") =!= col("asof_rid") * 10)
      .count()
    assert(mismatched == 0, "all carried columns must come from the SAME matched row")
  }
}
