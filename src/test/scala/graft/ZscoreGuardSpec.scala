package graft

import graft.operators.EventQueries
import org.apache.spark.sql.functions._

/** The σ = 0 guard in the z-score outlier core (q132): on degenerate
  * all-equal data Spark's n/0 is NaN (comparison false) while DuckDB
  * sorts NaN above all values (comparison true) — a latent
  * cross-engine divergence unless the σ > 0 filter runs before the
  * division on both sides. The fixture pins both regimes.
  */
class ZscoreGuardSpec extends SparkSpec {
  import spark.implicits._

  test("degenerate all-equal counts flag NOTHING (sigma=0 guard, no NaN rows)") {
    val flat = (1 to 24).map(h => (s"h$h", 100.0)).toDF("hour", "n")
    assert(EventQueries.zscoreFlags(flat, "hour", z = 2.0).count() === 0)
  }

  test("single-row input (stddev_samp undefined -> null sigma) flags nothing") {
    val one = Seq(("h1", 100.0)).toDF("hour", "n")
    assert(EventQueries.zscoreFlags(one, "hour", z = 2.0).count() === 0)
  }

  test("a genuine outlier is flagged with the right sign and survives r4") {
    // 23 quiet hours at 100 plus one 10x spike: z of the spike is
    // large positive; no quiet hour crosses |z| > 2
    val rows = ((1 to 23).map(h => (f"h$h%02d", 100.0)) :+ ("h24", 1000.0))
      .toDF("hour", "n")
    val out = EventQueries.zscoreFlags(rows, "hour", z = 2.0).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "h24")
    assert(out.head.getLong(1) === 1000L)
    assert(out.head.getDouble(2) > 2.0)
  }
}
