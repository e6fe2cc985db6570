package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard against the runaway-oracle shape that zeroed round
  * 11's correctness artifact: a long chain of non-MATERIALIZED CTEs in
  * a DuckDB oracle string, each step referencing the previous. DuckDB
  * inlines non-materialized CTEs at every reference site; when the
  * reference sits inside a correlated scalar subquery (evaluated per
  * outer row) the effective work multiplies per step — q422's 2×24-step
  * value-iteration chain went from >21 min CPU to 0.53 s with
  * `AS MATERIALIZED` on the step CTEs (r11 verdict; in-repo precedent
  * commit c6b3ce5 for q420).
  *
  * The rule is deliberately blunter than the failure mode: ANY
  * dependency chain of ≥ `MaxChain` non-materialized CTEs is flagged,
  * whether or not a correlated subquery sits in the middle — deep
  * iterative chains should simply be written MATERIALIZED-first, and
  * compliance costs one keyword. This is string analysis, not SQL
  * parsing: CTE headers are matched by regex, a reference is a
  * FROM/JOIN mention of an earlier CTE's name, and the guard
  * intentionally over-approximates.
  */
class OracleCteChainGuardSpec extends AnyFunSuite {

  /** Unrolled-iteration rule: CTE names in one numeric-suffix FAMILY
    * (v_b_1…v_b_24, s1…s12) that chain unmaterialized ≥ this many
    * steps fail the build. Distinct-name pipelines (scan → window →
    * transitions → counts → …) are exempt from this rule — those are
    * evaluated once per reference, not per-iteration-step — but are
    * caught by the blunt `MaxAnyChain` backstop below. */
  private val MaxFamilyChain = 8

  /** Backstop on ANY unmaterialized chain, family or not. The
    * registry's deepest benign distinct-name chain is 18 (q286's
    * power iteration interleaves step CTEs with norm CTEs). */
  private val MaxAnyChain = 20

  private val CteHeader =
    """(?i)\b([a-z_][a-z0-9_]*)\s*(?:\([^()]*\))?\s+AS\s+(MATERIALIZED\s+)?\(""".r

  private case class Cte(name: String, materialized: Boolean, body: String)

  /** Extract CTE definitions in order. Body ≈ text to the next CTE
    * header (good enough for reference detection). */
  private def ctes(sql: String): Vector[Cte] = {
    val ms = CteHeader.findAllMatchIn(sql).toVector
    ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else sql.length
      Cte(m.group(1).toLowerCase, m.group(2) != null,
        sql.substring(m.`end`, end))
    }
  }

  /** True when `body` consumes CTE `name` (FROM/JOIN mention — how
    * chained CTEs actually reference each other; bare-word matching
    * would false-positive on one-letter table aliases). */
  private def references(body: String, name: String): Boolean =
    ("""(?i)\b(?:FROM|JOIN)\s+""" + java.util.regex.Pattern.quote(name) +
      """\b""").r.findFirstIn(body).isDefined

  /** name → family key: trailing digits stripped (v_b_12 → "v_b_"),
    * None when the name has no numeric suffix. */
  private def familyKey(name: String): Option[String] = {
    val stripped = name.reverse.dropWhile(_.isDigit).reverse
    if (stripped.length < name.length && stripped.nonEmpty) Some(stripped)
    else None
  }

  /** Longest dependency chain of non-materialized CTEs; a MATERIALIZED
    * node is computed once and cuts the chain. `sameFamilyOnly`
    * restricts links to CTEs sharing a numeric-suffix family key (the
    * unrolled-iteration signature). Returns (depth, deepest name). */
  private def maxChain(sql: String, sameFamilyOnly: Boolean): (Int, String) = {
    val depth = scala.collection.mutable.LinkedHashMap[String, Int]()
    var worst = (0, "")
    ctes(sql).foreach { c =>
      val d =
        if (c.materialized) 0
        else {
          val prior = depth.collect {
            case (n, pd)
                if pd > 0 && references(c.body, n) &&
                  (!sameFamilyOnly ||
                    (familyKey(n).isDefined && familyKey(n) == familyKey(c.name))) =>
              pd
          }
          1 + (if (prior.isEmpty) 0 else prior.max)
        }
      depth(c.name) = d
      if (d > worst._1) worst = (d, c.name)
    }
    worst
  }

  test("planted trap: q422's unpatched shape (24 unmaterialized steps) is red") {
    def step(k: Int): String =
      s"""v_$k AS (
         |  SELECT s.state,
         |    coalesce((SELECT sum(t.p * v.val) // 1000000
         |              FROM tm t JOIN v_${k - 1} v ON v.state = t.to_state
         |              WHERE t.from_state = s.state), 0) AS val
         |  FROM states s)""".stripMargin
    val sql =
      """WITH tm AS MATERIALIZED (SELECT 1 AS from_state),
        |states(state) AS (VALUES ('a')),
        |v_0 AS (SELECT state, 0 AS val FROM states),
        |""".stripMargin +
        (1 to 24).map(step).mkString(",\n") +
        "\nSELECT * FROM v_24"
    val (d, name) = maxChain(sql, sameFamilyOnly = true)
    assert(d >= MaxFamilyChain, s"trap not caught: depth $d at $name")
  }

  test("planted control: the same chain written MATERIALIZED is green") {
    def step(k: Int): String =
      s"""v_$k AS MATERIALIZED (
         |  SELECT s.state, coalesce((SELECT v.val FROM v_${k - 1} v), 0) AS val
         |  FROM states s)""".stripMargin
    val sql =
      """WITH states(state) AS (VALUES ('a')),
        |v_0 AS MATERIALIZED (SELECT state, 0 AS val FROM states),
        |""".stripMargin +
        (1 to 24).map(step).mkString(",\n") +
        "\nSELECT * FROM v_24"
    val (d, name) = maxChain(sql, sameFamilyOnly = true)
    assert(d < MaxFamilyChain, s"materialized chain flagged: depth $d at $name")
  }

  test("every registered oracle stays under both chain bounds") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (qname, sql) =>
        val (fd, fcte) = maxChain(sql, sameFamilyOnly = true)
        val (ad, acte) = maxChain(sql, sameFamilyOnly = false)
        val fam =
          if (fd >= MaxFamilyChain)
            Some(s"$qname: unrolled-iteration family chain depth $fd at CTE '$fcte'")
          else None
        val any =
          if (ad >= MaxAnyChain)
            Some(s"$qname: unmaterialized chain depth $ad at CTE '$acte'")
          else None
        fam.toSeq ++ any.toSeq
    }
    assert(offenders.isEmpty,
      "unmaterialized CTE chains (add AS MATERIALIZED — see q420/q422):\n" +
        offenders.mkString("\n"))
  }
}
