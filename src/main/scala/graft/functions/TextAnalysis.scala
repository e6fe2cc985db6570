package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.plans.GraftFunctions.md5_fast

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, occurrence counting, language-ID heuristics, quality
  * scoring, fingerprinting. All pure `Column` expressions (codegen'd,
  * whole-stage-fused, no UDFs) so they run at scan speed over 100 TB —
  * and every one has an exact DuckDB-SQL mirror for the oracle.
  */
object TextAnalysis {

  /** Whitespace token count: #spaces + 1 (documents are single-space
    * separated). Length arithmetic instead of split() keeps it cheap —
    * no array materialization per row. */
  def tokenCount(c: Column): Column =
    length(c) - length(replace(c, lit(" "), lit(""))) + 1

  /** Non-overlapping occurrence count of word `w` with boundary
    * padding. (Consecutive repeats like "the the" undercount by the
    * overlap — deterministic and mirrored in the oracle.) */
  def wordOccurrences(c: Column, w: String): Column = {
    val needle = s" $w "
    val padded = concat(lit(" "), c, lit(" "))
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) / needle.length)
      .cast(IntegerType)
  }

  /** SQL mirror of [[wordOccurrences]]. */
  def sqlWordOccurrences(col: String, w: String): String = {
    val needle = s" $w "
    s"CAST((length(concat(' ', $col, ' ')) - length(replace(concat(' ', $col, ' '), ' $w ', ''))) / ${needle.length} AS INT)"
  }

  /** Stopword tables for the n-gram language-ID heuristic. Order of the
    * langs Seq is the deterministic tie-break (first wins). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "les", "et"),
    "de" -> Seq("der", "die", "und"))

  /** Per-language stopword hit count over lowercased text. */
  def langScore(c: Column, lang: String): Column = {
    val words = langStopwords.toMap.apply(lang)
    words.map(w => wordOccurrences(lower(c), w)).reduce(_ + _)
  }

  /** Language-ID: argmax of stopword hits, ties resolved in declared
    * lang order, zero hits → 'unknown'. */
  def langId(c: Column): Column = {
    val scores = langStopwords.map { case (l, _) => l -> langScore(c, l) }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(maxScore === 0, lit("unknown"))) {
      case (acc, (l, s)) => acc.when(s === maxScore, lit(l))
    }.otherwise(lit("unknown"))
  }

  /** Word-salad quality score on the exact 1e-6 integer grid
    * (BIGINT in [0, 1000000]): token-count saturation
    * (min(toks,50)·8000 = the old 0.4·min(toks/50,1) band) +
    * word-length sanity (avg word len in [2,12], tested as the
    * cross-multiplied integer band chars−toks+1 ∈ [2·toks, 12·toks])
    * + stopword presence (min(stop,5)·60000). Pure BIGINT arithmetic
    * end-to-end — no float ever enters the score, so every consumer
    * (binning, thresholds, rankings) is stable across engines AND
    * across engine VERSIONS (the r13 driver ran a DuckDB whose float
    * evaluation of the previous 0.4x+0.3+0.3y form differed at bin
    * boundaries; see VERDICT r13). */
  def qualityMicro(c: Column): Column = {
    val toks = tokenCount(c).cast("long")
    val chars = length(c).cast("long")
    val stop = langScore(c, "en").cast("long")
    least(toks, lit(50L)) * lit(8000L) +
      when(chars - toks + lit(1L) >= toks * 2L &&
        chars - toks + lit(1L) <= toks * 12L, lit(300000L)).otherwise(lit(0L)) +
      least(stop, lit(5L)) * lit(60000L)
  }

  /** Quality score in [0,1] as a double: ONE division of the exact
    * integer [[qualityMicro]] by 10⁶ — a single correctly-rounded
    * IEEE op on identical operands, bit-identical in any engine.
    * Consumers that re-quantize (floor(q·10⁶), round(q·10⁴)) must
    * use [[qualityMicro]] directly instead — the float round-trip is
    * exactly the boundary-instability class this grid removed. */
  def qualityScore(c: Column): Column =
    qualityMicro(c).cast("double") / lit(1000000.0)

  /** Self-contained DuckDB mirror of [[qualityMicro]] over a text
    * column expression — no subquery intermediates, so any oracle can
    * inline it. Pure BIGINT, identical to the Column form. */
  def sqlQualityMicro(text: String): String = {
    val toks = s"CAST(length($text) - length(replace($text, ' ', '')) + 1 AS BIGINT)"
    val chars = s"CAST(length($text) AS BIGINT)"
    val stop = s"(${sqlWordOccurrences(s"lower($text)", "the")} + " +
      s"${sqlWordOccurrences(s"lower($text)", "and")} + " +
      s"${sqlWordOccurrences(s"lower($text)", "of")})"
    s"(least($toks, 50) * 8000 + " +
      s"(CASE WHEN $chars - $toks + 1 >= $toks * 2 " +
      s"AND $chars - $toks + 1 <= $toks * 12 THEN 300000 ELSE 0 END) + " +
      s"least($stop, 5) * 60000)"
  }

  /** SQL mirror of [[qualityScore]]: the micro integer divided by 10⁶
    * in one double op. */
  def sqlQualityScore(text: String): String =
    s"(CAST(${sqlQualityMicro(text)} AS DOUBLE) / 1000000.0)"

  /** Content fingerprint (md5 hex — identical in Spark and DuckDB). */
  def fingerprint(c: Column): Column = md5_fast(c)

  /** Near-dup cluster key: md5 of the leading `n` words — the
    * boilerplate-prefix fingerprint shared by q100/q107/q114 and
    * CurationJobs (ONE definition; the batch and streaming dedups are
    * oracle-matched against each other through it). */
  def prefixFingerprint(text: Column, n: Int = 5): Column =
    md5_fast(array_join(slice(split(text, " "), 1, n), " "))

  /** Adjacent-pair strings ("a b") of an array column, materialized
    * guard included (sequence(1, n) counts DOWN for n < 1 — the Spark
    * trap every inline copy of this helper has to re-dodge). */
  def adjacentPairs(arr: Column): Column =
    when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1),
        i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
      .otherwise(array().cast("array<string>"))
}
