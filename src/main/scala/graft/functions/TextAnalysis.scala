package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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

  /** Word-salad quality score in [0,1]: token-count saturation +
    * word-length sanity + stopword presence. Integer/ratio arithmetic
    * only → deterministic cross-engine. */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c).cast("double")
    val chars = length(c).cast("double")
    val avgWordLen = (chars - (toks - 1)) / toks
    val stop = langScore(c, "en").cast("double")
    least(toks / lit(50.0), lit(1.0)) * 0.4 +
      when(avgWordLen >= 2.0 && avgWordLen <= 12.0, 0.3).otherwise(0.0) +
      least(stop / lit(5.0), lit(1.0)) * 0.3
  }

  /** Self-contained DuckDB mirror of [[qualityScore]] over a text
    * column expression — no subquery intermediates, so any oracle can
    * inline it (CurationQueries keeps its named-intermediate form; the
    * arithmetic shape and therefore every IEEE result is identical). */
  def sqlQualityScore(text: String): String = {
    val toks = s"CAST(length($text) - length(replace($text, ' ', '')) + 1 AS INT)"
    val chars = s"CAST(length($text) AS DOUBLE)"
    val stop = s"(${sqlWordOccurrences(s"lower($text)", "the")} + " +
      s"${sqlWordOccurrences(s"lower($text)", "and")} + " +
      s"${sqlWordOccurrences(s"lower($text)", "of")})"
    val awl = s"(($chars - ($toks - 1.0)) / $toks)"
    s"(least($toks / 50.0, 1.0) * 0.4 + " +
      s"(CASE WHEN $awl >= 2.0 AND $awl <= 12.0 THEN 0.3 ELSE 0.0 END) + " +
      s"least($stop / 5.0, 1.0) * 0.3)"
  }

  /** Content fingerprint (md5 hex — identical in Spark and DuckDB). */
  def fingerprint(c: Column): Column = md5(c)

  /** Near-dup cluster key: md5 of the leading `n` words — the
    * boilerplate-prefix fingerprint shared by q100/q107/q114 and
    * CurationJobs (ONE definition; the batch and streaming dedups are
    * oracle-matched against each other through it). */
  def prefixFingerprint(text: Column, n: Int = 5): Column =
    md5(array_join(slice(split(text, " "), 1, n), " "))

  /** Adjacent-pair strings ("a b") of an array column, materialized
    * guard included (sequence(1, n) counts DOWN for n < 1 — the Spark
    * trap every inline copy of this helper has to re-dodge). */
  def adjacentPairs(arr: Column): Column =
    when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1),
        i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
      .otherwise(array().cast("array<string>"))
}
