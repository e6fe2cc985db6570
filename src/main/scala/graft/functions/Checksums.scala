package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Checksum validators for numeric-PII detection (the reference's PII
  * surface is regex-only — trulia_scrape.py has none — so this is an
  * engine extension in the q94 redaction family): a digit run that
  * LOOKS like a card number is only treated as one when its checksum
  * holds, which is how production scrubbers cut the false-positive
  * rate of bare `\d{13,16}` matches by ~10×.
  *
  * Pure column expressions (codegen'd, whole-stage-fused — no UDF), so
  * validation runs at scan speed over 100 TB, and integer-only
  * arithmetic so the DuckDB oracle mirror is bit-exact.
  */
object Checksums {

  /** Luhn (mod-10) checksum validity of a decimal-digit string — the
    * card-number shape test. Fold over the reversed digits: every 2nd
    * digit doubles (9-wrapping), total must divide by 10. Integer
    * arithmetic only → deterministic cross-engine. Caller guarantees
    * the input is all digits (pair with `regexp_extract_all` on real
    * corpora). */
  def luhnValid(c: Column): Column = {
    val s = reverse(c)
    val total = aggregate(
      sequence(lit(1), length(s)),
      lit(0),
      (acc, i) => {
        val d = s.substr(i, lit(1)).cast("int")
        val dd = when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      })
    // empty-string guard: sequence(1, 0) counts DOWN (the Spark trap
    // TextAnalysis.adjacentPairs documents) and substr('',...) nulls
    // the fold — define luhn('') as false outright
    when(length(c) === 0, lit(false)).otherwise(total % 10 === 0)
  }

  /** DuckDB mirror of [[luhnValid]]; `e` must be a bare column/CTE name
    * (it is referenced several times). */
  def sqlLuhnValid(e: String): String = {
    val d = s"CAST(reverse($e)[i] AS INT)"
    s"(list_sum(list_transform(range(1, length($e) + 1), i -> " +
      s"CASE WHEN i % 2 = 0 THEN (CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 " +
      s"ELSE $d * 2 END) ELSE $d END)) % 10 = 0)"
  }
}
