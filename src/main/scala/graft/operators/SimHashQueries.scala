package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-dup fingerprinting.
  *
  * q55 is a 16-bit SimHash built from pure column expressions
  * (md5-hex → bigint via conv(); bit votes; hamming distance on
  * adjacent docs) so DuckDB can mirror it exactly ('0x…'::BIGINT).
  * q56 uses the native 64-bit Catalyst expression (graft.plans
  * .SimHash64) — not SQL-expressible, so it's a rows-only check; its
  * correctness is covered by SimHashSpec (eval == codegen == model).
  */
object SimHashQueries {
  private val bits = 16

  /** (h >> i) & 1 == 1 → +1 else -1, summed per doc; sign → bit i. */
  private def simhash16(wordHash: Column): Seq[Column] =
    (0 until bits).map { i =>
      sum(when(shiftright(wordHash, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"v$i")
    }

  def q55(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("w"))
      .withColumn("h", conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
    val votes = words.groupBy($"doc_id").agg(simhash16($"h").head, simhash16($"h").tail: _*)
    val sh = votes.select($"doc_id",
      (0 until bits).map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    val a = sh.select($"doc_id".as("a"), $"simhash".as("sh_a"))
    val b = sh.select($"doc_id".as("b"), $"simhash".as("sh_b"))
    a.join(b, $"b" === $"a" + 1)
      .select($"a", $"b", $"sh_a", $"sh_b",
        bit_count($"sh_a".bitwiseXOR($"sh_b")).cast("long").as("hamming"))
      .orderBy($"a")
  }

  val q55Sql: String = {
    val votes = (0 until bits).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i").mkString(", ")
    val value = (0 until bits).map(i =>
      s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |    FROM documents) t),
       |votes AS (SELECT doc_id, $votes FROM words GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM votes)
       |SELECT a.doc_id AS a, b.doc_id AS b, a.simhash AS sh_a, b.simhash AS sh_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
       |ORDER BY a""".stripMargin
  }

  /** Native SimHash64 expression over documents (rows-only check). */
  def q56(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    Tables.documents(s, d)
      .select($"doc_id",
        GraftFunctions.simhash64($"text").as("simhash64"),
        GraftFunctions.rolling_hash($"text").as("rolling_hash"))
      .orderBy($"doc_id")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q55_simhash16_hamming", q55, Some(q55Sql), bench = true),
    QueryDef("q56_simhash64_native", q56, None),
  )
}
