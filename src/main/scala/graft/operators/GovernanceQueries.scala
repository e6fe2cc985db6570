package graft.operators

import graft.{Fx, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Governance / semi-structured surface: schema-on-read JSON
  * extraction, k-anonymity auditing, and an exact equi-depth histogram
  * built the scalable way (dense-rank two-pass, no global window).
  */
object GovernanceQueries {
  import Fx._

  /** q169 — schema-on-read over the events.props JSON column:
    * `from_json` with an explicit schema (not the regex fallback of
    * q24's JSON-ish extraction) feeding per-type aggregates. The parse
    * is a pure projection — codegen'd, scan-speed, no shuffle beyond
    * the final small groupBy. */
  def q169(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        from_json($"props", lit("k INT")).getField("k").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q169Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS INT) AS k
      |      FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q170 — k-anonymity audit (privacy governance): bucket documents
    * by quasi-identifier tuple (lang, source, 50-char length band) and
    * flag equivalence classes smaller than k=5 — rows whose attribute
    * combination is rare enough to re-identify. Pure two-level
    * aggregation; the flag threshold is integer-exact. */
  def q170(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang", $"source",
        ($"n_chars" - pmod($"n_chars", lit(50))).as("len_band"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", ($"class_size" < 5).cast("int"))
      .orderBy($"lang", $"source", $"len_band")
  }

  val q170Sql: String =
    """SELECT lang, source, len_band, class_size,
      |  CAST(class_size < 5 AS INT) AS at_risk
      |FROM (
      |  SELECT lang, source, n_chars - (n_chars % 50) AS len_band,
      |    count(*) AS class_size
      |  FROM documents GROUP BY 1, 2, 3) t
      |ORDER BY lang, source, len_band""".stripMargin

  /** q171 — exact equi-depth histogram (10 bins over n_chars) built
    * WITHOUT a global window: range-repartition + in-partition sort +
    * zipWithIndex assigns the global rank (the q167 two-pass shape —
    * per-partition counts to the driver, ids = offset + local pos),
    * then bin = (rank−1)·10 div N. At 100 TB this is the only exact
    * equi-depth plan that doesn't serialize the table through one
    * task; the approximate path is the q157 quantile sketch. The
    * oracle IS the single-partition `row_number()` — affordable at
    * oracle scale, identical arithmetic. */
  def q171(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .repartitionByRange(8, col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("n_chars"), col("doc_id"))
    val ranked = docs.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    val schema = StructType(docs.schema.fields :+
      StructField("rn", LongType, nullable = false))
    val spark = docs.sparkSession
    val withRank = spark.createDataFrame(ranked, schema)
    val n = withRank.agg(count(lit(1)).as("n"))
    withRank.crossJoin(broadcast(n))
      .select(expr("(rn - 1) * 10 DIV n").as("bin"), col("n_chars"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .orderBy(col("bin"))
  }

  val q171Sql: String =
    """SELECT (rn - 1) * 10 // n AS bin, count(*) AS n_docs,
      |  min(n_chars) AS lo, max(n_chars) AS hi
      |FROM (SELECT n_chars,
      |        row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
      |        count(*) OVER () AS n
      |      FROM documents) t
      |GROUP BY 1
      |ORDER BY bin""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q169_json_schema_read", q169, Some(q169Sql)),
    QueryDef("q170_k_anonymity", q170, Some(q170Sql)),
    QueryDef("q171_equidepth_hist", q171, Some(q171Sql)))
}
