package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked queries exercising the Cleaning library (SURVEY §2.3
  * P4-P6, §2.4 F1-F12, §2.5 C1) over raw-listing-shaped strings
  * synthesized deterministically from integer testdata columns (so the
  * DuckDB oracle can build byte-identical inputs — no float formatting
  * involved).
  */
object CleaningQueries {

  /** Shared raw-string synthesis from `part` — every branch of the
    * reference's cleaning quirks is exercised:
    * ranges, thousands commas, 'Contact', '+', stray blanks, Studio,
    * nulls, leading-zero zipcodes.  Must stay in lockstep with
    * [[rawSynthSql]]. */
  private def rawSynth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = ($"p_size" * 25 + 100).cast(StringType)
    val hi = ($"p_size" * 25 + 100 + $"p_size" * 3 + 101).cast(StringType)
    Tables.part(s, d).select(
      $"p_partkey",
      when($"p_partkey" % 5 === 0, concat(base, lit(" sqft")))
        .when($"p_partkey" % 5 === 1, concat(lit("  "), base, lit(" sqft ")))
        .when($"p_partkey" % 5 === 2, concat(base, lit("-"), hi, lit(" sqft")))
        .when($"p_partkey" % 5 === 3, lit(""))
        .otherwise(concat(lit("1,"), lpad(($"p_partkey" % 1000).cast(StringType), 3, "0"), lit(" sqft")))
        .as("sqft"),
      when($"p_partkey" % 7 === 0, concat(lit("$"), ($"p_size" * 50).cast(StringType)))
        .when($"p_partkey" % 7 === 1, concat(lit("$"), ($"p_size" * 50).cast(StringType), lit("+")))
        .when($"p_partkey" % 7 === 2, lit("Contact"))
        .when($"p_partkey" % 7 === 3,
          concat(lit("$"), ($"p_size" * 50).cast(StringType), lit("-$"), ($"p_size" * 60).cast(StringType)))
        .when($"p_partkey" % 7 === 4,
          concat(lit("$1,"), lpad(($"p_partkey" % 1000).cast(StringType), 3, "0")))
        .when($"p_partkey" % 7 === 5, lit(" "))
        .otherwise(concat(lit("  $"), ($"p_size" * 50).cast(StringType), lit("  ")))
        .as("price"),
      when($"p_partkey" % 4 === 0, concat(($"p_size" % 4).cast(StringType), lit("bd")))
        .when($"p_partkey" % 4 === 1, lit("Studio"))
        .when($"p_partkey" % 4 === 2, lit(null).cast(StringType))
        .otherwise(concat((($"p_size" % 4) + 1).cast(StringType), lit("bd ")))
        .as("bed"),
      when($"p_partkey" % 2 === 0, concat((($"p_size" % 3) + 1).cast(StringType), lit("ba")))
        .otherwise(concat((($"p_size" % 3) + 1).cast(StringType), lit(".5ba")))
        .as("bath"),
      when($"p_partkey" % 6 === 0, lpad(($"p_partkey" % 900).cast(StringType), 5, "0"))
        .otherwise((lit(78700) + $"p_partkey" % 60).cast(StringType))
        .as("zipcode"))
  }

  /** DuckDB mirror of [[rawSynth]]. */
  private val rawSynthSql: String =
    """SELECT p_partkey,
      |CASE WHEN p_partkey % 5 = 0 THEN concat(p_size*25+100, ' sqft')
      |     WHEN p_partkey % 5 = 1 THEN concat('  ', p_size*25+100, ' sqft ')
      |     WHEN p_partkey % 5 = 2 THEN concat(p_size*25+100, '-', p_size*25+100+p_size*3+101, ' sqft')
      |     WHEN p_partkey % 5 = 3 THEN ''
      |     ELSE concat('1,', lpad(CAST(p_partkey % 1000 AS VARCHAR), 3, '0'), ' sqft') END AS sqft,
      |CASE WHEN p_partkey % 7 = 0 THEN concat('$', p_size*50)
      |     WHEN p_partkey % 7 = 1 THEN concat('$', p_size*50, '+')
      |     WHEN p_partkey % 7 = 2 THEN 'Contact'
      |     WHEN p_partkey % 7 = 3 THEN concat('$', p_size*50, '-$', p_size*60)
      |     WHEN p_partkey % 7 = 4 THEN concat('$1,', lpad(CAST(p_partkey % 1000 AS VARCHAR), 3, '0'))
      |     WHEN p_partkey % 7 = 5 THEN ' '
      |     ELSE concat('  $', p_size*50, '  ') END AS price,
      |CASE WHEN p_partkey % 4 = 0 THEN concat(p_size % 4, 'bd')
      |     WHEN p_partkey % 4 = 1 THEN 'Studio'
      |     WHEN p_partkey % 4 = 2 THEN NULL
      |     ELSE concat((p_size % 4) + 1, 'bd ') END AS bed,
      |CASE WHEN p_partkey % 2 = 0 THEN concat((p_size % 3) + 1, 'ba')
      |     ELSE concat((p_size % 3) + 1, '.5ba') END AS bath,
      |CASE WHEN p_partkey % 6 = 0 THEN lpad(CAST(p_partkey % 900 AS VARCHAR), 5, '0')
      |     ELSE CAST(78700 + p_partkey % 60 AS VARCHAR) END AS zipcode
      |FROM part""".stripMargin

  /** Full clean+cast pipeline (F1-F6, P4-P6, C1) on synthesized raws. */
  def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = rawSynth(s, d)
    val cleaned = raw
      .withColumn("sqft", Cleaning.cleanSqftStr($"sqft"))
      .filter(coalesce($"sqft", lit("")) =!= "")
      .withColumn("sqft_d", Cleaning.sqftRangeMean($"sqft"))
      .withColumn("price", nullif(Cleaning.cleanPriceStr($"price"), lit("")))
      .withColumn("bath", Cleaning.cleanBathStr($"bath"))
      .withColumn("bed", Cleaning.cleanBedStr($"bed"))
      .filter(!coalesce($"price".contains("-"), lit(false)))
    cleaned.select(
      $"p_partkey",
      $"sqft_d".cast(IntegerType).as("sqft"),
      $"price".cast(IntegerType).as("price"),
      $"bath".cast(FloatType).cast(DoubleType).as("bath"),
      $"bed".cast(FloatType).cast(DoubleType).as("bed"),
      $"zipcode".cast(IntegerType).as("zipcode"))
      .orderBy($"p_partkey")
  }

  // DuckDB CAST(double AS INT) rounds; the reference (and Spark)
  // truncate — hence TRUNC() in the oracle.
  val q20Sql: String =
    s"""WITH raw AS ($rawSynthSql),
       |cleaned AS (
       |  SELECT p_partkey,
       |    trim(replace(replace(sqft, 'sqft', ''), ',', '')) AS sqft_s,
       |    nullif(trim(replace(replace(replace(replace(price, 'Contact', ''), '$$', ''), ',', ''), '+', '')), '') AS price_s,
       |    trim(replace(bath, 'ba', '')) AS bath_s,
       |    coalesce(nullif(CASE WHEN trim(lower(replace(bed, 'bd', ''))) = 'studio' THEN '0'
       |                         ELSE trim(lower(replace(bed, 'bd', ''))) END, ''), '0') AS bed_s,
       |    zipcode
       |  FROM raw)
       |SELECT p_partkey,
       |  CAST(TRUNC(CASE WHEN contains(sqft_s, '-')
       |    THEN (CAST(split_part(sqft_s, '-', 1) AS DOUBLE) + CAST(split_part(sqft_s, '-', 2) AS DOUBLE)) / 2.0
       |    ELSE CAST(sqft_s AS DOUBLE) END) AS INT) AS sqft,
       |  CAST(price_s AS INT) AS price,
       |  CAST(CAST(bath_s AS FLOAT4) AS DOUBLE) AS bath,
       |  CAST(CAST(bed_s AS FLOAT4) AS DOUBLE) AS bed,
       |  CAST(zipcode AS INT) AS zipcode
       |FROM cleaned
       |WHERE sqft_s <> '' AND NOT coalesce(contains(price_s, '-'), false)
       |ORDER BY p_partkey""".stripMargin

  /** F7: rsplit(maxsplit=2) city/state/zip extraction, plus the
    * leading-zero-loss int cast (SURVEY §1.2 quirk). */
  def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val csz = concat($"p_name", lit(", TX "),
      when($"p_partkey" % 3 === 0, lpad(($"p_partkey" % 900).cast(StringType), 5, "0"))
        .otherwise((lit(78700) + $"p_partkey" % 60).cast(StringType)))
    Tables.part(s, d)
      .select($"p_partkey", csz.as("csz"))
      .select(
        $"p_partkey",
        Cleaning.cszCity($"csz").as("city"),
        Cleaning.cszState($"csz").as("state"),
        Cleaning.cszZip($"csz").as("zip_str"),
        Cleaning.cszZip($"csz").cast(IntegerType).as("zip_int"))
      .orderBy($"p_partkey")
  }

  val q21Sql: String =
    """WITH raw AS (
      |  SELECT p_partkey,
      |    replace(concat(p_name, ', TX ',
      |      CASE WHEN p_partkey % 3 = 0 THEN lpad(CAST(p_partkey % 900 AS VARCHAR), 5, '0')
      |           ELSE CAST(78700 + p_partkey % 60 AS VARCHAR) END), ',', '') AS csz
      |  FROM part)
      |SELECT p_partkey,
      |  regexp_extract(csz, '^(.*)\s+(\S+)\s+(\S+)$', 1) AS city,
      |  regexp_extract(csz, '^(.*)\s+(\S+)\s+(\S+)$', 2) AS state,
      |  regexp_extract(csz, '^(.*)\s+(\S+)\s+(\S+)$', 3) AS zip_str,
      |  CAST(regexp_extract(csz, '^(.*)\s+(\S+)\s+(\S+)$', 3) AS INT) AS zip_int
      |FROM raw ORDER BY p_partkey""".stripMargin

  /** F11: ordered flag-and-consume keyword featurization over documents
    * (the reference's 21-amenity NLP loop, on engine vocabulary). */
  val docKeywords: Seq[String] = Seq("data", "base", "stream", "window", "key")

  def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flagged = Cleaning.amenityFlags(
      Tables.documents(s, d).select($"doc_id", $"lang", $"text"),
      "text", docKeywords)
    flagged
      .groupBy($"lang")
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum($"data").cast(LongType).as("n_data"),
        sum($"base").cast(LongType).as("n_base"),
        sum($"stream").cast(LongType).as("n_stream"),
        sum($"window").cast(LongType).as("n_window"),
        sum($"key").cast(LongType).as("n_key"))
      .orderBy($"lang")
  }

  val q22Sql: String =
    """WITH t0 AS (SELECT doc_id, lang, lower(text) AS rest FROM documents),
      |t1 AS (SELECT doc_id, lang, CASE WHEN contains(rest, 'data') THEN 1 ELSE 0 END AS f_data,
      |       replace(rest, 'data', '') AS rest FROM t0),
      |t2 AS (SELECT doc_id, lang, f_data, CASE WHEN contains(rest, 'base') THEN 1 ELSE 0 END AS f_base,
      |       replace(rest, 'base', '') AS rest FROM t1),
      |t3 AS (SELECT doc_id, lang, f_data, f_base, CASE WHEN contains(rest, 'stream') THEN 1 ELSE 0 END AS f_stream,
      |       replace(rest, 'stream', '') AS rest FROM t2),
      |t4 AS (SELECT doc_id, lang, f_data, f_base, f_stream, CASE WHEN contains(rest, 'window') THEN 1 ELSE 0 END AS f_window,
      |       replace(rest, 'window', '') AS rest FROM t3),
      |t5 AS (SELECT doc_id, lang, f_data, f_base, f_stream, f_window, CASE WHEN contains(rest, 'key') THEN 1 ELSE 0 END AS f_key
      |       FROM t4)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(f_data) AS BIGINT) AS n_data, CAST(sum(f_base) AS BIGINT) AS n_base,
      |  CAST(sum(f_stream) AS BIGINT) AS n_stream, CAST(sum(f_window) AS BIGINT) AS n_window,
      |  CAST(sum(f_key) AS BIGINT) AS n_key
      |FROM t5 GROUP BY lang ORDER BY lang""".stripMargin

  /** F12: static one-hot, drop-first (pandas get_dummies parity). */
  def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val joined = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    Cleaning.oneHot(joined, "r_name", regions, "region")
      .select($"n_nationkey", $"n_name", $"region_america", $"region_asia",
        $"region_europe", $"region_middle_east")
      .orderBy($"n_nationkey")
  }

  val q23Sql: String =
    """SELECT n_nationkey, n_name,
      |CASE WHEN r_name = 'AMERICA' THEN 1 ELSE 0 END AS region_america,
      |CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS region_asia,
      |CASE WHEN r_name = 'EUROPE' THEN 1 ELSE 0 END AS region_europe,
      |CASE WHEN r_name = 'MIDDLE EAST' THEN 1 ELSE 0 END AS region_middle_east
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q20_clean_cast_pipeline", q20, Some(q20Sql), bench = true),
    QueryDef("q21_rsplit_city_state_zip", q21, Some(q21Sql)),
    QueryDef("q22_keyword_flags", q22, Some(q22Sql), bench = true),
    QueryDef("q23_onehot_dropfirst", q23, Some(q23Sql)),
  )
}
