package graft

import org.apache.spark.sql.functions._

/** Schema evolution over a long-lived parquet corpus — the 100 TB
  * reality that early partitions were written before later columns
  * existed. Pins the two idioms the engine relies on:
  * `mergeSchema` on read (old files surface new columns as null) and
  * `unionByName(allowMissingColumns)` for frame-level alignment.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema read: old partitions surface added columns as null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schemaevo").toString
    // epoch 1: (id, price) — before `quality` existed
    Seq((1L, 100), (2L, 200)).toDF("id", "price")
      .write.parquet(s"$dir/batch=1")
    // epoch 2: (id, price, quality)
    Seq((3L, 300, 0.9), (4L, 400, 0.7)).toDF("id", "price", "quality")
      .write.parquet(s"$dir/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("id", "price", "quality", "batch"))
    val rows = df.orderBy($"id")
      .select($"id", $"quality").collect()
    assert(rows.take(2).forall(_.isNullAt(1)), "old rows must be null-filled")
    assert(rows.drop(2).forall(!_.isNullAt(1)))
    // and filters on the evolved column prune correctly (nulls drop)
    assert(df.filter($"quality" > 0.8).count() == 1)
  }

  test("unionByName(allowMissingColumns) aligns evolving frames") {
    import spark.implicits._
    val old = Seq((1L, "a")).toDF("id", "text")
    val nu = Seq((2L, "b", "en")).toDF("id", "text", "lang")
    val all = old.unionByName(nu, allowMissingColumns = true)
    assert(all.columns.toSet == Set("id", "text", "lang"))
    val byId = all.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2) || byId(1L).getString(2) == null)
    assert(byId(2L).getString(2) == "en")
  }

  test("type widening requires an explicit cast (mergeSchema rejects int vs long conflicts)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schemaevo2").toString
    Seq((1, 10)).toDF("id", "v").write.parquet(s"$dir/p=1")       // v: int
    Seq((2L, 20L)).toDF("id", "v").write.parquet(s"$dir/p=2")     // v: long
    val err = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    assert(err.getMessage != null)
    // the engine-level fix: read each epoch with its schema, cast, union
    val fixed = spark.read.parquet(s"$dir/p=1")
      .select($"id".cast("long"), $"v".cast("long"))
      .unionByName(spark.read.parquet(s"$dir/p=2"))
    assert(fixed.agg(sum($"v")).head.getLong(0) == 30L)
  }
}
