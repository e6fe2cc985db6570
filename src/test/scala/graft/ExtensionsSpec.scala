package graft

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions applies injections cleanly; SQL function path works") {
    // apply() must register both functions without throwing (the
    // spark.sql.extensions config path instantiates + applies exactly
    // this object at session build time)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)

    // end-to-end SQL path through the session registry
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql("SELECT simhash64('a b c') AS sh, rolling_hash('abc') AS rh").head()
    assert(r.getLong(0) != 0L)
    assert(r.getLong(1) ==
      "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31 + (b & 0xff)))
  }

  test("FoldToNativeVectorOps rewrites the dot-product fold to the native kernel") {
    import spark.implicits._
    import graft.plans.{DotProduct, FoldToNativeVectorOps}
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val folded = df.select(
      graft.operators.Similarity.dot($"a", $"b").as("d"))
    val rewritten = FoldToNativeVectorOps(folded.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[DotProduct])),
      s"fold not rewritten:\n$rewritten")
    // value parity: fold, native SQL function, and expectation agree
    graft.plans.GraftFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val native = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(folded.head().getDouble(0) == 32.0 && native == 32.0)
    // a non-dot fold must NOT be rewritten (sum of squares)
    val other = df.select(org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.zip_with($"a", $"b", (x, y) => x * y),
      org.apache.spark.sql.functions.lit(1.0), (acc, e) => acc + e).as("s"))
    val untouched = FoldToNativeVectorOps(other.queryExecution.analyzed)
    assert(!untouched.expressions.exists(_.exists(_.isInstanceOf[DotProduct])))
  }

  test("native vec_dot matches fold null semantics on mismatched lengths") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("a", "b")
    val folded = df.select(
      graft.operators.Similarity.dot($"a", $"b").as("d")).head()
    df.createOrReplaceTempView("vecs_mismatch")
    val native = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs_mismatch").head()
    assert(folded.isNullAt(0), "zip_with pads with null, poisoning the fold")
    assert(native.isNullAt(0), "native must mirror the fold's null")
  }
}
