package graft

import graft.operators.Similarity
import graft.plans.GraftFunctions

/** Native CosineSim must be bit-identical to the Column-API fold it
  * replaces (the oracle parity of every similarity query depends on
  * it), in both the codegen and interpreted paths. */
class VectorExprSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 50).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native cosine is bit-identical to the aggregate/zip_with fold") {
    GraftFunctions.register(spark)
    val df = vecs.select(
      Similarity.cosine(Similarity.toDoubleArr(col("a")),
        Similarity.toDoubleArr(col("b"))).as("fold"),
      GraftFunctions.vec_cosine(Similarity.toDoubleArr(col("a")),
        Similarity.toDoubleArr(col("b"))).as("native"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fold=${r.getDouble(0)} native=${r.getDouble(1)}")
    }
  }

  test("interpreted eval matches codegen result") {
    GraftFunctions.register(spark)
    val expr = graft.plans.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5, -1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    import spark.implicits._
    val viaPlan = Seq((Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0)))
      .toDF("a", "b")
      .select(GraftFunctions.vec_cosine(col("a"), col("b")))
      .head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(interpreted) ==
      java.lang.Double.doubleToLongBits(viaPlan))
  }

  test("null array yields null; mismatched lengths use the common prefix") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0, 9.0))),
      (None, Some(Array(1.0)))).toDF("a", "b")
      .select(GraftFunctions.vec_cosine(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }

  test("vec_dot with a null ELEMENT returns null, matching the fold") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // containsNull=true inputs: the checked kernel must return null
    // (the zip_with/aggregate fold it advertises parity with does),
    // never read raw 0.0 slots. Dense rows through the same nullable
    // schema still produce the exact unchecked value.
    val df = Seq(
      (Seq[Option[Double]](Some(2.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(2.0), Some(5.0)), Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val viaSql = df.selectExpr("vec_dot(a, b) AS d").collect()
    assert(viaSql(0).isNullAt(0), "null element must poison the product")
    assert(viaSql(1).getDouble(0) == 2.0 * 3.0 + 5.0 * 4.0)
    // fold parity on the null-element row
    val fold = df.limit(1).select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d")).head
    assert(fold.isNullAt(0))
  }

  test("vec_cosine with a null ELEMENT returns null, never a 0.0-polluted similarity") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(2.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(1.0), Some(0.0)), Seq[Option[Double]](Some(1.0), Some(0.0))))
      .toDF("a", "b")
    val got = df.selectExpr("vec_cosine(a, b) AS c").collect()
    assert(got(0).isNullAt(0),
      "a null slot must null the similarity — 0.0-for-null is a plausible WRONG answer")
    assert(math.abs(got(1).getDouble(0) - 1.0) < 1e-12,
      "dense rows through a nullable schema keep exact values")
  }
}
