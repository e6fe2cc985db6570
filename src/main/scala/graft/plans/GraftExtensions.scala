package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injection point: enables the engine's native
  * expressions in ANY session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * — including SQL-only clients (thrift/connect) that never call
  * [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_fast"),
      new ExpressionInfo(classOf[Md5Hex].getName, "md5_fast"),
      (es: Seq[Expression]) => Md5Hex(es.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (es: Seq[Expression]) => RollingHash(es.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((
      FunctionIdentifier("nfc_is_normalized"),
      new ExpressionInfo(classOf[NfcIsNormalized].getName, "nfc_is_normalized"),
      (es: Seq[Expression]) => NfcIsNormalized(es.head)))
    // Native bounded-state aggregates (sketch family). Literal
    // arguments resolve at function-build time, same contract as the
    // per-session register() helpers.
    def intLit(e: Expression, what: String): Int = e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an int literal, got $other")
    }
    def psLit(e: Expression, what: String): Array[Double] = e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"$what must be an array<double> literal, got $other")
    }
    def agg(name: String, build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name),
        build))
    agg("mg_topk", es => MisraGries(es.head, intLit(es(1), "mg_topk k")).toAggregateExpression())
    agg("mg_bin", es => MgBinAgg(es.head, intLit(es(1), "mg_bin k")).toAggregateExpression())
    agg("mg_merge", es => MgMergeAgg(es.head).toAggregateExpression())
    agg("hll_distinct", es => HllDistinct(es.head).toAggregateExpression())
    agg("hll_bin", es => HllBinAgg(es.head).toAggregateExpression())
    agg("hll_merge", es => HllMergeAgg(es.head).toAggregateExpression())
    agg("qsketch", es => QuantileSketchAgg(es.head, intLit(es(1), "qsketch k"),
      psLit(es(2), "qsketch ps")).toAggregateExpression())
    agg("qsketch_bin", es => QuantileSketchBinAgg(es.head,
      intLit(es(1), "qsketch_bin k")).toAggregateExpression())
    agg("qsketch_merge", es => QuantileSketchMergeAgg(es.head,
      psLit(es(1), "qsketch_merge ps")).toAggregateExpression())
    agg("cm_sketch", es => CountMinSketch(es.head, intLit(es(1), "cm_sketch depth"),
      intLit(es(2), "cm_sketch width")).toAggregateExpression())
    agg("clamp_fold", es => ClampFoldAgg(es(0), es(1), es(2)).toAggregateExpression())
    // The declarative dot-product fold becomes the native kernel
    // automatically for any session built with these extensions.
    ext.injectOptimizerRule(_ => FoldToNativeVectorOps)
  }
}
