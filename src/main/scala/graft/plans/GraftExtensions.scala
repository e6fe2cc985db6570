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
    // The declarative dot-product fold becomes the native kernel
    // automatically for any session built with these extensions.
    ext.injectOptimizerRule(_ => FoldToNativeVectorOps)
  }
}
