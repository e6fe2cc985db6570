package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Static vector kernels callable from generated Java. */
object VectorOps {

  /** Cosine similarity in ONE pass over both arrays. Accumulation
    * order matches the Column-API fold (`aggregate(zip_with(...))`)
    * exactly — sequential left-to-right adds per accumulator, then
    * `dot / (sqrt(na) * sqrt(nb))` — so results are bit-identical to
    * the fold (and to DuckDB's list_dot_product oracle recipe). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product, left-to-right accumulation — bit-identical to the
    * Column-API fold `aggregate(zip_with(a, b, _*_), 0.0, _+_)`. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Null-element-aware cosine: any null slot in the common prefix
    * yields null instead of silently reading the slot as 0.0 (a
    * plausible-but-wrong similarity is the worst failure mode for
    * dedup/ranking). Only reached when a child's static type admits
    * null elements — dense inputs keep the branch-free [[cosine]]. */
  def cosineChecked(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Null-element-aware dot product: any null slot yields null, exactly
    * like the fold (`zip_with` emits a null product, which poisons the
    * `aggregate` sum). Only reached when a child's static type says
    * containsNull=true — dense inputs keep the branch-free [[dot]]. */
  def dotChecked(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Native cosine similarity over two `array<double>` columns.
  *
  * The Column-API form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * plus two norm folds) is a higher-order-function tree — Catalyst
  * executes those as `CodegenFallback` with a closure call per
  * element, and it walks each array three times. This expression is
  * one generated-code loop per row, inside whole-stage codegen, with
  * identical numeric results (see [[VectorOps.cosine]]).
  *
  * Null arrays propagate to null via nullSafeEval; a null ELEMENT
  * yields null too (via [[VectorOps.cosineChecked]]) when a child's
  * static type admits one — a 0.0-for-null slot would be a plausible
  * but WRONG similarity, the worst failure mode for dedup. Dense
  * (containsNull=false) inputs keep the branch-free kernel. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (elementsNullable) VectorOps.cosineChecked(a, b)
    else VectorOps.cosine(a, b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |java.lang.Double ${ev.value}_r = graft.plans.VectorOps.cosineChecked($a, $b);
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.doubleValue();
           |}
         """.stripMargin)
    else
      defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<double>` columns — the codegen'd
  * single-loop form of the zip_with/aggregate fold. Mismatched lengths
  * yield null, matching the fold (zip_with pads with null, null
  * poisons the sum). Null ELEMENTS also match the fold: any null slot
  * yields null. The per-element check is emitted only when a child's
  * static type admits nulls (containsNull), so the optimizer-rewrite
  * path — guarded on containsNull=false — keeps the branch-free loop;
  * direct `vec_dot` callers over parquet arrays (containsNull=true by
  * default) get fold-exact semantics instead of reading raw 0.0 slots.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) null
    else if (elementsNullable) VectorOps.dotChecked(a, b)
    else VectorOps.dot(a, b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (elementsNullable)
        s"""
           |java.lang.Double ${ev.value}_r = null;
           |if ($a.numElements() == $b.numElements()) {
           |  ${ev.value}_r = graft.plans.VectorOps.dotChecked($a, $b);
           |}
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.doubleValue();
           |}
         """.stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.plans.VectorOps.dot($a, $b);
           |}
         """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
