package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as native codegen'd expressions.
  *
  * Web-crawled corpora mix precomposed ("é" U+00E9) and decomposed
  * ("e"+U+0301) forms of the same text; every downstream step that
  * hashes, shingles, or equality-joins on text (exact dedup, MinHash,
  * decontamination) silently treats the two as different documents
  * unless the corpus is canonicalized first. NFC is the standard fix.
  *
  * Scale shape: normalization allocates (String round-trip through
  * java.text.Normalizer), but on a real crawl the overwhelming
  * majority of rows are pure ASCII — for those [[UnicodeNormUtil.nfc]]
  * returns the input UTF8String UNCHANGED after a vectorizable byte
  * scan (`isFullAscii`), no allocation at all. Non-ASCII rows take a
  * second cheap gate (`Normalizer.isNormalized`, which inspects
  * canonical-combining classes without building the output) and only
  * the truly denormalized residue pays for the rewrite. Both
  * expressions are codegen'd (participate in whole-stage codegen, no
  * UDF boxing) and are pure per-row projections — scan-speed, no
  * shuffle, safe to push right after the source.
  */
object UnicodeNormUtil {
  /** NFC-normalize; identity (same object, zero-copy) for ASCII and
    * already-normalized input. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else {
      val j = s.toString
      if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
    }
  }

  /** True iff the string is already in NFC (ASCII short-circuits). */
  def isNfc(s: UTF8String): Boolean =
    s.isFullAscii || Normalizer.isNormalized(s.toString, Normalizer.Form.NFC)
}

/** `nfc_normalize(str)` — Unicode NFC canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"requires STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    UnicodeNormUtil.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNormUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `nfc_is_normalized(str)` — audit predicate; never allocates the
  * normalized form, so filtering on it is strictly cheaper than
  * comparing `nfc_normalize(s) = s`. */
case class NfcIsNormalized(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"requires STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    UnicodeNormUtil.isNfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNormUtil.isNfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcIsNormalized =
    copy(child = newChild)
}
