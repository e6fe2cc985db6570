package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper callable from generated Java (see SimHashUtil for the
  * pattern). One MD5 digest per call via a per-thread reused
  * MessageDigest — no provider lookup, no hex string, no radix parse.
  */
object Md5ChunksUtil {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The four 32-bit big-endian chunks of md5(utf8Bytes(s)) as
    * unsigned values in longs — element i is byte-identical to
    * `conv(substring(md5(s), 8·i+1, 8), 16, 10)::long` (the q554
    * oracle-family coefficient derivation) without ever materializing
    * the 32-char hex string or running four radix-16 string parses
    * per token (SCALE.md's r17 dissection pinned the md5 family's 2×
    * per-doc cost drift at 1M docs on exactly that string churn). */
  def chunks(s: UTF8String): UnsafeArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var i = 0
    while (i < 4) {
      val o = i << 2
      out(i) = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native codegen'd `array<bigint>` of the four md5 32-bit chunks of a
  * string — the oracle-mirrorable minhash coefficient source for the
  * blocked set-similarity join (operators/IndexingQueries.blockedSetJoin)
  * at near-native cost: one digest pass per token, primitive longs out,
  * inside whole-stage codegen. Semantics are exactly the hex-substring/
  * conv chain the DuckDB oracle still spells out, so q554Sql is
  * untouched. */
case class Md5Chunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"requires STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    Md5ChunksUtil.chunks(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5ChunksUtil.chunks($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Chunks =
    copy(child = newChild)
}
