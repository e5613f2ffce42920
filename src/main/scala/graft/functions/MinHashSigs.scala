package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.10 D5 depth — the MinHash signature kernel fused into ONE
  * native expression: for a token array, `sigs[i] = min over tokens of
  * hex(md5(token)).substring(5i, 5i+5)` for i in 0..5 — the disjoint
  * 20-bit-slice signature family every A10 dedup query builds.
  *
  * The composed form (`transform(toks, md5)` then six
  * `array_min(transform(hs, substring(...)))` passes) materializes a
  * 32-chars-per-token hash array and walks it six times, allocating a
  * UTF8String per slice per token; this kernel digests each token once
  * and keeps six running minima — zero intermediate arrays, one
  * allocation per UPDATED minimum.
  *
  * Semantics mirror the composed form exactly, which the bit-identity
  * spec (MinHashSigsSpec) pins: md5 of the UTF8 bytes rendered as 32
  * lowercase hex chars, slices compared as UTF8 binary (ASCII hex ⇒ same
  * order), null tokens skipped (array_min ignores nulls), an empty or
  * all-null array yields all-null signatures.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  val NumHashes = 6
  val SliceLen = 5

  private val hexChars = "0123456789abcdef".toCharArray

  /** One digest per token, six running minima — called from both the
    * interpreted eval and the generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val mins = new Array[UTF8String](NumHashes)
    val md = MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // 32 lowercase hex chars, exactly Spark's md5() rendering
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexChars((digest(b) >> 4) & 0xf)
          hex(2 * b + 1) = hexChars(digest(b) & 0xf)
          b += 1
        }
        var h = 0
        while (h < NumHashes) {
          val s = UTF8String.fromString(new String(hex, h * SliceLen, SliceLen))
          if (mins(h) == null || s.compareTo(mins(h)) < 0) mins(h) = s
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }
}
