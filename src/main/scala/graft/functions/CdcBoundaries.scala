package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.10 D5 — native content-defined-chunking boundary
  * detector: the TRUE rolling-hash kernel behind `m6_cdc_chunks`'
  * hash-per-window relational form. One O(n) pass per document — each
  * position updates the window hash with one multiply, one subtract,
  * one add — versus the composed form's O(n·w) full re-hash (md5 over
  * the 8-char window at every position). Same cost class as rsync/LBFS
  * gear hashing, which is the point: boundary detection must be cheaper
  * than the I/O that feeds it.
  *
  * Boundary rule: over the 8-char trailing window ending at 1-based
  * position p (8 ≤ p < length), the polynomial hash
  * `Σ code(c_i)·31^(7-i) mod 2^20` puts a boundary at p iff
  * `h % 37 == 0` (expected chunk ≈ 37 chars). 37 is deliberately
  * coprime to the 2^20 modulus — a power-of-two selector would reduce
  * to a weak parity of the codes (31 ≡ −1 mod 32).
  *
  * Characters are UTF-16 code units (Java `charAt`) — identical to code
  * points on the BMP; the oracle replicates with DuckDB `unicode()`,
  * equal for the ASCII fixture corpus.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  private final val W = 8          // window length (chars)
  private final val M = 1 << 20    // hash modulus
  private final val SEL = 37       // boundary selector, coprime to M
  private final val P7 = {         // 31^(W-1) mod M, the outgoing weight
    var p = 1L; var i = 0
    while (i < W - 1) { p = p * 31 % M; i += 1 }
    p
  }

  /** O(n) rolling boundary scan; static so generated code calls it
    * directly (the kernel is real compiled Scala, not interpreted
    * expression-tree walking). */
  def kernel(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n <= W) return new GenericArrayData(Array.emptyIntArray)
    var h = 0L
    var i = 0
    while (i < W) { h = (h * 31 + str.charAt(i)) % M; i += 1 }
    val out = new java.util.ArrayList[Integer]()
    var p = W
    while (p < n) {
      if (h % SEL == 0) out.add(p)
      // slide: drop char (p-W), admit char p — one mul, one sub, one add
      h = ((h + M - str.charAt(p - W) * P7 % M) % M * 31 + str.charAt(p)) % M
      p += 1
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }
}
