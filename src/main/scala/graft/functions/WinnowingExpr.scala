package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set of a pre-stripped string as one native
  * Catalyst expression: md5-hash every character k-gram, take the minimum
  * hash of each sliding window of `w` grams (monotonic-deque, O(n) total,
  * not O(n*w)), return the distinct selected hashes.
  *
  * The pure-builtin spelling ([[graft.pipeline.Winnowing.fingerprintSetHof]])
  * nests three higher-order functions; HOFs are CodegenFallback, so every
  * gram/window evaluates through the interpreter with per-element slice
  * allocations — measured ~20x slower corpus-wide. This expression does
  * the whole row in one tight JVM pass and lets the surrounding
  * projection stay whole-stage-codegen'd (the generated code calls
  * straight into [[compute]] via a reference object).
  *
  * Semantics are bit-identical to the builtin form and the DuckDB oracle:
  * code-point k-grams (SQL `substr` counts code points, not UTF-16
  * units), lowercase-hex md5, lexicographic minima (= byte order on
  * ASCII hex), strings shorter than k+w-1 code points → empty set.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fps needs k >= 1 and w >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string column, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The whole-row kernel; public so generated code can call it. */
  def compute(input: UTF8String): ArrayData = {
    val cp = input.toString.codePoints().toArray
    if (cp.length < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = cp.length - k + 1
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = md5Hex(md, new String(cp, i, k))
      i += 1
    }
    // sliding-window minimum via monotonic deque of indices
    val selected = new java.util.LinkedHashSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()).compareTo(hashes(j)) >= 0)
        deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst() <= j - w) deque.pollFirst()
      if (j >= w - 1) selected.add(hashes(deque.peekFirst()))
      j += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}
