package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton over a fixed phrase dictionary.
  *
  * Matching runs on raw UTF-8 bytes: for valid UTF-8, a byte-substring
  * match of a phrase IS a character-substring match (no UTF-8 sequence
  * is a suffix of another's encoding), so the scan does no per-row
  * decode and no String allocation — `UTF8String.getByte` reads the
  * unsafe buffer directly. Built once on the driver from the foldable
  * dictionary, ships to executors as a codegen reference object.
  *
  * The goto function is failure-completed at build time (every
  * (node, byte) transition materialized), so the per-byte scan cost is
  * exactly one array read — no failure-link chasing in the hot loop.
  */
final class AhoCorasick(phrases: Array[Array[Byte]]) extends Serializable {

  val nPhrases: Int = phrases.length

  private val maxNodes = 1 + phrases.map(_.length).sum
  private val next = Array.fill(maxNodes * 256)(-1)
  private val fail = new Array[Int](maxNodes)
  // per-node chain of phrase ids that END at the node (own entries
  // first, then — linked at build time — the failure node's chain)
  private val outHead = Array.fill(maxNodes)(-1)
  private val outId: Array[Int] = new Array[Int](nPhrases)
  private val outLink: Array[Int] = new Array[Int](nPhrases)

  {
    var nNodes = 1
    var nOut = 0
    for (pid <- phrases.indices) {
      var v = 0
      for (b <- phrases(pid)) {
        val c = b & 0xff
        if (next(v * 256 + c) == -1) { next(v * 256 + c) = nNodes; nNodes += 1 }
        v = next(v * 256 + c)
      }
      outId(nOut) = pid; outLink(nOut) = outHead(v); outHead(v) = nOut
      nOut += 1
    }
    // BFS: failure links, goto completion, output-chain inheritance.
    // A node's failure node is strictly shallower, so it is finalized
    // before the node itself is dequeued.
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val u = next(c)
      if (u == -1) next(c) = 0
      else { fail(u) = 0; queue.add(u) }
      c += 1
    }
    while (!queue.isEmpty) {
      val v: Int = queue.poll()
      if (outHead(v) == -1) outHead(v) = outHead(fail(v))
      else {
        var tail = outHead(v)
        while (outLink(tail) != -1) tail = outLink(tail)
        outLink(tail) = outHead(fail(v))
      }
      var b = 0
      while (b < 256) {
        val u = next(v * 256 + b)
        if (u == -1) next(v * 256 + b) = next(fail(v) * 256 + b)
        else { fail(u) = next(fail(v) * 256 + b); queue.add(u) }
        b += 1
      }
    }
  }

  /** Distinct dictionary phrases occurring in `text`, each counted once
    * — the blocklist semantic ("how many terms appear"), not occurrence
    * totals. Early-exits once every phrase has matched.
    */
  def countDistinct(text: UTF8String): Int = {
    if (nPhrases == 0) return 0
    val seen = new Array[Boolean](nPhrases)
    var cnt = 0
    var v = 0
    var i = 0
    val n = text.numBytes()
    while (i < n) {
      v = next(v * 256 + (text.getByte(i) & 0xff))
      var o = outHead(v)
      while (o != -1) {
        val pid = outId(o)
        if (!seen(pid)) {
          seen(pid) = true
          cnt += 1
          if (cnt == nPhrases) return cnt
        }
        o = outLink(o)
      }
      i += 1
    }
    cnt
  }
}

/** `count_phrases(text, array('…', …))` — the number of DISTINCT
  * dictionary phrases occurring as substrings of `text`, via one
  * [[AhoCorasick]] pass. The naive spelling —
  * `size(filter(dict, p => contains(text, p)))` — scans the text once
  * PER PHRASE (O(|text|·|dict|)) with an interpreted lambda; a regex
  * alternation compiles the dictionary into a backtracking pattern.
  * This is O(|text|) per row regardless of dictionary size — the shape
  * blocklist/safety filtering needs when the dictionary is thousands of
  * phrases and the corpus is 100 TB.
  *
  * `right` must be a foldable array<string>; empty/null phrases are
  * skipped.
  */
case class CountPhrases(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "count_phrases expects (string, foldable array<string>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def dataType: DataType = IntegerType

  @transient private lazy val ac: AhoCorasick = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val phrases = ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val p = arr.getUTF8String(i).getBytes
        if (p.nonEmpty) phrases += p
      }
      i += 1
    }
    new AhoCorasick(phrases.toArray)
  }

  override def nullSafeEval(t: Any, d: Any): Any =
    ac.countDistinct(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $acRef.countDistinct($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountPhrases =
    copy(left = newLeft, right = newRight)
}
