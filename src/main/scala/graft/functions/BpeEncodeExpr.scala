package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel for [[BpeEncodedCount]] — a plain object so whole-stage
  * codegen can call it through the Scala static forwarder.
  */
object BpeUtil {

  /** Encoded-symbol total of a word array under a BPE merge ladder:
    * per word, spell into code-point tokens, then apply each merge in
    * rank order as one greedy LEFT-TO-RIGHT pass (pending trailing
    * token; a merged token never re-matches as `l` within its own pass
    * since l+r != l) — byte-for-byte the subword-nmt pairing that
    * [[graft.pipeline.Bpe.applyMerge]] expresses as a fold and the
    * DuckDB oracle replays with `list_reduce`. Empty words carry no
    * symbols. One compiled loop per row: the fold form runs the
    * higher-order-function interpreter per token per merge and fell out
    * of whole-stage codegen (the round-12 q91 2x regression).
    */
  def encodedCount(words: ArrayData, ls: Array[String],
      rs: Array[String]): Long = {
    var total = 0L
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      if (!words.isNullAt(wi))
        total += countWord(words.getUTF8String(wi).toString, ls, rs)
      wi += 1
    }
    total
  }

  /** Symbol count of one word after the merge ladder. */
  def countWord(w: String, ls: Array[String], rs: Array[String]): Int = {
    val toks = spell(w)
    if (toks.length <= 1) toks.length
    else runLadder(toks, toks.length, ls, rs)
  }

  /** Initial spelling: one token per code point (the `(.)` regex both
    * engines use matches a code point, not a UTF-16 unit).
    */
  private def spell(w: String): Array[String] = {
    val toks = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var t = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      i += Character.charCount(cp)
      toks(t) = new String(Character.toChars(cp))
      t += 1
    }
    toks
  }

  /** In-place greedy ladder over `toks[0, len)`; returns the new length. */
  private def runLadder(toks: Array[String], len0: Int,
      ls: Array[String], rs: Array[String]): Int = {
    var len = len0
    var m = 0
    while (m < ls.length && len > 1) {
      val l = ls(m)
      val r = rs(m)
      // in-place greedy pass: out trails j, so reads stay ahead of writes
      var out = 1
      var j = 1
      while (j < len) {
        if (toks(out - 1) == l && toks(j) == r) toks(out - 1) = l + r
        else { toks(out) = toks(j); out += 1 }
        j += 1
      }
      len = out
      m += 1
    }
    len
  }

  /** Encoded pieces of one word — the same spell + ladder kernel as
    * [[countWord]], returning the surviving tokens.
    */
  def encodeWord(w: String, ls: Array[String], rs: Array[String]): Array[String] = {
    val toks = spell(w)
    if (toks.length <= 1) return toks
    val len = runLadder(toks, toks.length, ls, rs)
    if (len == toks.length) toks else java.util.Arrays.copyOf(toks, len)
  }

  /** Encoded pieces of a word array under the ladder, flattened in word
    * order — the serving/packing twin of [[encodedCount]] (null and
    * empty words contribute no pieces).
    */
  def encodedPieces(words: ArrayData, ls: Array[String],
      rs: Array[String]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.unsafe.types.UTF8String]
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      if (!words.isNullAt(wi)) {
        val pieces =
          encodeWord(words.getUTF8String(wi).toString, ls, rs)
        var p = 0
        while (p < pieces.length) {
          out += org.apache.spark.unsafe.types.UTF8String.fromString(pieces(p))
          p += 1
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Per-row BPE corpus encoding as a native Catalyst expression: the
  * encoded-symbol total of a tokenized document under a learned merge
  * ladder. `second`/`third` must be foldable array<string> columns (the
  * ladder's left and right symbols in rank order), evaluated once on the
  * driver and shipped as codegen reference objects. This is the
  * one-pass 100 TB tokenization shape: no join, no shuffle, no
  * higher-order-function interpretation — one whole-stage-codegen'd
  * call per row.
  */
case class BpeEncodedCount(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _),
          ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bpe_count expects (array<string>, foldable array<string>, " +
          s"foldable array<string>), got (${first.dataType.sql}, " +
          s"${second.dataType.sql}, ${third.dataType.sql})")
    }

  override def dataType: DataType = LongType

  private def evalStrings(e: Expression): Array[String] = {
    val arr = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i).toString)
  }

  @transient private lazy val ls: Array[String] = evalStrings(second)
  @transient private lazy val rs: Array[String] = evalStrings(third)

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    BpeUtil.encodedCount(w.asInstanceOf[ArrayData], ls, rs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLs", ls, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRs", rs, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = graft.functions.BpeUtil.encodedCount($w, $lRef, $rRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeEncodedCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Per-row BPE encoding returning the PIECES — [[BpeEncodedCount]]'s
  * serving/packing twin (a trainer needs token ids/pieces, not just
  * budget counts), sharing the same static spell + greedy-ladder kernel
  * and the same codegen shape: one whole-stage-codegen'd static call
  * per row, ladder constants shipped as reference objects. Output is
  * the per-word piece arrays flattened in word order.
  */
case class BpeEncodePieces(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _),
          ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bpe_pieces expects (array<string>, foldable array<string>, " +
          s"foldable array<string>), got (${first.dataType.sql}, " +
          s"${second.dataType.sql}, ${third.dataType.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def evalStrings(e: Expression): Array[String] = {
    val arr = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i).toString)
  }

  @transient private lazy val ls: Array[String] = evalStrings(second)
  @transient private lazy val rs: Array[String] = evalStrings(third)

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    BpeUtil.encodedPieces(w.asInstanceOf[ArrayData], ls, rs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLs", ls, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRs", rs, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = graft.functions.BpeUtil.encodedPieces($w, $lRef, $rRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeEncodePieces =
    copy(first = newFirst, second = newSecond, third = newThird)
}
