package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dot product of two double arrays as a native Catalyst expression.
  *
  * The built-in way to fold a vector —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — runs the lambda
  * interpreter per element and allocates an intermediate array per row;
  * at |corpus| x |queries| pair counts that interpretive overhead is the
  * bottleneck (measured ~3x end-to-end on the embedding-dedup query).
  * This expression is one whole-stage-codegen'd loop over the two
  * ArrayData buffers: no allocation, no virtual dispatch per element.
  *
  * Summation is sequential in array order — bit-identical to the folded
  * builtin and to the DuckDB oracle's list_dot_product.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed identifiers: with non-nullable inputs the
      // code inlines without a scoping block, and two DotProducts in one
      // generated function (e.g. a join predicate using vec_dot twice)
      // would otherwise redefine the locals and force the whole predicate
      // back to interpreter mode
      val n = ctx.freshName("vdN")
      val i = ctx.freshName("vdI")
      val sum = ctx.freshName("vdSum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of array elements contained in a literal string set — the
  * codegen'd replacement for `size(filter(arr, x => x.isin(set)))`,
  * whose lambda runs interpreted per element. Marker/stopword counting
  * (language ID runs FOUR of these per row) is a pure scan op; this
  * keeps it inside whole-stage codegen with one hash probe per token.
  *
  * `right` must be a foldable array<string> (the set), evaluated once on
  * the driver into a hash set that ships as a codegen reference object.
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "count_in_set expects (array<string>, foldable array<string>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval().asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("cisSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("cisI")
      val cnt = ctx.freshName("cisCnt")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Register the custom expressions in the session's function registry
    * (idempotent — a lookup guard keeps repeated calls from rewriting the
    * registry and spamming `SimpleFunctionRegistry` replace warnings;
    * also makes them usable from SQL text).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val vd = org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")
    if (!reg.functionExists(vd)) {
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    }
    val cis = org.apache.spark.sql.catalyst.FunctionIdentifier("count_in_set")
    if (!reg.functionExists(cis)) {
      reg.createOrReplaceTempFunction(
        "count_in_set", exprs => CountInSet(exprs(0), exprs(1)), "built-in")
    }
    val wf = org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fps")
    if (!reg.functionExists(wf)) {
      reg.createOrReplaceTempFunction(
        "winnow_fps",
        exprs => WinnowFingerprints(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
    val nn = org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize")
    if (!reg.functionExists(nn)) {
      reg.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs(0)), "built-in")
    }
    val cp = org.apache.spark.sql.catalyst.FunctionIdentifier("count_phrases")
    if (!reg.functionExists(cp)) {
      reg.createOrReplaceTempFunction(
        "count_phrases", exprs => CountPhrases(exprs(0), exprs(1)), "built-in")
    }
    val ba = org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_agg")
    if (!reg.functionExists(ba)) {
      // Spark's own runtime-filter bloom machinery (the expressions
      // behind spark.sql.optimizer.runtime.bloomFilter.*), surfaced as
      // session functions: build over xxhash64 of the keys, probe with
      // the same hash. Both are codegen-friendly and the aggregate is
      // map-side combinable (bitmaps OR-merge).
      reg.createOrReplaceTempFunction(
        "bloom_agg",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
    }
    val bc = org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_contains")
    if (!reg.functionExists(bc)) {
      reg.createOrReplaceTempFunction(
        "bloom_contains",
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
    }
    val mg = org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries")
    if (!reg.functionExists(mg)) {
      reg.createOrReplaceTempFunction(
        "misra_gries",
        exprs => MisraGriesAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
    val bp = org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_count")
    if (!reg.functionExists(bp)) {
      reg.createOrReplaceTempFunction(
        "bpe_count", exprs => BpeEncodedCount(exprs(0), exprs(1), exprs(2)),
        "built-in")
    }
    val bpp = org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_pieces")
    if (!reg.functionExists(bpp)) {
      reg.createOrReplaceTempFunction(
        "bpe_pieces", exprs => BpeEncodePieces(exprs(0), exprs(1), exprs(2)),
        "built-in")
    }
    val cc = org.apache.spark.sql.catalyst.FunctionIdentifier("capped_collect")
    if (!reg.functionExists(cc)) {
      reg.createOrReplaceTempFunction(
        "capped_collect",
        exprs => CappedCollectLongAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
    val cm = org.apache.spark.sql.catalyst.FunctionIdentifier("count_min_md5")
    if (!reg.functionExists(cm)) {
      // the analyzer wraps a bare AggregateFunction into an
      // AggregateExpression at resolution, same as builtin aggregates
      reg.createOrReplaceTempFunction(
        "count_min_md5",
        exprs => CountMinAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
  }

  /** Column API for [[DotProduct]]; inputs must be array<double>. */
  def vecDot(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("vec_dot", a, b)
  }

  /** Column API for [[NfcNormalize]]: Unicode NFC canonicalization. */
  def nfcNormalize(s: Column): Column = {
    register(SparkSession.active)
    call_function("nfc_normalize", s)
  }

  /** Column API for [[CountPhrases]]: distinct dictionary phrases
    * occurring as substrings, one Aho–Corasick pass.
    */
  def countPhrases(text: Column, phrases: Seq[String]): Column = {
    register(SparkSession.active)
    call_function("count_phrases", text,
      org.apache.spark.sql.functions.array(
        phrases.map(org.apache.spark.sql.functions.lit): _*))
  }

  /** Column API for [[CountInSet]]: tokens in a literal string set. */
  def countInSet(arr: Column, set: Seq[String]): Column = {
    register(SparkSession.active)
    call_function("count_in_set", arr,
      org.apache.spark.sql.functions.array(
        set.map(org.apache.spark.sql.functions.lit): _*))
  }

  /** Column API for [[WinnowFingerprints]]: winnowing fingerprint set of
    * a pre-stripped string.
    */
  def winnowFps(s: Column, k: Int, w: Int): Column = {
    register(SparkSession.active)
    call_function("winnow_fps", s,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }

  /** Aggregate a column into a serialized bloom filter (binary) sized
    * for `expectedItems` at `fpp` — Spark's runtime-filter
    * BloomFilterAggregate over xxhash64 of the values.
    */
  def bloomAgg(v: Column, expectedItems: Long, fpp: Double): Column = {
    register(SparkSession.active)
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    call_function("bloom_agg", org.apache.spark.sql.functions.xxhash64(v),
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(bits))
  }

  /** Probe a serialized bloom filter (e.g. a [[bloomAgg]] result as a
    * literal) for a value — false positives possible, false negatives
    * not. A pure codegen'd per-row predicate: the scan-side shape of a
    * semi join whose build side is driver-small.
    */
  def bloomContains(bloom: Column, v: Column): Column = {
    register(SparkSession.active)
    call_function("bloom_contains", bloom,
      org.apache.spark.sql.functions.xxhash64(v))
  }

  /** Column API for [[BpeEncodedCount]]: encoded-symbol total of a
    * tokenized document under a BPE merge ladder (rank order).
    */
  def bpeCount(words: Column, merges: Seq[(String, String)]): Column = {
    register(SparkSession.active)
    // cast keeps an EMPTY ladder typed array<string> (array() is
    // array<null> and would fail the type check)
    call_function("bpe_count", words,
      org.apache.spark.sql.functions.array(
        merges.map(m => org.apache.spark.sql.functions.lit(m._1)): _*)
        .cast("array<string>"),
      org.apache.spark.sql.functions.array(
        merges.map(m => org.apache.spark.sql.functions.lit(m._2)): _*)
        .cast("array<string>"))
  }

  /** Column API for [[BpeEncodePieces]]: encoded pieces of a tokenized
    * document under a BPE merge ladder, flattened in word order.
    */
  def bpePieces(words: Column, merges: Seq[(String, String)]): Column = {
    register(SparkSession.active)
    call_function("bpe_pieces", words,
      org.apache.spark.sql.functions.array(
        merges.map(m => org.apache.spark.sql.functions.lit(m._1)): _*)
        .cast("array<string>"),
      org.apache.spark.sql.functions.array(
        merges.map(m => org.apache.spark.sql.functions.lit(m._2)): _*)
        .cast("array<string>"))
  }

  /** Column API for [[MisraGriesAgg]]: at-most-k frequent-item
    * candidates of a string column as a map<string,long>.
    */
  def misraGries(v: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function("misra_gries", v, org.apache.spark.sql.functions.lit(k))
  }

  /** Column API for [[CappedCollectLongAgg]]: collect_list of a long
    * column truncated at `cap` elements per group (skew-safe; see the
    * aggregate's invariants).
    */
  def cappedCollect(v: Column, cap: Int): Column = {
    register(SparkSession.active)
    call_function("capped_collect", v,
      org.apache.spark.sql.functions.lit(cap))
  }

  /** Column API for [[CountMinAgg]]: aggregate a string column into a
    * depth x width Count-Min sketch (flattened row-major long array).
    */
  def countMinMd5(v: Column, depth: Int, width: Int): Column = {
    register(SparkSession.active)
    call_function("count_min_md5", v,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))
  }
}
