package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Whole-operator engine extension: a NATIVE left as-of join — logical
  * node, planner strategy, and physical operator, registered through
  * `SparkSessionExtensions`/`experimental` — the ladder step past custom
  * expressions for semantics the built-in operators cannot express as
  * one operator.
  *
  * Semantics match [[graft.operators.AsOfJoin.asofJoin]] (each left row
  * pairs with the right row holding the greatest `(rightTime, tieBreak)`
  * at or before its time within the key group, else nulls; null right
  * times never match). The window-based composition is the portable
  * spelling; this operator is the engine-native one:
  *
  *   - requiredChildDistribution co-partitions both sides on the key
  *     (EnsureRequirements inserts the minimal exchanges — one shuffle
  *     per side, exactly like a sort-merge join),
  *   - requiredChildOrdering asks for (key, time[, tieBreak]) sort,
  *   - doExecute merges the two sorted partition streams with a single
  *     forward pointer per partition — O(|L|+|R|) with O(1) state,
  *     where the window form must materialize the per-key frame state
  *     and run the full union through one Window operator.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Expression) extends BinaryNode {
  // analysis-time type agreement: the merge uses ONE interpreted
  // ordering built from the LEFT side's types — mismatched sides must
  // fail here as an analysis error, not as an executor-side
  // ClassCastException deep inside a task
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types must match: left=${leftKey.dataType} " +
      s"right=${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match: left=${leftTime.dataType} " +
      s"right=${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(tieBreak, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val rBuf = ri.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // the carried candidate: a COPY of the most recent matching right
      // row (sorted-iterator rows are reused buffers) + its key, re-read
      // from the copy so the key bytes outlive the buffer too
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      li.map { l =>
        val k = lKey.eval(l)
        val t = lTime.eval(l)
        if (k == null || t == null) joined(l, nullRight)
        else {
          var scan = true
          while (scan && rBuf.hasNext) {
            val h = rBuf.head
            val hk = rKey.eval(h)
            val ht = rTime.eval(h)
            if (hk == null || ht == null) { rBuf.next(); () } // sorted first, unmatchable
            else {
              val ck = keyOrd.compare(hk, k)
              if (ck < 0) { rBuf.next(); () }
              else if (ck == 0 && timeOrd.compare(ht, t) <= 0) {
                lastMatch = h.copy()
                lastMatchKey = rKey.eval(lastMatch)
                rBuf.next(); ()
              } else scan = false
            }
          }
          val hit = lastMatch != null && keyOrd.compare(lastMatchKey, k) == 0
          joined(l, if (hit) lastMatch else nullRight)
        }
      }
    }
  }
}

/** DataFrame-level entry point (installs the strategy on first use). */
object NativeAsOf {

  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val has = spark.experimental.extraStrategies
      .exists(_.isInstanceOf[AsOfJoinStrategy])
    if (!has) spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ new AsOfJoinStrategy
  }

  /** Left as-of join on a single key and time column per side; the
    * output carries BOTH sides' columns (right side nullable) — callers
    * project/rename. Column names must be unambiguous across sides.
    */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      tieBreak: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name)}"))
    GraftSqlBridge.ofRows(spark,
      AsOfJoinNode(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs), attr(rp, tieBreak)))
  }
}
