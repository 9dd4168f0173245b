package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class Catalyst operator — the one relational
  * primitive an event pipeline needs that Spark's join set lacks (kdb
  * `aj`, pandas `merge_asof`, Flink temporal join). For each left row,
  * pair it with the single right row that has the SAME key and the
  * GREATEST right-time <= left-time (ties on right-time resolved by
  * the greatest tiebreak column); no match -> right side null.
  *
  * Why an operator instead of the union+window trick (EventOps
  * .purchaseAttribution) or a range join: the whole-operator semantics
  * let the physical plan be exactly what you'd hand-write at 100 TB —
  * co-partition both sides on the key, sort within partitions, and
  * stream-merge with O(1) state (ONE buffered right row per partition,
  * not a per-key window buffer and not an O(N·M) range explosion).
  * EnsureRequirements supplies exchanges/sorts from the declared
  * requiredChildDistribution/Ordering, so AQE, skew handling, and
  * reuse all compose as with the built-in SortMergeJoin.
  *
  * The three plan pieces (SURVEY §2C custom-operator path c):
  *   - [[AsOfJoin]]      — logical node (what to compute)
  *   - [[AsOfJoinStrategy]] — SparkStrategy planning it 1:1
  *   - [[AsOfJoinExec]]  — physical merge (how), distribution-aware
  * registered through SparkSessionExtensions (GraftExtensions) and,
  * for conf-less sessions, spark.experimental.extraStrategies.
  *
  * Scope contract: key/time/tiebreak are LongType (event ids and
  * epoch-µs — the event-pipeline shape); generalizing is a matter of
  * swapping the getLong comparisons for bound orderings.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute
) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoin = copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.rightTiebreak,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute,
    left: SparkPlan,
    right: SparkPlan
) extends SparkPlan
    with BinaryExecNode {

  Seq(leftKey, rightKey, leftTime, rightTime, rightTiebreak).foreach { a =>
    require(a.dataType == LongType, s"as-of join expects LongType, got ${a.dataType} for $a")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the key — EnsureRequirements inserts
    * co-partitioning exchanges exactly as for SortMergeJoin.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** In-partition sort: (key, time) on the left; (key, time, tiebreak)
    * on the right so "last row <= t in sort order" IS the as-of winner.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending))
  )

  /** Left rows stream through unmoved, so partitioning and ordering
    * survive — a downstream per-key window reuses both.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join columns must come from the respective child's output")
    val rightWidth = right.output.size
    val outAttrs = output
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      // O(1) merge state: the not-yet-consumed right row, plus the
      // latest right row already known to be <= some consumed time.
      // Sorter iterators reuse their row buffer -> copy on fetch.
      var rNext: InternalRow = if (ri.hasNext) ri.next().copy() else null
      var last: InternalRow = null
      var lastKey = 0L

      li.map { l =>
        val lk = l.getLong(lKeyIdx)
        val lt = l.getLong(lTimeIdx)
        var continue = rNext != null
        while (continue) {
          val rk = rNext.getLong(rKeyIdx)
          if (rk < lk || (rk == lk && rNext.getLong(rTimeIdx) <= lt)) {
            if (rk == lk) { last = rNext; lastKey = rk }
            rNext = if (ri.hasNext) ri.next().copy() else null
            continue = rNext != null
          } else continue = false
        }
        val r = if (last != null && lastKey == lk) last else nullRight
        numOutputRows += 1
        proj(joined(l, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Plan `left` AS-OF `right`: per left row, the latest right row
    * (by `rightTimeCol`, ties by greatest `tiebreakCol`) with
    * `rightTimeCol <= leftTimeCol` and equal keys; unmatched left rows
    * keep null right columns. Column names must be unambiguous in
    * their own side (alias beforehand — the joined output carries both
    * sides' columns).
    */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      tiebreakCol: String
  ): DataFrame = {
    val spark = leftDf.sparkSession
    ensureStrategy(spark)
    val lp = GraftSqlShim.analyzedPlan(leftDf)
    val rp = GraftSqlShim.analyzedPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
    val plan = AsOfJoin(lp, rp, attr(lp, leftKeyCol), attr(rp, rightKeyCol),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol), attr(rp, tiebreakCol))
    GraftSqlShim.ofRows(spark, plan)
  }

  /** Sessions built with spark.sql.extensions=graft.GraftExtensions
    * already know the strategy; experimental.extraStrategies is the
    * public runtime fallback for conf-less sessions (idempotent).
    */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }
}
