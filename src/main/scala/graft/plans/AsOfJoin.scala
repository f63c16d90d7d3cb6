package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.GraftPlanBridge
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** AS-OF join as a first-class operator: logical node + planner strategy +
  * physical merge operator, the SURVEY §2 option-(c) path for semantics
  * Spark's built-ins lack. (The compositional window formulation of the
  * same semantics is `Relational.q21AsofJoin`; this operator exists because
  * the windowed shape must union both timelines and buffer a window frame,
  * while a dedicated merge join streams each side once.)
  *
  * Physical contract: both children hash-clustered on the key and sorted
  * (key, time[, tie-breakers]) — EnsureRequirements inserts the exchanges
  * and sorts exactly as it would for a sort-merge join, so at 100 TB this
  * is one shuffle per side (zero when bucketed), then a forward-only
  * in-partition merge with O(1) state per key: no window buffer, no
  * unioned timeline materialization.
  *
  * Tie semantics match q21's oracle: at equal times the right row latest in
  * (time, tieBreak…) order wins; `rightTime <= leftTime` inclusive.
  *
  * Measured (sf0.1, local[4]): ~0.4s vs the window form's ~0.2s — the
  * interpreted merge pays per-row projection overhead the codegen'd window
  * doesn't, so at toy scale the window form wins on latency. The merge's
  * advantage is memory shape: constant state per key instead of a window
  * frame over a unioned timeline, which is what survives when a key's
  * history no longer fits an executor's sort buffer.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    rightValues: Seq[NamedExpression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.toAttribute.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie, rv) =>
      AsOfJoinExec(lk, lt, rk, rt, tie, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    rightValues: Seq[NamedExpression],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.toAttribute.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    // nullability forced true: the no-match fill row is all-null even when
    // the right column itself is non-nullable
    val valAttrs = rightValues.map(_.toAttribute.withNullability(true))
    val nVals = rightValues.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key+time extracted as raw longs: LongType and TimestampType (micros)
      // are both long-backed in InternalRow — validated in AsOf.join
      val lKT = UnsafeProjection.create(Seq(leftKey, leftTime), lOut)
      val rKT = UnsafeProjection.create(Seq(rightKey, rightTime), rOut)
      val rVals = UnsafeProjection.create(rightValues, rOut)
      val resProj = UnsafeProjection.create(output, lOut ++ valAttrs)
      val nulls = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var curKey = 0L
      var has = false
      var curVals: InternalRow = null
      lIter.map { lRow =>
        val kt = lKT(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) resProj(joined(lRow, nulls))
        else {
          val k = kt.getLong(0)
          val t = kt.getLong(1)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rkt = rKT(rBuf.head)
            val rk = rkt.getLong(0)
            val rt = rkt.getLong(1)
            if (rk < k || (rk == k && rt <= t)) {
              val rRow = rBuf.next()
              if (rk == k) { curKey = k; has = true; curVals = rVals(rRow).copy() }
            } else advance = false
          }
          if (has && curKey == k) resProj(joined(lRow, curVals))
          else resProj(joined(lRow, nulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(events, orders, "user_id", "ts", "o_custkey",
  * "o_orderdate", values = Seq("o_orderkey"), tieBreak = Seq("o_orderkey"))`.
  */
object AsOf {

  private def ensureStrategy(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
  }

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      values: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // right rows with null key/time can never match; drop before the merge
    val r = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lk, lt) = (attr(lPlan, leftKey), attr(lPlan, leftTime))
    val (rk, rt) = (attr(rPlan, rightKey), attr(rPlan, rightTime))
    // all three are micros/long-backed in InternalRow; mixing TZ and NTZ is
    // sound because GraftSession pins the session to UTC
    val longBacked = Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampType, TimestampNTZType)
    for (a <- Seq(lk, lt, rk, rt))
      require(longBacked(a.dataType),
        s"as-of key/time must be long-backed (LONG or TIMESTAMP), got ${a.name}: ${a.dataType}")
    GraftPlanBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan, lk, lt, rk, rt,
      tieBreak.map(attr(rPlan, _)), values.map(attr(rPlan, _))))
  }
}
