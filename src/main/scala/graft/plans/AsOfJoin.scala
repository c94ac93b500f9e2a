package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, PartitioningCollection}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator: logical node + planner strategy
  * + physical sort-merge execution (the (c) path of the custom-operator
  * preference order — SURVEY.md §4 notes none is *mandatory*; this one
  * exists because as-of is the canonical operator Spark lacks, and the
  * window-composition form (operators.Temporal.q56) gives us an
  * independent correctness oracle for it).
  *
  * Semantics: inner as-of — for each left row, the single right row with
  * the same key and the greatest time ≤ the left row's time.
  *
  * Physical design (the 100 TB shape): both sides hash-clustered on the
  * key and sorted (key, time) — EnsureRequirements injects the exchanges
  * and sorts exactly as it does for SortMergeJoin — then one streaming
  * merge pass per partition holding ONE buffered right row, O(1) memory
  * beyond the iterators.
  *
  * Restriction (deliberate, fixture-typed): key and time expressions
  * must evaluate to Long-backed types (BIGINT / TIMESTAMP micros).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // rows stay hash-clustered on the key — expose it so a downstream
  // groupBy/join on the same key doesn't re-shuffle the result
  override def outputPartitioning: Partitioning =
    PartitioningCollection(Seq(left.outputPartitioning, right.outputPartitioning))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var matchRow: InternalRow = null
      var matchKey = 0L

      lIter.flatMap { l =>
        val lkRaw = lkB.eval(l)
        val ltRaw = ltB.eval(l)
        if (lkRaw == null || ltRaw == null) Iterator.empty else {
        val lk = lkRaw.asInstanceOf[Long]
        val lt = ltRaw.asInstanceOf[Long]
        // advance the right side up to (key, time) <= (lk, lt)
        var continue = true
        while (continue && rBuf.hasNext) {
          val rkRaw = rkB.eval(rBuf.head)
          val rtRaw = rtB.eval(rBuf.head)
          if (rkRaw == null || rtRaw == null) { rBuf.next() } // null keys never match
          else {
            val rk = rkRaw.asInstanceOf[Long]
            val rt = rtRaw.asInstanceOf[Long]
            if (rk < lk || (rk == lk && rt <= lt)) {
              val r = rBuf.next()
              if (rk == lk) { matchRow = r.copy(); matchKey = rk }
            } else continue = false
          }
        }
        if (matchRow != null && matchKey == lk) {
          Iterator.single(proj(joined(l, matchRow)))
        } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** User-facing as-of join: `asofJoin(purchases, clicks, "user_id", "ts")`.
    * Installs the planner strategy on the session (idempotent) and plants
    * the logical node for Catalyst to optimize around.
    */
  def asofJoin(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // inner as-of semantics: NULL key/time rows can never match — drop
    // them up front so the merge sees monotone non-null key sequences
    import org.apache.spark.sql.functions.col
    val lClean = leftDf.filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val rClean = rightDf.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lPlan = GraftSqlBridge.analyzedPlan(lClean)
    val rPlan = GraftSqlBridge.analyzedPlan(rClean)
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(shared.isEmpty,
      s"asofJoin sides share attributes ${shared.mkString(", ")} — alias/select one side " +
        "first (post-analysis planting bypasses DeduplicateRelations)")
    def attr(p: LogicalPlan, name: String): Attribute = {
      // case-insensitive, matching Spark's default resolver
      val hits = p.output.filter(_.name.equalsIgnoreCase(name))
      require(hits.length == 1,
        if (hits.isEmpty) s"no column $name" else s"ambiguous column $name")
      hits.head
    }
    GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
