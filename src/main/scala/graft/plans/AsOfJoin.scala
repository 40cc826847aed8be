package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** LEFT AS-OF JOIN — for every left row, the single right row with the
  * same key and the greatest right-time ≤ left-time (or nulls if none).
  *
  * Spark SQL has no as-of join (pandas-on-Spark emulates one with a
  * union trick; Flink/the reference has none either) — this is the
  * build brief's preference path (c): a custom LogicalPlan +
  * SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions (`GraftExtensions`).
  *
  * The physical operator is a co-partitioned sort-merge: both sides
  * hash-distributed on the key (Exchange only if not already
  * partitioned — `ClusteredDistribution`), sorted by (key, time), then
  * a single zipPartitions merge pass holds exactly ONE candidate right
  * row of state per key — O(|L|+|R|) per partition, no buffering of
  * right groups, no point-in-time self-join blowup. That is the shape
  * that survives 100 TB: the naive built-in formulation
  * (range join + row_number over matches) materializes every
  * (left, earlier-right) pair before ranking.
  *
  * Declarative equivalence (`asof == join+rank`) is pinned by a
  * property test; DuckDB's native `ASOF LEFT JOIN` is the independent
  * oracle for the `asof_attribution` query.
  */
object AsOfJoin {

  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression)
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyExpr = leftKey
      val rKeyExpr = rightKey
      val lTimeExpr = leftTime
      val rTimeExpr = rightTime
      val lOut = left.output
      val rOut = right.output
      val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
        .asInstanceOf[Ordering[Any]]
      val timeOrd = PhysicalDataType.ordering(leftTime.dataType)
        .asInstanceOf[Ordering[Any]]
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
        val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
        // project with the right side forced nullable IN THE SCHEMA
        // position too: BindReferences takes nullability from the
        // input-schema attribute (not the projection expression), so
        // nullable exprs over a non-nullable schema still skip the
        // null checks and read the all-null row as zeros (caught by
        // the CEP relaxed-chain property test: non-nullable right
        // columns + unmatched left rows)
        val outAttrs = lOut ++ rOut.map(_.withNullability(true))
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val nullRight = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow
        val keyType = lKeyExpr.dataType
        val timeType = lTimeExpr.dataType

        new Iterator[InternalRow] {
          private var rHead: InternalRow = _
          private var rHeadKey: Any = _
          private var rHeadTime: Any = _
          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead).get(0, keyType)
              rHeadTime = rTimeProj(rHead).get(0, timeType)
            } else rHead = null
          advanceRight()

          // the single row of per-key state: latest right row ≤ current
          // left time for the current key
          private var candKey: Any = _
          private var cand: InternalRow = _

          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l).get(0, keyType)
            val lt = lTimeProj(l).get(0, timeType)
            if (lk == null || lt == null) return outProj(joined(l, nullRight))
            // advance right side up to (key, time) bound, tracking the
            // last qualifying row per key
            var continue = rHead != null
            while (continue) {
              val c = if (rHeadKey == null) -1 else keyOrd.compare(rHeadKey, lk)
              if (c < 0) advanceRight()
              else if (c == 0 && rHeadTime == null) advanceRight()
              else if (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0) {
                candKey = rHeadKey
                cand = rHead.copy()
                advanceRight()
              } else continue = false
              if (rHead == null) continue = false
            }
            val matched = cand != null && candKey != null &&
              keyOrd.compare(candKey, lk) == 0
            outProj(joined(l, if (matched) cand else nullRight))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: `asof(leftDf, rightDf, "k", "rk", "t", "rt")` —
    * column names resolved against each side (names, not Columns:
    * Spark 4 Columns are lazy ColumnNodes that only standard API
    * entry points convert; a custom node must resolve itself).
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    // sessions not built withExtensions (e.g. the driver's Verify/Bench
    // sessions) get the strategy injected at first use
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: our custom node doesn't get the analyzer's
    // Join dedup, so re-alias the right side with fresh exprIds when
    // the two plans share attributes (e.g. events-as-of-events)
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def resolve(name: String, plan: LogicalPlan, side: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side column $name not found in ${plan.output.map(_.name)}"))
    GraftSqlShim.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      resolve(leftKey, lPlan, "left"), resolve(rightKey, rPlan, "right"),
      resolve(leftTime, lPlan, "left"), resolve(rightTime, rPlan, "right")))
  }
}
