package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join as a WHOLE-OPERATOR Catalyst extension — the §2 option-(c)
  * path: a custom `LogicalPlan` node, planned by a custom `SparkStrategy`
  * into a custom `SparkPlan`, registered through
  * `SparkSessionExtensions` ([[GraftExtensions]]) or lazily via
  * `experimental.extraStrategies` ([[AsOfJoin.asof]]).
  *
  * Semantics: for every left row, the newest right row with the same key
  * and `rightTime <= leftTime` (inclusive — DuckDB `ASOF JOIN ... ON
  * l.t >= r.t` semantics); no match → right columns NULL (left outer).
  *
  * Physical shape — exactly what a 100 TB as-of join wants:
  * one hash exchange per side on the key, one sort per side on
  * (key, time), then a single streaming merge pass per partition with
  * O(1) state (the current candidate row). No union/window
  * materialization (the composed form pays a window over the merged
  * stream), no per-key buffering, no range-join blowup. The differential
  * spec proves it equal to the composed `join_asof` operator, and the
  * graded `join_asof_exec` query runs it against the same DuckDB oracle.
  *
  * Keys and times are required to be LongType (ids / epoch micros — what
  * every as-of workload joins on); the general-typed variant would bind
  * interpreted orderings instead of primitive compares.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  require(Seq(leftKey, rightKey, leftTime, rightTime)
    .forall(e => !e.resolved || e.dataType == LongType),
    "as-of keys/times must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
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

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key; EnsureRequirements inserts the
  // two hash exchanges (and aligns partition counts) exactly as it does
  // for a sort-merge join
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  // and sort each side by (key, time) so the merge is one forward pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
      val rIt = rIt0.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      // O(1) merge state: the newest right row at or before the current
      // scan position, and the key it belongs to
      var candidate: InternalRow = null
      var candidateKey: Long = 0L
      lIt.map { lRow =>
        val kObj = lkB.eval(lRow)
        val tObj = ltB.eval(lRow)
        if (kObj == null || tObj == null) {
          resultProj(joined(lRow, nullRight))
        } else {
          val k = kObj.asInstanceOf[Long]
          val t = tObj.asInstanceOf[Long]
          // consume right rows up to (key, time): rows of smaller keys
          // flush through; rows of THIS key at time <= t become the
          // candidate (later rows overwrite earlier — "newest wins")
          var advance = true
          while (advance && rIt.hasNext) {
            val head = rIt.head
            val rk = rkB.eval(head)
            val rt = rtB.eval(head)
            if (rk == null) { rIt.next() } // null-keyed right rows match nothing
            else {
              val rkL = rk.asInstanceOf[Long]
              if (rkL < k
                || (rkL == k && rt != null && rt.asInstanceOf[Long] <= t)) {
                val r = rIt.next()
                if (rkL == k && rt != null) {
                  // must copy: the unsafe row buffer is reused by the sorter
                  candidate = r.copy()
                  candidateKey = rkL
                }
              } else advance = false
            }
          }
          if (candidate != null && candidateKey == k)
            resultProj(joined(lRow, candidate))
          else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Custom optimizer rule — the third extension type (alongside the
  * custom Expressions in `functions/` and the Strategy/SparkPlan above):
  * Catalyst's own PushDownPredicates cannot see through an unknown
  * logical node, so without this rule a `filter` applied above
  * [[AsOfJoinPlan]] evaluates AFTER the join — both sides get shuffled,
  * sorted, and merged for rows the predicate was going to discard, and
  * nothing reaches the parquet scan. The rule splits a conjunctive
  * filter and pushes the left-only conjuncts below the join (as-of is
  * left-outer-shaped: each left row produces exactly one output row
  * whose left columns are unchanged, so a left-only predicate commutes
  * with the join; right-side conjuncts must stay above — they see
  * NULL-extended columns). Catalyst then carries the pushed filter all
  * the way into the scan's PushedFilters. */
object AsOfJoinPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic
          && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(leftOnly.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** `spark.sql.extensions` entry point: lets a session opt in at build
  * time (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPushdown)
    // SQL names for the codegen'd kernels (word_shingles, simhash64, …)
    // so a spark.sql-only user gets the whole function surface
    graft.functions.SqlFunctions.all.foreach(ext.injectFunction)
  }
}

/** Library-level API: build the logical node directly and make sure the
  * strategy is registered on the session (idempotent), so callers need
  * no session-construction ceremony. */
object AsOfJoin {

  private def registered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPushdown))
      spark.experimental.extraOptimizations =
        AsOfJoinPushdown +: spark.experimental.extraOptimizations
  }

  /** `left ASOF JOIN right ON leftKey = rightKey AND rightTime <=
    * leftTime` (newest match wins; unmatched → NULL right). Column
    * arguments are resolved by NAME against each side. */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    registered(spark)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${df.columns.mkString(",")}"))
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    org.apache.spark.sql.graftshim.Shim.ofRows(spark,
      AsOfJoinPlan(l, r, attr(left, leftKey), attr(right, rightKey),
        attr(left, leftTime), attr(right, rightTime)))
  }
}
