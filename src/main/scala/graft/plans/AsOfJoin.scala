package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.{col, unix_date, unix_micros}
import org.apache.spark.sql.types._

/** As-of join — the temporal "most recent state at event time" join
  * the reference resolves imperatively per run (latest checkpoint /
  * last state write at or before a step,
  * `core/framework/runtime/checkpointer.py:161-210`,
  * `shared_state.py:117-160`) and that training pipelines need for
  * point-in-time feature joins. Spark has no native as-of join, and no
  * composition of built-in operators gives the scale-correct plan (a
  * windowed union doubles the sort width and breaks column pruning on
  * the probe side), so this is the one operator implemented as the
  * full custom stack: logical node → planner strategy → physical
  * sort-merge exec, registered through either
  * `spark.experimental.extraStrategies` ([[AsOf.install]]) or
  * `SparkSessionExtensions` ([[GraftExtensions]], for
  * `spark.sql.extensions=graft.plans.GraftExtensions` deployments).
  *
  * Scale shape: the exec declares `ClusteredDistribution` on the keys
  * and `(keys, time)` ascending child orderings, so EnsureRequirements
  * plans exactly one hash exchange + sort per side (identical to a
  * sort-merge equi-join) and the merge itself is a streaming
  * single-pass per partition with O(1) state — one buffered right row.
  * No window over the union, no per-key materialization, and
  * pre-bucketed inputs (`Scale.writeBucketed`) plan with no exchange
  * at all.
  */
object AsOf {

  sealed trait Direction
  /** Latest right row with rightTime <= leftTime (the default). */
  case object Backward extends Direction
  /** Earliest right row with rightTime >= leftTime. */
  case object Forward extends Direction
  /** Closer of the two; ties resolve backward. */
  case object Nearest extends Direction

  def direction(name: String): Direction = name.toLowerCase match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }

  /** Idempotently register the planner strategy and the filter
    * pushdown rule on a session.
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfFilterPushdown)) {
      spark.experimental.extraOptimizations = Seq(AsOfFilterPushdown,
        AsOfColumnPruning) ++ spark.experimental.extraOptimizations
    }
  }

  /** As-of join `left` to `right`: for every left row, the single
    * right row whose `rightOn` is nearest `leftOn` in `direction`,
    * matching equi-keys `leftBy`/`rightBy` exactly (empty = global).
    *
    * @param tolerance max |leftOn - rightOn| for a match, in the
    *   column's native unit (micros for timestamps, days for dates).
    * @param joinType "inner" (drop unmatched left rows) or "left"
    *   (keep them, right columns null).
    *
    * Right-side columns keep their names; disambiguate before joining
    * (as with any Spark join). Key columns must be same-typed on both
    * sides; the time columns may be any numeric, date or timestamp
    * type and are compared on a common ordinal scale.
    */
  def join(left: DataFrame, right: DataFrame, leftOn: String, rightOn: String,
      leftBy: Seq[String] = Nil, rightBy: Seq[String] = Nil,
      direction: Direction = Backward, tolerance: Option[Double] = None,
      joinType: String = "inner"): DataFrame = {
    require(leftBy.length == rightBy.length,
      s"leftBy/rightBy arity mismatch: $leftBy vs $rightBy")
    val isLeft = joinType.toLowerCase match {
      case "inner" => false
      case "left" | "left_outer" | "leftouter" => true
      case other => throw new IllegalArgumentException(
        s"asof joinType must be inner|left, got '$other'")
    }
    val spark = left.sparkSession
    install(spark)

    // Hidden ordinal columns normalize the time axis to long/double so
    // the exec compares primitives; dropped from the result.
    val lt = left.withColumn(LeftOrd, ordinal(left, leftOn))
    // Fresh exprIds on the whole right side make self-joins (the
    // common case: events as-of their own history) unambiguous.
    val rt0 = right.withColumn(RightOrd, ordinal(right, rightOn))
    val rt = rt0.select(rt0.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

    val lPlan = lt.queryExecution.analyzed
    val rPlan = rt.queryExecution.analyzed
    val lKeys = leftBy.map(attr(lPlan, _))
    val rKeys = rightBy.map(attr(rPlan, _))
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"asof key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    val lTime = attr(lPlan, LeftOrd)
    val rTime = attr(rPlan, RightOrd)
    require(lTime.dataType == rTime.dataType,
      s"asof time type mismatch after normalization: ${lTime.dataType} vs ${rTime.dataType}")

    val node = AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTime, rTime,
      direction, tolerance, isLeft)
    // Result shape mirrors pandas merge_asof: hidden ordinals gone,
    // right-side key columns dropped (they equal the left keys or are
    // null). Projected at the logical level because the names collide.
    val hidden = (Seq(lTime, rTime) ++ rKeys).map(_.exprId).toSet
    val keep = node.output.filterNot(a => hidden.contains(a.exprId))
    GraftSqlShim.ofRows(spark, Project(keep, node))
  }

  /** The compose-from-built-ins form (union → window last-non-null),
    * kept as the cross-check twin for [[join]]: same backward
    * semantics, radically different machinery, so specs can diff the
    * two on random data — and the living illustration of why the
    * custom exec exists (this plan sorts the full left payload width
    * through the window and can't prune right columns). Inner-join,
    * backward, no tolerance.
    */
  def joinComposedBackward(lhs: DataFrame, rhs: DataFrame,
      leftOn: String, rightOn: String,
      leftBy: Seq[String], rightBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lit, struct, last}
    val rightCols = rhs.columns.toSeq
    val payloadT = StructType(rhs.schema.fields.map(_.copy(nullable = true)))
    val lTagged = lhs.withColumn(UnionOrd, ordinal(lhs, leftOn))
      .withColumn(UnionTag, lit(1))
      .withColumn(UnionPayload, lit(null).cast(payloadT))
    // Right rows aligned into the left key columns; left-only columns
    // fill with nulls via unionByName(allowMissingColumns).
    val rAligned = rightBy.zip(leftBy).foldLeft(
        rhs.withColumn(UnionOrd, ordinal(rhs, rightOn))
          .withColumn(UnionTag, lit(0))
          .withColumn(UnionPayload, struct(rightCols.map(col).toIndexedSeq: _*))
          .select((rightBy.map(col) ++
            Seq(col(UnionOrd), col(UnionTag), col(UnionPayload))).toIndexedSeq: _*)) {
        case (df, (r, l)) => df.withColumnRenamed(r, l)
      }
    val unioned = lTagged.unionByName(rAligned, allowMissingColumns = true)
    // Right rows sort before left rows at equal times (tag 0 < 1), so
    // the backward match is inclusive, like the merge exec's.
    val w = Window.partitionBy(leftBy.map(col).toIndexedSeq: _*)
      .orderBy(col(UnionOrd).asc, col(UnionTag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(UnionPayload, last(col(UnionPayload), ignoreNulls = true).over(w))
      .filter(col(UnionTag) === 1 && col(UnionPayload).isNotNull)
      .select((lhs.columns.map(col) ++
        rightCols.map(c => col(UnionPayload).getField(c).as(c))).toIndexedSeq: _*)
  }

  private val LeftOrd = "__graft_asof_lt"
  private val RightOrd = "__graft_asof_rt"
  private val UnionOrd = "__graft_asof_ord"
  private val UnionTag = "__graft_asof_tag"
  private val UnionPayload = "__graft_asof_payload"

  /** Normalize a time column to a long/double ordinal column. */
  private def ordinal(df: DataFrame, name: String): Column = {
    val dt = df.schema(df.schema.fieldIndex(name)).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType => col(name).cast(LongType)
      case FloatType | DoubleType => col(name).cast(DoubleType)
      case _: DecimalType => col(name).cast(DoubleType)
      case TimestampType => unix_micros(col(name))
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case DateType => unix_date(col(name)).cast(LongType)
      case other => throw new IllegalArgumentException(
        s"asof time column '$name' has non-temporal, non-numeric type $other")
    }
  }

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(a => a.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
}

/** Logical as-of join. Keys/time are resolved attributes of the
  * children (the public API builds this node post-analysis), so the
  * node analyzes as already-resolved and Catalyst rules that don't
  * know it simply leave it intact.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: AsOf.Direction, tolerance: Option[Double],
    isLeftJoin: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftJoin) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.direction, p.tolerance, p.isLeftJoin,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Catalyst doesn't know [[AsOfJoinPlan]], so built-in predicate
  * pushdown stops at it — without this rule, a filter written above
  * the join scans both sides in full. Left-referencing conjuncts
  * always commute with the join (as-of never duplicates or reorders
  * left rows; it only appends right columns), so they push into the
  * left child, where the normal rules drive them down to the scan
  * (`PushedFilters`). Right-side conjuncts must stay put: dropping a
  * right row changes which row is "most recent", so pushing them
  * would change results — the classic outer-join pushdown trap.
  */
object AsOfFilterPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(
          org.apache.spark.sql.catalyst.expressions.And), j.left))
        kept.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Built-in ColumnPruning likewise stops at the unknown node, so a
  * narrow projection above the join would still scan every column of
  * both sides. For `Project(_, AsOfJoinPlan)` — the exact shape
  * [[AsOf.join]] emits — prune each child to the referenced columns
  * plus the join's own keys/times; the normal rules then shrink the
  * parquet `ReadSchema`. No-op at fixpoint (children already minimal).
  */
object AsOfColumnPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++ j.references
      val lKeep = j.left.output.filter(needed.contains)
      val rKeep = j.right.output.filter(needed.contains)
      if (lKeep.length == j.left.output.length &&
          rKeep.length == j.right.output.length) p
      else p.copy(child = j.copy(
        left = Project(lKeep, j.left), right = Project(rKeep, j.right)))
  }
}

/** For `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfFilterPushdown)
    ext.injectOptimizerRule(_ => AsOfColumnPruning)
    // the scalar-kernel SQL surface rides the same extension point, so
    // a spark.sql.extensions deployment gets `SELECT quality_score(…)`
    // without any per-session register() call
    graft.sql.SqlFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.sql.SqlFunctions", name),
        builder))
    }
  }
}

/** Physical sort-merge as-of join.
  *
  * Requirements declared to the planner: both children clustered on
  * their keys (hash exchange unless already co-partitioned, e.g.
  * bucketed tables) and sorted by (keys, time) ascending. The merge is
  * then a single streaming pass per partition: the right iterator
  * advances monotonically, the only retained state is the current
  * backward candidate (one copied row). Null keys and null times never
  * match, mirroring SQL join semantics.
  */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: AsOf.Direction, tolerance: Option[Double], isLeftJoin: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftJoin) right.output.map(_.withNullability(true))
                    else right.output)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private val timeIsLong = leftTime.dataType == LongType

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val dir = direction
    val tol = tolerance
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val emitUnmatched = isLeftJoin
    val isLong = timeIsLong
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val nKeys = lKeyExprs.length
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // For the left join the projection must bind right-side fields
      // as nullable even when the child schema says otherwise — the
      // null fill row is read through these references.
      val bindRight = if (emitUnmatched) rightOut.map(_.withNullability(true))
                      else rightOut
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ bindRight)
      val buffered = rIter.buffered

      // Backward candidate state: last right row (copied — sorter
      // iterators reuse buffers) with time <= current left time, plus
      // its key and time for validity checks.
      var cand: InternalRow = null
      var candKey: InternalRow = null
      var candTimeL = 0L
      var candTimeD = 0.0

      def anyNull(row: InternalRow, n: Int): Boolean = {
        var i = 0
        while (i < n) { if (row.isNullAt(i)) return true; i += 1 }
        false
      }

      def within(a: Long, b: Long, aD: Double, bD: Double): Boolean = tol match {
        case None => true
        case Some(t) => if (isLong) math.abs(a - b).toDouble <= t
                        else math.abs(aD - bD) <= t
      }

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lKeyNull = nKeys > 0 && anyNull(lKey, nKeys)
        val lTimeRow = lTimeProj(l)
        val lTimeNull = lTimeRow.isNullAt(0)
        val ltL = if (!lTimeNull && isLong) lTimeRow.getLong(0) else 0L
        val ltD = if (!lTimeNull && !isLong) lTimeRow.getDouble(0) else 0.0

        // Invalidate the backward candidate on key change.
        if (cand != null && (nKeys > 0 && keyOrd.compare(candKey, lKey) != 0)) {
          cand = null
        }

        var forward: InternalRow = null
        var fwdTimeL = 0L
        var fwdTimeD = 0.0

        if (!lKeyNull && !lTimeNull) {
          // Advance the right side: consume rows strictly behind the
          // current left (smaller key, or same key with time <= left
          // time — the backward direction keeps the last of those as
          // its candidate). Stop at the first row ahead.
          var done = false
          while (!done && buffered.hasNext) {
            val rh = buffered.head
            val rKey = rKeyProj(rh)
            val rKeyNull = nKeys > 0 && anyNull(rKey, nKeys)
            val c = if (nKeys == 0) 0 else keyOrd.compare(rKey, lKey)
            if (rKeyNull || c < 0) {
              buffered.next() // unmatched right row: skip
            } else if (c == 0) {
              val rTimeRow = rTimeProj(rh)
              if (rTimeRow.isNullAt(0)) {
                buffered.next() // null time never matches
              } else {
                val rtL = if (isLong) rTimeRow.getLong(0) else 0L
                val rtD = if (!isLong) rTimeRow.getDouble(0) else 0.0
                val strictlyBefore = if (isLong) rtL < ltL else rtD < ltD
                val atOrBefore = if (isLong) rtL <= ltL else rtD <= ltD
                if (dir == AsOf.Forward) {
                  // forward matches rightTime >= leftTime (inclusive):
                  // only strictly-earlier rows are consumable
                  if (strictlyBefore) {
                    buffered.next()
                  } else {
                    forward = rh
                    fwdTimeL = rtL; fwdTimeD = rtD
                    done = true
                  }
                } else if (atOrBefore) {
                  cand = buffered.next().copy()
                  candKey = lKey.copy()
                  candTimeL = rtL; candTimeD = rtD
                } else {
                  // first same-key row strictly ahead of the left time
                  if (dir == AsOf.Nearest) {
                    forward = rh
                    fwdTimeL = rtL; fwdTimeD = rtD
                  }
                  done = true
                }
              }
            } else {
              done = true
            }
          }
        }

        val matched: InternalRow = dir match {
          case AsOf.Backward =>
            if (cand != null && within(ltL, candTimeL, ltD, candTimeD)) cand else null
          case AsOf.Forward =>
            if (forward != null && within(fwdTimeL, ltL, fwdTimeD, ltD)) forward else null
          case AsOf.Nearest =>
            val backOk = cand != null && within(ltL, candTimeL, ltD, candTimeD)
            val fwdOk = forward != null && within(fwdTimeL, ltL, fwdTimeD, ltD)
            if (backOk && fwdOk) {
              val backCloser =
                if (isLong) (ltL - candTimeL) <= (fwdTimeL - ltL)
                else (ltD - candTimeD) <= (fwdTimeD - ltD)
              if (backCloser) cand else forward
            } else if (backOk) cand else if (fwdOk) forward else null
        }

        if (matched != null) {
          numOutputRows += 1
          Iterator.single(resultProj(joined(l, matched)))
        } else if (emitUnmatched) {
          numOutputRows += 1
          Iterator.single(resultProj(joined(l, nullRight)))
        } else Iterator.empty
      }
    }
  }
}
