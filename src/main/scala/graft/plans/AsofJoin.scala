package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, Expression, GenericInternalRow, IsNotNull, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftSqlShim

/** As-of join as a first-class operator — the whole-operator extension
  * path (logical node → strategy → physical exec) for semantics Spark's
  * built-ins can't express directly: for every left row, the single
  * latest right row of the same key with `rightTime <= leftTime`
  * (left-outer: unmatched left rows pad the right side with nulls).
  *
  * Why a custom plan when q38 shows the union+window encoding: the
  * encoding forces both sides through one union schema (manual column
  * surgery per call site) and carries running-last state through a
  * window operator. This node keeps each side's schema, and executes as
  * a co-partitioned ordered merge: one shuffle per side on the key,
  * one sort per side on (key, time), then a single forward pass per
  * partition — O(n+m) per partition with O(1) state (the current
  * candidate row), the same scale shape as sort-merge join. At 100 TB
  * both sides stream; nothing is buffered per key.
  *
  * Semantics notes: key equality is null-safe ordering equality (callers
  * should drop null keys if SQL join semantics are wanted); right rows
  * with null time are dropped by the API wrapper; ties on rightTime are
  * broken by the right side's sort order, so callers can append
  * tie-break columns via `rightOrder`.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Seq[Attribute],
    nearest: Boolean = false) extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through the custom node: Catalyst's ColumnPruning
  * only knows built-in operators, so without this rule every column of
  * both inputs rides the two exchanges and sorts even when the parent
  * projects three of them — at scale that is the difference between
  * shuffling key+time+payload and shuffling whole rows. Inserts a
  * Project beneath each side keeping only columns the parent references
  * plus the join's own keys/time/tie-break.
  */
object AsofColumnPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList,
        aj @ AsofJoinPlan(l, r, lk, rk, lt, rt, tie, _)) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(lk ++ rk ++ (lt +: rt +: tie))
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.size == child.output.size) child
        else Project(keep, child)
      }
      val (nl, nr) = (prune(l), prune(r))
      if ((nl eq l) && (nr eq r)) p
      else p.copy(child = aj.copy(left = nl, right = nr))
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie, near) =>
      AsofJoinExec(lk, rk, lt, rt, tie, near,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    nearest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  /** Time readers for the nearest-direction distance compare; only
    * resolved when `nearest` is set, so backward/forward keep working
    * for any ordered time type. Integral time types (timestamps are
    * epoch micros, dates day ordinals) compare in exact Long
    * arithmetic — a Double distance would lose precision above 2^53
    * (nanosecond-scale epochs), mis-picking the closer side; the
    * Double reader only serves genuinely fractional columns.
    */
  private def timeLongReader: Option[InternalRow => Long] = {
    import org.apache.spark.sql.types._
    leftTime.dataType match {
      case TimestampType | TimestampNTZType | LongType =>
        Some(r => r.getLong(0))
      case IntegerType | DateType => Some(r => r.getInt(0).toLong)
      case ShortType => Some(r => r.getShort(0).toLong)
      case _ => None
    }
  }

  private def timeDoubleReader: InternalRow => Double = {
    import org.apache.spark.sql.types._
    leftTime.dataType match {
      case DoubleType => r => r.getDouble(0)
      case FloatType => r => r.getFloat(0).toDouble
      case dt => throw new UnsupportedOperationException(
        s"nearest as-of needs a numeric/timestamp time column, got $dt")
    }
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges; AQE still free to pick partition counts)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // each side sorted by (key, time[, tie-break]) so the merge is one
  // forward pass; the last right row taken for a (key, time) is then
  // the max in tie-break order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val timeValL: InternalRow => Long =
        if (nearest) timeLongReader.orNull else null
      val timeValD: InternalRow => Double =
        if (nearest && timeValL == null) timeDoubleReader else null

      new Iterator[InternalRow] {
        // one-row lookahead into the right side; rows are copied out of
        // the iterator's reused buffer before being held across next()
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var cand: InternalRow = _   // latest right row <= current left time
        private var curKey: UnsafeRow = _   // key of the current left group
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
          } else { rHead = null; rHeadKey = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          if (curKey == null || keyOrd.compare(lKey, curKey) != 0) {
            cand = null
            curKey = lKey.copy()
          }
          // lTimeProj and rTimeProj write to separate reused buffers,
          // so the comparison needs no per-row copy
          val lt = lTimeProj(l)
          // read the numeric value BEFORE the loop: `lt` is a reused
          // buffer and the distance compare below needs the value after
          // further projections
          val ltNull = nearest && lt.isNullAt(0)
          val ltvL = if (timeValL != null && !ltNull) timeValL(lt) else 0L
          val ltvD = if (timeValD != null && !ltNull) timeValD(lt) else 0.0
          var done = false
          while (!done && rHead != null) {
            val c = keyOrd.compare(rHeadKey, curKey)
            if (c < 0) advanceRight() // right key exhausted by left order
            else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lt) <= 0) {
              cand = rHead // later rows in sort order overwrite: keep-last
              advanceRight()
            } else done = true
          }
          // nearest: the one-row lookahead IS the forward candidate —
          // rHead (same key) holds the smallest right time > leftTime.
          // Pick the closer side; exact-tie prefers backward. Forward
          // ties at the matched time resolve to the SMALLEST tie-break
          // (first in right sort order — the lookahead cannot consume
          // further rows without stealing later lefts' candidates),
          // backward to the largest; a null left time matches nothing.
          val matched =
            if (!nearest) cand
            else if (ltNull) null
            else {
              val fwd =
                if (rHead != null && keyOrd.compare(rHeadKey, curKey) == 0)
                  rHead
                else null
              if (cand == null) fwd
              else if (fwd == null) cand
              else if (timeValL != null) {
                // exact: cand ≤ lt ≤ fwd, so both distances are
                // non-negative and only overflow for a time spread
                // beyond 2^63 units — out of range for any epoch
                val backDist = ltvL - timeValL(rTimeProj(cand))
                val fwdDist = timeValL(rTimeProj(fwd)) - ltvL
                if (backDist <= fwdDist) cand else fwd
              } else {
                val backDist = ltvD - timeValD(rTimeProj(cand))
                val fwdDist = timeValD(rTimeProj(fwd)) - ltvD
                if (backDist <= fwdDist) cand else fwd
              }
            }
          joined(l, if (matched != null) matched else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsofJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
  * "t", "qt")` — all left columns plus the matched right row's columns
  * (null-padded when no right row qualifies).
  */
object AsofJoin {

  /** The union + running-last(ignoreNulls) ENCODING of the as-of join
    * (q38's composition, the built-in-operator alternative to
    * [[AsofJoinExec]]): both sides unioned into one frame, ordered
    * (time, right-before-left on ties, then right id, then left id —
    * the full tie-break makes the result deterministic), and the
    * latest right id carried forward per key. One shuffle + one sort,
    * like the custom exec. Shared by the catalog query and both
    * benchmarks so the measured baseline cannot drift from the
    * catalog's semantics. `leftId` and `rightVal` must be integral
    * (carried through one LONG column).
    */
  def asofUnionWindow(left: DataFrame, leftKey: String, leftTime: String,
                      leftId: String, right: DataFrame, rightKey: String,
                      rightTime: String, rightVal: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{last, lit}
    import org.apache.spark.sql.types.LongType
    val l = left.select(col(leftKey).as("k"), col(leftTime).as("tt"),
      lit(null).cast(LongType).as("__rv"), lit(0).as("is_r"),
      col(leftId).cast(LongType).as("__lid"))
    val r = right.select(col(rightKey).as("k"), col(rightTime).as("tt"),
      col(rightVal).cast(LongType).as("__rv"), lit(1).as("is_r"),
      lit(null).cast(LongType).as("__lid"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("tt"), col("is_r").desc, col("__rv").asc_nulls_first,
        col("__lid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col("__lid").as(leftId), col("k").as(leftKey),
        col("__last").as(s"last_$rightVal"))
  }

  /** As-of join, pandas-merge_asof directions. `"backward"` (default)
    * matches the latest right row with rt ≤ lt; `"forward"` the
    * earliest right row with rt ≥ lt (the next quote after a trade);
    * `"nearest"` whichever of the two is closer in time, preferring
    * backward on an exact distance tie. Backward/forward resolve ties
    * at the matched timestamp to the greatest tie-break value; for
    * nearest's forward side the tie resolves to the smallest (the
    * merge's one-row lookahead — see the exec).
    *
    * Forward reuses the same ordered-merge exec on NEGATED time (for
    * timestamps: negated epoch micros) — "earliest ≥ t" is "latest ≤
    * −t" under the reversed axis, so no second physical operator or
    * planner path exists to drift from the backward one; the helper
    * columns are dropped from the result. Nearest runs the backward
    * merge with the lookahead row as the forward candidate — still one
    * pass, still O(1) state.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           rightTieBreak: Seq[String] = Nil,
           direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.functions.{expr, unix_date, unix_micros}
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType,
      TimestampType}
    direction match {
      case "backward" | "nearest" => // fall through to the merge below
      case "forward" =>
        def neg(df: DataFrame, t: String): Column =
          df.schema(t).dataType match {
            case TimestampType => -unix_micros(df(t))
            case DateType => -unix_date(df(t)) // exact day ordinal
            case TimestampNTZType =>
              // no unix_micros for NTZ, and a cast through TimestampType
              // would apply the session zone (non-monotonic across DST);
              // timestampdiff subtracts wall-clock micros exactly, and
              // end − start with end = epoch IS the negation
              val q = s"`${t.replace("`", "``")}`"
              expr("timestampdiff(MICROSECOND, " + q +
                ", TIMESTAMP_NTZ'1970-01-01 00:00:00')")
            case _: NumericType => -df(t)
            case dt => throw new IllegalArgumentException(
              s"forward as-of needs a timestamp/date or numeric time column, got $dt")
          }
        return asof(left.withColumn("__graft_lnt", neg(left, leftTime)),
          right.withColumn("__graft_rnt", neg(right, rightTime)),
          leftKeys, rightKeys, "__graft_lnt", "__graft_rnt", rightTieBreak)
          .drop("__graft_lnt", "__graft_rnt")
      case other => throw new IllegalArgumentException(
        s"direction must be 'backward', 'forward' or 'nearest', got '$other'")
    }
    val spark = left.sparkSession
    GraftSqlShim.addStrategy(spark, AsofJoinStrategy)
    GraftSqlShim.addOptimization(spark, AsofColumnPruning)
    val lPlan = GraftSqlShim.analyzed(left)
    // self-join lineage: if the right side shares attribute ids with
    // the left (asof(df, df, ...), or right built from left without
    // aliasing), re-alias every right column so the two sides bind
    // unambiguously — the same hazard Dataset.join solves with
    // dedupRight
    val rPlanRaw = {
      val p = GraftSqlShim.analyzed(right)
      if (p.output.exists(lPlan.outputSet.contains)) GraftSqlShim.analyzed(
        right.select(right.columns.toIndexedSeq
          .map(c => col(s"`$c`").as(c)): _*))
      else p
    }

    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"$side column '$name' not found in ${plan.output.map(_.name)}"))

    val lks = leftKeys.map(attr(lPlan, _, "left"))
    val rks = rightKeys.map(attr(rPlanRaw, _, "right"))
    lks.zip(rks).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    val lt = attr(lPlan, leftTime, "left")
    val rt = attr(rPlanRaw, rightTime, "right")
    // Deliberately NOT auto-coerced: a silent TIMESTAMP_NTZ↔TIMESTAMP
    // cast would bake the session zone into join semantics (the
    // round-5 testdata regeneration hit exactly this mismatch) — the
    // caller chooses, e.g. via Tables.normalizeEventTime or an
    // explicit cast, and the message says so.
    require(lt.dataType == rt.dataType,
      s"as-of time type mismatch: left '${lt.name}' is ${lt.dataType.sql} " +
        s"but right '${rt.name}' is ${rt.dataType.sql} — normalize both " +
        "sides to one time type first (graft.tables.Tables." +
        "normalizeEventTime for TIMESTAMP_NTZ/long-nanos inputs, or an " +
        "explicit cast under a pinned session time zone)")
    val tie = rightTieBreak.map(attr(rPlanRaw, _, "right"))
    // null right times can never be "the latest ≤ t" under SQL
    // comparison semantics, but the merge's ordering-based compare
    // would rank them smallest — drop them up front. Filtering on the
    // RESOLVED attribute (not a parsed column path) keeps names with
    // dots working.
    val rPlan = Filter(IsNotNull(rt), rPlanRaw)
    GraftSqlShim.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan, lks, rks, lt, rt, tie,
        nearest = direction == "nearest"))
  }
}
