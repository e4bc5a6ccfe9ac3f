package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, Literal, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, BROADCAST, Join, LogicalPlan, ResolvedHint, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native backward as-of join — the whole-operator extension-point
  * showcase (SURVEY §4 preference order (c)): a custom logical plan, a
  * resolution rule that rewrites a public-API hint into it, a planner
  * strategy, and a sort-merge physical operator, all registered through
  * [[GraftExtensions]]. Semantics: for every left row, the single right
  * row with the same key and the LARGEST right time <= the left time.
  * Inner (default): unmatched left rows drop; null keys/times never
  * match. Left-outer: unmatched left rows (including null-key/time
  * ones, per SQL three-valued logic) are retained with a null-filled
  * right side.
  *
  * Why a whole operator instead of the b15 window composition: the
  * composed form must union both inputs into one relation and run a
  * `last(_, ignoreNulls)` window over the merged event stream, which
  * materializes a sort over |L|+|R| rows and carries every left column
  * through the window. The native operator shuffles each side once on
  * its own key, sorts each side independently (both sorts are
  * restartable spills, not one merged window buffer), and streams a
  * per-partition two-pointer merge holding exactly ONE buffered right
  * row — O(1) state beyond the sorts, no window, no unioned schema.
  * At 100 TB that is the difference between "two ordinary co-partitioned
  * sort-merge sides" and "a window over the concatenation of both
  * tables".
  *
  * API surface (public DataFrame API only — no private[sql] bridges):
  * {{{
  *   left.crossJoin(right).hint("graft_asof",
  *     "leftKeyCol", "leftTimeCol", "rightKeyCol", "rightTimeCol")
  *   // COMPOSITE keys: comma-separate the key columns inside the two
  *   // key parameters — counts must match pairwise, e.g. a
  *   // (symbol, venue)-keyed quote lookup:
  *   //   .hint("graft_asof", "sym,venue", "ts", "q_sym,q_venue", "q_ts")
  *   // A row with ANY null key component never matches (SQL equi-join
  *   // three-valued logic, per component).
  *   // optional trailing flags (any order): "inner" (default) |
  *   // "left_outer" — keep unmatched left rows null-filled; and
  *   // "backward" (default) — largest right time <= left time — |
  *   // "forward" — smallest right time >= left time; and
  *   // "tol_us=N" — maximum match gap (pandas merge_asof tolerance /
  *   // kdb wj window): backward requires lt - rt <= N, forward
  *   // rt - lt <= N. Units are the time column's internal
  *   // representation — MICROSECONDS for timestamps, days for dates,
  *   // the raw value for integral columns. In outer mode an
  *   // out-of-tolerance nearest match NULL-FILLS the row (not
  *   // expressible as a post-filter on the unbounded join).
  *   // Wrapping the right side in broadcast(...) forces the
  *   // BroadcastAsOfJoinExec pick regardless of stats estimates:
  *   //   left.crossJoin(broadcast(dim)).hint("graft_asof", ...)
  * }}}
  * The same surface works from pure SQL text — the parser attaches a
  * SELECT-level hint above the Project/Filter chain, and the rule
  * descends that unary spine to the underlying join:
  * {{{
  *   SELECT /*+ graft_asof('k', 't', 'rk', 'rt', 'left_outer') */ ...
  *   FROM l CROSS JOIN r
  * }}}
  * [[ResolveAsOfJoin]] rewrites the hinted cross join during analysis;
  * the cross join itself is never planned (the hint IS the operator —
  * same pattern as Spark's own broadcast/merge join hints). Callers
  * must alias the right side's key/time so the four names are
  * unambiguous across the two inputs. A `graft_asof` hint over any
  * other shape (conditioned join, outer join, non-join child) throws
  * at analysis — never a silent downgrade to plain-join semantics.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    leftTime: Expression,
    rightKeys: Seq[Expression],
    rightTime: Expression,
    isLeftOuter: Boolean = false,
    isForward: Boolean = false,
    tolUs: Option[Long] = None,
    broadcastRight: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule: `crossJoin.hint("graft_asof", lk, lt, rk, rt)` →
  * [[AsOfJoinPlan]]. Runs in the extended-resolution batch, which sits
  * after hint resolution but before the analyzer's final
  * remove-unrecognized-hints pass, so the rewrite happens exactly once
  * and an unextended session never sees the hint as "unrecognized
  * silently dropped" from THIS code path (query builders guard that
  * case loudly — see Relational.b49).
  */
object ResolveAsOfJoin extends Rule[LogicalPlan] {

  private def str(p: Any): Option[String] = p match {
    case s: String => Some(s)
    case Literal(v: UTF8String, StringType) => Some(v.toString)
    case l: Literal if l.dataType == StringType && l.value != null =>
      Some(l.value.toString)
    case _ => None
  }

  private def resolveOne(side: LogicalPlan, name: String, what: String): Expression = {
    val hits = side.output.filter(a => conf.resolver(a.name, name))
    if (hits.size != 1)
      throw new IllegalArgumentException(
        s"graft_asof: $what column '$name' resolved to ${hits.size} " +
          s"attributes among [${side.output.map(_.name).mkString(", ")}] — " +
          "alias the two sides so all four hint columns are unambiguous")
    hits.head
  }

  private def build(l0: LogicalPlan, r0: LogicalPlan, params: Seq[Any]): AsOfJoinPlan = {
    // An explicit broadcast(right) / /*+ BROADCAST(r) */ hint under the
    // join forces the broadcast physical pick regardless of the stats
    // estimate — the same user knob the built-in joins honor. Spark's
    // Hints batch has already turned it into ResolvedHint by the time
    // this rule runs; capture-and-consume it here, because the
    // optimizer's EliminateResolvedHint only pulls hints into Join
    // nodes and would silently strip one left under [[AsOfJoinPlan]].
    // A broadcast hint on the LEFT (fact) side is not applicable to an
    // as-of join (the fact side is the streamed side by construction) —
    // stripped with the same no-op treatment Spark gives inapplicable
    // join hints.
    val (r, rBroadcast) = r0 match {
      case ResolvedHint(child, info) if info.strategy.contains(BROADCAST) =>
        (child, true)
      case other => (other, false)
    }
    val l = l0 match {
      case ResolvedHint(child, info) if info.strategy.contains(BROADCAST) => child
      case other => other
    }
    val names = params.flatMap(str(_))
    if (names.size < 4 || names.size > 7)
      throw new IllegalArgumentException(
        "graft_asof expects 4 string parameters " +
          "(leftKeys, leftTime, rightKeys, rightTime; keys may be " +
          "comma-separated lists of matching length) plus optional flags " +
          s"('inner' | 'left_outer', 'backward' | 'forward', 'tol_us=N'), got $params")
    val Seq(lkN, ltN, rkN, rtN) = names.take(4)
    // composite keys: each key parameter is a comma-separated column
    // list; the two lists pair up positionally and must be the same
    // length — a count mismatch is a silent-semantics hazard, rejected
    // at analysis like every other malformation
    def keyList(spec: String, what: String): Seq[String] = {
      val ks = spec.split(',').map(_.trim).toSeq
      if (ks.isEmpty || ks.exists(_.isEmpty))
        throw new IllegalArgumentException(
          s"graft_asof: $what key list '$spec' is empty or has an empty component")
      if (ks.distinct.size != ks.size)
        throw new IllegalArgumentException(
          s"graft_asof: $what key list '$spec' names a column twice")
      ks
    }
    val lkNs = keyList(lkN, "left")
    val rkNs = keyList(rkN, "right")
    if (lkNs.size != rkNs.size)
      throw new IllegalArgumentException(
        s"graft_asof: key lists differ in length — '$lkN' has ${lkNs.size} " +
          s"columns, '$rkN' has ${rkNs.size}; the two sides' keys pair up " +
          "positionally and must match")
    // trailing flags, any order; each dimension may be set at most once
    var outerFlag: Option[Boolean] = None
    var forwardFlag: Option[Boolean] = None
    var tolUs: Option[Long] = None
    names.drop(4).foreach { f =>
      def set(slot: Option[Boolean], v: Boolean): Option[Boolean] = {
        if (slot.isDefined) throw new IllegalArgumentException(
          s"graft_asof: conflicting/duplicate flag '$f'")
        Some(v)
      }
      f.toLowerCase match {
        case "inner" => outerFlag = set(outerFlag, false)
        case "left_outer" => outerFlag = set(outerFlag, true)
        case "backward" => forwardFlag = set(forwardFlag, false)
        case "forward" => forwardFlag = set(forwardFlag, true)
        case t if t.startsWith("tol_us=") =>
          if (tolUs.isDefined) throw new IllegalArgumentException(
            s"graft_asof: conflicting/duplicate flag '$f'")
          val v = try t.substring("tol_us=".length).toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft_asof: tol_us value is not a long integer: '$f'")
          }
          if (v < 0) throw new IllegalArgumentException(
            s"graft_asof: tol_us must be >= 0, got $v")
          tolUs = Some(v)
        case other => throw new IllegalArgumentException(
          s"graft_asof: unknown flag '$other' (expected 'inner' | " +
            "'left_outer' | 'backward' | 'forward' | 'tol_us=N')")
      }
    }
    val isOuter = outerFlag.getOrElse(false)
    val isFwd = forwardFlag.getOrElse(false)
    val lks = lkNs.map(resolveOne(l, _, "left key"))
    val rks = rkNs.map(resolveOne(r, _, "right key"))
    val (lt, rt) = (resolveOne(l, ltN, "left time"), resolveOne(r, rtN, "right time"))
    lks.zip(rks).foreach { case (lk, rk) =>
      if (lk.dataType != rk.dataType)
        throw new IllegalArgumentException(
          s"graft_asof: key types differ — ${lk.dataType} vs ${rk.dataType}")
    }
    if (lt.dataType != rt.dataType)
      throw new IllegalArgumentException(
        s"graft_asof: time types differ — ${lt.dataType} vs ${rt.dataType}")
    // orderability check: getInterpretedOrdering throws on unordered
    // types at analysis time, not per-row at execution
    lks.foreach(lk => TypeUtils.getInterpretedOrdering(lk.dataType))
    TypeUtils.getInterpretedOrdering(lt.dataType)
    // the tolerance is a difference bound, so it additionally needs the
    // time type's internal representation to be an integral number
    // (micros for timestamps, days for dates, the value itself for
    // integer columns) — checked here, at analysis, not per-row
    if (tolUs.isDefined) lt.dataType match {
      case TimestampType | TimestampNTZType | DateType |
           LongType | IntegerType | ShortType | ByteType => // ok
      case other => throw new IllegalArgumentException(
        "graft_asof: tol_us requires a time column with an integral " +
          s"internal representation (timestamp, date, or integer types), got $other")
    }
    AsOfJoinPlan(l, r, lks, lt, rks, rt, isOuter, isFwd, tolUs, rBroadcast)
  }

  /** Descend a UNARY spine to the condition-free cross/inner join the
    * hint governs. The DataFrame form puts the hint directly on the
    * join; SQL text attaches a SELECT-level hint above the block's
    * Project/Filter/Aggregate chain — same operator, so the rule walks
    * down single-child nodes until the join (rewriting it in place:
    * [[AsOfJoinPlan]] exposes the join's exact output attributes, so
    * every node above stays resolved) and throws on anything else —
    * never a silent downgrade to plain-join semantics.
    *
    * Nullability under `left_outer`: [[AsOfJoinPlan]] widens the right
    * side's attributes to nullable, but the spine's already-resolved
    * expressions still hold `nullable = false` copies of those exprIds
    * when this rule returns. That staleness is repaired before the
    * optimizer runs by the analyzer's own `UpdateNullability` batch
    * (`UpdateAttributeNullability`, which rewrites every operator's
    * attribute nullability from its children's output and is scheduled
    * AFTER the extended-resolution batch this rule lives in) — so
    * nullability-semantic rewrites like NullPropagation's
    * `IsNull(x) -> false` / `coalesce(x, d) -> x` never see the stale
    * flags. Regression-gated in AsOfJoinSpec ("SQL front door
    * left_outer under a spine honors right-side nullability") with
    * provably non-nullable inputs and IS NULL / coalesce / aggregate
    * spines.
    */
  private def rewriteUnder(node: LogicalPlan, params: Seq[Any]): LogicalPlan =
    node match {
      case Join(l, r, Cross | Inner, None, _) => build(l, r, params)
      case u: UnaryNode => u.withNewChildren(Seq(rewriteUnder(u.child, params)))
      case other => throw new IllegalArgumentException(
        "graft_asof hint must govern a condition-free cross/inner join " +
          "(left.crossJoin(right).hint(\"graft_asof\", ...) or SQL " +
          "SELECT /*+ graft_asof(...) */ ... FROM l CROSS JOIN r); " +
          s"found: ${other.nodeName}. Refusing to drop the hint " +
          "silently — the query would run with plain-join semantics.")
    }

  // Malformed placement MUST fail loudly: without the rewriteUnder
  // throw the analyzer's final remove-unrecognized-hints pass would
  // strip the hint and run the underlying plan with plain-join
  // semantics — a silent semantic downgrade. Only fires once the child
  // is resolved (earlier fixed-point iterations may legitimately see an
  // unresolved child that will become a matchable join).
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("graft_asof") && child.resolved =>
      rewriteUnder(child, params)
  }
}

/** Planner strategy for [[AsOfJoinPlan]]: [[BroadcastAsOfJoinExec]]
  * when the right side is dim-sized (logical stats under the session's
  * autoBroadcastJoinThreshold — the exact trade Spark's planner makes
  * for BroadcastHashJoin: ship the sorted dim to every left partition
  * and binary-search per row, instead of shuffling AND sorting the
  * fact table), [[AsOfJoinExec]] (co-partitioned sort-merge)
  * otherwise. An explicit `broadcast(right)` hint (captured by
  * [[ResolveAsOfJoin]] as `broadcastRight`) forces the broadcast pick
  * unconditionally — stats estimates for aggregated dims inherit the
  * pre-aggregation child's size and routinely overestimate, so the
  * user knob matters in exactly the "petabyte fact × pre-aggregated
  * dim" case the operator exists for. Threshold -1 disables the
  * STATS-based pick, same knob as the built-in joins (the explicit
  * hint still wins, mirroring BroadcastHashJoin). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lks, lt, rks, rt, outer, fwd, tol, bcast) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (bcast || (threshold > 0 && r.stats.sizeInBytes <= threshold))
        BroadcastAsOfJoinExec(lks, lt, rks, rt, outer, fwd, tol,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lks, lt, rks, rt, outer, fwd, tol,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Composite-key machinery shared by the two as-of execs: evaluates the
  * N bound key expressions into one Array[Any] — null if ANY component
  * is null, so a partially-null key never matches (per-component SQL
  * equi-join three-valued logic) — and compares two such arrays
  * lexicographically under each component type's interpreted ordering
  * (the same orderings the sort-merge form's requiredChildOrdering
  * sorts by, so TreeMap lookups and merge compares agree for every
  * orderable component type). */
private[plans] final class AsOfKeyOps(types: Seq[org.apache.spark.sql.types.DataType])
    extends java.util.Comparator[Array[Any]] with Serializable {
  private val ords: Array[Ordering[Any]] =
    types.map(t => TypeUtils.getInterpretedOrdering(t).asInstanceOf[Ordering[Any]]).toArray

  override def compare(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < ords.length) {
      val c = ords(i).compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Key tuple of `row` under `bound`, or null if any component is null. */
  def eval(bound: Array[Expression], row: InternalRow): Array[Any] = {
    val out = new Array[Any](bound.length)
    var i = 0
    while (i < bound.length) {
      val v = bound(i).eval(row)
      if (v == null) return null
      out(i) = v
      i += 1
    }
    out
  }
}

/** Sort-merge as-of join. Each child is hash-clustered on its key set
  * (EnsureRequirements co-partitions the two shuffles) and sorted by
  * (key, time); the merge streams both sides with O(1) state per
  * partition beyond the children's own sorts. BACKWARD (default):
  * one buffered right row — the last right row seen for the current
  * key at-or-before the left time. FORWARD: no buffer at all — both
  * sides ascend, so the first un-consumed right row at-or-after the
  * left time IS the match (right rows are only consumed once they can
  * never match a later left row). An optional TOLERANCE bounds the
  * match gap (backward: lt - rt <= tol; forward: rt - lt <= tol) in
  * the time column's internal units; an out-of-tolerance nearest
  * candidate is NOT a match — it drops (inner) or null-fills (outer),
  * which is why tolerance is an operator parameter and not a
  * post-filter. Determinism contract: callers must
  * make the right side unique per (key, time) (b49 pre-aggregates
  * max(event_id)); with duplicates the operator keeps the last
  * (backward) / first (forward) row in (key, time) sort order, which
  * ties leave undefined — same caveat as Spark's own SMJ on
  * non-deterministic input order.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    leftTime: Expression,
    rightKeys: Seq[Expression],
    rightTime: Expression,
    isLeftOuter: Boolean,
    isForward: Boolean,
    tolUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // merge preserves the left side's clustering and (key, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // first-class SQL metrics: without these a custom exec is a blind
  // spot in the UI/metrics pipeline every built-in join reports into
  override lazy val metrics = Map(
    "numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrd = new AsOfKeyOps(leftKeys.map(_.dataType))
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lkB = leftKeys.map(BindReferences.bindReference(_, left.output)).toArray
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = rightKeys.map(BindReferences.bindReference(_, right.output)).toArray
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children not co-partitioned: ${lRdd.getNumPartitions} " +
        s"vs ${rRdd.getNumPartitions}")
    val outer = isLeftOuter
    val forward = isForward
    val rightWidth = right.output.size
    val hasTol = tolUs.isDefined
    val tol = tolUs.getOrElse(0L)
    // tolerance works on the time type's integral internal
    // representation (micros for timestamps, days for dates, the value
    // itself for integer columns) — the resolution rule rejects
    // anything else at analysis, so this total function never misses
    def rawLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case o => throw new IllegalStateException(
        s"graft_asof tolerance on unsupported time representation: ${o.getClass}")
    }
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // all-null right side for outer-join fill (GenericInternalRow is
      // born null-initialized; it's never mutated)
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
      new Iterator[InternalRow] {
        private var ready: InternalRow = null
        // one-row lookahead on the right side (row NOT copied — its
        // key/time are extracted eagerly, the row itself is only read
        // before the next rIter.next())
        private var rRow: InternalRow = null
        private var rK: Array[Any] = null
        private var rT: Any = null
        // the buffered candidate: last right row with key == current
        // left key and time <= current left time (copied — it outlives
        // iterator advances)
        private var candRow: InternalRow = null
        private var candKey: Array[Any] = null
        // the candidate's time, re-evaluated from the COPIED row (same
        // buffer-reuse hazard as candKey) — only consulted under hasTol
        private var candTime: Any = null

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = keyOrd.eval(rkB, r)
            val t = rtB.eval(r)
            if (k != null && t != null) { rRow = r; rK = k; rT = t }
          }
        }
        advanceRight()

        private def computeNext(): Unit = {
          while (ready == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = keyOrd.eval(lkB, l)
            val lt = ltB.eval(l)
            if (lk != null && lt != null) {
              if (forward) {
                // consume right rows strictly before (lk, lt): smaller
                // keys can never match again (left keys ascend), and a
                // same-key right time < lt is also < every later left
                // time for this key. The remaining lookahead row, if
                // its key matches, IS the forward match — used in
                // place, never buffered across an advance.
                var cmp = if (rRow == null) 1 else keyOrd.compare(rK, lk)
                while (rRow != null &&
                    (cmp < 0 || (cmp == 0 && tsOrd.compare(rT, lt) < 0))) {
                  advanceRight()
                  cmp = if (rRow == null) 1 else keyOrd.compare(rK, lk)
                }
                if (rRow != null && cmp == 0 &&
                    (!hasTol || rawLong(rT) - rawLong(lt) <= tol)) {
                  numOutputRows += 1
                  ready = proj(joined(l, rRow))
                } else if (outer) {
                  numOutputRows += 1
                  ready = proj(joined(l, nullRight))
                }
              } else {
                // BACKWARD: consume right rows at or before (lk, lt);
                // rows with the same key become the newest candidate
                var cmp = if (rRow == null) 1 else keyOrd.compare(rK, lk)
                while (rRow != null &&
                    (cmp < 0 || (cmp == 0 && tsOrd.compare(rT, lt) <= 0))) {
                  if (cmp == 0) {
                    candRow = rRow.copy()
                    // re-evaluate the key from the COPIED row: rK aliases
                    // memory the child's sort iterator reuses on the next
                    // advanceRight() for buffer-backed types (UTF8String,
                    // binary, structs) — storing it would corrupt the
                    // candidate-key guard below
                    candKey = keyOrd.eval(rkB, candRow)
                    if (hasTol) candTime = rtB.eval(candRow)
                  }
                  advanceRight()
                  cmp = if (rRow == null) 1 else keyOrd.compare(rK, lk)
                }
                if (candRow != null && keyOrd.compare(candKey, lk) == 0 &&
                    (!hasTol || rawLong(lt) - rawLong(candTime) <= tol)) {
                  numOutputRows += 1
                  ready = proj(joined(l, candRow))
                } else if (outer) {
                  numOutputRows += 1
                  ready = proj(joined(l, nullRight))
                }
              }
            } else if (outer) {
              // null key/time never matches, but LEFT OUTER still
              // retains the left row (same as SQL: NULL = x is not true)
              numOutputRows += 1
              ready = proj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { computeNext(); ready != null }
        override def next(): InternalRow = {
          computeNext()
          if (ready == null) throw new NoSuchElementException
          val out = ready
          ready = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join — the dim-sized-right-side variant. The whole
  * right side ships once to every executor (IdentityBroadcastMode, the
  * same physics as BroadcastNestedLoopJoin's build side) and each task
  * builds a per-key time-sorted index from it; the LEFT side is
  * consumed completely unconstrained — no shuffle, no sort, not even a
  * required ordering — with one ordered-map lookup + binary search per
  * row. At 100 TB this is the as-of analogue of BroadcastHashJoin:
  * "latest FX rate / price / config at event time" joins a petabyte
  * fact table against a megabyte dim without moving the fact table at
  * all, where the sort-merge form would shuffle AND sort every fact
  * row. Semantics are identical to [[AsOfJoinExec]] — backward/forward,
  * inner/left-outer, tolerance, null keys/times never match — and the
  * per-key index is a TreeMap under the SAME interpreted ordering the
  * sort-merge form sorts by, so every orderable key type behaves
  * identically across the two physical plans (no reliance on
  * hashCode/equals of exotic key types).
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    leftTime: Expression,
    rightKeys: Seq[Expression],
    rightTime: Expression,
    isLeftOuter: Boolean,
    isForward: Boolean,
    tolUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  // the fact side flows through untouched
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrd = new AsOfKeyOps(leftKeys.map(_.dataType))
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lkB = leftKeys.map(BindReferences.bindReference(_, left.output)).toArray
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = rightKeys.map(BindReferences.bindReference(_, right.output)).toArray
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    val outer = isLeftOuter
    val forward = isForward
    val hasTol = tolUs.isDefined
    val tol = tolUs.getOrElse(0L)
    val rightWidth = right.output.size
    def rawLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case o => throw new IllegalStateException(
        s"graft_asof tolerance on unsupported time representation: ${o.getClass}")
    }
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    // cache key captured on the DRIVER: the broadcast id is unique per
    // broadcast variable (shared by every task of every stage reading
    // it) and the plan id disambiguates two as-of execs that might
    // reuse one broadcast with different key/time expressions
    val cacheKey = (broadcastRows.id, id)
    left.execute().mapPartitions { lIter =>
      // per-EXECUTOR index build from the broadcast (memoized): the
      // broadcast value ships once per executor, but rebuilding the
      // per-key sorted index in every task repeats K log K work
      // thousands of times on a real cluster — the repeated work
      // Spark's own BroadcastHashJoin avoids by shipping a pre-built
      // relation. First task to arrive builds (others block on the
      // cache lock for the ms-scale, dim-sized build); the rest
      // share the read-only TreeMap. Ties on (key, time) keep
      // broadcast array order (stable in-place sort — same "undefined
      // under duplicates" caveat as the sort-merge form).
      val index = BroadcastAsOfJoinExec.cachedIndex(cacheKey, () => {
        val idx = new java.util.TreeMap[Array[Any], AnyRef](keyOrd)
        // build directly into the FINAL TreeMap: buffers accumulate in
        // place and are replaced by their sorted array form via
        // entry.setValue — no intermediate byKey map, no second
        // allocation of the whole index
        broadcastRows.value.foreach { r =>
          val k = keyOrd.eval(rkB, r)
          val t = rtB.eval(r)
          if (k != null && t != null) {
            var buf = idx.get(k)
              .asInstanceOf[scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty[(Any, InternalRow)]
              idx.put(k, buf)
            }
            buf.append((t, r))
          }
        }
        idx.entrySet().forEach { e =>
          val buf = e.getValue
            .asInstanceOf[scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
          buf.sortInPlaceBy(_._1)(tsOrd.asInstanceOf[Ordering[Any]])
          e.setValue((buf.map(_._1).toArray, buf.map(_._2).toArray))
        }
        idx
      })

      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)

      // binary search: greatest index with times(i) <= t (backward) /
      // least index with times(i) >= t (forward); -1 if none
      def lastLeq(times: Array[Any], t: Any): Int = {
        var lo = 0; var hi = times.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (tsOrd.compare(times(mid), t) <= 0) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        ans
      }
      def firstGeq(times: Array[Any], t: Any): Int = {
        var lo = 0; var hi = times.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (tsOrd.compare(times(mid), t) >= 0) { ans = mid; hi = mid - 1 }
          else lo = mid + 1
        }
        ans
      }

      lIter.flatMap { l =>
        val lk = keyOrd.eval(lkB, l)
        val lt = ltB.eval(l)
        var matched: InternalRow = null
        if (lk != null && lt != null) {
          val entry = index.get(lk)
            .asInstanceOf[(Array[Any], Array[InternalRow])]
          if (entry != null) {
            val (times, rows) = entry
            val i = if (forward) firstGeq(times, lt) else lastLeq(times, lt)
            if (i >= 0) {
              val inTol = !hasTol || {
                val gap = if (forward) rawLong(times(i)) - rawLong(lt)
                          else rawLong(lt) - rawLong(times(i))
                gap <= tol
              }
              if (inTol) matched = rows(i)
            }
          }
        }
        if (matched != null) {
          numOutputRows += 1
          Iterator.single(proj(joined(l, matched)))
        } else if (outer) {
          numOutputRows += 1
          Iterator.single(proj(joined(l, nullRight)))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Executor-side memo of built as-of indexes. One JVM-wide bounded LRU:
  * entries are keyed by (broadcast id, plan id) so every task of every
  * stage executing the same broadcast as-of join shares ONE build. The
  * index holds references to the SAME InternalRows as the deserialized
  * broadcast block (no row copies) plus key/time arrays, so each entry's
  * incremental footprint is small and the planner's
  * autoBroadcastJoinThreshold gate keeps it dim-sized; the LRU cap
  * bounds worst-case retention after broadcasts are destroyed.
  * `computeIfAbsent` on the synchronized map holds the lock for the
  * duration of a build — deliberate: a stampede of tasks at stage start
  * should WAIT milliseconds for one build, not run 32 copies of it. */
object BroadcastAsOfJoinExec {
  private val CacheCap = 16

  /** Total index builds in this JVM — observability hook for the
    * memoization spec (local mode: executor == driver JVM). */
  private[plans] val buildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  private val cache: java.util.Map[(Long, Int), java.util.TreeMap[Array[Any], AnyRef]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Long, Int), java.util.TreeMap[Array[Any], AnyRef]](
        CacheCap, 0.75f, /* accessOrder = */ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Long, Int), java.util.TreeMap[Array[Any], AnyRef]]): Boolean =
          size() > CacheCap
      })

  private[plans] def cachedIndex(
      key: (Long, Int),
      build: () => java.util.TreeMap[Array[Any], AnyRef]): java.util.TreeMap[Array[Any], AnyRef] =
    cache.computeIfAbsent(key, _ => { buildCount.incrementAndGet(); build() })
}
