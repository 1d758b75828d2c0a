package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** As-of join as a first-class plan: logical node → strategy → physical
  * merge pass.
  *
  * The composition form (`operators/AsOfJoin.asOf`) expresses the same
  * semantics as UNION + window, which costs one exchange over
  * |probes|+|facts| rows, a sort of the combined stream, a window pass
  * carrying a struct, and a post-filter back down to |probes|. Built-in
  * operators genuinely can't say "merge these two sorted streams
  * key-aligned" — that's a whole-operator semantic, so per the extension
  * ladder it gets the full treatment: a `LogicalPlan` node, a
  * `SparkStrategy`, and a `BinaryExecNode` registered through
  * `SparkSessionExtensions` (`GraftExtensions`).
  *
  * The physical operator declares `ClusteredDistribution` on the keys for
  * BOTH children and an ascending (keys, time) ordering — exactly what
  * `SortMergeJoinExec` declares — so EnsureRequirements plants the two
  * hash exchanges and per-side sorts, AQE coalesces them like any join,
  * and the operator itself is a single streaming merge per partition:
  * each side is read ONCE, in order, with O(1) carried state (the last
  * at-or-before fact row). No union of the streams, no window buffer, no
  * post-filter. At 100 TB that halves the sorted bytes versus the
  * composition and never materializes probe+fact rows in one structure.
  */
case class AsOfJoinNode(
    probes: LogicalPlan,
    facts: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    strict: Boolean) extends BinaryNode {

  override def left: LogicalPlan = probes
  override def right: LogicalPlan = facts

  /** Inner as-of: every probe column plus the matched fact's time and
    * payload (fact attributes keep their exprIds — the API layer re-aliases
    * the fact side so a self-join can't share ids across children).
    *
    * The key/time/payload attributes are CONSTRUCTOR fields, not name
    * lookups: `QueryPlan.expressions` collects them, which makes
    * `references` truthful — without that, ColumnPruning sees a node that
    * "uses no columns" and strips the fact side bare. */
  override def output: Seq[Attribute] =
    probes.output ++ (rightTime +: payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(probes = newLeft, facts = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, n.strict,
        planLater(n.probes), planLater(n.facts)) :: Nil
    case _ => Nil
  }
}

/** One key-aligned merge pass over two (keys, time)-sorted children: for
  * each probe row emit it joined to the latest fact row at-or-before
  * (strictly-before when `strict`) its time within the same key; probes
  * with no preceding fact are dropped (inner as-of, DuckDB `ASOF JOIN`).
  *
  * Carried state is ONE fact row + its key — independent of history
  * length, skew-proof: a hot key costs a longer sorted run, never memory.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (rightTime +: rightPayload)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  private def timeAsLong(a: Attribute): Boolean = a.dataType match {
    case TimestampType | TimestampNTZType | LongType | DateType => true
    case _ => false
  }
  require(timeAsLong(leftTime) && timeAsLong(rightTime),
    s"as-of time columns must be timestamp/long/date, got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val strictCmp = strict
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    val lTimeIsDate = leftTime.dataType == DateType
    val rTimeIsDate = rightTime.dataType == DateType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(
        lKeyExprs.map(k =>
          BindReferences.bindReference(k: Expression, lOut)))
      val rKeyProj = UnsafeProjection.create(
        rKeyExprs.map(k =>
          BindReferences.bindReference(k: Expression, rOut)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow

      def lTimeOf(r: InternalRow): Long =
        if (lTimeIsDate) r.getInt(lTimeOrd).toLong else r.getLong(lTimeOrd)
      def rTimeOf(r: InternalRow): Long =
        if (rTimeIsDate) r.getInt(rTimeOrd).toLong else r.getLong(rTimeOrd)

      val rBuf = rIter.buffered
      var candFact: InternalRow = null
      var candKey: InternalRow = null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeOf(lRow)
        // consume facts up to (key, time): smaller-key facts roll the
        // candidate forward harmlessly (their key won't compare equal),
        // equal-key facts at-or-before the probe time become the candidate
        var advance = true
        while (advance && rBuf.hasNext) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && {
            val rT = rTimeOf(rRow)
            if (strictCmp) rT < lT else rT <= lT
          })) {
            candFact = rBuf.next().copy()
            candKey = rKey.copy()
          } else advance = false
        }
        if (candKey != null && keyOrd.compare(candKey, lKey) == 0 && {
          val cT = rTimeOf(candFact)
          if (strictCmp) cT < lT else cT <= lT
        }) Iterator.single(outProj(joined(lRow, candFact)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the native as-of join. */
object AsOfJoinPlan {
  import org.apache.spark.sql.{DataFrame, GraftColumnBridge => B}

  /** Inner as-of join via [[AsOfJoinExec]] — same contract as
    * `AsOfJoin.asOf(..., inner = true)`. The fact side's plan is
    * re-aliased with fresh exprIds so self-joins (probes and facts carved
    * from the same source) are unambiguous. */
  def asOfNative(probes: DataFrame, facts: DataFrame, keys: Seq[String],
                 probeTime: String, factTime: String,
                 factPayload: Seq[String],
                 strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(!factPayload.exists(probes.columns.contains),
      s"fact payload ${factPayload.mkString(",")} collides with probe columns")
    val pPlan = probes.queryExecution.analyzed
    val fPlan0 = facts.queryExecution.analyzed
    val fPlan = Project(fPlan0.output.map(a => Alias(a, a.name)()), fPlan0)
    def attrOf(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"as-of: no $side column $name"))
    val fOut = fPlan.output
    B.ofRows(probes.sparkSession,
      AsOfJoinNode(pPlan, fPlan,
        keys.map(attrOf(pPlan.output, _, "probe")),
        keys.map(attrOf(fOut, _, "fact")),
        attrOf(pPlan.output, probeTime, "probe"),
        attrOf(fOut, factTime, "fact"),
        factPayload.map(attrOf(fOut, _, "fact")),
        strict))
  }
}
