package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** A whole-operator Catalyst extension (SURVEY §2 custom-operator
  * ladder, rung (c)): AS-OF JOIN as a first-class physical operator —
  * logical node → planner strategy → merge-join exec — instead of the
  * union+window formulation b19 uses.
  *
  * Semantics (matches b19 / DuckDB `ASOF LEFT JOIN`): for each target
  * row, the `src_val` of the LATEST source row of the same user with
  * `source.ts <= target.ts` (inclusive; ties among sources broken by
  * event_id, last wins), NULL when no source precedes.
  *
  * Scale shape: `requiredChildDistribution` co-clusters both sides on
  * user_id and `requiredChildOrdering` sorts each by (user, ts,
  * event_id) — EnsureRequirements plans the exchanges/sorts, AQE
  * sizes them. The join itself is then ONE streaming merge pass per
  * partition holding O(1) state (the last source seen), strictly less
  * work than the window formulation, which materializes the unioned
  * stream and runs a running-`last` frame over it. At 100 TB both
  * sides shuffle once on user_id — same as the window plan — but the
  * merge never buffers a frame.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    asofVal: AttributeReference =
      AttributeReference("asof_val", DoubleType, nullable = true)())
  extends BinaryNode {
  // contract (validated by AsOfJoin.apply):
  //   left  = targets (event_id L, user_id L, ts T)
  //   right = sources (user_id L, ts T, event_id L, src_val D)
  override def output: Seq[Attribute] = left.output :+ asofVal
  // asof_val is GENERATED here, not drawn from a child — declare it
  // or CheckAnalysis rejects the plan as missing the attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofVal :: Nil)
  // the merge consumes every child column positionally — without this,
  // ColumnPruning sees zero referenced attributes and projects the
  // children down to nothing
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight) // asofVal survives — exprId stable
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.output, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(outputAttrs: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs.last :: Nil)

  // co-cluster both sides on user_id; EnsureRequirements inserts the
  // exchanges (and re-shuffles if the children's partitionings are
  // incompatible), exactly as for built-in joins
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output(1))),
    ClusteredDistribution(Seq(right.output(0))))

  // sorted merge input: (user, ts, event_id) on both sides; the
  // event_id tiebreak makes equal-timestamp source order (and so the
  // surviving value) deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(1), Ascending),
      SortOrder(left.output(2), Ascending),
      SortOrder(left.output(0), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
      SortOrder(right.output(1), Ascending),
      SortOrder(right.output(2), Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        // single-row right cursor: fields are extracted to primitives
        // immediately, so no InternalRow is ever retained (safe under
        // UnsafeRow reuse)
        private var rValid = false
        private var rUser = 0L; private var rTs = 0L
        private var rVal = 0.0; private var rValNull = true
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rUser = r.getLong(0); rTs = r.getLong(1)
            rValNull = r.isNullAt(3)
            rVal = if (rValNull) 0.0 else r.getDouble(3)
            rValid = true
          } else rValid = false
        advanceRight()

        // O(1) merge state: the last source consumed
        private var lastUser = Long.MinValue
        private var lastVal = 0.0
        private var lastValNull = true

        private val proj =
          UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
        private val row =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val u = l.getLong(1); val t = l.getLong(2)
          while (rValid && (rUser < u || (rUser == u && rTs <= t))) {
            lastUser = rUser; lastVal = rVal; lastValNull = rValNull
            advanceRight()
          }
          row.update(0, l.getLong(0))
          row.update(1, u)
          row.update(2, t)
          if (lastUser == u && !lastValNull) row.update(3, lastVal)
          else row.setNullAt(3)
          proj(row)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** The user-facing API: validates the column contract, registers the
  * strategy once per session, and assembles the custom plan. */
object AsOfJoin {
  def registered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** targets: (event_id L, user_id L, ts T); sources: (user_id L,
    * ts T, event_id L, src_val D). Returns targets + `asof_val`. */
  def apply(spark: SparkSession, targets: DataFrame,
      sources: DataFrame): DataFrame = {
    val lt = targets.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val rt = sources.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(lt == Seq(("event_id", LongType), ("user_id", LongType),
      ("ts", TimestampType)), s"targets schema mismatch: $lt")
    require(rt == Seq(("user_id", LongType), ("ts", TimestampType),
      ("event_id", LongType), ("src_val", DoubleType)),
      s"sources schema mismatch: $rt")
    registered(spark)
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoinPlan(
        org.apache.spark.sql.graft.Bridge.analyzedPlan(targets),
        org.apache.spark.sql.graft.Bridge.analyzedPlan(sources)))
  }
}
