package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator — the full Spark-extension
  * ladder: a custom logical node ([[TopKPerKey]]), an optimizer rule
  * ([[WindowTopKRule]]) that recognizes the declarative
  * `row_number().over(partitionBy..orderBy) <= k` shape users write,
  * a planner strategy ([[TopKStrategy]]), and a physical operator
  * ([[TopKPerKeyExec]]).
  *
  * Why: `WindowExec` must SORT every partition group in full before
  * row_number can be filtered — at 100 TB that is a full shuffle-sort
  * (and spill) of the candidate set just to keep k rows per key.
  * [[TopKPerKeyExec]] keeps a bounded, ordered buffer of k rows per
  * key in one pass: no sort, no spill, memory ∝ distinct keys per
  * partition × k. Users keep writing the window form; the optimizer
  * swaps the plan — declarative query, Spark-first execution.
  *
  * Tie semantics match `row_number` with a nondeterministic tiebreak:
  * rows comparing equal keep first-seen order. Every catalog query
  * orders by a unique tiebreak, so results are deterministic.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Rewrites `Filter(rank <= k, [Project,] Window(row_number over spec))`
  * to [[TopKPerKey]]. Runs from `experimental.extraOptimizations` (after
  * the built-in batches); a `WindowGroupLimit` the built-in
  * `InferWindowGroupLimit` rule may already have inserted is absorbed —
  * the custom operator subsumes its prefiltering.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  private object RankLimit {
    /** (rank attribute, k) from a rank-bounding predicate. */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v))
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v - 1))
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v))
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v - 1))
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if v == 1 => Some((a, 1))
      case _ => None
    }
  }

  private def asTopK(w: Window, rank: Attribute, limit: Int): Option[TopKPerKey] =
    w match {
      case Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, ord,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)
          if alias.toAttribute.semanticEquals(rank) && limit > 0 &&
            part.forall(_.deterministic) && ord.forall(_.deterministic) =>
        val base = child match {
          // built-in group-limit prefilter is subsumed by TopKPerKeyExec
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        Some(TopKPerKey(part, ord, limit, alias.toAttribute, base))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(RankLimit(rank, limit), w: Window) =>
      asTopK(w, rank, limit).getOrElse(f)
    case f @ Filter(RankLimit(rank, limit), p @ Project(plist, w: Window)) =>
      asTopK(w, rank, limit).map(t => Project(plist, t)).getOrElse(f)
  }
}

/** Plans [[TopKPerKey]] to [[TopKPerKeyExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One-pass grouped top-k: requires clustering on the keys (Spark
  * inserts the hash exchange), then per partition keeps an ordered
  * k-bounded buffer per key — insertion instead of a full sort. Emits
  * each key's rows with their 1-based rank appended.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val rankA = rankAttr
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering = new LazilyGeneratedOrdering(orderExprs, childOutput)
      val groups = new java.util.LinkedHashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[UnsafeRow](kLocal)
          groups.put(key.copy(), buf)
        }
        // belongs to the current top-k iff the buffer has room or it
        // sorts strictly before the current k-th row (first-seen wins
        // ties, matching row_number over a stable scan)
        if (buf.size < kLocal ||
            ordering.compare(row, buf.get(buf.size - 1)) < 0) {
          val copied = rowProj(row).copy()
          var pos = buf.size
          while (pos > 0 && ordering.compare(copied, buf.get(pos - 1)) < 0) pos -= 1
          buf.add(pos, copied)
          if (buf.size > kLocal) buf.remove(kLocal)
        }
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rankA)
      groups.entrySet().iterator().asScala.flatMap { e =>
        val rows = e.getValue
        (0 until rows.size()).iterator.map { i =>
          rankRow.update(0, i + 1)
          outProj(joined(rows.get(i), rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Installs the rule + strategy into a session's experimental hooks —
  * the runtime path for sessions not built with `withExtensions`
  * (e.g. the driver's). Idempotent. */
object GraftPlanner {
  def install(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(WindowTopKRule))
      exp.extraOptimizations = exp.extraOptimizations :+ WindowTopKRule
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }
}
