package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit: walks every registered query's
  * executed plan and asserts the scale invariants the 100 TB design
  * depends on — no cartesian products and no unpartitioned windows
  * except where a named, justified exception is recorded below.
  *
  * The exception maps are part of the contract: an entry that stops
  * matching FAILS the audit too, so the list can't rot into a blanket
  * waiver. A new offender shows up with its query name and node, and
  * must either be fixed or argued into the map with a justification.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  /** Flatten to physical nodes, descending into AQE roots and subquery
    * plans (correlated scalars carry their own plan trees). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(nodes)
  }

  /** No query may plan a CartesianProduct, period — even the all-pairs
    * baselines broadcast one side instead. */
  private val cartesianOk: Map[String, String] = Map.empty

  /** Broadcast nested-loop is acceptable only when the broadcast side is
    * constant w.r.t. corpus size (a 1-row grand total, a model-sized
    * codebook, a fixed probe set) — the loop is then k*n, not n^2 — or
    * in the two deliberately quadratic, bench-excluded baselines. */
  private val bnljOk: Map[String, String] = Map(
    "q33_jaccard_pairs" -> "all-pairs Jaccard verification baseline oracling banded q34/q35 (bench-excluded)",
    "q44_embed_neardup" -> "all-pairs cosine verification baseline oracling LSH q50/q52 (bench-excluded)",
    "q37_knn_brute" -> "fixed probe set broadcast against corpus: the documented brute-force ANN baseline (k*n)",
    "q61_knn_sq8" -> "fixed probe set x SQ8 corpus scan: broadcast side is the query batch (constant)",
    "q64_knn_pq" -> "PQ codebook-as-literals rerank: broadcast side is the model (constant)",
    "q66_mixture_report" -> "1-row grand-total broadcast for mixture shares",
    "q72_mixture_weights" -> "1-row normalizer broadcast",
    "q73_unigram_logprob" -> "1-row corpus-token-total broadcast",
    "q108_tfidf_keywords" -> "1-row corpus-doc-count broadcast for idf",
    "q110_quantile_sketch" -> "constant 4-row quantile-list broadcast",
    "q112_bm25_retrieval" -> "1-row corpus-stats (N, avgdl) broadcast",
    "q121_collocations" -> "1-row bigram-total broadcast for PMI",
    "q124_mg_heavy_hitters" -> "1-row (sketch, total) broadcast against the 10-row probe set",
    "q125_term_drift" -> "1-row cohort-totals broadcast for the log-odds prior",
    "q102_bigram_logprob" -> "1-row corpus-total broadcast",
    "q87_hll_relational" -> "1-row register-mass/cardinality broadcast",
    "q95_histogram" -> "1-row min/max bounds broadcast for bucket width",
    "q92_idle_rich_customers" -> "1-row scalar threshold (avg balance) broadcast",
  )

  /** Unpartitioned windows allowed only over provably bounded inputs.
    * (q79/q86's former global top-K windows were rebuilt on
    * per-partition prefilters + bounded finals in round 7.) */
  private val globalWindowOk: Map[String, String] = Map(
    "q75_budget_select" -> "running sum over the <=1001-row quality-bucket histogram (doc-level window is bucket-partitioned)",
  )

  test("catalog-wide plan audit: cartesian/BNLJ/global-window invariants") {
    val offendersCartesian = scala.collection.mutable.ListBuffer.empty[String]
    val offendersBnlj = scala.collection.mutable.ListBuffer.empty[String]
    val offendersWindow = scala.collection.mutable.ListBuffer.empty[String]
    val hitCartesian = scala.collection.mutable.Set.empty[String]
    val hitBnlj = scala.collection.mutable.Set.empty[String]
    val hitWindow = scala.collection.mutable.Set.empty[String]

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, run) =>
      val plan = run(spark, sf).queryExecution.executedPlan
      val ns = nodes(plan)
      ns.foreach {
        case _: CartesianProductExec =>
          if (cartesianOk.contains(name)) hitCartesian += name
          else offendersCartesian += name
        case _: BroadcastNestedLoopJoinExec =>
          if (bnljOk.contains(name)) hitBnlj += name
          else offendersBnlj += name
        case w: WindowExec if w.partitionSpec.isEmpty =>
          if (globalWindowOk.contains(name)) hitWindow += name
          else offendersWindow += name
        case _ =>
      }
    }

    assert(offendersCartesian.isEmpty,
      s"undocumented CartesianProduct in: ${offendersCartesian.distinct.mkString(", ")}")
    assert(offendersBnlj.isEmpty,
      s"undocumented BroadcastNestedLoopJoin in: ${offendersBnlj.distinct.mkString(", ")}")
    assert(offendersWindow.isEmpty,
      s"undocumented unpartitioned Window in: ${offendersWindow.distinct.mkString(", ")}")
    // stale-waiver guard: every recorded exception must still be real
    assert(hitCartesian == cartesianOk.keySet,
      s"stale cartesianOk entries: ${(cartesianOk.keySet -- hitCartesian).mkString(", ")}")
    assert(hitBnlj == bnljOk.keySet,
      s"stale bnljOk entries: ${(bnljOk.keySet -- hitBnlj).mkString(", ")}")
    assert(hitWindow == globalWindowOk.keySet,
      s"stale globalWindowOk entries: ${(globalWindowOk.keySet -- hitWindow).mkString(", ")}")
  }
}
