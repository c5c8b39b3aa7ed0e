package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raw-error observability for the calibrated-envelope sketch gates
  * (q43 HLL, q110 quantile rank). The oracled queries can only emit a
  * boolean within_bound flag (the raw estimates are engine-private /
  * sketch-internal), so a tripped gate on new data would otherwise be
  * indistinguishable from an engine mismatch. This spec computes and
  * PRINTS the raw errors at two SFs and asserts they sit well inside
  * the gated envelopes on the pinned corpora — if a future CORRECTNESS
  * run flips within_bound, these numbers say whether it was accuracy
  * drift (error crept toward the envelope) or a real defect. */
class SketchErrorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q43 HLL relative error: raw per-group values inside the 15% gate") {
    import spark.implicits._
    for (d <- sfs) {
      val errs = graft.catalog.Tables.t(spark, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx"),
          countDistinct($"l_partkey").as("exact"))
        .select($"l_returnflag",
          (abs($"approx" - $"exact").cast("double") / $"exact").as("rel_err"))
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1))
      info(s"$d HLL rel_err: " +
        errs.map { case (k, e) => f"$k=$e%.4f" }.mkString(", "))
      errs.foreach { case (k, e) =>
        assert(e <= 0.15, s"group $k rel_err $e exceeds the gated envelope")
      }
    }
  }

  test("q110 quantile rank error: raw values inside the n/1000 + 1 gate") {
    import spark.implicits._
    for (d <- sfs) {
      val docs = graft.catalog.Tables.t(spark, d, "documents")
        .select($"lang", $"n_chars")
      val cum = docs.groupBy($"lang", $"n_chars".as("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"lang").orderBy($"v")))
      val approx = docs.groupBy($"lang")
        .agg(percentile_approx($"n_chars",
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(1000)).as("avs"))
        .select($"lang", posexplode($"avs").as(Seq("i", "av")))
        .withColumn("q_pct",
          element_at(array(lit(25L), lit(50L), lit(75L), lit(90L)), $"i" + 1))
      val nPer = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      val rankErr = approx.join(cum, "lang")
        .filter($"v" <= $"av")
        .groupBy($"lang", $"q_pct").agg(max($"cum").as("av_rank"))
        .join(nPer, "lang")
        .select($"lang", $"q_pct", $"n",
          abs($"av_rank" - expr("(q_pct * n + 99) div 100")).as("rank_err"),
          expr("(n + 999) div 1000 + 1").as("bound"))
        .collect()
      info(s"$d quantile rank_err: " + rankErr.map(r =>
        s"${r.getString(0)}/p${r.getLong(1)}=${r.getLong(3)}(≤${r.getLong(4)})")
        .mkString(", "))
      rankErr.foreach { r =>
        assert(r.getLong(3) <= r.getLong(4),
          s"${r.getString(0)} p${r.getLong(1)} rank_err ${r.getLong(3)} " +
            s"exceeds bound ${r.getLong(4)}")
      }
    }
  }
}
