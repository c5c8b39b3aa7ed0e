package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

/** Invariant tests for the Misra-Gries heavy-hitter Aggregator: the
  * summary CONTENT may depend on merge order (that's inherent to MG),
  * so every assertion here is one of the three guarantees the q124
  * contract gates — never overcounts, undercount <= n/(k+1), and
  * every item heavier than n/(k+1) present — checked across several
  * partitionings of the same planted stream.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Planted skew: one token at ~60% mass, one at ~20%, light tail. */
  private val planted: Seq[(String, Long)] =
    Seq(("heavy", 600L), ("warm", 200L)) ++
      (0 until 40).map(i => (s"light$i", 5L))

  private def summarize(k: Int, partitions: Int): Map[String, Long] = {
    val mg = udaf(MisraGries(k))
    // one row per (token, weight) chunk, split so partials see pieces
    val rows = planted.flatMap { case (t, w) =>
      val chunk = math.max(1L, w / 7)
      (0L until w by chunk).map(off => (t, math.min(chunk, w - off)))
    }
    rows.toDF("tok", "cnt").repartition(partitions)
      .agg(mg($"tok", $"cnt").as("sketch"))
      .head().getMap[String, Long](0).toMap
  }

  test("MG invariants hold for every partitioning of the same stream") {
    val exact = planted.toMap
    val n = planted.map(_._2).sum
    for (p <- Seq(1, 4, 32); k <- Seq(4, 16)) {
      val est = summarize(k, p)
      val bound = n / (k + 1)
      assert(est.size <= k, s"p=$p k=$k: ${est.size} counters > k")
      est.foreach { case (t, e) =>
        val tr = exact.getOrElse(t, 0L)
        assert(e <= tr, s"p=$p k=$k: overcount $t est=$e true=$tr")
        assert(e >= tr - bound, s"p=$p k=$k: undercount $t beyond n/(k+1)")
      }
      exact.foreach { case (t, tr) =>
        if (tr > bound)
          assert(est.contains(t), s"p=$p k=$k: heavy hitter $t missing")
      }
      assert(est.contains("heavy") && est.contains("warm"))
    }
  }

  test("with k >= distinct items the summary is exact") {
    val est = summarize(k = 64, partitions = 8)
    assert(est == planted.toMap)
  }
}
