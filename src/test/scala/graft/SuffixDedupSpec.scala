package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the EXACT substring-dedup profile (q369,
  * suffix-array prefix doubling) against the rolling-hash
  * APPROXIMATION it replaces (q77) — the round-13 verdict's readout:
  * on the shared planted 12-token tail the two must agree, and the
  * exact form's per-doc numbers must satisfy the span-geometry
  * invariants the hash form cannot express.
  */
class SuffixDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val exact =
    SparkEntry.queries("q369_suffix_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("q369 exact profile flags every planted doc and respects span geometry") {
    assert(exact.nonEmpty)
    exact.foreach { case (id, (nt, nd, ns, ppm)) =>
      assert(nd <= nt, s"doc $id: covered positions exceed tokens")
      // a maximal covered run is at least the window width (coverage
      // of one duplicated start marks all 8 of its positions), so
      // n_spans * 8 <= n_dup_positions whenever any span exists
      assert(ns * 8L <= nd || nd == 0L,
        s"doc $id: $ns spans cannot fit in $nd covered positions")
      assert(ppm == math.floor(nd.toDouble / nt * 1000000d).toLong)
      if (id % 7 == 3)
        // the planted 12-token tail duplicates across all planted docs:
        // its 5 eligible starts cover exactly the 12 tail positions
        assert(nd >= 12L && ns >= 1L,
          s"planted doc $id not flagged by the exact profile")
    }
  }

  test("q369 agrees with q77's rolling-hash approximation on the planted family") {
    val approx =
      SparkEntry.queries("q77_window_dedup")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (id, appPpm) =>
      val (_, nd, _, _) = exact(id)
      if (id % 7 == 3) {
        assert(appPpm > 0L, s"planted doc $id missed by q77")
        assert(nd > 0L, s"planted doc $id missed by q369")
      }
      // one-way containment: q77 marks a doc when one of its 8-token
      // windows recurs in ANOTHER document; the exact profile counts
      // corpus-wide recurrence INCLUDING self-repetition (Lee et al.
      // semantics), so every q77-flagged doc must also be q369-flagged
      // — the reverse need not hold
      if (appPpm > 0L)
        assert(nd > 0L,
          s"doc $id: hash approximation flagged it but the exact form did not")
    }
  }
}
