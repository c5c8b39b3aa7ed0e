package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-13 training-loop / advisor
  * operators (q357-q363) — properties the DuckDB hash gate cannot
  * express because they relate ROWS of one result to each other
  * (monotonicity, conservation, submodular diminishing returns),
  * pinned against the smallest testdata SF. Each is a theorem of the
  * operator's EXACT-arithmetic semantics; where the implementation
  * floor-quantizes (q357's integer centroids and d2 millis), the
  * assertion is loosened by the quantization envelope rather than
  * claimed as an exact theorem (round-13 ADVICE).
  */
class TrainingOpsInvariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q357 Lloyd: the update round never increases inertia, and both rounds partition the same corpus") {
    val rows = SparkEntry.queries("q357_kmeans_lloyd")(spark, sf).collect()
    val byStep = rows.groupBy(_.getLong(0))
    assert(byStep.keySet == Set(1L, 2L))
    // membership conservation: every vector is assigned exactly once
    // in each round
    def n(step: Long) = byStep(step).map(_.getLong(2)).sum
    assert(n(1L) == n(2L) && n(1L) > 0)
    // Lloyd's descent property, loosened by the quantization envelope:
    // with floor-quantized M-step centroids (floor(sum/n) per dim) and
    // per-member d2 floored to millis, true monotonicity only holds up
    // to the accumulated floor error — bounded by one unit per dim per
    // member (64 * n_members) plus one milli-unit per member from the
    // mean floor. On this data the true decrease dominates and the
    // strict form also holds, but the ASSERTED bound is the envelope,
    // not the exact theorem (round-13 ADVICE).
    def inertia(step: Long) =
      byStep(step).map(r => r.getLong(2) * r.getLong(3)).sum
    val envelope = 64L * n(1L) + n(1L)
    assert(inertia(2L) <= inertia(1L) + envelope,
      s"inertia rose past the quantization envelope ($envelope): " +
        s"round1=${inertia(1L)} round2=${inertia(2L)}")
  }

  test("q370 band-gate FP cost: the held rate is real, the FP share is bounded") {
    val r = SparkEntry.queries("q370_band_gate_fp")(spark, sf).collect()
    assert(r.length == 1)
    val Seq(nDocs, nHeld, nFp, heldPpm, fpPpm) =
      (0 to 4).map(r(0).getLong)
    assert(nDocs > 0 && nHeld > 0, "gate held nothing — no near-dups?")
    assert(nFp <= nHeld && fpPpm <= heldPpm)
    assert(heldPpm == nHeld * 1000000L / nDocs)
    assert(fpPpm == nFp * 1000000L / nDocs)
    // the invariant BOUND (round-13 verdict #6): held-but-not-duplicate
    // docs are at most 20% of all held docs — measured 0/24 at
    // sf0.001/sf0.01 and 4/247 (1.6%) at sf0.1; the 20% ceiling is the
    // data-pinned envelope with ~10x headroom, and crossing it means
    // the gate's conservatism has become a real data-loss problem
    assert(nFp * 5L <= nHeld,
      s"FP share ${nFp}/$nHeld exceeds the 20% envelope")
  }

  test("q358 DoReMi: weights are a smoothed distribution favoring excess loss") {
    val rows = SparkEntry.queries("q358_doremi_reweight")(spark, sf).collect()
    val n = rows.length
    assert(n > 1)
    val w = rows.map(_.getLong(5))
    // normalization: ppm weights sum to 1e6 up to one floor per source
    assert(w.sum <= 1000000L && w.sum >= 1000000L - 3L * n,
      s"weight sum ${w.sum} outside the floor-rounding envelope")
    // smoothing floor: eps = 2% of uniform survives for EVERY source
    val floor = (20000L * (1000000L / n)) / 1000000L
    w.foreach(x => assert(x >= floor))
    // monotone in excess: sources sorted by excess_ppm have
    // non-decreasing weights (w_raw = 1e6 + excess is monotone and the
    // affine smoothing preserves order up to the div-floor)
    val byExcess = rows.sortBy(_.getLong(4)).map(_.getLong(5))
    byExcess.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1, s"weight order violates excess order: $a -> $b")
    }
  }

  test("q359 weighted Jaccard: scores are valid ppm and pairs are canonical") {
    val rows =
      SparkEntry.queries("q359_weighted_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty) // natural hamming<=3 pairs exist at every SF
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // doc_a < doc_b
      Seq(r.getLong(2), r.getLong(3)).foreach(p =>
        assert(p >= 0L && p <= 1000000L))
    }
  }

  test("q360 greedy coverage: diminishing returns and strictly growing coverage") {
    val rows = SparkEntry.queries("q360_greedy_coverage")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    // submodularity: marginal gains are non-increasing in step order
    rows.map(_.getLong(2)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"marginal gain rose: $a -> $b")
    }
    // coverage strictly increases while gains are positive
    rows.map(_.getLong(3)).sliding(2).foreach { case Array(a, b) =>
      assert(b > a)
    }
    // no document picked twice
    assert(rows.map(_.getLong(1)).distinct.length == 4)
  }

  test("q361 canonicalization ladder: coarser levels only merge, never split") {
    val rows = SparkEntry.queries("q361_canonical_ladder")(spark, sf)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("L0", "L1", "L2"))
    // each level's fingerprint is a refinement: distinct counts
    // non-increasing, duplicate mass non-decreasing up the ladder
    rows.map(_.getLong(2)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a)
    }
    rows.map(_.getLong(4)).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a)
    }
    // planted case-variants are invisible at L0 but merged by L1
    assert(rows(1).getLong(4) > rows(0).getLong(4))
  }

  test("q362 k-anonymity ladder: generalizing merges groups, grows k_min, shrinks sub-k mass") {
    val rows = SparkEntry.queries("q362_kanon_ladder")(spark, sf)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("G0", "G1", "G2"))
    rows.map(_.getLong(1)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a) // group count non-increasing
    }
    rows.map(_.getLong(2)).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a) // k_min non-decreasing
    }
    rows.map(_.getLong(3)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a) // sub-5 record mass non-increasing
    }
  }

  test("q364 span corruption: mask rate near the configured 15%, spans cohere") {
    val rows =
      SparkEntry.queries("q364_span_corruption")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTok = rows.map(_.getLong(1)).sum
    val nMask = rows.map(_.getLong(2)).sum
    // corpus-level rate: a uniform hash at threshold 150/1000 must land
    // near 15% (wide tolerance — per-source cells are small at sf0.001)
    val ratePpm = nMask * 1000000L / nTok
    assert(ratePpm > 100000L && ratePpm < 200000L, s"rate $ratePpm ppm")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2)) // spans <= masked tokens
      if (r.getLong(4) > 0) assert(r.getLong(5) >= 1000L) // mean span >= 1
    }
  }

  test("q365 pair evidence: at most 3 rows per pair, shared tokens have df >= 2") {
    val rows = SparkEntry.queries("q365_pair_evidence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case ((a, b), g) =>
        assert(a < b)
        assert(g.length <= 3)
        assert(g.map(_.getLong(2)).sorted.toSeq == (1L to g.length).toSeq)
    }
    // a SHARED token is in both docs by construction, so its global
    // document frequency is at least 2
    rows.foreach(r => assert(r.getLong(4) >= 2L))
  }

  test("q366 BPE compression: merges only ever shrink the symbol stream") {
    val rows =
      SparkEntry.queries("q366_bpe_compression")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // n_symbols <= n_chars
      assert(r.getLong(4) <= 1000000L)
      assert(r.getLong(3) >= r.getLong(1)) // a word is >= 1 symbol
    }
    // 8 learned merges must actually fire somewhere in the corpus
    assert(rows.map(_.getLong(3)).sum < rows.map(_.getLong(2)).sum)
  }

  test("q367 ordering audit: sample-first survivors = dedup-first + divergent, exactly") {
    val rows =
      SparkEntry.queries("q367_sample_dedup_order")(spark, sf).collect()
    assert(rows.nonEmpty)
    // a group A keeps is also kept by B (same doc, same source), so
    // per source: n_sample_first = n_dedup_first + n_divergent, and
    // dedup-first can never keep MORE than sample-first
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3),
        s"${r.getString(0)}: ${r.getLong(2)} != ${r.getLong(1)} + ${r.getLong(3)}")
    }
    // the planted duplicate groups + 80% gate must produce SOME
    // divergence corpus-wide (P[copy unsampled, donor sampled] = 16%)
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("q368 dedup sweep: tightening the cutoff never removes more") {
    val rows = SparkEntry.queries("q368_dedup_threshold_sweep")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    Seq(1, 2, 3).foreach { c =>
      rows.map(_.getLong(c)).sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"column $c rose with tau: $a -> $b")
      }
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1))) // docs <= pairs
  }

  test("q363 LSH advisor: J50 rises with rows-per-band, candidate volume falls") {
    val rows = SparkEntry.queries("q363_lsh_advisor")(spark, sf)
      .collect().sortBy(_.getLong(1)) // by n_rows: 1, 2, 4, 8
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)))
    // theory column: the S-curve midpoint is strictly increasing in r
    rows.map(_.getLong(5)).sliding(2).foreach { case Array(a, b) =>
      assert(b > a)
    }
    // measured column: stricter bands can only drop bucket collisions
    rows.map(_.getLong(4)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"candidate volume rose with stricter bands: $a -> $b")
    }
  }
}
