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

  test("q371 depth ladder: counts are monotone in width and every regime is planted") {
    val rows =
      SparkEntry.queries("q371_dup_depth_ladder")(spark, sf).collect()
    assert(rows.nonEmpty)
    var (d8, d16, d32) = (0L, 0L, 0L)
    rows.foreach { r =>
      val Seq(docs8, starts8, docs16, starts16, docs32, starts32) =
        (2 to 7).map(r.getLong)
      // THEOREM (construction, not data): a width-2w duplicated start
      // is also a width-w duplicated start, so both docs and starts
      // are non-increasing in width
      assert(docs8 >= docs16 && docs16 >= docs32,
        s"${r.getString(0)}: doc counts not monotone")
      assert(starts8 >= starts16 && starts16 >= starts32,
        s"${r.getString(0)}: start counts not monotone")
      d8 += docs8; d16 += docs16; d32 += docs32
    }
    // planted regimes: the 12-token tail feeds width 8 only; the
    // 35-token tail reaches width 32 — all three levels must be live
    assert(d8 > d16 && d16 >= d32 && d32 > 0L,
      s"ladder regimes not all planted: $d8/$d16/$d32")
  }

  test("q373 trim actuation: conservation, canonical survival, profile containment") {
    val trim =
      SparkEntry.queries("q373_substr_trim")(spark, sf).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
    assert(trim.keySet == exact.keySet,
      "trim and profile must cover the same documents")
    val tail = "the quick brown fox jumps over the lazy dog again and again"
    val plantedIds = trim.keySet.filter(_ % 7 == 3)
    val canonicalDoc = plantedIds.min // min gid = smallest planted doc_id
    trim.foreach { case (id, (nt, rm, kept)) =>
      val (ent, end, _, _) = exact(id)
      assert(nt == ent, s"doc $id: token counts disagree with q369")
      // CONSERVATION: tokens removed == covered positions minus the
      // canonically-covered ones, so removed <= q369's covered count,
      // and the kept text carries exactly n_tokens - n_removed tokens
      assert(rm <= end,
        s"doc $id: removed $rm exceeds q369's covered positions $end")
      val keptCount =
        if (kept.isEmpty) 0L else kept.split(" ").length.toLong
      assert(keptCount == nt - rm,
        s"doc $id: kept_text carries $keptCount tokens, expected ${nt - rm}")
      // docs the profile clears must come through untouched
      if (end == 0L) assert(rm == 0L, s"unduplicated doc $id was trimmed")
      // CANONICAL SURVIVAL: the planted tail's rank classes are
      // canonical in the min-gid planted doc — its trimmed text still
      // ends with the tail, intact and contiguous; every other planted
      // doc loses it (their tail positions are covered only by
      // non-canonical duplicated starts)
      if (id == canonicalDoc)
        assert(kept.endsWith(tail),
          s"canonical doc $id must keep the planted tail")
      else if (plantedIds.contains(id))
        assert(!kept.endsWith(tail),
          s"non-canonical planted doc $id must lose the planted tail")
    }
  }

  test("q374 incremental trim: reference absent, conservation, planted spans removed") {
    val rows =
      SparkEntry.queries("q374_incr_trim")(spark, sf).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
    assert(rows.nonEmpty)
    // only NEW-side docs are emitted, and all of them
    assert(rows.keySet.forall(_ % 5 != 0), "reference docs in output")
    assert(rows.keySet == exact.keySet.filter(_ % 5 != 0),
      "output must cover exactly the new-side documents")
    val tail = "the quick brown fox jumps over the lazy dog again and again"
    rows.foreach { case (id, (nt, rm, kept)) =>
      // conservation: kept text carries exactly n_tokens - n_removed
      val keptCount =
        if (kept.isEmpty) 0L else kept.split(" ").length.toLong
      assert(keptCount == nt - rm,
        s"doc $id: kept_text carries $keptCount tokens, expected ${nt - rm}")
      assert(rm <= nt)
      if (id % 7 == 3) {
        // the planted tail exists on the reference side too (CRT:
        // id % 35 == 10 is planted AND reference), so every planted
        // NEW doc must lose all 12 tail positions
        assert(rm >= 12L, s"planted new doc $id kept reference spans")
        assert(!kept.endsWith(tail),
          s"planted new doc $id must lose the reference tail")
      }
    }
    // unlike q373 there is NO canonical survivor on the new side: the
    // min-gid planted NEW doc also loses the tail (asserted above via
    // the unconditional planted check) — pin it explicitly
    val plantedNew = rows.keySet.filter(_ % 7 == 3)
    assert(plantedNew.nonEmpty)
    assert(!rows(plantedNew.min)._3.endsWith(tail),
      "no canonical exception on the new side")
  }

  test("q372 exact decontamination: the planted family crosses the bench split") {
    val rows =
      SparkEntry.queries("q372_exact_decontam")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (corpus, bench, contam, starts) = rows.foldLeft((0L, 0L, 0L, 0L)) {
      case ((c, b, k, st), r) =>
        (c + r.getLong(1), b + r.getLong(2), k + r.getLong(3),
          st + r.getLong(5))
    }
    assert(corpus > 0 && bench > 0, "bench split empty")
    assert(contam > 0 && starts >= contam,
      s"planted contamination not detected: docs=$contam starts=$starts")
    // the q77 tail is shared by ~1/7 of docs and the bench side holds
    // ~1/31 of them (CRT guarantees both residues are populated), so
    // every NON-bench planted doc must be contaminated: corpus docs
    // with doc_id % 7 == 3 are a lower bound on contaminated docs
    val expected = (0L until 500L)
      .count(id => id % 7 == 3 && id % 31 != 7).toLong
    assert(contam >= expected,
      s"contaminated $contam < planted lower bound $expected")
  }
}
