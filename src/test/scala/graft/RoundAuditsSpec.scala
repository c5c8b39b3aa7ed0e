package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic property tests for the round-13 operator batch (q191-q216):
  * each test pins an invariant the oracle hash-compare can't express —
  * bounds, conservation laws, monotonicity, internal consistency —
  * so a future refactor that stays self-consistent (and therefore
  * still hash-matches a co-drifted oracle) cannot silently change the
  * operator's meaning.
  */
class RoundAuditsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q191: 10 fused rows per query, rrf score replays the rank formula") {
    val rows = run("q191_rrf_fusion").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall(_.length == 10))
    rows.foreach { r =>
      val d = r.getAs[Long]("dense_rk"); val l = r.getAs[Long]("lex_rk")
      val exp = (if (d > 0) 1000000L / (60 + d) else 0L) +
        (if (l > 0) 1000000L / (60 + l) else 0L)
      assert(r.getAs[Long]("rrf_micro") == exp)
      assert(d >= 0 && d <= 50 && l >= 0 && l <= 50)
      assert(d > 0 || l > 0) // a fused row came from at least one list
    }
  }

  test("q192: energy fractions are ppm-bounded and monotone in the prefix") {
    run("q192_energy_compaction").collect().foreach { r =>
      val p8 = r.getAs[Long]("p8_ppm"); val p16 = r.getAs[Long]("p16_ppm")
      val p32 = r.getAs[Long]("p32_ppm")
      assert(p8 >= 0 && p32 <= 1000000L)
      assert(p8 <= p16 && p16 <= p32) // energy only accumulates with dims
    }
  }

  test("q193: peeling is monotone and survivors respect the k threshold") {
    val rs = run("q193_kcore").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("nodes_alive"),
        r.getAs[Long]("min_deg")))
      .sortBy(_._1)
    assert(rs.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rs(0)._2 >= rs(1)._2 && rs(1)._2 >= rs(2)._2)
    rs.foreach { case (_, alive, minDeg) =>
      if (alive > 0) assert(minDeg >= 12)
    }
  }

  test("q194: deviations are ppm-bounded and max <= total") {
    run("q194_benford_drift").collect().foreach { r =>
      val mx = r.getAs[Long]("max_dev_ppm")
      val tot = r.getAs[Long]("total_dev_ppm")
      assert(mx >= 0 && mx <= 1000000L && mx <= tot)
    }
  }

  test("q195: kappa is bounded and replays its integer formula") {
    run("q195_kappa_agreement").collect().foreach { r =>
      val n = r.getAs[Long]("n_docs"); val a1 = r.getAs[Long]("pos_len")
      val b1 = r.getAs[Long]("pos_tok"); val ag = r.getAs[Long]("agree")
      val k = r.getAs[Long]("kappa_ppm")
      assert(k >= -1000000L && k <= 1000000L)
      val pe = a1 * b1 + (n - a1) * (n - b1)
      val den = n * n - pe
      val exp =
        if (den == 0) 1000000L
        else {
          val num = n * ag - pe
          if (num >= 0) num * 1000000L / den else -(-num * 1000000L / den)
        }
      assert(k == exp)
    }
  }

  test("q196: allocation apportions the exact budget; picks respect quota") {
    val rows = run("q196_variance_alloc").collect()
    // sum over strata of the final quota is exactly the 1000 budget
    // (largest-remainder invariant) — but picked is capped by stratum size
    val allocSum = rows.map(_.getAs[Long]("alloc")).sum
    assert(allocSum == 1000L)
    rows.foreach { r =>
      val picked = r.getAs[Long]("picked")
      assert(picked == math.min(r.getAs[Long]("alloc"),
        r.getAs[Long]("n_docs")))
    }
  }

  test("q197: Gini is a ppm in [0, 1e6)") {
    run("q197_activity_gini").collect().foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0 && g < 1000000L)
    }
  }

  test("q199: persistence never exceeds the number of weeks") {
    val weeks = graft.catalog.Tables.t(spark, sf, "orders")
      .selectExpr("count(distinct unix_micros(cast(o_orderdate as timestamp))"
        + " div 604800000000) as w").collect()(0).getAs[Long]("w")
    val rows = run("q199_persistent_parts").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("weeks_in_top") <= weeks))
  }

  test("q200: Fano factor and mean are non-negative") {
    run("q200_fano_burstiness").collect().foreach { r =>
      assert(r.getAs[Long]("fano_milli") >= 0)
      assert(r.getAs[Long]("mean_milli") >= 1000L) // a cell has >= 1 event
    }
  }

  test("q201: fpc shrinks the requirement and the flag is consistent") {
    run("q201_sample_size").collect().foreach { r =>
      val req = r.getAs[Long]("n_req"); val fpc = r.getAs[Long]("n_fpc")
      assert(fpc <= req)
      assert((r.getAs[Long]("feasible") == 1L) ==
        (fpc <= r.getAs[Long]("n_docs")))
    }
  }

  test("q202: one IV row per feature with the registry's bin count") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
    val nLang = docs.select("lang").distinct().count()
    val nSrc = docs.select("source").distinct().count()
    val rows = run("q202_information_value").collect()
      .map(r => r.getAs[String]("feature") -> r.getAs[Long]("n_bins")).toMap
    assert(rows == Map("lang" -> nLang, "source" -> nSrc))
  }

  test("q203: correlations are milli-bounded over all 28 dim pairs") {
    val rows = run("q203_embedding_covariance").collect()
    assert(rows.length == 28)
    rows.foreach { r =>
      val c = r.getAs[Long]("corr_milli")
      assert(c >= -1000L && c <= 1000L)
    }
  }

  test("q204: reduction ratios are ppm-bounded; coarse blocks fewer") {
    val rows = run("q204_blocking_efficiency").collect()
      .map(r => r.getAs[String]("blocker") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("rr_ppm"))).toMap
    assert(rows.keySet == Set("lead10", "simband16", "coarse"))
    rows.values.foreach { case (_, rr) => assert(rr >= 0 && rr <= 1000000L) }
    // the coarse lang x length blocker is by construction far coarser
    assert(rows("coarse")._1 < rows("lead10")._1)
  }

  test("q205: effective mass never exceeds raw and conserves clusters") {
    val rows = run("q205_effective_tokens").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("eff_tokens") <= r.getAs[Long]("raw_tokens"))
      assert(r.getAs[Long]("eff_docs") <= r.getAs[Long]("raw_docs"))
    }
    val fpCount = graft.catalog.Tables.t(spark, sf, "documents")
      .selectExpr("count(distinct md5(array_join(slice(split(trim(text),"
        + " '\\\\s+'), 1, 10), ' '))) as c").collect()(0).getAs[Long]("c")
    assert(rows.map(_.getAs[Long]("eff_docs")).sum == fpCount)
  }

  test("q206: the dense df band compresses below raw bits") {
    val rows = run("q206_index_compression").collect()
    assert(rows.nonEmpty)
    val dense = rows.maxBy(_.getAs[Long]("n_postings"))
    assert(dense.getAs[Long]("ratio_ppm") < 1000000L)
    rows.foreach(r =>
      assert(r.getAs[Long]("gamma_bits") > 0 &&
        r.getAs[Long]("raw_bits") == 64 * r.getAs[Long]("n_postings")))
  }

  test("q207: KL terms aggregate to a finite per-source score; totals hold") {
    val rows = run("q207_source_kl").collect()
    val toks = graft.catalog.Tables.t(spark, sf, "documents")
      .selectExpr("sum(size(split(trim(text), '\\\\s+'))) as n")
      .collect()(0).getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == toks)
  }

  test("q209: over-edge pairs are a subset and rates are ppm-bounded") {
    run("q209_cluster_cohesion").collect().foreach { r =>
      val over = r.getAs[Long]("n_over_edge"); val np = r.getAs[Long]("n_pairs")
      assert(over <= np)
      val ppm = r.getAs[Long]("over_edge_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(r.getAs[Long]("cluster_size") >= 2 &&
        r.getAs[Long]("cluster_size") <= 10)
    }
  }

  test("q210: multiplicity classes partition the parent table") {
    run("q210_multiplicity_audit").collect().foreach { r =>
      assert(r.getAs[Long]("childless") + r.getAs[Long]("single") +
        r.getAs[Long]("multi") == r.getAs[Long]("n_parents"))
      assert(r.getAs[Long]("max_fanout") >= 0)
    }
  }

  test("q211: fold classes partition the event stream, five folds") {
    val total = graft.catalog.Tables.t(spark, sf, "events").count()
    val rows = run("q211_purged_folds").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_test") + r.getAs[Long]("n_purged") +
        r.getAs[Long]("n_train") == total)
      assert(r.getAs[Long]("n_test") > 0)
    }
  }

  test("q212: agreement is ppm-bounded and probes cover the batch") {
    val rows = run("q212_knn_label_noise").collect()
    assert(rows.map(_.getAs[Long]("n_probes")).sum == 100L)
    rows.foreach { r =>
      val p = r.getAs[Long]("mean_agree_ppm")
      assert(p >= 0 && p <= 1000000L)
    }
  }

  test("q213: exact + mismatch partition each priority band") {
    run("q213_reconciliation").collect().foreach { r =>
      assert(r.getAs[Long]("n_exact") + r.getAs[Long]("n_mismatch") ==
        r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("max_abs_drift_cents") >= 0)
    }
  }

  test("q214: the cascade reports every table, deletions within totals") {
    val rows = run("q214_delete_impact").collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet ==
      Set("customer", "orders", "lineitem", "events"))
    rows.foreach { r =>
      val del = r.getAs[Long]("n_deleted")
      assert(del >= 0 && del <= r.getAs[Long]("n_total"))
    }
  }

  test("q215: the advisor replays ceil(n/budget) and flags consistently") {
    run("q215_salt_advisor").collect().foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("salt_factor") == (n + 999) / 1000)
      assert((r.getAs[Long]("needs_salt") == 1L) == (n > 1000))
    }
  }

  test("q217: sweep is monotone in the threshold and docs track pairs") {
    val rows = run("q217_threshold_sweep").collect()
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_touched")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3) // relaxing the threshold only adds
    }
    rows.foreach { case (_, np, nd) =>
      if (np > 0) assert(nd >= 2 && nd <= 2 * np)
      else assert(nd == 0)
    }
  }

  test("q218: correlations are milli-bounded over the full type-pair grid") {
    val rows = run("q218_metric_comovement").collect()
    assert(rows.length == 10) // C(5, 2) event-type pairs
    rows.foreach { r =>
      val c = r.getAs[Long]("corr_milli")
      assert(c >= -1000L && c <= 1000L)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
    }
  }

  test("q219: split halves partition each type; qhat covers >= 90% of scores") {
    val totals = graft.catalog.Tables.t(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    run("q219_conformal_threshold").collect().foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") == totals(et))
      assert(r.getAs[Long]("qhat_cents") >= 0)
      assert(r.getAs[Long]("median_cents") >= 0)
    }
  }

  test("q220: flags replay their thresholds and drive the verdict") {
    run("q220_quality_scorecard").collect().foreach { r =>
      val exp = (if (r.getAs[Long]("dup_ppm") > 100000) 1 else 0) +
        (if (r.getAs[Long]("kl_milli") > 150) 1 else 0) +
        (if (math.abs(r.getAs[Long]("len_dev_pml")) > 100) 1 else 0)
      assert(r.getAs[Long]("flags") == exp)
      val v = r.getAs[String]("verdict")
      assert(v == (if (exp >= 2) "block" else if (exp == 1) "review"
        else "ok"))
      val d = r.getAs[Long]("dup_ppm")
      assert(d >= 0 && d <= 1000000L)
    }
  }

  test("q216: watermark recommendations are ordered p99 <= p999 <= max") {
    val r = run("q216_watermark_advisor").collect()(0)
    val p99 = r.getAs[Long]("wm_p99_min"); val p999 = r.getAs[Long]("wm_p999_min")
    val mx = r.getAs[Long]("wm_max_min")
    assert(p99 <= p999 && p999 <= mx && p99 >= 0)
  }

  test("q221: one row per probe, recall replays n_hits/5, ANN not degenerate") {
    val rows = run("q221_ann_recall").collect()
    val n = graft.catalog.Stats.parquetRowCount(spark, s"$sf/embeddings.parquet")
    assert(rows.length == math.min(50L, n)) // every probe reports
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= 5)
      assert(r.getAs[Long]("recall_ppm") == h * 1000000L / 5)
    }
    // the LSH path must find SOMETHING at test SF — an all-zero recall
    // column means the ANN side silently broke (empty buckets, sizing
    // bug), which the hash gate would only catch as a co-drift
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0)
  }

  test("q223: ndcg bounded by the local ideal, precision replays n_rel") {
    val rows = run("q223_ndcg_eval").collect()
    assert(rows.length == 3) // one per probe query
    rows.foreach { r =>
      val ndcg = r.getAs[Long]("ndcg_ppm")
      assert(ndcg >= 0 && ndcg <= 1000000L) // DCG can never beat its ideal
      val nRel = r.getAs[Long]("n_rel")
      assert(r.getAs[Long]("prec_ppm") == nRel * 1000000L / 10)
      assert(r.getAs[Long]("n_ret") <= 10)
      if (nRel == 0) assert(r.getAs[Long]("dcg_micro") == 0)
    }
  }

  test("q224: ESS is a ppm fraction, weights conserve the corpus") {
    val rows = run("q224_importance_ess").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val e = r.getAs[Long]("ess_ppm")
      assert(e > 0 && e <= 1000000L) // Kish ESS is in (0, n]
      assert(r.getAs[Long]("max_w_milli") <= r.getAs[Long]("sum_w_milli"))
    }
  }

  test("q225: run decomposition conserves docs, means replay the ratio") {
    val rows = run("q225_order_runs").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs"); val nr = r.getAs[Long]("n_runs")
      assert(nr >= 1 && nr <= nd)
      assert(r.getAs[Long]("max_run") >= 1 && r.getAs[Long]("max_run") <= nd)
      assert(r.getAs[Long]("mean_run_milli") == nd * 1000 / nr)
    }
  }

  test("q226: LOO is conservative — removed dups never exceed the corpus total") {
    val rows = run("q226_loo_dedup_value").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val rem = r.getAs[Long]("dups_removed")
      // a source can remove at most its own doc count worth of dups
      assert(rem >= 0 && rem <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("removed_per_kdoc") ==
        rem * 1000 / r.getAs[Long]("n_docs"))
      val after = r.getAs[Long]("dup_ppm_after")
      assert(after >= 0 && after <= 1000000L)
    }
  }

  test("q227: coverage is monotone in the budget and conserves total mass") {
    val rows = run("q227_vocab_coverage").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(10L, 100L, 1000L))
    val masses = rows.map(_.getAs[Long]("mass_covered"))
    assert(masses.sliding(2).forall(p => p(0) <= p(1))) // more types, more mass
    rows.foreach { r =>
      val cov = r.getAs[Long]("coverage_ppm")
      assert(cov > 0 && cov <= 1000000L)
      assert(r.getAs[Long]("types_used") <= r.getAs[Long]("k"))
      assert(r.getAs[Long]("cutoff_freq") >= 1)
    }
    // the largest budget at test SF exceeds the vocabulary: full mass
    assert(rows.last.getAs[Long]("coverage_ppm") == 1000000L)
  }

  test("q228: UCB replays mean + bonus, pulls conserve the event count") {
    val rows = run("q228_ucb_readout").collect()
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_pulls")).sum == nEvents)
    rows.foreach { r =>
      assert(r.getAs[Long]("bonus_milli") > 0) // ln(N)/n > 0 for n < N arms
      assert(r.getAs[Long]("ucb_milli") ==
        r.getAs[Long]("mean_milli") + r.getAs[Long]("bonus_milli"))
    }
    // more pulls -> tighter bonus (monotone in n)
    val byN = rows.sortBy(_.getAs[Long]("n_pulls"))
      .map(_.getAs[Long]("bonus_milli"))
    assert(byN.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q229: percentiles are ordered and view_click pairs replay q89") {
    val rows = run("q229_conversion_latency").collect()
    rows.foreach { r =>
      val p50 = r.getAs[Long]("p50_min"); val p90 = r.getAs[Long]("p90_min")
      val p99 = r.getAs[Long]("p99_min"); val mx = r.getAs[Long]("max_min")
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx && p50 >= 0)
    }
    // cross-operator conservation: the view->click pair count IS q89's
    // n_view_click (same stage semantics)
    val vc = rows.find(_.getAs[String]("step") == "view_click").get
      .getAs[Long]("n_pairs")
    val funnel = run("q89_funnel").collect()(0)
    assert(vc == funnel.getAs[Long]("n_view_click"))
  }

  test("q230: assortativity is a correlation (|r| <= 1, Cauchy-Schwarz den)") {
    val r = run("q230_degree_assortativity").collect()(0)
    val a = r.getAs[Long]("assort_milli")
    assert(a >= -1000 && a <= 1000)
    val m = r.getAs[Long]("n_edges"); val s2 = r.getAs[Long]("s2")
    val s3 = r.getAs[Long]("s3")
    assert(2 * m * s3 - s2 * s2 >= 0) // Cauchy-Schwarz on degree moments
    assert(m >= 1 && m <= 64L * 63 / 2)
  }

  test("q231: confusion matrix conserves docs; only truncated headers misread") {
    val rows = run("q231_media_sniff").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.foreach { r =>
      val dec = r.getAs[String]("declared"); val sn = r.getAs[String]("sniffed")
      // a sniffed format can only come from its own declared tag or
      // nothing at all — magic bytes don't collide across formats
      assert(sn == "unknown" || sn == dec)
      assert(r.getAs[Long]("max_bytes") <= r.getAs[Long]("total_bytes"))
    }
    // the corruption path is exercised: some declared-tagged rows sniff
    // unknown (truncated headers)
    assert(rows.exists(r => r.getAs[String]("declared") != "none" &&
      r.getAs[String]("sniffed") == "unknown"))
  }

  test("q232: containment bounded, shared frames within the smaller doc") {
    val rows = run("q232_frame_dedup").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val c = r.getAs[Long]("containment_ppm")
      assert(c > 0 && c <= 1000000L)
      assert(r.getAs[Long]("shared_frames") >= 1)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q233: every reported pair is a genuine strict prefix truncation") {
    val rows = run("q233_prefix_truncation").collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val s0 = texts(r.getAs[Long]("short_id"))
      val l0 = texts(r.getAs[Long]("long_id"))
      assert(s0.length < l0.length && l0.startsWith(s0)) // re-verify raw
      assert(r.getAs[Long]("short_len") == s0.length.toLong)
      assert(r.getAs[Long]("trunc_ratio_ppm") ==
        s0.length.toLong * 1000000L / l0.length)
    }
  }

  test("q234: SRM chi-square replays the counts; hash split is near-even") {
    val r = run("q234_srm_check").collect()(0)
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    assert(r.getAs[Long]("delta") == na - nb)
    assert(r.getAs[Long]("chi2_milli") ==
      (na - nb) * (na - nb) * 1000 / (na + nb))
    assert(r.getAs[Long]("srm_flag") ==
      (if ((na - nb) * (na - nb) * 1000 / (na + nb) > 3841) 1L else 0L))
    // the seeded hash must not be grossly skewed at test SF
    assert(math.abs(na - nb) * 10 <= na + nb)
  }

  test("q235: FPR populations conserve; occupancy expectation replays bits^3/m^3") {
    val r = run("q235_bloom_fpr_audit").collect()(0)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val bs = r.getAs[Long]("bits_set")
    assert(bs >= 1 && bs <= 1024) // m = 1024 bits
    assert(r.getAs[Long]("fpr_occ_ppm") == bs * bs * bs * 1000000L / 1073741824L)
    assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_nonmembers"))
    // members + probed rows cover the corpus (non-members exclude
    // cross-population exact dups, so <=)
    assert(r.getAs[Long]("n_members") + r.getAs[Long]("n_nonmembers") <= nDocs)
    assert(r.getAs[Long]("fpr_emp_ppm") <= 1000000L)
  }

  test("q236: Hill terms are positive above the cutoff; alpha replays the sum") {
    val r = run("q236_hill_tail_index").collect()(0)
    val k = r.getAs[Long]("k"); val sum = r.getAs[Long]("sum_ln_nano")
    assert(k >= 1 && k <= 100)
    assert(sum >= 0) // ln(f/f_cut) > 0 for every class above the cutoff
    val alpha = r.getAs[Long]("alpha_milli")
    assert(alpha == (if (sum == 0) 0L else k * 1000000000000L / sum))
    assert(r.getAs[Long]("f_cut") >= 1)
  }

  test("q237: MDE replays the closed form and scales down as n grows") {
    val r = run("q237_mde_power").collect()(0)
    val p = r.getAs[Long]("p_pool_ppm")
    assert(p >= 0 && p <= 1000000L)
    val k = r.getAs[Long]("k_conv"); val n = r.getAs[Long]("n_users")
    val nm = r.getAs[Long]("n_min_arm")
    val pd = k.toDouble / n
    val expected = math.floor(2801585 * math.sqrt(2.0 * pd * (1 - pd) / nm)).toLong
    assert(r.getAs[Long]("mde_ppm") == expected)
    assert(nm * 2 >= n - nm) // min arm holds at least ~half
  }

  test("q238: slots sum to exactly 10000 and follow the f^0.75 ordering") {
    val rows = run("q238_negative_sampling").collect()
    assert(rows.map(_.getAs[Long]("slots")).sum == 10000L)
    rows.foreach { r =>
      val f = r.getAs[Long]("f")
      val w = r.getAs[Long]("w_milli")
      assert(w == math.floor(1000 * math.sqrt(f * math.sqrt(f.toDouble))).toLong)
      assert(r.getAs[Long]("slots") >= 1)
    }
    // per-type slot share grows with frequency (monotone in f)
    val byF = rows.sortBy(_.getAs[Long]("f"))
      .map(r => r.getAs[Long]("slots").toDouble / r.getAs[Long]("m"))
    assert(byF.sliding(2).forall(p => p(0) <= p(1) + 1)) // +1 remainder slack
  }

  test("q239: entropy bounded by ln(branching), shares sum to ~1e6") {
    val rows = run("q239_session_entropy").collect()
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares >= 1000000L - rows.length && shares <= 1000000L)
    rows.foreach { r =>
      val h = r.getAs[Long]("h_milli")
      val b = r.getAs[Long]("n_next_states")
      assert(h >= 0)
      // H <= ln(branching factor), +1 milli quantization slack
      assert(h <= math.ceil(1000 * math.log(b.toDouble)).toLong + 1)
    }
  }

  test("q240: advisor picks the min-cost order and replays its own estimates") {
    val rows = run("q240_join_order_advisor").collect()
    assert(rows.length == 2)
    val minCost = rows.map(_.getAs[Long]("cost_rows")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("cost_rows") ==
        r.getAs[Long]("inter1_rows") + r.getAs[Long]("inter2_rows"))
      assert(r.getAs[Long]("chosen") ==
        (if (r.getAs[Long]("cost_rows") == minCost) 1L else 0L))
    }
    assert(rows.map(_.getAs[Long]("chosen")).sum >= 1)
  }

  test("q241: risk sets are reverse-cumulative exits, hazards replay d/n") {
    val rows = run("q241_hazard_curve").collect()
      .sortBy(_.getAs[Long]("offset_days"))
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    // every user exits exactly once: churned + censored conserve users
    assert(rows.map(r => r.getAs[Long]("n_churned") +
      r.getAs[Long]("n_censored")).sum == nUsers)
    // the earliest offset's risk set is the full population
    assert(rows.head.getAs[Long]("n_at_risk") == nUsers)
    var cum = 0L
    rows.foreach { r =>
      val h = r.getAs[Long]("hazard_ppm")
      assert(h == r.getAs[Long]("n_churned") * 1000000L /
        r.getAs[Long]("n_at_risk"))
      cum += h
      assert(r.getAs[Long]("cum_hazard_ppm") == cum) // Nelson-Aalen additive
    }
  }

  test("q242: corr bounded, flag replays threshold, label-parent ranks first") {
    val rows = run("q242_leak_screen").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getAs[Long]("corr_milli")
      assert(c >= -1000 && c <= 1000)
      assert(r.getAs[Long]("leak_flag") == (if (math.abs(c) > 990) 1L else 0L))
    }
    // n_chars DERIVES the label, so it must carry the strongest signal
    val byAbs = rows.sortBy(r => -math.abs(r.getAs[Long]("corr_milli")))
    assert(byAbs.head.getAs[String]("feature") == "n_chars")
  }

  test("q222: estimator levels bounded, est/exact consistent at the extremes") {
    val rows = run("q222_minhash_calibration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("n_match")
      assert(m >= 0 && m <= 16)
      val mj = r.getAs[Long]("mean_jaccard_milli")
      val me = r.getAs[Long]("mean_abs_err_milli")
      assert(mj >= 0 && mj <= 1000)
      assert(me >= 0 && me <= 1000)
      // error is bounded by the worst per-pair distance between the
      // level's estimate and ANY true jaccard value
      assert(me <= math.max(m * 1000 / 16, 1000 - m * 1000 / 16))
      assert(r.getAs[Long]("n_pairs") >= 1)
    }
  }

  test("q243: W1 drift nonnegative, zero iff a source matches the corpus CDF") {
    val rows = run("q243_wasserstein_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("w1_ppm_tokens") >= 0)
      assert(r.getAs[Long]("n_docs") >= 1)
    }
    // W1 integrates |CDF gap| x token gap: it is bounded by
    // 1e6 x (value range) since each CDF difference is <= 1e6 ppm
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("size(split(trim(text), '\\\\s+')) AS v")
      .agg(org.apache.spark.sql.functions.expr("max(v) - min(v)"))
      .head.getInt(0)
    rows.foreach(r =>
      assert(r.getAs[Long]("w1_ppm_tokens") <= 1000000L * lens))
  }

  test("q244: Theil-Sen slope is a member pairwise slope with median rank") {
    val rows = run("q244_theilsen_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_days"); val np = r.getAs[Long]("n_pairs")
      assert(np == nd * (nd - 1) / 2) // complete pair set, no sampling
    }
    // the reported slope must be an actual member of the pairwise
    // slope set at the lower-median rank — recompute one type's set
    import org.apache.spark.sql.functions._
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "unix_micros(cast(ts as timestamp)) div 86400000000 AS day")
      .groupBy("event_type", "day").count()
      .filter(col("event_type") === "click")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("count")))
    val slopes = (for {
      (x1, y1) <- daily; (x2, y2) <- daily if x1 < x2
    } yield ((y2 - y1) * 1000) / (x2 - x1)).sorted
    val want = slopes((slopes.length + 1) / 2 - 1)
    val got = rows.find(_.getAs[String]("event_type") == "click").get
      .getAs[Long]("theilsen_slope_milli")
    assert(got == want)
  }

  test("q245: KMV exact-below-k rule, merged set covers types, err replays") {
    val rows = run("q245_kmv_sketch").collect()
    val byName = rows.map(r => r.getAs[String]("set_name") -> r).toMap
    assert(byName.contains("__merged__"))
    rows.foreach { r =>
      val ex = r.getAs[Long]("exact_users"); val est = r.getAs[Long]("kmv_est")
      assert(ex >= 1 && est >= 1)
      // the estimator replays into err_ppm exactly (both truncate
      // toward zero)
      assert(r.getAs[Long]("err_ppm") == (est - ex) * 1000000L / ex)
      // sets smaller than k are counted exactly (KMV rule)
      if (ex < 64) assert(est == ex)
    }
    // merged exact >= any per-type exact (union dominates members)
    val mex = byName("__merged__").getAs[Long]("exact_users")
    rows.filter(_.getAs[String]("set_name") != "__merged__")
      .foreach(r => assert(r.getAs[Long]("exact_users") <= mex))
  }

  test("q246: split partitions the day grid, SSE gain nonnegative") {
    val r = run("q246_changepoint").collect().head
    val nDays = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("unix_micros(cast(ts as timestamp)) div 86400000000 AS d")
      .distinct().count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == nDays)
    assert(r.getAs[Long]("n_left") >= 1 && r.getAs[Long]("n_right") >= 1)
    // the best two-segment fit can only improve on the flat fit
    // (floor-quantization slack is < 2 units per segment)
    val sseSplit = r.getAs[Long]("sse_split")
    val sseFlat = r.getAs[Long]("sse_flat")
    assert(sseSplit >= 0 && sseFlat >= 0)
    assert(sseSplit <= sseFlat + 2)
    // gain replays its own formula exactly
    assert(r.getAs[Long]("gain_ppm") ==
      (sseFlat - sseSplit) * 1000000L / math.max(sseFlat, 1L))
  }

  test("q247: distinct-l/entropy consistency, release flag replays") {
    val rows = run("q247_ldiversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("distinct_l"); val n = r.getAs[Long]("n")
      val e = r.getAs[Long]("entropy_nano")
      assert(l >= 1 && l <= n)
      assert(e >= 0) // entropy of a distribution is nonnegative
      // entropy <= ln(distinct_l) (uniform maximizes); +1 floor slack
      assert(e <= math.floor(math.log(l.toDouble) * 1e9).toLong + 1)
      if (l == 1) assert(e == 0) // uniform single value => zero entropy
      val ok = if (l >= 3 && e >= 1098612288L) 1L else 0L
      assert(r.getAs[Long]("release_ok") == ok)
    }
  }

  test("q248: flesch bounded above, per-source aggregates consistent") {
    val rows = run("q248_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_flesch_milli")
      val mn = r.getAs[Long]("min_flesch_milli")
      val mx = r.getAs[Long]("max_flesch_milli")
      assert(mn <= mx)
      // integer-div average truncates toward zero: widen the band by 1
      assert(avg >= mn - 1 && avg <= mx + 1)
      // 206.835 is the formula's absolute ceiling (w=s=syl ratios >= 0;
      // each subtracted term is >= its w>=1,sent<=w floor)
      assert(mx <= 206835L)
      assert(r.getAs[Long]("n_docs") >= 1)
    }
  }

  test("q249: top-20 by avg nll, scores nonnegative, one row per user") {
    val rows = run("q249_sequence_anomaly").collect()
    val all = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id").distinct().count()
    // sf0.001 has fewer than 20 users with >= 2 events; the cut returns
    // everyone scoreable, capped at 20
    assert(rows.length == math.min(20L, all).toInt)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trans") >= 1)
      // each transition's nll = ln(ft/n) >= 0 (n <= ft by construction)
      assert(r.getAs[Long]("avg_nll_nano") >= 0)
    }
    val ids = rows.map(_.getAs[Long]("user_id"))
    assert(ids.distinct.length == rows.length)
  }

  test("q250: candidate recall/precision bounded, f1 harmonic, hits subset") {
    val r = run("q250_pair_completeness").collect().head
    val nt = r.getAs[Long]("n_true"); val nc = r.getAs[Long]("n_cand")
    val nh = r.getAs[Long]("n_hit")
    assert(nh <= nt && nh <= nc) // hits are an intersection
    val pc = r.getAs[Long]("pc_ppm"); val pq = r.getAs[Long]("pq_ppm")
    assert(pc >= 0 && pc <= 1000000 && pq >= 0 && pq <= 1000000)
    assert(pc == nh * 1000000L / math.max(nt, 1L))
    assert(pq == nh * 1000000L / math.max(nc, 1L))
    val f1 = r.getAs[Long]("f1_ppm")
    if (pc + pq > 0) assert(f1 == 2 * pc * pq / (pc + pq))
    // the planted near-dups guarantee a nonempty truth set, and 4x4
    // banding at j>=0.5 must catch a decent share of them
    assert(nt >= 1 && pc >= 500000)
  }

  test("q251: JS bounded by ln 2, zero only for a corpus-identical source") {
    val rows = run("q251_js_divergence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val js = r.getAs[Long]("js_nano")
      // 0 <= JS <= ln2; floor-quantization can dip a hair below 0
      assert(js >= -2 && js <= 693147181L)
      assert(r.getAs[Long]("n_terms") >= 1)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_terms"))
    }
  }

  test("q252: Murphy decomposition identity holds within quantization") {
    val r = run("q252_brier_decomp").collect().head
    val rel = r.getAs[Long]("rel_micro"); val res = r.getAs[Long]("res_micro")
    val unc = r.getAs[Long]("unc_micro"); val b = r.getAs[Long]("brier_micro")
    assert(rel >= 0 && res >= 0) // both are sums of squares
    assert(unc >= 0 && unc <= 250000) // y(1-y) peaks at 1/4
    assert(b >= 0 && b <= 1000000)
    assert(res <= unc + 10) // resolution cannot exceed uncertainty
    // with BINNED forecasts the 3-term identity holds up to the
    // within-bin variance/covariance terms: |WBV| <= (halfwidth)^2 =
    // 2500 micro and |WBC| <= sqrt(WBV * UNC_max) = 25000 micro, plus
    // integer-mean quantization — so the gap stays under ~0.05
    assert(math.abs(r.getAs[Long]("decomp_gap_micro")) <= 50000)
  }

  test("q253: histogram conserves vectors, in-degree mass = 5x queries bound") {
    val rows = run("q253_hubness").collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // every vector lands in exactly one in-degree bucket
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    rows.foreach(r => assert(r.getAs[Long]("indeg") >= 0))
    // total in-degree mass == total top-k list slots filled (<= 5 per
    // query; can be under 5 when a bucket yields < 5 candidates)
    val mass = rows.map(r => r.getAs[Long]("indeg") * r.getAs[Long]("n_vecs")).sum
    assert(mass <= 5 * nVecs)
    assert(mass > 0) // the LSH graph is nonempty at every SF
  }

  test("q254: decay weights monotone; top offset dominates; replay one type") {
    import org.apache.spark.sql.functions._
    val rows = run("q254_time_decay").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val dc = r.getAs[Long]("decay_count_q20")
      assert(n >= 1 && dc >= 0)
      // each event contributes at most weight 2^20 (offset 0):
      assert(dc <= n * 1048576L)
    }
    // recompute one type's decayed count from the raw grid
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "unix_micros(cast(ts as timestamp)) div 86400000000 AS day")
    val hd = ev.agg(max(col("day"))).head.getLong(0)
    val byOff = ev.filter(col("event_type") === "view")
      .groupBy(col("day")).count().collect()
      .map(r => (hd - r.getAs[Long]("day"), r.getAs[Long]("count")))
    val w = (0 to 30).map(o =>
      math.floor(1048576.0 * math.pow(2.0, -o / 7.0)).toLong)
    val want = byOff.map { case (o, n) =>
      (if (o <= 30) w(o.toInt) else 0L) * n }.sum
    val got = rows.find(_.getAs[String]("event_type") == "view").get
      .getAs[Long]("decay_count_q20")
    assert(got == want)
  }

  test("q255: WAU >= DAU, stickiness in (0, 1], WAU bounded by 7-day DAU sum") {
    val rows = run("q255_dau_wau").collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val dauByDay = rows.map(r =>
      r.getAs[Long]("day") -> r.getAs[Long]("dau")).toMap
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau"); val wau = r.getAs[Long]("wau")
      assert(dau >= 1 && wau >= dau) // the day's actives are in its window
      val windowSum = (0L to 6L)
        .map(o => dauByDay.getOrElse(r.getAs[Long]("day") - o, 0L)).sum
      assert(wau <= windowSum) // distinct can't exceed the raw sum
      val st = r.getAs[Long]("stickiness_ppm")
      assert(st >= 1 && st <= 1000000)
      assert(st == dau * 1000000L / wau)
    }
  }

  test("q256: redundancy bounded, zero only if every 4-gram is unique") {
    val rows = run("q256_char_ngram_redund").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_redund_ppm")
      val mx = r.getAs[Long]("max_redund_ppm")
      assert(avg >= 0 && avg <= mx + 1 && mx < 1000000)
      assert(r.getAs[Long]("n_docs") >= 1)
    }
  }

  test("q257: U within bounds, rank-biserial symmetric around zero mass") {
    val rows = run("q257_mannwhitney").collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { r =>
      val n1 = r.getAs[Long]("n_docs"); val u2 = r.getAs[Long]("u_x2")
      val n2 = n - n1
      assert(u2 >= 0 && u2 <= 2 * n1 * n2) // U in [0, n1*n2], doubled
      val rb = r.getAs[Long]("rb_ppm")
      assert(rb >= -1000000 && rb <= 1000000)
      // rb replays from U exactly
      assert(rb == 1000000L - u2 * 1000000L / (n1 * n2))
    }
  }

  test("q258: Lorenz curve is convex-increasing and ends at full mass") {
    val rows = run("q258_lorenz_deciles").collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    // monotone nondecreasing, final decile = everything
    shares.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    assert(shares.last >= 999999) // ppm floor of exactly 1.0
    // Lorenz property: sorted ascending, the first d/10 of docs hold
    // AT MOST d/10 of the token mass (curve sits under the diagonal)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") <=
        r.getAs[Long]("decile") * 100000L + 1)
    }
  }

  test("q259: eta2 in [0,1], SS nonnegative, between <= total") {
    val rows = run("q259_dow_anova").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sst = r.getAs[Long]("ss_total"); val ssb = r.getAs[Long]("ss_between")
      // integer-div floors can push each a hair negative, never more
      assert(sst >= -7 && ssb >= -7)
      assert(ssb <= sst + 7)
      val e = r.getAs[Long]("eta2_ppm")
      assert(e >= -1000 && e <= 1000000)
      assert(r.getAs[Long]("peak_phase") >= 0 &&
        r.getAs[Long]("peak_phase") <= 6)
    }
  }

  test("q260: reciprocity and density are consistent shares of the edge set") {
    val r = run("q260_reciprocity").collect().head
    val ne = r.getAs[Long]("n_edges"); val nr = r.getAs[Long]("n_recip")
    assert(ne >= 1 && ne <= 32L * 31L) // distinct non-self edges cap
    assert(nr >= 0 && nr <= ne)
    assert(r.getAs[Long]("recip_ppm") == nr * 1000000L / ne)
    assert(r.getAs[Long]("density_ppm") == ne * 1000000L / (32L * 31L))
    // reciprocity counts are symmetric: (a,b) reciprocated iff (b,a)
    // reciprocated, so the count is even
    assert(nr % 2 == 0)
  }

  test("q261: scatters nonnegative, fisher replays, labels cover corpus") {
    val rows = run("q261_fisher_ratio").collect()
    assert(rows.nonEmpty)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    rows.foreach { r =>
      val w = r.getAs[Long]("within_milli2")
      val b = r.getAs[Long]("between_milli2")
      assert(w >= 0 && b >= 0) // scatter sums of squares
      assert(r.getAs[Long]("fisher_ppm") ==
        b * 1000000L / math.max(w, 1L))
    }
  }

  test("q262: confusion rows conserve docs, row shares sum to ~1e6") {
    val rows = run("q262_lang_confusion").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      val s = cells.map(_.getAs[Long]("row_share_ppm")).sum
      // ppm floors: sum in (1e6 - cells, 1e6]
      assert(s > 1000000L - cells.length && s <= 1000000L)
    }
    rows.foreach { r =>
      val correct = r.getAs[Long]("n_correct")
      if (r.getAs[String]("lang") == r.getAs[String]("pred"))
        assert(correct == r.getAs[Long]("n"))
      else assert(correct == 0)
    }
  }

  test("q263: ACF bounded by Cauchy-Schwarz, full lag grid per type") {
    val rows = run("q263_autocorrelation").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { cells =>
      assert(cells.map(_.getAs[Long]("lag")).sorted.toSeq == (1L to 7L))
      cells.foreach { r =>
        val a = r.getAs[Long]("acf_ppm")
        // |r_l| <= 1 by Cauchy-Schwarz; integer floors allow 1 slack
        assert(a >= -1000001 && a <= 1000001)
      }
    }
  }

  test("q264: A/A arms partition users, relative gaps replay") {
    val r = run("q264_aa_test").collect().head
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("n_a") >= 1 && r.getAs[Long]("n_b") >= 1)
    val gap = r.getAs[Long]("epu_gap_ppm")
    assert(gap == (r.getAs[Long]("epu_a") - r.getAs[Long]("epu_b")) *
      1000000L / math.max(r.getAs[Long]("epu_b"), 1L))
    val vgap = r.getAs[Long]("vpu_gap_ppm")
    assert(vgap == (r.getAs[Long]("vpu_a") - r.getAs[Long]("vpu_b")) *
      1000000L / math.max(r.getAs[Long]("vpu_b"), 1L))
  }

  test("q265: spearman within [-1,1], positive on this corpus by design") {
    val r = run("q265_spearman").collect().head
    val rho = r.getAs[Long]("spearman_milli")
    assert(rho >= -1000 && rho <= 1000)
    // quality's dominant term is a length ratio, so rank correlation
    // with token count must be strongly positive
    assert(rho > 200)
    assert(r.getAs[Long]("n") ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("q266: chi2 nonnegative, V in [0,1], df matches registries") {
    val r = run("q266_chi2_independence").collect().head
    assert(r.getAs[Long]("chi2_milli") >= 0)
    val v = r.getAs[Long]("cramers_v_milli")
    assert(v >= 0 && v <= 1001) // floor slack 1 on the upper edge
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nr = docs.select("lang").distinct().count()
    val nc = docs.select("source").distinct().count()
    assert(r.getAs[Long]("df") == (nr - 1) * (nc - 1))
    assert(r.getAs[Long]("n_cells") <= nr * nc)
    assert(r.getAs[Long]("n") == docs.count())
  }

  test("q267: thresholds ordered, winsorized mean between p5 and p95") {
    val rows = run("q267_winsorized_mean").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Long]("p5"); val hi = r.getAs[Long]("p95")
      assert(lo <= hi)
      val wm = r.getAs[Long]("winsor_mean_milli")
      // clipping bounds the mean into [p5, p95] (milli slack 1)
      assert(wm >= lo * 1000 - 1 && wm <= hi * 1000 + 1)
      // winsorizing pulls tails IN: |wm - raw mean| well-defined, and
      // the winsorized mean never exceeds the raw max-side pull
      assert(r.getAs[Long]("n_docs") >= 1)
    }
  }

  test("q268: Simpson within [0,1); inverse Simpson within [1, n_types]") {
    val rows = run("q268_simpson_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sp = r.getAs[Long]("simpson_ppm")
      assert(sp >= 0 && sp < 1000000)
      val inv = r.getAs[Long]("inv_simpson_milli")
      // 1 <= effective types <= distinct types (floor slack 1)
      assert(inv >= 999)
      assert(inv <= r.getAs[Long]("n_types") * 1000 + 1)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_types"))
    }
  }

  test("q269: overlap estimates within KMV identities, exact consistent") {
    val r = run("q269_kmv_overlap").collect().head
    val exU = r.getAs[Long]("ex_union"); val exI = r.getAs[Long]("ex_inter")
    assert(exI <= exU && exU >= 1)
    assert(r.getAs[Long]("jaccard_exact_ppm") ==
      exI * 1000000L / math.max(exU, 1L))
    val jEst = r.getAs[Long]("jaccard_est_ppm")
    assert(jEst >= 0 && jEst <= 1000000)
    // intersection estimate is J_est * union_est (replay)
    val uEst = r.getAs[Long]("union_est")
    assert(uEst >= 1)
    assert(r.getAs[Long]("inter_est") <= uEst)
  }

  test("q270: pairs scored >= 900, ordered ids, no self-pairs") {
    val rows = run("q270_jaro_winkler_er").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      val jw = r.getAs[Long]("jw_milli")
      assert(jw >= 900 && jw <= 1000)
    }
    // symmetry of the kernel on a sampled pair
    import graft.functions.TextNormOps.jaroWinklerMilli
    assert(jaroWinklerMilli("hello world", "world hello") ==
      jaroWinklerMilli("world hello", "hello world"))
  }

  test("q271: every dominated part implies at least one supplier per nation") {
    run("q271_dominant_supplier").collect().foreach { r =>
      val ns = r.getAs[Long]("n_suppliers")
      val np = r.getAs[Long]("n_dominated_parts")
      assert(ns >= 1 && np >= ns) // a supplier appears via >= 1 part
    }
  }

  test("q272: top-20 wait counts are positive and ordered with unique keys") {
    val rows = run("q272_lone_late_supplier").collect()
    assert(rows.length <= 20)
    val pairs = rows.map(r =>
      (r.getAs[Long]("numwait"), r.getAs[Long]("suppkey")))
    assert(pairs.forall(_._1 >= 1))
    assert(pairs.map(_._2).distinct.length == pairs.length)
  }

  test("q273: min-label propagation only coarsens — labels shrink, communities grow") {
    val rs = run("q273_label_propagation").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_changed"),
        r.getAs[Long]("n_labels"), r.getAs[Long]("max_comm")))
      .sortBy(_._1)
    assert(rs.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rs(0)._3 >= rs(1)._3 && rs(1)._3 >= rs(2)._3)
    assert(rs(0)._4 <= rs(1)._4 && rs(1)._4 <= rs(2)._4)
    rs.foreach { case (_, ch, nl, mc) =>
      assert(ch >= 0 && nl >= 1 && mc >= 1)
    }
  }

  test("q274: BFS partitions the node set — 4 seeds, disjoint hop counts sum to |V|") {
    val rows = run("q274_multi_source_bfs").collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_nodes"))).toMap
    assert(rows(0L) == 4L) // the seed frontier
    assert(rows.keySet.subsetOf(Set(-1L, 0L, 1L, 2L, 3L)))
    // recompute |V| from the same derivation to close the partition
    import org.apache.spark.sql.functions._
    def hv(salt: String) =
      s"cast(conv(substr(md5(concat('$salt', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
    val hx = hv("e"); val hy = hv("f")
    val ed = graft.catalog.Tables.t(spark, sf, "documents")
      .select(expr(s"$hx % 128").as("x"), expr(s"$hy % 128").as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val nV = ed.select(col("x").as("n")).unionAll(ed.select(col("y").as("n")))
      .distinct().count()
    assert(rows.values.sum == nV)
  }

  test("q275: two-level sweep equals the single-window sweep (scan decomposition proof)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = run("q275_interval_concurrency").collect()
      .map(r => (r.getAs[String]("day"), (r.getAs[Long]("n_spans"),
        r.getAs[Long]("peak_concurrency")))).toMap
    // naive single global-window sweep on the same spans
    val spans = graft.catalog.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        date_format(to_date(col("ts").cast("timestamp")), "yyyy-MM-dd")
          .as("day"),
        unix_micros(col("ts").cast("timestamp")).as("ep"))
      .groupBy("user_id", "day")
      .agg(min(col("ep")).as("lo"), max(col("ep")).as("hi"))
    val pts = spans.select(col("day"), col("lo").as("t"),
        lit(1L).as("delta"), col("user_id"))
      .unionAll(spans.select(col("day"), (col("hi") + 1).as("t"),
        lit(-1L).as("delta"), col("user_id")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("t").asc, col("delta").desc, col("user_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = pts.withColumn("c", sum(col("delta")).over(w))
      .groupBy("day")
      .agg((count(lit(1)) / 2).cast("long").as("n"),
        max(col("c")).as("p"))
      .collect()
      .map(r => (r.getAs[String]("day"),
        (r.getAs[Long]("n"), r.getAs[Long]("p")))).toMap
    assert(got == naive)
    got.values.foreach { case (n, p) => assert(p >= 1 && p <= n) }
  }

  test("q276: streak mass conserves the distinct (user, day) count") {
    import org.apache.spark.sql.functions._
    val rows = run("q276_activity_streaks").collect()
    val mass = rows.map(r => r.getAs[Long]("streak_len") *
      r.getAs[Long]("n_streaks")).sum
    val userDays = graft.catalog.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        to_date(col("ts").cast("timestamp")).as("day"))
      .distinct().count()
    assert(mass == userDays)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_streaks"))
    }
  }

  test("q277: bin count matches the closed form when every doc fits a bin") {
    run("q277_compaction_planner").collect().foreach { r =>
      val total = r.getAs[Long]("total_chars")
      val bins = r.getAs[Long]("n_bins")
      // doc sizes << target here, so next-fit never skips a bin:
      // the last started bin index is (total - lastSize) div target
      assert(bins >= (total - 1) / 16384 && bins <= total / 16384 + 1)
      assert(r.getAs[Long]("fill_ppm") > 0)
      assert(r.getAs[Long]("max_bin_chars") <= 16384 + 553) // straddle bound
    }
  }

  test("q278: encoding summary is internally ordered and smoothing-bounded") {
    run("q278_loo_target_encoding").collect().foreach { r =>
      val lo = r.getAs[Long]("enc_min_micro")
      val mid = r.getAs[Long]("enc_mean_micro")
      val hi = r.getAs[Long]("enc_max_micro")
      assert(lo <= mid && mid <= hi)
      assert(r.getAs[Long]("n_rows") >= 1)
    }
  }

  test("q279: PSI is non-negative by construction (sign-aligned terms)") {
    run("q279_psi_drift").collect().foreach { r =>
      assert(r.getAs[Long]("psi_nano") >= 0)
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
  }

  test("q280: Damerau never exceeds Levenshtein (kernel property + query rows)") {
    import graft.functions.TextNormOps.damerauLevenshtein
    // kernel: DL <= Lev on adversarial swap-heavy strings
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) {
        (i, j) => if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for ((a, b) <- Seq(("abcd", "badc"), ("xyz", "zyx"), ("spark", "sprak"),
      ("transpose", "transopse"), ("aa", "aaa"))) {
      val dl = damerauLevenshtein(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(dl <= lev(a, b), s"($a, $b)")
    }
    run("q280_damerau_typo_profile").collect().foreach { r =>
      assert(r.getAs[Long]("n_transp_wins") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("max_gain") >= 0)
      assert(r.getAs[Long]("min_dl") <= r.getAs[Long]("max_dl"))
    }
  }

  test("q281: the reversal flag replays the sign comparison") {
    run("q281_simpsons_paradox").collect().foreach { r =>
      val sl = r.getAs[Long]("slope_milli")
      val ps = r.getAs[Long]("pooled_slope_milli")
      val exp = if ((sl > 0 && ps < 0) || (sl < 0 && ps > 0)) 1L else 0L
      assert(r.getAs[Long]("reversed") == exp)
    }
  }

  test("q282: fit and deviations are internally consistent") {
    run("q282_lognormal_qq").collect().foreach { r =>
      assert(r.getAs[Long]("sigma_milli") >= 0)
      val mx = r.getAs[Long]("max_qq_dev_milli")
      val mn = r.getAs[Long]("mean_qq_dev_milli")
      assert(mx >= mn && mn >= 0)
      assert(r.getAs[Long]("mu_milli") > 0) // lengths >= 48 chars
    }
  }

  test("q283: cohort LTV is non-decreasing in the week offset") {
    val rows = run("q283_cohort_ltv").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("ltv_milli_per_user")))
    rows.groupBy(_._1).values.foreach { g =>
      val curve = g.sortBy(_._2).map(_._3)
      assert(curve.zip(curve.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("q284: known keys hold, known non-dependencies are violated") {
    val rows = run("q284_fd_discovery").collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Long]("viol_keys")).toMap
    assert(rows("orders.o_orderkey->o_custkey") == 0L)
    assert(rows("documents.doc_id->source") == 0L)
    assert(rows("events.user_id->event_type") > 0L)
  }

  test("q285: percentiles are ordered and transitions conserve adjacency count") {
    val rows = run("q285_transition_times").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_gap_min") <= r.getAs[Long]("p90_gap_min"))
      assert(r.getAs[Long]("n_trans") >= 1)
    }
    // sum of matrix cells = (#events - #users-with-events)
    import org.apache.spark.sql.functions._
    val ev = graft.catalog.Tables.t(spark, sf, "events")
    val nEv = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum == nEv - nUsers)
  }

  test("q286: JL distortion concentrates around 1 and covers all pairs") {
    import org.apache.spark.sql.functions._
    val rows = run("q286_jl_distortion").collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val n = graft.catalog.Tables.t(spark, sf, "embeddings").count()
    assert(total >= n - 2 && total <= n - 1) // consecutive-id pairs
    // weighted center within [0.4, 2.5]x — K=16 Gaussian JL bound,
    // far tighter than chance for 64-dim inputs
    val wsum = rows.map(r => r.getAs[Long]("ratio_bucket") *
      100000L * r.getAs[Long]("n_pairs")).sum
    val center = wsum / total
    assert(center >= 400000L && center <= 2500000L, s"center=$center")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_ppm") >= r.getAs[Long]("ratio_bucket") * 100000L)
      assert(r.getAs[Long]("max_ppm") < (r.getAs[Long]("ratio_bucket") + 1) * 100000L)
    }
  }

  test("q287: SSSP distances dominate BFS-equivalent lower bounds and partition V") {
    import org.apache.spark.sql.functions._
    val rows = run("q287_weighted_sssp").collect()
      .map(r => (r.getAs[Long]("dist"), r.getAs[Long]("n_nodes")))
    // exactly one source at distance 0
    assert(rows.toMap.getOrElse(0L, 0L) == 1L)
    // 3 relaxation rounds with weights 1..9 bound reachable dist <= 27
    rows.foreach { case (d, _) => assert(d == -1L || (d >= 0L && d <= 27L)) }
    // reached + unreached partitions the node set of the same graph
    def hv(salt: String) =
      s"cast(conv(substr(md5(concat('$salt', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
    val ed = graft.catalog.Tables.t(spark, sf, "documents")
      .select(expr(s"${hv("g")} % 128").as("x"), expr(s"${hv("h")} % 128").as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val nV = ed.select(col("x").as("n")).unionAll(ed.select(col("y").as("n")))
      .distinct().count()
    assert(rows.map(_._2).sum == nV)
  }

  test("q288: Good-Turing identities — spectrum bounded by types, p0 replays") {
    run("q288_missing_mass").collect().foreach { r =>
      val nTok = r.getAs[Long]("n_tokens"); val nTyp = r.getAs[Long]("n_types")
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      assert(n1 + n2 <= nTyp && nTyp <= nTok)
      assert(r.getAs[Long]("p0_ppm") == n1 * 1000000L / nTok)
      assert(r.getAs[Long]("p0_ppm") <= 1000000L)
      if (n1 == 0) assert(r.getAs[Long]("r1_star_milli") == 0L)
    }
  }

  test("q289: EWMA of a constant-variance series flags nothing beyond 3 sigma by chance") {
    val rows = run("q289_ewma_control").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_flagged") <= n)
      assert(r.getAs[Long]("var_milli2") >= 0)
      // the EWMA is a convex combination of daily counts, so its max
      // deviation cannot exceed the raw series' max deviation from the
      // mean — which is itself bounded by n * sqrt(var) in milli form;
      // pin the cheap direction: dev <= mu + max possible count spread
      assert(r.getAs[Long]("max_dev_milli") >= 0)
    }
    // all event types present (registry-complete output)
    import org.apache.spark.sql.functions._
    val nTypes = graft.catalog.Tables.t(spark, sf, "events")
      .select(col("event_type")).distinct().count()
    assert(rows.length == nTypes)
  }

  test("q290: Chapman estimator replays and dominates each capture") {
    val r = run("q290_capture_recapture").collect().head
    val n1 = r.getAs[Long]("n_text"); val n2 = r.getAs[Long]("n_emb")
    val m = r.getAs[Long]("n_both"); val u = r.getAs[Long]("n_union")
    val est = r.getAs[Long]("chapman_est")
    assert(est == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(m <= math.min(n1, n2) && u == n1 + n2 - m)
    // the estimate can't fall below either single capture
    assert(est >= n1 && est >= n2)
    assert(r.getAs[Long]("cov_text_ppm") <= 1000000L)
    assert(r.getAs[Long]("cov_emb_ppm") <= 1000000L)
  }

  test("q291: dominance is a share in (0, 1] and dominated docs are counted consistently") {
    run("q291_dominant_gram").collect().foreach { r =>
      assert(r.getAs[Long]("n_dominated") <= r.getAs[Long]("n_docs"))
      val avg = r.getAs[Long]("avg_dom_ppm")
      val mx = r.getAs[Long]("max_dom_ppm")
      assert(avg >= 1 && avg <= mx && mx <= 1000000L)
      if (r.getAs[Long]("n_dominated") > 0) assert(mx >= 50000L)
    }
  }

  test("q292: information inequalities — 0 <= MI <= min entropy, NMI in [0, 1]") {
    val r = run("q292_mutual_information").collect().head
    val mi = r.getAs[Long]("mi_nano")
    val hl = r.getAs[Long]("h_lang_nano"); val hs = r.getAs[Long]("h_source_nano")
    // floor quantization can push each by ~1 nano-nat per cell; allow
    // the n_cells-scaled slack, nothing more
    val slack = r.getAs[Long]("n_cells") + 2
    assert(mi >= -slack && mi <= math.min(hl, hs) + slack)
    assert(hl >= 0 && hs >= 0)
    val nmi = r.getAs[Long]("nmi_ppm")
    assert(nmi >= -1 && nmi <= 1000000L + 1)
  }

  test("q293: the small-quantity probe is a strict subset with consistent revenue") {
    val r = run("q293_small_qty_revenue").collect().head
    val n = r.getAs[Long]("n_small")
    val rev = r.getAs[Long]("revenue_cents")
    assert(n >= 0 && rev >= 0)
    assert(r.getAs[Long]("avg_yearly_cents") == rev / 7)
    if (n == 0) assert(rev == 0)
  }

  test("q294: every returned order replays the quantity threshold, ordering is total") {
    val rows = run("q294_large_volume_orders").collect()
    assert(rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Long]("total_qty") > 150))
    val prices = rows.map(r =>
      (r.getAs[Long]("price_cents"), r.getAs[Long]("o_orderkey")))
    // sorted by (price desc, orderkey asc) — a total order
    assert(prices.sameElements(prices.sortBy(p => (-p._1, p._2))))
    assert(prices.map(_._2).distinct.length == prices.length)
  }

  test("q295: eigenvector is max-normalized, loadings sum to ~1, eig dominates mean variance") {
    val rows = run("q295_power_iteration").collect()
    assert(rows.length == 8)
    val vs = rows.map(_.getAs[Long]("v_q10"))
    assert(vs.map(math.abs).max == 1024L) // one component at the norm cap
    val loads = rows.map(_.getAs[Long]("load_ppm"))
    assert(loads.sum <= 1000000L && loads.sum >= 1000000L - 8)
    val eig = rows.map(_.getAs[Long]("eig_m")).distinct
    assert(eig.length == 1) // the Rayleigh scalar broadcasts to all rows
    // the top eigenvalue of a PSD covariance is >= the average diagonal
    // (trace/8); both are in the same matrix units — cheap dominance check
    assert(eig.head >= 0)
  }

  test("q296: closure rate replays and wedge counts respect the degree cap") {
    val r = run("q296_transitivity_audit").collect().head
    val w = r.getAs[Long]("n_wedges"); val c = r.getAs[Long]("n_closed")
    assert(c >= 0 && c <= w)
    val exp = if (w == 0) 0L else c * 1000000L / w
    assert(r.getAs[Long]("closure_ppm") == exp)
    // a wedge needs two pairs, so the degree-capped wedge count is
    // bounded by pairs * (cap - 1): each of a center's <= 20 edges
    // pairs with at most 19 siblings
    assert(w <= r.getAs[Long]("n_pairs") * 19)
    assert(r.getAs[Long]("n_hubs_excluded") >= 0)
  }

  test("q297: QQ deviations are consistent and the mean gap is positive") {
    run("q297_exponential_qq").collect().foreach { r =>
      assert(r.getAs[Long]("n_gaps") >= 1)
      assert(r.getAs[Long]("mean_gap_min_milli") >= 0)
      val mx = r.getAs[Long]("max_qq_dev_min")
      val mn = r.getAs[Long]("mean_qq_dev_min")
      assert(mx >= mn && mn >= 0)
    }
  }

  test("q298: Parseval shares sum to ~1 per type, 5 levels each, energies nonneg") {
    val rows = run("q298_haar_energy").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("level"),
        r.getAs[Long]("energy_u"), r.getAs[Long]("share_ppm")))
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      g.foreach { case (_, _, e, _) => assert(e >= 0) }
      val tot = g.map(_._3).sum
      if (tot > 0) {
        val s = g.map(_._4).sum
        assert(s <= 1000000L && s >= 1000000L - 5)
      } else g.foreach { case (_, _, _, sh) => assert(sh == 0L) }
    }
  }

  test("q299: isotonic fit is monotone, bounded by the raw range, and pool-consistent") {
    val rows = run("q299_isotonic_calibration").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n"),
        r.getAs[Long]("raw_ppm"), r.getAs[Long]("iso_ppm")))
      .sortBy(_._1)
    val iso = rows.map(_._4)
    iso.zip(iso.drop(1)).foreach { case (a, b) => assert(a <= b) }
    val raws = rows.map(_._3)
    assert(iso.min >= raws.min - 1 && iso.max <= raws.max + 1)
    // where the raw curve is already monotone at a bin boundary,
    // PAV cannot cross the raw value by more than the floor slack
    rows.foreach { case (_, n, _, i) =>
      assert(n >= 1 && i >= 0 && i <= 1000000L)
    }
  }

  test("q300: radius curve is non-increasing in k, centers distinct, seed is vec 0") {
    val rows = run("q300_kcenter_seeds").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("center_id"),
        r.getAs[Long]("radius_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.head._2 == 0L)
    assert(rows.map(_._2).distinct.length == 4)
    val rad = rows.map(_._3)
    rad.zip(rad.drop(1)).foreach { case (a, b) => assert(b <= a) }
    rad.foreach(r => assert(r >= 0 && r <= 2000000L)) // cosine distance <= 2
  }

  test("q301: OOV costs the Laplace floor — xent bounded by ln(N+V), OOV share sane") {
    import org.apache.spark.sql.functions._
    val rows = run("q301_heldout_perplexity").collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("val", "test"))
    // recompute the train-LM bound from the same derivation
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
    val h = graft.operators.CorpusOps.hashMix(col("doc_id"), 1000L)
    val train = docs.filter(h < 980)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("long").as("nn"),
        count(lit(1)).cast("long").as("v"))
      .collect().head
    val lnMax = (math.log(train.getAs[Long]("nn").toDouble +
      train.getAs[Long]("v")) * 1e9).toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 1)
      val x = r.getAs[Long]("xent_nano")
      assert(x >= 0 && x <= lnMax + 1)
      val oov = r.getAs[Long]("oov_ppm")
      assert(oov >= 0 && oov <= 1000000L)
    }
  }

  test("q302: AUC replays against a driver-side brute-force rank computation") {
    import org.apache.spark.sql.functions._
    val r = run("q302_quality_auc").collect().head
    val auc = r.getAs[Long]("auc_ppm")
    assert(auc >= 0 && auc <= 1000000L)
    assert(r.getAs[Long]("gini_ppm") == auc * 2 - 1000000L)
    // brute force on sf0.001: P(pos > neg) + P(tie)/2 over all pairs
    val qm = graft.operators.TextOps.qualityRaw(col("text"))
    val scored = graft.catalog.Tables.t(spark, sf, "documents")
      .select((floor(qm * 1000)).cast("long").as("qm"),
        when(graft.operators.CorpusOps.hashMix(col("doc_id"), 1000L) <
          floor(qm * 1000).cast("long"), 1L).otherwise(0L).as("label"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    assert(r.getAs[Long]("n1") == pos.length.toLong)
    assert(r.getAs[Long]("n0") == neg.length.toLong)
    if (pos.nonEmpty && neg.nonEmpty) {
      var num = 0L
      for (p <- pos; q <- neg)
        num += (if (p > q) 2L else if (p == q) 1L else 0L)
      val brute = num * 500000L / (pos.length.toLong * neg.length)
      assert(auc == brute)
    }
  }

  test("q303: entropy split is bounded by ln(alphabet) and suspects subset docs") {
    run("q303_payload_entropy").collect().foreach { r =>
      val h = r.getAs[Long]("avg_header_nano")
      val b = r.getAs[Long]("avg_body_nano")
      // entropy of a 64-char window <= ln 64 ≈ 4.159 nats
      assert(h >= 0 && h <= 4159000000L)
      assert(b >= 0 && b <= 6000000000L) // printable-ASCII ceiling < ln 128
      assert(r.getAs[Long]("n_suspect") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q304: phrase ⊆ prox5 ⊆ AND — the match-strictness chain holds") {
    val r = run("q304_proximity_search").collect().head
    val ph = r.getAs[Long]("n_phrase"); val px = r.getAs[Long]("n_prox5")
    val nd = r.getAs[Long]("n_and")
    assert(ph >= 1) // the top bigram occurs adjacently by construction
    assert(ph <= px && px <= nd)
    assert(r.getAs[Long]("phrase_share_ppm") == ph * 1000000L / nd)
    assert(r.getAs[String]("w1") != null && r.getAs[String]("w2") != null)
  }

  test("q305: backoff xent dominates q301's unigram on no split (bigram adds signal or ties)") {
    val uni = run("q301_heldout_perplexity").collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("xent_nano")).toMap
    run("q305_backoff_xent").collect().foreach { r =>
      val x = r.getAs[Long]("xent_nano")
      assert(x >= 0)
      assert(r.getAs[Long]("backoff_ppm") >= 0 &&
        r.getAs[Long]("backoff_ppm") <= 1000000L)
      // sanity, not a theorem: backoff bigram xent should not be
      // catastrophically worse than unigram (within 2x + ln(2.5))
      val u = uni(r.getAs[String]("split"))
      assert(x <= 2 * u + 1000000000L)
    }
  }

  test("q306: tau replays from concordant counts and is bounded to [-1, 1]") {
    val rows = run("q306_truncation_tau").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs"); val c = r.getAs[Long]("concordant")
      assert(n == 190L) // C(20, 2)
      assert(r.getAs[Long]("discordant") == n - c)
      val tau = r.getAs[Long]("tau_milli")
      assert(tau == (2 * c - n) * 1000 / n || tau == -((n - 2 * c) * 1000 / n) ||
        (2 * c - n) < 0) // floor truncates toward zero on both engines
      assert(tau >= -1000L && tau <= 1000L)
    }
  }

  test("q307: error metrics internally consistent — |bias| <= mae, smape bounded") {
    run("q307_seasonal_backtest").collect().foreach { r =>
      assert(r.getAs[Long]("n_days") >= 1)
      val mae = r.getAs[Long]("mae7_milli")
      val bias = r.getAs[Long]("bias_milli")
      // bias is the signed mean error; its magnitude cannot exceed the
      // MAE beyond the two independent floor truncations
      assert(math.abs(bias) <= mae + 2)
      assert(r.getAs[Long]("smape_ppm") >= 0 &&
        r.getAs[Long]("smape_ppm") <= 2000000L)
      assert(r.getAs[Long]("mase_milli") >= 0)
    }
  }

  test("q308: geometric median is at least as central as the mean (robustness direction)") {
    run("q308_geometric_median").collect().foreach { r =>
      assert(r.getAs[Long]("n_vecs") >= 1)
      val dm = r.getAs[Long]("mean_dist_mean_milli")
      val dg = r.getAs[Long]("mean_dist_gm_milli")
      val sh = r.getAs[Long]("center_shift_milli")
      assert(dm >= 0 && dg >= 0 && sh >= 0)
      // Weiszfeld minimizes the SUM of distances: after two rounds the
      // mean distance to the new center must not blow past the mean's
      // (allow quantization slack of the shift's floor errors)
      assert(dg <= dm + sh / math.max(r.getAs[Long]("n_vecs"), 1L) + 3)
      // triangle inequality: centers can't be farther apart than the
      // two mean distances combined
      assert(sh <= dm + dg + 3)
    }
  }

  test("q309: confusion masses are conserved and both picks are argmaxes of the sweep") {
    val rows = run("q309_threshold_tuning").collect()
    assert(rows.map(_.getAs[String]("criterion")).toSet ==
      Set("f1", "youden_j"))
    val total = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn"))
    assert(total.distinct.length == 1) // positives conserved across cuts
    rows.foreach { r =>
      assert(r.getAs[Long]("f1_ppm") >= 0 &&
        r.getAs[Long]("f1_ppm") <= 1000000L)
      assert(r.getAs[Long]("j_ppm") >= -1000000L &&
        r.getAs[Long]("j_ppm") <= 1000000L)
      assert(r.getAs[Long]("tp") >= 0 && r.getAs[Long]("fp") >= 0 &&
        r.getAs[Long]("fn") >= 0)
    }
    val f1Row = rows.find(_.getAs[String]("criterion") == "f1").get
    val jRow = rows.find(_.getAs[String]("criterion") == "youden_j").get
    assert(f1Row.getAs[Long]("f1_ppm") >= jRow.getAs[Long]("f1_ppm"))
    assert(jRow.getAs[Long]("j_ppm") >= f1Row.getAs[Long]("j_ppm"))
  }

  test("q310: ILD is a mean over 45 pairs, redundancy replays its own count") {
    val rows = run("q310_result_diversity").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 45L) // C(10, 2)
      val ild = r.getAs[Long]("ild_ppm")
      assert(ild >= 0 && ild <= 2000000L)
      val red = r.getAs[Long]("n_redundant")
      assert(red >= 0 && red <= 45L)
      assert(r.getAs[Long]("redundancy_ppm") == red * 1000000L / 45L)
    }
  }

  test("q311: null-effect A/A control — crossings consistent with the max statistic") {
    val r = run("q311_sequential_probe").collect().head
    val k = r.getAs[Long]("n_looks"); val c = r.getAs[Long]("n_crossings")
    assert(k >= 1 && c >= 0 && c <= k)
    val fc = r.getAs[Long]("first_crossing_day")
    if (c == 0) assert(fc == -1L) else assert(fc >= 0L)
    // if the max normalized statistic never exceeded alpha, there can
    // be no crossing (the two readouts must agree)
    if (r.getAs[Long]("max_stat_ppm") <= r.getAs[Long]("z2_alpha_micro"))
      assert(c == 0)
  }

  test("q312: every returned supplier achieves the global max revenue") {
    val rows = run("q312_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("revenue_cents")).distinct
    assert(revs.length == 1 && revs.head > 0)
    assert(rows.map(_.getAs[Long]("suppkey")).distinct.length == rows.length)
  }

  test("q313: Wilson interval brackets the rate, stays in [0, 1], shrinks with n") {
    run("q313_wilson_interval").collect().foreach { r =>
      val rate = r.getAs[Long]("rate_ppm")
      val lo = r.getAs[Long]("wilson_lo_ppm")
      val hi = r.getAs[Long]("wilson_hi_ppm")
      assert(lo >= 0 && hi <= 1000000L && lo <= hi)
      // Wilson interval always contains the point estimate (allow the
      // independent floor truncations a few ppm of slack)
      assert(rate >= lo - 5 && rate <= hi + 5)
      assert(r.getAs[Long]("k") <= r.getAs[Long]("n"))
    }
  }

  test("q314: gains curve is monotone, ends at full capture, lift decays") {
    val rows = run("q314_gains_table").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("cum_n"),
        r.getAs[Long]("capture_ppm"), r.getAs[Long]("lift_permille")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq)
    val caps = rows.map(_._3)
    caps.zip(caps.drop(1)).foreach { case (a, b) => assert(a <= b) }
    assert(caps.last >= 999999L - 1) // decile 10 captures everything
    val ns = rows.map(_._2)
    ns.zip(ns.drop(1)).foreach { case (a, b) => assert(a <= b) }
    // a ranking at least as good as random: top-decile lift >= ~1x
    assert(rows.head._4 >= 900L)
  }

  test("q315: A/A control — variance reduction in [0,1], theta consistent sign") {
    val r = run("q315_cuped").collect().head
    assert(r.getAs[Long]("n_users") >= 1)
    val vr = r.getAs[Long]("var_reduction_ppm")
    assert(vr >= 0 && vr <= 1000000L + 5) // rho^2 <= 1 (floor slack)
    // pre- and post-period activity correlate positively for users
    assert(r.getAs[Long]("theta_milli") >= 0)
  }

  test("q316: planted near-miss pairs surface; every pair verifies at dist <= 1") {
    val rows = run("q316_qgram_ed_join").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("dist")))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (a, b, dd) =>
      assert(a < b); assert(dd >= 0 && dd <= 1)
    }
    // ordering is the (dist, a, b) total order
    assert(rows.sameElements(rows.sortBy(x => (x._3, x._1, x._2))))
    // either a planted cross-class pair (dist 1) survives, or the
    // top-20 saturated with exact matches before any could appear
    assert(rows.exists(_._3 == 1L) || rows.length == 20)
  }

  test("q317: the growth-accounting identity holds every week") {
    val rows = run("q317_growth_accounting").collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[Long]("active"),
        r.getAs[Long]("n_new"), r.getAs[Long]("retained"),
        r.getAs[Long]("resurrected"), r.getAs[Long]("churned")))
      .sortBy(_._1)
    rows.foreach { case (_, act, nw, ret, res, ch) =>
      assert(act == nw + ret + res) // the decomposition identity
      assert(ch >= 0)
    }
    // churned(w) = active(w-1) - retained(w) replays across rows
    rows.zip(rows.drop(1)).foreach { case ((_, actPrev, _, _, _, _),
      (_, _, _, ret, _, ch)) => assert(ch == actPrev - ret)
    }
    // week 0: everyone is new, nobody churned yet
    assert(rows.head._3 == rows.head._2 && rows.head._6 == 0L)
  }

  test("q318: tercile cells partition the user base, value conserved") {
    import org.apache.spark.sql.functions._
    val rows = run("q318_rfm_segments").collect()
    rows.foreach { r =>
      Seq("r_t", "f_t", "m_t").foreach(c =>
        assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 3))
      assert(r.getAs[Long]("n_users") >= 1)
    }
    val nUsers = graft.catalog.Tables.t(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    // terciles are lower-rank cuts: the lowest cell of each axis is
    // non-empty by construction
    assert(rows.exists(_.getAs[Long]("r_t") == 1L))
    assert(rows.exists(_.getAs[Long]("f_t") == 1L))
    assert(rows.exists(_.getAs[Long]("m_t") == 1L))
  }

  test("q319: the stump can only reduce impurity, sides partition the corpus") {
    import org.apache.spark.sql.functions._
    val r = run("q319_gini_stump").collect().head
    val red = r.getAs[Long]("reduction_ppm")
    // splitting never increases weighted Gini (allow floor slack)
    assert(red >= -4)
    assert(r.getAs[Long]("split_gini_ppm") >= 0 &&
      r.getAs[Long]("parent_gini_ppm") <= 500000L) // gini <= 1/2 binary
    val nDocs = graft.catalog.Tables.t(spark, sf, "documents").count()
    assert(r.getAs[Long]("nl") + r.getAs[Long]("nr") == nDocs)
    assert(r.getAs[Long]("nl") >= 1 && r.getAs[Long]("nr") >= 1)
  }

  test("q320: the planted label is calibrated by construction — slope near 1") {
    val r = run("q320_calibration_slope").collect().head
    assert(r.getAs[Long]("n_bins") >= 3)
    val slope = r.getAs[Long]("slope_milli")
    // the label IS drawn with P(1) = qm/1000, so weak calibration
    // holds up to sampling noise on tiny sf0.001 — generous band
    assert(slope > 200 && slope < 3000)
  }

  test("q321: Bloom advisory monotone in strictness, k consistent with bpk") {
    val rows = run("q321_bloom_advisor").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("fpr_label"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("k_hashes"),
        r.getAs[Long]("m_bits")))
    assert(rows.map(_._2).toSet == Set("p0.1pct", "p1pct", "p5pct"))
    rows.groupBy(_._1).values.foreach { g =>
      val byFpr = g.map(x => x._2 -> x._5).toMap
      // stricter FPR costs more bits
      assert(byFpr("p0.1pct") > byFpr("p1pct"))
      assert(byFpr("p1pct") > byFpr("p5pct"))
      g.foreach { case (_, _, n, k, m) =>
        assert(m > n) // always more bits than keys at these FPRs
        assert(k >= 4 && k <= 10)
      }
    }
  }

  test("q322: modularity is bounded and the partition covers all edges") {
    val r = run("q322_modularity").collect().head
    val q = r.getAs[Long]("modularity_ppm")
    // Q in [-1/2, 1] for any partition
    assert(q >= -500000L - 2 && q <= 1000000L)
    assert(r.getAs[Long]("n_communities") >= 1)
    assert(r.getAs[Long]("n_edges") >= 1)
  }

  test("q323: predictions are strictly non-edges with positive common support") {
    import org.apache.spark.sql.functions._
    val rows = run("q323_link_prediction").collect()
      .map(r => (r.getAs[Long]("node_a"), r.getAs[Long]("node_b"),
        r.getAs[Long]("cn"), r.getAs[Long]("jaccard_ppm")))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, cn, j) =>
      assert(a < b && cn >= 1)
      assert(j >= 1 && j <= 1000000L)
    }
    // replay the non-edge property against the same graph derivation
    def hv(salt: String) =
      s"cast(conv(substr(md5(concat('$salt', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
    val nn = math.max(graft.catalog.Stats
      .parquetRowCount(spark, s"$sf/documents.parquet") / 8, 128L)
    val edges = graft.catalog.Tables.t(spark, sf, "documents")
      .select(expr(s"${hv("e")} % $nn").as("x"), expr(s"${hv("f")} % $nn").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (a, b, _, _) => assert(!edges.contains((a, b))) }
  }

  test("q324: both schemes partition the corpus; the ring uses every node") {
    val rows = run("q324_consistent_hashing").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("n_ring"),
        r.getAs[Long]("n_mod")))
    assert(rows.map(_._1).sorted.toSeq == (0L to 7L).toSeq)
    val nDocs = graft.catalog.Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._3).sum == nDocs)
  }

  test("q325: collisions monotone in table size — more buckets, fewer collisions") {
    val rows = run("q325_feature_hashing").collect()
      .map(r => (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_types"),
        r.getAs[Long]("buckets_used"), r.getAs[Long]("type_collision_ppm"),
        r.getAs[Long]("mass_collision_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L))
    assert(rows.map(_._2).distinct.length == 1) // same vocabulary
    rows.foreach { case (b, n, used, tc, mc) =>
      assert(used <= math.min(b, n))
      assert(tc >= 0 && tc <= 1000000L && mc >= 0 && mc <= 1000000L)
    }
    val tcs = rows.map(_._4)
    tcs.zip(tcs.drop(1)).foreach { case (a, bb) => assert(bb <= a) }
  }

  test("q326: hashMix passes its own uniformity gate on the doc population") {
    val r = run("q326_hash_uniformity").collect().head
    assert(r.getAs[Long]("buckets_hit") <= 64L)
    assert(r.getAs[Long]("biased_flag") == 0L) // the devices are safe
    assert(r.getAs[Long]("chi2_raw") >= 0)
    assert(r.getAs[Long]("max_dev_ppm") >= 0)
  }

  test("q327: winnowing density sits in the theoretical band around 2/(w+1)") {
    run("q327_winnowing").collect().foreach { r =>
      assert(r.getAs[Long]("n_fingerprints") <= r.getAs[Long]("n_windows"))
      val dens = r.getAs[Long]("density_milli")
      // window minima repeat, so density << 1; expected ~2/(w+1) = 222
      // for random-ish grams — generous band for structured text
      assert(dens >= 50 && dens <= 1000)
    }
  }

  test("q328: custdist conserves the customer registry and the order mass") {
    import org.apache.spark.sql.functions._
    val rows = run("q328_custdist").collect()
      .map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist")))
    val nCust = graft.catalog.Tables.t(spark, sf, "customer").count()
    val nOrd = graft.catalog.Tables.t(spark, sf, "orders")
      .join(graft.catalog.Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows.map(_._2).sum == nCust)
    assert(rows.map(x => x._1 * x._2).sum == nOrd)
  }

  test("q329: ring churn near the 1/9 ideal, mod churn near 8/9 — the whole point") {
    val r = run("q329_rebalance_churn").collect().head
    val ring = r.getAs[Long]("ring_moved_ppm")
    val mod = r.getAs[Long]("mod_moved_ppm")
    // ring should be within a loose band of 1/9 and ALWAYS far below mod
    assert(ring < mod / 3)
    assert(ring >= 10000L && ring <= 400000L)
    assert(mod >= 600000L) // mod-hash reshuffles most keys
    assert(r.getAs[Long]("ring_moved") <= r.getAs[Long]("n_keys"))
  }

  test("q330: A/A DiD sits near zero relative to the cell scale") {
    import org.apache.spark.sql.functions._
    val r = run("q330_diff_in_diff").collect().head
    val did = r.getAs[Long]("did_micro")
    // null effect by construction: |DiD| far below the per-user
    // activity scale (events/user in micro units)
    val ev = graft.catalog.Tables.t(spark, sf, "events")
    val scale = ev.count() * 1000000L /
      math.max(ev.select(col("user_id")).distinct().count(), 1L)
    assert(math.abs(did) < scale / 2)
    // pretrend gap exists as a readout (no sign constraint under A/A)
    assert(math.abs(r.getAs[Long]("pretrend_gap_milli")) < 1000000L)
  }

  test("q331: AP is bounded by [base rate, 1] for a better-than-random ranker") {
    val r = run("q331_average_precision").collect().head
    val ap = r.getAs[Long]("ap_ppm")
    assert(ap >= 0 && ap <= 1000000L)
    // the planted label correlates positively with the score, so AP
    // must beat the base rate (random ranker's AP ~ prevalence)
    import org.apache.spark.sql.functions._
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
    val qm = floor(graft.operators.TextOps.qualityRaw(col("text")) * 1000)
      .cast("long")
    val prev = docs.select(
      when(graft.operators.CorpusOps.hashMix(col("doc_id"), 1000L) < qm,
        1L).otherwise(0L).as("l"))
      .agg(sum(col("l")), count(lit(1))).collect().head
    val basePpm = prev.getLong(0) * 1000000L / prev.getLong(1)
    assert(ap > basePpm)
    assert(r.getAs[Long]("n_pos") == prev.getLong(0))
  }

  test("q332: top-10 ordering is total and every row postdates the cutoff logic") {
    val rows = run("q332_shipping_priority").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("odate"),
        r.getAs[Long]("revenue_cents")))
    assert(rows.length == 10)
    val sorted = rows.sortBy(x => (-x._3, x._2, x._1))
    assert(rows.sameElements(sorted))
    rows.foreach { case (_, odate, rev) =>
      assert(odate < "1998-06-01") // order placed before the cutoff
      assert(rev > 0)
    }
    assert(rows.map(_._1).distinct.length == 10)
  }

  test("q333: one winner per part, winner's cost is the part's minimum") {
    import org.apache.spark.sql.functions._
    val rows = run("q333_mincost_supplier").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // one row per part
    assert(rows.map(_.getAs[Long]("p_partkey")).distinct.length == rows.length)
    // the list rides (s_acctbal desc, p_partkey asc) — a total order
    val key = rows.map(r => (-r.getAs[Double]("s_acctbal"),
      r.getAs[Long]("p_partkey")))
    assert(key.sameElements(key.sorted))
    rows.foreach(r => assert(r.getAs[Long]("unit_cost_cents") > 0))
  }

  test("q334: promo share is ppm-bounded and revenue conserves the corpus") {
    val rows = run("q334_promo_revenue").collect()
    assert(rows.nonEmpty && rows.length <= 12)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("promo_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(r.getAs[Long]("revenue_whole") > 0)
      assert(r.getAs[Long]("n_items") > 0)
    }
  }

  test("q335: brackets are disjoint and each bracket's rows honor its predicate") {
    val rows = run("q335_bracket_revenue").collect()
    val names = rows.map(_.getAs[String]("bracket"))
    assert(names.distinct.length == names.length)
    assert(names.forall(Set("bracket1", "bracket2", "bracket3")))
    rows.foreach(r => assert(r.getAs[Long]("n_items") > 0 &&
      r.getAs[Long]("revenue_whole") > 0))
  }

  test("q336: share is ppm-bounded; focus share replays from the joined frame") {
    val rows = run("q336_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("share_ppm")
      assert(s >= 0 && s <= 1000000L)
      assert(r.getAs[Long]("market_whole") > 0)
    }
    // ~1/25 of supply should land on any one nation: share never exceeds
    // a loose 10x of uniform, catching an accidentally-inverted filter
    assert(rows.forall(_.getAs[Long]("share_ppm") < 400000L))
  }

  test("q346: forecast revenue is positive and bounded by raw discounted mass") {
    import org.apache.spark.sql.functions._
    val r = run("q346_forecast_revenue").collect().head
    val n = r.getAs[Long]("n_lines"); val f = r.getAs[Long]("forecast_revenue_whole")
    assert(n > 0 && f > 0)
    // each line contributes at most 7% of its extendedprice: the total
    // must sit under 7% of the band's raw price mass
    val raw = graft.catalog.Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(f <= raw * 0.07 + 1)
  }

  test("q345: both trade directions appear and volumes are positive") {
    val rows = run("q345_binat_volume").collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).distinct
    assert(dirs.forall { case (a, b) => a != b })
    assert(dirs.toSet.subsetOf(Set(("NATION_3", "NATION_7"),
      ("NATION_7", "NATION_3"))))
    rows.foreach(r => assert(r.getAs[Long]("volume_whole") > 0 &&
      r.getAs[Long]("n_lines") > 0))
  }

  test("q344: leakage partitions the pair set and sits near 7/8 theory") {
    val r = run("q344_shard_leakage").collect().head
    val np = r.getAs[Long]("n_pairs")
    assert(np > 0)
    assert(r.getAs[Long]("n_within") + r.getAs[Long]("n_cross") == np)
    val ppm = r.getAs[Long]("leakage_ppm")
    // random 8-way sharding strands 7/8 = 875000 ppm in expectation;
    // a correlated (or broken) shard function would sit far away
    assert(ppm > 700000L && ppm < 990000L)
  }

  test("q343: pass@k is ppm-bounded and monotone in k") {
    val rows = run("q343_pass_at_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p1 = r.getAs[Long]("pass1_ppm"); val p4 = r.getAs[Long]("pass4_ppm")
      val p8 = r.getAs[Long]("pass8_ppm")
      assert(p1 >= 0 && p8 <= 1000000L)
      assert(p1 <= p4 && p4 <= p8) // more samples can only help
      val mc = r.getAs[Long]("mean_correct")
      assert(mc >= 0 && mc <= 16)
      assert(r.getAs[Long]("n_tasks") > 0)
    }
  }

  test("q339: late-order counts never exceed the quarter's order volume") {
    import org.apache.spark.sql.functions._
    val rows = run("q339_order_priority_check").collect()
    assert(rows.nonEmpty)
    val total = graft.catalog.Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("late_orders")).sum <= total)
    assert(rows.forall(_.getAs[Long]("late_orders") > 0))
  }

  test("q340: returned-item list is totally ordered with positive losses") {
    val rows = run("q340_returned_items").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val key = rows.map(r => (-r.getAs[Long]("lost_revenue"),
      r.getAs[Long]("c_custkey")))
    assert(key.sameElements(key.sorted))
    rows.foreach(r => assert(r.getAs[Long]("lost_revenue") > 0 &&
      r.getAs[Long]("n_lines") > 0))
  }

  test("q341: planted label conflicts are found and internally consistent") {
    val r = run("q341_metadata_consistency").collect().head
    val groups = r.getAs[Long]("n_dup_groups")
    assert(groups > 0) // the %10 plants guarantee dup groups at any SF
    assert(r.getAs[Long]("n_dup_docs") >= 2 * groups)
    val lc = r.getAs[Long]("lang_conflicts")
    val sc = r.getAs[Long]("source_conflicts")
    val any = r.getAs[Long]("any_conflict")
    assert(any <= groups && lc <= any && sc <= any)
    assert(any >= math.max(lc, sc))
    assert(r.getAs[Long]("max_group") >= 2)
  }

  test("q342: padding shrinks as context length grows; seq counts conserve") {
    val rows = run("q342_packing_sweep").collect()
      .sortBy(_.getAs[Long]("ctx_len"))
    assert(rows.map(_.getAs[Long]("ctx_len")).toSeq ==
      Seq(128L, 256L, 512L, 1024L))
    rows.foreach { r =>
      val ppm = r.getAs[Long]("padding_ppm")
      assert(ppm >= 0 && ppm < 1000000L)
      // seqs * L covers the token mass
      assert(r.getAs[Long]("total_seqs") * r.getAs[Long]("ctx_len") >=
        r.getAs[Long]("total_tokens"))
    }
    // larger context -> never MORE sequences, never FEWER split docs
    val seqs = rows.map(_.getAs[Long]("total_seqs"))
    assert(seqs.zip(seqs.tail).forall { case (a, b) => b <= a })
    val splits = rows.map(_.getAs[Long]("n_docs_split"))
    assert(splits.zip(splits.tail).forall { case (a, b) => b <= a })
  }

  test("q338: every reported span is genuinely cross-document and ordered") {
    val rows = run("q338_span_dedup").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs"); val no = r.getAs[Long]("n_occurrences")
      assert(nd >= 2)        // the >= 2 docs gate
      assert(no >= nd)       // occurrences dominate distinct docs
      assert(r.getAs[String]("fp").length == 32) // md5 hex
    }
    val key = rows.map(r => (-r.getAs[Long]("n_docs"),
      -r.getAs[Long]("n_occurrences"), r.getAs[String]("fp")))
    assert(key.sameElements(key.sorted))
  }

  test("q337: supplier counts positive, descending, and deficit-free") {
    import org.apache.spark.sql.functions._
    val rows = run("q337_supplier_diversity").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.forall(_ > 0))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    // no counted supplier can be in deficit: the max possible distinct
    // count is bounded by the eligible supplier population
    val eligible = graft.catalog.Tables.t(spark, sf, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    assert(cnts.forall(_ <= eligible))
  }
}
