package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the governance family (q151-q153): independent
  * Scala recomputation from the raw sf0.001 corpus (the
  * AnalyticsQuerySpec pattern — the DuckDB oracle proves engine
  * parity, these pin the SEMANTICS so a same-wrong-both-sides bug
  * can't hide).
  */
class GovernanceQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hv32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def hm(id: Long, mod: Long): Long =
    ((((id % 1000003) + 1000003) % 1000003 * 2654435761L + 40503) % mod
      + mod) % mod

  private lazy val rawDocs: Seq[(Long, String, String)] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // ------------------------------------------------------------------
  test("q151 PII audit matches a java.util.regex recompute; planted spans are found") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
    val idrun = "\\d{9,}".r
    def aug(id: Long, text: String): String =
      if (id % 17 == 3) s"$text contact user$id@example.com"
      else if (id % 23 == 5) s"$text from 10.${id % 256}.0.${id * 3 % 256}"
      else if (id % 29 == 11) s"$text ref ${id + 4100000000L}"
      else text
    case class Acc(docs: Long = 0, hit: Long = 0, ne: Long = 0, ni: Long = 0,
                   nd: Long = 0, cut: Long = 0)
    val exp = rawDocs.groupBy(_._3).map { case (src, ds) =>
      src -> ds.foldLeft(Acc()) { case (a, (id, text, _)) =>
        val t = aug(id, text)
        val (e, i, d) = (email.findAllIn(t).size, ipv4.findAllIn(t).size,
          idrun.findAllIn(t).size)
        val red = idrun.replaceAllIn(
          ipv4.replaceAllIn(email.replaceAllIn(t, ""), ""), "")
        Acc(a.docs + 1, a.hit + (if (e + i + d > 0) 1 else 0), a.ne + e,
          a.ni + i, a.nd + d, a.cut + (t.length - red.length))
      }
    }
    val got = run("q151_pii_audit").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (src, a) =>
      val r = got(src)
      assert(r.getLong(1) == a.docs, s"$src n_docs")
      assert(r.getLong(2) == a.hit, s"$src docs_with_pii")
      assert(r.getLong(3) == a.hit * 1000 / a.docs, s"$src permille")
      assert(r.getLong(4) == a.ne, s"$src emails")
      assert(r.getLong(5) == a.ni, s"$src ips")
      assert(r.getLong(6) == a.nd, s"$src idruns")
      assert(r.getLong(7) == a.cut, s"$src chars_redacted")
    }
    // the planted spans exist and are found: every class is non-zero
    assert(exp.values.map(_.ne).sum > 0 && exp.values.map(_.ni).sum > 0 &&
      exp.values.map(_.nd).sum > 0)
  }

  // ------------------------------------------------------------------
  test("q152 dense ids equal a sequential global row_number; ranges partition 1..n") {
    val ordered = rawDocs.map(t => (t._3, t._1)).sorted.zipWithIndex
      .map { case ((src, _), i) => (src, i + 1L) }
    val exp = ordered.groupBy(_._1).map { case (src, ids) =>
      val v = ids.map(_._2)
      src -> (v.size.toLong, v.min, v.max, v.reduce(_ ^ _))
    }
    val got = run("q152_dense_ids").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp)
    // ranges are disjoint, contiguous, and cover 1..n
    val spans = got.values.toSeq.sortBy(_._2)
    assert(spans.head._2 == 1L)
    assert(spans.last._3 == rawDocs.size.toLong)
    spans.foreach { case (n, lo, hi, _) => assert(hi - lo + 1 == n) }
    spans.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 == a._3 + 1)
      case _ =>
    }
  }

  // ------------------------------------------------------------------
  test("q153 group folds match the lead-fp hash recompute; zero groups span folds; shares sum to ~1e6") {
    val perDoc = rawDocs.map { case (_, text, _) =>
      val tk = text.trim.split("\\s+")
      val lead = tk.take(10).mkString(" ")
      (md5hex(lead), hm(hv32(lead), 5), tk.length.toLong)
    }
    val grp = perDoc.groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k._1, k._2, v.size.toLong, v.map(_._3).sum) }
    val tt = grp.map(_._4).sum
    val exp = grp.groupBy(_._2).map { case (fold, gs) =>
      fold -> (gs.size.toLong, gs.map(_._3).sum, gs.map(_._4).sum * 1000000L / tt)
    }
    // fold is a pure function of the group key, so no group can span folds
    assert(grp.groupBy(_._1).values.forall(_.map(_._2).toSet.size == 1))
    val got = run("q153_group_folds").collect()
    assert(got.map(_.getLong(0)).toSet == exp.keySet)
    got.foreach { r =>
      val (ng, nd, share) = exp(r.getLong(0))
      assert(r.getLong(1) == ng, s"fold ${r.getLong(0)} n_groups")
      assert(r.getLong(2) == nd, s"fold ${r.getLong(0)} n_docs")
      assert(r.getLong(3) == share, s"fold ${r.getLong(0)} share_ppm")
      assert(r.getLong(4) == 0L, "groups_multi_fold gate")
    }
    val shares = got.map(_.getLong(3)).sum
    assert(shares > 1000000L - 10 && shares <= 1000000L)
  }

  // ------------------------------------------------------------------
  test("q157 centroid drift matches a sequential recompute; cosines near 1 for a clean hash split") {
    val embs = graft.catalog.Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(label as long) as label",
        "cast(embedding as array<double>) as e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def centroid(vs: Seq[Array[Double]]): Array[Double] = {
      val dims = vs.head.length
      Array.tabulate(dims) { i =>
        vs.map(v => math.floor(v(i) * 1000).toLong).sum.toDouble /
          (vs.size * 1000.0)
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byLabel = embs.groupBy(_._2)
    val got = run("q157_centroid_drift").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    byLabel.foreach { case (label, vs) =>
      val (tr, va) = vs.partition(t => hm(t._1, 1000) < 900)
      if (tr.nonEmpty && va.nonEmpty) {
        val (gn, gv, gc) = got(label)
        assert(gn == tr.size && gv == va.size, s"label $label split sizes")
        val expected = cos(centroid(tr.map(_._3)), centroid(va.map(_._3)))
        assert(math.abs(gc - expected) < 2e-6, s"label $label cos")
        // NOTE: at sf0.001 the synthetic label clusters are near-zero-
        // mean, so the train/val mean directions are dominated by
        // sampling noise and the cosine is legitimately low — which is
        // precisely the "val slice not representative" signal the audit
        // reports. Only the bound is asserted.
        assert(gc >= -1.0 && gc <= 1.0, s"label $label cos bound")
      } else assert(!got.contains(label))
    }
  }

  // ------------------------------------------------------------------
  test("q158 range frame matches a sequential recompute of the 1h burst peak") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as ep",
        "cast(floor(value * 1000) as long) as vm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = run("q158_range_frame").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val byUser = evs.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, es) =>
      // RANGE frame: every event with ep in [cur - 1h, cur], ties
      // included regardless of row order
      val bursts = es.map { case (_, ep, _) =>
        val in = es.filter(e => e._2 >= ep - 3600000000L && e._2 <= ep)
        (in.size.toLong, in.map(_._3).sum)
      }
      val (gn, gp, gm) = got(u)
      assert(gn == es.size.toLong, s"user $u n_events")
      assert(gp == bursts.map(_._1).max, s"user $u peak events")
      assert(gm == bursts.map(_._2).max, s"user $u peak mass")
    }
  }

  // ------------------------------------------------------------------
  test("q159 join-size sketch matches a sequential CM recompute and never underestimates") {
    val counts = graft.catalog.Tables.t(spark, sf, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exact = counts.map(c => c._2 * c._2).sum
    val sketch = Array.fill(3, 256)(0L)
    counts.foreach { case (k, cnt) =>
      (0 until 3).foreach { j =>
        val b = (hv32(s"$k:$j") % 256).toInt
        sketch(j)(b) += cnt
      }
    }
    val est = (0 until 3).map(j => sketch(j).map(c => c * c).sum).min
    val r = run("q159_join_size_sketch").collect().head
    assert(r.getLong(0) == counts.length.toLong, "n_keys")
    assert(r.getLong(1) == exact, "exact_f2")
    assert(r.getLong(2) == est, "cm_est")
    assert(r.getBoolean(3), "never_under gate")
    assert(est >= exact)
    assert(r.getLong(4) == (est - exact) * 1000000 / exact, "overest_ppm")
  }

  // ------------------------------------------------------------------
  test("q160 datasheet matches a sequential recompute per source") {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def quality(text: String): Double = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      math.min(1.0, ntok / 50.0) * 0.5 + (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2
    }
    val got = run("q160_source_datasheet").collect()
      .map(r => r.getString(0) -> r).toMap
    val bySource = rawDocs.groupBy(_._3)
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, ds) =>
      val r = got(src)
      val n = ds.size.toLong
      assert(r.getLong(1) == n, s"$src n_docs")
      assert(r.getLong(2) ==
        ds.map(_._2.trim.split("\\s+").length.toLong).sum, s"$src tokens")
      assert(r.getLong(3) ==
        ds.flatMap(_._2.trim.split("\\s+")).toSet.size.toLong, s"$src vocab")
      val fps = ds.map(d =>
        md5hex(d._2.trim.toLowerCase.replaceAll("\\s+", " "))).toSet.size
      assert(r.getLong(4) == (n - fps) * 1000 / n, s"$src dup_permille")
      val sq = ds.map(d => math.floor(quality(d._2) * 1000).toLong).sum
      assert(r.getLong(5) == sq / n, s"$src quality_mean_milli")
    }
  }

  // ------------------------------------------------------------------
  test("q165 RBO matches a sequential recompute; identical rankings would score ~1e9") {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def metrics(text: String): (Long, Long) = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      val v1 = math.min(1.0, ntok / 50.0) * 0.5 + (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2
      val v2 = math.min(1.0, ntok / 100.0) * 0.3 + (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 5.0) * 0.4
      (math.floor(v1 * 1000).toLong, math.floor(v2 * 1000).toLong)
    }
    val scored = rawDocs.map { case (id, text, _) =>
      val (a, b) = metrics(text); (id, a, b)
    }
    def top100(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
      scored.sortBy(t => (-key(t), t._1)).take(100).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val ra = top100(_._2)
    val rb = top100(_._3)
    val common = ra.keySet & rb.keySet
    val w = (1 to 100).map(dd =>
      math.floor(0.1 * math.pow(0.9, dd - 1) * 1e9).toLong)
    val rbo = (1 to 100).map { dd =>
      val ov = common.count(id => ra(id) <= dd && rb(id) <= dd).toLong
      w(dd - 1) * ov / dd
    }.sum
    val r = run("q165_rbo_rankings").collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == common.size.toLong, "n_common")
    assert(r.getLong(2) == rbo, "rbo_nano")
    // bound: a perfectly stable selection would score w.sum (~1e9 up
    // to quantization), so the score is interpretable on that scale
    assert(rbo >= 0 && rbo <= w.sum)
  }

  // ------------------------------------------------------------------
  test("q166 apportionment sums exactly to the budget and matches largest-remainder") {
    val byLang = graft.catalog.Tables.t(spark, sf, "documents")
      .selectExpr("lang", "cast(size(split(trim(text), '\\\\s+')) as long) as n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    val tt = byLang.values.sum
    val base = byLang.toSeq.map { case (l, toks) =>
      (l, toks, 1000000L * toks / tt, 1000000L * toks % tt)
    }
    val r = 1000000L - base.map(_._3).sum
    val extras = base.sortBy(t => (-t._4, t._1)).take(r.toInt).map(_._1).toSet
    val got = run("q166_budget_apportion").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toMap
    assert(got.keySet == byLang.keySet)
    base.foreach { case (l, toks, q, _) =>
      val (gt, gq, ge, gf) = got(l)
      assert(gt == toks && gq == q, s"$l base")
      assert(ge == (if (extras(l)) 1L else 0L), s"$l extra")
      assert(gf == q + ge, s"$l final")
    }
    assert(got.values.map(_._4).sum == 1000000L, "exact budget")
  }

  // ------------------------------------------------------------------
  private lazy val rawDocsLang: Seq[(Long, String, String, String)] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q175 noisy release matches the seeded geometric mechanism; suppression is exactly noisy < 5") {
    val exp = rawDocsLang.groupBy(d => (d._3, d._4)).map { case ((l, s), ds) =>
      val n = ds.size.toLong
      val hv = hv32(s"$l|$s")
      val u20 = hv % 1048576L
      val mag =
        if (u20 < 524288L) 0L else if (u20 < 786432L) 1L
        else if (u20 < 917504L) 2L else if (u20 < 983040L) 3L
        else if (u20 < 1015808L) 4L else 5L
      val noise = if ((hv / 1048576L) % 2 == 1L) mag else -mag
      val noisy = math.max(n + noise, 0L)
      (l, s) -> (n, noise, noisy, noisy >= 5L)
    }
    val got = run("q175_noisy_release").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == exp)
  }

  test("q176 calibration curve matches a direct recompute; large deciles sit near the diagonal") {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def qm(text: String): Long = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      math.floor((math.min(1.0, ntok / 50.0) * 0.5 +
        (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2) * 1000).toLong
    }
    val rows = rawDocsLang.map { case (id, text, _, _) =>
      val q = qm(text)
      (math.min(q / 100, 9L), q, if (hm(id, 1000L) < q) 1L else 0L)
    }
    val exp = rows.groupBy(_._1).map { case (dec, rs) =>
      val n = rs.size.toLong
      val sq = rs.map(_._2).sum
      val k = rs.map(_._3).sum
      dec -> (n, sq / n, k * 1000000L / n, k * 1000000L / n - (sq / n) * 1000)
    }
    val got = run("q176_calibration_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == exp)
    // mechanism sanity: deciles with enough mass stay within 150 ppt of
    // the diagonal (hash label is calibrated by construction)
    got.foreach { case (dec, (n, pred, obs, _)) =>
      if (n >= 50)
        assert(math.abs(obs - pred * 1000) <= 150000L, s"decile $dec gap")
    }
  }

  // ------------------------------------------------------------------
  test("q184 bootstrap CI matches the seeded Poisson resample recompute; lo <= hi and the interval brackets the full mean loosely") {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def qm(text: String): Long = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      math.floor((math.min(1.0, ntok / 50.0) * 0.5 +
        (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2) * 1000).toLong
    }
    val e1 = math.exp(-1.0)
    val poisT = Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24)
      .map(c => math.floor(c * e1 * 1048576).toLong)
    def weight(id: Long, b: Int): Long = {
      val u = hv32(s"$id:$b") % 1048576L
      poisT.indexWhere(u < _) match { case -1 => 5L case k => k.toLong }
    }
    val docs = rawDocsLang.map { case (id, text, _, src) => (id, src, qm(text)) }
    val exp = docs.groupBy(_._2).map { case (src, ds) =>
      val fullMean = ds.map(_._3).sum / ds.size
      val means = (0 until 32).flatMap { b =>
        val ws = ds.map(d => (weight(d._1, b), d._3))
        val sw = ws.map(_._1).sum
        if (sw == 0) None else Some((ws.map(w => w._1 * w._2).sum / sw, b))
      }.sortBy(identity)
      val lo = means(1)._1
      val hi = means(means.size - 2)._1
      src -> (fullMean, lo, hi)
    }
    val got = run("q184_bootstrap_ci").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == exp)
    got.foreach { case (src, (m, lo, hi)) =>
      assert(lo <= hi, s"$src order")
      // percentile bootstrap of a mean should land near the full mean
      assert(lo - 50 <= m && m <= hi + 50, s"$src bracket")
    }
  }

  // ------------------------------------------------------------------
  test("q186 column profile matches direct per-column stats") {
    val li = graft.catalog.Tables.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_returnflag",
        "date_format(l_shipdate, 'yyyy-MM-dd') as ship",
        "cast(floor(l_quantity * 1000) as long) as qty_milli").collect()
    val n = li.length.toLong
    def col[T](i: Int): Seq[Any] = li.map(_.get(i)).toSeq
    val exp = Map(
      "l_orderkey" -> col(0), "l_partkey" -> col(1),
      "l_returnflag" -> col(2), "ship" -> col(3), "qty_milli" -> col(4))
      .map { case (name, vs) =>
        val nonNull = vs.filterNot(_ == null)
        val strs = nonNull.map(_.toString)
        val (mn, mx) = name match {
          case "l_returnflag" | "ship" => (strs.min, strs.max)
          case _ =>
            val ls = nonNull.map(_.asInstanceOf[Long])
            (ls.min.toString, ls.max.toString)
        }
        name -> ((vs.size - nonNull.size).toLong,
          nonNull.distinct.size.toLong, mn, mx)
      }
    val got = run("q186_column_profile").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (c, (nu, nd, mn, mx)) =>
      val (gn, gnu, gnd, gmn, gmx) = got(c)
      assert(gn == n, s"$c n")
      assert(gnu == nu, s"$c nulls")
      assert(gnd == nd, s"$c ndv")
      assert(gmn == mn && gmx == mx, s"$c min/max")
    }
  }

  // ------------------------------------------------------------------
  test("q188 range layout prunes most files for a mid-range predicate; natural layout prunes none on this corpus") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mn = docs.map(_._2).min; val mx = docs.map(_._2).max
    val lo = mn + (mx - mn) * 45 / 100
    val hi = mn + (mx - mn) * 55 / 100
    val w = (mx - mn) / 20 + 1
    def stats(assign: ((Long, Long)) => Long): (Long, Long) = {
      val files = docs.groupBy(assign).values
        .map(fs => (fs.map(_._2).min, fs.map(_._2).max))
      (files.size.toLong,
        files.count { case (fmn, fmx) => fmx >= lo && fmn <= hi }.toLong)
    }
    val (nfN, ovN) = stats(d => d._1 / 50)
    val (nfR, ovR) = stats(d => (d._2 - mn) / w)
    val got = run("q188_file_prune_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("natural") == ((nfN, ovN, (nfN - ovN) * 1000000L / nfN)))
    assert(got("range") == ((nfR, ovR, (nfR - ovR) * 1000000L / nfR)))
    // the story the operator exists to tell
    assert(got("range")._3 > got("natural")._3,
      "range layout must prune more than natural")
  }
}
