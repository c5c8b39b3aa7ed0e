package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the round-10 analytics family (q138-q143):
  * independent Scala recomputation from the raw sf0.001 corpus (the
  * CleaningQuerySpec pattern — the DuckDB oracle proves engine parity,
  * these pin the SEMANTICS so a same-wrong-both-sides bug can't hide).
  */
class AnalyticsQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  private lazy val rawDocs: Map[Long, (String, String)] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  private lazy val embs: Map[Long, Array[Double]] =
    graft.catalog.Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def hm(id: Long): Long =
    ((((id % 1000003) + 1000003) % 1000003 * 2654435761L + 40503) % 1000 + 1000) % 1000

  private def split(id: Long): String =
    if (hm(id) < 980) "train" else if (hm(id) < 990) "val" else "test"

  // ------------------------------------------------------------------
  test("q139 PageRank matches a sequential 3-iteration recompute; mass is conserved up to floor loss") {
    val edges = rawDocs.keys.toSeq
      .map(id => (id % 32, (id * 7 + 3) % 32)).filter { case (s, d) => s != d }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ow = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = ow.keys.toSeq.sorted
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to 3).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case ((s, d), w) => in(d) += r(s) * w / ow(s) }
      r = nodes.map(n => n -> (150000L + 85L * in(n) / 100L)).toMap
    }
    val got = run("q139_link_pagerank").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach(n => assert(got(n) == (ow(n), r(n)), s"node $n"))
    // per-node rank formulation: total mass stays within floor-division
    // loss of N * 1e6 (each iteration floors once per edge + once per node)
    val total = r.values.sum
    val n = nodes.size.toLong
    assert(total <= n * 1000000L && total > n * 1000000L - 3 * (edges.size + n) * 100L,
      s"mass $total vs ${n * 1000000L}")
  }

  // ------------------------------------------------------------------
  test("q140 CDC chunking matches a direct recompute; boundaries are content-defined") {
    case class Chunk(source: String, fp: String, n: Long)
    val chunks = rawDocs.toSeq.flatMap { case (_, (text, src)) =>
      val t = toks(text)
      val bufAll = scala.collection.mutable.ArrayBuffer.empty[Chunk]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      t.foreach { tok =>
        cur += tok
        if (md5hex(tok).startsWith("0")) {
          bufAll += Chunk(src, md5hex(cur.mkString(" ")), cur.size.toLong)
          cur.clear()
        }
      }
      if (cur.nonEmpty) bufAll += Chunk(src, md5hex(cur.mkString(" ")), cur.size.toLong)
      bufAll
    }
    val expect = chunks.groupBy(_.source).map { case (src, cs) =>
      val n = cs.size.toLong
      val nd = cs.map(_.fp).distinct.size.toLong
      src -> (n, nd, (n - nd) * 1000 / n, cs.map(_.n).sum * 1000 / n)
    }
    val got = run("q140_cdc_chunks").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    // content-defined property: a prefix insertion re-chunks only the
    // chunk it lands in — every boundary after the first post-insertion
    // cut point is unchanged (the whole point vs fixed-stride q132)
    val t = toks(rawDocs.values.head._1)
    def cutFps(ts: Array[String]): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      ts.foreach { tok =>
        cur += tok
        if (md5hex(tok).startsWith("0")) { out += md5hex(cur.mkString(" ")); cur.clear() }
      }
      if (cur.nonEmpty) out += md5hex(cur.mkString(" "))
      out.toList
    }
    val shifted = cutFps(Array("INSERTED", "TOKENS") ++ t)
    val base = cutFps(t)
    assert(base.drop(1) == shifted.drop(shifted.size - (base.size - 1)),
      "all chunks after the first boundary must survive a prefix insertion")
  }

  // ------------------------------------------------------------------
  test("q141 hard negatives match a brute-force different-source top-5") {
    val qids = Seq(0L, 3L, 7L, 11L, 19L, 23L, 31L, 42L)
    val expect = qids.flatMap { qid =>
      val (qe, qsrc) = (embs(qid), rawDocs(qid)._2)
      embs.toSeq
        .filter { case (id, _) => id != qid && rawDocs(id)._2 != qsrc }
        .map { case (id, e) => (id, dot(qe, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, s), i) =>
          (qid, (i + 1).toLong) -> (id, rawDocs(id)._2, round6(s)) }
    }.toMap
    val got = run("q141_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (id, src, s)) =>
      val (eid, esrc, es) = expect(k)
      assert(id == eid && src == esrc && math.abs(s - es) < 2e-6, s"$k")
    }
    // the mined negative really is from a different source than its anchor
    got.foreach { case ((qid, _), (_, src, _)) =>
      assert(src != rawDocs(qid)._2)
    }
  }

  // ------------------------------------------------------------------
  test("q142 median/MAD/outliers match a direct recompute") {
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.size - 1) / 2) // min v with 2*cum(v) >= n
    }
    val bySrc = rawDocs.values.groupBy(_._2)
      .view.mapValues(_.map(d => toks(d._1).length.toLong).toSeq).toMap
    val expect = bySrc.map { case (src, vs) =>
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      src -> (vs.size.toLong, med, mad,
        devs.count(_ > math.max(mad, 1L) * 5).toLong)
    }
    val got = run("q142_robust_outliers").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
  }

  // ------------------------------------------------------------------
  test("q143 KS drift matches a direct CDF-gap recompute; ks of the corpus vs itself would be 0") {
    val lens = rawDocs.values.toSeq.map(d => (d._2, toks(d._1).length.toLong))
    val grid = lens.map(_._2).distinct.sorted
    val ng = lens.size.toLong
    val expect = lens.groupBy(_._1).map { case (src, xs) =>
      val ns = xs.size.toLong
      val ks = grid.map { v =>
        val cs = xs.count(_._2 <= v).toLong
        val cg = lens.count(_._2 <= v).toLong
        math.abs(cs * 1000000L / ns - cg * 1000000L / ng)
      }.max
      src -> (ns, ks)
    }
    val got = run("q143_ks_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    // sanity on the statistic itself: identical distributions → ks 0
    val self = grid.map { v =>
      val c = lens.count(_._2 <= v).toLong
      math.abs(c * 1000000L / ng - c * 1000000L / ng)
    }.max
    assert(self == 0L)
  }

  // ------------------------------------------------------------------
  test("q144 snapshot diff matches a direct two-version recompute; counts partition the corpus") {
    def fp(text: String): String =
      md5hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
    val expect = rawDocs.toSeq.groupBy(_._2._2).map { case (src, ds) =>
      val rows = ds.map { case (id, (text, _)) =>
        val f2 = fp(if (id % 13 == 5) text + " recrawled" else text)
        val f1 = if (id % 10 != 7) Some(fp(text)) else None
        (f1, f2)
      }
      src -> (rows.size.toLong,
        rows.count(_._1.isEmpty).toLong,
        rows.count(r => r._1.exists(_ != r._2)).toLong,
        rows.count(r => r._1.contains(r._2)).toLong)
    }
    val got = run("q144_snapshot_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    // added + changed + unchanged covers every v2 doc exactly once
    got.values.foreach { case (n, a, c, u) => assert(a + c + u == n) }
  }

  // ------------------------------------------------------------------
  test("q145 distribution match reproduces the acceptance arithmetic and moves the mix toward target") {
    val byLang = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nl = byLang.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = byLang.length.toLong
    val ranked = nl.keys.toSeq.sorted.zipWithIndex.toMap
    val targetPpm = ranked.view.mapValues(i => Seq(400000L, 300000L, 200000L, 100000L)(i % 4)).toMap
    val rate = nl.map { case (l, n) =>
      l -> math.min(1000L, targetPpm(l) * nt / (1000L * n))
    }
    val expect = byLang.groupBy(_._2).map { case (l, ds) =>
      l -> (rate(l), ds.size.toLong, ds.count(d => hm(d._1) < rate(l)).toLong)
    }
    val got = run("q145_distribution_match").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // rebalancing direction: every over-represented language is cut
    // (rate < 1000) and every at-or-under-target one is kept whole
    nl.keys.foreach { l =>
      val over = nl(l) * 1000000L / nt > targetPpm(l)
      assert((rate(l) < 1000L) == over, s"$l rate ${rate(l)}")
    }
  }

  // ------------------------------------------------------------------
  test("q146 rare-group suppression matches a direct octile recompute") {
    val docs = rawDocs.toSeq.map { case (id, (text, src)) => (id, src, toks(text).length.toLong) }
    val langOf = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nt = docs.size.toLong
    val grid = docs.map(_._3).groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val cum = grid.scanLeft(0L)(_ + _._2).tail
    val octOf = grid.map(_._1).zip(cum).map { case (v, c) =>
      v -> math.min(7L, (c * 8 - 1) / nt)
    }.toMap
    val bucketed = docs.map { case (id, src, v) => (langOf(id), src, octOf(v)) }
    val sizes = bucketed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = bucketed.groupBy(b => (b._1, b._2)).map { case ((l, s), bs) =>
      (l, s) -> (bs.size.toLong,
        bs.count(b => sizes(b) < 5).toLong,
        bs.filter(b => sizes(b) < 5).map(_._3).distinct.size.toLong)
    }
    val got = run("q146_rare_group_suppress").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
  }

  // ------------------------------------------------------------------
  test("q147 tokenizer fertility matches a direct regex recompute; fertility >= 1 word-for-word") {
    val pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    val punct = "[^a-zA-Z0-9\\s]".r
    val langOf = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = rawDocs.toSeq.groupBy(d => langOf(d._1)).map { case (l, ds) =>
      val words = ds.map(d => toks(d._2._1).length.toLong).sum
      val sub = ds.map(d => pat.findAllIn(d._2._1).size.toLong).sum
      val np = ds.map(d => punct.findAllIn(d._2._1).size.toLong).sum
      val nc = ds.map(d => pat.findAllIn(d._2._1).mkString("").length.toLong).sum
      l -> (ds.size.toLong, words, sub,
        sub * 1000000 / words, np * 1000000 / sub, nc * 1000 / sub)
    }
    val got = run("q147_tokenizer_fertility").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expect)
    // a whitespace word yields >= 1 subword, so fertility_ppm >= 1e6
    got.values.foreach { case (_, _, _, f, _, _) => assert(f >= 1000000L) }
  }

  // ------------------------------------------------------------------
  test("q148 shard balance matches a direct recompute; shares sum to ~1e6 and devs to ~0") {
    val byShard = rawDocs.toSeq
      .map { case (id, (text, _)) =>
        ((hm2(id) % 8), toks(text).length.toLong)
      }.groupBy(_._1)
    val tt = byShard.values.flatten.map(_._2).sum
    val expect = byShard.map { case (sh, xs) =>
      val toksSum = xs.map(_._2).sum
      sh -> (xs.size.toLong, toksSum, toksSum * 1000000 / tt,
        toksSum * 1000000 / tt - 125000L)
    }
    val got = run("q148_shard_balance").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    val shareSum = got.values.map(_._3).sum
    assert(shareSum > 1000000L - 8 && shareSum <= 1000000L, s"shares $shareSum")
    val devSum = got.values.map(_._4).sum
    assert(devSum > -8 && devSum <= 0, s"devs $devSum")
  }

  private def hm2(id: Long): Long =
    ((((id % 1000003) + 1000003) % 1000003 * 2654435761L + 40503) % 1000003 + 1000003) % 1000003

  // ------------------------------------------------------------------
  test("q149 bloom join pruning matches a direct recompute and never misses a true match") {
    def hv32(s: String): Long =
      md5hex(s).take(8).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
    def buckets(k: String): Seq[Long] = (0 until 3).map(j => hv32(s"$k:$j") % 1024)
    val orders = graft.catalog.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val urgent = orders.filter(_._2 == "1-URGENT").map(_._1.toString).toSet
    val bloomBits = urgent.flatMap(buckets)
    val li = graft.catalog.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0).toString)
    val rows = li.map { k =>
      val bp = buckets(k).forall(bloomBits.contains)
      val tr = urgent.contains(k)
      (bp, tr)
    }
    val nRows = rows.length.toLong
    val nPass = rows.count(_._1).toLong
    val nTrue = rows.count(_._2).toLong
    val nFp = rows.count(r => r._1 && !r._2).toLong
    val got = run("q149_bloom_join_prune").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((nRows, nPass, nTrue, nFp)))
    assert(got.getBoolean(4), "bloom must never miss a true match")
    assert(got.getLong(5) == nFp * 1000000 / (nRows - nTrue))
    assert(rows.forall(r => !r._2 || r._1), "recompute: no false negatives")
  }

  // ------------------------------------------------------------------
  test("q150 hourly-merged HLL registers equal the direct daily sketch; estimate lands near exact") {
    val rows = run("q150_hll_merge").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"day ${r.getString(0)}: merged != direct registers")
      val (est, exact) = (r.getLong(4), r.getLong(5))
      // 256 registers -> ~6.5% relative error; allow 4 sigma
      assert(math.abs(est - exact).toDouble / exact < 0.26,
        s"day ${r.getString(0)}: est $est vs exact $exact")
    }
    // independent recompute of one day's registers from raw events
    val ev = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("date_format(to_date(ts), 'yyyy-MM-dd') as day",
        "cast(user_id as string) as u").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val day0 = rows.head.getString(0)
    def hv32(s: String): Long =
      md5hex(s).take(8).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
    val users = ev.filter(_._1 == day0).map(_._2).distinct
    def bitlen(x: Long): Int =
      if (x == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)
    val regs = users.map(hv32).groupBy(_ % 256).view
      .mapValues(vs => vs.map(hv => 25 - bitlen(hv / 256)).max).toMap
    // bit-length recompute sanity: register count matches zero_regs
    val got0 = rows.find(_.getString(0) == day0).get
    assert(256L - regs.size == got0.getLong(3), "zero register count")
    assert(users.size.toLong == got0.getLong(5), "exact distinct")
  }

  // ------------------------------------------------------------------
  test("q138 semantic leakage matches a recomputed bucket join; candidates share the signature") {
    val planes = graft.operators.SimilarityOps.hyperplanes(8, 64, seed = 1337L)
    def sig(e: Array[Double]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (dot(e, p) > 0) 1L << i else 0L
      }.sum
    val sigs = embs.view.mapValues(sig).toMap
    val train = embs.keys.filter(split(_) == "train").toSeq
    val expect = embs.keys.filterNot(split(_) == "train").map { id =>
      val cands = train.filter(t => sigs(t) == sigs(id))
      val maxSim =
        if (cands.isEmpty) None
        else Some(round6(cands.map(t => dot(embs(id), embs(t))).max))
      (split(id), id) -> (cands.size.toLong, maxSim)
    }.toMap
    val got = run("q138_semantic_leakage").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (n, s)) =>
      val (en, es) = expect(k)
      assert(n == en, s"$k candidates")
      (s, es) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6, s"$k sim")
        case (a, b) => assert(a == b, s"$k sim presence")
      }
    }
  }

  // ------------------------------------------------------------------
  test("q155 HITS matches a sequential 2-iteration recompute; flow normalization conserves mass up to floor loss") {
    val edges = rawDocs.keys.toSeq
      .map(id => (id % 32, (id * 7 + 3) % 32)).filter { case (s, d) => s != d }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ow = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val iw = edges.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nodes = (ow.keySet ++ iw.keySet).toSeq.sorted
    def authStep(h: Map[Long, Long]): Map[Long, Long] = {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case ((s, d), w) => acc(d) += h(s) * w / ow(s) }
      nodes.map(n => n -> acc(n)).toMap
    }
    def hubStep(a: Map[Long, Long]): Map[Long, Long] = {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case ((s, d), w) => acc(s) += a(d) * w / iw(d) }
      nodes.map(n => n -> acc(n)).toMap
    }
    val h0 = nodes.map(_ -> 1000000L).toMap
    val a2 = authStep(hubStep(authStep(h0)))
    val h2 = hubStep(authStep(hubStep(authStep(h0))))
    val got = run("q155_hits_centrality").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n =>
      val (o, i, a, h) = got(n)
      assert(o == ow.getOrElse(n, 0L) && i == iw.getOrElse(n, 0L), s"node $n weights")
      assert(a == a2(n), s"node $n auth")
      assert(h == h2(n), s"node $n hub")
    }
    // each flow step loses at most one unit per edge to the floor
    val mass0 = nodes.size * 1000000L
    assert(a2.values.sum <= mass0 && a2.values.sum > mass0 - 3 * edges.size)
    assert(h2.values.sum <= mass0 && h2.values.sum > mass0 - 4 * edges.size)
  }

  // ------------------------------------------------------------------
  test("q156 Heaps growth matches a sequential checkpoint recompute; beta in a sane range") {
    val mx = rawDocs.keys.max
    val bySource = rawDocs.toSeq.map { case (id, (text, src)) =>
      (src, id, toks(text))
    }.groupBy(_._1)
    val got = run("q156_heaps_growth").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, ds) =>
      val firstSeen = ds.flatMap { case (_, id, tk) => tk.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val pts = (1 to 8).flatMap { j =>
        val v = firstSeen.values.count(_ * 8 <= mx * j).toLong
        val t = ds.filter(_._2 * 8 <= mx * j).map(_._3.length.toLong).sum
        if (v > 0 && t > 0)
          Some((math.floor(math.log(t.toDouble) * 1000).toLong,
            math.floor(math.log(v.toDouble) * 1000).toLong, v, t))
        else None
      }.distinct
      val n = pts.size.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
      val den = n * sxx - sx * sx
      val beta = if (den > 0) math.max(n * sxy - sx * sy, 0L) * 1000 / den else 0L
      val (gn, gv, gt, gb) = got(src)
      assert(gn == n, s"$src n_pts")
      assert(gv == pts.map(_._3).max, s"$src vocab_final")
      assert(gt == pts.map(_._4).max, s"$src tokens_final")
      assert(gb == beta, s"$src beta_milli")
      assert(beta >= 0 && beta <= 1000, s"$src beta range")
    }
  }

  // ------------------------------------------------------------------
  test("q161 skyline equals the brute-force dominance recompute") {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def qm(text: String): Long = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      math.floor((math.min(1.0, ntok / 50.0) * 0.5 +
        (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2) * 1000).toLong
    }
    val pts = rawDocs.toSeq.map { case (id, (text, _)) =>
      (id, text.trim.split("\\s+").length.toLong, qm(text))
    }
    // brute force: p undominated iff no p' with len' <= len, q' >= q,
    // strict somewhere
    val sky = pts.filter { case (_, l, q) =>
      !pts.exists { case (_, l2, q2) =>
        l2 <= l && q2 >= q && (l2 < l || q2 > q)
      }
    }
    val exp = sky.groupBy(p => (p._2, p._3)).map { case (k, ps) =>
      k -> (ps.size.toLong, ps.map(_._1).min)
    }
    val got = run("q161_pareto_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == exp)
  }

  // ------------------------------------------------------------------
  test("q162 SCD-2 intervals equal a sequential change-capture recompute; intervals tile each user's history") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "date_format(to_date(ts), 'yyyy-MM-dd') as day",
        "unix_micros(cast(ts as timestamp)) as tsu", "event_id",
        "cast(floor(value * 1000) as long) as vm")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val exp = evs.groupBy(_._1).flatMap { case (u, es) =>
      val daily = es.groupBy(_._2).toSeq.map { case (day, ds) =>
        day -> ds.maxBy(e => (e._3, e._4))._5
      }.sortBy(_._1)
      val changes = daily.zip(Option.empty[Long] +: daily.map(d => Some(d._2)))
        .collect { case ((day, v), pv) if !pv.contains(v) => (day, v) }
      changes.zipAll(changes.drop(1).map(_._1), ("", 0L), "9999-12-31")
        .map { case ((from, v), to) => (u, from, to, v) }
    }.toSet
    val got = run("q162_scd2_intervals").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == exp)
    // intervals tile: per user, valid_from values strictly increase and
    // each valid_to equals the next valid_from (last one open)
    got.groupBy(_._1).foreach { case (u, is) =>
      val sorted = is.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 == b._2, s"user $u gap")
        case _ =>
      }
      assert(sorted.last._3 == "9999-12-31", s"user $u open interval")
    }
  }

  // ------------------------------------------------------------------
  test("q163 attribution matches a sequential last-click recompute") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ep",
        "cast(floor(value * 1000) as long) as vm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val exp = evs.groupBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._4, e._2))
      var lastClick = Option.empty[Long]
      val purchases = ordered.flatMap { e =>
        val r = if (e._3 == "purchase")
          Some((lastClick.exists(c => e._4 - c <= 86400000000L), e._5))
        else None
        if (e._3 == "click") lastClick = Some(e._4)
        r
      }
      if (purchases.isEmpty) None
      else Some(u -> (purchases.size.toLong,
        purchases.count(_._1).toLong,
        purchases.collect { case (true, v) => v }.sum))
    }
    val got = run("q163_attribution").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == exp)
  }

  // ------------------------------------------------------------------
  test("q164 FK integrity matches set-difference orphan counts") {
    def keys(tbl: String, col: String): Seq[Long] =
      graft.catalog.Tables.t(spark, sf, tbl)
        .selectExpr(s"cast($col as long)").collect()
        .map(_.getLong(0)).toSeq
    val exp = Map(
      "lineitem->orders" ->
        (keys("lineitem", "l_orderkey"),
          keys("orders", "o_orderkey").toSet),
      "orders->customer" ->
        (keys("orders", "o_custkey"), keys("customer", "c_custkey").toSet),
      "customer->nation" ->
        (keys("customer", "c_nationkey"),
          keys("nation", "n_nationkey").toSet))
    val got = run("q164_fk_integrity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (edge, (child, parents)) =>
      val orphans = child.count(k => !parents.contains(k)).toLong
      val (gn, go, gp) = got(edge)
      assert(gn == child.size.toLong, s"$edge n_child")
      assert(go == orphans, s"$edge orphans")
      assert(gp == orphans * 1000000 / child.size, s"$edge ppm")
    }
  }

  // ------------------------------------------------------------------
  test("q167 SCD-2 probe: every purchase resolves to exactly one interval, and the value is the user's last observed daily value on that day") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "date_format(to_date(ts), 'yyyy-MM-dd') as day",
        "unix_micros(cast(ts as timestamp)) as tsu",
        "cast(floor(value * 1000) as long) as vm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    val got = run("q167_scd2_probe").collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getString(2), r.getLong(3))))
    // exactly one row per purchase event
    val purchases = evs.filter(_._3 == "purchase")
    assert(got.length == purchases.length)
    assert(got.map(_._1).distinct.length == got.length, "duplicate probe rows")
    // the dimension value is the last-observed daily value at <= day:
    // daily last-wins per (user, day), then the latest day <= probe day
    val dailyLast: Map[(Long, String), Long] = evs.groupBy(e => (e._1, e._4))
      .map { case (k, es) => k -> es.maxBy(e => (e._5, e._2))._6 }
    val gotMap = got.toMap
    purchases.foreach { case (u, eid, _, day, _, _) =>
      val expVm = dailyLast.filter { case ((uu, dd), _) => uu == u && dd <= day }
        .maxBy(_._1._2)._2
      val (gu, gday, gvm) = gotMap(eid)
      assert(gu == u && gday == day, s"probe row mismatch for event $eid")
      assert(gvm == expVm, s"event $eid: dim value $gvm != expected $expVm")
    }
  }

  // ------------------------------------------------------------------
  test("q168 triangle counts equal brute-force enumeration; clustering is the floor-ppm local coefficient") {
    val ids = rawDocs.keys.toSeq
    val und = (ids.map(i => (i % 48, (i * 7 + 5) % 48)) ++
      ids.map(i => (i % 48, (i * 11 + 3) % 48)) ++
      ids.map(i => ((i * 5 + 1) % 48, (i * 13 + 7) % 48)))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (u min v, u max v) }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var total = 0L
    val nodes = adj.keys.toSeq.sorted
    for {
      a <- nodes; b <- adj(a).toSeq.sorted if b > a
      c <- adj(a).toSeq.sorted if c > b && adj(b).contains(c)
    } {
      total += 1
      Seq(a, b, c).foreach(n => triPerNode(n) += 1)
    }
    val got = run("q168_triangle_count").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == adj.keySet)
    assert(got.values.map(_._2).sum == 3 * total, "corner identity")
    got.foreach { case (n, (deg, tri, cl)) =>
      assert(deg == adj(n).size.toLong, s"node $n degree")
      assert(tri == triPerNode(n), s"node $n triangles")
      val expCl = if (deg > 1) 2 * tri * 1000000L / (deg * (deg - 1)) else 0L
      assert(cl == expCl, s"node $n clustering")
    }
  }

  // ------------------------------------------------------------------
  test("q169 Markov transitions match a sequential recompute; each row's probabilities sum to ~1e6") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._2)).map(_._3)
      o.zip(o.drop(1))
    }
    val exp = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q169_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, n) => assert(got(k)._1 == n, s"$k count") }
    // floor-ppm rows sum to 1e6 minus at most (fanout - 1)
    got.keys.groupBy(_._1).foreach { case (from, ks) =>
      val s = ks.toSeq.map(got(_)._2).sum
      assert(s <= 1000000L && s > 1000000L - ks.size, s"$from prob mass $s")
    }
  }

  // ------------------------------------------------------------------
  test("q173 basket lift matches a direct pair recompute; lift formula verified per pair") {
    val baskets = graft.catalog.Tables.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey % 100 as item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairN = baskets.groupBy(_._1).values.toSeq.flatMap { is =>
      val s = is.map(_._2).sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    val got = run("q173_basket_lift").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == pairN.keySet)
    got.foreach { case ((a, b), (nab, na, nb, supp, conf, lift)) =>
      assert(nab == pairN((a, b)))
      assert(na == itemN(a) && nb == itemN(b))
      assert(supp == nab * 1000000L / nOrders)
      assert(conf == nab * 1000000L / na)
      val expLift = math.floor(
        nab.toDouble * nOrders.toDouble / (na.toDouble * nb.toDouble) * 1000)
        .toLong
      assert(lift == expLift, s"($a,$b) lift")
    }
  }

  // ------------------------------------------------------------------
  test("q174 A/B readout matches a sequential recompute of the first-day-purchase rate and z") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val per = evs.groupBy(_._1).toSeq.map { case (u, es) =>
      val ep0 = es.map(_._3).min
      val conv = es.exists(e => e._2 == "purchase" && e._3 <= ep0 + 86400000000L)
      val variant = ((u % 1000003) * 2654435761L + 40503) % 2
      (variant, if (conv) 1L else 0L)
    }.toSeq
    val (na, ka) = (per.count(_._1 == 0L).toLong,
      per.filter(_._1 == 0L).map(_._2).sum)
    val (nb, kb) = (per.count(_._1 == 1L).toLong,
      per.filter(_._1 == 1L).map(_._2).sum)
    val r = run("q174_ab_readout").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((na, ka, nb, kb)))
    assert(r.getLong(4) == ka * 1000000L / na)
    assert(r.getLong(5) == kb * 1000000L / nb)
    val pp = (ka + kb).toDouble / (na + nb).toDouble
    val z = (ka.toDouble / na.toDouble - kb.toDouble / nb.toDouble) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    val expZ = if (ka + kb == 0 || ka + kb == na + nb) 0L
      else math.floor(z * 1000).toLong
    assert(r.getLong(6) == expZ)
  }

  // ------------------------------------------------------------------
  test("q178 seasonality matches a direct recompute; per-type shares sum to ~1e6 and indices average ~1e6") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(cast(ts as timestamp)) as ep")
      .collect().map(r => (r.getString(0), r.getLong(1) / 3600000000L % 24))
    val cnt = evs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = evs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("q178_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == cnt.keySet)
    got.foreach { case ((ty, h), (n, share, idx)) =>
      assert(n == cnt((ty, h)))
      assert(share == n * 1000000L / tot(ty))
      assert(idx == n * 24 * 1000000L / tot(ty))
    }
    got.keys.groupBy(_._1).foreach { case (ty, ks) =>
      val s = ks.toSeq.map(got(_)._2).sum
      assert(s <= 1000000L && s > 1000000L - 24, s"$ty share mass")
    }
  }

  // ------------------------------------------------------------------
  test("q179 golden record equals a sequential last-wins merge per stream") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "event_id",
        "unix_micros(cast(ts as timestamp)) as ep",
        "cast(get_json_object(props, '$.k') as long) as k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val types = Seq("view", "click", "purchase", "signup", "error")
    val exp = evs.groupBy(_._1).map { case (u, es) =>
      val latest = es.groupBy(_._2).view.mapValues(
        _.maxBy(e => (e._4, e._3))._5.getOrElse(-1L)).toMap
      u -> (latest.size.toLong, types.map(latest.getOrElse(_, -1L)))
    }
    val got = run("q179_golden_record").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
  }

  // ------------------------------------------------------------------
  test("q180 mass quantiles match a direct weighted-CDF recompute; p90 >= p50 and both cover the stated mass") {
    val langs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
    val got = run("q180_mass_quantiles").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val byLang = langs.groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, ds) =>
      val total = ds.map(_._2).sum
      val grid = ds.groupBy(_._2).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      def q(p: Long): Long = {
        var cum = 0L
        grid.find { case (_, m) => cum += m; cum * 10 >= total * p }.get._1
      }
      val (gt, g50, g90) = got(lang)
      assert(gt == total, s"$lang total")
      assert(g50 == q(5), s"$lang p50")
      assert(g90 == q(9), s"$lang p90")
      assert(g90 >= g50)
    }
  }

  // ------------------------------------------------------------------
  test("q181 skew report matches a direct frequency recompute") {
    val freqs = graft.catalog.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val nKeys = freqs.size.toLong
    val nRows = freqs.sum
    val maxF = freqs.max
    val sorted = freqs.sorted
    def pct(p: Long): Long = {
      var cum = 0L
      sorted.distinct.find { f =>
        cum = sorted.count(_ <= f).toLong; cum * 100 >= nKeys * p
      }.get
    }
    val r = run("q181_skew_report").collect().head
    assert(r.getLong(0) == nKeys)
    assert(r.getLong(1) == nRows)
    assert(r.getLong(2) == maxF)
    assert(r.getLong(3) == pct(50))
    assert(r.getLong(4) == pct(99))
    assert(r.getLong(5) == maxF * 1000000L / nRows)
    assert(r.getLong(6) == maxF * nKeys * 1000L / nRows)
  }

  // ------------------------------------------------------------------
  test("q182 upsert merge applies delete > upsert precedence and tracks provenance") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val base = docs.filter(_._1 % 3 != 0).toMap
    val delta = docs.filter(d => d._1 % 5 == 0 || d._1 % 4 == 0 || d._1 % 3 == 0)
      .map { case (id, nc) =>
        id -> (if (id % 5 == 0) ("delete", 0L) else ("upsert", nc + 1000))
      }.toMap
    val exp = (base.keySet ++ delta.keySet).flatMap { id =>
      delta.get(id) match {
        case Some(("delete", _)) => None
        case Some(("upsert", v1)) =>
          Some(id -> (v1, if (base.contains(id)) "updated" else "inserted"))
        case _ => Some(id -> (base(id), "base"))
      }
    }.toMap
    val got = run("q182_upsert_merge").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == exp)
    // deleted ids are truly absent
    assert(!got.keySet.exists(id => id % 5 == 0))
  }

  // ------------------------------------------------------------------
  test("q183 trend slope equals the closed-form least-squares recompute") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    def qm(text: String): Long = {
      val ntok = text.trim.split("\\s+").length.toDouble
      val alpha = text.replaceAll("[^a-z]", "").length.toDouble
      val stop = stopRe.findAllIn(text).size.toDouble
      math.floor((math.min(1.0, ntok / 50.0) * 0.5 +
        (alpha / text.length) * 0.3 +
        math.min(1.0, stop / 10.0) * 0.2) * 1000).toLong
    }
    val exp = docs.groupBy(_._3).map { case (src, ds) =>
      val minId = ds.map(_._1).min
      val pts = ds.map(d => (d._1 - minId, qm(d._2)))
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      val slope = if (den == 0) 0L
        else math.floor((n * sxy - sx * sy).toDouble / den.toDouble * 1e9)
          .toLong
      src -> (n, slope)
    }
    val got = run("q183_trend_slope").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  // ------------------------------------------------------------------
  test("q185 lateness histogram matches a sequential arrival-order recompute; cum reaches 1e6") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id",
        "unix_micros(cast(ts as timestamp)) as ep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lates = evs.groupBy(_._1).values.flatMap { es =>
      val byArr = es.map { case (_, eid, ep) =>
        val d = ((eid % 1000003) * 2654435761L + 40503) % 7200
        (ep + d * 1000000L, eid, ep)
      }.sortBy(e => (e._1, e._2))
      var mx = Long.MinValue
      byArr.map { case (_, _, ep) =>
        mx = math.max(mx, ep)
        math.min((mx - ep) / 60000000L, 60L)
      }
    }.toSeq
    val exp = lates.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q185_lateness_histogram").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (b, n) => assert(got(b)._1 == n, s"bucket $b") }
    val total = lates.size.toLong
    var cum = 0L
    got.keys.toSeq.sorted.foreach { b =>
      cum += got(b)._1
      assert(got(b)._2 == cum * 1000000L / total, s"bucket $b cum")
    }
    assert(got(got.keys.max)._2 == 1000000L)
  }

  // ------------------------------------------------------------------
  test("q187 nearest as-of picks the closer of last-before and first-after, ties to the earlier click") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val exp = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val clicks = es.filter(_._3 == "click").map(e => (e._4, e._2))
        .sortBy(identity)
      es.filter(_._3 == "error").map { case (_, eid, _, ep) =>
        // "before" = click at or before the error in (ts, tag, id)
        // order: clicks tie-break BEFORE errors at equal ts
        val before = clicks.filter(c => c._1 <= ep).lastOption
        val after = clicks.filter(c => c._1 > ep).headOption
        val (cid, delta) = (before, after) match {
          case (None, None) => (-1L, 0L)
          case (Some((ts, id)), None) => (id, ts - ep)
          case (None, Some((ts, id))) => (id, ts - ep)
          case (Some((pts, pid)), Some((nts, nid))) =>
            if (nts - ep < ep - pts) (nid, nts - ep) else (pid, pts - ep)
        }
        (u, eid) -> (cid, delta)
      }
    }.toMap
    val got = run("q187_asof_nearest").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == exp)
  }

  // ------------------------------------------------------------------
  test("q189 top paths equal a sequential sessionize-and-count recompute") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = evs.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._4, e._2))
      var sid = 0L
      var prev = Option.empty[Long]
      val withSid = o.map { e =>
        if (prev.forall(p => e._4 - p > 1800000000L)) sid += 1
        prev = Some(e._4)
        (sid, e._3)
      }
      withSid.groupBy(_._1).values.flatMap { ss =>
        val ts = ss.map(_._2)
        ts.sliding(3).filter(_.size == 3).map(_.mkString(">"))
      }
    }.toSeq
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val top10 = counts.sortBy { case (p, n) => (-n, p) }.take(10).toMap
    val got = run("q189_path_mining").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == top10)
  }

  // ------------------------------------------------------------------
  test("q190 WoW growth matches a direct recompute with truncation-toward-zero semantics on negative growth") {
    val evs = graft.catalog.Tables.t(spark, sf, "events")
      .selectExpr("event_type",
        "unix_micros(cast(ts as timestamp)) div 604800000000 as week",
        "cast(floor(value * 1000) as long) as vm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def g(cur: Long, prev: Option[Long]): Long = prev match {
      case None | Some(0L) => 0L
      case Some(p) =>
        if (cur >= p) (cur - p) * 1000 / p else -((p - cur) * 1000 / p)
    }
    val exp = evs.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((ty, wk), es) => (ty, wk, es.size.toLong, es.map(_._3).sum) }
      .groupBy(_._1).flatMap { case (_, wks) =>
        val s = wks.sortBy(_._2)
        s.zip(None +: s.map(Some(_))).map { case ((ty, wk, n, v), p) =>
          (ty, wk) -> (n, v, g(n, p.map(_._3)), g(v, p.map(_._4)))
        }
      }
    val got = run("q190_wow_growth").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == exp)
    // the signed branch is actually exercised on this data
    assert(got.values.exists(_._3 < 0), "expected at least one negative growth")
  }
}
