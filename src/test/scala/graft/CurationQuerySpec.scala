package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the round-5 curation additions (q77-q81): each
  * query's result is cross-checked against an independent Scala
  * recomputation from the raw sf0.001 corpus (the oracle equivalence is
  * separately enforced by the driver's DuckDB gate; these tests pin the
  * SEMANTICS so a same-wrong-both-sides oracle bug can't hide).
  */
class CurationQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (doc_id, whitespace tokens) for the whole sf0.001 corpus. */
  private lazy val rawDocs: Map[Long, String] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  test("q78 gopher flags match a direct recomputation; pass is the conjunction") {
    val got = run("q78_gopher_filter").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got.keySet == rawDocs.keySet)
    rawDocs.foreach { case (id, text) =>
      val t = toks(text)
      val n = t.length.toLong
      val wc = text.replaceAll("\\s", "").length.toLong
      val syms = text.replaceAll("[A-Za-z0-9\\s]", "").length.toLong
      val stop = "\\b(the|a|of|and|to)\\b".r.findAllIn(text).size
      val okN = n >= 50 && n <= 100000
      val okW = n * 3 <= wc && wc <= n * 10
      val okS = syms * 10 <= text.length
      val okT = stop >= 2
      assert(got(id) == ((n, okN, okW, okS, okT, okN && okW && okS && okT)),
        s"doc $id")
    }
  }

  test("q79 OOV rates match a direct top-50 vocabulary recomputation") {
    val tf = rawDocs.toSeq.flatMap { case (id, text) =>
      toks(text).map(tok => (id, tok))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocabCnt = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val vocab = vocabCnt.toSeq.sortBy { case (tok, c) => (-c, tok) }
      .take(50).map(_._1).toSet
    val got = run("q79_vocab_oov").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == rawDocs.keySet)
    rawDocs.foreach { case (id, text) =>
      val t = toks(text)
      val nOov = t.count(!vocab.contains(_)).toLong
      assert(got(id) == ((t.length.toLong, nOov, nOov * 1000000L / t.length)),
        s"doc $id")
    }
  }

  test("q80 cutoffs are the exact per-lang interpolated median; kept set matches") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val medians = docs.groupBy(_._2).view.mapValues { rows =>
      val v = rows.map(_._3.toDouble).sorted
      val h = (v.length - 1) * 0.5
      val lo = v(h.toInt)
      lo + (h - h.toInt) * (v(math.ceil(h).toInt) - lo)
    }.toMap
    val want = docs.filter { case (_, lang, nc) => nc >= medians(lang) }
      .map(_._1).toSet
    val got = run("q80_adaptive_threshold").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(got.map(_._1).toSet == want)
    got.foreach { case (id, lang, cutoff) =>
      assert(math.abs(cutoff - medians(lang)) < 1e-6, s"doc $id lang $lang")
    }
  }

  test("q81 bloom has NO false negatives and only boolean-consistent rows") {
    val rows = run("q81_bloom_decontam").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // every exact match must be flagged by the filter — the Bloom guarantee
    rows.filter(_._3).foreach { case (id, might, _) =>
      assert(might, s"false negative on doc $id")
    }
    // the probe side excludes the benchmark slice itself
    rows.foreach { case (id, _, _) => assert(id % 20 != 0) }
  }

  test("q83 top-p selection matches a sequential greedy per-stratum take") {
    // reference: per lang, order docs by (hashMix prio, id), take while
    // mass-before < 90% of the stratum total
    def prio(id: Long): Long = {
      val r = (((id % 1000003L) + 1000003L) % 1000003L * 2654435761L + 40503L)
      ((r % 1000003L) + 1000003L) % 1000003L
    }
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2)).length.toLong))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val total = rows.map(_._3).sum
      val ordered = rows.sortBy { case (id, _, _) => (prio(id), id) }
      var cum = 0L
      ordered.filter { case (_, _, tok) =>
        val before = cum; cum += tok; before * 1000 < total * 900
      }.map(_._1).toSeq
    }.toSet
    val got = run("q83_topp_select").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("q84 split assignment is the hashMix partition and covers every doc") {
    def hm(id: Long): Long = {
      val r = (((id % 1000003L) + 1000003L) % 1000003L * 2654435761L + 40503L)
      ((r % 1000L) + 1000L) % 1000L
    }
    val got = run("q84_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.keySet == rawDocs.keySet)
    got.foreach { case (id, split) =>
      val want = if (hm(id) < 980) "train" else if (hm(id) < 990) "val" else "test"
      assert(split == want, s"doc $id")
    }
  }

  test("q85 calibration: pr_ppm is monotone in (qmilli, id) within each source") {
    val rows = run("q85_quality_calibrate").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3)))
    assert(rows.map(_._3).toSet == rawDocs.keySet)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val ordered = g.sortBy { case (_, q, id, _) => (q, id) }
      val prs = ordered.map(_._4)
      assert(prs.head == 0L, s"source $src lowest doc must rank 0")
      assert(prs.zip(prs.tail).forall { case (a, b) => a <= b }, s"source $src")
      if (g.length > 1)
        assert(prs.last == 1000000L, s"source $src top rank ${prs.last}")
    }
  }

  test("q86 count-min estimates never underestimate; exact for heavy hitters") {
    val rows = run("q86_countmin_freq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (tok, truth, est) =>
      assert(est >= truth, s"count-min UNDERestimated $tok: $est < $truth")
    }
    // with 768 cells over this vocab, the top tokens should be near-exact
    val relErr = rows.map { case (_, truth, est) =>
      (est - truth).toDouble / truth }
    assert(relErr.max < 1.0, s"heavy-hitter estimates off by ${relErr.max}")
  }

  test("q87 relational HLL lands within the m=256 error envelope") {
    val Array(row) = run("q87_hll_relational").collect()
    val (nExact, zeroRegs, est) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nExact > 0 && est > 0)
    // raw-regime rse at m=256 is ~6.5% (3 sigma ~20%); the linear-
    // counting branch this tiny vocab lands in is tighter still
    val rel = math.abs(est - nExact).toDouble / nExact
    assert(rel < 0.25, s"HLL estimate $est vs exact $nExact (rel err $rel)")
    assert(zeroRegs >= 0 && zeroRegs < 256)
  }

  test("q88 merged partials equal a from-scratch recompute") {
    val got = run("q88_incremental_agg").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // totals across sources must equal corpus totals (stored + delta
    // partials both contributed, nothing double-counted)
    val totDocs = got.values.map(_._1).sum
    val totToks = got.values.map(_._2).sum
    assert(totDocs == rawDocs.size)
    assert(totToks == rawDocs.values.map(t => toks(t).length.toLong).sum)
    got.foreach { case (src, (n, tk, avg)) =>
      assert(avg == tk * 1000000L / n, s"source $src derived avg broken")
    }
  }

  test("q89 funnel counts match a per-user sequential recompute") {
    val ev = graft.catalog.Tables.t(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2) match {
        // parquet ts may surface as LTZ (Timestamp) or NTZ (LocalDateTime)
        // depending on the generator's annotation; epoch under UTC either way
        case t: java.sql.Timestamp => t.getTime
        case d: java.time.LocalDateTime =>
          d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }))
    val byUser = ev.groupBy(_._1)
    def minOf(g: Array[(Long, String, Long)], t: String): Option[Long] = {
      val xs = g.filter(_._2 == t).map(_._3)
      if (xs.isEmpty) None else Some(xs.min)
    }
    var (nv, nvc, nf) = (0L, 0L, 0L)
    byUser.values.foreach { g =>
      val (tv, tc, tp) = (minOf(g, "view"), minOf(g, "click"), minOf(g, "purchase"))
      if (tv.isDefined) {
        nv += 1
        if (tc.exists(_ > tv.get)) {
          nvc += 1
          if (tp.exists(_ > tc.get)) nf += 1
        }
      }
    }
    val Array(row) = run("q89_funnel").collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((byUser.size.toLong, nv, nvc, nf)))
  }

  test("q90 cohort cells sum to per-user active-day totals") {
    val rows = run("q90_retention").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every cohort has an offset-0 cell (the cohort day itself), and the
    // offset-0 user count equals that cohort's size
    val cohortSizes = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(rows.map(_._1).toSet == cohortSizes.keySet,
      "every cohort must include its day-0 cell")
    // cells never exceed the cohort's day-0 population
    rows.foreach { case (c, off, n) =>
      assert(n <= cohortSizes(c), s"cohort $c offset $off has $n > day0 ${cohortSizes(c)}")
      assert(off >= 0)
    }
  }

  test("q101 recovers most planted title corruptions as near-dup pairs") {
    val pairs = run("q101_sorted_neighborhood").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, dist) =>
      assert(a < b && dist >= 0 && dist <= 3)
    }
    // planted: doc_id % 9 == 2 corrupts doc_id-1's title by 2 chars.
    // In-block adjacency can miss a pair when an unrelated title sorts
    // between them, so require >= 70% recall rather than all.
    val planted = rawDocs.keySet.filter(id => id % 9 == 2 && rawDocs.contains(id - 1))
    val found = planted.count(id => pairs.exists {
      case (a, b, _) => a == id - 1 && b == id
    })
    assert(found >= planted.size * 7 / 10,
      s"only $found of ${planted.size} planted pairs recovered")
  }

  test("q95 histogram bins match an exact Scala recompute") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val mn = docs.map(_._2).min
    val mx = docs.map(_._2).max
    val want = docs.groupBy { case (lang, nc) =>
      (lang, math.min(9L, (nc - mn) * 10 / (mx - mn + 1)))
    }.view.mapValues(_.length.toLong).toMap
    val got = run("q95_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("q99 source-overlap matches an exact Scala set recompute") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => toks(d._2)).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size
      if inter > 0
    } yield (a, b) -> (inter.toLong,
      math.floor(inter.toDouble / (vocab(a).size + vocab(b).size - inter)
        * 1000000).toLong)).toMap
    val got = run("q99_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
  }

  test("q103 reports every planted cross-doc excerpt pair, group-specifically") {
    val rows = run("q103_excerpt_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val plantedIds = rawDocs.keySet.filter(id => id % 50 == 3 || id % 50 == 4)
    val plantedPairs = rawDocs.keySet
      .filter(id => id % 50 == 3 && rawDocs.contains(id + 1))
      .map(id => (id, id + 1))
    plantedPairs.foreach { case (a, b) =>
      val hit = rows.find(r => r._1 == a && r._2 == b)
      // the 15-token group-suffixed span contributes all 8 in-span
      // windows at wdf=2 (any corpus size), so same-group pairs carry
      // at least 8 shared windows
      assert(hit.exists(_._3 >= 8),
        s"planted excerpt pair ($a, $b) missing or under-counted: $hit")
    }
    // group-specificity: planted docs from DIFFERENT groups share no
    // planted windows — a broken group seed would surface here as
    // cross-group pairs at the full span count
    rows.foreach { case (a, b, shared) =>
      val crossGroupPlanted = plantedIds.contains(a) && plantedIds.contains(b) &&
        a / 50 != b / 50
      if (crossGroupPlanted)
        assert(shared < 8, s"cross-group planted pair ($a, $b) shares $shared")
    }
  }

  test("q77 planted docs report the shared tail as duplicated windows") {
    val got = run("q77_window_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == rawDocs.keySet)
    got.foreach { case (id, nw, nd, ppm) =>
      assert(nd <= nw)
      if (nw > 0)
        assert(ppm == math.floor(nd.toDouble / nw * 1000000).toLong, s"doc $id")
      // the 12-token planted tail contributes >= 5 wholly-planted windows,
      // shared across all ~1/7 of the corpus — those must be flagged
      if (id % 7 == 3 && nw >= 5)
        assert(nd >= 5, s"planted doc $id reported only $nd dup windows")
    }
    // and some non-planted doc must remain clean (no global false positives)
    assert(got.exists { case (id, _, nd, _) => id % 7 != 3 && nd == 0 })
  }

  test("q106 training order: total, dense per shard, and repartition-invariant") {
    val got = run("q106_training_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every document placed exactly once
    assert(got.map(_._1).toSet == rawDocs.keySet)
    // positions within a shard are dense 0..n-1 (a reader can stream a
    // shard sequentially with no gaps)
    got.groupBy(_._2).values.foreach { s =>
      assert(s.map(_._3).sorted.sameElements(0L until s.length))
    }
    // the order is a pure function of the row: same (shard, pos) after
    // an adversarial repartition of the input
    val again = run("q106_training_order").repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }

  test("q108 tf-idf top-5 matches a direct recomputation") {
    val tf = rawDocs.toSeq.flatMap { case (id, text) =>
      toks(text).map(tok => ((id, tok), 1L))
    }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dfm = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rawDocs.size.toLong
    val expect = tf.toSeq.map { case ((id, tok), c) =>
      (id, tok, c, c * math.floor(math.log(n.toDouble / dfm(tok)) * 1e9).toLong)
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
        .map { case ((id, tok, c, sc), i) => (id, tok, c, sc, i + 1L) }
    }.toSet
    val got = run("q108_tfidf_keywords").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("q112 bm25 top-10 matches a direct recomputation") {
    val tf = rawDocs.toSeq.flatMap { case (id, text) =>
      toks(text).map(tok => ((id, tok), 1L))
    }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dl = tf.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n = rawDocs.size.toLong
    val avgdl = dl.values.sum * 1.0 / n
    val dfm = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val idfN = dfm.map { case (tok, df) =>
      tok -> math.floor(math.log(1 + (n - df + 0.5) / (df + 0.5)) * 1e9).toLong
    }
    val expect = rawDocs.filter(_._1 < 3).flatMap { case (qid, qtext) =>
      val qtoks = toks(qtext).toSet
      val scores = rawDocs.keys.toSeq.flatMap { did =>
        val terms = qtoks.toSeq.flatMap(tok => tf.get((did, tok)).map { c =>
          math.floor(idfN(tok) *
            ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (dl(did) / avgdl))))).toLong
        })
        if (terms.nonEmpty) Some((did, terms.sum)) else None
      }
      scores.sortBy(r => (-r._2, r._1)).take(10).zipWithIndex
        .map { case ((did, s), i) => (qid, did, s, i + 1L) }
    }.toSet
    val got = run("q112_bm25_retrieval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q113 bpe pair top-20 matches a direct per-occurrence recomputation") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    rawDocs.values.foreach { text =>
      toks(text).foreach { tok =>
        if (tok.length >= 2) (0 until tok.length - 1).foreach { i =>
          val p = tok.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
    }
    val expect = counts.toSeq.sortBy(r => (-r._2, r._1)).take(20).zipWithIndex
      .map { case ((p, c), i) => (p, c, i + 1L) }.toSet
    val got = run("q113_bpe_pair_stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("q114 batches are longest-first per shard and stats cover every doc") {
    def mix(id: Long) = ((id % 1000003) * 2654435761L + 40503L) % 1000003
    val docs = rawDocs.toSeq.map { case (id, text) =>
      (id, toks(text).length.toLong, mix(id) % 8)
    }
    val expect = docs.groupBy(_._3).flatMap { case (shard, rows) =>
      rows.sortBy(r => (-r._2, r._1)).grouped(32).zipWithIndex.map {
        case (batch, bi) =>
          val maxT = batch.map(_._2).max
          val sumT = batch.map(_._2).sum
          val n = batch.size.toLong
          val waste = n * maxT - sumT
          (shard, bi.toLong, n, maxT, sumT, waste, waste * 1000000L / (n * maxT))
      }
    }.toSet
    val got = run("q114_length_batching").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    assert(got.toSeq.map(_._3).sum == rawDocs.size)
  }

  test("q115 equals a brute-force cross check on the engine's own signatures") {
    import org.apache.spark.sql.functions._
    val tokRows = graft.catalog.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
    val sigs = graft.operators.DedupOps
      .simhash32FromTokenRows(tokRows, "doc_id", "tok", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bench = sigs.filter(_._1 % 20 == 0)
    val expect = sigs.filter(_._1 % 20 != 0).flatMap { case (id, sc) =>
      val hs = bench.values.map(sb => java.lang.Long.bitCount(sc ^ sb))
        .filter(_ <= 2).toSeq
      if (hs.nonEmpty) Some((id, hs.size.toLong, hs.min.toLong)) else None
    }.toSet
    val got = run("q115_fuzzy_decontam").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q116 matches a direct containment recomputation and finds planted quotes") {
    val planted = rawDocs.map { case (id, text) =>
      id -> (if (id % 10 == 0 && rawDocs.contains(id + 1))
               text + " " + rawDocs(id + 1)
             else text)
    }
    val shingles = planted.map { case (id, text) =>
      val ts = toks(text)
      id -> ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val dfs = shingles.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rare = shingles.map { case (id, ss) =>
      id -> ss.filter(sh => dfs(sh) >= 2 && dfs(sh) <= 20)
    }
    val ids = rare.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      inter = (rare(a) & rare(b)).size.toLong if inter >= 5
      cab = inter * 1000000L / shingles(a).size
      cba = inter * 1000000L / shingles(b).size
      if cab >= 800000L || cba >= 800000L
    } yield (a, b, inter, cab, cba)).toSet
    val got = run("q116_quote_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    assert(got.exists { case (a, b, _, _, cba) =>
      a % 10 == 0 && b == a + 1 && cba == 1000000L
    })
  }

  test("q117 groups token-reversed plants with their donors; matches recompute") {
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val planted = rawDocs.map { case (id, text) =>
      id -> (if (id % 25 == 0 && rawDocs.contains(id + 1))
               toks(rawDocs(id + 1)).reverse.mkString(" ")
             else text)
    }
    val expect = planted.toSeq
      .map { case (id, text) =>
        (md5hex(toks(text).sorted.mkString(" ")), id, md5hex(text))
      }
      .groupBy(_._1)
      .collect { case (bfp, rows) if rows.size >= 2 =>
        (bfp, rows.size.toLong, rows.map(_._3).distinct.size.toLong,
          rows.map(_._2).min)
      }.toSet
    val got = run("q117_bow_dedup").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // at least one planted reversal groups with its donor under the bag fp
    val plantGroups = planted.toSeq.filter { case (id, _) =>
      id % 25 == 0 && rawDocs.contains(id + 1)
    }.map { case (id, text) => md5hex(toks(text).sorted.mkString(" ")) }
    assert(got.exists(g => plantGroups.contains(g._1) && g._3 >= 2))
  }

  test("q118 centroid sums match a direct per-(label,dim) recomputation") {
    val vecs = graft.catalog.Tables.t(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1)))
    val expect = vecs.flatMap { case (label, emb) =>
      emb.zipWithIndex.map { case (c, i) =>
        ((label, i.toLong), math.floor(c.toDouble * 1000).toLong)
      }
    }.groupBy(_._1).map { case ((label, dim), xs) =>
      (label, dim, xs.map(_._2).sum, xs.size.toLong)
    }.toSet
    val got = run("q118_centroid_accum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q119 anomaly flags equal the exact integer 3-sigma gate over trailing counts") {
    val hours = graft.catalog.Tables.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.date_trunc("hour",
          org.apache.spark.sql.functions.col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1)))
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00:00")
    val counts = hours.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = counts.keys.toSeq.map(_._1).distinct.flatMap { et =>
      val series = counts.filter(_._1._1 == et).toSeq
        .map { case ((_, h), c) => (h, c) }.sortBy(_._1.getTime)
      series.zipWithIndex.flatMap { case ((h, x), i) =>
        val prev = series.slice(math.max(0, i - 24), i).map(_._2)
        val n = prev.size.toLong
        if (n >= 12) {
          val s1 = prev.sum
          val s2 = prev.map(c => c * c).sum
          val lhs = (n * x - s1) * (n * x - s1)
          val rhs = 9L * (n * s2 - s1 * s1)
          Some((et, fmt.format(h), x, n, lhs > rhs))
        } else None
      }
    }.toSet
    val got = run("q119_rate_anomaly").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q120 coverage equals a direct split + bigram-set recomputation") {
    def mix(id: Long) = ((id % 1000003) * 2654435761L + 40503L) % 1000L
    def bigrams(text: String) =
      toks(text).sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    val langOf = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = rawDocs.toSeq.groupBy { case (id, _) => langOf(id) }
    val expect = byLang.flatMap { case (lang, docs) =>
      val train = docs.filter(d => mix(d._1) < 980).flatMap(d => bigrams(d._2)).toSet
      val hold = docs.filter(d => mix(d._1) >= 980).flatMap(d => bigrams(d._2)).toSet
      if (hold.isEmpty) None
      else {
        val cov = hold.count(train.contains).toLong
        Some((lang, hold.size.toLong, cov, cov * 1000000L / hold.size))
      }
    }.toSet
    val got = run("q120_split_ngram_coverage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q121 PMI top-20 matches a direct recomputation") {
    val bigs = rawDocs.values.toSeq
      .flatMap(t => toks(t).sliding(2).filter(_.length == 2).map(_.mkString(" ")))
    val cab = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = rawDocs.values.toSeq.flatMap(toks)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nb = bigs.size.toLong
    val expect = cab.toSeq.filter(_._2 >= 5).map { case (bg, c) =>
      val Array(a, b) = bg.split(" ", 2)
      val pmi = math.floor(math.log((c.toDouble * nb.toDouble) /
        (uni(a).toDouble * uni(b).toDouble)) * 1e9).toLong
      (bg, c, pmi)
    }.sortBy(r => (-r._3, r._1)).take(20).zipWithIndex
      .map { case ((bg, c, p), i) => (bg, c, p, i + 1L) }.toSet
    val got = run("q121_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q122 A-ES sample matches a direct priority recomputation and favors long docs") {
    val meta = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def keyNano(id: Long, w: Long) = {
      val mix = ((id % 1000003L) * 2654435761L + 40503L) % 1000003L
      math.floor(math.log((mix * 2 + 1).toDouble / 2000006.0) / w * 1e9).toLong
    }
    val expect = meta.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      docs.toSeq.map { case (id, _, w) => (id, lang, w, keyNano(id, w)) }
        .sortBy(r => (-r._4, r._1)).take(10).zipWithIndex
        .map { case ((id, l, w, k), i) => (id, l, w, k, i + 1L) }
    }.toSet
    val got = run("q122_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    // weighting sanity: sampled docs skew longer than the corpus median
    val med = meta.map(_._3).sorted.apply(meta.length / 2)
    val sampledMed = got.toSeq.map(_._3).sorted.apply(got.size / 2)
    assert(sampledMed >= med,
      s"weighted sample median length $sampledMed < corpus median $med")
  }

  test("q109 collapses the four planted URL variants of each page") {
    val expect = rawDocs.keySet.groupBy(_ / 4).map { case (pid, ids) =>
      (s"https://cdn.example.com/p/$pid", ids.min, ids.size.toLong, ids.size.toLong)
    }.toSet
    val got = run("q109_url_canonical").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q110 exact quantiles match a direct recomputation and the sketch stays in bound") {
    val langs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = langs.groupBy(_._1).flatMap { case (lang, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length.toLong
      Seq(25L, 50L, 75L, 90L).map { q =>
        val target = ((q * n + 99) / 100).toInt
        (lang, q, n, vs(target - 1), true)
      }
    }.toSet
    val got = run("q110_quantile_sketch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expect)
  }

  test("q111 admits exactly the batch docs unseen in the index and first in batch") {
    def fp(text: String) = {
      val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5").digest(norm.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val fps = rawDocs.map { case (id, text) => id -> fp(text) }
    val batch = fps.filter(_._1 % 5 == 0)
    val indexFps = fps.filter(_._1 % 5 != 0).values.toSet
    val firstByFp = batch.groupBy(_._2).map { case (f, m) => f -> m.keys.min }
    val expect = batch.map { case (id, f) =>
      val dup = indexFps.contains(f)
      val first = firstByFp(f) == id
      (id, f, dup, first, !dup && first)
    }.toSet
    val got = run("q111_incremental_dedup").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4))).toSet
    assert(got == expect)
  }

  test("q107 keeps exactly one doc per cluster and it is the best-quality one") {
    val got = run("q107_cluster_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(_._1).toSet == rawDocs.keySet)
    got.groupBy(_._2).values.foreach { cluster =>
      val kept = cluster.filter(_._4)
      assert(kept.length == 1, s"cluster ${cluster.head._2}")
      // survivor has the cluster's max quality (doc_id breaks ties)
      val best = cluster.maxBy(c => (c._3, -c._1))
      assert(kept.head._1 == best._1)
    }
  }

  // ------------------------------------------------------------------
  private lazy val rawDocsSrc: Map[Long, (String, String)] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  private def qmilli(text: String): Long = {
    val stopRe = raw"\b(the|a|of|and|to)\b".r
    val ntok = text.trim.split("\\s+").length.toDouble
    val alpha = text.replaceAll("[^a-z]", "").length.toDouble
    val stop = stopRe.findAllIn(text).size.toDouble
    math.floor((math.min(1.0, ntok / 50.0) * 0.5 +
      (alpha / text.length) * 0.3 +
      math.min(1.0, stop / 10.0) * 0.2) * 1000).toLong
  }

  test("q170 quantile normalization matches a direct recompute; qnorm is monotone in qmilli within a source") {
    val docs = rawDocsSrc.toSeq.map { case (id, (text, src)) =>
      (id, src, qmilli(text))
    }
    val n = docs.size.toLong
    // global quantile function over the distinct-value grid
    val grid = docs.groupBy(_._3).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val cums = grid.scanLeft((0L, 0L)) { case ((_, acc), (v, c)) =>
      (v, acc + c)
    }.drop(1)
    def g(pm: Long): Long =
      cums.find { case (_, cum) => cum * 1000 >= pm * n }.get._1
    // per-source permille rank
    val expected = docs.groupBy(_._2).flatMap { case (_, ds) =>
      val sorted = ds.sortBy(x => (x._3, x._1))
      val m = sorted.size
      sorted.zipWithIndex.map { case ((id, src, q), i) =>
        // replay the engines' double arithmetic exactly:
        // floor(percent_rank * 1000) with percent_rank = i / (m - 1)
        val pm = if (m == 1) 0L
          else math.floor(i.toDouble / (m - 1).toDouble * 1000.0).toLong
        id -> (src, q, pm, g(pm))
      }
    }
    val got = run("q170_quantile_normalize").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expected)
    // monotone within source: higher qmilli never maps lower
    got.values.groupBy(_._1).foreach { case (src, vs) =>
      vs.toSeq.sortBy(v => (v._2, v._4)).sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._2 > b._2 || a._4 <= b._4, s"$src monotonicity")
        case _ =>
      }
    }
  }

  test("q171 anchor terms equal a direct per-host top-5 recompute") {
    val counts = scala.collection.mutable.Map.empty[(Long, String), Long]
      .withDefaultValue(0L)
    rawDocsSrc.foreach { case (id, (text, _)) =>
      val host = (id * 7 + 3) % 32
      text.trim.split("\\s+").take(3).foreach(t => counts((host, t)) += 1)
    }
    val expected = counts.toSeq.groupBy(_._1._1).flatMap { case (h, ts) =>
      ts.map { case ((_, t), c) => (t, c) }
        .sortBy { case (t, c) => (-c, t) }.take(5).zipWithIndex
        .map { case ((t, c), i) => (h, t) -> (c, i + 1L) }
    }
    val got = run("q171_anchor_terms").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
  }

  test("q172 skip-gram PPMI matches a direct windowed-pair recompute") {
    val pairs = rawDocsSrc.values.toSeq.flatMap { case (text, _) =>
      val t = text.trim.split("\\s+")
      (1 to 2).flatMap { k =>
        t.indices.dropRight(k).map(i => (t(i), t(i + k)))
      }
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (Seq(a, b).min, Seq(a, b).max) }
    val pc = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val marg = (pc.toSeq.map { case ((x, _), c) => x -> c } ++
      pc.toSeq.map { case ((_, y), c) => y -> c })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tt = pc.values.sum.toDouble
    val expected = pc.filter(_._2 >= 3).toSeq.map { case ((x, y), c) =>
      val raw = math.log(c.toDouble * tt / (marg(x).toDouble * marg(y).toDouble))
      (x, y, c, math.max(math.floor(raw * 1e9).toLong, 0L))
    }.groupBy(_._1).flatMap { case (_, cs) =>
      cs.sortBy { case (_, y, _, p) => (-p, y) }.take(3).zipWithIndex
        .map { case ((x, y, c, p), i) => (x, y) -> (c, p, i + 1L) }
    }
    val got = run("q172_skipgram_ppmi").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }
}
