package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNormOps

/** Semantic tests for the cleaning/normalization family (q126-q130):
  * independent Scala recomputation from the raw sf0.001 corpus (the
  * CurationQuerySpec pattern — the DuckDB oracle proves engine parity,
  * these pin the SEMANTICS so a same-wrong-both-sides bug can't hide).
  */
class CleaningQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val rawDocs: Map[Long, String] =
    graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  test("q126 paragraph retention matches a direct first-keeper recompute") {
    // recompute: 25-token paragraphs, first (doc_id, para_id) per text wins
    val paras = rawDocs.toSeq.flatMap { case (id, text) =>
      toks(text).grouped(25).zipWithIndex.map { case (g, i) =>
        (id, i.toLong, g.length.toLong, g.mkString(" "))
      }
    }
    val keeper = paras.groupBy(_._4).map { case (_, g) =>
      g.minBy(p => (p._1, p._2)) -> ()
    }.keySet
    val expect = paras.groupBy(_._1).map { case (id, g) =>
      val kept = g.filter(keeper.contains)
      val kt = kept.map(_._3).sum
      val tt = g.map(_._3).sum
      id -> (g.size.toLong, kept.size.toLong, kt * 1000 / tt)
    }
    val got = run("q126_paragraph_dedup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // the corpus plants duplicate docs, so some paragraphs must dedup
    assert(got.values.exists { case (p, k, _) => k < p },
      "expected at least one doc to lose a duplicate paragraph")
  }

  test("q127 NFC composes the decomposed suffixes and is idempotent") {
    val got = run("q127_nfc_normalize").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    got.foreach { case (id, (changed, lenRaw, lenNorm, tail)) =>
      (id % 4) match {
        case 0 => assert(changed && lenNorm == lenRaw - 1 && tail == "è")
        case 1 => assert(changed && lenNorm == lenRaw - 1 && tail == "é")
        case 2 => assert(!changed && lenNorm == lenRaw && tail == "é")
        case _ => assert(!changed && lenNorm == lenRaw && tail == "x")
      }
    }
    // kernel idempotence: nfc(nfc(x)) == nfc(x) on a mixed sample
    val samples = Seq("éabc", "é", "plain", "Åring")
    samples.foreach { s =>
      assert(TextNormOps.nfc(TextNormOps.nfc(s)) == TextNormOps.nfc(s))
    }
  }

  test("q128 script counts match direct codepoint-range counts") {
    val got = run("q128_script_mix").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(got.keySet == rawDocs.keySet)
    rawDocs.foreach { case (id, text) =>
      val txt = text + (id % 3 match {
        case 1 => " привет мир"
        case 2 => " 数据处理系统"
        case _ => ""
      })
      val lat = txt.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')).toLong
      val cyr = txt.count(c => c >= 'Ѐ' && c <= 'ӿ').toLong
      val cjk = txt.count(c => c >= '一' && c <= '鿿').toLong
      val dom = if (lat >= cyr && lat >= cjk) "latin"
                else if (cyr >= cjk) "cyrillic" else "cjk"
      assert(got(id) == (lat, cyr, cjk, dom), s"doc $id")
    }
    // decoration exercised every branch
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._3 > 0))
  }

  test("q129 entropy matches a direct recompute and sits in [0, ln(alphabet)]") {
    val got = run("q129_char_entropy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rawDocs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).view.mapValues(_.length.toLong)
      val n = text.length.toLong
      val sum = counts.values.map(k =>
        k * math.floor(math.log(n.toDouble / k) * 1e9).toLong).sum
      assert(got(id) == (n, sum / n), s"doc $id")
      // bounds: 0 <= H <= ln(#distinct); quantization can undershoot by <= 1e-9/char
      assert(got(id)._2 >= -1L)
      assert(got(id)._2 <= math.ceil(math.log(counts.size.toDouble) * 1e9).toLong)
    }
    // uniform string: H = ln(4) exactly (up to the floor quantization)
    val u = TextNormOps.entropyNanoSum("abcd") / 4
    assert(math.abs(u - math.floor(math.log(4.0) * 1e9).toLong) <= 1)
  }

  test("q131 leakage counts match a direct fingerprint-containment recompute") {
    def hm(id: Long): Long =
      ((((id % 1000003) + 1000003) % 1000003 * 2654435761L + 40503) % 1000 + 1000) % 1000
    def split(id: Long): String =
      if (hm(id) < 980) "train" else if (hm(id) < 990) "val" else "test"
    def fp(text: String): String = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val byraw = rawDocs.groupBy { case (id, _) => split(id) }
    val trainFps = byraw.getOrElse("train", Map.empty).values.map(fp).toSet
    val got = run("q131_split_leakage").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("val", "test"))
    Seq("val", "test").foreach { s =>
      val docs = byraw.getOrElse(s, Map.empty)
      val leaked = docs.values.count(t => trainFps.contains(fp(t))).toLong
      assert(got(s) == (docs.size.toLong, leaked, leaked * 1000 / docs.size),
        s"split $s")
    }
  }

  test("q132 stride chunks cover every token twice (except edge chunks)") {
    val got = run("q132_stride_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    rawDocs.foreach { case (id, text) =>
      val n = toks(text).length
      val kmax = (n - 1) / 16
      val chunks = byDoc(id).sortBy(_._2)
      assert(chunks.map(_._2).toSeq == (0L to kmax.toLong).toSeq,
        s"doc $id chunk ids")
      // chunk k covers [16k, min(16k+32, n)) -> token memberships sum
      val covered = chunks.map(_._3).sum
      val expect = (0 to kmax).map(k => math.min(16 * k + 32, n) - 16 * k).sum
      assert(covered == expect, s"doc $id coverage")
      // adjacent chunks share exactly the 16-token overlap region
      chunks.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 == 32 || b._2 == kmax.toLong, s"doc $id interior chunk short")
        case _ =>
      }
    }
  }

  test("q133 zipf decay matches a direct integer-regression recompute") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, g) =>
      val freq = g.flatMap(d => toks(d._2)).groupBy(identity)
        .view.mapValues(_.length.toLong).toSeq
      val top = freq.sortBy { case (t, f) => (-f, t) }.take(100).zipWithIndex
      val xy = top.map { case ((_, f), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1000).toLong,
         math.floor(math.log(f.toDouble) * 1000).toLong)
      }
      val n = xy.length.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val num = xy.map { case (x, y) => -(n * x - sx) * (n * y - sy) }.sum
      val den = xy.map { case (x, _) => (n * x - sx) * (n * x - sx) }.sum
      src -> (n, num * 1000 / den)
    }
    val got = run("q133_zipf_decay").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    // a natural-ish token distribution decays: every source's slope > 0
    assert(got.values.forall(_._2 > 0))
  }

  test("q134 lead-dup matrix matches a direct pair recompute") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.groupBy { case (src, text) =>
      (toks(text).take(10).mkString(" "), src)
    }.view.mapValues(_.length).toMap
    val byFp = counts.keys.groupBy(_._1)
    val expect = byFp.toSeq.flatMap { case (fp, keys) =>
      val srcs = keys.map(_._2).toSeq.sorted
      val diag = srcs.filter(s => counts((fp, s)) >= 2).map(s => (s, s))
      val cross = for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
      } yield (srcs(i), srcs(j))
      diag ++ cross
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q134_source_dup_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got.nonEmpty, "lead collisions must exist in the corpus")
  }

  test("q135 outliers are each source's true bottom-5 cosines vs its centroid") {
    val embs = graft.catalog.Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val srcOf = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val bySrc = embs.toSeq.groupBy { case (id, _) => srcOf(id) }
    val expect = bySrc.flatMap { case (src, vs) =>
      val n = vs.size
      val cent = (0 until 64).map { i =>
        vs.map { case (_, e) => math.floor(e(i) * 1000).toLong }.sum.toDouble /
          (n * 1000).toDouble
      }.toArray
      val scored = vs.map { case (id, e) =>
        val c = BigDecimal(dot(e, cent) / (math.sqrt(dot(e, e)) * math.sqrt(dot(cent, cent))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, c)
      }.sortBy { case (id, c) => (c, id) }.take(5).zipWithIndex
      scored.map { case ((id, c), i) => (src, (i + 1).toLong) -> (id, c) }
    }
    val got = run("q135_embedding_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (id, c)) =>
      val (eid, ec) = expect(k)
      assert(id == eid && math.abs(c - ec) < 2e-6, s"$k: got ($id,$c) want ($eid,$ec)")
    }
  }

  test("q136 novelty matches a sequential first-seen recompute; doc 0 is all-novel") {
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = rawDocs.toSeq.sortBy(_._1).map { case (id, text) =>
      val t = toks(text)
      val sh = t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val novel = sh.count(!seen.contains(_)).toLong
      seen ++= sh
      id -> (sh.size.toLong, novel, novel * 1000 / sh.size)
    }.toMap
    val got = run("q136_novelty_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(got(0L)._3 == 1000L, "the first doc must be fully novel")
    // saturation: later docs are on average less novel than early ones
    val ids = got.keys.toSeq.sorted
    val (early, late) = (ids.take(50), ids.takeRight(50))
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    assert(avg(early.map(got(_)._3)) >= avg(late.map(got(_)._3)),
      "novelty should not increase with corpus position on average")
  }

  test("q137 split-parity shares and deviations match a direct recompute") {
    def hm(id: Long): Long =
      ((((id % 1000003) + 1000003) % 1000003 * 2654435761L + 40503) % 1000 + 1000) % 1000
    def split(id: Long): String =
      if (hm(id) < 980) "train" else if (hm(id) < 990) "val" else "test"
    val langOf = graft.catalog.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sl = langOf.toSeq.groupBy { case (id, l) => (split(id), l) }
      .view.mapValues(_.size.toLong).toMap
    val ns = sl.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nl = sl.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nt = langOf.size.toLong
    val got = run("q137_split_parity").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == sl.keySet)
    sl.foreach { case ((sp, l), n) =>
      val share = n * 1000000L / ns(sp)
      val dev = share - nl(l) * 1000000L / nt
      assert(got((sp, l)) == (n, share, dev), s"($sp, $l)")
    }
    // every doc accounted for exactly once
    assert(got.values.map(_._1).sum == nt)
  }

  test("q130 blocklist flags exactly the two policy hosts") {
    val rows = run("q130_host_blocklist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.length == 5)
    val blocked = rows.filter(_._3).map(_._1).toSet
    assert(blocked == Set("spam.tracker.net", "ads.clickfarm.biz"))
    assert(rows.map(_._2).toSet == Set("com", "net", "org", "biz"))
    assert(rows.map(_._4).sum == rawDocs.size)
  }
}
