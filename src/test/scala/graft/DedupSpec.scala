package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, TextOps}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exactDedup groups duplicates and keeps min id as canonical") {
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"))
      .toDF("id", "k")
    val got = DedupOps.exactDedup(df, $"k", $"id")
      .orderBy($"dup_key").collect()
    val byKey = got.map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byKey("aa") == (1L, 3L))
    assert(byKey("bb") == (2L, 1L))
  }

  test("simhash: identical token lists get identical signatures; distance grows with edits") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely unrelated words about database query optimization plans"))
      .toDF("doc_id", "text")
      .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
    val sigs = DedupOps.simhash32FromTokenRows(df, "doc_id", "tok", "simhash")
      .select($"doc_id", $"simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hd(sigs(1L), sigs(3L)) < hd(sigs(1L), sigs(4L)))
  }

  test("minhash-LSH recovers planted near-dups vs exact jaccard baseline") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
    val sets = docs.select($"doc_id", TextOps.shingleSet($"text").as("s"))

    // exact baseline: all pairs with trigram jaccard >= 0.5
    val a = sets.select($"doc_id".as("doc_a"), $"s".as("sa"))
    val b = sets.select($"doc_id".as("doc_b"), $"s".as("sb"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", DedupOps.jaccard($"sa", $"sb"))
      .filter($"j" >= 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")

    // LSH path (explode form, mirrors q36)
    val sr = TextOps.shingleRows(docs, "doc_id", "text")
      .select($"doc_id", $"shingle").distinct()
    val sigs = DedupOps.minhashSignatures(sr, "doc_id", "shingle", k = 16)
    val cands = DedupOps.lshCandidates(
      DedupOps.lshBands(sigs, "doc_id", "sig", bands = 4, rows = 4), "doc_id")
      .join(sets.select($"doc_id".as("doc_a"), $"s".as("sa")), "doc_a")
      .join(sets.select($"doc_id".as("doc_b"), $"s".as("sb")), "doc_b")
      .withColumn("j", DedupOps.jaccard($"sa", $"sb"))
      .filter($"j" >= 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    assert(cands.subsetOf(exact), "verified LSH pairs must be true near-dups")
    val recall = cands.size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low (${cands.size}/${exact.size})")
  }

  test("banded hamming self-join equals the brute-force pair set") {
    val docs = graft.catalog.Tables.t(spark, sf, "documents")
    val tokRows = docs.select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
    val sigs = DedupOps.simhash32FromTokenRows(tokRows, "doc_id", "tok", "simhash")
      .select($"doc_id", $"simhash").cache()
    try {
      for (h <- Seq(1, 2, 3)) {
        val brute = DedupOps.simhashPairs(sigs, "doc_id", "simhash", h)
          .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
        val banded = DedupOps.simhashPairsBanded(sigs, "doc_id", "simhash", h)
          .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
        assert(banded == brute, s"maxHamming=$h: banded must be exact")
      }
    } finally { sigs.unpersist(); () }
  }

  test("lshCandidates caps degenerate buckets") {
    // 50 ids in ONE bucket with maxBucket=10 -> no candidates from it
    val band = (1L to 50L).map(i => (i, 0, 123)).toDF("doc_id", "band_id", "band_hash")
    assert(DedupOps.lshCandidates(band, "doc_id", maxBucket = 10).count() == 0)
    assert(DedupOps.lshCandidates(band, "doc_id", maxBucket = 100).count() == 50L * 49 / 2)
  }

  test("sorted-neighborhood hot-prefix cap re-blocks without losing local pairs") {
    // 120 titles all share the 6-char prefix "AAAAAA" (a planted hot
    // block), diverging at chars 7-12 into 12 groups of 10; within a
    // group titles differ only in the last character (levenshtein 1-2).
    val rows = (0 until 120).map { i =>
      val g = ('a' + i / 10).toChar.toString * 6
      (i.toLong, s"AAAAAA$g tail${i % 10}")
    }
    val df = rows.toDF("doc_id", "title")
    def run(cap: Int) = DedupOps.sortedNeighborhoodPairs(
        df, "doc_id", "title", maxDist = 3, prefixLen = 6, extLen = 6,
        blockCap = cap)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val capped = run(50)      // hot: 120 > 50 -> re-block on 12 chars
    val uncapped = run(1000000)
    // cross-group neighbors differ in >=6 chars (dist > maxDist), so the
    // re-blocking loses NOTHING here: capped must equal uncapped, and
    // every within-group lag-1 adjacency must be present
    assert(capped == uncapped)
    val lag1 = (0 until 120).filter(i => i % 10 != 9)
      .map(i => (i.toLong, i.toLong + 1)).toSet
    assert(lag1.subsetOf(capped), "within-group adjacent pairs must survive the cap")
    // and the effective blocks really are capped: no 12-char block
    // exceeds the group size
    val maxBlock = df.groupBy(substring($"title", 1, 12)).count()
      .agg(max("count")).head().getLong(0)
    assert(maxBlock <= 50)
  }
}
