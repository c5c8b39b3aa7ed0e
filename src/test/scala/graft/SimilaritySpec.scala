package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bruteForceTopK finds the constructed nearest neighbor first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.04f, 0.0f)),  // nearly identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteForceTopK(
      vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .orderBy($"rank").as[(Long, Long, Long, Double)].collect()
    assert(got.head._3 == 1L) // neighbor_id of rank 1
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("multi-table LSH reaches sane recall@1 vs brute force and is deterministic") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val tables = SimilarityOps.lshTables(planes = 4, tables = 8, dim = 64)
    val lsh = SimilarityOps.lshTopK(emb, "vec_id", "embedding", tables, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(lsh.nonEmpty)

    val brute = SimilarityOps.bruteForceTopK(
      emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap

    val hits = lsh.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall@1 $recall too low (${hits}/${brute.size})")

    // determinism: same tables -> same results
    val again = SimilarityOps.lshTopK(emb, "vec_id", "embedding", tables, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(again == lsh)
  }

  test("IVF ANN reaches sane recall@1 vs brute force") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val ivf = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      nlist = 32, nprobe = 4, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf.nonEmpty)
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall@1 $recall too low ($hits/${brute.size})")
  }

  test("k-means-refined IVF centroids keep or improve recall@1 over seeds") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val seed = SimilarityOps.seedCentroids(emb, "vec_id", "embedding", 16)
    val km = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 3)
    assert(km.length == 16 && km.forall(_.length == seed.head.length))
    assert(km != seed) // the refinement actually moved the centroids
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recall(cents: Seq[Seq[Double]]): Double = {
      val ivf = SimilarityOps
        .ivfTopK(emb, "vec_id", "embedding", cents, nprobe = 4, k = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      ivf.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    val rSeed = recall(seed)
    val rKm = recall(km)
    assert(rKm >= 0.2, s"k-means recall $rKm below floor")
    assert(rKm >= rSeed - 0.05,
      s"k-means recall $rKm materially worse than seed recall $rSeed")
  }

  test("LSH near-dup pairs are a subset of the exact pair set with sane recall") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val tables = SimilarityOps.lshTables(planes = 4, tables = 8, dim = 64)
    val lsh = SimilarityOps
      .lshNearDupPairs(emb, "vec_id", "embedding", tables, threshold = 0.35)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = SimilarityOps
      .cosinePairs(emb, "vec_id", "embedding", threshold = 0.35)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // LSH candidates are exactly verified
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.5,
        s"recall ${lsh.size}/${exact.size} too low")
  }

  test("hyperplanes are deterministic by seed") {
    val p1 = SimilarityOps.hyperplanes(4, 8, seed = 7)
    val p2 = SimilarityOps.hyperplanes(4, 8, seed = 7)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
  }
}
