package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

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

  test("recall sweep: Lloyd-refined IVF and PQ models vs raw seeds at two corpus sizes") {
    // the oracled q45/q64/q68 paths use raw seeds/anchors (bit-replayable
    // in SQL); production callers refine with kmeansCentroids/pqRefine.
    // This pins the value of that refinement: at BOTH corpus sizes the
    // refined model's recall is at least the seed model's (Lloyd's moves
    // centroids toward the data, it must not cost recall), with the
    // actual numbers surfaced for the record.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val emb = graft.catalog.Tables.t(spark, dir, "embeddings")
      val n = emb.count()

      // IVF arm: recall@1 over the full corpus, tight nprobe so the
      // cell model quality is what decides recall
      val nlist = if (n <= 1000) 16 else 32
      val brute1 = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      def ivfRecall(cents: Seq[Seq[Double]]): Double = {
        val got = SimilarityOps
          .ivfTopK(emb, "vec_id", "embedding", cents, nprobe = 2, k = 1)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
        got.count { case (q, nb) => brute1.get(q).contains(nb) }.toDouble / brute1.size
      }
      val seed = SimilarityOps.seedCentroids(emb, "vec_id", "embedding", nlist)
      val refined = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding", nlist, iters = 2)
      val (rSeed, rRef) = (ivfRecall(seed), ivfRecall(refined))
      info(f"$dir n=$n IVF recall@1: seed=$rSeed%.3f refined=$rRef%.3f")
      assert(refined != seed, "refinement must move the centroids")
      assert(rRef >= rSeed,
        f"refined IVF recall $rRef%.3f fell below seed recall $rSeed%.3f at $dir")

      // PQ arm: recall@5 for the 10-query probe batch through the full
      // ADC-shortlist-rerank path, raw anchors vs 2 Lloyd iterations
      val queries = emb.filter($"vec_id" < 10)
      val brute5 = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def pqRecall(cb: Array[Array[(Array[Double], Double)]]): Double = {
        val got = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding",
            cb, candidates = 20, k = 5)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val hits = brute5.map { case (q, t) =>
          got.getOrElse(q, Set.empty).count(t.contains) }.sum
        hits.toDouble / brute5.values.map(_.size).sum
      }
      val rawCb = SimilarityOps.pqAnchorCodebook(emb, "vec_id", "embedding", n, m = 4, k = 16)
      val refCb = SimilarityOps.pqRefine(emb, "embedding", rawCb, iters = 2)
      val (pRaw, pRef) = (pqRecall(rawCb), pqRecall(refCb))
      info(f"$dir n=$n PQ recall@5: anchors=$pRaw%.3f refined=$pRef%.3f")
      assert(pRef >= pRaw,
        f"refined PQ recall $pRef%.3f fell below anchor recall $pRaw%.3f at $dir")
    }
  }

  test("hyperplanes are deterministic by seed") {
    val p1 = SimilarityOps.hyperplanes(4, 8, seed = 7)
    val p2 = SimilarityOps.hyperplanes(4, 8, seed = 7)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
  }

  test("lshSizing: uncapped planes keep expected bucket size bounded at every n") {
    // the bound the old min(16, …) cap broke: expected bucket size
    // n / 2^planes must stay in (targetBucket/2, targetBucket] as n
    // sweeps far past targetBucket·2^16 ≈ 1.6M
    for (exp <- 4 to 11) {
      val n = math.pow(10, exp).toLong
      val cfg = SimilarityOps.lshSizing(n)
      val bucket = n.toDouble / math.pow(2, cfg.planes)
      assert(bucket <= 25.0 && bucket > 12.5,
        s"n=$n planes=${cfg.planes} bucket=$bucket out of bound")
      assert(cfg.planes <= 63 && cfg.tables <= 16 && cfg.probes <= cfg.planes + 1)
    }
    // past the old cap the plane count actually keeps growing…
    assert(SimilarityOps.lshSizing(100000000L).planes > 16)
    // …and coverage grows with it (tables saturate, then multi-probe)
    val big = SimilarityOps.lshSizing(1000000000L)
    assert(big.tables == 16 && big.probes > 1)
    // sf0.01 / sf0.1 resolve to the historical oracle-baked shapes
    assert(SimilarityOps.lshSizing(500) == SimilarityOps.LshConfig(5, 8, 1))
    assert(SimilarityOps.lshSizing(5000) == SimilarityOps.LshConfig(8, 8, 1))
  }

  test("empirical avg bucket size stays ~constant as n crosses the old plane cap") {
    // synthetic vectors via seeded rand columns; dim 16 so 17 planes
    // still carve ~2^17 sign regions (dim 8 would geometry-cap the
    // bucket count below the plane count's reach). planes(250k)=14
    // (under the old 16 cap), planes(2.5M)=17 (past it) — with the cap,
    // the larger corpus's avg bucket would grow ~10x; uncapped it stays.
    def avgBucket(n: Long): Double = {
      val cfg = SimilarityOps.lshSizing(n)
      val tables = SimilarityOps.lshTables(cfg.planes, tables = 2, dim = 16)
      val planeMatrix: Seq[Seq[Double]] = tables.flatten.map(_.toSeq)
      graft.functions.GraftFunctions.register(spark)
      val vecs = spark.range(n).select(
        array((0 until 16).map(i => rand(seed = 100 + i) - 0.5): _*)
          .cast("array<double>").as("v"))
      val bands = vecs.select(posexplode(call_function("hp_signatures",
        $"v", typedLit(planeMatrix), lit(cfg.planes)))
        .as(Seq("table_id", "bucket")))
      val agg = bands.groupBy($"table_id", $"bucket").count()
        .agg(avg($"count")).as[Double].head()
      agg
    }
    val small = avgBucket(250000L)
    val large = avgBucket(2500000L)
    assert(SimilarityOps.lshSizing(250000L).planes <= 16)
    assert(SimilarityOps.lshSizing(2500000L).planes > 16)
    assert(large < small * 3 + 10,
      s"avg bucket grew from $small to $large across the old cap")
    assert(large < 100, s"avg bucket $large far above the 25-row target")
  }

  test("ivfHierSizing: model and per-row work grow ~sqrt(n), not n") {
    // flat IVF's nlist = n/64 grows 100x when data grows 100x; the
    // two-level split must grow ~10x (that is the whole point)
    val (c1a, c2a) = SimilarityOps.ivfHierSizing(1000000L)
    val (c1b, c2b) = SimilarityOps.ivfHierSizing(100000000L)
    assert(c1b.toDouble / c1a >= 5 && c1b.toDouble / c1a <= 20,
      s"coarse model grew ${c1a} -> ${c1b}; expected ~10x at 100x rows")
    assert(c2b.toDouble / c2a <= 20)
    // per-row assignment cost (nlist1 + nlist2 scores) also ~sqrt
    assert((c1b + c2b).toDouble / (c1a + c2a) <= 20)
    // leaf-cell size target holds: nlist1*nlist2 ≈ n/64
    for (n <- Seq(100000L, 10000000L, 1000000000L)) {
      val (a, b) = SimilarityOps.ivfHierSizing(n)
      val cells = a.toLong * b
      assert(cells >= n / 64 && cells <= (n / 64) * 3 + 64,
        s"n=$n cells=$cells vs target ${n / 64}")
    }
    // the sf0.01 shape the q45 oracle bakes
    assert(SimilarityOps.ivfHierSizing(500) == (3, 3))
  }

  test("hierarchical IVF recall matches flat IVF at the same cell budget") {
    val emb = graft.catalog.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.filter($"rank" === 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      got.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    // flat: 9 cells probed 4-at-a-time ≈ hier: 3x3 cells probed 2x2
    val flat = recall(SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      nlist = 9, nprobe = 4, k = 1))
    val hier = recall(SimilarityOps.ivfHierTopK(emb, "vec_id", "embedding",
      nlist1 = 3, nlist2 = 3, nprobe1 = 2, nprobe2 = 2, k = 1))
    assert(hier >= 0.15, s"hier recall $hier below floor")
    assert(hier >= flat - 0.15,
      s"hier recall $hier materially below flat $flat at matched budget")
    // determinism: replay equals
    val again = recall(SimilarityOps.ivfHierTopK(emb, "vec_id", "embedding",
      nlist1 = 3, nlist2 = 3, nprobe1 = 2, nprobe2 = 2, k = 1))
    assert(again == hier)
    // opt-in k-means-refined coarse level keeps recall in the same band
    val km = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 3, iters = 2)
    val hierKm = recall(SimilarityOps.ivfHierTopK(emb, "vec_id", "embedding",
      km, nlist2 = 3, nprobe1 = 2, nprobe2 = 2, k = 1))
    assert(hierKm >= hier - 0.15,
      s"k-means coarse recall $hierKm materially below seed coarse $hier")
  }

  test("multi-probe recall >= single-probe recall on identical tables") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    // deliberately over-long codes for this corpus so single-probe
    // recall has room to lose neighbors; probes buy them back
    val tables = SimilarityOps.lshTables(planes = 7, tables = 2, dim = 64)
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recallAt(probes: Int): Double = {
      val got = SimilarityOps
        .lshTopK(emb, "vec_id", "embedding", tables, k = 1, probes = probes)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      got.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    assert(r4 >= r1, s"multi-probe recall $r4 below single-probe $r1")
    assert(r4 > 0.0)
  }

  test("multi-probe near-dup pairs: superset of single-probe, subset of exact") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val tables = SimilarityOps.lshTables(planes = 7, tables = 2, dim = 64)
    def pairs(probes: Int) = SimilarityOps
      .lshNearDupPairs(emb, "vec_id", "embedding", tables,
        threshold = 0.35, probes = probes)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val p1 = pairs(1)
    val p4 = pairs(4)
    val exact = SimilarityOps.cosinePairs(emb, "vec_id", "embedding",
      threshold = 0.35)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1.subsetOf(p4), "multi-probe must not lose single-probe pairs")
    assert(p4.subsetOf(exact), "probed candidates must stay exactly verified")
  }

  test("PQ codebook shape and deterministic codes") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val cb = SimilarityOps.pqAnchorCodebook(
      emb, "vec_id", "embedding", n = 500L, m = 4, k = 16)
    assert(cb.length == 4)
    assert(cb.forall(_.length == 16))
    assert(cb.forall(_.forall(_._1.length == 16)))
    // |c|^2 of a (near) unit vector's quarter-slice is in (0, 1]
    assert(cb.forall(_.forall { case (_, n2) => n2 > 0.0 && n2 <= 1.001 }))
    val a = SimilarityOps.pqTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", cb, candidates = 20, k = 3).collect().toSeq
    val b = SimilarityOps.pqTopK(emb.repartition(7), emb.filter($"vec_id" < 5),
      "vec_id", "embedding", cb, candidates = 20, k = 3).collect().toSeq
    assert(a.toSet == b.toSet, "PQ results must be partitioning-invariant")
  }

  test("IVF-PQ: sane recall@1, improves with nprobe, partitioning-invariant") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val cb = SimilarityOps.pqAnchorCodebook(
      emb, "vec_id", "embedding", n = 500L, m = 4, k = 16)
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recallAt(nprobe: Int): Double = {
      val got = SimilarityOps.ivfPqTopK(emb, emb, "vec_id", "embedding",
        nlist = 8, nprobe = nprobe, cb, candidates = 64, k = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      got.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8) // probing every cell ≈ plain PQ
    assert(r2 >= 0.2, s"IVF-PQ recall@1 with nprobe=2 too low: $r2")
    assert(r8 >= r2, s"more probes must not lose recall: $r8 < $r2")
    val a = SimilarityOps.ivfPqTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", 8, 2, cb, 20, 3).collect().toSet
    val b = SimilarityOps.ivfPqTopK(emb.repartition(7), emb.filter($"vec_id" < 5),
      "vec_id", "embedding", 8, 2, cb, 20, 3).collect().toSet
    assert(a == b, "IVF-PQ results must be partitioning-invariant")
    // explicit-coarse-model overload: kmeans-refined cells keep recall
    val refined = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val gotR = SimilarityOps.ivfPqTopK(emb, emb, "vec_id", "embedding",
      refined, 2, cb, 64, 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val rR = gotR.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    assert(rR >= r2 - 0.1, s"refined coarse model lost recall: $rR vs seed $r2")
  }

  test("hierarchical IVF-PQ: sane recall@1, more probes never lose recall, partitioning-invariant") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val cb = SimilarityOps.pqAnchorCodebook(
      emb, "vec_id", "embedding", n = 500L, m = 4, k = 16)
    val (nl1, nl2) = SimilarityOps.ivfHierSizing(500L, targetCell = 8)
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recallAt(p1: Int, p2: Int): Double = {
      val got = SimilarityOps.ivfHierPqTopK(emb, emb, "vec_id", "embedding",
        nl1, nl2, p1, p2, cb, candidates = 64, k = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      got.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    val r22 = recallAt(2, 2)
    val rAll = recallAt(nl1, nl2) // probing everything ≈ plain PQ
    assert(r22 >= 0.15, s"hier IVF-PQ recall@1 with 2x2 probes too low: $r22")
    assert(rAll >= r22, s"probing all cells must not lose recall: $rAll < $r22")
    val a = SimilarityOps.ivfHierPqTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", nl1, nl2, 2, 2, cb, 20, 3).collect().toSet
    val b = SimilarityOps.ivfHierPqTopK(emb.repartition(7), emb.filter($"vec_id" < 5),
      "vec_id", "embedding", nl1, nl2, 2, 2, cb, 20, 3).collect().toSet
    assert(a == b, "hier IVF-PQ results must be partitioning-invariant")
  }

  test("semanticDedupLabels: planted near-identical vectors collapse to one cluster") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    // plant 3 copies of vector 7 under fresh ids: identical vectors get
    // identical cell assignments, so blocking can never separate them
    val planted = emb.union(
      emb.filter($"vec_id" === 7)
        .select(explode(typedlit(Seq(9001L, 9002L, 9003L))).as("vec_id"),
          $"embedding"))
    val labels = SimilarityOps.semanticDedupLabels(
        planted, "vec_id", "embedding", nlist = 8, threshold = 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(labels(9001L) == ((7L, true)))
    assert(labels(9002L) == ((7L, true)))
    assert(labels(9003L) == ((7L, true)))
    assert(labels(7L)._1 == 7L && !labels(7L)._2) // canonical keeps itself
    // 500 corpus rows + 3 plants, one label row each
    assert(labels.size == 503)
  }

  test("pqRefine: Lloyd iterations never increase quantization distortion") {
    import graft.functions.VectorFns.dot
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val cb0 = SimilarityOps.pqAnchorCodebook(
      emb, "vec_id", "embedding", n = 500L, m = 4, k = 16)
    def distortion(cb: Array[Array[(Array[Double], Double)]]): Double = {
      val e = $"embedding".cast("array<double>")
      SimilarityOps.pqEncode(emb, "embedding", cb)
        .select((dot(e, e) - lit(2.0) * dot(e, $"recon")
          + dot($"recon", $"recon")).as("d2"))
        .agg(avg($"d2")).head().getDouble(0)
    }
    val d0 = distortion(cb0)
    val cb1 = SimilarityOps.pqRefine(emb, "embedding", cb0, iters = 1)
    val d1 = distortion(cb1)
    val cb2 = SimilarityOps.pqRefine(emb, "embedding", cb1, iters = 1)
    val d2 = distortion(cb2)
    assert(d0 > 0.0)
    assert(d1 <= d0 + 1e-9, s"one Lloyd step must not raise distortion: $d1 > $d0")
    assert(d2 <= d1 + 1e-9, s"second Lloyd step must not raise distortion: $d2 > $d1")
  }

  test("PQ ADC recall@1 vs brute force is sane and improves with candidates") {
    val emb = graft.catalog.Tables.t(spark, sf, "embeddings")
    val cb = SimilarityOps.pqAnchorCodebook(
      emb, "vec_id", "embedding", n = 500L, m = 4, k = 16)
    val brute = SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recallAt(c: Int): Double = {
      val pq = SimilarityOps.pqTopK(emb, emb, "vec_id", "embedding", cb,
        candidates = c, k = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
      pq.count { case (q, n) => brute.get(q).contains(n) }.toDouble / brute.size
    }
    val r16 = recallAt(16)
    val r64 = recallAt(64)
    assert(r16 >= 0.2, s"PQ recall@1 with 16 candidates too low: $r16")
    assert(r64 >= r16, s"recall must not degrade with a larger shortlist: $r64 < $r16")
    assert(r64 >= 0.5, s"PQ recall@1 with 64 candidates too low: $r64")
  }

  test("q123 nearest-centroid report matches a direct recomputation") {
    val rows = graft.catalog.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Float](2).toArray))
    val train = rows.filter(_._1 % 2 == 0)
    val test0 = rows.filter(_._1 % 2 == 1)
    val dims = rows.head._3.length
    val cent: Map[Long, Array[Double]] = train.groupBy(_._2).map { case (l, vs) =>
      val c = Array.tabulate(dims) { i =>
        vs.map(v => math.floor(v._3(i).toDouble * 1000).toLong).sum.toDouble /
          (vs.length * 1000L).toDouble
      }
      l -> c
    }
    val labels = cent.keys.toSeq.sorted
    def predict(v: Array[Float]): Long =
      labels.map { l =>
        val c = cent(l)
        val d2 = (0 until dims).map { i =>
          val t = v(i).toDouble - c(i)
          math.floor(t * t * 1e12).toLong
        }.sum
        (d2, l)
      }.min._2
    val expect = test0.groupBy(_._2).map { case (l, vs) =>
      val nc = vs.count(v => predict(v._3) == l).toLong
      (l, vs.length.toLong, nc, nc * 1000000L / vs.length)
    }.toSet
    val got = run("q123_nearest_centroid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // the testdata labels are NOT embedding-correlated, so accuracy sits
    // at the 1/|labels| chance rate — the report's job is to SURFACE
    // that; assert the partition is complete instead
    assert(got.toSeq.map(_._2).sum == test0.length.toLong)
    assert(got.forall { case (_, n, c, ppm) =>
      c <= n && ppm == c * 1000000L / n })
  }
}
