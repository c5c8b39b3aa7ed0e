package graft.operators

import org.apache.spark.sql.functions._

import graft.catalog.{Q, QueryModule, Stats, Tables}

/** Similarity-search surface over the embeddings table (64-dim unit
  * vectors): exact brute-force top-k baseline, row-local vector stats,
  * and hyperplane-LSH ANN as the scale path.
  */
object SimilarityQueries extends QueryModule {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.t(s, d, n)

  def qs: Seq[Q] = Seq(

    // exact top-5 cosine neighbors for the first 20 vectors (embeddings
    // are unit-norm, so dot product == cosine). Broadcast queries; one
    // corpus pass; window top-k.
    Q("q37_knn_brute", (s, d) => {
      val emb = t(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
    }, Some("""
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id < 20),
      c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings),
      s AS (SELECT query_id, neighbor_id,
              list_sum(list_transform(range(1, 65), i -> qe[i] * ce[i])) AS sim
            FROM q, c WHERE neighbor_id != query_id)
      SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
             round(sim, 6) AS sim_r
      FROM (SELECT query_id, neighbor_id, sim,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rnk
            FROM s)
      WHERE rnk <= 5""")),

    // row-local vector statistics (zip_with/aggregate/array ops).
    Q("q38_vector_stats", (s, d) => {
      import s.implicits._
      t(s, d, "embeddings").select(
        $"vec_id",
        $"label".cast("long").as("label"),
        size($"embedding").cast("long").as("dim"),
        round(array_max($"embedding").cast("double"), 6).as("max_comp"),
        expr("array_position(embedding, array_max(embedding))")
          .cast("long").as("argmax"))
    }, Some("""
      SELECT vec_id, CAST(label AS BIGINT) AS label,
        CAST(len(embedding) AS BIGINT) AS dim,
        round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_comp,
        CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax
      FROM embeddings""")),

    // hyperplane-LSH ANN: top-3 neighbors from multi-table bucket
    // candidates. Plane count adapts to corpus size (avg bucket ≈ 25
    // vectors) so candidate volume stays ~n·25·L instead of drifting
    // quadratic as n grows past the bucket count. n comes from parquet
    // footer metadata (catalog stats), NOT a df.count() — no extra pass
    // over the corpus before the real job. Deterministic seeded
    // hyperplanes; Spark-only plan — driver records a rows-only check;
    // recall pinned in SimilaritySpec.
    Q("q39_knn_lsh", (s, d) => {
      val n = Stats.parquetRowCount(s, s"$d/embeddings.parquet")
      val planes = math.min(16, math.max(3,
        math.ceil(math.log(n / 25.0) / math.log(2)).toInt))
      val tables = SimilarityOps.lshTables(planes, tables = 8, dim = 64)
      SimilarityOps.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        tables, k = 3)
    }, None),

    // embedding-cosine near-dup pairs — brute-force baseline with an
    // exact oracle (unit vectors: dot == cosine). Quadratic; excluded
    // from bench (LSH/IVF are the scale paths).
    Q("q44_embed_neardup", (s, d) => {
      SimilarityOps.cosinePairs(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4)
    }, Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])), 6) AS sim_r
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) >= 0.4"""),
      bench = false),

    // IVF-style ANN: nearest-centroid cells, nprobe-cell search. Cell
    // count scales with corpus size (target ≈64 vectors/cell, sized from
    // parquet footer stats) so candidate volume stays ~n·nprobe·64
    // instead of drifting quadratic at a fixed nlist. Deterministic
    // centroids; Spark-only plan — rows-only check; recall pinned in
    // SimilaritySpec.
    Q("q45_knn_ivf", (s, d) => {
      val n = Stats.parquetRowCount(s, s"$d/embeddings.parquet")
      val nlist = math.max(16, math.ceil(n / 64.0).toInt)
      SimilarityOps.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        nlist = nlist, nprobe = 4, k = 3)
    }, None)
  )
}
