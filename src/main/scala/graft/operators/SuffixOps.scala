package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT substring deduplication via suffix-array prefix doubling —
  * the Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better") ExactSubstr family in its exact form, closing the
  * one dedup-matrix cell q77/q338 only approximated with rolling
  * window hashes.
  *
  * ALGORITHM. The classic Manber–Myers prefix-doubling iteration,
  * stopped at the duplication threshold width L instead of run to a
  * full suffix array: after round k every suffix carries a rank that
  * is equal between two suffixes iff their first 2^k tokens are equal
  * (rank_{k+1}(i) is derived from the pair (rank_k(i), rank_k(i+2^k))
  * — one per-document `lead` window + one per-class reduction per
  * round). Two suffixes share an exactly-duplicated span of length
  * >= L iff their width-L ranks collide, which is ALSO exactly the
  * adjacent-LCP >= L condition on the full suffix array (the SA
  * neighbor maximizes LCP), so stopping at ceil(log2 L) rounds loses
  * nothing for threshold detection and skips both the remaining
  * log(n) rounds and the final global sort — the Spark-first
  * restatement of "build the suffix array, then scan adjacent LCPs".
  *
  * EXACTNESS ACROSS ENGINES. Ranks must be engine-independent, so the
  * class representative is never a dense_rank (order of assignment is
  * engine-private): rank := min global position id over the class,
  * with gid = doc_id * 2^20 + pos (document token counts are bounded
  * far below 2^20; a 100-token cap holds across every testdata SF and
  * the 2^43-document headroom is ample). Suffixes shorter than the
  * current width take the sentinel rank -1 from `lead`'s default —
  * a real class's min-gid is >= 0, so short suffixes can never merge
  * with long ones, and two short identical suffixes (duplicated text
  * of length < L) are excluded by the eligibility filter
  * (pos + L <= doc length) before the class count.
  *
  * SCALE SHAPE. Every round shuffles FIXED-WIDTH rows (doc, pos, gid,
  * two BIGINT ranks — ~40 bytes), never token payloads: the naive
  * exact form (group positions by their L-token substring) ships
  * O(n * L) text bytes through one shuffle, prefix doubling ships
  * O(n * log L) fixed-size rows — at 100 TB / ~20 T positions the
  * difference is the whole job. Rounds are ceil(log2 L) (3 for the
  * catalog's L = 8), each one per-doc window + one per-class window;
  * the class count, coverage, and span extraction are one window
  * each; the final per-doc aggregation reuses the coverage window's
  * doc_id partitioning. Nothing is ever broadcast or collected on the
  * distributed arm.
  *
  * TWO-PATH (q193/q356 family): below
  * `spark.graft.graph.maxDriverRows` the collected position frame runs
  * a driver-local exact algorithm — group eligible starts by their
  * L-token sequence (the width-L class IS the window) — which is a
  * genuinely different realization of the same semantics, so the
  * GraphTwoPathSpec equivalence check is substantive. Above the cap
  * the prefix-doubling plan runs; it is the only arm that exists at
  * corpus scale.
  *
  * Reference context: the WordPress exporter (libs/export/posts.js)
  * has no dedup surface at all — this operator is part of the
  * LLM-training-pipeline extension family (SURVEY.md §2.12).
  */
object SuffixOps {

  /** Per-document exact duplicated-span profile at threshold `width`
    * (a power of two). Input: `pos` = (idCol: Long, posCol: Long,
    * tokCol: String) token positions, 0-based contiguous per document.
    * Output: (doc_id, n_tokens, n_dup_positions, n_spans, dup_ppm) —
    * a position is duplicated when it is covered by some length-
    * `width` window whose token sequence occurs at >= 2 positions
    * corpus-wide (self-repetition counts, per Lee et al.); n_spans
    * counts maximal runs of covered positions. */
  def dupSpanProfile(pos: DataFrame, width: Int): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val spark = pos.sparkSession
    import spark.implicits._

    CorpusOps.boundedRows(pos) match {
      case Some(rows) =>
        // driver arm: group eligible starts by their width-token
        // sequence directly (exact — Seq keys, no separator or hash
        // ambiguity), then coverage + span extraction per document.
        val docs = rows
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .groupBy(_._1)
          .map { case (id, ps) =>
            id -> ps.sortBy(_._2).map(_._3).toIndexedSeq }
        val counts =
          scala.collection.mutable.HashMap.empty[Seq[String], Long]
        docs.valuesIterator.foreach { toks =>
          var i = 0
          while (i + width <= toks.length) {
            val key = toks.slice(i, i + width)
            counts.update(key, counts.getOrElse(key, 0L) + 1L)
            i += 1
          }
        }
        val out = docs.toSeq.map { case (id, toks) =>
          val n = toks.length
          val dupStart = Array.tabulate(n)(i =>
            i + width <= n && counts(toks.slice(i, i + width)) >= 2L)
          var covered = 0L; var spans = 0L; var prev = false
          var p = 0
          while (p < n) {
            var cv = false
            var s = math.max(0, p - width + 1)
            while (!cv && s <= p) { cv = dupStart(s); s += 1 }
            if (cv) { covered += 1; if (!prev) spans += 1 }
            prev = cv; p += 1
          }
          val ppm =
            math.floor(covered.toDouble / n * 1000000d).toLong
          (id, n.toLong, covered, spans, ppm)
        }
        out.toDF("doc_id", "n_tokens", "n_dup_positions", "n_spans",
          "dup_ppm")

      case None =>
        // distributed arm: prefix doubling on fixed-width rank rows.
        val wDoc = Window.partitionBy($"doc_id").orderBy($"pos".asc)
        var cur = pos
          .toDF("doc_id", "pos", "tok")
          .withColumn("gid", $"doc_id" * lit(1048576L) + $"pos")
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy($"doc_id")))
          .withColumn("r",
            min($"gid").over(Window.partitionBy($"tok")))
          .drop("tok")
        var w = 1
        while (w < width) {
          cur = cur
            .withColumn("r2", lead($"r", w, -1L).over(wDoc))
            .withColumn("r",
              min($"gid").over(Window.partitionBy($"r", $"r2")))
            .drop("r2")
          w *= 2
        }
        pos.unpersist(blocking = false) // boundedRows left it persisted
        val elig = $"pos" + lit(width.toLong) <= $"n"
        val covW = wDoc.rowsBetween(-(width - 1).toLong, 0L)
        cur
          .withColumn("c",
            sum(when(elig, 1L).otherwise(0L))
              .over(Window.partitionBy($"r")))
          .withColumn("d", when(elig && $"c" >= 2L, 1L).otherwise(0L))
          .withColumn("cv", max($"d").over(covW))
          .withColumn("pcv", lag($"cv", 1, 0L).over(wDoc))
          .groupBy($"doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum($"cv").cast("long").as("n_dup_positions"),
            sum(when($"cv" === 1L && $"pcv" === 0L, 1L).otherwise(0L))
              .cast("long").as("n_spans"))
          .select($"doc_id", $"n_tokens", $"n_dup_positions",
            $"n_spans",
            floor($"n_dup_positions".cast("double") / $"n_tokens"
              * 1000000d).cast("long").as("dup_ppm"))
    }
  }
}
