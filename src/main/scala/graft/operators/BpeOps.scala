package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table INDUCTION — learning the merge rules, not applying
  * them (application is [[TextOps.bpeTokens]]; vocabulary construction is
  * q79). k rounds of the canonical algorithm (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * count weighted adjacent symbol pairs over the word-frequency table,
  * take the argmax pair (ties broken count DESC, then (lft, rgt)
  * lexicographic ASC so every engine replays the identical table), merge
  * it greedily left-to-right in every word, repeat.
  *
  * SEMANTICS PINNED FOR CROSS-ENGINE EXACTNESS:
  *  - Pair counting is POSITIONAL: every adjacent index contributes, so
  *    a symbol run "a a a" counts (a,a) twice — Sennrich's get_stats.
  *  - Merging is single-pass GREEDY left-to-right, non-overlapping: the
  *    run "a a a a" under merge (a,a) becomes "aa aa", and a symbol
  *    created this round is NOT re-merged within the round.
  *  - The distributed arm and the DuckDB oracle both realize the greedy
  *    pass as ONE literal string `replace` over a DOUBLE-SPACE symbol
  *    encoding: a word is ` c1  c2  c3 ` (one space at each end, two
  *    between symbols), the merge rewrites ` L  R ` -> ` LR `. With
  *    single-space delimiters, leftmost-non-overlapping replace consumes
  *    the shared trailing space and SKIPS the next pair of an odd run
  *    ("a a a a" -> "aa a a", one merge where greedy does two); giving
  *    each adjacency its own two-space delimiter makes plain replace —
  *    whose leftmost-non-overlap semantics Spark (UTF8String/Java) and
  *    DuckDB share — EXACTLY the greedy pass. Symbols never contain
  *    whitespace ([a-z]+ words split to chars), so the encoding is
  *    unambiguous.
  *
  * Scale: the corpus collapses FIRST to the (word, cnt) frequency table
  * — Heaps-law bounded (vocabulary types, not corpus tokens). Two-path
  * per the q193 family: below `spark.graft.graph.maxDriverRows` the k
  * rounds run driver-local on the collected table; above it each round
  * is one map-side-combined pair aggregation + a 1-ROW argmax collect
  * (model-sized, the ANN-centroid precedent) + one codegen'd projection
  * rewrite, with the vocabulary frame re-materialized per round
  * ([[CorpusOps.materializeFrontier]] — iterative-plan lineage lesson).
  * Nothing in the loop ever touches corpus rows again.
  */
object BpeOps {

  /** One learned merge: `round` is 1-based. */
  final case class Merge(round: Long, lft: String, rgt: String, count: Long)

  /** Learn the first `k` merges from a (word: String, cnt: Long)
    * frequency table. Returns (round, lft, rgt, merged, pair_count),
    * k rows. Requires every word non-empty and whitespace-free, and at
    * least one adjacent pair to survive through round k (a two-letter
    * corpus exhausts merges; callers pick k against real text). */
  def bpeMergeTable(words: DataFrame, k: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val merges = learnMerges(words, k)
    merges.map(m => (m.round, m.lft, m.rgt, m.lft + m.rgt, m.count))
      .toDF("round", "lft", "rgt", "merged", "pair_count")
  }

  /** The learning loop itself, returning the merges as VALUES — for
    * callers that apply the learned table inside the same plan (q366's
    * compression readout splices them as replace literals; the merge
    * table is k rows, the ANN-centroid model-sized precedent). */
  def learnMerges(words: DataFrame, k: Int): Seq[Merge] = {
    val merges: Seq[Merge] = CorpusOps.boundedRows(words) match {
      case Some(rows) =>
        // driver arm: classic greedy loop on the collected (word, cnt)
        var vocab: Array[(Array[String], Long)] = rows.map { r =>
          (r.getString(0).map(_.toString).toArray, r.getLong(1))
        }
        (1 to k).map { round =>
          val counts =
            scala.collection.mutable.HashMap.empty[(String, String), Long]
          vocab.foreach { case (syms, cnt) =>
            var i = 0
            while (i < syms.length - 1) {
              val key = (syms(i), syms(i + 1))
              counts.update(key, counts.getOrElse(key, 0L) + cnt)
              i += 1
            }
          }
          val (bl, br, bc) = counts.iterator
            .map { case ((l, r), c) => (l, r, c) }
            .minBy { case (l, r, c) => (-c, l, r) }
          vocab = vocab.map { case (syms, cnt) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
                buf += bl + br; i += 2
              } else { buf += syms(i); i += 1 }
            }
            (buf.toArray, cnt)
          }
          Merge(round.toLong, bl, br, bc)
        }
      case None =>
        // distributed arm (boundedRows left `words` persisted): the
        // double-space encoded vocabulary frame iterates; per round ONE
        // pair agg + 1-row collect + one replace projection.
        var cur = words.select(
          regexp_replace(col("word"), "(.)", " $1 ").as("s"), col("cnt"))
        val out = (1 to k).map { round =>
          cur = CorpusOps.materializeFrontier(cur)
          val best = cur
            .select(col("cnt"), split(trim(col("s")), "  ").as("y"))
            .select(col("cnt"), explode(expr(
              "transform(slice(y, 1, size(y) - 1)," +
                " (t, i) -> named_struct('lft', t, 'rgt', y[i + 1]))")).as("p"))
            .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
            .agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("lft").asc, col("rgt").asc)
            .limit(1).collect()(0) // 1-row argmax — model-sized collect
          val (bl, br, bc) =
            (best.getString(0), best.getString(1), best.getLong(2))
          // symbols are [a-z]+-derived — no escaping hazard in the expr
          cur = cur.withColumn("s",
            expr(s"replace(s, ' $bl  $br ', ' $bl$br ')"))
          Merge(round.toLong, bl, br, bc)
        }
        words.unpersist(blocking = false)
        out
    }
    merges
  }
}
