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
  * with gid = doc_id * 2^20 + pos. The packing invariant (document
  * token counts < 2^20; 2^43-document headroom) is ENFORCED in the
  * plan, not just documented: gid raises a runtime error for any
  * document with >= 1,048,576 tokens (~5 MB of text is plausible in a
  * training corpus, and a silent collision would merge unrelated rank
  * classes while the DuckDB oracle — sharing the constant — agreed).
  * Suffixes shorter than the current width take the sentinel rank -1
  * from `lead`'s default — a real class's min-gid is >= 0, so short
  * suffixes can never merge with long ones, and two short identical
  * suffixes (duplicated text of length < L) are excluded by the
  * eligibility filter (pos + L <= doc length) before the class count.
  *
  * SCALE SHAPE. Every round shuffles FIXED-WIDTH rows (doc, pos, gid,
  * two BIGINT ranks — ~40 bytes), never token payloads: the naive
  * exact form (group positions by their L-token substring) ships
  * O(n * L) text bytes through one shuffle, prefix doubling ships
  * O(n * log L) fixed-size rows — at 100 TB / ~20 T positions the
  * difference is the whole job. EVERY PER-CLASS REDUCTION IS
  * agg-then-join-back (the repo's q77/q338 convention), NEVER a
  * class-keyed window: rank classes are Zipf-skewed (the width-1
  * class of a hot token like "the" holds several % of all corpus
  * positions), and `min(...).over(Window.partitionBy(class))` would
  * put that whole class in ONE WindowExec task — window aggregation
  * has no map-side partial aggregation and AQE skew handling does not
  * split window exchanges, so the hot class becomes a single-task
  * straggler at 100 TB (round-14 verdict #1). `groupBy(class).agg`
  * gets map-side combine (one row per distinct class per map task)
  * and the join back on the class key is AQE-skew-splittable. The
  * ONLY windows in the plan are per-document (`lead`, coverage,
  * span-edge) — and those are provably bounded by the SAME 2^20
  * invariant the gid guard enforces, so no window partition can
  * exceed 2^20 rows. Multiply-consumed frames (each round's `lead`
  * output feeds the class agg AND the join probe; the final rank
  * frame feeds the class-count agg AND the probe) are persisted so
  * the CacheManager serves both plan references from one computation
  * (q360/q356 persisted-frontier discipline). Nothing is ever
  * broadcast or collected on the distributed arm.
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

  /** gid packing shift: positions-per-document capacity. */
  private val GidShift = 1048576L // 2^20

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
        // pos stays persisted — boundedRows left it resident for this
        // branch and rankedBase's seed consumes it (round-14 ADVICE:
        // never unpersist ahead of the consuming action).
        val wDoc = Window.partitionBy($"doc_id").orderBy($"pos".asc)
        var cur = rankedBase(pos.toDF("doc_id", "pos", "tok"))
        var w = 1
        while (w < width) { cur = doubleRank(cur, w); w *= 2 }
        val elig = $"pos" + lit(width.toLong) <= $"n"
        // per-class eligible-start count: agg + join back on the rank
        // key (map-side combined, AQE-skew-splittable join), never a
        // class-keyed window — the width-L class of hot boilerplate is
        // exactly the skewed key the dedup hunts for.
        val ranked = cur.persist()
        val classCnt = ranked.groupBy($"r")
          .agg(sum(when(elig, 1L).otherwise(0L)).as("c"))
        val covW = wDoc.rowsBetween(-(width - 1).toLong, 0L)
        ranked.join(classCnt, Seq("r"))
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

  /** Per-document duplication DEPTH profile: for each width in
    * `widths` (ascending powers of two), the number of eligible starts
    * whose width-token sequence recurs corpus-wide. One prefix-doubling
    * chain serves every width — the rank frame is SNAPSHOT at each
    * requested width on the way up (ceil(log2 maxWidth) rounds total,
    * not one chain per width), then each width costs exactly one more
    * per-class count agg + join-back. Output: (doc_id, n_tokens,
    * dup_starts_w<w1>, dup_starts_w<w2>, ...). Monotone by
    * construction: a width-2w dup start is also a width-w dup start,
    * so the counts never increase with width (pinned in
    * SuffixDedupSpec). Two-path per [[dupSpanProfile]]. */
  def dupDepthProfile(pos: DataFrame, widths: Seq[Int]): DataFrame = {
    require(widths.nonEmpty && widths == widths.sorted &&
      widths.forall(w => w >= 2 && (w & (w - 1)) == 0))
    val spark = pos.sparkSession
    import spark.implicits._
    val cols = widths.map(w => s"dup_starts_w$w")

    CorpusOps.boundedRows(pos) match {
      case Some(rows) =>
        val docs = rows
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .groupBy(_._1)
          .map { case (id, ps) =>
            id -> ps.sortBy(_._2).map(_._3).toIndexedSeq }
        val countsByW = widths.map(w => w -> windowCount(docs, w)).toMap
        val out = docs.toSeq.map { case (id, toks) =>
          id -> (toks.length.toLong +: widths.map { w =>
            val counts = countsByW(w)
            var i = 0; var c = 0L
            while (i + w <= toks.length) {
              if (counts.getOrElse(toks.slice(i, i + w), 0L) >= 2L)
                c += 1
              i += 1
            }
            c
          })
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(out.map { case (id, vs) =>
            org.apache.spark.sql.Row.fromSeq(id +: vs) }),
          org.apache.spark.sql.types.StructType(
            (Seq("doc_id", "n_tokens") ++ cols).map(c =>
              org.apache.spark.sql.types.StructField(c,
                org.apache.spark.sql.types.LongType, nullable = false))))

      case None =>
        // pos stays persisted (boundedRows contract, as above).
        var cur = rankedBase(pos)
        var w = 1
        widths.foreach { target =>
          while (w < target) {
            cur = doubleRank(cur, w); w *= 2
          }
          cur = cur.withColumn(s"r_w$target", $"r")
        }
        // one persisted rank frame feeds the chain start AND every
        // per-width class-count agg (1 + |widths| plan references).
        val ranked = cur.persist()
        var out: DataFrame = ranked
        widths.foreach { tw =>
          val elig = col("pos") + lit(tw.toLong) <= col("n")
          val cnt = ranked.groupBy(col(s"r_w$tw"))
            .agg(sum(when(elig, 1L).otherwise(0L)).as(s"c_w$tw"))
          out = out.join(cnt, Seq(s"r_w$tw"))
            .withColumn(s"dup_w$tw",
              when(elig && col(s"c_w$tw") >= 2L, 1L).otherwise(0L))
        }
        out.groupBy($"doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            widths.map(tw =>
              sum(col(s"dup_w$tw")).cast("long").as(s"dup_starts_w$tw")): _*)
          .select(($"doc_id" +: $"n_tokens" +: cols.map(col)): _*)
    }
  }

  /** Cross-set EXACT-substring contamination (the Lee et al. 2022
    * decontamination use of the suffix machinery): positions carry an
    * `is_bench` flag partitioning the corpus into a benchmark/eval set
    * and a training corpus; a corpus start is CONTAMINATED when its
    * width-token sequence also occurs at an eligible benchmark
    * position (the sets are disjoint, so any benchmark member of the
    * rank class suffices). Input: (doc_id, pos, tok, is_bench).
    * Output per doc: (doc_id, is_bench, n_tokens, n_starts,
    * n_contam_starts) — benchmark docs report 0 contaminated starts
    * (they are the reference side). Same rank chain and two-path
    * structure as [[dupSpanProfile]]; the only addition is one
    * bench-member count per class. */
  def crossContamProfile(pos: DataFrame, width: Int): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0)
    val spark = pos.sparkSession
    import spark.implicits._

    CorpusOps.boundedRows(pos) match {
      case Some(rows) =>
        val docs = rows
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getBoolean(3)))
          .groupBy(_._1)
          .map { case (id, ps) =>
            id -> (ps.head._4, ps.sortBy(_._2).map(_._3).toIndexedSeq) }
        val benchWins =
          scala.collection.mutable.HashSet.empty[Seq[String]]
        docs.valuesIterator.foreach { case (isBench, toks) =>
          if (isBench) {
            var i = 0
            while (i + width <= toks.length) {
              benchWins += toks.slice(i, i + width); i += 1
            }
          }
        }
        docs.toSeq.map { case (id, (isBench, toks)) =>
          val nStarts = math.max(toks.length - width + 1, 0).toLong
          var c = 0L
          if (!isBench) {
            var i = 0
            while (i + width <= toks.length) {
              if (benchWins.contains(toks.slice(i, i + width))) c += 1
              i += 1
            }
          }
          (id, isBench, toks.length.toLong, nStarts, c)
        }.toDF("doc_id", "is_bench", "n_tokens", "n_starts",
          "n_contam_starts")

      case None =>
        // pos stays persisted (boundedRows contract, as above).
        var cur = rankedBase(pos.toDF("doc_id", "pos", "tok", "is_bench"))
        var w = 1
        while (w < width) { cur = doubleRank(cur, w); w *= 2 }
        val elig = $"pos" + lit(width.toLong) <= $"n"
        val ranked = cur.persist()
        val benchCnt = ranked.groupBy($"r")
          .agg(sum(when(elig && $"is_bench", 1L).otherwise(0L)).as("bc"))
        ranked.join(benchCnt, Seq("r"))
          .withColumn("ct",
            when(elig && !$"is_bench" && $"bc" >= 1L, 1L).otherwise(0L))
          .groupBy($"doc_id", $"is_bench")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum(when(elig, 1L).otherwise(0L)).cast("long").as("n_starts"),
            sum($"ct").cast("long").as("n_contam_starts"))
          .select($"doc_id", $"is_bench", $"n_tokens", $"n_starts",
            $"n_contam_starts")
    }
  }

  /** ACTUATION of the exact-substring profile (Lee et al. 2022 §4 —
    * the step q369 stops short of): emit the deduplicated corpus under
    * the TRIM policy. A position is REMOVED when it is covered by some
    * duplicated eligible start (class count >= 2) but NOT covered by
    * any CANONICAL duplicated start — canonical := the start whose gid
    * IS its rank class's representative (gid == r, i.e. the first
    * corpus occurrence of the window, min-gid like every class rep in
    * this family). Exactly one occurrence of every duplicated window
    * therefore survives, intact and contiguous (the canonical start's
    * `width` positions are all canonically covered, hence all kept and
    * adjacent). Output per doc: (doc_id, n_tokens, n_removed,
    * kept_text) — kept_text is the space-joined surviving tokens in
    * position order ('' when the whole document is trimmed away).
    * Same rank chain, agg+join-back discipline, and two-path structure
    * as [[dupSpanProfile]]; the only additions are the canonical flag
    * (one comparison — the class rep is already on every row) and the
    * token join-back on (doc_id, pos) for output text. */
  def trimDuplicatedSpans(pos: DataFrame, width: Int): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val spark = pos.sparkSession
    import spark.implicits._

    CorpusOps.boundedRows(pos) match {
      case Some(rows) =>
        // driver arm: exact window grouping; canonical = min gid of
        // each duplicated window class (gid = doc_id * 2^20 + pos).
        val docs = rows
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .groupBy(_._1)
          .map { case (id, ps) =>
            id -> ps.sortBy(_._2).map(_._3).toIndexedSeq }
        val counts =
          scala.collection.mutable.HashMap.empty[Seq[String], Long]
        val minGid =
          scala.collection.mutable.HashMap.empty[Seq[String], Long]
        docs.foreach { case (id, toks) =>
          var i = 0
          while (i + width <= toks.length) {
            val key = toks.slice(i, i + width)
            val gid = id * GidShift + i
            counts.update(key, counts.getOrElse(key, 0L) + 1L)
            minGid.update(key, math.min(minGid.getOrElse(key, gid), gid))
            i += 1
          }
        }
        val out = docs.toSeq.map { case (id, toks) =>
          val n = toks.length
          def dupAt(i: Int): Boolean =
            i >= 0 && i + width <= n &&
              counts(toks.slice(i, i + width)) >= 2L
          def canonAt(i: Int): Boolean =
            dupAt(i) && minGid(toks.slice(i, i + width)) == id * GidShift + i
          val kept = scala.collection.mutable.ArrayBuffer.empty[String]
          var removed = 0L
          var p = 0
          while (p < n) {
            var cv = false; var ck = false
            var s = math.max(0, p - width + 1)
            while (s <= p) {
              if (dupAt(s)) { cv = true; if (canonAt(s)) ck = true }
              s += 1
            }
            if (cv && !ck) removed += 1 else kept += toks(p)
            p += 1
          }
          (id, n.toLong, removed, kept.mkString(" "))
        }
        out.toDF("doc_id", "n_tokens", "n_removed", "kept_text")

      case None =>
        // distributed arm — pos stays persisted (boundedRows contract):
        // the chain consumes it, and the token join-back at the end
        // reads it again from cache.
        val posDf = pos.toDF("doc_id", "pos", "tok")
        val wDoc = Window.partitionBy($"doc_id").orderBy($"pos".asc)
        var cur = rankedBase(posDf)
        var w = 1
        while (w < width) { cur = doubleRank(cur, w); w *= 2 }
        val elig = $"pos" + lit(width.toLong) <= $"n"
        val ranked = cur.persist()
        val classCnt = ranked.groupBy($"r")
          .agg(sum(when(elig, 1L).otherwise(0L)).as("c"))
        val covW = wDoc.rowsBetween(-(width - 1).toLong, 0L)
        ranked.join(classCnt, Seq("r"))
          .withColumn("d", when(elig && $"c" >= 2L, 1L).otherwise(0L))
          .withColumn("k", when($"d" === 1L && $"gid" === $"r", 1L)
            .otherwise(0L))
          .withColumn("cv", max($"d").over(covW))
          .withColumn("ck", max($"k").over(covW))
          .withColumn("rm", when($"cv" === 1L && $"ck" === 0L, 1L)
            .otherwise(0L))
          .join(posDf, Seq("doc_id", "pos"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum($"rm").cast("long").as("n_removed"),
            array_join(
              transform(
                array_sort(collect_list(
                  when($"rm" === 0L, struct($"pos", $"tok")))),
                x => x.getField("tok")),
              " ").as("kept_text"))
          .select($"doc_id", $"n_tokens", $"n_removed", $"kept_text")
    }
  }

  /** INCREMENTAL actuation of the cross-set machinery (the continual-
    * pretraining data-refresh step): trim from a NEW batch every
    * width-token window that occurs verbatim in an already-trained
    * REFERENCE corpus. Input: (doc_id, pos, tok, is_ref) — is_ref
    * marks the reference side. A new-doc position is REMOVED when it
    * is covered by some eligible start whose width-window class has
    * >= 1 eligible reference occurrence; the reference copy IS the
    * canonical survivor, so unlike [[trimDuplicatedSpans]] there is no
    * canonical exception on the new side (windows duplicated only
    * WITHIN the new batch are left for the within-batch trim — this
    * operator's contract is strictly "nothing verbatim-repeated from
    * the trained set"). Output per NEW doc: (doc_id, n_tokens,
    * n_removed, kept_text); reference docs are not emitted. Same rank
    * chain, agg+join-back discipline, and two-path structure as the
    * rest of the family. */
  def trimCrossSet(pos: DataFrame, width: Int): DataFrame = {
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val spark = pos.sparkSession
    import spark.implicits._

    CorpusOps.boundedRows(pos) match {
      case Some(rows) =>
        // driver arm: reference window set, then per-new-doc coverage.
        val docs = rows
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getBoolean(3)))
          .groupBy(_._1)
          .map { case (id, ps) =>
            id -> (ps.head._4, ps.sortBy(_._2).map(_._3).toIndexedSeq) }
        val refWins =
          scala.collection.mutable.HashSet.empty[Seq[String]]
        docs.valuesIterator.foreach { case (isRef, toks) =>
          if (isRef) {
            var i = 0
            while (i + width <= toks.length) {
              refWins += toks.slice(i, i + width); i += 1
            }
          }
        }
        val out = docs.toSeq.collect { case (id, (false, toks)) =>
          val n = toks.length
          def hitAt(i: Int): Boolean =
            i >= 0 && i + width <= n &&
              refWins.contains(toks.slice(i, i + width))
          val kept = scala.collection.mutable.ArrayBuffer.empty[String]
          var removed = 0L
          var p = 0
          while (p < n) {
            var cv = false
            var s = math.max(0, p - width + 1)
            while (s <= p && !cv) { if (hitAt(s)) cv = true; s += 1 }
            if (cv) removed += 1 else kept += toks(p)
            p += 1
          }
          (id, n.toLong, removed, kept.mkString(" "))
        }
        out.toDF("doc_id", "n_tokens", "n_removed", "kept_text")

      case None =>
        // distributed arm — pos stays persisted (boundedRows contract):
        // the chain consumes it, and the token join-back reads it again
        // from cache.
        val posDf = pos.toDF("doc_id", "pos", "tok", "is_ref")
        val wDoc = Window.partitionBy($"doc_id").orderBy($"pos".asc)
        var cur = rankedBase(posDf)
        var w = 1
        while (w < width) { cur = doubleRank(cur, w); w *= 2 }
        val elig = $"pos" + lit(width.toLong) <= $"n"
        val ranked = cur.persist()
        val refCnt = ranked.groupBy($"r")
          .agg(sum(when(elig && $"is_ref", 1L).otherwise(0L)).as("rc"))
        val covW = wDoc.rowsBetween(-(width - 1).toLong, 0L)
        // docs are homogeneous (entirely ref or entirely new), so the
        // new-side filter commutes with the per-doc coverage window —
        // apply it before the class join so ref rows never enter the
        // join or the window.
        ranked.filter(!$"is_ref").join(refCnt, Seq("r"))
          .withColumn("d",
            when(elig && $"rc" >= 1L, 1L).otherwise(0L))
          .withColumn("cv", max($"d").over(covW))
          .withColumn("rm", when($"cv" === 1L, 1L).otherwise(0L))
          .join(posDf.select($"doc_id", $"pos", $"tok"),
            Seq("doc_id", "pos"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum($"rm").cast("long").as("n_removed"),
            array_join(
              transform(
                array_sort(collect_list(
                  when($"rm" === 0L, struct($"pos", $"tok")))),
                x => x.getField("tok")),
              " ").as("kept_text"))
          .select($"doc_id", $"n_tokens", $"n_removed", $"kept_text")
    }
  }

  /** Driver-arm helper: corpus-wide width-window occurrence counts. */
  private def windowCount(
      docs: Map[Long, IndexedSeq[String]], w: Int)
      : scala.collection.Map[Seq[String], Long] = {
    val m = scala.collection.mutable.HashMap.empty[Seq[String], Long]
    docs.valuesIterator.foreach { toks =>
      var i = 0
      while (i + w <= toks.length) {
        val k = toks.slice(i, i + w)
        m.update(k, m.getOrElse(k, 0L) + 1L); i += 1
      }
    }
    m
  }

  /** Shared distributed seed: gid, per-doc length, width-1 ranks.
    * Extra input columns (e.g. is_bench) ride along untouched. The
    * width-1 class representative is groupBy(tok) + join back — the
    * token key is the MOST Zipf-skewed class key of the whole chain
    * (a window here is a guaranteed hot-class straggler at corpus
    * scale). gid enforces the packing invariant: >= 2^20 tokens in
    * one document raises rather than silently colliding. The seeded
    * frame is persisted — it feeds the class agg and the join probe. */
  private def rankedBase(pos: DataFrame): DataFrame = {
    import pos.sparkSession.implicits._
    val seeded = pos
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("gid",
        when($"n" < lit(GidShift), $"doc_id" * lit(GidShift) + $"pos")
          .otherwise(raise_error(concat(
            lit("SuffixOps gid packing overflow: document "),
            $"doc_id".cast("string"),
            lit(" has >= 2^20 token positions")))))
      .persist()
    val reps = seeded.groupBy($"tok").agg(min($"gid").as("r"))
    seeded.join(reps, Seq("tok")).drop("tok")
  }

  /** One prefix-doubling round: rank-by-2w from rank-by-w. The `lead`
    * window is per-document (bounded < 2^20 rows by the gid guard);
    * the (r, r2) class representative is agg + join-back — round-1
    * classes are bigrams, still Zipf-skewed. `stepped` is persisted:
    * it feeds the class agg AND the join probe. */
  private def doubleRank(cur: DataFrame, w: Int): DataFrame = {
    import cur.sparkSession.implicits._
    val wDoc = Window.partitionBy($"doc_id").orderBy($"pos".asc)
    val stepped = cur
      .withColumn("r2", lead($"r", w, -1L).over(wDoc))
      .persist()
    val reps = stepped.groupBy($"r", $"r2").agg(min($"gid").as("r_next"))
    stepped.join(reps, Seq("r", "r2"))
      .drop("r", "r2")
      .withColumnRenamed("r_next", "r")
  }
}
