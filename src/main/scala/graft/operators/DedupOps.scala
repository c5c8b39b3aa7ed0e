package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), SimHash (row-local signature + hamming pairs), MinHash+LSH
  * (shingle → signature → band bucket join), and brute-force n-gram
  * Jaccard as the small-N oracle baseline.
  *
  * Scale notes (100 TB):
  *  - signatures are row-local (no shuffle); candidate generation shuffles
  *    on band hash, whose cardinality ≫ executor count;
  *  - LSH bucket join caps bucket size ([[lshCandidates]]'s maxBucket) so
  *    a degenerate key cannot produce an O(n²) bucket;
  *  - brute-force pair ops are quadratic by design — verification-only.
  */
object DedupOps {

  /** Exact dedup: group by a key expression (e.g. [[TextOps.fingerprint]]),
    * keep the minimum id as canonical. One shuffle with map-side partial
    * aggregation. */
  def exactDedup(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(keyCol.as("dup_key"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Engine-independent 32-bit token hash: first 8 hex digits of md5,
    * parsed positionally — reproducible in any SQL engine (used so the
    * DuckDB oracle can recompute SimHash and MinHash exactly). */
  private[operators] def hv32Sql(tokenVar: String): String =
    (1 to 8).map { p =>
      val coef = math.pow(16, 8 - p).toLong
      s"(instr('0123456789abcdef', substr(md5($tokenVar), $p, 1)) - 1) * ${coef}L"
    }.mkString(" + ")

  private val hexChars = array("0123456789abcdef".map(c => lit(c.toString)): _*)

  /** Column form of [[hv32Sql]] — usable inside higher-order-function
    * lambdas where SQL-string expressions can't capture the lambda
    * variable. */
  private[operators] def hv32Col(tok: Column): Column = {
    val m = md5(tok)
    (1 to 8).map { p =>
      val coef = lit(math.pow(16, 8 - p).toLong)
      (array_position(hexChars, substring(m, p, 1)) - 1) * coef
    }.reduce(_ + _)
  }

  /** 32-bit SimHash from a token-row stream (one row per (id, token),
    * duplicates kept — each occurrence votes): 32 codegen'd conditional
    * sums with map-side partial aggregation, one shuffle on the id.
    * A row-local nested-HOF variant was 20× slower at sf0.1 (higher-order
    * functions are interpreted per element) — this is both the local-bench
    * and the 100 TB shape. Docs with zero tokens produce no output row. */
  def simhash32FromTokenRows(tokenRows: DataFrame, idCol: String,
                             tokCol: String, out: String): DataFrame = {
    val withHv = tokenRows.withColumn("__hv", expr(hv32Sql(tokCol)))
    val bitSums = (0 until 32).map(i =>
      sum(expr(s"if((shiftright(__hv, $i) & 1L) = 1L, 1L, -1L)")).as(s"__b$i"))
    withHv.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn(out,
        (0 until 32).map(i =>
          when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _))
      .drop((0 until 32).map("__b" + _): _*)
  }

  /** All pairs within hamming distance `maxHamming` of their SimHash.
    * Quadratic candidate generation (nested-loop self-join on a < b) —
    * verification baseline only; [[simhashPairsBanded]] is the scale
    * path with identical results. */
  def simhashPairs(sigs: DataFrame, idCol: String, sigCol: String,
                   maxHamming: Int): DataFrame = {
    val a = sigs.select(col(idCol).as("doc_a"), col(sigCol).as("sig_a"))
    val b = sigs.select(col(idCol).as("doc_b"), col(sigCol).as("sig_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Hamming-threshold self-join via pigeonhole banding — EXACT (not
    * approximate): split the `bits`-bit signature into `maxHamming + 1`
    * disjoint bit-bands; a pair within `maxHamming` differs in at most
    * `maxHamming` bands and therefore matches EXACTLY on ≥ 1 band.
    * Candidates come from hash equi-joins on (band, band_value) instead
    * of an O(n²) nested loop; exact hamming verifies them. Shuffles on
    * the band value — same result set as [[simhashPairs]]. */
  def simhashPairsBanded(sigs: DataFrame, idCol: String, sigCol: String,
                         maxHamming: Int, bits: Int = 32): DataFrame = {
    val nBands = maxHamming + 1
    val width = bits / nBands
    val bandCols = (0 until nBands).map { i =>
      val lo = i * width
      val len = if (i == nBands - 1) bits - lo else width
      val mask = (1L << len) - 1
      struct(lit(i).as("band"),
        expr(s"shiftright($sigCol, $lo) & ${mask}L").as("bv"))
    }
    val banded = sigs.select(col(idCol), col(sigCol),
      explode(array(bandCols: _*)).as("b"))
      .select(col(idCol), col(sigCol), col("b.band"), col("b.bv"))
    val cands = banded
      .select(col(idCol).as("doc_a"), col(sigCol).as("sig_a"),
        col("band"), col("bv"))
      .join(banded.select(col(idCol).as("doc_b"), col(sigCol).as("sig_b"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
    cands
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  /** MinHash signature (k independent hash functions) over a distinct
    * shingle-set column. Row-local; per-function salted positional-md5
    * hashes (engine-independent, so an external oracle can recompute
    * signatures exactly). Prefer [[minhashSignatures]] (explode form)
    * for large inputs — HOFs interpret per element. */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet,
        s => hv32Col(concat(i.cast("string"), lit("#"), s)))))

  /** MinHash signatures from a distinct shingle-row stream: k codegen'd
    * min-aggregates (map-side partial min), one shuffle on the id — the
    * scale path. Hash = salted positional-md5 ([[hv32Sql]]), identical
    * to [[minhashSignature]] and recomputable in DuckDB SQL.
    * Output: (id, sig array<long>). */
  def minhashSignatures(shingleRows: DataFrame, idCol: String,
                        shingleCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(expr(hv32Sql(s"concat('$i#', $shingleCol)"))).as(s"__h$i"))
    shingleRows.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until k).map(i => col(s"__h$i")): _*))
      .select(col(idCol), col("sig"))
  }

  /** LSH banding: explode a MinHash signature into (band_id, band_hash)
    * rows; docs sharing any band bucket are candidates. The bucket key
    * is the band's value string (not an engine hash of it) — same
    * shuffle cardinality, deterministic across engines; a 4-long band
    * key is a few dozen bytes, so the wider shuffle key is noise. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rows: Int): DataFrame = {
    val bandIdx = explode(sequence(lit(0), lit(bands - 1))).as("band_id")
    df.select(col(idCol), col(sigCol), bandIdx)
      .withColumn("band_hash", concat_ws(",", expr(
        s"transform(slice($sigCol, band_id * $rows + 1, $rows), x -> cast(x AS string))")))
      .select(col(idCol), col("band_id"), col("band_hash"))
  }

  /** Candidate pairs from band buckets (shuffle on band_hash only).
    * `maxBucket` guards against degenerate buckets turning quadratic. */
  def lshCandidates(bandTable: DataFrame, idCol: String,
                    maxBucket: Int = 1000): DataFrame = {
    val buckets = bandTable
      .groupBy("band_id", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(least(x, y) AS a, greatest(x, y) AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
