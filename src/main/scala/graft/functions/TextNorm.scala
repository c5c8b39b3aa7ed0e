package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local text-normalization kernels shared by the interpreted eval and
  * the generated code of the expressions below (the UriCodec pattern).
  *
  * A training-data pipeline normalizes and profiles text BEFORE hashing or
  * filtering it — Unicode-equivalent byte sequences must fingerprint
  * identically (NFC), and character-distribution entropy is the standard
  * cheap gibberish/binary-junk signal. Both are pure per-row passes: no
  * shuffle, no UDF serialization, whole-stage codegen keeps them inside
  * the scan's pipeline.
  */
object TextNormOps {

  /** Unicode NFC (canonical composition). */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Character-distribution Shannon entropy in floor-quantized nano-nats,
    * summed per codepoint occurrence: Σ_c k_c * floor(1e9 * ln(n / k_c)),
    * where k_c is the count of codepoint c and n the total codepoints.
    * Quantizing each distinct-codepoint term to an integer BEFORE the sum
    * (the q73 engine-exactness scheme) makes the result identical across
    * engines regardless of summation order; divide by n for nano-nats
    * per character. Empty input returns 0.
    */
  def entropyNanoSum(s: String): Long = {
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next().toLong
      sum += k * math.floor(math.log(n.toDouble / k) * 1e9).toLong
    }
    sum
  }

  /** Jaro–Winkler similarity floor-quantized to milli — the kernel
    * behind `jaro_winkler_milli(a, b)` (q270). Textbook algorithm
    * (match window floor(max/2)−1, transpositions = mismatched
    * matched-sequence positions / 2, Winkler prefix boost 0.1·l up to
    * l = 4 applied only when jaro > 0.7) — verified value-identical
    * to DuckDB's native `jaro_winkler_similarity` on the classic test
    * vectors (MARTHA/MARHTA 0.9611, DIXON/DICKSONX 0.8133, boost
    * threshold probes) so the oracle is an INDEPENDENT implementation
    * of the same spec, not a replay. Milli floor absorbs last-ulp
    * association-order differences. Empty input scores 0. */
  def jaroWinklerMilli(a: String, b: String): Long =
    math.floor(jaroWinkler(a, b) * 1000).toLong

  private def jaroWinkler(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val la = a.length; val lb = b.length
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }

  /** Unrestricted Damerau–Levenshtein edit distance (Lowrance–Wagner:
    * insert / delete / substitute / transpose-with-drift, the full
    * metric — NOT the restricted OSA variant) over UTF-8 BYTES — the
    * kernel behind `damerau_levenshtein(a, b)` (q280). Byte (not
    * codepoint) alphabet deliberately: DuckDB's native
    * `damerau_levenshtein` is byte-based (measured:
    * 'ùnïcode'→'unicode' = 4, two 2-byte substitutions), so the
    * byte-for-byte kernel makes the oracle an INDEPENDENT
    * implementation agreeing exactly (q270's oracle form). Classic
    * probes pinned in ScalarFnSpec: CA→ABC = 2 (the case OSA gets
    * wrong at 3), ab→ba = 1, kitten→sitting = 3. O(|a|·|b|) DP with a
    * 256-entry last-seen row per byte value. */
  def damerauLevenshtein(ab: Array[Byte], bb: Array[Byte]): Long = {
    val n = ab.length; val m = bb.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(bb(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (ab(i - 1) == bb(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da(ab(i - 1) & 0xff) = i
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }

  /** Distinct codepoint-n-gram count in one tight pass — the kernel
    * behind `char_ngram_distinct(text, n)` (q256). Codepoint-aligned
    * windows mirror SQL `substring` semantics, so the result equals
    * `size(array_distinct(transform(sequence(1, length-n+1),
    * i -> substring(text, i, n))))` exactly — without materializing
    * the gram array or paying the interpreted higher-order-function
    * lambda per element. Strings shorter than n count 0. */
  def charNgramDistinct(s: String, n: Int): Long = {
    val cps = s.codePoints().toArray
    if (cps.length < n) return 0L
    val set = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(n + 1)
    var i = 0
    var count = 0L
    while (i + n <= cps.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) { sb.appendCodePoint(cps(i + j)); j += 1 }
      if (set.add(sb.toString)) count += 1
      i += 1
    }
    count
  }

  /** Winnowing fingerprint count (Schleimer et al. 2003, the MOSS
    * local fingerprinting algorithm): hash every codepoint k-gram with
    * the engine-portable hv32 (first 4 md5 bytes, exactly the
    * positional-md5 parse the DuckDB oracles replay), slide a window
    * of w consecutive gram hashes, keep each window's minimum, and
    * return the DISTINCT count of kept fingerprints. The winnowing
    * guarantee: any shared substring of length >= k + w - 1 yields at
    * least one shared fingerprint — the principled version of the
    * fixed-stride sampling in q30/q77. Strings with fewer than w
    * k-grams return 0. */
  def winnowDistinct(s: String, k: Int, w: Int): Long = {
    val cps = s.codePoints().toArray
    val ng = cps.length - k + 1
    if (ng < w) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](ng)
    val sb = new java.lang.StringBuilder(k + 1)
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < k) { sb.appendCodePoint(cps(i + j)); j += 1 }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      hs(i) = java.lang.Integer.toUnsignedLong(
        ((dig(0) & 0xff) << 24) | ((dig(1) & 0xff) << 16) |
          ((dig(2) & 0xff) << 8) | (dig(3) & 0xff))
      md.reset()
      i += 1
    }
    val set = new java.util.HashSet[java.lang.Long]()
    var p = 0
    while (p + w <= ng) {
      var m = Long.MaxValue
      var q = 0
      while (q < w) { if (hs(p + q) < m) m = hs(p + q); q += 1 }
      set.add(m)
      p += 1
    }
    set.size.toLong
  }

  /** Maximum multiplicity of any codepoint n-gram — the MODE of the
    * per-doc gram distribution, behind `char_ngram_max_count(text, n)`
    * (q291). A single dominant gram (one 4-gram covering 5%+ of the
    * stream) is the looped-generation / repeated-template signature
    * that [[charNgramDistinct]]'s distinct-RATIO can miss when the
    * rest of the doc is diverse. Same codepoint-window semantics as
    * the distinct kernel, so SQL `substr` explode replays it exactly.
    * Strings shorter than n return 0. */
  def charNgramMaxCount(s: String, n: Int): Long = {
    val cps = s.codePoints().toArray
    if (cps.length < n) return 0L
    val m = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder(n + 1)
    var i = 0
    var best = 0
    while (i + n <= cps.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) { sb.appendCodePoint(cps(i + j)); j += 1 }
      val c = m.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }
}

/** Unicode NFC normalization as a codegen'd Catalyst expression —
  * `nfc_normalize(text)`. DuckDB's built-in of the same name is the
  * oracle counterpart. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextNormOps.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.TextNormOps.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Codepoint-distribution entropy sum in nano-nats —
  * `char_entropy_nano_sum(text)`; divide by the codepoint count for
  * per-char entropy. One pass over the string, no explode: at corpus
  * scale this replaces a per-character Generate + two shuffles with a
  * row-local kernel. */
case class CharEntropyNanoSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_nano_sum"

  override def nullSafeEval(input: Any): Any =
    TextNormOps.entropyNanoSum(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormOps.entropyNanoSum($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyNanoSum =
    copy(child = newChild)
}

/** Distinct codepoint-n-gram count as a codegen'd Catalyst expression —
  * `char_ngram_distinct(text, n)` with a FOLDABLE gram width. The
  * row-local kernel replaces a 4M-row Generate + (doc, gram) shuffle
  * pair (first cut of q256: 3.8 s) and the interpreted
  * transform+array_distinct HOF chain (second cut: 2.1 s) with one
  * whole-stage-codegen call per row (0.68 s at sf0.1). */
case class CharNgramDistinct(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_ngram_distinct"

  override def nullSafeEval(input: Any): Any =
    TextNormOps.charNgramDistinct(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormOps.charNgramDistinct($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramDistinct =
    copy(child = newChild)
}

/** Max codepoint-n-gram multiplicity as a codegen'd Catalyst expression —
  * `char_ngram_max_count(text, n)` with a FOLDABLE gram width. The
  * row-local HashMap kernel keeps the gram stream inside whole-stage
  * codegen (the q256 A/B lesson: explode + (doc, gram) shuffle is 5×
  * the kernel's cost), and per-doc gram maps are bounded by doc length
  * so the map fits task memory at any corpus size. */
case class CharNgramMaxCount(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_ngram_max_count"

  override def nullSafeEval(input: Any): Any =
    TextNormOps.charNgramMaxCount(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormOps.charNgramMaxCount($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramMaxCount =
    copy(child = newChild)
}

/** Winnowing fingerprint count as a codegen'd Catalyst expression —
  * `winnow_distinct(text, k, w)` with FOLDABLE k and w. Row-local:
  * gram hashing, the sliding-window minimum scan, and the distinct
  * set all stay inside whole-stage codegen; the hash is the shared
  * hv32 (positional md5) so the DuckDB oracle replays it exactly via
  * list_transform + list_min + list_distinct. */
case class WinnowDistinct(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_distinct"

  override def nullSafeEval(input: Any): Any =
    TextNormOps.winnowDistinct(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormOps.winnowDistinct($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowDistinct =
    copy(child = newChild)
}

/** Jaro–Winkler similarity (milli) as a codegen'd Catalyst expression —
  * `jaro_winkler_milli(a, b)`. Spark has `levenshtein` but no
  * Jaro–Winkler; the entity-resolution literature prefers JW for short
  * name-like strings (prefix-weighted, length-normalized). DuckDB's
  * native `jaro_winkler_similarity` is the independent oracle. */
case class JaroWinklerMilli(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_milli"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextNormOps.jaroWinklerMilli(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextNormOps.jaroWinklerMilli($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerMilli =
    copy(left = newLeft, right = newRight)
}

/** Unrestricted Damerau–Levenshtein distance as a codegen'd Catalyst
  * expression — `damerau_levenshtein(a, b)`. Spark ships `levenshtein`
  * only; the spell-error / OCR-noise literature wants the transposition
  * move (teh→the is 1 edit, not 2). DuckDB's native
  * `damerau_levenshtein` is the independent oracle (both byte-based —
  * see the kernel scaladoc). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextNormOps.damerauLevenshtein(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextNormOps.damerauLevenshtein($a.getBytes(), $b.getBytes())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
