package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text kernels backing the custom Catalyst expressions in
  * [[TextExpressions]]. Pure JVM, allocation-light, deterministic — these
  * run inside whole-stage codegen via static calls, so they must not touch
  * Spark state.
  *
  * Hashing is FNV-1a 64-bit plus a splitmix64 finalizer (public-domain
  * constructions) — stable across JVMs and Spark versions, unlike
  * `String.hashCode`-derived schemes.
  */
object TextKernels {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** FNV-1a over a char slice, splitmix64-finished. */
  def hashSlice(s: String, from: Int, until: Int, seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= FnvPrime
      i += 1
    }
    mix64(h)
  }

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * rolling k-gram hashes, minimum per sliding window of `w`, consecutive
    * duplicates collapsed. Returns a small sorted-by-position fingerprint
    * set — robust to local edits, O(len) time, O(len/w) output.
    */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    if (n < k) return if (n == 0) Array.empty else Array(hashSlice(s, 0, n, 0L))
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i < grams.length) { grams(i) = hashSlice(s, i, i + k, 0L); i += 1 }
    if (grams.length <= w) return Array(grams.min)
    val out = new scala.collection.mutable.ArrayBuffer[Long](grams.length / w + 1)
    var lastMinIdx = -1
    var start = 0
    while (start + w <= grams.length) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (grams(j) <= grams(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastMinIdx) { out += grams(minIdx); lastMinIdx = minIdx }
      start += 1
    }
    out.toArray
  }

  /** 64-bit SimHash over whitespace tokens (Charikar, STOC'02): per-token
    * 64-bit hash votes ±1 on each bit; sign of the tally is the bit.
    */
  def simhash64(s: String): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val h = hashSlice(s, start, i, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature over word `shingle`-grams. The `num` hash
    * functions use the standard two-hash construction h_i = h1 + i·h2
    * (Kirsch & Mitzenmacher 2006: pairwise-independent family from two
    * base hashes): 2 finalizations + `num` fused multiply-adds per gram
    * instead of `num` full remixes — ~5× less hashing on the corpus-wide
    * signature pass, which is the dominant narrow-stage cost of the LSH
    * dedup pipeline. O(tokens × num) per row, no shuffle — banding
    * happens downstream in the DataFrame plan.
    */
  def minhashSig(s: String, shingle: Int, num: Int): Array[Long] = {
    // token boundaries
    val bounds = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) { bounds += start; bounds += i }
    }
    val nTok = bounds.length / 2
    val sig = Array.fill(num)(Long.MaxValue)
    if (nTok < shingle) {
      if (nTok == 0) return sig
      // degenerate: hash the whole token run once per seed
      val from = bounds(0); val until = bounds(bounds.length - 1)
      var h = 0
      while (h < num) { sig(h) = hashSlice(s, from, until, h.toLong); h += 1 }
      return sig
    }
    var t = 0
    while (t + shingle <= nTok) {
      val from = bounds(2 * t)
      val until = bounds(2 * (t + shingle - 1) + 1)
      val h1 = hashSlice(s, from, until, 0L)
      val h2 = mix64(h1) | 1L // odd => h2 generates all of Z/2^64
      var v = h1
      var h = 0
      while (h < num) {
        if (v < sig(h)) sig(h) = v
        v += h2
        h += 1
      }
      t += 1
    }
    sig
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct hashed word `shingle`-grams, sorted — the exact set behind
    * the MinHash estimate, for true-Jaccard verification of candidate
    * pairs (jaccard = |intersect| / |union| over these arrays).
    */
  def shingleHashes(s: String, shingle: Int): Array[Long] = {
    val bounds = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) { bounds += start; bounds += i }
    }
    val nTok = bounds.length / 2
    if (nTok == 0) return Array.empty
    if (nTok < shingle) {
      return Array(hashSlice(s, bounds(0), bounds(bounds.length - 1), 0L))
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    var t = 0
    while (t + shingle <= nTok) {
      set.add(hashSlice(s, bounds(2 * t), bounds(2 * (t + shingle - 1) + 1), 0L))
      t += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Marker-word sets for single-pass language scoring — shared source of
    * truth with the q22 oracle (keep in lockstep with
    * [[graft.queries.TextAnalysis.markers]]).
    */
  val langMarkers: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "is", "in", "that"),
    "de" -> Array("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es" -> Array("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Array("le", "la", "et", "les", "des", "est", "une"),
    "zh" -> Array("的", "是", "不", "我", "了", "在", "有"))

  private val markerIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langMarkers.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  /** One pass over the text: lowercase tokens, count DISTINCT marker hits
    * per language (= `size(array_intersect(tokens, markers))` semantics).
    * Replaces 5 regex tokenizations + 5 array intersections per row.
    */
  def langScores(s: String): Array[Long] = {
    val seen = new java.util.HashSet[String]()
    val scores = new Array[Long](langMarkers.length)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start && i - start <= 8) { // markers are short words
        val tok = s.substring(start, i).toLowerCase
        val langs = markerIndex.get(tok)
        if (langs != null && seen.add(tok)) {
          var j = 0
          while (j < langs.length) { scores(langs(j)) += 1; j += 1 }
        }
      }
    }
    scores
  }

  /** NFD-decompose then drop combining marks — byte-identical to
    * DuckDB's strip_accents for the Latin range (verified in q86's
    * oracle). Precompiled pattern; the normalizer is stateless/static.
    */
  private val marks = java.util.regex.Pattern.compile("\\p{M}")
  def stripAccents(s: String): String =
    marks.matcher(java.text.Normalizer.normalize(
      s, java.text.Normalizer.Form.NFD)).replaceAll("")

  /** Canonical composition (NFC) — the normalization every dedup/hash
    * pass should apply first so visually-identical strings hash equal.
    */
  def nfcNormalize(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  // ---- MD5-parameterized kernel variants -------------------------------
  // Same operators as simhash64/winnow, with the per-token / per-gram hash
  // swapped from the fast FNV+splitmix scheme to MD5's second 8 bytes read
  // little-endian — the exact value DuckDB's `md5_number_lower` returns.
  // That single substitution makes the WHOLE pipeline (hash → vote/min →
  // hamming/fingerprint decision) recomputable in ANSI-ish SQL, so q23 and
  // q27 graduate from rows-only checks to full cross-engine hash oracles.
  // The FNV variants stay the throughput default (~10× cheaper per gram);
  // both are registered SQL functions, and the choice is a parameter of
  // the dedup pipeline, not a fork of it.

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian long of MD5 digest bytes 8..15 of the UTF-8 encoding —
    * bit-identical (as a signed reinterpretation) to DuckDB 1.x
    * `md5_number_lower`.
    */
  def md5Lower(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h
  }

  /** ASCII-whitespace test matching Java/RE2 regex `\s` ([ \t\n\x0B\f\r])
    * exactly — NOT `Character.isWhitespace`, whose Unicode extras would
    * silently diverge from the `regexp_extract_all(text, '\S+')` oracle
    * tokenization.
    */
  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** SimHash over `\S+` tokens with MD5 token hashes (oracle-recomputable
    * twin of [[simhash64]]): every token votes ±1 per bit, bit set iff the
    * tally is strictly positive.
    */
  def simhashMd5(s: String): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isAsciiSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isAsciiSpace(s.charAt(i))) i += 1
      if (i > start) {
        val h = md5Lower(s.substring(start, i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprint SET with MD5 char-gram hashes, masked to 63
    * bits so every value is non-negative and BIGINT-comparable in SQL.
    * Set semantics (distinct window minima, sorted) rather than
    * [[winnow]]'s position-collapsed sequence: the set is what the
    * dedup/overlap decision consumes, and it is exactly `list_distinct`
    * of per-window `list_min` in SQL. Inputs shorter than k, or with
    * fewer than w grams, fingerprint to empty (the SQL `range` produces
    * no windows there — one convention, both engines).
    */
  def winnowMd5(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array.emptyLongArray
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i < grams.length) {
      grams(i) = md5Lower(s.substring(i, i + k)) & Long.MaxValue
      i += 1
    }
    if (grams.length < w) return Array.emptyLongArray
    val fps = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= grams.length) {
      var m = grams(start)
      var j = start + 1
      while (j < start + w) { if (grams(j) < m) m = grams(j); j += 1 }
      fps.add(m)
      start += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Distinct space-joined word n-grams in first-occurrence order — the
    * single-pass kernel twin of
    * `array_distinct(transform(sequence(...), i -> concat(element_at...)))`
    * (one tokenizer pass + substring slices instead of n array probes and
    * n-1 concats per gram). Tokens split on ASCII whitespace, matching
    * regex `\S+` in both Java and RE2, so the output strings are exactly
    * DuckDB's `list_distinct(list_transform(range(...), ...))` grams.
    */
  def wordNgrams(s: String, n: Int): Array[String] = {
    val bounds = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isAsciiSpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isAsciiSpace(s.charAt(i))) i += 1
      if (i > start) { bounds += start; bounds += i }
    }
    val nTok = bounds.length / 2
    if (nTok < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var t = 0
    while (t + n <= nTok) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(s, bounds(2 * (t + k)), bounds(2 * (t + k) + 1))
        k += 1
      }
      seen.add(sb.toString)
      t += 1
    }
    val out = new Array[String](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  // ---- UTF8String/ArrayData bridges for codegen ----

  def stripAccentsBridge(s: UTF8String): UTF8String =
    UTF8String.fromString(stripAccents(s.toString))

  def nfcNormalizeBridge(s: UTF8String): UTF8String =
    UTF8String.fromString(nfcNormalize(s.toString))

  def winnowBridge(s: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(winnow(s.toString, k, w))

  def simhashBridge(s: UTF8String): Long = simhash64(s.toString)

  def simhashMd5Bridge(s: UTF8String): Long = simhashMd5(s.toString)

  def winnowMd5Bridge(s: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(winnowMd5(s.toString, k, w))

  /** Distinct character k-grams in first-occurrence order — one pass,
    * the codegen kernel behind q149's shingle sets (the higher-order
    * transform+array_distinct composition costs ~3 s per evaluation at
    * sf0.1; this kernel is a single substring+HashSet sweep).
    */
  def charShingles(s: String, k: Int): Array[String] = {
    val len = s.length
    if (len < k) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= len) { seen.add(s.substring(i, i + k)); i += 1 }
    val out = new Array[String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Distinct character k-gram MD5 hashes — the int64 token domain for
    * [[graft.operators.SetSimJoin]]: prefix AND verify stages shuffle
    * longs instead of k-char strings (q149's top bench cost was the
    * candidate verify moving `array<string>` both ways). Gram extraction
    * is IDENTICAL to [[charShingles]]; each gram is hashed with
    * [[md5Lower]] so DuckDB recomputes the exact domain as
    * `list_distinct(list_transform(grams, g -> md5_number_lower(g)))`.
    * Distinctness is on the HASH: a (negligible, 64-bit md5) collision
    * conflates the same two grams in both engines, so the cross-engine
    * compare stays exact. First-occurrence order; downstream set ops are
    * order-invariant.
    */
  def charShinglesMd5(s: String, k: Int): Array[Long] = {
    val len = s.length
    if (len < k) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + k <= len) { seen.add(md5Lower(s.substring(i, i + k))); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def charShinglesMd5Bridge(s: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(charShinglesMd5(s.toString, k))

  /** dHash-style 64-bit perceptual fingerprint of a byte payload — the
    * multimodal near-dup hash (q152). The classic image dHash resizes to
    * a 9×8 grayscale grid and sets bit j iff cell j is brighter than cell
    * j+1; the decode-to-grayscale step is this container's stub (see
    * Multimodal.decodeStub), so the "pixel stream" here is the raw byte
    * sequence: the payload is carved into 65 equal-width blocks (FIXED
    * block COUNT, like a resize — the fingerprint is 64 bits at any
    * payload size) and bit j is set iff block j's mean unsigned-byte
    * value exceeds block j+1's. Means are compared by cross-multiplying
    * integer sums (s_j·c_{j+1} > s_{j+1}·c_j) so the decision is exact
    * in both engines — no float division; safe from overflow below ~10^8
    * bytes (sum ≤ 255n, count ≤ n/65+1). Payloads shorter than 65 bytes
    * yield empty blocks (s=0, c=0), whose comparisons are 0 > 0 = false
    * on both engines — one convention, deterministic. A local edit
    * perturbs one block's sum, flipping at most bits j-1 and j, which is
    * what makes hamming-banded near-dup detection work on it. DuckDB
    * recomputes every bit over `ord(text[i:i])` (byte == code point on
    * this printable-ASCII corpus), so the full pipeline is hash-oracled.
    */
  def dhash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var b = 0
    while (b < 65) {
      val start = b * n / 65
      val end = (b + 1) * n / 65
      cnts(b) = end - start
      var s = 0L
      var i = start
      while (i < end) { s += bytes(i) & 0xff; i += 1 }
      sums(b) = s
      b += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * cnts(j + 1) > sums(j + 1) * cnts(j)) out |= (1L << j)
      j += 1
    }
    out
  }

  def wordNgramsBridge(s: UTF8String, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      wordNgrams(s.toString, n).map(g => UTF8String.fromString(g): Any))

  def charShinglesBridge(s: UTF8String, k: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      charShingles(s.toString, k).map(g => UTF8String.fromString(g): Any))

  def minhashBridge(s: UTF8String, shingle: Int, num: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhashSig(s.toString, shingle, num))

  def shingleBridge(s: UTF8String, shingle: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingleHashes(s.toString, shingle))

  def langScoresBridge(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(langScores(s.toString))
}
