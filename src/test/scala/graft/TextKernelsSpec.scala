package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextKernels

class TextKernelsSpec extends AnyFunSuite {

  val doc = "the quick brown fox jumps over the lazy dog again and again today"
  val docEdited = "the quick brown fox jumps over the lazy dog again and again yesterday"

  test("hashSlice is deterministic and seed-sensitive") {
    val a = TextKernels.hashSlice(doc, 0, 9, 0L)
    assert(a == TextKernels.hashSlice(doc, 0, 9, 0L))
    assert(a != TextKernels.hashSlice(doc, 0, 9, 1L))
  }

  test("winnow: local edit preserves most fingerprints") {
    val a = TextKernels.winnow(doc, 8, 4).toSet
    val b = TextKernels.winnow(docEdited, 8, 4).toSet
    val overlap = a.intersect(b).size.toDouble / a.size
    assert(overlap > 0.6, s"overlap $overlap")
    assert(a.nonEmpty && TextKernels.winnow("", 8, 4).isEmpty)
  }

  test("winnow output is much smaller than gram count") {
    val fp = TextKernels.winnow(doc * 20, 8, 4)
    assert(fp.length < doc.length * 20 / 2)
  }

  test("md5 kernels match DuckDB golden values (cross-engine byte contract)") {
    // goldens computed with DuckDB 1.0.0: md5_number_lower = little-endian
    // read of md5 digest bytes 8..15; any drift here breaks the q23/q27
    // oracles before the gate would even see it
    assert(TextKernels.md5Lower("abc") == 8250560606382298838L)
    assert(TextKernels.simhashMd5("the quick brown fox jumps") ==
      2205513267393430125L)
    assert(TextKernels.winnowMd5("abcdefghijklmno", 8, 4).toSeq ==
      Seq(1340583416817390065L, 1758791680945260881L, 1973960469362181949L))
  }

  test("md5 char shingles: md5Lower of the string shingles, hash-distinct") {
    // same gram extraction as charShingles, each gram through md5Lower —
    // the int64 token domain q149 rides (DuckDB recomputes it via
    // md5_number_lower); distinctness is on the hash
    val s = "abcdefabcdef"
    assert(TextKernels.charShinglesMd5(s, 5).toSeq ==
      TextKernels.charShingles(s, 5).map(TextKernels.md5Lower).toSeq)
    assert(TextKernels.charShinglesMd5("abcd", 5).isEmpty) // n < k
    assert(TextKernels.charShinglesMd5("abc", 3).toSeq ==
      Seq(TextKernels.md5Lower("abc")))
  }

  test("md5 winnow edge conventions match the SQL range semantics") {
    // < k chars, or < w grams: empty on both engines
    assert(TextKernels.winnowMd5("1234567", 8, 4).isEmpty)   // n < k
    assert(TextKernels.winnowMd5("1234567890", 8, 4).isEmpty) // 3 grams < w
    assert(TextKernels.winnowMd5("12345678901", 8, 4).length == 1) // 4 grams
    // values are 63-bit non-negative (BIGINT-comparable in SQL)
    assert(TextKernels.winnowMd5(doc, 8, 4).forall(_ >= 0L))
  }

  test("word n-grams: distinct, first-occurrence order, whitespace-normalized") {
    assert(TextKernels.wordNgrams("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(TextKernels.wordNgrams("a  b\tc", 3).toSeq == Seq("a b c"),
      "grams join with single spaces regardless of source whitespace")
    assert(TextKernels.wordNgrams("x y x y x y", 2).toSeq ==
      Seq("x y", "y x"), "duplicates collapse to first occurrence")
    assert(TextKernels.wordNgrams("a b", 3).isEmpty)
    assert(TextKernels.wordNgrams("", 2).isEmpty)
  }

  test("md5 simhash: local edit is hamming-close, tokenization is ASCII-\\s") {
    val a = TextKernels.simhashMd5(doc)
    val b = TextKernels.simhashMd5(docEdited)
    assert(TextKernels.hamming64(a, b) <= 12)
    // unicode NBSP is NOT a separator (matches regex \S+ in both engines)
    assert(TextKernels.simhashMd5("a\u00A0b") == TextKernels.simhashMd5("a\u00A0b"))
    assert(TextKernels.simhashMd5("a\u00A0b") != TextKernels.simhashMd5("a b"))
  }

  test("simhash: similar docs are hamming-close, different docs far") {
    val a = TextKernels.simhash64(doc)
    val b = TextKernels.simhash64(docEdited)
    val c = TextKernels.simhash64("completely unrelated content about databases and query engines")
    assert(TextKernels.hamming64(a, b) <= 12)
    assert(TextKernels.hamming64(a, c) > 12)
    assert(TextKernels.hamming64(a, a) == 0)
  }

  test("minhash signature estimates jaccard of shingle sets") {
    val sigA = TextKernels.minhashSig(doc, 3, 256)
    val sigB = TextKernels.minhashSig(docEdited, 3, 256)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 256
    val shA = TextKernels.shingleHashes(doc, 3).toSet
    val shB = TextKernels.shingleHashes(docEdited, 3).toSet
    val exact = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }

  test("minhash identical docs have identical signatures") {
    assert(TextKernels.minhashSig(doc, 3, 64).sameElements(TextKernels.minhashSig(doc, 3, 64)))
  }

  test("shingleHashes: sorted, distinct, count = tokens - shingle + 1 when unique") {
    val sh = TextKernels.shingleHashes("a b c d e", 3)
    assert(sh.length == 3)
    assert(sh.sorted.sameElements(sh))
    assert(sh.distinct.length == sh.length)
  }

  test("kernels survive arbitrary unicode and degenerate inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // mixed ASCII / CJK / emoji / combining marks / control chars /
    // whitespace floods — every kernel must return deterministically,
    // never throw
    val weird = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("的是不我了在有"),
      Gen.const("😀🎉"), // surrogate pairs
      Gen.const("éé"),           // combining marks
      Gen.const("   \t\n  "),
      Gen.const(""),
      Gen.const("x" * 300)                   // one giant token
    )).map(_.mkString(" "))
    val prop = Prop.forAllNoShrink(weird) { s =>
      val runs = (1 to 2).map { _ =>
        (TextKernels.simhash64(s),
          TextKernels.minhashSig(s, 3, 16).toSeq,
          TextKernels.winnow(s, 8, 4).toSeq,
          TextKernels.shingleHashes(s, 3).toSeq,
          TextKernels.langScores(s).toSeq,
          TextKernels.stripAccents(s),
          TextKernels.nfcNormalize(s),
          TextKernels.simhashMd5(s),
          TextKernels.winnowMd5(s, 8, 4).toSeq)
      }
      runs(0) == runs(1)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(result.passed, result.status.toString)
  }
}
