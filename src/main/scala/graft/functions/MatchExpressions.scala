package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Record-matching / layout kernels: Jaro-Winkler string similarity (the
  * standard Winkler'90 refinement of Jaro'89, as implemented by DuckDB's
  * `jaro_winkler_similarity` — verified bitwise-identical over a 3k-pair
  * fuzz corpus), a 2-D Morton (Z-order) interleave for multi-dimensional
  * clustering/data-skipping layouts, and the raw `md5_number_lower` hash
  * (DuckDB-compatible) for reproducible hash-derived uniforms.
  *
  * Jaro-Winkler character-unit contract: the kernel iterates UNICODE
  * CODE POINTS (surrogate pairs count as one character), so its metric
  * agrees with Spark's `length()` for ALL text — including
  * supplementary-plane (emoji) input — which is what makes the
  * JaroWinklerPruning 5t−4 length guard sound universally (fuzz-pinned
  * over ASCII, multi-byte BMP, and astral corpora, plus a direct
  * transposition case a code-unit walk would score 0.0). The "bitwise-
  * identical to DuckDB" claim holds for ASCII, where bytes == code
  * points (DuckDB walks UTF-8 bytes, so multi-byte text diverges
  * between the engines by construction — q115's oracle corpus is
  * ASCII).
  *
  * Pure JVM, allocation-light, deterministic — called statically from
  * whole-stage codegen via the expressions below.
  */
object MatchKernels {

  /** Jaro similarity, IEEE-op-order matched to DuckDB: 0.0 when either
    * side is empty, 1.0 when equal, else (m/l1 + m/l2 + (m-t)/m)/3 with
    * the standard floor(max/2)-1 match window and half-transposition
    * count.
    */
  /** Decode to code points. Surrogate-free strings (ASCII/BMP — the
    * overwhelming hot path) take a straight char copy; only text that
    * actually contains a surrogate pays the codePointAt walk.
    */
  private def codePoints(s: String): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n)
    var i = 0
    while (i < n && !Character.isHighSurrogate(s.charAt(i))) {
      out(i) = s.charAt(i); i += 1
    }
    if (i == n) return out
    var k = i
    while (i < n) {
      val cp = s.codePointAt(i)
      out(k) = cp; k += 1; i += Character.charCount(cp)
    }
    java.util.Arrays.copyOf(out, k)
  }

  def jaro(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val c1 = codePoints(s1)
    val c2 = codePoints(s2)
    val l1 = c1.length
    val l2 = c2.length
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && c1(i) == c2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (c1(i) != c2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Winkler refinement: common-prefix boost (cap 4 code points, weight
    * 0.1) applied only above the classic 0.7 threshold — DuckDB's exact
    * semantics (on the ASCII parity surface).
    */
  def jaroWinkler(s1: String, s2: String): Double = {
    var sim = jaro(s1, s2)
    if (sim > 0.7) {
      var p = 0
      var i1 = 0
      var i2 = 0
      while (p < 4 && i1 < s1.length && i2 < s2.length && {
        val cp1 = s1.codePointAt(i1)
        cp1 == s2.codePointAt(i2) && {
          i1 += Character.charCount(cp1); i2 += Character.charCount(cp1); true
        }
      }) p += 1
      sim = sim + p * 0.1 * (1 - sim)
    }
    sim
  }

  def jwBridge(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * word (the classic magic-mask Morton step).
    */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 2-D Morton code over the low 16 bits of each input: x on even bits,
    * y on odd bits — a 32-bit Z-value whose sort order interleaves both
    * dimensions (Morton 1966; the layout key behind Z-order clustering).
    */
  def zorder16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** N-D Morton code: bit `i` of dimension `d` lands at output position
    * `i*n + d`, over the low `63/n` bits of each input (n=2 → 31 bits,
    * n=3 → 21, n=4 → 15). The total stays ≤ 63 bits so the SIGN BIT is
    * never set — signed-long sort order equals the unsigned interleave
    * order, which is the property the range-clustered layout sorts on.
    * Inputs beyond the per-dimension budget are masked (like
    * [[zorder16]]): callers bin/scale values into range; the layout
    * verbs re-read real footer stats, so an overflowing bin only costs
    * clustering quality, never correctness.
    */
  def zorderN(xs: Array[Long]): Long = {
    val n = xs.length
    val b = 63 / n
    var out = 0L
    var d = 0
    while (d < n) {
      val v = xs(d) & ((1L << b) - 1L)
      var i = 0
      while (i < b) {
        out |= ((v >>> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    out
  }

  /** N-D Hilbert index over the low `63/n` bits of each input — same
    * bit budget and sign-bit guarantee as [[zorderN]], but consecutive
    * index values are ALWAYS L1-neighbors in coordinate space (the
    * property Morton order lacks at quadrant seams), so a contiguous
    * index range — one range-shuffled file — covers a tighter
    * coordinate box on unaligned boundaries. Algorithm: Skilling's
    * transpose form (J. Skilling, "Programming the Hilbert curve", AIP
    * Conf. Proc. 707, 2004 — the standard public N-D formulation):
    * axes → transpose in place, then gather bit `j` of transposed dim
    * `d` to index position `j*n + (n-1-d)` (dim 0 carries the top bit
    * of each level group). The adjacency property is pinned
    * exhaustively in AdvancedSpec via [[hilbertInvN]].
    */
  def hilbertN(xs: Array[Long]): Long = {
    val n = xs.length
    val b = 63 / n
    val mask = (1L << b) - 1L
    val x = new Array[Long](n)
    var d = 0
    while (d < n) { x(d) = xs(d) & mask; d += 1 }
    // axes → transpose (inverse undo, then Gray encode)
    var q = 1L << (b - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (b - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // gather: level j of dim d → bit j*n + (n-1-d)
    var h = 0L
    d = 0
    while (d < n) {
      var j = 0
      while (j < b) {
        h |= ((x(d) >>> j) & 1L) << (j * n + (n - 1 - d))
        j += 1
      }
      d += 1
    }
    h
  }

  /** Inverse of [[hilbertN]] (Skilling's TransposetoAxes) — spec-side
    * only: the adjacency/round-trip pins need to decode indexes back to
    * coordinates.
    */
  def hilbertInvN(h: Long, n: Int): Array[Long] = {
    val b = 63 / n
    val x = new Array[Long](n)
    var d = 0
    while (d < n) {
      var j = 0
      while (j < b) {
        x(d) |= ((h >>> (j * n + (n - 1 - d))) & 1L) << j
        j += 1
      }
      d += 1
    }
    // transpose → axes (Gray decode, then undo excess work)
    val t0 = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t0
    var q = 2L
    val top = 2L << (b - 1)
    while (q != top) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    x
  }
}

/** Catalyst expressions over [[MatchKernels]] — native `doGenCode` so the
  * similarity/layout math stays inside whole-stage codegen.
  */
object MatchExpressions {
  private val kernels = "graft.functions.MatchKernels"
  private val textKernels = "graft.functions.TextKernels"

  /** Jaro-Winkler similarity of two strings → double in [0, 1]. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      MatchKernels.jwBridge(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernels.jwBridge($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "jaro_winkler"
  }

  /** 2-D Morton interleave of two bigints (low 16 bits each) → bigint. */
  case class ZOrder16(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      MatchKernels.zorder16(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernels.zorder16($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "zorder16"
  }

  /** Shared shape of the N-D space-filling-curve keys: 2-8 bigint
    * dimensions (low `63/n` bits each) → bigint. Null-intolerant: any
    * null dimension nulls the code (the layout verbs cast/bin
    * dimensions first, so a null key row sorts into the null band of
    * the range shuffle, exactly like [[ZOrder16]]'s null behavior).
    */
  sealed abstract class CurveKeyExpr extends Expression {
    protected def kernel(xs: Array[Long]): Long
    protected def kernelJavaName: String
    // arity is validated in the builders (matching.zorder_n/hilbert_n,
    // Engine.functions) — NOT here: a constructor-body require runs
    // during reflective deserialization on executors while `children`
    // is still null (hit once: InvalidClassException on the first
    // task-shipped ZOrderMulti)
    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: InternalRow): Any = {
      val vs = new Array[Long](children.size)
      var i = 0
      while (i < children.size) {
        val v = children(i).eval(input)
        if (v == null) return null
        vs(i) = v.asInstanceOf[Long]
        i += 1
      }
      kernel(vs)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evals = children.map(_.genCode(ctx))
      val arr = ctx.freshName("curvedims")
      val childCode = evals.map(_.code).reduce(_ + _)
      val anyNull = evals.map(_.isNull.toString).mkString(" || ")
      val dims = evals.map(_.value.toString).mkString(", ")
      ev.copy(code = childCode + code"""
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[]{$dims};
          ${ev.value} = $kernels.$kernelJavaName($arr);
        }""")
    }
  }

  /** N-D Morton interleave of 2-8 bigints → bigint. */
  case class ZOrderMulti(children: Seq[Expression]) extends CurveKeyExpr {
    override protected def kernel(xs: Array[Long]): Long =
      MatchKernels.zorderN(xs)
    override protected def kernelJavaName: String = "zorderN"
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
    override def prettyName: String = "zorder_n"
  }

  /** N-D Hilbert index of 2-8 bigints → bigint (Skilling transpose). */
  case class HilbertMulti(children: Seq[Expression]) extends CurveKeyExpr {
    override protected def kernel(xs: Array[Long]): Long =
      MatchKernels.hilbertN(xs)
    override protected def kernelJavaName: String = "hilbertN"
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
    override def prettyName: String = "hilbert_n"
  }

  /** DuckDB-compatible `md5_number_lower`: string → bigint (the digest's
    * second 8 bytes little-endian, signed reinterpretation).
    */
  case class Md5Lower64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.md5Lower(v.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $textKernels.md5Lower($c.toString());")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "md5_lower64"
  }
}

/** Column-API façade over the matching/layout expressions. */
object matching {
  import MatchExpressions._
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))

  def zorder16(x: Column, y: Column): Column =
    column(ZOrder16(expression(x), expression(y)))

  private def checkCurveArity(name: String, n: Int): Unit =
    require(n >= 2 && n <= 8, s"$name takes 2-8 dimensions, got $n")

  def zorder_n(dims: Column*): Column = {
    checkCurveArity("zorder_n", dims.size)
    column(ZOrderMulti(dims.map(expression)))
  }

  def hilbert_n(dims: Column*): Column = {
    checkCurveArity("hilbert_n", dims.size)
    column(HilbertMulti(dims.map(expression)))
  }

  def md5_lower64(c: Column): Column = column(Md5Lower64(expression(c)))
}
