package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan '05) as a MERGEABLE
  * aggregate: a `d × w` counter matrix where row `j` counts arrivals at
  * bucket `h_j(term)`; the frequency estimate for a key is the MINIMUM of
  * its `d` counters — never an underestimate, over by at most the
  * collision mass (the guarantee [[graft.queries.Sketches]] audits
  * against exact counts). The buffer is a flat long array, partial
  * buffers combine by ELEMENTWISE SUM, so map-side combine collapses
  * every partition to `d·w` longs before the exchange and — unlike
  * rank/percentile sketches (the CLAUDE.md approx_percentile rule) — the
  * result is merge-order-INVARIANT: sums commute, so the sketch is
  * bit-identical across partitionings, runs, and engines.
  *
  * Hash family: `h_j(t) = md5_lower64(j || ':' || t) mod w` — the q127
  * hashing-trick surface, recomputable in DuckDB as
  * `md5_number_lower(...) % w` (for `w` a power of two the unsigned
  * residue equals Spark's `floorMod` over the signed reinterpretation,
  * since 2^64 ≡ 0 mod w — the q127 congruence argument). That makes the
  * ENTIRE counter matrix, not just the estimates, restatable in SQL.
  *
  * `update` takes a WEIGHT: `cms_sketch(term, w)` over a pre-counted
  * `(term, n)` table builds the identical sketch a weight-1 pass over the
  * raw stream would (counters depend only on the term multiset), letting
  * a pipeline that already has partial counts sketch them without
  * re-expanding tokens.
  */
object CmsAggregate {

  /** `cms_sketch(term, weight)` → array<bigint> of length d·w, row-major
    * (row j occupies [j·w, (j+1)·w)).
    */
  case class CmsSketch(
      term: Expression, weight: Expression, d: Int, w: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(d > 0 && w > 0, "cms_sketch needs d > 0 and w > 0")
    require((w & (w - 1)) == 0,
      "cms_sketch needs w to be a power of two (the mod-2^64 congruence " +
        "that keeps Spark floorMod == DuckDB unsigned % holds only then)")

    override def children: Seq[Expression] = Seq(term, weight)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val t = term.eval(input)
      val wt = weight.eval(input)
      if (t != null && wt != null) {
        val str = t.asInstanceOf[UTF8String].toString
        val n = wt.asInstanceOf[Long]
        var j = 0
        while (j < d) {
          val h = java.lang.Math.floorMod(
            TextKernels.md5Lower(j.toString + ":" + str), w.toLong).toInt
          buf(j * w + h) += n
          j += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(buf.length * 8)
      val out = new DataOutputStream(bos)
      var i = 0
      while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      var i = 0
      while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsSketch =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression =
      copy(term = cs(0), weight = cs(1))
    override def prettyName: String = "cms_sketch"
  }
}

object cms {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  import org.apache.spark.sql.functions.{concat, element_at, least, lit, pmod}

  /** Count-min sketch of `(term, weight)` rows (aggregate column).
    * Weight is widened to long explicitly (the topk_by widening rule —
    * ExpectsInputTypes is unavailable with AbstractDataType private).
    */
  def cms_sketch(term: Column, weight: Column, d: Int = 4,
      w: Int = 128): Column =
    column(CmsAggregate.CmsSketch(
      expression(term.cast("string")), expression(weight.cast("long")), d, w)
      .toAggregateExpression(isDistinct = false))

  /** Point estimate of `term`'s frequency from a sketch column: the min
    * of its d counters — pure codegen builtins over the array, the same
    * `h_j` the aggregate applied.
    */
  def cms_estimate(sketch: Column, term: Column, d: Int = 4,
      w: Int = 128): Column =
    least((0 until d).map { j =>
      element_at(sketch,
        (lit(j.toLong * w) +
          pmod(matching.md5_lower64(concat(lit(s"$j:"), term)), lit(w.toLong)) +
          lit(1L)).cast("int"))
    }: _*)
}
