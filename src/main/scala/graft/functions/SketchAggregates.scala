package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates for the 100 TB posture.
  *
  * [[MisraGries]] maintains at most `k` token counters per partial buffer
  * (Misra-Gries 1982; mergeable per Agarwal et al., PODS'12): every token
  * with true frequency > N/k is GUARANTEED to survive in the final
  * candidate set, with O(k) memory per partition regardless of corpus
  * size. The caller verifies candidates with one exact filtered count —
  * sketch for scale, exact join for correctness (see q41).
  */
object SketchAggregates {

  type Buf = java.util.HashMap[String, Long]

  /** Heavy-hitter candidate tokens over whitespace-tokenized text. */
  case class MisraGries(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def createAggregationBuffer(): Buf = new Buf()

    private def mgAdd(buf: Buf, tok: String, by: Long): Unit = {
      val cur = buf.get(tok)
      if (cur != 0L || buf.containsKey(tok)) buf.put(tok, cur + by)
      else if (buf.size < k) buf.put(tok, by)
      else decrementAll(buf, by)
    }

    private def decrementAll(buf: Buf, by: Long): Unit = {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - by
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        var i = 0
        val n = s.length
        while (i < n) {
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          val start = i
          while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
          if (i > start) mgAdd(buf, s.substring(start, i), 1L)
        }
      }
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val it = b2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = b1.get(e.getKey)
        b1.put(e.getKey, cur + e.getValue)
      }
      // shrink back to k counters: subtract the (k+1)-largest count from
      // all (the standard mergeable-MG step, preserves the N/k guarantee)
      if (b1.size > k) {
        val counts = new Array[Long](b1.size)
        var i = 0
        val vit = b1.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val d = counts(counts.length - k - 1) // (k+1)-th largest
        decrementAll(b1, d)
      }
      b1
    }

    override def eval(buf: Buf): Any = {
      val toks = new Array[String](buf.size)
      buf.keySet().toArray(new Array[String](0)).sorted.zipWithIndex
        .foreach { case (t, i) => toks(i) = t }
      new GenericArrayData(toks.map(UTF8String.fromString(_)))
    }

    // keys as length-prefixed UTF-8 byte arrays: writeUTF caps entries at
    // 64 KiB of modified UTF-8 and a whitespace-free document (minified
    // JSON, CJK text) tokenizes to one giant token, which must survive
    // partial-buffer shuffle serialization, not crash it
    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new Buf()
      var i = 0
      while (i < n) {
        val kb = new Array[Byte](in.readInt())
        in.readFully(kb)
        buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
    override def prettyName: String = "mg_heavy_hitter_candidates"
  }
}

object sketches {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Heavy-hitter candidate tokens (aggregate column). */
  def mg_candidates(c: Column, k: Int = 64): Column =
    column(SketchAggregates.MisraGries(expression(c), k)
      .toAggregateExpression(isDistinct = false))
}
