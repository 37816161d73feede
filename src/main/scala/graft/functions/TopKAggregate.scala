package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Group-wise top-k as a MERGEABLE aggregate — the at-scale alternative to
  * the `ROW_NUMBER() OVER (PARTITION BY g ORDER BY s DESC) <= k` window:
  * the window plan shuffles EVERY row of the group and sorts it; this
  * aggregate keeps an O(k) bounded heap per partial buffer, so map-side
  * partial aggregation discards the non-top-k rows before the exchange —
  * the shuffle carries at most k entries per (partition × group), and no
  * sort of the full group ever happens. Semantics are pinned to the window
  * form: score descending, ties broken by ascending key, exactly
  * reproducible (no sampling, no approximation).
  */
object TopKAggregate {

  /** One retained entry: (score, tiebreak key). */
  final case class Entry(score: Double, key: Long)

  /** Worst-first ordering for the bounded heap: the head is the entry to
    * evict — lowest score, then HIGHEST key (so on equal scores the larger
    * key leaves first, matching `ORDER BY score DESC, key ASC`).
    */
  private val worstFirst: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.key, a.key)
      }
    }

  type Buf = java.util.PriorityQueue[Entry]

  /** `topk_by(score, key, k)` → array<struct<score double, key bigint>>
    * sorted best-first.
    */
  case class TopKBy(
      score: Expression, key: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    require(k > 0, "topk_by needs k > 0")

    override def children: Seq[Expression] = Seq(score, key)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("key", LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): Buf =
      new java.util.PriorityQueue[Entry](k + 1, worstFirst)

    private def offer(buf: Buf, e: Entry): Unit = {
      if (buf.size < k) { buf.add(e); () }
      else if (worstFirst.compare(e, buf.peek()) > 0) {
        buf.poll(); buf.add(e); ()
      }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val s = score.eval(input)
      val ky = key.eval(input)
      if (s != null && ky != null) {
        offer(buf, Entry(s.asInstanceOf[Double], ky.asInstanceOf[Long]))
      }
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val it = b2.iterator()
      while (it.hasNext) offer(b1, it.next())
      b1
    }

    override def eval(buf: Buf): Any = {
      val arr = buf.toArray(new Array[Entry](0))
      java.util.Arrays.sort(arr, worstFirst.reversed())
      new GenericArrayData(arr.map { e =>
        new GenericInternalRow(Array[Any](e.score, e.key))
      })
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeDouble(e.score); out.writeLong(e.key)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(Entry(in.readDouble(), in.readLong())); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKBy =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKBy =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression =
      copy(score = cs(0), key = cs(1))
    override def prettyName: String = "topk_by"
  }
}

object topk {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Top-k (score, key) entries per group, best-first (aggregate column).
    * Inputs are widened with explicit casts (decimal/int/float score,
    * int key, …) — the buffer stores (double, long) and, with
    * AbstractDataType private[sql] in Spark 4, an ExpectsInputTypes
    * check isn't available to reject narrower types at analysis time.
    */
  def topk_by(score: Column, key: Column, k: Int): Column =
    column(TopKAggregate.TopKBy(
      expression(score.cast("double")), expression(key.cast("long")), k)
      .toAggregateExpression(isDistinct = false))
}
