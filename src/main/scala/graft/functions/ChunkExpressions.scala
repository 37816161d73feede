package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text chunking as a Generator (UDTF shape) — SURVEY.md §7.2.7d: split a
  * document into overlapping token windows of `size` tokens with `stride`
  * hop, one output row per chunk. The analyzer plants a `Generate` node,
  * so chunk rows stream out without materializing a per-document array —
  * at 100 TB the per-row working set stays O(size), not O(doc).
  *
  * (A Generator participates in `Generate`, which is outside whole-stage
  * codegen by design — same execution shape as built-in explode.)
  */
object ChunkExpressions {

  case class ChunkTokens(child: Expression, size: Int, stride: Int)
      extends UnaryExpression with Generator with CodegenFallback {
    require(size > 0 && stride > 0, "size and stride must be positive")

    override def elementSchema: StructType = new StructType()
      .add("chunk_no", IntegerType, nullable = false)
      .add("chunk_text", StringType, nullable = false)
      .add("chunk_tokens", IntegerType, nullable = false)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) return Iterator.empty
      val s = v.asInstanceOf[UTF8String].toString
      // token boundaries in one pass
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
      if (nTok == 0) return Iterator.empty
      val starts = 0 until nTok by stride
      starts.iterator.zipWithIndex.map { case (st, chunkNo) =>
        val end = math.min(st + size, nTok)
        val from = bounds(2 * st)
        val until = bounds(2 * (end - 1) + 1)
        InternalRow(chunkNo, UTF8String.fromString(
          // normalize inner whitespace to single spaces so chunk text is a
          // pure function of the token sequence
          (st until end).map(t => s.substring(bounds(2 * t), bounds(2 * t + 1)))
            .mkString(" ")), end - st)
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "chunk_tokens"
  }
}

object chunks {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def chunk_tokens(c: Column, size: Int, stride: Int): Column =
    column(ChunkExpressions.ChunkTokens(expression(c), size, stride))
}
