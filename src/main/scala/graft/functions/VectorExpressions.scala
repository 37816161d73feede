package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels + expressions for the similarity-search surface
  * (SURVEY.md §7.2.7e). Embeddings are `array<float>` columns; all math
  * runs in double, sequentially in element order, so results are
  * reproducible and match a DuckDB `list_cosine_similarity(DOUBLE[], ...)`
  * oracle to well past 6 decimals.
  *
  * A native Expression (not a UDF) keeps the dot product inside
  * whole-stage codegen: no row boxing, no array copy — `ArrayData.getFloat`
  * reads the unsafe buffer directly. At 100 TB this is the difference
  * between a scan-bound and a CPU-bound ANN sweep.
  */
object VectorKernels {
  /** Cosine similarity in double; 0.0 for zero-norm inputs. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm2(a: ArrayData): Double = {
    var s = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Signed-random-projection LSH signature (Charikar, STOC'02): bit b is
    * the sign of ⟨v, r_b⟩ for a deterministic Rademacher hyperplane
    * r_b[j] = ±1 derived from splitmix64(b·dim + j). Cosine-similar
    * vectors collide on most bits, so banding the signature buckets
    * near-neighbors without any pairwise comparison. Deterministic across
    * JVMs — no RNG state.
    *
    * The dot is accumulated over INTEGER-quantized components
    * (`floor(x · 2²⁰)` — the ×2²⁰ is a pure exponent shift, exact in
    * IEEE, and floor agrees across engines where round-half does not),
    * summed in int64. Integer addition is associative, so the sign
    * decision is identical under ANY accumulation order — which is what
    * makes the signature restatable in DuckDB SQL (whose SUM order is
    * unspecified) with zero divergence risk. The r10 float form had a
    * latent cross-engine flake: a dot within re-association ulps of zero
    * could flip a bit between Spark's sequential loop and DuckDB's SUM
    * (r10 ADVICE). Quantization costs < 2⁻²⁰ per component of hyperplane
    * precision — irrelevant to LSH collision statistics.
    */
  def srpSig(v: ArrayData, bits: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0L
      var j = 0
      while (j < dim) {
        val q = math.floor(v.getFloat(j).toDouble * 1048576.0).toLong
        dot += (if ((TextKernels.mix64(b.toLong * dim + j) & 1L) == 1L) q else -q)
        j += 1
      }
      if (dot > 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object VectorExpressions {
  private val kernels = "graft.functions.VectorKernels"
  private val floatArray = ArrayType(FloatType)

  abstract class FloatArrayBinary extends BinaryExpression {
    override def dataType: DataType = DoubleType
  }

  case class CosineSimilarity(left: Expression, right: Expression) extends FloatArrayBinary {
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernels.cosine($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_similarity"
  }

  /** SRP-LSH signature: array<float> → bigint (low `bits` bits used). */
  case class SrpSignature(child: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      VectorKernels.srpSig(v.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.srpSig($c, $bits);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "srp_signature"
  }

  case class DotProduct(left: Expression, right: Expression) extends FloatArrayBinary {
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernels.dot($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }
}

/** Column-API façade. */
object vectors {
  import VectorExpressions._
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def srp_signature(a: Column, bits: Int = 64): Column =
    column(SrpSignature(expression(a), bits))
}
