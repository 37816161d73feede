package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-pipeline text operators
  * (SURVEY.md §7.2.7) — native `Expression`s with `doGenCode` so they stay
  * inside whole-stage codegen (no UDF serialization, no boxing of the hot
  * string), each delegating to the static kernels in [[TextKernels]].
  *
  * Column wrappers live in [[graft.functions.text]].
  */
object TextExpressions {
  private val kernels = "graft.functions.TextKernels"

  /** Winnowing fingerprint: string → array<bigint> (SIGMOD'03 scheme). */
  case class RollingFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.winnowBridge(v.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.winnowBridge($c, $k, $w);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "rolling_fingerprint"
  }

  /** 64-bit SimHash of whitespace tokens: string → bigint. */
  case class SimHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.simhashBridge(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.simhashBridge($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** MinHash signature over word shingles: string → array<bigint>[num]. */
  case class MinHashSignature(child: Expression, shingle: Int, num: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.minhashBridge(v.asInstanceOf[UTF8String], shingle, num)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.minhashBridge($c, $shingle, $num);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** Distinct hashed word shingles: string → sorted array<bigint>. */
  case class ShingleHashes(child: Expression, shingle: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.shingleBridge(v.asInstanceOf[UTF8String], shingle)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.shingleBridge($c, $shingle);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "shingle_hashes"
  }

  /** Single-pass language marker scores: string → array<bigint>[5]. */
  case class LangScores(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.langScoresBridge(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.langScoresBridge($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "lang_scores"
  }

  /** Strip diacritics (NFD + drop combining marks): string → string. */
  case class StripAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TextKernels.stripAccentsBridge(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.stripAccentsBridge($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "strip_accents"
  }

  /** Unicode NFC canonical composition: string → string. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TextKernels.nfcNormalizeBridge(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.nfcNormalizeBridge($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  /** MD5-hashed SimHash (oracle-recomputable twin of [[SimHash]]):
    * string → bigint. Same voting scheme; per-token hash is DuckDB's
    * `md5_number_lower`, so the full near-dup decision has a SQL twin.
    */
  case class SimHashMd5(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.simhashMd5Bridge(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.simhashMd5Bridge($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "simhash_md5"
  }

  /** MD5-hashed winnowing fingerprint SET (oracle-recomputable twin of
    * [[RollingFingerprint]]): string → sorted array<bigint>, 63-bit
    * non-negative values.
    */
  case class WinnowMd5(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.winnowMd5Bridge(v.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.winnowMd5Bridge($c, $k, $w);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "winnow_md5"
  }

  /** Distinct space-joined word n-grams: string → array<string>. */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.wordNgramsBridge(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.wordNgramsBridge($c, $n);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "word_ngrams"
  }

  /** Distinct character k-grams: string → array<string>. */
  case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.charShinglesBridge(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.charShinglesBridge($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "char_shingles"
  }

  /** Distinct character k-grams hashed to the md5_number_lower int64
    * domain: string → array<bigint>. The hashed-token twin of
    * [[CharShingles]] — see TextKernels.charShinglesMd5 for the
    * cross-engine contract.
    */
  case class CharShinglesMd5(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.charShinglesMd5Bridge(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.charShinglesMd5Bridge($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "char_shingles_md5"
  }

  /** dHash perceptual fingerprint of a byte payload: binary → bigint.
    * See TextKernels.dhash64 for the 65-block contract and the DuckDB
    * oracle restatement.
    */
  case class DHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.dhash64(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.dhash64($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "dhash64"
  }

  /** Hamming distance between two 64-bit hashes: (bigint, bigint) → int. */
  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "hamming64"
  }
}

/** Column-API façade over the custom expressions (Spark 4 Column is
  * node-based; `classic.ExpressionUtils` is the supported bridge).
  */
object text {
  import TextExpressions._
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def rolling_fingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    column(RollingFingerprint(expression(c), k, w))

  def simhash64(c: Column): Column = column(SimHash(expression(c)))

  def simhash_md5(c: Column): Column = column(SimHashMd5(expression(c)))

  def winnow_md5(c: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowMd5(expression(c), k, w))

  def char_shingles(c: Column, k: Int): Column =
    column(CharShingles(expression(c), k))

  def char_shingles_md5(c: Column, k: Int): Column =
    column(CharShinglesMd5(expression(c), k))

  def dhash64(c: Column): Column = column(DHash64(expression(c)))

  def word_ngrams(c: Column, n: Int): Column =
    column(WordNgrams(expression(c), n))

  def minhash_signature(c: Column, shingle: Int = 3, num: Int = 64): Column =
    column(MinHashSignature(expression(c), shingle, num))

  def hamming64(a: Column, b: Column): Column =
    column(HammingDistance(expression(a), expression(b)))

  def shingle_hashes(c: Column, shingle: Int = 3): Column =
    column(ShingleHashes(expression(c), shingle))

  def lang_scores(c: Column): Column = column(LangScores(expression(c)))

  def strip_accents(c: Column): Column = column(StripAccents(expression(c)))

  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
}
