package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Racing-duration parsing — the SURVEY.md §2.11 Q4 extension: the
  * reference keeps lap/pit/qualifying times as `m:ss.SSS` strings, making
  * every comparison lexicographic (wrong across minute-digit boundaries,
  * e.g. "1:59.9" > "10:00.0" lexicographically). `duration_ms` parses
  * `[h:]m:ss[.SSS]` (and bare `ss.SSS`) to milliseconds so ordering and
  * aggregation are numeric. Additive — silver schemas keep the original
  * strings for parity (`Clean Bronze Data.py:193`).
  */
object DurationKernel {
  /** `[h:]m:ss[.SSS]` or `ss[.SSS]` → millis; -1 for unparseable (callers
    * surface it as null via the expression's null handling).
    */
  def parse(s: String): Long = {
    var h = 0L; var m = 0L; var sec = 0L; var ms = 0L
    var part = 0L; var digits = 0
    var colons = 0; var inFrac = false; var fracDigits = 0
    val parts = new Array[Long](3)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        if (inFrac) {
          if (fracDigits < 3) { ms = ms * 10 + (c - '0'); fracDigits += 1 }
        } else { part = part * 10 + (c - '0'); digits += 1 }
      } else if (c == ':') {
        if (colons >= 2 || digits == 0 || inFrac) return -1L
        parts(colons) = part; colons += 1; part = 0L; digits = 0
      } else if (c == '.') {
        if (inFrac) return -1L
        inFrac = true
      } else return -1L
      i += 1
    }
    if (digits == 0 && !inFrac) return -1L
    while (fracDigits > 0 && fracDigits < 3) { ms *= 10; fracDigits += 1 }
    parts(colons) = part
    colons match {
      case 0 => sec = parts(0)
      case 1 => m = parts(0); sec = parts(1)
      case 2 => h = parts(0); m = parts(1); sec = parts(2)
    }
    if (sec > 59 && colons > 0) return -1L
    ((h * 60L + m) * 60L + sec) * 1000L + ms
  }
}

object DurationExpressions {
  /** string `[h:]m:ss[.SSS]` → millis bigint; null for malformed input. */
  case class DurationMillis(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = DurationKernel.parse(v.asInstanceOf[UTF8String].toString)
      if (r < 0L) null else r
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.DurationKernel.parse($c.toString());
           |if (${ev.value} < 0L) { ${ev.isNull} = true; }""".stripMargin)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "duration_ms"
  }
}

object durations {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def duration_ms(c: Column): Column =
    column(DurationExpressions.DurationMillis(expression(c)))
}
