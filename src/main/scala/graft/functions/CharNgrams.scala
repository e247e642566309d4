package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string: `graft_char_ngrams(text, n)`.
  *
  * Why native: the builtin shape `transform(sequence(1, len-n+1),
  * i -> substring(text, i, n))` calls substring once per position, and
  * UTF8String substring scans from the string start to find the
  * character boundary — O(position) per call, O(len²) per document.
  * This expression decodes the codepoint boundaries once and emits all
  * grams in O(len · n).
  *
  * Exact semantics of the builtin+array_distinct shape (oracle parity,
  * ops.TextAnalysis q23 / ops.Dedup q28): gram count = max(len − n + 1,
  * 1) — a short string yields one gram of whatever characters exist
  * (empty string for empty input); character (codepoint) positions, like
  * Spark's `substring` and DuckDB's `substr`; distinct in
  * first-occurrence order.
  */
case class CharNgrams(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and n >= 1, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (distinct) "graft_char_ngrams" else "graft_char_windows"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = CharNgrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.ngrams($s, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CharNgrams = copy(child = newChild)
}

object CharNgrams {
  /** Shared by eval and codegen. `distinct=false` keeps every gram in
    * position order (the rolling-window/k-gram shape).
    */
  def ngrams(text: UTF8String, n: Int, distinct: Boolean)
      : GenericArrayData = {
    val s = text.toString
    // codepoint start offsets (UTF-16 indices), one pass
    val starts = new Array[Int](s.codePointCount(0, s.length) + 1)
    var idx = 0
    var cp = 0
    while (idx < s.length) {
      starts(cp) = idx
      idx += Character.charCount(s.codePointAt(idx))
      cp += 1
    }
    starts(cp) = s.length
    val chars = cp
    val count = math.max(chars - n + 1, 1)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        val hi = math.min(i + n, chars)
        seen.add(UTF8String.fromString(s.substring(starts(i), starts(hi))))
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { out(m) = it.next(); m += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](count)
      var i = 0
      while (i < count) {
        val hi = math.min(i + n, chars)
        out(i) = UTF8String.fromString(s.substring(starts(i), starts(hi)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
