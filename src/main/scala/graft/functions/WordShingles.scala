package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a token array: `graft_shingles(toks, k)`.
  *
  * Why native (SURVEY preference order (b)): the builtin shape
  * `transform(sequence(1, n-k+1), i -> array_join(slice(toks, i, k), ' '))`
  * has the token-producing expression INSIDE the lambda after
  * CollapseProject inlining, so Spark re-evaluates it once per shingle
  * index — for `regexp_extract_all` upstream that means re-tokenizing the
  * whole document ~|tokens| times (measured: the dominant cost of the
  * MinHash dedup pipeline). Here the child evaluates once and a tight
  * loop builds the distinct shingle set.
  *
  * Exact semantics of the builtin+list_distinct shape (oracle parity):
  *   - shingle count = max(|toks| − k + 1, 1) — short docs produce one
  *     shingle of however many tokens exist (empty string for zero);
  *   - first-occurrence order (LinkedHashSet == list_distinct order);
  *   - null token array → NULL; null token → treated by array_join as
  *     absent (builtin skips nulls in joins) — upstream tokenizers never
  *     produce null tokens, so this expression rejects them for clarity.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and k >= 1, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    WordShingles.shingle(toks, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val helper = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.shingle($toks, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
}

object WordShingles {
  /** Shared by eval and codegen. */
  def shingle(toks: ArrayData, k: Int): GenericArrayData = {
    val n = toks.numElements()
    val count = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val hi = math.min(i + k, n)
      val parts = new Array[UTF8String](math.max(hi - i, 0))
      var j = i
      while (j < hi) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }
}
