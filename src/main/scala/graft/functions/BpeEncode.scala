package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLY over a word-token array:
  * `graft_bpe(words, 'a b,th e,...')` → one encoded string per input
  * word, symbols space-joined (`"the"` under merges t+h, th+e → `"the"`;
  * an unmergeable `"xq"` → `"x q"`).
  *
  * Semantics (Sennrich et al. 2016, the original subword-nmt contract):
  * each word starts as its character sequence; each merge `(a, b)` is
  * applied IN RANK ORDER as one left-to-right pass replacing adjacent
  * `a, b` with `ab` (after a replacement the scan resumes AFTER the
  * merged symbol). For a well-formed learned merge list, sequential
  * application is equivalent to greedy lowest-rank-pair iteration: a
  * merge can only create adjacencies involving its output symbol, and
  * any merge consuming that symbol necessarily has a higher rank.
  *
  * Why native (SURVEY preference order (b)): a real tokenizer table is
  * 10⁴–10⁵ merges — as a folded `replace(replace(...))` SQL shape that
  * is an unplannably deep expression tree, while here the merge table is
  * parsed ONCE at expression construction into a rank-indexed map
  * carried by the plan (broadcast to every task with the serialized
  * expression), and each word is encoded by a tight in-memory loop over
  * only the pairs actually present. The oracle replays the identical
  * LTR-pass semantics as nested `replace` over a small merge list —
  * with DOUBLE delimiters between symbols so consecutive matches in a
  * run of identical symbols touch without overlapping (a single shared
  * boundary char would make replace() under-merge 3+ runs).
  *
  * Cost note: each rank is a cheap pre-scan over the (short) symbol
  * array, rebuilding it only when the pair occurs — O(|word| · |table|)
  * worst case with a small constant; |word| is bounded by the tokenizer
  * (a handful of symbols after the first few merges apply).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe"

  // parsed once per (driver) expression instance; Kryo/Java-serialized to
  // executors with the plan — the "broadcast merge table"
  @transient private lazy val table = BpeEncode.Table(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeAll(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.Table].getName)
    nullSafeCodeGen(ctx, ev, words => {
      val helper = BpeEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.encodeAll($words, $tableRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeEncode = copy(child = newChild)
}

object BpeEncode {

  /** Rank-ordered merge table. */
  case class Table(merges: Seq[(String, String)]) {
    val pairs: Array[(String, String)] = merges.toArray
  }

  /** `"t h,th e"` → Seq(("t","h"), ("th","e")); rank = list order. */
  def parseMerges(spec: String): Seq[(String, String)] =
    spec.split(',').toSeq.filter(_.nonEmpty).map { m =>
      m.split(' ') match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_bpe: each merge must be 'left right', got '$m'")
      }
    }

  /** Shared by eval and codegen. */
  def encodeAll(words: ArrayData, table: Table): GenericArrayData = {
    val n = words.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(
        encodeWord(words.getUTF8String(i).toString, table))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One word: chars → sequential rank-ordered LTR merge passes. */
  def encodeWord(w: String, table: Table): String = {
    var syms: Array[String] = w.map(_.toString).toArray
    val pairs = table.pairs
    var r = 0
    while (r < pairs.length && syms.length > 1) {
      val (a, b) = pairs(r)
      // cheap pre-scan: rebuild the symbol array only when the pair occurs
      var found = false
      var i = 0
      while (!found && i < syms.length - 1) {
        found = syms(i) == a && syms(i + 1) == b
        i += 1
      }
      if (found) {
        val next = new scala.collection.mutable.ArrayBuffer[String](
          syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            next += a + b // scan resumes AFTER the merged symbol
            j += 2
          } else {
            next += syms(j)
            j += 1
          }
        }
        syms = next.toArray
      }
      r += 1
    }
    syms.mkString(" ")
  }
}
