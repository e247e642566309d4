package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-element 60-bit md5 hash of a string array, optionally
  * reduced mod a prime: `graft_hash60_array(arr[, mod])`.
  *
  * Value contract: identical to the engine's scalar hash
  * (`CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)`,
  * [[graft.ops.Dialect.sparkHash60]]) — the first 15 hex digits of md5
  * are the first 7.5 bytes big-endian, assembled here directly from the
  * digest bytes without materializing the hex string. The builtin
  * formulation (`transform(arr, x -> ...md5 chain...)`) evaluates an
  * interpreted lambda per element, allocating a 32-char hex string and
  * parsing it back; for shingle/token arrays (hundreds of elements per
  * document) this expression is the difference between the hash being
  * the pipeline bottleneck or noise.
  *
  * Null contract: null array → NULL; null element → null is not expected
  * from upstream tokenizers, but is hashed as NULL element → NULL result
  * (matches `md5(NULL)` propagation through transform).
  */
case class Hash60Array(child: Expression, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hash60_array"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      out(i) = Hash60Array.hash60(md, xs.getUTF8String(i).getBytes, mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e); }""".stripMargin)
      val gad = classOf[GenericArrayData].getName
      val helper = Hash60Array.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $xs.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($xs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = $helper.hash60($md,
         |    $xs.getUTF8String($i).getBytes(), ${mod}L);
         |}
         |if (!${ev.isNull}) ${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Hash60Array = copy(child = newChild)
}

object Hash60Array {
  /** First 15 hex digits of md5 = first 7.5 bytes big-endian, as a long;
    * optionally mod `m` (m <= 0 disables). Shared by eval and codegen.
    */
  def hash60(md: java.security.MessageDigest, bytes: Array[Byte],
      m: Long): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
    if (m > 0) v % m else v
  }
}
