package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions (SURVEY preference order (b)): the MinHash
  * signature and SimHash folds are pure integer recurrences over a hashed
  * token/shingle array. The builtin formulation — nested
  * `aggregate`/`zip_with` lambdas — runs interpreted (higher-order
  * functions don't enter whole-stage codegen) and costs
  * O(elements × accumulators) boxed lambda calls per row. These compile
  * to tight primitive loops, and their integer arithmetic is bit-exact to
  * the builtin shapes, so DuckDB oracle parity is preserved.
  */

/** MinHash signature over pre-hashed shingles: for j in [0, numHashes),
  * `min over x of ((2j+1)·(x) + 101·j) mod prime` — the hash family used
  * by the dedup pipeline (ops.Dedup q26). Input elements must already be
  * reduced mod prime (non-negative); overflow-safe for prime < 2^31 and
  * numHashes ≤ 2^5 since (2j+1)·x < 2^36 · 2^31 < 2^63.
  * Null input or null element → NULL (matches the lambda formulation).
  */
case class MinHashSig(child: Expression, numHashes: Int, prime: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(numHashes)(prime)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = xs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = ((2L * j + 1) * x + 101L * j) % prime
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $xs.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${prime}L);
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($xs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $x = $xs.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = ((2L * $j + 1) * $x + 101L * $j) % ${prime}L;
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |if (!${ev.isNull}) ${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** 60-bit SimHash over pre-hashed tokens (multiplicity-weighted): bit j of
  * the result is set iff `Σ over h of (2·bit_j(h) − 1) > 0`
  * (ops.Dedup q27). Null input or null element → NULL.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val counts = new Array[Long](60)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var j = 0
      while (j < 60) {
        counts(j) += 2L * ((h >>> j) & 1L) - 1L
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $xs.numElements();
         |long[] $counts = new long[60];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($xs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $xs.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    $counts[$j] += 2L * (($h >>> $j) & 1L) - 1L;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ($counts[$j] > 0) $sig |= 1L << $j;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash60 = copy(child = newChild)
}
