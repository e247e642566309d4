package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership test: `graft_bloom_contains(bytes, v)`.
  *
  * The runtime-filter building block (the pattern Spark's own
  * row-level-runtime-filtering optimization uses internally, but exposed
  * as a first-class expression): build a [[BloomFilter]] over a join's
  * small pruned side ONCE (`df.stat.bloomFilter` — a treeAggregate),
  * serialize it, and push the membership test down the large side's scan
  * as an ordinary filter predicate. At 100 TB this is the difference
  * between shuffling the full fact table into the join and shuffling only
  * the ~selectivity fraction that can possibly match; false positives
  * (bounded by the filter's fpp) are removed by the exact join behind it,
  * so the composition stays EXACT — which is what keeps q79
  * oracle-checkable.
  *
  * The filter argument must be a FOLDABLE binary expression (the
  * serialized filter travels to executors inside the plan as a literal,
  * exactly like a broadcast small-side). It is deserialized lazily ONCE
  * per deserialized plan (transient lazy val), never per row. NULL value
  * → NULL, same as any binary null-safe expression.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY serialized bloom filter, got " +
          left.dataType.catalogString)
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the filter to be a literal (build it once " +
          "with df.stat.bloomFilter and pass the serialized bytes)")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral value to test, got " +
          other.catalogString)
    }
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Codegen + eval entry: one deserialization per plan instance. */
  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  private def asLong(b: Any): Long = right.dataType match {
    case ByteType => b.asInstanceOf[Byte].toLong
    case ShortType => b.asInstanceOf[Short].toLong
    case IntegerType => b.asInstanceOf[Int].toLong
    case _ => b.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any = mightContain(asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    // reference THIS expression object: the serialized filter rides in
    // its `left` literal, and `mightContain` hits the lazily-deserialized
    // instance — no per-row work beyond the hash probes
    val self = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev,
      (_, b) => s"${ev.value} = $self.mightContain((long) $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains = copy(newLeft, newRight)
}
