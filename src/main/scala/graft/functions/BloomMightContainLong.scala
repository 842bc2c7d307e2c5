package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(value)` as a native Catalyst expression: the
  * probe side of the Bloom pre-screen (see `Dedup.dedupAgainstStoreBloom`).
  *
  * The filter arrives as a FOLDABLE binary literal (the driver-built
  * sketch's serialized form — compact: ~1.2 MB per million keys at 1%
  * fpp), deserialized once per expression instance into a @transient
  * lazy val; `doGenCode` pins the deserialized filter into the codegen
  * references array, so the per-row work inside whole-stage codegen is
  * one virtual call on a long — no boxing, no serialization boundary,
  * exactly like Spark's own (non-public) BloomFilterMightContain.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe value, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(value: Any, filterBytes: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(value.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(left = newLeft, right = newRight)
}
