package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature: array<float|double> vector →
  * array<bigint> of `numBands` band keys, where band j packs the sign
  * bits of hyperplane block j (`bitsPerBand` planes) into a long.
  *
  * Semantics identical to the declarative form this replaces (the same
  * seeded plane matrix, same double-precision accumulation, same bit
  * packing): numBands×bitsPerBand literal-plane `dot(...) > 0` terms.
  * That form built 96 separate expression trees each carrying a 64-float
  * literal — several seconds of per-query Janino compilation before the
  * first row moved. This is one reference-object plane matrix and one
  * nested loop: O(planes·dim) per vector, compiled once.
  */
case class RhpSignature(child: Expression, numBands: Int, bitsPerBand: Int,
    dim: Int, seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rhp_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Plane-major generation, same order as SimSearch.planes historically
  // used: Random(seed), plane p = dim consecutive gaussians (as floats).
  @transient private lazy val planes: Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numBands * bitsPerBand * dim)(rnd.nextGaussian().toFloat)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ps = planes
    val isFloat = childIsFloat
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](numBands)
    var j = 0
    while (j < numBands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        val base = (j * bitsPerBand + i) * dim
        var acc = 0.0
        var t = 0
        while (t < n) {
          val v = if (isFloat) arr.getFloat(t).toDouble else arr.getDouble(t)
          acc += v * ps(base + t)
          t += 1
        }
        if (acc > 0) key |= (1L << i)
        i += 1
      }
      out(j) = key
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val psRef = ctx.addReferenceObj("rhpPlanes", planes, "float[]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base"); val key = ctx.freshName("key")
      s"""
         |long[] $out = new long[$numBands];
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |for (int $j = 0; $j < $numBands; $j++) {
         |  long $key = 0L;
         |  for (int $i = 0; $i < $bitsPerBand; $i++) {
         |    int $base = ($j * $bitsPerBand + $i) * $dim;
         |    double $acc = 0.0;
         |    for (int $t = 0; $t < $n; $t++) {
         |      $acc += ((double) $arr.$get($t)) * $psRef[$base + $t];
         |    }
         |    if ($acc > 0) $key |= (1L << $i);
         |  }
         |  $out[$j] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
}
