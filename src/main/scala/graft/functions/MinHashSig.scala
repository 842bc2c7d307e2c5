package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature over pre-hashed shingles
  * (array<bigint> → array<bigint> of k running minima).
  *
  * Semantics identical to the declarative `aggregate(zip_with(...))`
  * formulation (same universal-hash family, same seed handling):
  * for shingle hash h, reduce to h31 = pmod(h, P) with P = 2^31-1, and
  * sig_i = min over shingles of pmod(h31 * a_i + b_i, P).
  *
  * Exists because Spark evaluates higher-order-function lambdas
  * INTERPRETED — the aggregate/zip_with form allocates and copies a
  * k-element accumulator array per shingle with per-element Invoke
  * overhead, which profiled at 19s for 5000 docs × k=32 at sf0.1.
  * This expression is one primitive nested loop under whole-stage
  * codegen: no allocation per shingle, no boxing.
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  private val Prime = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  // Same generation order as the declarative form: Random(seed),
  // a = 1 + nextLong(P-1), b = nextLong(P).
  @transient private lazy val coef: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 1L + rnd.nextLong(Prime - 1)
      bs(i) = rnd.nextLong(Prime)
      i += 1
    }
    (as, bs)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coef
    val sig = Array.fill(k)(Prime)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      val h31 = ((h % Prime) + Prime) % Prime
      var i = 0
      while (i < k) {
        val v = (h31 * as(i) + bs(i)) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = coef
    val asRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val h31 = ctx.freshName("h31")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${Prime}L);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  long $h31 = (($h % ${Prime}L) + ${Prime}L) % ${Prime}L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($h31 * $asRef[$i] + $bsRef[$i]) % ${Prime}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
