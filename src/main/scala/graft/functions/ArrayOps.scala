package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native pair-scoring kernels for the dedup / similarity hot paths.
  *
  * These run once per CANDIDATE PAIR — the innermost loop of near-dup
  * detection and similarity search (O(N²) brute force, O(candidates)
  * after LSH). The built-in alternatives allocate per call
  * (`array_intersect` builds a hash set; `aggregate(zip_with(...))`
  * materializes an intermediate array), which measured 233s for the
  * sf0.1 all-pairs Jaccard query; these merge/fma loops with `doGenCode`
  * stay allocation-free inside whole-stage codegen.
  */

/** Size of the intersection of two SORTED, DISTINCT arrays — both
  * array<string> or both array<bigint> (merge-count; inputs must be
  * pre-sorted with array_sort, which is done once per document, not
  * once per pair). The bigint form is the cheaper verification path:
  * hash the shingles once per document and merge 8-byte keys instead
  * of variable-length strings.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires matching (array<string>|array<bigint>) inputs, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    if (isLong) {
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { n += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    java.lang.Integer.valueOf(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val body = if (isLong) {
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |if ($xv == $yv) { $n++; $i++; $j++; }
           |else if ($xv < $yv) $i++;
           |else $j++;
         """.stripMargin
      } else {
        val c = ctx.freshName("c")
        s"""
           |int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($c == 0) { $n++; $i++; $j++; }
           |else if ($c < 0) $i++;
           |else $j++;
         """.stripMargin
      }
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  $body
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float/double arrays in double precision,
  * accumulated left-to-right (same order as `aggregate(zip_with(...))`
  * and DuckDB's list functions, so oracle results are bit-identical).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires float/double arrays, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0d
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ax = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bx = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $ax * $bx;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** First index at which two bigint arrays hold equal values (-1 when
  * none over the common prefix). Built for shuffle-free LSH pair dedup:
  * a pair colliding in several bands is emitted only where
  * `first_equal_index(keys_a, keys_b) == band`, replacing the
  * candidate-level `distinct()` — the single largest shuffle of the
  * MinHash pipeline — with a per-probe O(numBands) scan.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_first_equal_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return java.lang.Integer.valueOf(i)
      i += 1
    }
    java.lang.Integer.valueOf(-1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

/** First element of `left` (in array order) that is CONTAINED in the
  * SORTED bigint array `right`; null when none. Binary search per
  * left element — O(|prefix| · log |set|) per probe, inside
  * whole-stage codegen.
  *
  * Built for the prefix-filter containment join's shuffle-free pair
  * dedup: a qualifying pair collides once per shared PREFIX shingle,
  * and emitting it only where `tok == sorted_first_contained(parr,
  * s_y)` keeps exactly one meeting — the same first-healthy-collision
  * idea as [[FirstEqualIndex]], for membership instead of positional
  * equality. The built-in spelling (`element_at(filter(parr, t ->
  * array_contains(s, t)), 1)`) is a higher-order function: interpreted
  * lambda + per-row array allocation, and its presence knocks the
  * whole join out of codegen (measured 54 s vs 20 s for the
  * containment query at sf0.1 before this kernel existed).
  */
case class SortedFirstContained(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_first_contained"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0
    while (i < nx) {
      val v = x.getLong(i)
      var lo = 0; var hi = ny - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mv = y.getLong(mid)
        if (mv == v) return java.lang.Long.valueOf(v)
        else if (mv < v) lo = mid + 1
        else hi = mid - 1
      }
      i += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val v = ctx.freshName("v")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val mv = ctx.freshName("mv")
      val found = ctx.freshName("found")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |boolean $found = false;
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $nx && !$found; $i++) {
         |  long $v = $a.getLong($i);
         |  int $lo = 0, $hi = $ny - 1;
         |  while ($lo <= $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    long $mv = $b.getLong($mid);
         |    if ($mv == $v) { ${ev.value} = $v; $found = true; break; }
         |    else if ($mv < $v) $lo = $mid + 1;
         |    else $hi = $mid - 1;
         |  }
         |}
         |if (!$found) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstContained =
    copy(left = newLeft, right = newRight)
}
