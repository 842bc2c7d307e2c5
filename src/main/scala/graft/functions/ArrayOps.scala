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

/** The containment-join verification kernel, fused: for a candidate row
  * (prefix array `parr` of the containee, the PREFIX POSITION `pi` the
  * join matched at, both full SORTED shingle sets), in ONE generated-
  * code block:
  *  1. FIRST-SHARED dedup — the pair materializes only at the df-first
  *    prefix shingle present in the container's set. The join key
  *    already guarantees parr[pi] is in the container, so the check
  *    reduces to "none of parr[0..pi-1] is" — pi membership probes,
  *    zero for the pi = 0 rows, instead of re-searching the matched
  *    token itself;
  *  2. merge-intersect of the two sorted sets with the PPJoin-style
  *    POSITIONAL early abort: at merge position (i, j) with m matches,
  *    at most m + min(|x|-i, |y|-j) matches are still reachable — as
  *    soon as that upper bound fails the caller's threshold compare
  *    (evaluated on the SAME doubles), the merge stops.
  * Returns the exact intersection count, or -1 when the row is deduped
  * away or provably below threshold (the caller's `>= t*min(sz)`
  * predicate then fails, exactly as if the full count had been
  * compared — the abort tests the bound with the identical double
  * arithmetic, so no passing pair is ever cut).
  *
  * Fusing matters because the unfused pipeline ran the first-shared
  * scan on EVERY joined row and the full merge on every survivor — two
  * kernel evaluations and no abort; this is one evaluation and a
  * bounded merge (measured on the sf0.1 containment query: the two
  * kernels were ~4.7 s of a 9.3 s join).
  */
case class ContainmentVerify(
    parr: Expression, pos: Expression,
    sx: Expression, sy: Expression, threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = parr
  override def second: Expression = pos
  override def third: Expression = sx
  override def fourth: Expression = sy
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_containment_verify"

  override def checkInputDataTypes(): TypeCheckResult =
    (parr.dataType, pos.dataType, sx.dataType, sy.dataType) match {
      case (ArrayType(LongType, _), IntegerType,
          ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int, array<bigint>, " +
          s"array<bigint>), got $other")
    }

  override def nullSafeEval(p0: Any, t0: Any, x0: Any, y0: Any): Any = {
    val p = p0.asInstanceOf[ArrayData]
    val pi = t0.asInstanceOf[Int]
    val x = x0.asInstanceOf[ArrayData]
    val y = y0.asInstanceOf[ArrayData]
    val ny = y.numElements()
    // 1. first-shared dedup: no EARLIER prefix shingle may be in y
    //    (the join key guarantees parr(pi) itself is)
    var k = 0
    while (k < pi) {
      val v = p.getLong(k)
      var lo = 0; var hi = ny - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mv = y.getLong(mid)
        if (mv == v) return java.lang.Integer.valueOf(-1)
        else if (mv < v) lo = mid + 1
        else hi = mid - 1
      }
      k += 1
    }
    // 2. merge with positional early abort
    val nx = x.numElements()
    val limit = threshold * math.min(nx, ny)
    var i = 0; var j = 0; var m = 0
    while (i < nx && j < ny) {
      if ((m + math.min(nx - i, ny - j)).toDouble < limit)
        return java.lang.Integer.valueOf(-1)
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { m += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, t, x, y) => {
      val ny = ctx.freshName("ny")
      val nx = ctx.freshName("nx")
      val k = ctx.freshName("k"); val v = ctx.freshName("v")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val mv = ctx.freshName("mv")
      val dup = ctx.freshName("dup")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val lim = ctx.freshName("lim")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val rem = ctx.freshName("rem")
      s"""
         |int $ny = $y.numElements();
         |boolean $dup = false;
         |for (int $k = 0; $k < $t && !$dup; $k++) {
         |  long $v = $p.getLong($k);
         |  int $lo = 0, $hi = $ny - 1;
         |  while ($lo <= $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    long $mv = $y.getLong($mid);
         |    if ($mv == $v) { $dup = true; break; }
         |    else if ($mv < $v) $lo = $mid + 1;
         |    else $hi = $mid - 1;
         |  }
         |}
         |${ev.value} = -1;
         |if (!$dup) {
         |  int $nx = $x.numElements();
         |  double $lim = $threshold * (double) java.lang.Math.min($nx, $ny);
         |  int $i = 0, $j = 0, $m = 0;
         |  while ($i < $nx && $j < $ny) {
         |    int $rem = $m + java.lang.Math.min($nx - $i, $ny - $j);
         |    if ((double) $rem < $lim) { $m = -1; break; }
         |    long $xv = $x.getLong($i);
         |    long $yv = $y.getLong($j);
         |    if ($xv == $yv) { $m++; $i++; $j++; }
         |    else if ($xv < $yv) $i++;
         |    else $j++;
         |  }
         |  ${ev.value} = $m;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): ContainmentVerify =
    copy(parr = newFirst, pos = newSecond, sx = newThird, sy = newFourth)
}
