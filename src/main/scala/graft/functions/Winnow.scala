package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for winnowing fingerprint selection
  * (Schleimer et al. 2003) over a gram-hash array:
  * `graft_winnow(hashes, w)` returns the selected (position, hash)
  * pairs packed as `pos·2³¹ + hash` (hash < 1e9+7 < 2³¹; pos is
  * 1-based), one element per DISTINCT selected position, in position
  * order — element p is selected iff it is the rightmost minimum of
  * some w-hash window.
  *
  * Semantically identical to the window-aggregate form —
  * `max(struct(−h, pos)) OVER (... ROWS w−1 PRECEDING)` then
  * DISTINCT — which the DuckDB oracle still runs, so the correctness
  * gate cross-validates the two algorithms. The window form is the
  * right shape for an engine without per-group scratch space; inside
  * one row the monotonic-deque form is O(n) with zero exchanges:
  * selection becomes a MAP-ONLY projection (explode of the packed
  * array), where the window form shuffled and sorted every gram row
  * by (doc, pos) — at 1M generated docs that exchange+sort was the
  * winnowing pipeline's remaining dominant cost after the Rabin-Karp
  * hash fix ([[GramHashes]]).
  *
  * Deque invariant: indices with strictly increasing hash; pushing i
  * pops every back index with hash ≥ hash(i), so among equal minima
  * the NEWEST survives — the rightmost-tie rule of robust winnowing
  * and of struct(−h, pos) max ordering. */
case class Winnow(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow requires (ARRAY<BIGINT>, INT), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(hAny: Any, wAny: Any): Any = {
    val hs = hAny.asInstanceOf[ArrayData]
    val w = wAny.asInstanceOf[Int]
    val n = hs.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var cnt = 0
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var last = -1
    var i = 0
    while (i < n) {
      val hi = hs.getLong(i)
      while (tail > head && hs.getLong(dq(tail - 1)) >= hi) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val p = dq(head)
        if (p != last) {
          out(cnt) = (p + 1).toLong * 2147483648L + hs.getLong(p)
          cnt += 1; last = p
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hv, wv) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val hi = ctx.freshName("hi")
      val p = ctx.freshName("p")
      s"""
         |int $n = $hv.numElements();
         |if ($wv <= 0 || $n < $wv) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $wv + 1];
         |  int $cnt = 0;
         |  int[] $dq = new int[$n];
         |  int $head = 0; int $tail = 0; int $last = -1;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hi = $hv.getLong($i);
         |    while ($tail > $head && $hv.getLong($dq[$tail - 1]) >= $hi) $tail--;
         |    $dq[$tail] = $i; $tail++;
         |    if ($dq[$head] <= $i - $wv) $head++;
         |    if ($i >= $wv - 1) {
         |      int $p = $dq[$head];
         |      if ($p != $last) {
         |        $out[$cnt] = ((long) ($p + 1)) * 2147483648L + $hv.getLong($p);
         |        $cnt++; $last = $p;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $cnt));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Winnow =
    copy(left = newLeft, right = newRight)
}
