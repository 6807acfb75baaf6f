package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for all k-gram rolling hashes of a
  * string at once: `graft_gram_hashes(s, k)` returns
  * `ARRAY<BIGINT>` of length `len(s) − k + 1` (empty when the string
  * is shorter than k), where element p is [[PolyHash]] of the k bytes
  * starting at 0-based offset p.
  *
  * The composable form — `transform(sequence(1, n − k + 1),
  * p -> graft_polyhash(substring(s, p, k)))` — re-hashes every gram
  * from scratch: O(n·k) byte work plus a garbage `String` per gram,
  * which at 1M documents was the winnowing pipeline's dominant cost
  * (19.5k executor-seconds at k = 8, ~660M substring allocations).
  * This expression keeps the polynomial-hash semantics bit-identical
  * (h·31 + byte mod 1e9+7, leading term dropped by subtracting
  * c·31^(k−1) — the Rabin-Karp recurrence) but runs O(n) with ONE
  * long[] allocation per row, inside whole-stage codegen.
  *
  * Byte-loop-equals-char-loop caveat is the same as [[PolyHash]]:
  * exact for ASCII, documented, corpus is ASCII, oracle parity holds
  * (the DuckDB twin folds per-substring and the hashes agree).
  */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  private val P = 1000000007L

  override protected def nullSafeEval(input: Any, kAny: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val k = kAny.asInstanceOf[Int]
    val m = bytes.length - k + 1
    if (k <= 0 || m <= 0) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * 31L % P; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31L + (bytes(i) & 0xff)) % P; i += 1 }
    out(0) = h
    var p = 1
    while (p < m) {
      h = (h - (bytes(p - 1) & 0xff) * pow) % P
      if (h < 0) h += P
      h = (h * 31L + (bytes(p + k - 1) & 0xff)) % P
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, kv) => {
      val bytes = ctx.freshName("bytes")
      val m = ctx.freshName("m")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $m = $bytes.length - $kv + 1;
         |if ($kv <= 0 || $m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long $pow = 1L;
         |  for (int $i = 1; $i < $kv; $i++) { $pow = $pow * 31L % ${P}L; }
         |  long[] $arr = new long[$m];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $kv; $i++) {
         |    $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${P}L;
         |  }
         |  $arr[0] = $h;
         |  for (int $p = 1; $p < $m; $p++) {
         |    $h = ($h - ($bytes[$p - 1] & 0xff) * $pow) % ${P}L;
         |    if ($h < 0) $h += ${P}L;
         |    $h = ($h * 31L + ($bytes[$p + $kv - 1] & 0xff)) % ${P}L;
         |    $arr[$p] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}
