package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All-k-bits-set bloom membership probe against a dense long-array
  * bitset: `graft_bloom_probe(bm, gram, bits, k)`.
  *
  * Bit positions are definitionally identical to the SQL build side
  * (`pmod(xxhash64(i, gram), bits)` for i in 0..k-1 — the same XXH64
  * statics Spark's `xxhash64` compiles to, seed chain 42 → hashInt(i)
  * → hashUTF8String(gram)), so a bitset built with plain SQL
  * expressions probes correctly through this expression.
  *
  * Why an expression and not the composed SQL predicate: the composed
  * form needs each bit index twice (word select + mask), i.e. 2k
  * xxhash64 evaluations per probed gram, and Catalyst fuses the
  * predicate into the bitset-attach join's condition
  * (BroadcastNestedLoopJoin), which is outside whole-stage codegen —
  * so no subexpression elimination ever collapses the duplicates
  * (measured: the r13 plan carries 6 textual xxhash64 calls and the
  * WSCG dump contains none of them). Here each of the k hashes
  * computes ONCE per gram in one JIT-compiled loop with early exit on
  * the first clear bit — the "custom Expression beats composed SQL"
  * escape hatch (VERDICT r13 Next #6), applied to the predicate that
  * runs per eval gram at exactly the tier the prefilter exists for. */
case class BloomProbe(bm: Expression, gram: Expression,
    bitsExpr: Expression, kExpr: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(bm, gram, bitsExpr, kExpr)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = bm.nullable || gram.nullable
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bm.dataType != ArrayType(LongType, containsNull = false) &&
        bm.dataType != ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe bitset must be ARRAY<BIGINT>, got ${bm.dataType.sql}")
    else if (gram.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe key must be STRING, got ${gram.dataType.sql}")
    else if (bitsExpr.dataType != LongType || !bitsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_probe bits must be a BIGINT literal")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_probe k must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val bits: Long = bitsExpr.eval(null).asInstanceOf[Long]
  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val b = bm.eval(input)
    if (b == null) return null
    val g = gram.eval(input)
    if (g == null) return null
    BloomProbe.probe(b.asInstanceOf[ArrayData],
      g.asInstanceOf[UTF8String], bits, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bmG = bm.genCode(ctx)
    val gG = gram.genCode(ctx)
    val cls = BloomProbe.getClass.getName.stripSuffix("$")
    ev.copy(code = code"""
      |${bmG.code}
      |${gG.code}
      |boolean ${ev.isNull} = ${bmG.isNull} || ${gG.isNull};
      |boolean ${ev.value} = false;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $cls.probe(${bmG.value}, ${gG.value}, ${bits}L, $k);
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomProbe =
    copy(bm = newChildren(0), gram = newChildren(1),
      bitsExpr = newChildren(2), kExpr = newChildren(3))
}

object BloomProbe {
  /** One pass over the k seeds, each gram hashed once per seed, early
    * exit on the first clear bit. Bit math mirrors the SQL build side:
    * pmod → word = bit >> 6 → mask = 1 << (bit & 63). Static forwarder
    * makes this directly callable from generated code. */
  def probe(bm: ArrayData, gram: UTF8String, bits: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val h = XXH64.hashUTF8String(gram, XXH64.hashInt(i, 42L))
      val r = h % bits
      val bit = if (r < 0) r + bits else r
      if ((bm.getLong((bit >> 6).toInt) & (1L << (bit & 63).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }
}
