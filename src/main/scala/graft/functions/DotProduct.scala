package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * ARRAY<BIGINT> columns — the similarity-search hot path
  * ([[graft.operators.Similarity]]): every ANN variant computes
  * Σ aᵢ·bᵢ once per candidate pair, and the composable form
  * `aggregate(zip_with(a, b, ...), 0L, ...)` is an interpreted
  * higher-order function that allocates an intermediate array and
  * evaluates two lambdas per element outside codegen. This is one
  * fused whole-stage-codegen loop over the two ArrayData buffers —
  * same preference order as [[PolyHash]] (custom Expression with
  * doGenCode beats UDF beats interpreted HOF), applied to the second
  * hot path that needed it.
  *
  * Semantics match the HOF form exactly, so the optimizer rewrite
  * ([[graft.plans.DotProductRewrite]]) never changes user-visible
  * results: null array → null; arrays of UNEQUAL length → null
  * (zip_with pads the shorter side with nulls, poisoning the fold);
  * any null ELEMENT → null (null product poisons the fold). Equal
  * lengths with non-null elements → Σ aᵢ·bᵢ.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"
  // null is produced on length mismatch / null elements even when both
  // inputs are non-nullable
  override def nullable: Boolean = true

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<BIGINT>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
