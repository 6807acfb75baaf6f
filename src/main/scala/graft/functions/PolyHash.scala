package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash:
  *
  *   fold chars: acc ← (acc·31 + code) mod 1e9+7
  *
  * Semantically identical (for ASCII input — the corpus) to the
  * composable form `aggregate(transform(split(s, ''), c -> ascii(c)),
  * 0L, ...)`, but that form is an interpreted higher-order function:
  * per row it allocates a char array, N singleton strings, and
  * evaluates two lambdas per char outside codegen. This expression is
  * one fused whole-stage-codegen loop over the UTF8String bytes — the
  * "custom Expression with doGenCode beats UDF beats interpreted"
  * ordering the engine's design rules call for, applied to the ONE
  * hot path that needed it (shingle fingerprinting in dedup, which
  * hashes every 3-gram of every document).
  *
  * The byte loop equals the char loop for ASCII; non-ASCII bytes would
  * diverge from `ascii()` semantics, which is acceptable for a
  * fingerprint (documented, corpus is ASCII, oracle parity holds).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object GraftFunctions {
  /** Register engine functions on the session (idempotent) so `expr`
    * strings and SQL can call them. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      (exprs: Seq[Expression]) => GramHashes(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => Winnow(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_probe"),
      new ExpressionInfo(classOf[BloomProbe].getName, "graft_bloom_probe"),
      (exprs: Seq[Expression]) => BloomProbe(exprs(0), exprs(1), exprs(2), exprs(3)))
  }
}
