package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expressions for the hot commitment kernels
  * (SURVEY §2.9: "promote hot ones to codegen `Expression`").
  *
  * Compared to the UDF wrappers these stay inside whole-stage codegen:
  * no encoder round-trip, no closure dispatch — the generated Java
  * calls the kernel's static forwarder directly on the unsafe row's
  * byte array. The kernels themselves are shared with the UDF path
  * (graft.core), so both evaluate bit-identically.
  */
case class Keccak256Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary argument")
  override def prettyName: String = "keccak256"
  override protected def nullSafeEval(input: Any): Any =
    graft.core.Keccak.keccak256(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Keccak.keccak256($c)")
  override protected def withNewChildInternal(newChild: Expression): Keccak256Expr =
    copy(child = newChild)
}

/** `leaf_hash_for_mapping` (storage/lpn/mod.rs:44-56) as a codegen
  * binary expression over (key32, value32). */
case class MappingLeafHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary arguments")
  override def prettyName: String = "mapping_leaf_hash"
  override protected def nullSafeEval(k: Any, v: Any): Any =
    graft.core.Commitments.mappingLeafHash(k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, v) => s"graft.core.Commitments.mappingLeafHash($k, $v)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MappingLeafHashExpr =
    copy(left = newLeft, right = newRight)
}

/** `leaf_digest_for_mapping` (storage/lpn/mod.rs:30-42), codegen. */
case class MappingLeafDigestExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary arguments")
  override def prettyName: String = "mapping_leaf_digest"
  override protected def nullSafeEval(k: Any, v: Any): Any =
    graft.core.Commitments.mappingLeafDigest(k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, v) => s"graft.core.Commitments.mappingLeafDigest($k, $v)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MappingLeafDigestExpr =
    copy(left = newLeft, right = newRight)
}

/** Session extension wiring (SparkSessionExtensions): registers the
  * native expressions as SQL functions, so
  * `spark.sql("SELECT keccak256(x) ...")` plans the codegen
  * expression — no UDF in the path. Install with
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[Keccak256Expr].getName, "keccak256"),
      (args: Seq[Expression]) => Keccak256Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("mapping_leaf_hash"),
      new ExpressionInfo(classOf[MappingLeafHashExpr].getName, "mapping_leaf_hash"),
      (args: Seq[Expression]) => MappingLeafHashExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("mapping_leaf_digest"),
      new ExpressionInfo(classOf[MappingLeafDigestExpr].getName, "mapping_leaf_digest"),
      (args: Seq[Expression]) => MappingLeafDigestExpr(args(0), args(1))))
  }
}
