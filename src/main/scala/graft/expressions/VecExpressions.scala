package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel the generated code calls — same object serves the
  * interpreted path, so both evaluate identically. */
object VecKernels {
  /** exact fixed-point inner product of two bigint arrays, with the
    * same result semantics as the higher-order form it replaces
    * (`aggregate(zip_with(a, b, (x, y) => x * y), 0L, acc + v)`):
    * a length mismatch or a null element nulls the result (zip_with
    * pads the short side with null and `acc + null` is null), and
    * overflow aborts (ANSI `*`/`+` semantics via multiplyExact /
    * addExact — all committed corpora are far inside Long). Returns a
    * boxed Long or null. */
  def ipFixed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Exact integer inner product of two fixed-point `array<bigint>`
  * columns as a codegen expression. The higher-order
  * `aggregate(zip_with(...))` form it replaces is CodegenFallback —
  * interpreted per row with a lambda-variable binding and an
  * intermediate product array per evaluation — which dominated the
  * candidate-scoring stages (ss_recall_1m scores ~12M candidate rows
  * per run). Same integer arithmetic, same null/length semantics
  * (IpFixedSpec pins equality against the zip_with form). */
case class IpFixedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<bigint>, array<bigint>) arguments")
  }
  override def prettyName: String = "ip_fixed"
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.ipFixed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.expressions.VecKernels.ipFixed($a, $b);
      ${ev.isNull} = (${ev.value}_r == null);
      ${ev.value} = ${ev.isNull} ? 0L : ${ev.value}_r.longValue();
    """)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IpFixedExpr =
    copy(left = newLeft, right = newRight)
}
