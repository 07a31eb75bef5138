package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel the generated code calls — same object serves the
  * interpreted path, so both evaluate identically. */
object TextKernels {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** deflate(level 6) size over raw size — the compression-ratio
    * quality signal (repetitive/boilerplate text ≪ 1, random noise
    * ≈ 1). One Deflater per call: cheap relative to the compression
    * itself, and thread-safe without pooling. */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](256)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n.toDouble / raw.length
    } finally d.end()
  }
}

/** Unicode NFC normalization as a codegen expression — the first step
  * of any text-cleaning pipeline (fold decomposed sequences like
  * e + U+0301 into their precomposed forms so dedup/hash/compare see
  * one canonical byte string). Stays inside whole-stage codegen: the
  * generated Java calls the static kernel directly, no UDF closure
  * dispatch. DuckDB's `nfc_normalize` implements the same Unicode
  * normalization, which makes pipelines built on this oracle-able. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Compression-ratio quality signal as a codegen expression (the
  * Dolma/RedPajama-style gate: heavily repetitive text deflates far
  * below 1, high-entropy noise sits near 1 — both ends are dropped by
  * curation). Per-row deflate is CPU-bounded map work that stays
  * inside whole-stage codegen; no UDF closure, no shuffle. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def prettyName: String = "deflate_ratio"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

/** Fused 128-bit SimHash + content fingerprint for the synthetic
  * dedup decade row (`dd_scale_10m`): (seed, uid) -> array<bigint> of
  * (f1, f2, sig_lo, sig_hi). See [[graft.core.SimHash128]] for why
  * this is a native expression rather than the unrolled 40-hash /
  * 16-lane SQL projection (JIT width cliff on the materializing
  * path); `SimHash128Spec` pins the two formulations equal. */
case class SimHash128Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.LongType &&
        right.dataType == org.apache.spark.sql.types.LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (bigint, bigint) arguments")
  override def prettyName: String = "simhash128"
  override protected def nullSafeEval(seed: Any, uid: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.SimHash128.kernel(seed.asInstanceOf[Long], uid.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.SimHash128.kernel($a, $b))")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SimHash128Expr =
    copy(left = newLeft, right = newRight)
}

/** Fused LSH scale-vector kernel for `ss_scale_5m`:
  * (vec_id, nPlanes) -> array<bigint> of (bucket, c1..c64). See
  * [[graft.core.LshScale]] — same JIT-width rationale as
  * [[SimHash128Expr]]; `LshScaleSpec` pins coords, buckets and the
  * planted-copy invariants against the SQL formulation. */
case class LshScaleVecExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.LongType &&
        right.dataType == org.apache.spark.sql.types.IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (bigint, int) arguments")
  override def prettyName: String = "lsh_scale_vec"
  override protected def nullSafeEval(id: Any, nPlanes: Any): Any =
    graft.core.LshScale.kernelArray(id.asInstanceOf[Long], nPlanes.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.LshScale.kernelArray($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshScaleVecExpr =
    copy(left = newLeft, right = newRight)
}
