package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_cavlc_luma(binary)` → the decoded LUMA-DC CAVLC residual
  * census of an Annex-B stream
  * ([[graft.multimodal.H264Cavlc.decodeLuma]]): the full Table 9-5
  * 0 ≤ nC < 2 coeff_token column with real coefficients
  * (TotalCoeff 0..16), trailing-one signs, the complete §9.2.2.1
  * level ladder including the prefix-14/15/≥16 escapes, Tables
  * 9-7/9-8 total_zeros and the full run_before table, over
  * one-MB-row I_16x16 pictures with luma/chroma CBP 0 (where nC
  * provably stays 0). Null when the stream is outside that class
  * (multi-row pictures, coded AC blocks, Intra_4x4 — all fail
  * closed, see the parser doc). */
case class H264CavlcLumaExpr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_mbs", LongType, nullable = false),
    StructField("n_coeffs", LongType, nullable = false),
    StructField("n_t1", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_levels", LongType, nullable = false),
    StructField("sum_tz", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Cavlc
      .decodeLumaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Cavlc.decodeLumaRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264CavlcLumaExpr =
    copy(child = c)
  override def prettyName: String = "h264_cavlc_luma"
}

object H264CavlcLumaExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(H264CavlcLumaExpr(ColumnBridge.expression(c)))
}
