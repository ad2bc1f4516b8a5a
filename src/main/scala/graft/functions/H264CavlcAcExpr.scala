package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_cavlc_ac(binary)` → the decoded LUMA-AC CAVLC residual
  * census of an Annex-B stream
  * ([[graft.multimodal.H264Cavlc.decodeAc]]): luma CBP 15 I_16x16
  * pictures — one Intra16x16DCLevel block plus SIXTEEN
  * Intra16x16ACLevel blocks per macroblock, each routed to its
  * Table 9-5 coeff_token column by the REAL §9.2.1 neighbour-nC
  * derivation over previously decoded TotalCoeffs (columns
  * 0 ≤ nC < 2 and 2 ≤ nC < 4, the algorithmic nC ≥ 8 six-bit FLC;
  * the 4 ≤ nC < 8 column is declared fail-closed). `sum_nc` totals
  * every block's derived nC — the neighbour arithmetic is part of
  * the census, not just the routing. Null when the stream is
  * outside the declared class. */
case class H264CavlcAcExpr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_mbs", LongType, nullable = false),
    StructField("n_dc", LongType, nullable = false),
    StructField("dc_sum", LongType, nullable = false),
    StructField("n_ac", LongType, nullable = false),
    StructField("ac_sum", LongType, nullable = false),
    StructField("n_t1", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_tz", LongType, nullable = false),
    StructField("sum_nc", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Cavlc
      .decodeAcRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Cavlc.decodeAcRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264CavlcAcExpr =
    copy(child = c)
  override def prettyName: String = "h264_cavlc_ac"
}

object H264CavlcAcExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(H264CavlcAcExpr(ColumnBridge.expression(c)))
}
