package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_cavlc_mb(binary)` → the decoded COMPLETE-macroblock CAVLC
  * residual census of an Annex-B stream
  * ([[graft.multimodal.H264Cavlc.decodeMb]]): chroma CBP 2 / luma
  * CBP 15 I_16x16 pictures, where the §7.3.5.3.3 residual carries
  * every block class REAL — Intra16x16DCLevel, sixteen
  * Intra16x16ACLevel blocks (neighbour-routed Table 9-5 columns),
  * two ChromaDCLevel blocks (the fixed nC = −1 column), and eight
  * ChromaACLevel blocks (per-component 2×2-grid neighbour nC).
  * Null when the stream is outside the declared class. */
case class H264CavlcMbExpr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_mbs", LongType, nullable = false),
    StructField("luma_dc", LongType, nullable = false),
    StructField("luma_ac", LongType, nullable = false),
    StructField("chroma_dc", LongType, nullable = false),
    StructField("chroma_ac", LongType, nullable = false),
    StructField("sum_levels", LongType, nullable = false),
    StructField("n_t1", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_tz", LongType, nullable = false),
    StructField("sum_nc", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Cavlc
      .decodeMbRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Cavlc.decodeMbRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264CavlcMbExpr =
    copy(child = c)
  override def prettyName: String = "h264_cavlc_mb"
}

object H264CavlcMbExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(H264CavlcMbExpr(ColumnBridge.expression(c)))
}
