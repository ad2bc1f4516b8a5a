package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_cavlc_full(binary)` → the decoded COMBINED-residual CAVLC
  * census of an Annex-B stream
  * ([[graft.multimodal.H264Cavlc.decodeFull]]): per macroblock a
  * REAL luma-DC block (full 0 ≤ nC < 2 coeff_token column, §9.2.2.1
  * escapes, 4×4 total_zeros) followed by the two chroma-DC blocks —
  * the region boundary between the classes implicit in the codeword
  * widths, so a slip in either walk desynchronizes the other. Null
  * outside the decodable class. */
case class H264CavlcFullExpr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_mbs", LongType, nullable = false),
    StructField("n_luma", LongType, nullable = false),
    StructField("luma_sum", LongType, nullable = false),
    StructField("n_chroma", LongType, nullable = false),
    StructField("chroma_sum", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_tz", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Cavlc
      .decodeFullRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Cavlc.decodeFullRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264CavlcFullExpr =
    copy(child = c)
  override def prettyName: String = "h264_cavlc_full"
}

object H264CavlcFullExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(H264CavlcFullExpr(ColumnBridge.expression(c)))
}
