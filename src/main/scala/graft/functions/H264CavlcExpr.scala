package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_cavlc(binary)` → the decoded chroma-DC CAVLC residual
  * census of an Annex-B stream
  * ([[graft.multimodal.H264Cavlc.decode]]): coeff_token,
  * trailing-one signs, the §9.2.2 level prefix/suffix ladder,
  * total_zeros and run_before over every macroblock's two 2×2
  * chroma DC blocks — the entropy-decode rung above `h264_pcm_mbs`'s
  * raw-sample one. Null when the stream is outside the verified
  * subset (non-I_16x16 macroblocks, luma residual, chroma AC,
  * level escapes — all fail closed, see the parser doc). */
case class H264CavlcExpr(child: Expression) extends UnaryExpression
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
    graft.multimodal.H264Cavlc.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Cavlc.decodeRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264CavlcExpr =
    copy(child = c)
  override def prettyName: String = "h264_cavlc"
}

object H264CavlcExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(H264CavlcExpr(ColumnBridge.expression(c)))
}
