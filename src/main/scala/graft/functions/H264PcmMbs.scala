package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_pcm_mbs(binary)` → `array<struct<mb_i:int, luma_sum:bigint,
  * luma_min:int, luma_max:int, cbcr_sum:bigint, width:int,
  * height:int>>` — REAL H.264 sample decode for PCM-coded pictures
  * (full contract in [[graft.multimodal.H264Pcm]]): Annex-B walk →
  * SPS/PPS → Exp-Golomb slice header → per-macroblock I_PCM raw
  * sample read, with per-MB exact-integer luma/chroma statistics.
  * Null when the stream is not a decodable all-I_PCM picture.
  * Codegen-friendly static-call leaf like [[H264Sps]]. */
case class H264PcmMbs(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("mb_i", IntegerType, nullable = false),
    StructField("luma_sum", LongType, nullable = false),
    StructField("luma_min", IntegerType, nullable = false),
    StructField("luma_max", IntegerType, nullable = false),
    StructField("cbcr_sum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Pcm.decodeRows(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Pcm.decodeRows($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264PcmMbs =
    copy(child = c)
  override def prettyName: String = "h264_pcm_mbs"
}

object H264PcmMbs {
  def apply(c: Column): Column =
    ColumnBridge.column(H264PcmMbs(ColumnBridge.expression(c)))
}
