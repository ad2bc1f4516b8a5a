package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `flac_pcm_levels(binary)` →
  * `struct<channels:int, sample_rate:int, bits:int, n_values:bigint,
  *         sum_sq:bigint, peak:int, n_clipped:bigint>`,
  * null unless the payload is a FLAC stream whose frames decode
  * entirely through the UNCODED subframe types (CONSTANT/VERBATIM —
  * FLAC's lossless escape hatch, the audio analog of H.264 I_PCM).
  *
  * Native Catalyst expression like [[AudioLevels]]: one static call
  * in generated Java inside whole-stage codegen; the frame walk and
  * bit reader live in
  * [[graft.multimodal.AudioHeaders.parseFlacPcm]] so interpreted
  * and codegen paths share one decoder. Outputs are exact integers
  * (no sqrt) so results hash bit-for-bit against a replayed oracle.
  */
case class FlacPcmLevels(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("n_clipped", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders.flacPcmRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.flacPcmRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): FlacPcmLevels =
    copy(child = c)
  override def prettyName: String = "flac_pcm_levels"
}

object FlacPcmLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacPcmLevels(ColumnBridge.expression(c)))
}
