package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `audio_ulaw_levels(binary)` →
  * `struct<channels:int, sample_rate:int, n_values:bigint,
  *         sum_sq:bigint, peak:int, n_fullscale:bigint>`,
  * null when the payload is not a G.711 µ-law WAV (format tag 7).
  *
  * REAL decode of the first COMPANDED audio wire format in the
  * engine: each payload byte expands through the G.711 µ-law
  * segment/mantissa arithmetic to its 16-bit linear sample
  * ([[graft.multimodal.AudioHeaders.ulawExpand]]), then the same
  * exact-integer energy/peak/rail metering [[AudioLevels]] applies
  * to linear PCM. Native Catalyst expression: one static call in
  * generated Java, inside whole-stage codegen, no boxing per row;
  * interpreted and codegen paths share one decoder
  * ([[graft.multimodal.AudioHeaders.ulawLevels]]). Outputs exact
  * integers so results hash bit-for-bit against an oracle that
  * replays the expansion formula positionally over the same bytes.
  */
case class AudioUlawLevels(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("n_fullscale", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders
      .ulawLevelsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.ulawLevelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(
      c: Expression): AudioUlawLevels = copy(child = c)
  override def prettyName: String = "audio_ulaw_levels"
}

object AudioUlawLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(AudioUlawLevels(ColumnBridge.expression(c)))
}
