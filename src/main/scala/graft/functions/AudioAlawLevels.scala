package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `audio_alaw_levels(binary)` →
  * `struct<channels:int, sample_rate:int, n_values:bigint,
  *         sum_sq:bigint, peak:int, n_fullscale:bigint>`,
  * null when the payload is not a G.711 A-law WAV (format tag 6).
  *
  * [[AudioUlawLevels]]' A-law sibling — the European telephony
  * companding with its own arithmetic (XOR-0x55 alternate-bit
  * inversion, a linear segment 0 with no bias and no zero code,
  * sign-bit-set-means-positive): each payload byte expands through
  * [[graft.multimodal.AudioHeaders.alawExpand]] and the decoded
  * samples get the same exact-integer energy/peak/rail metering.
  * Native Catalyst expression inside whole-stage codegen; outputs
  * hash bit-for-bit against an oracle replaying the expansion
  * formula positionally.
  */
case class AudioAlawLevels(child: Expression) extends UnaryExpression
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
      .alawLevelsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.alawLevelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(
      c: Expression): AudioAlawLevels = copy(child = c)
  override def prettyName: String = "audio_alaw_levels"
}

object AudioAlawLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(AudioAlawLevels(ColumnBridge.expression(c)))
}
