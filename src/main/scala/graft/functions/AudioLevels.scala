package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `audio_levels(binary)` →
  * `struct<channels:int, sample_rate:int, n_values:bigint,
  *         sum_sq:bigint, peak:int, n_clipped:bigint>`,
  * null when the payload is not a 16-bit PCM WAV.
  *
  * REAL payload decode for the one modality that needs no codec:
  * raw little-endian PCM samples are the wire format, so RMS energy
  * (from the exact integer `sum_sq`), peak level, and clip counting
  * are pure byte arithmetic — the per-file audio QA pass a training
  * pipeline runs before transcription. Native Catalyst expression
  * like [[AudioMeta]]: one static call in generated Java, inside
  * whole-stage codegen, no boxing per row; the sample walk lives in
  * [[graft.multimodal.AudioHeaders.levels]] so interpreted and
  * codegen paths share one decoder. Outputs are exact integers (no
  * sqrt here) so results hash bit-for-bit against a replayed oracle;
  * callers derive RMS as `sqrt(sum_sq / n_values)` at the edge.
  */
case class AudioLevels(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("n_clipped", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders.levelsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.levelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): AudioLevels =
    copy(child = c)
  override def prettyName: String = "audio_levels"
}

object AudioLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(AudioLevels(ColumnBridge.expression(c)))
}
