package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `audio_meta(binary)` →
  * `struct<channels:int, sample_rate:int, bits:int, n_samples:bigint>`,
  * null when the payload is not a parseable PCM WAV.
  *
  * Native Catalyst expression for the same reason as [[ImageDims]]:
  * header sniffing runs over every media row of a 100 TB scan, and a
  * single static call in generated Java stays inside whole-stage
  * codegen with no serialization or boxing. The byte walking lives in
  * [[graft.multimodal.AudioHeaders]] so interpreted and codegen paths
  * share one parser.
  */
case class AudioMeta(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): AudioMeta =
    copy(child = c)
  override def prettyName: String = "audio_meta"
}

object AudioMeta {
  def apply(c: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(c)))
}
