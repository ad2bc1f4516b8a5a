package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `mp4_sample_fixture(doc_id)` → a complete nested-box MP4 whose
  * `stbl` carries real stsz/stco sample tables, closed-form in
  * `doc_id` ([[graft.multimodal.Mp4Fixture]]) — the encode half of
  * the `mm_mp4_samples` round-trip. */
case class Mp4SampleFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp4Fixture.stream(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp4Fixture.stream($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp4SampleFixture = copy(child = c)
  override def prettyName: String = "mp4_sample_fixture"
}

object Mp4SampleFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp4SampleFixture(ColumnBridge.expression(c)))
}

/** `mp4_samples(binary)` →
  * `struct<n_samples:bigint, sum_sizes:bigint, max_size:bigint,
  *         n_chunks:bigint>`,
  * null unless the payload is an MP4 whose first track carries
  * version-0 stsz/stco sample tables
  * ([[graft.multimodal.VideoHeaders.parseSamples]]) — the walk real
  * frame counts come from, in both stsz layouts. */
case class Mp4Samples(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sizes", LongType, nullable = false),
    StructField("max_size", LongType, nullable = false),
    StructField("n_chunks", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.VideoHeaders.samplesRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.VideoHeaders.samplesRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp4Samples =
    copy(child = c)
  override def prettyName: String = "mp4_samples"
}

object Mp4Samples {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp4Samples(ColumnBridge.expression(c)))
}
