package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `video_meta(binary)` →
  * `struct<width:int, height:int, timescale:int, duration:bigint>`,
  * null when the payload is not a parseable MP4 container.
  *
  * Native Catalyst expression for the same reason as [[ImageDims]] /
  * [[AudioMeta]]: container sniffing runs over every media row of a
  * 100 TB scan, and a single static call in generated Java stays
  * inside whole-stage codegen. The box walking lives in
  * [[graft.multimodal.VideoHeaders]] so interpreted and codegen
  * paths share one parser. */
case class VideoMeta(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.VideoHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.VideoHeaders.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VideoMeta =
    copy(child = c)
  override def prettyName: String = "video_meta"
}

object VideoMeta {
  def apply(c: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(c)))
}
