package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `exif_meta(binary)` →
  * `struct<width:int, height:int, orientation:int>`, null when the
  * payload is not a parseable JPEG or carries a malformed EXIF
  * block. Orientation defaults to 1 (spec top-left) when no EXIF
  * orientation tag is present.
  *
  * Native Catalyst expression for the same reason as [[ImageDims]]:
  * orientation sniffing runs over every photo of a 100 TB media
  * lake before any resize plan, and a single static call in
  * generated Java stays inside whole-stage codegen. The byte walk
  * lives in [[graft.multimodal.ExifHeaders]] so interpreted and
  * codegen paths share one parser.
  */
case class ExifMeta(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("orientation", IntegerType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ExifHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ExifHeaders.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): ExifMeta =
    copy(child = c)
  override def prettyName: String = "exif_meta"
}

object ExifMeta {
  def apply(c: Column): Column =
    ColumnBridge.column(ExifMeta(ColumnBridge.expression(c)))
}
