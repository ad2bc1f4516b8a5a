package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `image_dims(binary)` → `struct<kind:string, width:int, height:int>`,
  * null when the payload is not a parseable PNG/JPEG.
  *
  * A native Catalyst expression (not a UDF) for the same reason as
  * [[IsValidIri]]: header sniffing runs over every media row of a
  * 100 TB scan, and a single static call in generated Java stays
  * inside whole-stage codegen with no serialization or boxing. The
  * byte-walking itself lives in [[graft.multimodal.ImageHeaders]] so
  * the interpreted path, the codegen path, and the partition-local
  * codec seam ([[graft.multimodal.Multimodal.StubCodec]]) share one
  * parser.
  */
case class ImageDims(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ImageHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ImageHeaders.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): ImageDims =
    copy(child = c)
  override def prettyName: String = "image_dims"
}

object ImageDims {
  def apply(c: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(c)))
}
