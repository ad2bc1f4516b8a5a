package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `jpeg_luma(binary)` →
  * `struct<width:int, height:int, n_px:bigint, sum_y:bigint>`,
  * null when the payload is not a decodable BASELINE JPEG
  * (SOF0, 8-bit, grayscale or YCbCr, interleaved scan; progressive
  * and arithmetic-coded streams are rejected).
  *
  * The ENTROPY-CODED sibling of [[PngLevels]]: the pixel data sits
  * behind canonical Huffman + run-length DCT coefficients, decoded
  * by [[graft.multimodal.JpegDecode]] (pure JVM — bit reader with
  * FF00 unstuffing, JPEG F.2.2.3 Huffman tables, dequant + IDCT),
  * shared by the interpreted and codegen paths. Luma-only by
  * design: chroma blocks are entropy-skipped, never reconstructed.
  */
case class JpegLuma(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_y", LongType, nullable = false)))

  // nullable even for non-null input: undecodable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.JpegDecode.lumaLevelsRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.JpegDecode.lumaLevelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): JpegLuma =
    copy(child = c)
  override def prettyName: String = "jpeg_luma"
}

object JpegLuma {
  def apply(c: Column): Column =
    ColumnBridge.column(JpegLuma(ColumnBridge.expression(c)))
}
