package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `png_levels(binary)` →
  * `struct<width:int, height:int, n_px:bigint,
  *         sum_r:bigint, sum_g:bigint, sum_b:bigint>`,
  * null when the payload is not a decodable PNG. Decodable: all five
  * color types (gray, truecolor, palette, gray+alpha, RGBA) at bit
  * depth 8, the four sample types at bit depth 16, interlace none or
  * Adam7.
  *
  * The COMPRESSED sibling of [[ImageLevels]]: PNG pixels are behind
  * a real zlib/DEFLATE stream, decoded with `java.util.zip.Inflater`
  * (public JDK — no codec dependency) and un-filtered per the PNG
  * spec inside [[graft.multimodal.ImageHeaders.pngLevels]], shared
  * by the interpreted and codegen paths. Exact integer channel sums,
  * same output contract as `image_levels`, so results hash
  * bit-for-bit against a positional stored-mode oracle replay.
  */
case class PngLevels(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  // nullable even for non-null input: undecodable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ImageHeaders.pngLevelsRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ImageHeaders.pngLevelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): PngLevels =
    copy(child = c)
  override def prettyName: String = "png_levels"
}

object PngLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(PngLevels(ColumnBridge.expression(c)))
}
