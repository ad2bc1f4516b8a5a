package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `image_levels(binary)` →
  * `struct<width:int, height:int, n_px:bigint,
  *         sum_r:bigint, sum_g:bigint, sum_b:bigint>`,
  * null when the payload is not an uncompressed 24-bit BMP.
  *
  * The image sibling of [[AudioLevels]]: BMP BI_RGB is the
  * codec-free image format (raw BGR rows, 4-byte row padding), so
  * per-file channel sums — the brightness/color-cast QA signal a
  * vision-data pipeline computes before feature extraction — are
  * pure byte arithmetic behind whole-stage codegen. Exact integer
  * outputs (means derive at the edge) so results hash bit-for-bit
  * against a positional oracle replay; the pixel walk lives in
  * [[graft.multimodal.ImageHeaders.bmpLevels]] so interpreted and
  * codegen paths share one decoder.
  */
case class ImageLevels(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ImageHeaders.bmpLevelsRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ImageHeaders.bmpLevelsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): ImageLevels =
    copy(child = c)
  override def prettyName: String = "image_levels"
}

object ImageLevels {
  def apply(c: Column): Column =
    ColumnBridge.column(ImageLevels(ColumnBridge.expression(c)))
}
