package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `luma_cells(binary)` →
  * `array<struct<cell_i:int, cell_j:int, lsum:bigint, lcnt:bigint>>`
  * — the REAL pixel-derived image feature vector: decoded luma
  * box-partitioned into the fixed 4×4 cell grid of
  * [[graft.multimodal.ImageGrid.cellGrid]], per-cell exact-integer
  * (sum, count). Null when the payload is not a decodable PNG
  * (types 0/2, depth 8, non-interlaced) or is smaller than the grid.
  *
  * This is the feature-EXTRACTION step of an image similarity
  * pipeline (a learned embedding model would slot into the same
  * seam): fixed-width output regardless of image size, exact
  * integers so the cosine arithmetic downstream hash-matches the
  * SQL oracle with no float convention. Codegen-friendly static-call
  * leaf like [[DHash64]], kept inside whole-stage codegen so
  * extraction runs map-side next to the scan.
  */
case class LumaCells(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell_i", IntegerType, nullable = false),
    StructField("cell_j", IntegerType, nullable = false),
    StructField("lsum", LongType, nullable = false),
    StructField("lcnt", LongType, nullable = false))),
    containsNull = false)

  // nullable even for non-null input: undecodable/too-small → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ImageGrid.cellRows(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ImageGrid.cellRows($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): LumaCells =
    copy(child = c)
  override def prettyName: String = "luma_cells"
}

object LumaCells {
  def apply(c: Column): Column =
    ColumnBridge.column(LumaCells(ColumnBridge.expression(c)))
}
