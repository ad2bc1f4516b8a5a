package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `vorbis_floor_fixture(doc_id)` → the `mm_vorbis_floor` fixture:
  * an Ogg stream whose setup page carries one codebook plus a
  * floor1 config and whose third page is a floor packet (raw Y0/Y1
  * posts + book-coded posts), all closed-form in `doc_id`
  * ([[graft.multimodal.Vorbis]]). */
case class VorbisFloorFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.streamFloor(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.streamFloor($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisFloorFixture = copy(child = c)
  override def prettyName: String = "vorbis_floor_fixture"
}

object VorbisFloorFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisFloorFixture(ColumnBridge.expression(c)))
}

/** `vorbis_floor(binary)` →
  * `struct<n_values:int, y_sum:bigint, y_wsum:bigint,
  *         n_step2:bigint>`,
  * null unless the payload parses as an Ogg-framed Vorbis stream
  * whose floor1 config and floor packet decode end to end — the
  * §7.2.3 posts decode through real codebooks plus §7.2.4's
  * neighbor-predicted, room-saturated amplitude synthesis to the
  * final_Y vector, all integer arithmetic
  * ([[graft.multimodal.Vorbis.decodeFloor1]]). */
case class VorbisFloor(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_values", IntegerType, nullable = false),
    StructField("y_sum", LongType, nullable = false),
    StructField("y_wsum", LongType, nullable = false),
    StructField("n_step2", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.floorRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.floorRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VorbisFloor =
    copy(child = c)
  override def prettyName: String = "vorbis_floor"
}

object VorbisFloor {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisFloor(ColumnBridge.expression(c)))
}

/** `vorbis_floor_curve(binary)` →
  * `struct<n_bins:int, curve_sum:bigint, curve_wsum:bigint,
  *         curve_max:bigint>`,
  * the floor walk CONTINUED through §7.2.3 step 2: the X-sorted
  * step2 posts scaled by the multiplier and rasterized by the
  * integer render_line Bresenham over n = blocksize0/2 bins, the
  * tail held at the last amplitude
  * ([[graft.multimodal.Vorbis.synthesizeCurve]]). Null on any
  * malformation. The dB → linear float lookup beyond these integer
  * indices is the remaining declared synthesis boundary. */
case class VorbisFloorCurve(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_bins", IntegerType, nullable = false),
    StructField("curve_sum", LongType, nullable = false),
    StructField("curve_wsum", LongType, nullable = false),
    StructField("curve_max", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.floorCurveRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.floorCurveRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VorbisFloorCurve =
    copy(child = c)
  override def prettyName: String = "vorbis_floor_curve"
}

object VorbisFloorCurve {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisFloorCurve(ColumnBridge.expression(c)))
}
