package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `vorbis_residue_fixture(doc_id)` → the `mm_vorbis_residue`
  * fixture: an Ogg stream whose setup page carries one classbook
  * plus a §8.6.1 residue config with EMPTY cascades, and whose
  * third page is the classword packet
  * ([[graft.multimodal.Vorbis]]). */
case class VorbisResidueFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.streamResidue(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.streamResidue($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisResidueFixture = copy(child = c)
  override def prettyName: String = "vorbis_residue_fixture"
}

object VorbisResidueFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisResidueFixture(ColumnBridge.expression(c)))
}

/** `vorbis_residue(binary)` →
  * `struct<n_partitions:int, n_classwords:bigint, class_sum:bigint,
  *         class_wsum:bigint>`,
  * null unless the payload parses through the §8.6.1 residue config
  * walk and §8.6.2's classification cascade — classwords decoded
  * through the classbook and unpacked last-slot-first by integer
  * divmod ([[graft.multimodal.Vorbis.decodeResidueClasses]]). */
case class VorbisResidue(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_partitions", IntegerType, nullable = false),
    StructField("n_classwords", LongType, nullable = false),
    StructField("class_sum", LongType, nullable = false),
    StructField("class_wsum", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.residueRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.residueRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VorbisResidue =
    copy(child = c)
  override def prettyName: String = "vorbis_residue"
}

object VorbisResidue {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisResidue(ColumnBridge.expression(c)))
}

/** `vorbis_residue_apply_fixture(doc_id)` → the
  * `mm_vorbis_residue_apply` fixture: the same Ogg layout with one
  * value book per class, single-pass cascades on alternating
  * classes, and the interleaved classword/value packet
  * ([[graft.multimodal.Vorbis.streamResidueApply]]). */
case class VorbisResidueApplyFixture(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.streamResidueApply(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.streamResidueApply($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisResidueApplyFixture = copy(child = c)
  override def prettyName: String = "vorbis_residue_apply_fixture"
}

object VorbisResidueApplyFixture {
  def apply(c: Column): Column = ColumnBridge.column(
    VorbisResidueApplyFixture(ColumnBridge.expression(c)))
}

/** `vorbis_residue_apply(binary)` →
  * `struct<n_slots:bigint, n_values:bigint, res_sum:bigint,
  *         res_wsum:bigint, n_nonzero:bigint>`,
  * null unless the payload decodes through the FULL §8.6.2 value
  * pass in the integer domain — the interleaved classword/value
  * walk with VQ multiplicands accumulated into the partition slots
  * ([[graft.multimodal.Vorbis.decodeResidueApply]]). */
case class VorbisResidueApply(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_slots", LongType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("res_sum", LongType, nullable = false),
    StructField("res_wsum", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.residueApplyRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.residueApplyRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(
      c: Expression): VorbisResidueApply = copy(child = c)
  override def prettyName: String = "vorbis_residue_apply"
}

object VorbisResidueApply {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisResidueApply(ColumnBridge.expression(c)))
}

/** `vorbis_residue_scale_fixture(doc_id)` → the
  * `mm_vorbis_residue_scale` fixture: the apply lane's layout and
  * packet with value books carrying INTEGER-EXACT packed-float
  * min/delta (exponent 788 = 2^0), so the §3.2.2 value mapping
  * stays in the Long census domain
  * ([[graft.multimodal.Vorbis.streamResidueScale]]). */
case class VorbisResidueScaleFixture(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.streamResidueScale(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.streamResidueScale($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisResidueScaleFixture = copy(child = c)
  override def prettyName: String = "vorbis_residue_scale_fixture"
}

object VorbisResidueScaleFixture {
  def apply(c: Column): Column = ColumnBridge.column(
    VorbisResidueScaleFixture(ColumnBridge.expression(c)))
}

/** `vorbis_residue_scale(binary)` →
  * `struct<n_slots:bigint, n_values:bigint, sc_sum:bigint,
  *         sc_wsum:bigint, n_nonzero:bigint>`,
  * null unless the payload decodes through the value pass WITH the
  * §3.2.2 minimum + delta·multiplicand mapping applied in the
  * integer-exact domain; the positional weight is the ABSOLUTE
  * spectrum offset, pinning the §8.6 begin/end placement
  * ([[graft.multimodal.Vorbis.decodeResidueScale]]). */
case class VorbisResidueScale(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_slots", LongType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("sc_sum", LongType, nullable = false),
    StructField("sc_wsum", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.residueScaleRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.residueScaleRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(
      c: Expression): VorbisResidueScale = copy(child = c)
  override def prettyName: String = "vorbis_residue_scale"
}

object VorbisResidueScale {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisResidueScale(ColumnBridge.expression(c)))
}
