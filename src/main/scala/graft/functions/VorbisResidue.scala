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
