package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `vorbis_vq_fixture(doc_id)` → the `mm_vorbis_vq` fixture stream:
  * the [[VorbisFixture]] three-page Ogg layout with the setup
  * books carrying §3.2.2 VQ lookup sections cycling types 0/1/2
  * (packed-float min/delta, value_bits, sequence flag, full
  * multiplicand arrays), all closed-form in `doc_id`. */
case class VorbisVqFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.streamVq(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.streamVq($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisVqFixture = copy(child = c)
  override def prettyName: String = "vorbis_vq_fixture"
}

object VorbisVqFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisVqFixture(ColumnBridge.expression(c)))
}

/** `vorbis_vq(binary)` →
  * `struct<n_books:int, n_lookup1:bigint, n_lookup2:bigint,
  *         mul_count:bigint, mul_sum:bigint, n_seq:bigint,
  *         sym_sum:bigint>`,
  * null unless the payload is an Ogg-framed Vorbis stream whose
  * codebooks (including §3.2.2 VQ lookup tables) parse completely
  * and whose symbol packet decodes — the full-§3.2 twin of
  * [[VorbisBooks]]. */
case class VorbisVq(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_books", IntegerType, nullable = false),
    StructField("n_lookup1", LongType, nullable = false),
    StructField("n_lookup2", LongType, nullable = false),
    StructField("mul_count", LongType, nullable = false),
    StructField("mul_sum", LongType, nullable = false),
    StructField("n_seq", LongType, nullable = false),
    StructField("sym_sum", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.vqRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.vqRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VorbisVq =
    copy(child = c)
  override def prettyName: String = "vorbis_vq"
}

object VorbisVq {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisVq(ColumnBridge.expression(c)))
}
