package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `vorbis_books(binary)` →
  * `struct<n_books:int, n_entries:bigint, n_used:bigint,
  *         sum_dims:bigint, n_syms:bigint, sym_sum:bigint,
  *         sym_wsum:bigint>`,
  * null unless the payload is an Ogg-framed Vorbis stream whose
  * setup packet carries complete scalar codebooks and whose symbol
  * packet decodes end-to-end through them — REAL table-driven
  * entropy decode with the tables built from the STREAM per
  * §3.2.1's canonical assignment ([[graft.multimodal.Vorbis]]).
  *
  * Native Catalyst expression like [[FlacPcmLevels]]: one static
  * call in generated Java inside whole-stage codegen; the bitpacker
  * and tree walk live in [[graft.multimodal.Vorbis]] so interpreted
  * and codegen paths share one decoder. */
case class VorbisBooks(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_books", IntegerType, nullable = false),
    StructField("n_entries", LongType, nullable = false),
    StructField("n_used", LongType, nullable = false),
    StructField("sum_dims", LongType, nullable = false),
    StructField("n_syms", LongType, nullable = false),
    StructField("sym_sum", LongType, nullable = false),
    StructField("sym_wsum", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.booksRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Vorbis.booksRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): VorbisBooks =
    copy(child = c)
  override def prettyName: String = "vorbis_books"
}

object VorbisBooks {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisBooks(ColumnBridge.expression(c)))
}
