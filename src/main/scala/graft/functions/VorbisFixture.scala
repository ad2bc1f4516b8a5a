package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `vorbis_fixture(doc_id)` → a complete three-page Ogg/Vorbis
  * stream (identification packet, a type-5 setup packet carrying
  * 1–3 REAL Huffman codebooks cycling all three §3.2.1 header
  * paths, and a codeword symbol packet), every parameter a
  * deterministic function of `doc_id` ([[graft.multimodal.Vorbis]])
  * — the encode half of the `mm_vorbis_books` round-trip, the
  * [[FlacFixedFixture]] discipline: the oracle replays the decoded
  * symbol census in closed form while the engine must recover it
  * through actual packed codewords. */
case class VorbisFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Vorbis.stream(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Vorbis.stream($c);")

  override protected def withNewChildInternal(
      c: Expression): VorbisFixture = copy(child = c)
  override def prettyName: String = "vorbis_fixture"
}

object VorbisFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(VorbisFixture(ColumnBridge.expression(c)))
}
