package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `flac_fixed_fixture(doc_id)` → a complete FLAC stream whose one
  * frame carries FIXED-predictor subframes with REAL Rice-coded
  * residuals, every parameter a deterministic function of `doc_id`
  * ([[graft.multimodal.FlacFixture]]) — the encode half of the
  * `mm_flac_fixed` round-trip, the [[GzipMember]] discipline: the
  * oracle replays expected SAMPLES in closed form while the engine
  * must recover them through actual compressed bits. */
case class FlacFixedFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.FlacFixture.stream(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.FlacFixture.stream($c);")

  override protected def withNewChildInternal(
      c: Expression): FlacFixedFixture = copy(child = c)
  override def prettyName: String = "flac_fixed_fixture"
}

object FlacFixedFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacFixedFixture(ColumnBridge.expression(c)))
}
