package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `flac_lpc_fixture(doc_id)` → a complete FLAC stream whose one
  * frame carries §9.2.4 LPC subframes (quantized coefficients,
  * shift, Rice-coded residuals from the INVERTED predictor), every
  * parameter a deterministic function of `doc_id`
  * ([[graft.multimodal.FlacFixture.streamLpc]]) — the encode half
  * of the `mm_flac_lpc` round-trip, the [[FlacFixedFixture]]
  * discipline: the oracle replays expected SAMPLES in closed form
  * while the engine must recover them through actual compressed
  * bits and the all-integer prediction recurrence. */
case class FlacLpcFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.FlacFixture.streamLpc(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.FlacFixture.streamLpc($c);")

  override protected def withNewChildInternal(
      c: Expression): FlacLpcFixture = copy(child = c)
  override def prettyName: String = "flac_lpc_fixture"
}

object FlacLpcFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacLpcFixture(ColumnBridge.expression(c)))
}

/** `flac_stereo_fixture(doc_id)` → a complete FLAC stream whose one
  * frame is STEREO-DECORRELATED (§9.1.3 left/side, side/right or
  * mid/side by doc_id % 3, the side subframe one bit wider), every
  * sample a deterministic function of `doc_id`
  * ([[graft.multimodal.FlacFixture.streamStereo]]) — the encode
  * half of the `mm_flac_stereo` round-trip: the oracle replays the
  * left/right meter in closed form while the engine must
  * reconstruct the channels through actual decorrelated bits. */
case class FlacStereoFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.FlacFixture.streamStereo(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.FlacFixture.streamStereo($c);")

  override protected def withNewChildInternal(
      c: Expression): FlacStereoFixture = copy(child = c)
  override def prettyName: String = "flac_stereo_fixture"
}

object FlacStereoFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacStereoFixture(ColumnBridge.expression(c)))
}

/** `flac_wasted_fixture(doc_id)` → a complete FLAC stream whose
  * subframes carry §9.2.1 WASTED-BITS headers (samples coded
  * right-shifted at a reduced width, restored by a left shift after
  * reconstruction), every parameter deterministic in `doc_id`
  * ([[graft.multimodal.FlacFixture.streamWasted]]) — the encode
  * half of the `mm_flac_wasted` round-trip. */
case class FlacWastedFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.FlacFixture.streamWasted(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.FlacFixture.streamWasted($c);")

  override protected def withNewChildInternal(
      c: Expression): FlacWastedFixture = copy(child = c)
  override def prettyName: String = "flac_wasted_fixture"
}

object FlacWastedFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacWastedFixture(ColumnBridge.expression(c)))
}
