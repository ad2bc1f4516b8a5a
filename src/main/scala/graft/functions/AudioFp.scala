package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `audio_fp(binary)` →
  * `struct<sample_rate:int, n_frames:bigint, fp:bigint>`,
  * null when the payload is not a 16-bit PCM WAV with at least two
  * complete 4-value frames.
  *
  * REAL sample-derived audio fingerprint (frame-energy delta signs —
  * contract and provenance in
  * [[graft.multimodal.AudioHeaders.fingerprint]]). `fp` is a
  * non-negative ≤32-bit pack so `bit_count(a ^ b)` Hamming matching
  * is sign-safe in Spark and DuckDB alike — the same discipline as
  * [[DHash64]]. Codegen-friendly static-call leaf; fingerprinting
  * runs map-side next to the scan. */
case class AudioFp(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  // nullable even for non-null input: undecodable/too-short → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders.fingerprintRow(
      input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.fingerprintRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): AudioFp =
    copy(child = c)
  override def prettyName: String = "audio_fp"
}

object AudioFp {
  def apply(c: Column): Column =
    ColumnBridge.column(AudioFp(ColumnBridge.expression(c)))
}
