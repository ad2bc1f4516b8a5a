package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `mp3_vbr(binary)` →
  * `struct<tag:string, sample_rate:int, n_frames:bigint,
  *         n_bytes:bigint, est_ms:bigint>`,
  * null when the first frame carries no Xing/Info VBR header.
  *
  * The variable-bitrate duration path of the MP3 metadata lane: a
  * VBR file's first frame header misstates the mean bitrate, so
  * players read the LAME-convention Xing ("Xing" = VBR, "Info" =
  * CBR) block after the side info — declared total frames/bytes and
  * the derived duration estimate, without walking every frame. The
  * byte arithmetic lives in [[graft.multimodal.Mp3Headers.vbrInfo]];
  * one static call inside whole-stage codegen, shared with the
  * interpreted path. Counts whose flag bit is absent report −1.
  */
case class Mp3Vbr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("est_ms", LongType, nullable = false)))

  // nullable even for non-null input: no VBR header → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.vbrRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.vbrRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3Vbr =
    copy(child = c)
  override def prettyName: String = "mp3_vbr"
}

object Mp3Vbr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Vbr(ColumnBridge.expression(c)))
}
