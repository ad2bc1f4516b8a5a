package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `flac_tags(binary)` →
  * `struct<title:string, artist:string, album:string>`, null when the
  * payload is not FLAC or carries a malformed VORBIS_COMMENT block;
  * individual fields null when their key is absent (most files carry
  * a subset — absence is not an error).
  *
  * Native Catalyst expression like [[Id3Tags]]; the block walk
  * (big-endian framing, LITTLE-endian comment payload — the
  * cross-endian pairing that defines the format) lives in
  * [[graft.multimodal.AudioHeaders.parseFlacTags]] so interpreted
  * and codegen paths share one parser.
  */
case class FlacTags(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("artist", StringType, nullable = true),
    StructField("album", StringType, nullable = true)))

  // nullable even for non-null input: not FLAC / malformed → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.AudioHeaders
      .flacTagsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.AudioHeaders.flacTagsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): FlacTags =
    copy(child = c)
  override def prettyName: String = "flac_tags"
}

object FlacTags {
  def apply(c: Column): Column =
    ColumnBridge.column(FlacTags(ColumnBridge.expression(c)))
}
