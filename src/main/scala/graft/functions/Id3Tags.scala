package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `id3_tags(binary)` →
  * `struct<title:string, artist:string, album:string, version:int>`,
  * null when the payload carries no (or a malformed) ID3v2 tag;
  * individual fields null when their frame is absent — most files
  * carry a subset.
  *
  * Native Catalyst expression like the rest of the header family;
  * the frame walk (v2.3 plain vs v2.4 SYNCSAFE sizes, encoding
  * bytes, padding stop) lives in
  * [[graft.multimodal.Mp3Headers.id3TextFrames]] so interpreted and
  * codegen paths share one parser.
  */
case class Id3Tags(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("artist", StringType, nullable = true),
    StructField("album", StringType, nullable = true),
    StructField("version", IntegerType, nullable = false)))

  // nullable even for non-null input: no/malformed tag → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.id3TagsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.id3TagsRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Id3Tags =
    copy(child = c)
  override def prettyName: String = "id3_tags"
}

object Id3Tags {
  def apply(c: Column): Column =
    ColumnBridge.column(Id3Tags(ColumnBridge.expression(c)))
}
