package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `mp3_meta(binary)` → `struct<n_frames:int, sample_rate:int,
  * channels:int, sum_kbps:bigint, frame_bytes:bigint>`, null when
  * the payload is not an MPEG-1 Layer III stream (after any ID3v2
  * tag).
  *
  * Native Catalyst expression for the same reason as [[AudioMeta]]:
  * the frame walk runs over every audio row of a 100 TB media scan,
  * and a single static call in generated Java stays inside
  * whole-stage codegen with no serialization or boxing. The byte
  * walking lives in [[graft.multimodal.Mp3Headers]] so interpreted
  * and codegen paths share one parser.
  */
case class Mp3Meta(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sum_kbps", LongType, nullable = false),
    StructField("frame_bytes", LongType, nullable = false),
    StructField("spf", IntegerType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3Meta =
    copy(child = c)
  override def prettyName: String = "mp3_meta"
}

object Mp3Meta {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Meta(ColumnBridge.expression(c)))
}
