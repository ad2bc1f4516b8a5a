package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `h264_sps(binary)` → `struct<profile_idc:int, level_idc:int,
  * width:int, height:int, n_nals:int>`, null when the payload is
  * not an Annex-B stream carrying a parseable SPS.
  *
  * Native Catalyst expression for the same reason as [[Mp3Meta]]:
  * the NAL walk + Exp-Golomb decode runs over every video row of a
  * 100 TB media scan, and a single static call in generated Java
  * stays inside whole-stage codegen. The bit arithmetic lives in
  * [[graft.multimodal.H264Headers]] so interpreted and codegen
  * paths share one parser.
  */
case class H264Sps(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("profile_idc", IntegerType, nullable = false),
    StructField("level_idc", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_nals", IntegerType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.H264Headers.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.H264Headers.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): H264Sps =
    copy(child = c)
  override def prettyName: String = "h264_sps"
}

object H264Sps {
  def apply(c: Column): Column =
    ColumnBridge.column(H264Sps(ColumnBridge.expression(c)))
}
