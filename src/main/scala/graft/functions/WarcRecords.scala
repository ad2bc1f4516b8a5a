package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `warc_records(binary)` →
  * `array<struct<rec_type:string, uri:string, content_length:bigint,
  * body:string>>`, null when the payload is not a well-formed WARC
  * record stream (fail-closed — see [[graft.llm.Warc]]).
  *
  * Native Catalyst expression so the record walk runs inside
  * whole-stage codegen over every archive object of a crawl-scale
  * scan; the caller explodes the array, which keeps the parse ONE
  * pass per object with no shuffle until the caller's own rollup.
  */
case class WarcRecords(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("body", StringType, nullable = false))),
    containsNull = false)

  // nullable even for non-null input: malformed payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.llm.Warc.parseArray(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.llm.Warc.parseArray($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): WarcRecords =
    copy(child = c)
  override def prettyName: String = "warc_records"
}

object WarcRecords {
  def apply(c: Column): Column =
    ColumnBridge.column(WarcRecords(ColumnBridge.expression(c)))
}
