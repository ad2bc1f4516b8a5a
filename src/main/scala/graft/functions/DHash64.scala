package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `dhash64(binary)` →
  * `struct<width:int, height:int, dh_hi:bigint, dh_lo:bigint>`,
  * null when the payload is not a decodable PNG (types 0/2, depth 8,
  * non-interlaced) or is smaller than the 9×8 fingerprint grid.
  *
  * The REAL pixel-derived image fingerprint (decode → luma grid →
  * 9×8 cell means → 64 neighbor-comparison bits; full contract in
  * [[graft.multimodal.ImageGrid]]). Both halves are non-negative
  * 32-bit values so `bit_count(a ^ b)` Hamming arithmetic is
  * sign-safe in Spark and the DuckDB oracle alike. Codegen-friendly:
  * a static-call leaf like [[PngLevels]], kept inside whole-stage
  * codegen so fingerprinting runs map-side next to the scan.
  */
case class DHash64(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dh_hi", LongType, nullable = false),
    StructField("dh_lo", LongType, nullable = false)))

  // nullable even for non-null input: undecodable/too-small → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.ImageGrid.dhashRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.ImageGrid.dhashRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): DHash64 =
    copy(child = c)
  override def prettyName: String = "dhash64"
}

object DHash64 {
  def apply(c: Column): Column =
    ColumnBridge.column(DHash64(ColumnBridge.expression(c)))
}
