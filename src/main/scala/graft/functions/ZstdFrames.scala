package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `zstd_fixture(doc_id)` → a multi-frame Zstandard payload
  * (optional skippable frame + 1–3 frames of raw + RLE blocks),
  * closed-form in `doc_id` ([[graft.llm.Zstd]]) — the encode half
  * of the `mm_zstd_frames` round-trip. */
case class ZstdFixture(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.llm.Zstd.stream(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llm.Zstd.stream($c);")

  override protected def withNewChildInternal(
      c: Expression): ZstdFixture = copy(child = c)
  override def prettyName: String = "zstd_fixture"
}

object ZstdFixture {
  def apply(c: Column): Column =
    ColumnBridge.column(ZstdFixture(ColumnBridge.expression(c)))
}

/** `zstd_frames(binary)` →
  * `struct<n_frames:bigint, n_skippable:bigint, content_len:bigint,
  *         content_sum:bigint, window_sum:bigint>`,
  * null unless the payload walks cleanly through the RFC 8878 frame
  * layer with every raw/RLE block genuinely regenerated
  * ([[graft.llm.Zstd.parse]]); compressed (FSE/Huffman) blocks fail
  * closed — the declared entropy boundary. */
case class ZstdFrames(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("n_skippable", LongType, nullable = false),
    StructField("content_len", LongType, nullable = false),
    StructField("content_sum", LongType, nullable = false),
    StructField("window_sum", LongType, nullable = false)))

  // nullable even for non-null input: unparseable payload → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.llm.Zstd.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.llm.Zstd.parseRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): ZstdFrames =
    copy(child = c)
  override def prettyName: String = "zstd_frames"
}

object ZstdFrames {
  def apply(c: Column): Column =
    ColumnBridge.column(ZstdFrames(ColumnBridge.expression(c)))
}
