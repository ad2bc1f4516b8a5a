package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `mp3_side_info(binary)` → the decoded MPEG-1 Layer III
  * side-information block plus the main-data scalefactor walk of the
  * stream's first frame (ISO 11172-3 §2.4.1.7 / §2.4.2.7), null when
  * the stream has no decodable first frame. The byte/bit arithmetic
  * lives in [[graft.multimodal.Mp3Headers.sideInfo]]; one static
  * call inside whole-stage codegen, shared with the interpreted
  * path. Scalefactor fields report −1 when `main_data_begin` ≠ 0
  * (the bit reservoir lives in prior frames this reader does not
  * walk). */
case class Mp3SideInfo(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("main_data_begin", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("scfsi_mask", IntegerType, nullable = false),
    StructField("p23_sum", LongType, nullable = false),
    StructField("bigv_sum", LongType, nullable = false),
    StructField("gain_max", IntegerType, nullable = false),
    StructField("bt1", IntegerType, nullable = false),
    StructField("mixed1", IntegerType, nullable = false),
    StructField("tsel_sum", LongType, nullable = false),
    StructField("reg_sum", LongType, nullable = false),
    StructField("sbg_sum", LongType, nullable = false),
    StructField("flags_sum", LongType, nullable = false),
    StructField("part2_bits", LongType, nullable = false),
    StructField("sf_sum", LongType, nullable = false),
    StructField("sf_n", LongType, nullable = false)))

  // nullable even for non-null input: undecodable stream → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.sideInfoRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.sideInfoRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3SideInfo =
    copy(child = c)
  override def prettyName: String = "mp3_side_info"
}

object Mp3SideInfo {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3SideInfo(ColumnBridge.expression(c)))
}

/** `mp3_side_fixture(doc_id)` → a complete MP3 stream whose first
  * frame carries genuine side info + scalefactor main data, every
  * field a deterministic function of `doc_id`
  * ([[graft.multimodal.Mp3SideFixture.stream]]) — the encode half of
  * the `mm_mp3_sideinfo` round-trip: the oracle replays expected
  * FIELDS in closed form while the engine must recover them through
  * the actual packed bits. */
case class Mp3SideFixtureExpr(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3SideFixture.stream(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp3SideFixture.stream($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp3SideFixtureExpr = copy(child = c)
  override def prettyName: String = "mp3_side_fixture"
}

object Mp3SideFixtureExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3SideFixtureExpr(ColumnBridge.expression(c)))
}

/** `mp3_count1(binary)` → the decoded count1-region quadruple
  * census of the first frame
  * ([[graft.multimodal.Mp3Headers.count1Info]]): spectral
  * (v,w,x,y ∈ {0, ±1}) quadruples coded with count1 table 1 plus
  * their sign bits — the first real Huffman slice of the Layer III
  * sample path. Null when the stream is not count1-decodable
  * (nonzero big_values / table 0 / bit reservoir — all fail closed,
  * see the parser doc). */
case class Mp3Count1(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_quads", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_vals", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.count1Row(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.count1Row($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3Count1 =
    copy(child = c)
  override def prettyName: String = "mp3_count1"
}

object Mp3Count1 {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Count1(ColumnBridge.expression(c)))
}

/** `mp3_count1_fixture(doc_id)` → a complete MP3 stream whose first
  * frame's part3 region carries real count1-table-1 quadruple
  * codewords ([[graft.multimodal.Mp3SideFixture.streamCount1]]) —
  * the encode half of the `mm_mp3_count1` round-trip. */
case class Mp3Count1FixtureExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3SideFixture.streamCount1(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp3SideFixture.streamCount1($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp3Count1FixtureExpr = copy(child = c)
  override def prettyName: String = "mp3_count1_fixture"
}

object Mp3Count1FixtureExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Count1FixtureExpr(ColumnBridge.expression(c)))
}

/** `mp3_count1a_fixture(doc_id)` → the `mm_mp3_count1a` fixture: the
  * count1 stream class under TABLE A — variable-length 1–6-bit
  * codewords for the same quadruple/sign sequence as the table-1
  * fixture ([[graft.multimodal.Mp3SideFixture.streamCount1A]]). */
case class Mp3Count1AFixtureExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3SideFixture.streamCount1A(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp3SideFixture.streamCount1A($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp3Count1AFixtureExpr = copy(child = c)
  override def prettyName: String = "mp3_count1a_fixture"
}

object Mp3Count1AFixtureExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Count1AFixtureExpr(ColumnBridge.expression(c)))
}

/** `mp3_bigvalues(binary)` → the decoded BIG-VALUES-region census of
  * the first frame ([[graft.multimodal.Mp3Headers.bigvaluesInfo]]):
  * (x, y) spectral pairs decoded through the verified Table B.7
  * subset (tables 0–3) with region0/region1 splits over the B.8
  * band boundaries and per-value sign bits — the variable-length
  * Huffman slice below `mp3_count1`'s fixed-width one. Null when
  * the stream is not big-values-decodable (reservoir, table select
  * past the verified set, inexact region exhaustion — all fail
  * closed, see the parser doc). */
case class Mp3Bigvalues(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_regions", LongType, nullable = false),
    StructField("n_pairs", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_vals", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.bigvaluesRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.bigvaluesRow($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3Bigvalues =
    copy(child = c)
  override def prettyName: String = "mp3_bigvalues"
}

object Mp3Bigvalues {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Bigvalues(ColumnBridge.expression(c)))
}

/** `mp3_bigvalues_fixture(doc_id)` → a complete MP3 stream whose
  * first frame's part3 carries real Table-B.7 big-values codewords
  * ([[graft.multimodal.Mp3SideFixture.streamBigvalues]]) — the
  * encode half of the `mm_mp3_bigvalues` round-trip. */
case class Mp3BigvaluesFixtureExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3SideFixture.streamBigvalues(
      input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp3SideFixture.streamBigvalues($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp3BigvaluesFixtureExpr = copy(child = c)
  override def prettyName: String = "mp3_bigvalues_fixture"
}

object Mp3BigvaluesFixtureExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3BigvaluesFixtureExpr(ColumnBridge.expression(c)))
}

/** `mp3_part3(binary)` → the FULL part3 entropy census of the first
  * frame ([[graft.multimodal.Mp3Headers.part3Info]]): the big-values
  * region through the verified Table-B.7 subset followed by the
  * count1 region through the selected count1 table, one
  * part2_3_length — the real Layer-III region sequence whose
  * boundary is implicit in the codeword widths. Null when the
  * stream is outside the verified subset. */
case class Mp3Part3(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_regions", LongType, nullable = false),
    StructField("n_pairs", LongType, nullable = false),
    StructField("n_quads", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false),
    StructField("n_neg", LongType, nullable = false),
    StructField("sum_vals", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3Headers.part3Row(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.multimodal.Mp3Headers.part3Row($c);
        ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(c: Expression): Mp3Part3 =
    copy(child = c)
  override def prettyName: String = "mp3_part3"
}

object Mp3Part3 {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Part3(ColumnBridge.expression(c)))
}

/** `mp3_part3_fixture(doc_id)` → a complete MP3 stream whose part3
  * carries BOTH entropy regions
  * ([[graft.multimodal.Mp3SideFixture.streamPart3]]). */
case class Mp3Part3FixtureExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.Mp3SideFixture.streamPart3(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Mp3SideFixture.streamPart3($c);")

  override protected def withNewChildInternal(
      c: Expression): Mp3Part3FixtureExpr = copy(child = c)
  override def prettyName: String = "mp3_part3_fixture"
}

object Mp3Part3FixtureExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(Mp3Part3FixtureExpr(ColumnBridge.expression(c)))
}
