package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate_len(text) * 1000 /
  * raw_len(text)` as an integer, where deflate is the JDK's zlib
  * (level 6, default strategy).
  *
  * A standard heuristic in web-corpus curation (low ratio ⇒
  * highly repetitive/templated content — keyword-stuffed spam,
  * boilerplate listings; the signal survives surface rewording that
  * defeats word-level repetition counters). Implemented as a native
  * Catalyst expression so the whole pass stays inside whole-stage
  * codegen: one static call per row, no UDF serialization. Deflate
  * allocates one Deflater per CALL (not per JVM) — the expression
  * must be thread-safe across concurrent codegen'd tasks, and the
  * allocation is trivially dwarfed by the compression itself.
  *
  * Oracle-mirrored via a golden fixture: the byte-exact deflate
  * stream depends on the zlib build, so the SQL oracle engine cannot
  * recompute it — instead the query materializes a golden parquet of
  * `(doc_id, ratio_x1000)` through an INDEPENDENT plain-`Deflater`
  * replay of this kernel
  * ([[graft.llm.LlmQueries.compressGoldenPath]]), and the oracle SQL
  * reads the golden table and re-derives the verdicts relationally.
  *
  * Empty input has no defined ratio → null (the one nullable case;
  * null input propagates as usual).
  */
object DeflateUtil {
  /** ×1000 deflate ratio of the UTF-8 bytes; -1 signals "no ratio"
    * (empty input) so the codegen path can branch without boxing.
    * The native zlib buffer is released on every exit path
    * (try/finally), including a thrown stall — a `deflate` that makes
    * no progress on unfinished input is an internal-contract
    * violation and surfaces as an exception rather than blurring
    * into the empty-input sentinel. (The stall branch is
    * untestable-by-construction — zlib always makes progress once
    * `finish()` is set — so no spec covers it; it exists to turn a
    * hypothetical infinite loop into a diagnosable failure.) */
  def ratioX1000(s: UTF8String): Long = {
    if (s == null) return -1L
    val raw = s.getBytes
    if (raw.length == 0) return -1L
    val d = new Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var out = 0L
      while (!d.finished()) {
        val n = d.deflate(buf)
        if (n == 0 && !d.finished()) throw new IllegalStateException(
          s"deflate made no progress on ${raw.length} unfinished bytes")
        out += n
      }
      out * 1000L / raw.length
    } finally d.end()
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val r = DeflateUtil.ratioX1000(input.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c =>
      s"""
        ${ev.value} = graft.functions.DeflateUtil.ratioX1000($c);
        if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
      """)
  }
  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
}

object DeflateRatio {
  def apply(c: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c)))
}
