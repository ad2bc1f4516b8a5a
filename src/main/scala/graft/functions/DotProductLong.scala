package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product over two `array<bigint>` columns — the hot
  * inner loop of the similarity-search operators
  * (graft.llm.LlmQueries: quantized k-NN, ANN, cosine near-dup).
  *
  * Why a native expression and not `aggregate(zip_with(...))`:
  * Spark's higher-order functions evaluate their lambda *interpreted*,
  * one function-call tree per element — at 100 TB of embeddings the
  * per-element overhead dominates. This expression compiles to a
  * primitive `long` loop inside whole-stage codegen (one static call,
  * no boxing, no per-element closures).
  */
object VecUtil {
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecUtil.dotL($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProductLong = copy(left = l, right = r)
}

object DotProductLong {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
