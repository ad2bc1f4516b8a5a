package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductLong, IsValidIri}

/** Session extensions exposing the engine's native expressions to
  * SQL users (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *   - `is_valid_iri(str)` — the O5/O7 cleaning predicate
  *   - `dot_product_l(array<bigint>, array<bigint>)` — quantized
  *     similarity kernel
  *
  * Registered through the public `SparkSessionExtensions.injectFunction`
  * API, so the library is usable from pure `spark.sql(...)` — no
  * Scala required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("is_valid_iri"),
      new ExpressionInfo(classOf[IsValidIri].getName, "is_valid_iri"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IsValidIri(args.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product_l"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_product_l"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductLong(args(0), args(1))))
  }
}
