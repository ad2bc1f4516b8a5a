package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * The correctness gate hash-compares Spark results against DuckDB
  * running ANSI SQL on the same parquet. Floating-point SUM is
  * order-dependent, and Spark's partial-aggregation order differs from
  * DuckDB's scan order — so any `sum(double)` is a latent hash
  * mismatch. We instead aggregate money-like doubles as integer
  * "cents" (exact, associative, order-independent) and divide at the
  * end; both engines round a double half-away-from-zero (Spark:
  * BigDecimal HALF_UP on the exact binary value; DuckDB: C round()),
  * so `round(x*100)` agrees bit-for-bit.
  */
object Exact {
  /** Double -> exact integer cents. SQL: CAST(ROUND(x*100) AS BIGINT) */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact money sum as double. SQL:
    * CAST(SUM(CAST(ROUND(x*100) AS BIGINT)) AS DOUBLE)/100.0 */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** SQL fragment equivalents, to keep Spark + oracle text in one place. */
  def sqlCents(e: String): String = s"CAST(ROUND(($e)*100) AS BIGINT)"
  def sqlMoneySum(e: String): String =
    s"CAST(SUM(${sqlCents(e)}) AS DOUBLE)/100.0"
}
