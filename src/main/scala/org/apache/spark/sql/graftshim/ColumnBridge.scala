package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge.
  *
  * Spark 4 split the public `Column` API from Catalyst: a `Column`
  * wraps a `ColumnNode`, and the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Declaring this one object inside an
  * `org.apache.spark.sql` subpackage is the supported-by-the-language
  * way to reach them (the same trick spark-connect and several Spark
  * ecosystem libraries use). Everything else in the engine stays in
  * `graft.*` and goes through this seam.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the cached blocks behind a `localCheckpoint()`ed Dataset.
    * A local checkpoint pins its RDD in block storage with no public
    * release API (`unpersist()` on the Dataset is a no-op — the cache
    * manager never tracked it); iterative algorithms that checkpoint
    * per round would otherwise pin every superseded round for the
    * session lifetime. The LogicalRDD unwrap requires this
    * `org.apache.spark.sql` vantage point. */
  /** Releasing a local checkpoint makes the RDD class log a WARN
    * ("cannot be recomputed after unpersisting") on every call. Here
    * the release is deliberate — the block is superseded and nothing
    * will recompute it — so that one MESSAGE is filtered; the logger
    * stays at WARN so every other MapPartitionsRDD warning (lost
    * blocks, recovery paths) still reaches the logs. Best-effort: if
    * the logging backend is not log4j2-core, the WARN is accepted. */
  private lazy val silenceUnpersistWarn: Unit =
    try {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.Filter.Result
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.RegexFilter
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val lc = new LoggerConfig(name, Level.WARN, true)
      lc.addFilter(RegexFilter.createFilter(
        ".*locally checkpointed.*cannot be recomputed.*", null, false,
        Result.DENY, Result.NEUTRAL))
      conf.addLogger(name, lc)
      ctx.updateLoggers()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Dev probe: the partitioning/ordering a checkpointed Dataset's
    * LogicalRDD actually carries (what downstream planning sees). */
  def checkpointLayout(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        s"partitioning=${r.outputPartitioning} ordering=${r.outputOrdering}"
      case p => s"not a LogicalRDD: ${p.getClass.getSimpleName}"
    }

  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        silenceUnpersistWarn
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
