package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Exact._

/** Structured Streaming twin of the batch hourly event rollup
  * (graft.queries.RelationalQueries.eventsHourly). The reference is a
  * weekly full-refresh batch (SURVEY §2.5 "streaming: absent"); this
  * is the engine extension that makes the same aggregation
  * incremental: tumbling 1-hour event-time windows with a watermark
  * bounding state.
  *
  * The transformation body is shared shape-for-shape with the batch
  * query (same grouping keys, same exact-integer sums), which is the
  * point: one logical definition, two execution modes.
  *
  * Scale notes: state is bounded by (watermark horizon × groups);
  * `withWatermark` 2h + ~few event types keeps state tiny. Output
  * mode `update`/`append` both work; append emits only closed
  * windows. Shuffle partitions should match cluster size — streaming
  * micro-batches inherit `spark.sql.shuffle.partitions`.
  */
object EventsStream {

  /** Streaming read of the driver's events parquet (file source).
    * `ts` is parquet TIMESTAMP(NANOS): with the session's
    * `nanosAsLong` conf it reads as LongType and is floor-truncated
    * to µs — the identical transform `graft.Tables.events` applies on
    * the batch side, so stream and batch agree bit-for-bit. */
  def readEvents(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // glob (not a literal file path) so the file source resolves its
    // basePath to the directory, as it requires
    spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Streaming exact dedup on event_id — the incremental form of the
    * LLM-pipeline exact-dedup operator: at-least-once sources (kafka
    * replays, file re-lists) are deduplicated with state bounded by
    * the watermark horizon (`dropDuplicatesWithinWatermark` drops a
    * key's state once the watermark passes its event time, unlike
    * plain `dropDuplicates`, whose state grows forever). At 100 TB
    * rates the state is (horizon × event rate) keys, hash-partitioned
    * on event_id — one shuffle. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** SLIDING-window rollup (3-hour windows advancing hourly) — the
    * overlapping-window family the tumbling rollup below cannot
    * express: each event lands in 3 windows, so window() acts as a
    * 3-way expand before the same watermarked aggregation. State is
    * (horizon × groups × overlap) — still watermark-bounded; the
    * expand multiplies exchange rows by the overlap factor, which is
    * the price of sliding windows in ANY engine (the batch
    * rel_q15_moving_window gets the same effect with a range frame
    * instead, trading the expand for a per-key sort). Emitted rows
    * are one per (window-start hour, event_type), directly
    * comparable against a batch replay of the same expression. */
  def slidingRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "3 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Windowed rollup over a (possibly streaming) events DataFrame
    * with schema (ts timestamp, event_type string, value double). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
}
