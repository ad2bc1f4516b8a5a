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
    * The stream source needs a user-supplied schema, and `ts` may be
    * physically TIMESTAMP(NANOS) (→ LongType under the session's
    * `nanosAsLong` conf) or TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ)
    * depending on the snapshot writer — so the schema is probed from
    * the files once (driver-side footer read, no data scan) and the
    * ts normalization is the SAME `graft.Tables.normalizeTs` the
    * batch reader applies, so stream and batch agree bit-for-bit. */
  def readEvents(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // glob (not a literal file path) so the file source resolves its
    // basePath to the directory, as it requires
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(s"$dir/events.*"))
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
