package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers for the driver-generated test tables
  * (TESTDATA.md). At cluster scale these would be catalog tables /
  * bucketed datasets; the reader is the single seam where that
  * swap happens.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reader PLANS are memoized per (session, dir, table): every
    * `spark.read.parquet` re-reads the footer schema and re-creates
    * the file index, and the bench's 326 queries call these readers
    * hundreds of times. The memo caches the lazy DataFrame (an
    * unexecuted scan plan) — NOT data; every execution still scans
    * the parquet files. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    SnapshotMemo.getOrCompute(spark, s"table:$name:$dir") {
      if (name == "events") eventsUncached(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events.ts` arrives as either parquet TIMESTAMP(NANOS) — which
    * Spark's reader rejects by default (Spark timestamps are µs), so
    * with the `nanosAsLong` conf it surfaces as LongType and is
    * floor-truncated to µs, the same truncation DuckDB applies when
    * casting TIMESTAMP_NS down — or as TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false), which surfaces as TIMESTAMP_NTZ.
    * Both normalize to a session-UTC TimestampType `ts` so every
    * downstream derivation (hour buckets, session gaps, as-of keys)
    * sees one type regardless of which writer produced the snapshot.
    * The `nanosAsLong` conf is set at session construction by every
    * harness main (Verify/Bench/Probe/tests); the defensive set here
    * only covers externally-built sessions.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalizes an events frame's `ts` to TimestampType (µs, session
    * UTC) from whichever physical type the source handed us. Shared
    * by the batch reader and the streaming twin so both lanes agree. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long snapshot
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => // µs snapshot; session tz is UTC
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
