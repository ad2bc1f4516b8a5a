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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects by default (Spark timestamps are µs). Read nanos as
    * LongType and floor-truncate to µs — the same truncation DuckDB
    * applies when casting TIMESTAMP_NS down — so oracle comparisons
    * on derived times agree. The `nanosAsLong` conf is set at session
    * construction by every harness main (Verify/Bench/Probe/tests);
    * the defensive set here only covers externally-built sessions.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
