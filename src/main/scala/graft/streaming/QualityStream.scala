package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.queries.RelationalQueries

/** Streaming DATA-QUALITY monitoring — the streaming twin of
  * [[graft.queries.RelationalQueries.expectations]]: orders arrive
  * in micro-batches, the cumulative constraint table stays current,
  * so an ingest gate reads one tiny artifact instead of re-scanning
  * the corpus per batch (Deequ's "metrics repository" shape).
  *
  * Incremental exactness, per constraint class:
  *  - the five COUNTER constraints (completeness ×2, range,
  *    accepted values, referential vs the static `customer` dim —
  *    a stream-static join) are additive: cumulative = stored +
  *    batch delta, order-insensitive, so late/out-of-order shards
  *    need no special handling;
  *  - UNIQUENESS is not additive (a batch can't see a key it
  *    duplicates from last month), so the maintainer keeps a
  *    distinct-key MIRROR: each batch's keys anti-join the mirror
  *    and the novel ones append; violations = cumulative rows −
  *    mirror size. The anti-join makes mirror inserts idempotent,
  *    and the mirror is re-COUNTED (not incremented), so a crash
  *    between the two writes self-heals on replay.
  *
  * At-least-once replay of a whole micro-batch is guarded by the
  * batch id stored in the metrics artifact (foreachBatch redelivers
  * with the SAME id on recovery — a stale id is skipped whole).
  * Both artifacts swap through the crash-safe
  * [[graft.Pipeline.atomicReplace]]/healSwap pair; single-writer,
  * single stream lineage (one checkpoint) per artifact pair, like
  * every maintainer in the engine. Per-batch cost: the batch scan +
  * a key-mirror anti-join + a 6-row swap — proportional to the
  * delta, never the history (except the mirror count, a metadata-
  * cheap aggregate over a key-only table). */
object QualityStream {

  /** Schema of arriving order shards (the driver's orders table). */
  val schema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** Streaming orders table over a directory of parquet shards. */
  def orders(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  private val UniqueName = "orders.o_orderkey.unique"

  /** Start the monitor: `metricsPath` holds the cumulative
    * (expectation, total, violations, pass) table, `keysPath` the
    * distinct-orderkey mirror backing the uniqueness constraint. */
  def startQualityMonitor(ord: DataFrame, customer: DataFrame,
      metricsPath: String, keysPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    ord.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Pipeline.healSwap(spark, metricsPath)
        Pipeline.healSwap(spark, keysPath)
        val old =
          Artifacts.readParquet(spark, metricsPath)
        val applied = old.exists { m =>
          val r = m.select(max(col("batch_id"))).head
          !r.isNullAt(0) && r.getLong(0) >= batchId
        }
        if (!applied) {
          // novel keys append idempotently (anti-join absorbs both
          // in-data duplicates and crash-replayed appends)
          val keys = batch.select(col("o_orderkey")).distinct()
          val mirror =
            Artifacts.readParquet(spark, keysPath)
          val novel = mirror match {
            case Some(m) => keys.join(m, Seq("o_orderkey"), "left_anti")
            case None => keys
          }
          novel.write.mode("append").parquet(keysPath)
          val nDistinct = spark.read.parquet(keysPath).count()
          // batch-local counters via the SAME constraint definitions
          // as the batch operator; the uniqueness row is replaced by
          // the mirror-backed cumulative below
          val delta = RelationalQueries.expectationsOf(batch, customer)
            .select(col("expectation"), col("total"), col("violations"))
          val base = old match {
            case Some(m) =>
              m.select(col("expectation"), col("total"),
                col("violations"))
            case None =>
              delta.select(col("expectation"), lit(0L).as("total"),
                lit(0L).as("violations"))
          }
          val summed = base.unionByName(delta)
            .groupBy(col("expectation"))
            .agg(sum(col("total")).as("total"),
              sum(col("violations")).as("violations"))
          val next = summed
            .withColumn("violations",
              when(col("expectation") === UniqueName,
                col("total") - lit(nDistinct))
                .otherwise(col("violations")))
            .withColumn("pass", col("violations") === 0L)
            .withColumn("batch_id", lit(batchId))
            .orderBy(col("expectation"))
          Pipeline.atomicReplace(next, metricsPath)
        }
        ()
      }
      .trigger(trigger).start()

  /** Read the maintained constraint table (healing a torn swap
    * first) in the batch operator's column order. */
  def readMetrics(spark: SparkSession, metricsPath: String): DataFrame = {
    Pipeline.healSwap(spark, metricsPath)
    spark.read.parquet(metricsPath)
      .select(col("expectation"), col("total"), col("violations"),
        col("pass"))
      .orderBy(col("expectation"))
  }
}
