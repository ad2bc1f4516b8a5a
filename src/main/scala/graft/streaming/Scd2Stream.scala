package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.queries.RelationalQueries

/** Streaming TYPE-2 DIMENSION maintenance — the streaming twin of
  * [[graft.queries.RelationalQueries.scd2Dimension]], and the
  * standard streaming-warehouse workload: events arrive, the
  * versioned-interval dimension stays current.
  *
  * Per micro-batch the maintainer (1) appends the batch's NEW events
  * to an event mirror (event_id anti-join — the at-least-once retry
  * guard, since a redelivered append would otherwise double runs),
  * then (2) recomputes SCD2 rows ONLY for the users present in the
  * batch, from their FULL mirrored history, and swaps them into the
  * dimension in place of their old rows through the crash-safe
  * [[graft.Pipeline.atomicReplace]].
  *
  * Recompute-from-history makes the maintainer EXACT with no
  * ordering assumptions: late or out-of-order events for an old user
  * simply land in that user's history and the next recompute renders
  * the corrected intervals — versions are a pure function of the
  * user's event multiset, so replays are idempotent and arrival
  * order is irrelevant (the property a close-the-current-interval
  * shortcut would lose). Cost per batch is the affected users'
  * histories + the dimension rewrite, proportional to the delta's
  * user set, never the corpus's. Single-writer, like every artifact
  * maintainer. */
object Scd2Stream {

  /** Schema of arriving event shards: the (user_id, event_id,
    * event_type, ts_us) projection
    * ([[RelationalQueries.scd2Of]]'s input form). */
  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_us", LongType)))

  /** Streaming events table over a directory of parquet shards. */
  def events(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Start the maintenance stream: `mirrorPath` accumulates the
    * event history (append + retry guard), `dimPath` holds the
    * maintained SCD2 table (atomic swap, healed on entry). */
  def startScd2Maintenance(evts: DataFrame, mirrorPath: String,
      dimPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    evts.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Pipeline.healSwap(spark, dimPath)
        val seen = Artifacts.readParquet(spark, mirrorPath)
          .map(_.select(col("event_id").as("s_id")))
          .getOrElse(spark.emptyDataFrame
            .withColumn("s_id", lit(0L)).limit(0))
        batch.join(seen, col("event_id") === col("s_id"), "left_anti")
          .write.mode("append").parquet(mirrorPath)
        val affected = batch.select(col("user_id")).distinct()
        val hist = spark.read.parquet(mirrorPath)
          .join(affected, Seq("user_id"), "left_semi")
        val fresh = RelationalQueries.scd2Of(hist)
        val dim = Artifacts.readParquet(spark, dimPath)
          .map(_.join(affected, Seq("user_id"), "left_anti"))
          .getOrElse(fresh.limit(0))
        Pipeline.atomicReplace(dim.unionByName(fresh), dimPath)
        ()
      }
      .trigger(trigger).start()

  /** Read the maintained dimension (healing a torn swap first). */
  def readDimension(spark: SparkSession, dimPath: String): DataFrame = {
    Pipeline.healSwap(spark, dimPath)
    spark.read.parquet(dimPath)
  }
}
