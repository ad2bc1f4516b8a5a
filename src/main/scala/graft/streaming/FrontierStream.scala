package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.queries.RelationalQueries

/** Streaming MATERIALIZED-FRONTIER maintenance — the streaming twin
  * of [[graft.queries.RelationalQueries.skylineIncremental]], and
  * the engine's first stream that maintains a VIEW artifact rather
  * than appending rows: each arriving micro-batch of points unions
  * onto the stored Pareto frontier and the (frontier + batch)-sized
  * skyline re-run REPLACES the artifact through the crash-safe
  * [[graft.Pipeline.atomicReplace]] swap.
  *
  * At-least-once safety here is ALGEBRAIC, not bookkept: by
  * domination monotonicity, `skyline(F ∪ A) = skyline(B ∪ A)` when
  * `F = skyline(B)`, and re-applying an already-absorbed batch is a
  * no-op (`skyline(F' ∪ A) = F'` when F' already accounts for A) —
  * union-with-frontier is idempotent, so a redelivered micro-batch
  * cannot corrupt the view. No out-table anti-join needed, unlike
  * the append-style probe twins.
  *
  * Scale shape: the stored frontier is frontier-sized (the only
  * rows any later point can interact with); per batch the stream
  * pays one read of that artifact plus a skyline over
  * frontier + batch — cost proportional to the delta, never the
  * history. Single-writer, like every artifact maintainer in the
  * engine. */
object FrontierStream {

  /** Schema of arriving point shards: the (partkey, cents, size)
    * projection ([[RelationalQueries.skylineOf]]'s input form). */
  val schema: StructType = StructType(Seq(
    StructField("partkey", LongType),
    StructField("cents", LongType),
    StructField("size", LongType)))

  /** Streaming points table over a directory of parquet shards. */
  def points(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Start the maintenance stream: each micro-batch folds into the
    * frontier artifact at `frontierPath` (healed first, in case a
    * prior run died mid-swap). */
  def startFrontierMaintenance(pts: DataFrame, frontierPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    pts.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Pipeline.healSwap(spark, frontierPath)
        val cur = Artifacts.readParquet(spark, frontierPath)
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            schema))
        // artifact form: the interior range checkpoint frees as soon
        // as the frontier exists, and the frontier checkpoint frees
        // once the swap lands — a long-running stream strands nothing.
        // distinct() is the MULTISET half of the idempotence claim:
        // a redelivered batch re-presents rows the frontier already
        // holds, and identical rows both survive the skyline walk —
        // without the dedup every replay would append duplicate
        // frontier rows (set-equal, multiset-corrupt)
        val next = RelationalQueries.skylineArtifact(cur.union(
          batch.select("partkey", "cents", "size")).distinct())
        Pipeline.atomicReplace(next, frontierPath)
        org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(next)
        ()
      }
      .trigger(trigger).start()

  /** Read the maintained frontier (healing a torn swap first). */
  def readFrontier(spark: SparkSession, frontierPath: String): DataFrame = {
    Pipeline.healSwap(spark, frontierPath)
    spark.read.parquet(frontierPath)
  }
}
