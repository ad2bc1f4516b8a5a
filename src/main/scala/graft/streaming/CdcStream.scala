package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.Pipeline
import graft.rdf.Model

/** Streaming CDC SUBSCRIBER — the consumer end of
  * [[graft.Pipeline.publishDelta]]'s change feed, as a Structured
  * Stream: run partitions landing under the change-log root are
  * discovered by the file source (exactly-once per file via the
  * checkpoint) and folded onto a live downstream snapshot, so a
  * mirror store follows the publisher without ever re-copying the
  * full snapshot — the streaming twin of the batch
  * [[graft.Pipeline.applyChanges]]/`compactDelta` consumers.
  *
  * Correctness under file-source delivery:
  *
  *  - WITHIN a micro-batch, multiple runs fold in one pass with
  *    last-change-per-triple-wins ([[graft.Pipeline.applyLog]] —
  *    run ids must order lexicographically with publish order, the
  *    same contract `compactDelta` documents).
  *  - A run SPLIT across micro-batches is safe: each triple's change
  *    appears once per run, and folding different triples' rows in
  *    different batches cannot interact (set semantics per triple).
  *  - REDELIVERY (a retried publish rewriting a run_id partition) is
  *    safe: re-applying an already-applied change set is a no-op by
  *    construction (the compaction retry relies on the same
  *    property).
  *  - The one excluded hazard is CROSS-RUN REORDERING of the same
  *    triple's changes, which the publisher's monotone, one-run-at-
  *    a-time contract rules out.
  *
  * Scale shape: each micro-batch pays one snapshot-scale fold
  * (shuffle on the triple key + anti-join) and a snapshot rewrite —
  * inherent to maintaining a plain parquet mirror (a merge-on-read
  * table format would defer the rewrite; the FOLD cost is the
  * floor). The change rows themselves are delta-sized.
  */
object CdcStream {

  /** Schema of the change feed: the canonical triple columns plus
    * the `change` verdict and the `run_id` partition column (the
    * file source projects it from the directory name). */
  val changeSchema: StructType = StructType(
    Model.schema.fields ++ Seq(
      StructField("change", StringType, nullable = false),
      StructField("run_id", StringType, nullable = true)))

  /** Streaming change-log table over a [[graft.Pipeline.publishDelta]]
    * output directory. */
  def changes(spark: SparkSession, changesPath: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(changeSchema)
      .option("basePath", changesPath)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(changesPath)
  }

  /** Start the subscriber: fold every arriving change partition onto
    * the parquet snapshot at `snapshotPath` (created on first
    * batch). AvailableNow by default so catch-up runs drain the log
    * and stop — pass a different trigger for a resident subscriber. */
  def startApply(spark: SparkSession, changesPath: String,
      snapshotPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes(spark, changesPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val base =
          try Some(s.read.parquet(snapshotPath))
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        // materialize the fold BEFORE overwriting the path it read
        // from (the publishDelta discipline)
        val next = Pipeline.applyLog(base, batch).localCheckpoint()
        try next.write.mode("overwrite").parquet(snapshotPath)
        finally org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(next)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
