package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.Pipeline
import graft.rdf.Model

/** Streaming CDC SUBSCRIBER — the consumer end of
  * [[graft.Pipeline.publishDelta]]'s change feed, as a Structured
  * Stream: run partitions landing under the change-log root are
  * discovered by the file source (exactly-once per file via the
  * checkpoint) and folded onto a downstream mirror. Two mirror
  * disciplines:
  *
  *  - [[startApply]] — copy-on-write: each micro-batch folds the
  *    changes onto a plain parquet snapshot and REWRITES it
  *    (atomic-swap publish). Simplest consumer, but per-batch cost
  *    is snapshot-scale.
  *  - [[startMirror]] — MERGE-ON-READ: each micro-batch only
  *    APPENDS the delta-sized change rows to the mirror's retained
  *    log; [[readMirror]] folds base + retained log at read time,
  *    and a threshold compaction ([[graft.Pipeline.applyLog]] into
  *    an atomic-swap base) bounds the retained-log length. Per-batch
  *    bytes are bounded by the DELTA size, not the snapshot — the
  *    shape that survives a 100 TB mirror on a minutely feed.
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
  *    safe WHILE THAT RUN IS STILL THE LATEST: re-applying an
  *    already-applied change set is a no-op by construction (the
  *    compaction retry relies on the same property).
  *  - CAVEAT (`maxFilesPerTrigger`): capping file intake can defer a
  *    redelivered partition's files into a batch AFTER a later run
  *    was already folded. The per-batch fold arbitrates run order
  *    only WITHIN its batch, so the stale rows would regress the
  *    mirror — the no-op guarantee above needs the whole
  *    redelivery to arrive no later than the first post-redelivery
  *    run, which an uncapped intake gets for free (both partitions
  *    land in one batch) and a capped one does not. Leave the cap
  *    off unless the publisher never retries, or retries only the
  *    latest run (the [[graft.Pipeline.publishDelta]] contract —
  *    its retry re-publishes run N before ever starting N+1).
  *  - The same publisher contract excludes the general CROSS-RUN
  *    REORDERING hazard (a run partition rewritten after a LATER
  *    run exists) for both mirror disciplines — merge-on-read
  *    arbitrates globally over its retained log, but a redelivery
  *    of a run that compaction already folded would replay stale
  *    rows just like the per-batch fold.
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
    * output directory. See the class doc's `maxFilesPerTrigger`
    * caveat before capping intake on a feed whose publisher
    * retries. */
  def changes(spark: SparkSession, changesPath: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(changeSchema)
      .option("basePath", changesPath)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(changesPath)
  }

  /** Start the copy-on-write subscriber: fold every arriving change
    * partition onto the parquet snapshot at `snapshotPath` (created
    * on first batch). AvailableNow by default so catch-up runs drain
    * the log and stop — pass a different trigger for a resident
    * subscriber. The snapshot rewrite is an atomic-swap publish
    * ([[graft.Pipeline.atomicReplace]]) with self-healing on batch
    * entry — a crash mid-rewrite can no longer destroy the mirror
    * (the staging dir absorbs it). */
  def startApply(spark: SparkSession, changesPath: String,
      snapshotPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes(spark, changesPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        Pipeline.healSwap(s, snapshotPath)
        val base = Artifacts.readParquet(s, snapshotPath)
        // materialize the fold BEFORE replacing the path it read
        // from (the publishDelta discipline)
        val next = Pipeline.applyLog(base, batch).localCheckpoint()
        try Pipeline.atomicReplace(next, snapshotPath)
        finally org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(next)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  // ---- merge-on-read mirror ----

  private def deltaPath(mirror: String) = s"$mirror/delta"
  private def basePath(mirror: String) = s"$mirror/base"

  private def readOpt(s: SparkSession, path: String): Option[DataFrame] =
    Artifacts.readParquet(s, path)

  /** The mirror's current state: base snapshot + retained change
    * log, folded at read time (one shuffle on the triple key — the
    * merge-on-read price; [[startMirror]]'s compaction bounds the
    * log side). Readable at any point of the mirror's life: before
    * the first compaction base is absent and the fold replays the
    * retained log from empty.
    *
    * READ-CONSISTENCY CONTRACT (CdcMirrorConsistencySpec): readers
    * take no locks, and a plan that straddles a compaction swap is
    * CONSISTENT-OR-LOUD — it either returns one of the two
    * consistent snapshots or fails with a retryable
    * FileNotFound-class error (the captured file listing was
    * swapped away), never a torn mix. The invariant that closes
    * every interleaving: re-folding already-compacted run
    * partitions onto the post-compaction base is a no-op (adds
    * match rows the base already has, removes target rows already
    * absent), so a stale delta listing over a fresh base still
    * folds to the current state. Retry on failure; the WRITER side
    * stays single-writer ([[graft.Pipeline.healSwap]]'s documented
    * discipline). */
  def readMirror(spark: SparkSession, mirrorPath: String): DataFrame = {
    Pipeline.healSwap(spark, basePath(mirrorPath))
    val base = readOpt(spark, basePath(mirrorPath))
    readOpt(spark, deltaPath(mirrorPath)) match {
      case Some(log) => Pipeline.applyLog(base, log)
      case None => base.getOrElse(throw new IllegalArgumentException(
        s"empty mirror at $mirrorPath: no base, no retained log"))
    }
  }

  /** Retained-log run partitions currently on disk. */
  private def runDirs(spark: SparkSession, mirror: String): Seq[Path] = {
    val root = new Path(deltaPath(mirror))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("run_id="))
      .map(_.getPath)
  }

  /** Start the MERGE-ON-READ subscriber. Each micro-batch appends
    * its change rows into the mirror's retained log partitioned by
    * run_id — a delta-sized write, no snapshot fold. When the
    * retained log reaches `compactEvery` run partitions, the batch
    * additionally folds log + base into a new base
    * ([[graft.Pipeline.applyLog]], atomic-swap publish) and drops
    * the folded partitions — so the amortized per-batch cost stays
    * delta-sized and [[readMirror]]'s fold is bounded by
    * `compactEvery` runs. Append-duplicated rows from a redelivered
    * run collapse in the fold's per-triple group-by, so redelivery
    * (of the latest run — class doc) stays a no-op here too. */
  def startMirror(spark: SparkSession, changesPath: String,
      mirrorPath: String, checkpoint: String,
      compactEvery: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes(spark, changesPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        batch.write.mode("append").partitionBy("run_id")
          .parquet(deltaPath(mirrorPath))
        val dirs = runDirs(s, mirrorPath)
        if (dirs.size >= compactEvery) {
          Pipeline.healSwap(s, basePath(mirrorPath))
          val folded = Pipeline.applyLog(
            readOpt(s, basePath(mirrorPath)),
            s.read.option("basePath", deltaPath(mirrorPath))
              .parquet(deltaPath(mirrorPath))).localCheckpoint()
          try Pipeline.atomicReplace(folded, basePath(mirrorPath))
          finally org.apache.spark.sql.graftshim.ColumnBridge
            .freeLocalCheckpoint(folded)
          // drop AFTER the base swap: a crash between the two leaves
          // folded partitions in the log, and re-folding them onto
          // the new base is a no-op (the compactDelta retry property)
          val fs = new Path(deltaPath(mirrorPath))
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          dirs.foreach(p => fs.delete(p, true))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
