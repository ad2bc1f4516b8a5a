package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.llm.{DedupIndex, LlmQueries}

/** Incremental corpus hygiene — the streaming form of the
  * training-data filters: new document shards dropped into a corpus
  * directory are discovered by Structured Streaming's file source
  * (exactly-once per file via the checkpoint) and flow through the
  * SAME filter transformations the batch queries use
  * ([[LlmQueries.qualityFilterOf]], [[LlmQueries.termFilterOf]]).
  *
  * Both filters are row-local and stateless — no watermark, no state
  * store, no shuffle; a micro-batch's cost is exactly the map-side
  * scan of its new files. This is the streaming sweet spot for
  * corpus hygiene: filters apply incrementally as shards land, while
  * the stateful corpus-wide steps (dedup, clustering) stay batch
  * jobs over the accumulated clean table — the standard
  * lambda-free split for 100 TB pipelines (stateless edge,
  * periodic heavy joins).
  */
object DocsStream {

  /** Schema of the `documents` shards (TESTDATA.md) — the streaming
    * file source requires it up front (no inference mid-stream). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming `documents` table over a directory of parquet shards.
    */
  def documents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Gopher-style quality filter over the stream — batch semantics,
    * incremental execution. */
  def qualityFiltered(docs: DataFrame): DataFrame =
    LlmQueries.qualityFilterOf(docs)

  /** C4-style blocklist filter over the stream — batch semantics,
    * incremental execution. */
  def blocklistFiltered(docs: DataFrame): DataFrame =
    LlmQueries.termFilterOf(docs)

  /** Streaming benchmark-decontamination gate: incoming shards are
    * dropped when any of their 5-grams bloom-hits the heldout set.
    * The bitset is a STATIC 1-row table (built batch-side, e.g.
    * [[LlmQueries.bloomBitset]]) stream-static-joined into every
    * micro-batch; the membership test is row-local, so the gate
    * keeps the file-source sweet spot: no watermark, no state store,
    * no shuffle. This is how an ingest edge keeps eval contamination
    * out of a live corpus without replaying the batch join. */
  def bloomDecontaminated(docs: DataFrame, bloomBits: DataFrame): DataFrame =
    LlmQueries.bloomCleanOf(docs, bloomBits)

  /** Streaming KMV sketch maintenance — the streaming twin of
    * [[LlmQueries.kmvIncremental]]: each micro-batch's per-source
    * bottom-k partial ([[LlmQueries.kmvPartialOf]]) is merged into
    * the persisted row-form sketch at `sketchPath`
    * ([[LlmQueries.kmvMergeRows]]) and the tiny merged table
    * (O(sources × k) rows) is rewritten. The corpus-wide distinct
    * estimate is then available at any time from the sketch alone
    * via [[LlmQueries.kmvEstimateOf]] — no corpus rescan, ever.
    *
    * State discipline: ZERO streaming state — the stored sketch IS
    * the state, and because bottom-k merge is idempotent,
    * commutative and associative (set semantics), at-least-once
    * batch replays and any shard-to-micro-batch split produce the
    * SAME sketch as one monolithic batch build. The merged result is
    * localCheckpoint'ed before the overwrite so the read side of the
    * same path is never live while it is rewritten. */
  def startKmvMaintenance(docs: DataFrame, sketchPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        val partial = LlmQueries.kmvPartialOf(batch)
        val existing =
          try spark.read.parquet(sketchPath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.range(0).select(col("id").cast("string").as("source"),
              col("id").as("hv")).limit(0) }
        val merged = LlmQueries.kmvMergeRows(existing, partial)
          .localCheckpoint()
        merged.write.mode("overwrite").parquet(sketchPath)
        org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(merged)
      }
      .trigger(trigger).start()

  /** Streaming twin of the cross-snapshot incremental dedup
    * ([[LlmQueries.dedupIncremental]]): arriving document shards are
    * MinHash-signed ([[DedupIndex.docBands]]) and probed against
    * the PERSISTED band index at `indexBandsPath`, and only
    * non-duplicates are appended to `outPath`. The probe runs inside
    * `foreachBatch`, where the micro-batch is an ordinary DataFrame
    * (the signature groupBy is batch-local, not streaming state) —
    * so the dedup is exact (a band-bucket semi-join, the same
    * candidate test as batch), with exactly-once file semantics from
    * the checkpoint, and with ZERO streaming state: the stored index
    * is the seen-set (same shape as
    * [[TurtleStream.startDedupAppend]]).
    *
    * `extendIndex = true` additionally appends each batch's KEPT
    * documents' bands to the index, so later micro-batches also dedup
    * against earlier arrivals — the full production admit loop
    * (probe, keep, index what you kept). With `false` the stream is a
    * pure probe and its kept-set is bit-equal to the batch query's
    * regardless of how the shard was split into micro-batches.
    *
    * Retry safety: `foreachBatch` + parquet append is at-least-once,
    * so every write is guarded to be idempotent per doc_id — the out
    * table is re-read as the seen-set (the [[TurtleStream]] pattern)
    * and the index append anti-joins the index's own doc_ids; probe
    * matches exclude self-matches (`index.doc_id != arriving id`) so
    * a crash between the index append and the checkpoint commit
    * cannot make a replayed document drop against its own bands. */
  def startIncrementalDedup(docs: DataFrame, indexBandsPath: String,
      outPath: String, checkpointLocation: String,
      extendIndex: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{broadcast, col, lit}
        val aBands = DedupIndex.docBands(batch)
          .withColumnRenamed("doc_id", "a_id")
        val index = spark.read.parquet(indexBandsPath)
        // map-side over the index scan: the arriving micro-batch is
        // the small side and broadcast, exactly as in batch; the
        // self-match guard makes a batch REPLAY after a partial
        // extendIndex append see past its own bands
        val dupIds = index.join(broadcast(aBands), Seq("band", "bv"))
          .filter(col("doc_id") =!= col("a_id"))
          .select(col("a_id").as("doc_id")).distinct()
        val novel = batch.join(broadcast(dupIds), Seq("doc_id"), "left_anti")
          .localCheckpoint() // several consumers below — evaluate once
        // retry guard: the accumulated out table is the seen-set
        // (target-table-sized — no broadcast hint; the same documented
        // trade as TurtleStream.startDedupAppend's anti-join)
        val seen =
          try spark.read.parquet(outPath).select(col("doc_id").as("s_id"))
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.emptyDataFrame.withColumn("s_id", lit(0L)).limit(0) }
        novel.join(seen, col("doc_id") === col("s_id"), "left_anti")
          .write.mode("append").parquet(outPath)
        if (extendIndex) {
          // which novel ids already have bands (partial-append replay)?
          // asymmetry as in the probe: broadcast the tiny novel id set
          // against the corpus-scale index scan; the result is tiny
          val alreadyIndexed = index.join(
              broadcast(novel.select(col("doc_id").as("n_id")).distinct()),
              col("doc_id") === col("n_id"))
            .select(col("n_id").as("i_id")).distinct()
          DedupIndex.docBands(novel)
            .join(broadcast(alreadyIndexed), col("doc_id") === col("i_id"),
              "left_anti")
            // a kept novel doc is its own cluster representative
            .withColumn("lbl", col("doc_id"))
            .select("band", "bv", "doc_id", "lbl")
            .write.mode("append").parquet(indexBandsPath)
        }
        org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(novel)
      }
      .trigger(trigger).start()
}
