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
    * regardless of how the shard was split into micro-batches. */
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
        import org.apache.spark.sql.functions.{broadcast, col}
        val aBands = DedupIndex.docBands(batch)
        val index = spark.read.parquet(indexBandsPath)
        // map-side over the index scan: the arriving micro-batch is
        // the small side and broadcast, exactly as in batch
        val dupIds = index.join(
            broadcast(aBands.withColumnRenamed("doc_id", "a_id")),
            Seq("band", "bv"))
          .select(col("a_id").as("doc_id")).distinct()
        val kept = batch.join(broadcast(dupIds), Seq("doc_id"), "left_anti")
        kept.write.mode("append").parquet(outPath)
        if (extendIndex)
          DedupIndex.docBands(kept)
            .write.mode("append").parquet(indexBandsPath)
      }
      .trigger(trigger).start()
}
