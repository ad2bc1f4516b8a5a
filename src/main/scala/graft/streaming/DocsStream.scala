package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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

  /** Streaming `documents` table over a directory of JSONL shards —
    * the ingest boundary where corpora actually ARRIVE (crawl dumps
    * and corpus releases ship JSON-Lines, not parquet;
    * [[graft.sources.JsonlDocs]] is the batch twin). Same file-source
    * semantics as [[documents]] (exactly-once per file via the
    * checkpoint, schema pinned up front, FAILFAST on malformed
    * lines — a corrupt shard stops the stream instead of silently
    * nulling rows into the corpus), so every downstream gate in this
    * object composes with either source unchanged. */
  def documentsJsonl(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
      .option("mode", "FAILFAST")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.json(path)
  }

  /** Streaming `documents` table over a directory of CSV shards —
    * the third ingest boundary, sharing
    * [[graft.llm.LlmQueries.csvRead]]'s LOSSLESS config pair
    * (multiLine so embedded newlines survive, the U+0001 null
    * sentinel so empty strings stay empty, explicit schema, FAILFAST
    * so a malformed shard stops the stream rather than nulling rows
    * into the corpus). Same exactly-once-per-file semantics as
    * [[documents]]/[[documentsJsonl]]; every downstream gate
    * composes unchanged. */
  def documentsCsv(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\u0001")
      .option("mode", "FAILFAST")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.csv(path)
  }

  /** Streaming archive objects over a directory of `.warc` /
    * `.warc.gz` files via the binaryFile source — the RAW-CRAWL
    * ingest boundary (Common Crawl's own layout is millions of
    * archive objects, gzipped member-per-record, so
    * file-per-record-stream is the production grain; the source's
    * exactly-once-per-file tracking is the delivery guarantee).
    * Decompression happens inside the record parser
    * ([[graft.llm.Warc.parseAuto]] detects the gzip magic), so both
    * layouts flow through one chain. */
  def archives(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // the binaryFile source's FIXED schema, which the streaming
    // reader nonetheless requires spelled out
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val reader = spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", "*.{warc,warc.gz}")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.load(path)
  }

  /** Streaming twin of the crawl→docs ingest
    * ([[LlmQueries.warcIngest]]): each arriving archive object runs
    * the SAME [[LlmQueries.ingestArchives]] chain (parse → HTTP
    * split → status/content-type gate → tag strip → fingerprint) and
    * the kept pages append to `outPath`. Zero streaming state — the
    * chain is per-object map-side, so the output is bit-equal to a
    * batch ingest over the same files regardless of micro-batch
    * split, and the file source's exactly-once tracking makes
    * appends safe without a retry guard. */
  def startWarcIngest(archives: DataFrame, outPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    LlmQueries.ingestArchives(
        archives.select(col("content").as("payload")), Seq.empty)
      .writeStream
      .option("checkpointLocation", checkpointLocation)
      .format("parquet").option("path", outPath)
      .trigger(trigger).start()

  /** Streaming twin of the incremental span-level dedup
    * ([[LlmQueries.spanIncremental]]): each arriving micro-batch is
    * PROBED against the persisted span-gram index (the base corpus's
    * distinct gram hashes, [[LlmQueries.storedSpanGramsPath]]'s
    * artifact) through the same [[LlmQueries.spanProbe]] the batch
    * path uses, and the per-doc span stats append to `outPath`.
    * Pure probe by design: shard-INTERNAL duplicates that straddle a
    * micro-batch boundary are out of scope here (they need the
    * cross-batch gram state the batch query gets for free), so the
    * stream's output is bit-equal to a batch `spanProbe` over the
    * same documents REGARDLESS of how the shard was split into
    * micro-batches — the property the twin spec pins. Zero streaming
    * state; at-least-once safe via the O(delta) [[BatchManifest]]
    * protocol (bounded ledger read, per-batch dynamic-overwrite
    * heal — never an out-table scan). */
  def startSpanProbe(docs: DataFrame, gramIndexPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          BatchManifest.writeBatch(LlmQueries.spanProbe(batch,
            spark.read.parquet(gramIndexPath)), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming twin of [[graft.llm.CdcChunks.dedupIncremental]]'s
    * probe leg: each arriving micro-batch is chunked map-side and
    * its digests probed against the stored base-corpus digest index
    * ([[graft.llm.CdcChunks.storedDigestsPath]]) — same
    * broadcast-asymmetric shape as [[startSpanProbe]], same
    * [[BatchManifest]] idempotence for at-least-once replays. */
  def startCdcProbe(docs: DataFrame, digestIndexPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          BatchManifest.writeBatch(graft.llm.CdcChunks.probe(batch,
            spark.read.parquet(digestIndexPath)), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming twin of the frozen-vocabulary tokenizer
    * ([[LlmQueries.wordpieceIncremental]]): each arriving
    * micro-batch tokenizes map-side against the STORED vocabulary
    * artifact ([[LlmQueries.buildWordpieceVocab]]'s parquet — the
    * trained-tokenizer handoff), with the same `<UNK>`
    * one-char-advance fallback, and per-document token counts append
    * to `outPath`. The vocabulary is alphabet-bounded, so the
    * per-batch load is a driver read + broadcast (the
    * [[startSpanProbe]] asymmetric-probe discipline with an even
    * smaller static side); per-doc rows are complete within their
    * batch (a document is one row), so output is bit-equal to a
    * batch [[LlmQueries.wordpieceProbe]] over the same documents
    * regardless of micro-batch splits. At-least-once safe via the
    * [[BatchManifest]] protocol. */
  def startWordpieceProbe(docs: DataFrame, vocabPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val vocab = spark.read.parquet(vocabPath)
            .collect().map(_.getString(0)).toSet
          BatchManifest.writeBatch(
            LlmQueries.wordpieceProbe(batch, vocab), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Gopher-style quality filter over the stream — batch semantics,
    * incremental execution. */
  def qualityFiltered(docs: DataFrame): DataFrame =
    LlmQueries.qualityFilterOf(docs)

  /** Streaming twin of the frozen-merge BPE tokenizer
    * ([[LlmQueries.bpeIncremental]]'s per-doc probe): each arriving
    * micro-batch tokenizes under the STORED base-trained merge list
    * (driver-bounded — [[LlmQueries.bpeRounds]] rows — re-read per
    * batch so a retrain swap takes effect at the next batch) and
    * per-doc (token, n) rows append to `outPath`. Row-local:
    * stream output is bit-equal to a batch probe over the same
    * documents regardless of the split; at-least-once safe via the
    * [[BatchManifest]] protocol. */
  def startBpeProbe(docs: DataFrame, mergesPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val merges = spark.read.parquet(mergesPath)
            .orderBy(col("merge_rank")).collect()
            .map(r => (r.getString(1), r.getString(2))).toSeq
          BatchManifest.writeBatch(
            LlmQueries.bpeProbe(batch, merges), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming twin of the frozen-vocabulary UNIGRAM tokenizer
    * ([[LlmQueries.unigramIncremental]]'s per-doc probe): each
    * arriving micro-batch runs the Viterbi + `<UNK>` DP under the
    * STORED weighted vocabulary artifact
    * ([[LlmQueries.buildUnigramVocab]]'s (g, n) parquet —
    * alphabet-bounded, re-read per batch so a retrain swap takes
    * effect at the next batch) and per-doc (token, n) rows append to
    * `outPath`. Row-local — stream output is bit-equal to a batch
    * probe over the same documents regardless of the split;
    * at-least-once safe via the [[BatchManifest]] protocol. */
  def startUnigramProbe(docs: DataFrame, vocabPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val vocab = spark.read.parquet(vocabPath)
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          BatchManifest.writeBatch(
            LlmQueries.unigramProbe(batch, vocab), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming twin of the LEARNED quality scorer
    * ([[LlmQueries.qualityScoreOf]]): each arriving micro-batch is
    * scored against the STORED weight artifact (the trained-model
    * handoff seam — retraining swaps the table, the stream keeps
    * running) and the per-doc (score, kept) rows append to
    * `outPath`. Row-local inference — stream output is bit-equal to
    * a batch score over the same documents regardless of
    * micro-batch split; at-least-once safe via the
    * [[BatchManifest]] protocol (the [[startSpanProbe]]
    * discipline). */
  def startQualityScore(docs: DataFrame, weightsPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          BatchManifest.writeBatch(LlmQueries.qualityScoreOf(batch,
            spark.read.parquet(weightsPath)), outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

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
          Artifacts.readParquet(spark, sketchPath)
          .getOrElse(spark.range(0)
            .select(col("id").cast("string").as("source"),
              col("id").as("hv")).limit(0))
        val merged = LlmQueries.kmvMergeRows(existing, partial)
          .localCheckpoint()
        merged.write.mode("overwrite").parquet(sketchPath)
        org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(merged)
      }
      .trigger(trigger).start()

  /** Streaming maintenance of the count-min sketch
    * ([[LlmQueries.cmsCellsOf]]): each micro-batch's bigram cell
    * counts APPEND to the stored cell table under the batch's id,
    * and the sketch a reader consumes is `groupBy(cell).sum(c)` —
    * cell-wise ADDITION, which is exactly the sketch of the union
    * corpus (count-min mergeability, the same role the bottom-k
    * merge plays for KMV). Replay safety: `foreachBatch` + append is
    * at-least-once and cell addition is NOT idempotent, so a
    * replayed batch is SKIPPED — exactly-once via the
    * [[BatchManifest]] ledger (replay detection is a bounded
    * ledger read, not a store scan; a crash between the data write
    * and the ledger commit heals by the per-batch dynamic
    * overwrite). Per-batch cost is the batch's own map-side scan +
    * one exchange on ≤ d·w cells. */
  def startCmsMaintenance(docs: DataFrame, cellsPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, cellsPath, batchId)) {
          BatchManifest.writeBatch(
            LlmQueries.cmsCellsOf(batch), cellsPath, batchId)
          BatchManifest.commit(spark, cellsPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** The maintained sketch as one (cell, c) table — what a probe
    * joins against. */
  def readCmsSketch(spark: SparkSession, cellsPath: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    spark.read.parquet(cellsPath)
      .groupBy(col("cell")).agg(sum(col("c")).as("c"))
  }

  /** Streaming HyperLogLog maintenance — [[startCmsMaintenance]]'s
    * sibling for the distinct sketch ([[LlmQueries.hllRegsOf]]):
    * each micro-batch appends its own (source, register, max-rho)
    * table, tagged with the batch id; the read side folds by
    * register MAX, which is HLL's exact merge — so the maintained
    * estimate equals the batch estimate over everything ingested,
    * regardless of how arrivals were split into batches. CMS needed
    * the replay guard because its fold is a SUM (replays
    * double-count); HLL's max fold is idempotent, but the guard is
    * kept anyway so storage doesn't grow on retries — one
    * discipline ([[BatchManifest]]) for all maintained sketches. */
  def startHllMaintenance(docs: DataFrame, regsPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, regsPath, batchId)) {
          BatchManifest.writeBatch(
            LlmQueries.hllRegsOf(batch), regsPath, batchId)
          BatchManifest.commit(spark, regsPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** The maintained registers folded by their exact merge (max per
    * (source, j)) — feed to [[LlmQueries.hllEstimateOf]]. */
  def readHllRegs(spark: SparkSession, regsPath: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, max}
    spark.read.parquet(regsPath)
      .groupBy(col("source"), col("j")).agg(max(col("mj")).as("mj"))
  }

  /** Streaming inverted-index maintenance — the retrieval lane's
    * sibling of the sketch twins: each micro-batch appends its own
    * (doc_id, term, tf) posting rows ([[LlmQueries.postingsOf]] —
    * per-DOCUMENT derivations, so postings from disjoint batches
    * merge by plain union and the fold needs no combine at all),
    * [[BatchManifest]]-guarded against replay appends — the
    * postings store is corpus-scale, so replay detection must be a
    * bounded ledger read, never a store scan. A BM25 query over
    * [[readPostings]] equals the monolithic batch build over
    * everything ingested (df/avgdl/N re-derive from the merged index
    * inside the scoring plan — Bm25StreamSpec). */
  def startPostingsMaintenance(docs: DataFrame, postingsPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, postingsPath, batchId)) {
          BatchManifest.writeBatch(
            LlmQueries.postingsOf(batch), postingsPath, batchId)
          BatchManifest.commit(spark, postingsPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** The maintained inverted index (union fold — per-document rows
    * never conflict across batches). */
  def readPostings(spark: SparkSession, postingsPath: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(postingsPath)
      .select(col("doc_id"), col("term"), col("tf"))
  }

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
    * Retry safety — the O(delta) [[BatchManifest]] protocol on both
    * stores: replay detection is a bounded ledger read per store
    * (never an out-table or index scan); an uncommitted replay
    * recomputes the batch and dynamic-overwrites its own `batch_id`
    * partitions, healing partial appends. The probe reads the
    * index's COMMITTED view ([[BatchManifest.committedOnly]] —
    * partition pruning on ledger-listed batch ids), so a retry after
    * a crash inside the index append sees exactly the index state
    * the first attempt saw and its verdicts (and healed rewrite) are
    * deterministic; the self-match guard (`index.doc_id != arriving
    * id`) additionally keeps a re-fed already-indexed document from
    * dropping against its own bands. */
  def startIncrementalDedup(docs: DataFrame, indexBandsPath: String,
      outPath: String, checkpointLocation: String,
      extendIndex: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{broadcast, col}
        val outDone = BatchManifest.applied(spark, outPath, batchId)
        val idxDone = !extendIndex ||
          BatchManifest.applied(spark, indexBandsPath, batchId)
        if (!outDone || !idxDone) {
          val aBands = DedupIndex.docBands(batch)
            .withColumnRenamed("doc_id", "a_id")
          val index = BatchManifest.committedOnly(spark, indexBandsPath,
            spark.read.parquet(indexBandsPath))
          // map-side over the index scan: the arriving micro-batch is
          // the small side and broadcast, exactly as in batch
          val dupIds = index.join(broadcast(aBands), Seq("band", "bv"))
            .filter(col("doc_id") =!= col("a_id"))
            .select(col("a_id").as("doc_id")).distinct()
          val novel = batch
            .join(broadcast(dupIds), Seq("doc_id"), "left_anti")
            .localCheckpoint() // several consumers below — evaluate once
          if (!outDone) {
            BatchManifest.writeBatch(novel, outPath, batchId)
            BatchManifest.commit(spark, outPath, batchId)
          }
          if (extendIndex && !idxDone) {
            BatchManifest.writeBatch(
              DedupIndex.docBands(novel)
                // a kept novel doc is its own cluster representative
                .withColumn("lbl", col("doc_id"))
                .select("band", "bv", "doc_id", "lbl"),
              indexBandsPath, batchId)
            BatchManifest.commit(spark, indexBandsPath, batchId)
          }
          org.apache.spark.sql.graftshim.ColumnBridge
            .freeLocalCheckpoint(novel)
        }
      }
      .trigger(trigger).start()

  /** Schema of the `embeddings` shards (TESTDATA.md) — pinned up
    * front like [[schema]]. */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming `embeddings` table over a directory of parquet
    * shards — the vector twin of [[documents]]. */
  def embeddings(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(embeddingsSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Streaming twin of the incremental ANN probe
    * ([[LlmQueries.ivfIncremental]]): arriving embedding shards are
    * quantized by the SHARED quantizer ([[LlmQueries.quantizeExpr]]
    * — one definition for batch, index build and stream) and probed
    * against the PERSISTED IVF index at `indexPath`
    * ([[graft.llm.AnnIndex.Stored]] layout: centroids +
    * cid-partitioned assignments); each arriving vector's top-`k`
    * neighbors append to `outPath`. Zero streaming state — the
    * stored index is the searched set, the probe runs inside
    * `foreachBatch` where the micro-batch is an ordinary DataFrame,
    * so results are bit-equal to the batch probe over the same
    * vectors regardless of how the shard was micro-batched.
    *
    * `extendIndex = true` additionally assigns each batch's vectors
    * against the STORED centroids (map-side — an append never
    * re-trains) and appends them to the inverted lists, so later
    * micro-batches also search earlier arrivals — the production
    * admit loop for a growing vector corpus.
    *
    * Retry safety — the O(delta) [[BatchManifest]] protocol on BOTH
    * stores: out rows land under their own `batch_id` partition via
    * dynamic overwrite (a replayed attempt replaces its own leafs)
    * and commit to the out ledger; the index extend carries its own
    * ledger inside [[graft.llm.AnnIndex.extend]]. Neither guard ever
    * scans a store — replay detection is a bounded ledger read. The
    * probe's self-match guard (`vec_id != q_id`) keeps a replay
    * after a committed extend from matching a vector to itself. */
  def startAnnProbe(vecs: DataFrame, indexPath: String,
      outPath: String, checkpointLocation: String,
      k: Int = 5, nProbe: Int = 2,
      extendIndex: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, expr}
        val stored = graft.llm.AnnIndex.read(spark, indexPath)
        val qv = batch.select(col("vec_id"),
          expr(LlmQueries.quantizeExpr).as("qv"))
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val res = graft.llm.AnnIndex.probe(qv, stored, k, nProbe)
          BatchManifest.writeBatch(res, outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
        if (extendIndex)
          graft.llm.AnnIndex.extend(qv, stored, indexPath, batchId)
      }
      .trigger(trigger).start()

  /** Streaming twin of the incremental IVFPQ probe
    * ([[graft.llm.AnnIndex.probePq]]): each arriving embedding
    * shard is quantized by the SHARED quantizer and served its
    * top-k ADC neighbors from the STORED fused index (coarse lists
    * + residual codes), appended under the batch id; with
    * `extendIndex` the shard ALSO extends BOTH stored layers — its
    * assignments into the IVF lists and its codes into the PQ code
    * lists — each store committing its own ledger row, so a crash
    * between the three writes heals independently on replay (every
    * write is the [[BatchManifest]] protocol). Zero streaming
    * state; the artifacts are the state. */
  def startIvfpqProbe(vecs: DataFrame, indexPath: String,
      pqPath: String, outPath: String, checkpointLocation: String,
      k: Int = 5, nProbe: Int = 4, m: Int = 4, dim: Int = 16,
      extendIndex: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, expr}
        val stored = graft.llm.AnnIndex.read(spark, indexPath)
        val pq = graft.llm.AnnIndex.readPq(spark, pqPath)
        val qv = batch.select(col("vec_id"),
          expr(LlmQueries.quantizeExpr).as("qv"))
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val res = graft.llm.AnnIndex.probePq(qv, stored, pq, k,
            nProbe, m, dim)
          BatchManifest.writeBatch(res, outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
        if (extendIndex) {
          graft.llm.AnnIndex.extend(qv, stored, indexPath, batchId)
          graft.llm.AnnIndex.extendPq(qv, stored, pq, pqPath,
            batchId, m, dim)
        }
      }
      .trigger(trigger).start()

  /** Streaming IVF drift monitor — the continuous form of the
    * maintenance loop [[graft.llm.AnnIndex.drift]] measures and
    * [[graft.llm.AnnIndex.retrainIfDrifted]] acts on: each arriving
    * embedding shard is quantized by the SHARED quantizer and its
    * per-inverted-list drift statistics against the PERSISTED index
    * (mass shares ×1000, mean member→centroid inner products)
    * append to `statsPath` under the batch id — so an operator (or
    * a scheduled re-train job) reads a TIME SERIES of ≤k-row drift
    * frames and thresholds it without ever scanning the corpus.
    * Zero streaming state; per-batch cost is one map-side pass over
    * the shard + one over the stored assignment scan, both with the
    * ≤k-row centroid table broadcast. Retry-safe via the
    * [[BatchManifest]] protocol. */
  def startAnnDriftMonitor(vecs: DataFrame, indexPath: String,
      statsPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, expr}
        if (!BatchManifest.applied(spark, statsPath, batchId)) {
          val stored = graft.llm.AnnIndex.read(spark, indexPath)
          val qv = batch.select(col("vec_id"),
            expr(LlmQueries.quantizeExpr).as("qv"))
          BatchManifest.writeBatch(
            graft.llm.AnnIndex.drift(stored, qv), statsPath, batchId)
          BatchManifest.commit(spark, statsPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming language-ID classification gate: arriving document
    * shards are char-bigram-exploded by the SHARED extraction
    * ([[LlmQueries.langIdGramsOf]]) and classified against the
    * STORED Naive-Bayes counts artifact at `countsPath`
    * (`llm_langid_train`'s output) through the same scoring core
    * as the batch gate — one definition of weights, unseen-gram
    * floor and argmax, so stream output is bit-equal to a batch
    * classification of the same documents regardless of the
    * micro-batch split. Appends (doc_id, pred, win_score) to
    * `outPath`; zero streaming state (the counts artifact is the
    * model). Retry-safe via the [[BatchManifest]] protocol. */
  def startLangIdGate(docs: DataFrame, countsPath: String,
      outPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.applied(spark, outPath, batchId)) {
          val counts = spark.read.parquet(countsPath)
          BatchManifest.writeBatch(LlmQueries.langIdScoreOf(
            LlmQueries.langIdGramsOf(batch), counts, Nil),
            outPath, batchId)
          BatchManifest.commit(spark, outPath, batchId)
        }
      }
      .trigger(trigger).start()

  /** Streaming twin of the banded SimHash near-dup
    * ([[LlmQueries.simhashNeardup]]): arriving shards are signed by
    * the IDENTICAL 64-bit lineage ([[LlmQueries.simhashSignOf]] —
    * one definition for batch and stream) and probed against the
    * PERSISTED signature store at `sigStorePath`; a document within
    * hamming distance 3 of ANY stored signature is dropped, the rest
    * append to `outPath`. Zero streaming state — the store is the
    * seen-set (the [[startIncrementalDedup]] pattern).
    *
    * Probe shape at scale: the candidate test is the SAME pigeonhole
    * band trick as batch — a hamming ≤ 3 pair agrees exactly on one
    * of the 4 × 16-bit bands — so the store scan explodes into
    * (band, value) rows MAP-SIDE (a generated projection on the
    * scan, no shuffle, no stored band table) and broadcast-joins the
    * micro-batch's band rows: per-batch cost is a small constant
    * number of MAP-SIDE store passes (candidate probe, signature
    * back-join against the tiny broadcast candidate set, and — in
    * extend mode — the replay-guard anti-join), never store × batch
    * and never a store shuffle. The hamming verify then runs
    * `bit_count(xor)` over the four band integers of the surviving
    * candidates only.
    *
    * `extendStore = true` appends each batch's KEPT signatures, so
    * later micro-batches gate against earlier arrivals — the
    * production admit loop. Retry safety is the O(delta)
    * [[BatchManifest]] protocol on both stores (bounded ledger
    * reads, per-batch dynamic-overwrite heal), with the probe
    * reading the store's COMMITTED view so a retry after a partial
    * store append reproduces the first attempt's verdicts; the
    * self-match guard keeps a re-fed already-stored document from
    * gating against its own signature. */
  def startSimhashGate(docs: DataFrame, sigStorePath: String,
      outPath: String, checkpointLocation: String,
      extendStore: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{broadcast, col, expr}
        val outDone = BatchManifest.applied(spark, outPath, batchId)
        val storeDone = !extendStore ||
          BatchManifest.applied(spark, sigStorePath, batchId)
        if (!outDone || !storeDone) {
          val aSig = LlmQueries.simhashSignOf(batch)
            .select(col("doc_id").as("a_id") +:
              (0 until 4).map(k => col(s"v$k").as(s"a$k")): _*)
            .localCheckpoint() // signed once; probed + appended below
          val bandRowsOf = (df: DataFrame, idCol: String, pfx: String) =>
            df.select(col(idCol),
              org.apache.spark.sql.functions.explode(expr(
                (0 until 4).map(k =>
                  s"struct($k AS band, $pfx$k AS bv)")
                  .mkString("array(", ", ", ")"))).as("x"))
              .select(col(idCol), col("x.band").as("band"),
                col("x.bv").as("bv"))
          val store = BatchManifest.committedOnly(spark, sigStorePath,
            spark.read.parquet(sigStorePath))
          // map-side probe: store scan explodes to band rows and hash-
          // joins the BROADCAST batch bands; candidates then verify on
          // full 64-bit hamming with the self-match guard
          val cand = bandRowsOf(store, "doc_id", "v")
            .join(broadcast(bandRowsOf(aSig, "a_id", "a")),
              Seq("band", "bv"))
            .filter(col("doc_id") =!= col("a_id"))
            .select("doc_id", "a_id").distinct()
          val ham = (0 until 4).map(k =>
            expr(s"bit_count(v$k ^ a$k)")).reduce(_ + _)
          val dupIds = cand
            .join(store, Seq("doc_id"))
            .join(broadcast(aSig), Seq("a_id"))
            .filter(ham <= 3)
            .select(col("a_id").as("doc_id")).distinct()
          val novel = batch
            .join(broadcast(dupIds), Seq("doc_id"), "left_anti")
            .localCheckpoint()
          if (!outDone) {
            BatchManifest.writeBatch(novel, outPath, batchId)
            BatchManifest.commit(spark, outPath, batchId)
          }
          if (extendStore && !storeDone) {
            BatchManifest.writeBatch(
              aSig.join(broadcast(novel.select(col("doc_id").as("n_id"))),
                  col("a_id") === col("n_id"), "left_semi")
                .select(col("a_id").as("doc_id") +:
                  (0 until 4).map(k => col(s"a$k").as(s"v$k")): _*),
              sigStorePath, batchId)
            BatchManifest.commit(spark, sigStorePath, batchId)
          }
          org.apache.spark.sql.graftshim.ColumnBridge
            .freeLocalCheckpoint(novel)
          org.apache.spark.sql.graftshim.ColumnBridge
            .freeLocalCheckpoint(aSig)
        }
      }
      .trigger(trigger).start()
}
