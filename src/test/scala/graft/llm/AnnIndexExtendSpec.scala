package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.BatchManifest

/** O(delta) index maintenance: AnnIndex.extend must never scan the
  * corpus-scale assignment store — replay detection is a bounded
  * ledger read, partial appends heal by dynamic partition
  * overwrite, and nprobe partition pruning survives the layout. */
class AnnIndexExtendSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def quantize(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), expr(LlmQueries.quantizeExpr).as("qv"))

  private def freshIndex(): (String, AnnIndex.Stored,
      org.apache.spark.sql.DataFrame) = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = tmp("annext")
    val stored = AnnIndex.write(spark,
      quantize(emb.filter(!expr(LlmQueries.arrivingVecPred))),
      path, 16, 4)
    val arriving = quantize(emb.filter(expr(LlmQueries.arrivingVecPred)))
    (path, stored, arriving)
  }

  test("PLAN PIN: the extend write touches nothing corpus-scale — " +
    "no scan of the assignment store, no SortMergeJoin, no " +
    "corpus-side exchange; just the broadcast centroid argmax") {
    val (path, stored, arriving) = freshIndex()
    val frame = AnnIndex.extendFrame(arriving, stored)
    frame.collect() // force the adaptive plan final
    val p = frame.queryExecution.executedPlan.toString
    assert(!p.contains("assignments"),
      s"extend scanned the stored assignment table:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"extend sort-merged something:\n${p.take(2000)}")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"extend lost its broadcast centroid row:\n${p.take(2000)}")
    assert(path.nonEmpty)
  }

  test("replay no-op: a committed batch id is detected from the " +
    "bounded ledger and appends nothing") {
    val (path, stored, arriving) = freshIndex()
    val store = s"$path/assignments"
    AnnIndex.extend(arriving, stored, path, batchId = 0L)
    val after = spark.read.parquet(store).count()
    val perVec = spark.read.parquet(store)
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(perVec == 0L, "first extend duplicated a vector")
    // the replay: same batch id, same data — must be a pure no-op
    AnnIndex.extend(arriving, stored, path, batchId = 0L)
    assert(spark.read.parquet(store).count() == after,
      "replay appended rows")
    // ledger carries exactly one commit record for the batch
    val ledger = spark.read.parquet(BatchManifest.path(store))
    assert(ledger.filter(col("batch_id") === 0L).count() == 1L)
  }

  test("partial-append heal: a crash AFTER the data write but " +
    "BEFORE the ledger commit re-runs the write idempotently — " +
    "dynamic overwrite replaces the batch's own leaf partitions, " +
    "no duplicates, and other batches are untouched") {
    val (path, stored, arriving) = freshIndex()
    val store = s"$path/assignments"
    val backfill = spark.read.parquet(store).count()
    // simulate the crash window: data lands, commit never does
    BatchManifest.writeBatch(
      AnnIndex.extendFrame(arriving, stored), store, 0L, Seq("cid"))
    val partial = spark.read.parquet(store).count()
    assert(partial > backfill)
    // the retry runs the full protocol: ledger says un-applied →
    // re-write (overwrite heals) → commit
    AnnIndex.extend(arriving, stored, path, batchId = 0L)
    assert(spark.read.parquet(store).count() == partial,
      "heal changed the row count (overwrite must replace, not add)")
    val dupes = spark.read.parquet(store)
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(dupes == 0L, "heal left duplicate assignments")
    // the backfill partition (batch_id = -1) survived the overwrite
    assert(spark.read.parquet(store)
      .filter(col("batch_id") === -1L).count() == backfill)
  }

  test("retrainIfDrifted: a shard matching the index distribution " +
    "is a no-op; a one-list mass spike re-trains over index ∪ shard " +
    "and atomically replaces the stored index") {
    val (path, stored, _) = freshIndex()
    val before = spark.read.parquet(s"$path/assignments").count()
    // same distribution: every index vector re-arrives under a new id
    val mirror = stored.assignments
      .select((col("vec_id") + 1000000L).as("vec_id"), col("qv"))
    assert(!AnnIndex.retrainIfDrifted(spark, path, mirror, 16, 4),
      "an in-distribution shard must not trigger a re-train")
    assert(spark.read.parquet(s"$path/assignments").count() == before,
      "no-op branch touched the stored index")
    // drift: 200 copies of one vector concentrate all arriving mass
    // in a single inverted list
    val one = stored.assignments.select(col("qv")).limit(1)
    val spike = spark.range(2000000L, 2000200L).toDF("vec_id")
      .crossJoin(broadcast(one))
    assert(AnnIndex.retrainIfDrifted(spark, path, spike, 16, 4),
      "a one-list mass spike must trigger a re-train")
    val after = AnnIndex.read(spark, path)
    assert(spark.read.parquet(s"$path/assignments").count() ==
      before + 200L, "re-train must index the union")
    // the rebuilt index still probes (structure intact end to end);
    // query vectors re-derive from the POST-swap index — frames on
    // the retired path hold stale file listings, the documented
    // atomic-swap reader contract
    val q = after.assignments
      .select((col("vec_id") + 3000000L).as("vec_id"), col("qv"))
      .limit(3)
    assert(AnnIndex.probe(q, after, k = 2, nProbe = 2).count() > 0)
    // the swap left no staging directories behind
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.next")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.old")))
  }

  test("retrainIfTrendDrifted: a ONE-BATCH spike in the drift-frame " +
    "series does not re-train; a SUSTAINED full-window shift does; " +
    "uncommitted monitor frames never count") {
    val (path, stored, _) = freshIndex()
    val statsPath = tmp("annstats") + "/frames"
    val mirror = stored.assignments
      .select((col("vec_id") + 1000000L).as("vec_id"), col("qv"))
    val one = stored.assignments.select(col("qv")).limit(1)
    val spike = spark.range(2000000L, 2000200L).toDF("vec_id")
      .crossJoin(broadcast(one))
    // the monitor's exact per-batch body: drift frame -> writeBatch
    // -> commit
    def frame(shard: org.apache.spark.sql.DataFrame, b: Long,
        commit: Boolean = true): Unit = {
      BatchManifest.writeBatch(AnnIndex.drift(stored, shard),
        statsPath, b)
      if (commit) BatchManifest.commit(spark, statsPath, b)
    }
    frame(mirror, 0L); frame(mirror, 1L); frame(spike, 2L)
    assert(!AnnIndex.retrainIfTrendDrifted(spark, path, statsPath,
      window = 3, k = 16, iters = 4),
      "a one-batch spike fired the trend gate")
    // a crashed monitor batch (data written, never committed) must
    // be invisible to the decision
    frame(spike, 3L, commit = false)
    assert(!AnnIndex.retrainIfTrendDrifted(spark, path, statsPath,
      window = 3, k = 16, iters = 4),
      "an uncommitted frame influenced the trend gate")
    // the replay commits batch 3; window {1,2,3} still holds a calm
    // frame — min-gating keeps the trigger down
    frame(spike, 3L)
    assert(!AnnIndex.retrainIfTrendDrifted(spark, path, statsPath,
      window = 3, k = 16, iters = 4),
      "a 2-of-3 window fired the trend gate")
    // batch 4 completes a full spiky window {2,3,4}: sustained
    frame(spike, 4L)
    assert(AnnIndex.retrainIfTrendDrifted(spark, path, statsPath,
      window = 3, k = 16, iters = 4),
      "a sustained full-window shift must re-train")
    // the swap was atomic and the rebuilt index still serves probes
    val after = AnnIndex.read(spark, path)
    val q = after.assignments
      .select((col("vec_id") + 3000000L).as("vec_id"), col("qv"))
      .limit(3)
    assert(AnnIndex.probe(q, after, k = 2, nProbe = 2).count() > 0)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.next")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.old")))
  }

  private def freshPqIndex(): (String, AnnIndex.Stored,
      AnnIndex.StoredPq, org.apache.spark.sql.DataFrame) = {
    val (path, stored, arriving) = freshIndex()
    val pq = AnnIndex.writePq(spark, stored, s"$path/pq", 4, 16, 16)
    (path, stored, pq, arriving)
  }

  test("PQ layer: codes cover the index corpus exactly, codebooks " +
    "follow the sample rule, and the stored probe ranks through the " +
    "bounded heap with no SortMergeJoin") {
    val (_, stored, pq, arriving) = freshPqIndex()
    assert(pq.codes.count() == stored.assignments.count(),
      "codes must cover every index member exactly once")
    assert(pq.codes.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0L)
    val sample = stored.assignments.filter(col("vec_id") < 16).count()
    assert(pq.codebooks.count() == 4L * sample,
      "codebooks must be m x sample residuals")
    val top = AnnIndex.probePq(arriving.limit(3), stored, pq,
      k = 5, nProbe = 4, m = 4, dim = 16)
    top.collect()
    val p = top.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"stored PQ probe sort-merged a corpus side:\n${p.take(2000)}")
    assert(p.contains("top_k_l"),
      "stored PQ probe must rank through the bounded heap")
  }

  test("PQ extend is O(delta) with the full ledger protocol: the " +
    "frame touches no corpus-scale store, a committed batch is a " +
    "no-op, an uncommitted partial heals by overwrite, and orphan " +
    "partitions stay invisible to readPq") {
    val (path, stored, pq, arriving) = freshPqIndex()
    val store = s"$path/pq/codes"
    // plan pin: encode touches arriving + broadcast smalls only
    val frame = AnnIndex.extendPqFrame(arriving, stored, pq, 4, 16)
    frame.collect()
    val p = frame.queryExecution.executedPlan.toString
    assert(!p.contains("/codes"),
      s"PQ extend scanned the stored code table:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"PQ extend sort-merged something:\n${p.take(2000)}")
    // orphan isolation: data lands, commit never does → invisible
    val before = AnnIndex.readPq(spark, s"$path/pq").codes.count()
    BatchManifest.writeBatch(frame, store, 0L, Seq("cid"))
    assert(AnnIndex.readPq(spark, s"$path/pq").codes.count() == before,
      "uncommitted batch partitions leaked into the committed view")
    // the retry heals by overwrite and commits exactly once
    AnnIndex.extendPq(arriving, stored, pq, s"$path/pq", 0L, 4, 16)
    val after = AnnIndex.readPq(spark, s"$path/pq").codes
    assert(after.count() == before + arriving.count())
    assert(after.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0L, "heal duplicated rows")
    // replay: committed id appends nothing
    AnnIndex.extendPq(arriving, stored, pq, s"$path/pq", 0L, 4, 16)
    assert(AnnIndex.readPq(spark, s"$path/pq").codes.count() ==
      before + arriving.count(), "replay appended rows")
    val ledger = spark.read.parquet(BatchManifest.path(store))
    assert(ledger.filter(col("batch_id") === 0L).count() == 1L)
  }

  test("nprobe partition pruning survives the (cid, batch_id) " +
    "layout: a one-cid probe reads only that cid's directories") {
    val (path, stored, arriving) = freshIndex()
    AnnIndex.extend(arriving, stored, path, batchId = 0L)
    val reread = AnnIndex.read(spark, path)
    val oneCid = reread.assignments.filter(col("cid") === 3)
    oneCid.collect()
    val scan = oneCid.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("cid"), s"no partition filter surfaced:\n$scan")
    // physical proof: the scan's selected partitions carry cid=3 only
    val parts = oneCid.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray
          .map(_.filePath.toString).toSeq
      }.flatten
    assert(parts.nonEmpty && parts.forall(_.contains("cid=3")),
      s"scan read outside cid=3:\n${parts.take(5).mkString("\n")}")
  }
}
