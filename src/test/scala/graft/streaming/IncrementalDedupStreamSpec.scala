package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{DedupIndex, LlmQueries}

/** Streaming twin of cross-snapshot incremental dedup: micro-batched
  * arrival over the SAME stored index must keep exactly the batch
  * query's kept-set, and extend-mode must dedup later micro-batches
  * against earlier arrivals. */
class IncrementalDedupStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** Write `df` into `dir` as a single shard file named `name`.
    * `ageMs` pushes the file's mtime into the past so the file
    * source's modification-time ordering is deterministic (older
    * shards form earlier micro-batches). */
  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("probe-only stream over two micro-batches keeps exactly the " +
    "batch kept-set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val indexPath = tmp("incdedup-idx")
    DedupIndex.writeIndex(spark,
      docs.filter(!expr(LlmQueries.arrivingShardPred)), indexPath)

    val dir = tmp("incdedup-in")
    val arriving = docs.filter(expr(LlmQueries.arrivingShardPred))
    val mid = 500L
    writeShard(arriving.filter(col("doc_id") < mid), dir, "shard0")
    writeShard(arriving.filter(col("doc_id") >= mid), dir, "shard1")

    val out = tmp("incdedup-out")
    val q = DocsStream.startIncrementalDedup(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      s"$indexPath/bands", out, tmp("incdedup-ckpt"))
    q.awaitTermination()

    val streamedKept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchKept = LlmQueries.queries("llm_dedup_incremental")(spark, sf)
      .filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedKept == batchKept && streamedKept.nonEmpty)
    // and the probe actually dropped something
    val arrivingIds = arriving.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(streamedKept != arrivingIds)
  }

  test("extendIndex dedups a later micro-batch against an earlier " +
    "arrival's kept docs") {
    val s = spark
    import s.implicits._
    val t = "november oscar papa quebec romeo sierra tango"
    val indexPath = tmp("incext-idx")
    DedupIndex.writeIndex(spark,
      Seq((1L, "some indexed corpus text entirely different words"))
        .toDF("doc_id", "text"), indexPath)

    val dir = tmp("incext-in")
    // shard0: novel doc 200; shard1: doc 300 duplicates 200 (both
    // arriving — nothing in the index matches either)
    writeShard(Seq((200L, t)).toDF("doc_id", "text"), dir, "shard0",
      ageMs = 60000L)
    writeShard(Seq((300L, t), (301L, "an actually novel arriving text " +
      "with many distinct words")).toDF("doc_id", "text"), dir, "shard1")

    val out = tmp("incext-out")
    val q = DocsStream.startIncrementalDedup(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1))
        .select("doc_id", "text"),
      s"$indexPath/bands", out, tmp("incext-ckpt"), extendIndex = true)
    q.awaitTermination()

    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(200L, 301L)) // 300 deduped against batch-0's 200
    // and 200's bands were appended to the index on disk, with the
    // stored-index schema (own id as cluster label)
    val idxBands = spark.read.parquet(s"$indexPath/bands")
    assert(idxBands.columns.toSeq ==
      DedupIndex.bandColumns :+ "batch_id") // + the extend ledger col
    val idxDocs = idxBands
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs.contains(200L) && !idxDocs.contains(300L))

    // RETRY SAFETY: replay the same shards through a FRESH checkpoint
    // (foreachBatch is at-least-once — a replay must be a no-op):
    // no duplicate out rows, no duplicate index bands, and the
    // self-match guard must not drop the replayed docs as duplicates
    // of their own appended bands
    val q2 = DocsStream.startIncrementalDedup(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1))
        .select("doc_id", "text"),
      s"$indexPath/bands", out, tmp("incext-ckpt2"), extendIndex = true)
    q2.awaitTermination()
    val keptRows = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    assert(keptRows.sorted == Seq(200L, 301L), s"replay duplicated: $keptRows")
    val bandRows = spark.read.parquet(s"$indexPath/bands")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bandRows.values.forall(_ == 4L),
      s"replay duplicated index bands: $bandRows")
  }
}
