package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twin of the banded SimHash near-dup: the gate's
  * kept-set must equal an INDEPENDENT brute-force hamming ≤ 3 probe
  * of the same signatures (the pigeonhole band trick is an
  * implementation detail the spec must not share), and extend-mode
  * must gate later micro-batches against earlier arrivals. */
class SimhashGateStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  /** (doc_id → packed 64-bit signature) via collect — the spec-side
    * reference is driver-local brute force, deliberately nothing
    * like the engine's banded plan. */
  private def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    LlmQueries.simhashSignOf(df).collect().map { r =>
      val v = (0 until 4).map(k => r.getLong(1 + k))
      r.getLong(0) -> v.foldLeft(0L)((acc, b) => (acc << 16) | b)
    }.toMap

  test("probe-only gate keeps exactly the brute-force hamming<=3 " +
    "complement across two micro-batches") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val stored = docs.filter(!expr(LlmQueries.arrivingShardPred))
    val arriving = docs.filter(expr(LlmQueries.arrivingShardPred))

    val storePath = tmp("shgate-store")
    LlmQueries.simhashSignOf(stored)
      .write.mode("overwrite").parquet(storePath)

    val dir = tmp("shgate-in")
    val mid = 500L
    writeShard(arriving.filter(col("doc_id") < mid), dir, "shard0")
    writeShard(arriving.filter(col("doc_id") >= mid), dir, "shard1")

    val out = tmp("shgate-out")
    val q = DocsStream.startSimhashGate(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      storePath, out, tmp("shgate-ckpt"))
    q.awaitTermination()

    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent reference: driver-local all-pairs hamming
    val storeSigs = sigs(stored).values.toSeq
    val expected = sigs(arriving).collect {
      case (id, s)
          if !storeSigs.exists(t =>
            java.lang.Long.bitCount(s ^ t) <= 3) => id
    }.toSet
    assert(kept == expected && kept.nonEmpty)
    // the gate genuinely dropped near-dups (the corpus has exact
    // duplicates across the shard split: hamming 0)
    val arrivingIds = sigs(arriving).keySet
    assert(kept != arrivingIds)
  }

  test("extendStore gates a later micro-batch against an earlier " +
    "arrival; replay through a fresh checkpoint is a no-op") {
    val s = spark
    import s.implicits._
    val t = "uniform victor whiskey xray yankee zulu alpha"
    val storePath = tmp("shext-store")
    // an EXTENDABLE store must be born in the ledger layout
    BatchManifest.initStore(LlmQueries.simhashSignOf(
      Seq((1L, "a stored corpus document of entirely different words"))
        .toDF("doc_id", "text")), storePath)

    val dir = tmp("shext-in")
    // shard0: novel doc 200; shard1: 300 duplicates 200 verbatim
    // (hamming 0 — only catchable via the extended store), 301 novel
    writeShard(Seq((200L, t)).toDF("doc_id", "text"), dir, "shard0",
      ageMs = 60000L)
    writeShard(Seq((300L, t), (301L, "some genuinely novel arriving " +
      "text with many other words")).toDF("doc_id", "text"), dir, "shard1")

    val out = tmp("shext-out")
    val q = DocsStream.startSimhashGate(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1))
        .select("doc_id", "text"),
      storePath, out, tmp("shext-ckpt"), extendStore = true)
    q.awaitTermination()

    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(200L, 301L)) // 300 gated by batch-0's 200
    val storedIds = spark.read.parquet(storePath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 200L, 301L))

    // RETRY SAFETY: at-least-once replay must not duplicate out rows
    // or store signatures, and the self-match guard must keep the
    // replayed docs from gating against their own stored signatures
    val q2 = DocsStream.startSimhashGate(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1))
        .select("doc_id", "text"),
      storePath, out, tmp("shext-ckpt2"), extendStore = true)
    q2.awaitTermination()
    val keptRows = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    assert(keptRows.sorted == Seq(200L, 301L),
      s"replay duplicated: $keptRows")
    val sigCounts = spark.read.parquet(storePath)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigCounts.values.forall(_ == 1L),
      s"replay duplicated store rows: $sigCounts")
  }
}
