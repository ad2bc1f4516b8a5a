package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{AnnIndex, LlmQueries}

/** Streaming twin of the incremental ANN probe: micro-batched
  * arrival over the SAME stored IVF index must produce exactly the
  * batch query's top-k rows, extend-mode must let later micro-batches
  * find earlier arrivals, and a replay must be a no-op. */
class AnnProbeStreamSpec extends AnyFunSuite {

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

  private def quantize(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), expr(LlmQueries.quantizeExpr).as("qv"))

  test("probe-only stream over two micro-batches reproduces the " +
    "batch incremental probe exactly") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexPath = tmp("annidx")
    AnnIndex.write(spark,
      quantize(emb.filter(!expr(LlmQueries.arrivingVecPred))),
      indexPath, 16, 4)

    val dir = tmp("ann-in")
    val arriving = emb.filter(expr(LlmQueries.arrivingVecPred))
    writeShard(arriving.filter(col("vec_id") < 250), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("vec_id") >= 250), dir, "shard1")

    val out = tmp("ann-out")
    val q = DocsStream.startAnnProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, out, tmp("ann-ckpt"))
    q.awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("vec_id"), col("rank").cast("int"),
        col("ip"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val streamed = rows(spark.read.parquet(out))
    val batch = rows(
      LlmQueries.queries("llm_ivf_incremental")(spark, sf))
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("drift monitor: per-shard stats equal the batch drift frame " +
    "for the same shard, keyed by batch id; replay is a no-op") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexPath = tmp("anndrift-idx")
    val stored = AnnIndex.write(spark,
      quantize(emb.filter(!expr(LlmQueries.arrivingVecPred))),
      indexPath, 16, 4)
    val arriving = emb.filter(expr(LlmQueries.arrivingVecPred))
    val dir = tmp("anndrift-in")
    writeShard(arriving.filter(col("vec_id") < 250), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("vec_id") >= 250), dir, "shard1")
    val stats = tmp("anndrift-stats")
    DocsStream.startAnnDriftMonitor(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, stats, tmp("anndrift-ckpt")).awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val streamed0 = rows(spark.read.parquet(stats)
      .filter(col("batch_id") === 0).drop("batch_id"))
    val batch0 = rows(AnnIndex.drift(stored,
      quantize(arriving.filter(col("vec_id") < 250))))
    assert(streamed0 == batch0 && streamed0.nonEmpty)
    val n = spark.read.parquet(stats).count()
    // at-least-once replay through a fresh checkpoint: no new rows
    DocsStream.startAnnDriftMonitor(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, stats, tmp("anndrift-ckpt2")).awaitTermination()
    assert(spark.read.parquet(stats).count() == n,
      "replay appended drift rows")
  }

  test("extendIndex lets a later micro-batch find an earlier " +
    "arrival, and a replay is a no-op") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexPath = tmp("annext-idx")
    AnnIndex.write(spark,
      quantize(emb.filter(!expr(LlmQueries.arrivingVecPred))),
      indexPath, 16, 4)

    // shard1 contains an EXACT COPY of a shard0 vector under a new
    // id — with extend, its best stored neighbor must be that copy
    // (self-inner-product is maximal for these near-orthogonal
    // embeddings)
    val v7 = emb.filter(col("vec_id") === 7L)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val s = spark
    import s.implicits._
    val dir = tmp("annext-in")
    writeShard(emb.filter(col("vec_id") === 7L), dir, "shard0",
      ageMs = 60000L)
    writeShard(Seq((100007L, v7)).toDF("vec_id", "embedding"),
      dir, "shard1")

    val out = tmp("annext-out")
    val q = DocsStream.startAnnProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, out, tmp("annext-ckpt"), extendIndex = true)
    q.awaitTermination()

    val top1 = spark.read.parquet(out)
      .filter(col("q_id") === 100007L && col("rank") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(7L),
      s"the copy's nearest stored neighbor should be the original: $top1")
    // both arrivals were appended to the inverted lists exactly once
    val counts = spark.read.parquet(s"$indexPath/assignments")
      .filter(col("vec_id").isin(7L, 100007L))
      .groupBy("vec_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(7L -> 1L, 100007L -> 1L), counts.toString)

    // RETRY SAFETY: replay through a fresh checkpoint — no duplicate
    // out rows, no duplicate index rows, no self-matches
    val q2 = DocsStream.startAnnProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, out, tmp("annext-ckpt2"), extendIndex = true)
    q2.awaitTermination()
    val outCounts = spark.read.parquet(out)
      .groupBy("q_id", "rank").count()
      .filter(col("count") > 1).count()
    assert(outCounts == 0L, "replay duplicated probe results")
    val idxCounts = spark.read.parquet(s"$indexPath/assignments")
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(idxCounts == 0L, "replay duplicated index assignments")
    val selfMatch = spark.read.parquet(out)
      .filter(col("q_id") === col("vec_id")).count()
    assert(selfMatch == 0L, "a vector matched itself")
  }

  test("IVFPQ stream over two micro-batches reproduces the batch " +
    "incremental ADC probe exactly; extend-mode appends codes to " +
    "both stored layers and a replay is a no-op") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val indexPath = tmp("pqidx")
    val stored = AnnIndex.write(spark,
      quantize(emb.filter(!expr(LlmQueries.arrivingVecPred))),
      indexPath, 16, 4)
    val pqPath = s"$indexPath/pq"
    AnnIndex.writePq(spark, stored, pqPath, 4, 16, 16)

    val dir = tmp("pq-in")
    val arriving = emb.filter(expr(LlmQueries.arrivingVecPred))
    writeShard(arriving.filter(col("vec_id") < 250), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("vec_id") >= 250), dir, "shard1")

    val out = tmp("pq-out")
    val q = DocsStream.startIvfpqProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, pqPath, out, tmp("pq-ckpt"))
    q.awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("vec_id"), col("rank").cast("int"),
        col("ip"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val streamed = rows(spark.read.parquet(out))
    val batch = rows(
      LlmQueries.queries("llm_ivfpq_incremental")(spark, sf))
    assert(streamed == batch && streamed.nonEmpty)

    // extend-mode: both stored layers grow by the shard, ledgered
    val out2 = tmp("pq-out2")
    val q2 = DocsStream.startIvfpqProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, pqPath, out2, tmp("pq-ckpt2"), extendIndex = true)
    q2.awaitTermination()
    val nArr = arriving.count()
    val nIdx = AnnIndex.read(spark, indexPath).assignments
      .filter(expr(LlmQueries.arrivingVecPred)).count()
    val nPq = AnnIndex.readPq(spark, pqPath).codes
      .filter(expr(LlmQueries.arrivingVecPred)).count()
    assert(nIdx == nArr, s"IVF layer holds $nIdx of $nArr arrivals")
    assert(nPq == nArr, s"PQ layer holds $nPq of $nArr arrivals")
    // replay through a fresh checkpoint: no duplicates anywhere
    val q3 = DocsStream.startIvfpqProbe(
      DocsStream.embeddings(spark, dir, maxFilesPerTrigger = Some(1)),
      indexPath, pqPath, out2, tmp("pq-ckpt3"), extendIndex = true)
    q3.awaitTermination()
    assert(AnnIndex.readPq(spark, pqPath).codes
      .groupBy("vec_id").count().filter(col("count") > 1).count() == 0L,
      "replay duplicated code rows")
    assert(spark.read.parquet(out2).groupBy("q_id", "rank").count()
      .filter(col("count") > 1).count() == 0L,
      "replay duplicated probe results")
  }
}
