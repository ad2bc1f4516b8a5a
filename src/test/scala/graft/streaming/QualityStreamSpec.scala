package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.RelationalQueries

/** The streaming quality monitor: micro-batched maintenance must
  * equal the batch expectation suite over all shards regardless of
  * the split — INCLUDING a key duplicated ACROSS shards, the
  * non-additive case only the mirror can catch — and full
  * redelivery must not double-count the additive constraints. */
class QualityStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def ord(rows: Seq[(Long, Long, String, Double, Timestamp,
      String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
  }

  test("micro-batched metrics == batch suite; redelivery is a " +
      "no-op; a cross-shard duplicate key lands via the mirror") {
    val s = spark
    import s.implicits._
    val cust = Seq(10L, 11L).toDF("c_custkey")
    val shard0 = Seq(
      (1L, 10L, "O", 100.0, t0, "1-URGENT"),
      (2L, 10L, "F", 200.0, t0, "2-HIGH"),
      (3L, 99L, "O", 300.0, t0, "3-MEDIUM"), // dangling custkey
      (4L, 10L, "X", 400.0, t0, "4-NOT SPEC")) // bad status
    val shard1 = Seq(
      (5L, 11L, "P", -1.0, t0, "5-LOW"),     // below range
      (6L, 11L, "O", 500.0, null.asInstanceOf[Timestamp], "1-URGENT"),
      (6L, 11L, "F", 600.0, t0, ""))         // dup key + empty prio
    val dir = tmp("qual-in")
    writeShard(ord(shard0), dir, "shard0", ageMs = 90000L)
    writeShard(ord(shard1), dir, "shard1", ageMs = 60000L)

    val metrics = tmp("qual-metrics") + "/metrics"
    val keys = tmp("qual-keys") + "/keys"
    val ckpt = tmp("qual-ckpt")
    QualityStream.startQualityMonitor(
      QualityStream.orders(spark, dir, maxFilesPerTrigger = Some(1)),
      cust, metrics, keys, ckpt).awaitTermination()

    def truthOf(all: Seq[(Long, Long, String, Double, Timestamp,
        String)]) = rows(RelationalQueries.expectationsOf(ord(all), cust))
    val truth = truthOf(shard0 ++ shard1)
    assert(rows(QualityStream.readMetrics(spark, metrics)) === truth)
    // the batch suite really sees the seeded faults
    assert(truth.exists(r => r.head == "orders.o_orderkey.unique" &&
      r(2) == 1L))

    // full redelivery through a fresh checkpoint: the stored batch
    // id skips every replayed batch — counters don't double
    QualityStream.startQualityMonitor(
      QualityStream.orders(spark, dir, maxFilesPerTrigger = Some(1)),
      cust, metrics, keys, tmp("qual-ckpt2")).awaitTermination()
    assert(rows(QualityStream.readMetrics(spark, metrics)) === truth)

    // LATE shard duplicating key 1 from shard0 — invisible to any
    // batch-local uniqueness count, caught by the key mirror — plus
    // one clean row; same lineage continues
    val late = Seq(
      (1L, 11L, "O", 700.0, t0, "2-HIGH"),
      (9L, 10L, "F", 800.0, t0, "3-MEDIUM"))
    writeShard(ord(late), dir, "shard2")
    QualityStream.startQualityMonitor(
      QualityStream.orders(spark, dir, maxFilesPerTrigger = Some(1)),
      cust, metrics, keys, ckpt).awaitTermination()
    val truth2 = truthOf(shard0 ++ shard1 ++ late)
    assert(rows(QualityStream.readMetrics(spark, metrics)) === truth2)
    // the late duplicate moved the uniqueness row specifically
    assert(truth2.exists(r => r.head == "orders.o_orderkey.unique" &&
      r(2) == 2L))
  }
}
