package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.RelationalQueries

/** The streaming frontier maintainer: micro-batched maintenance must
  * land on the batch skyline of everything seen, independent of the
  * split; redelivery must be a no-op BY ALGEBRA (no bookkeeping to
  * get wrong); and a torn swap must heal on the next batch. */
class FrontierStreamSpec extends AnyFunSuite {

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

  private def cloud(n: Long): Seq[(Long, Long, Long)] =
    (0L until n).map(i => (i, (i * 37) % 101, (i * 53) % 103))

  test("micro-batched maintenance == batch skyline, any split; " +
      "redelivery through a fresh checkpoint is a no-op") {
    val s = spark
    import s.implicits._
    val pts = cloud(180)
    val dir = tmp("frontier-in")
    writeShard(pts.take(60).toDF("partkey", "cents", "size"),
      dir, "shard0", ageMs = 90000L)
    writeShard(pts.slice(60, 120).toDF("partkey", "cents", "size"),
      dir, "shard1", ageMs = 60000L)
    writeShard(pts.drop(120).toDF("partkey", "cents", "size"),
      dir, "shard2")

    val fp = tmp("frontier-art") + "/frontier"
    FrontierStream.startFrontierMaintenance(
      FrontierStream.points(spark, dir, maxFilesPerTrigger = Some(1)),
      fp, tmp("frontier-ckpt")).awaitTermination()

    val truth = rows(RelationalQueries.skylineOf(
      pts.toDF("partkey", "cents", "size")))
    assert(rows(FrontierStream.readFrontier(spark, fp)) === truth)
    assert(truth.nonEmpty)

    // redeliver EVERY shard through a fresh checkpoint: the frontier
    // absorbs them algebraically — no change, AS A MULTISET (a
    // set-only compare would hide duplicate-row corruption of the
    // stored artifact)
    FrontierStream.startFrontierMaintenance(
      FrontierStream.points(spark, dir, maxFilesPerTrigger = Some(1)),
      fp, tmp("frontier-ckpt2")).awaitTermination()
    val after = FrontierStream.readFrontier(spark, fp)
    assert(rows(after) === truth)
    assert(after.count() === truth.size.toLong,
      "replay duplicated frontier rows")
  }

  test("a torn swap (dest missing, .old present) heals before the " +
      "next fold") {
    val s = spark
    import s.implicits._
    val pts = cloud(80)
    val dir = tmp("frontier-in2")
    writeShard(pts.take(40).toDF("partkey", "cents", "size"),
      dir, "shard0", ageMs = 60000L)
    val fp = tmp("frontier-art2") + "/frontier"
    FrontierStream.startFrontierMaintenance(
      FrontierStream.points(spark, dir, maxFilesPerTrigger = Some(1)),
      fp, tmp("frontier-ckpt3")).awaitTermination()

    // simulate dying between delete(dest-as-old) and rename(tmp)
    val fs = new org.apache.hadoop.fs.Path(fp)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(fp),
      new org.apache.hadoop.fs.Path(fp + ".old")))

    writeShard(pts.drop(40).toDF("partkey", "cents", "size"),
      dir, "shard1")
    FrontierStream.startFrontierMaintenance(
      FrontierStream.points(spark, dir, maxFilesPerTrigger = Some(1)),
      fp, tmp("frontier-ckpt4")).awaitTermination()
    assert(rows(FrontierStream.readFrontier(spark, fp)) ===
      rows(RelationalQueries.skylineOf(
        pts.toDF("partkey", "cents", "size"))))
  }
}
