package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Pipeline, TestSpark}
import graft.config.EtlConf
import graft.rdf.{TripleFixture, Vocab}

/** Streaming CDC subscriber: a mirror snapshot maintained by
  * [[CdcStream.startApply]] must track the publisher's snapshot
  * through multiple runs, catch up incrementally on restart, and
  * tolerate redelivered run partitions. */
class CdcStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def res(df: DataFrame): Pipeline.Result =
    Pipeline.Result(df, EtlConf.fromEnv(Map.empty), Map.empty)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("subscriber snapshot tracks the publisher across runs and restarts") {
    val base = Files.createTempDirectory("cdc-stream").toFile.getAbsolutePath
    val snap = s"$base/pub-snapshot"
    val log = s"$base/changes"
    val mirror = s"$base/mirror"
    val ckpt = s"$base/ckpt"

    val v1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val v2 = v1.filter(col("predicate") =!= Vocab.OmekaResourceTemplate)
      .localCheckpoint()
    val v3 = v2.withColumn("obj_value",
        when(col("predicate") === Vocab.DctermsTitle &&
          col("subject") === "http://ex.org/item/1",
          concat(col("obj_value"), lit(" rev3")))
          .otherwise(col("obj_value")))
      .localCheckpoint()

    // two runs published, then the subscriber catches up in one go
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    CdcStream.startApply(spark, log, mirror, ckpt).awaitTermination()
    assert(rows(spark.read.parquet(mirror)) == rows(v2))

    // third run lands; a restarted subscriber applies ONLY the delta
    Pipeline.publishDelta(res(v3), snap, log, "run3")
    CdcStream.startApply(spark, log, mirror, ckpt).awaitTermination()
    assert(rows(spark.read.parquet(mirror)) ==
      rows(spark.read.parquet(snap)))
    assert(rows(spark.read.parquet(mirror)) == rows(v3))
  }

  test("redelivered run partition is a no-op on the mirror") {
    val base = Files.createTempDirectory("cdc-redeliver")
      .toFile.getAbsolutePath
    val snap = s"$base/pub-snapshot"
    val log = s"$base/changes"
    val mirror = s"$base/mirror"

    val v1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val v2 = v1.filter(col("predicate") =!= Vocab.OmekaIsPublic)
      .localCheckpoint()
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    CdcStream.startApply(spark, log, mirror, s"$base/ckpt1")
      .awaitTermination()
    assert(rows(spark.read.parquet(mirror)) == rows(v2))

    // a fresh checkpoint re-delivers EVERY partition onto the
    // already-caught-up mirror — the fold must be idempotent
    CdcStream.startApply(spark, log, mirror, s"$base/ckpt2")
      .awaitTermination()
    assert(rows(spark.read.parquet(mirror)) == rows(v2))
  }

  test("merge-on-read mirror: delta-sized batches, threshold " +
      "compaction, read view tracks the publisher") {
    val base = Files.createTempDirectory("cdc-mor").toFile.getAbsolutePath
    val snap = s"$base/pub-snapshot"
    val log = s"$base/changes"
    val mirror = s"$base/mirror"
    val ckpt = s"$base/ckpt"

    val v1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val v2 = v1.filter(col("predicate") =!= Vocab.OmekaResourceTemplate)
      .localCheckpoint()
    val v3 = v2.filter(col("predicate") =!= Vocab.OmekaIsPublic)
      .localCheckpoint()
    val v4 = v3.withColumn("obj_value",
        when(col("predicate") === Vocab.DctermsTitle &&
          col("subject") === "http://ex.org/item/1",
          concat(col("obj_value"), lit(" rev4")))
          .otherwise(col("obj_value")))
      .localCheckpoint()

    def drain(): Unit = CdcStream
      .startMirror(spark, log, mirror, ckpt, compactEvery = 3)
      .awaitTermination()
    def baseExists: Boolean = new java.io.File(s"$mirror/base").exists()
    def runParts: Int = Option(new java.io.File(s"$mirror/delta").list())
      .map(_.count(_.startsWith("run_id="))).getOrElse(0)

    // two runs: below the threshold — NO base fold happened, the
    // mirror holds only delta-sized run partitions, and the read
    // view already tracks the publisher
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    drain()
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    drain()
    assert(!baseExists, "base written before the compaction threshold")
    assert(runParts == 2)
    assert(rows(CdcStream.readMirror(spark, mirror)) == rows(v2))

    // third run crosses the threshold: compaction folds the log into
    // an atomic-swap base and drops the folded partitions
    Pipeline.publishDelta(res(v3), snap, log, "run3")
    drain()
    assert(baseExists)
    assert(runParts == 0)
    assert(rows(CdcStream.readMirror(spark, mirror)) == rows(v3))
    assert(rows(spark.read.parquet(s"$mirror/base")) == rows(v3))

    // post-compaction run: delta-sized again, base untouched, read
    // view = base + retained log
    val baseMtime = new java.io.File(s"$mirror/base").lastModified()
    Pipeline.publishDelta(res(v4), snap, log, "run4")
    drain()
    assert(runParts == 1)
    assert(new java.io.File(s"$mirror/base").lastModified() == baseMtime,
      "a non-compacting batch rewrote the base")
    assert(rows(CdcStream.readMirror(spark, mirror)) == rows(v4))
    assert(rows(CdcStream.readMirror(spark, mirror)) ==
      rows(spark.read.parquet(snap)))
  }

  test("merge-on-read mirror: redelivered retained-log rows collapse " +
      "in the read fold") {
    val base = Files.createTempDirectory("cdc-mor-redeliver")
      .toFile.getAbsolutePath
    val snap = s"$base/pub-snapshot"
    val log = s"$base/changes"
    val mirror = s"$base/mirror"

    val v1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val v2 = v1.filter(col("predicate") =!= Vocab.OmekaIsPublic)
      .localCheckpoint()
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    CdcStream.startMirror(spark, log, mirror, s"$base/ckpt1",
      compactEvery = 100).awaitTermination()
    assert(rows(CdcStream.readMirror(spark, mirror)) == rows(v2))

    // a fresh checkpoint re-appends EVERY partition's rows into the
    // retained log; the per-triple group-by collapses the duplicates
    CdcStream.startMirror(spark, log, mirror, s"$base/ckpt2",
      compactEvery = 100).awaitTermination()
    assert(rows(CdcStream.readMirror(spark, mirror)) == rows(v2))
  }

  test("atomic-swap publish survives a simulated crash window " +
      "(healSwap restores the .old backup)") {
    val base = Files.createTempDirectory("cdc-swap").toFile.getAbsolutePath
    val path = s"$base/snap"
    val df1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .limit(10).localCheckpoint()
    val df2 = df1.withColumn("obj_value", concat(col("obj_value"), lit("!")))
      .localCheckpoint()

    Pipeline.atomicReplace(df1, path)
    assert(rows(spark.read.parquet(path)) == rows(df1))
    Pipeline.atomicReplace(df2, path)
    assert(rows(spark.read.parquet(path)) == rows(df2))
    assert(!new java.io.File(s"$path.tmp").exists(), ".tmp left behind")
    assert(!new java.io.File(s"$path.old").exists(), ".old left behind")

    // simulate the crash landing between the two renames: live dir
    // gone, .old present
    assert(new java.io.File(path).renameTo(new java.io.File(s"$path.old")))
    Pipeline.healSwap(spark, path)
    assert(rows(spark.read.parquet(path)) == rows(df2),
      "healSwap did not restore the backup")
  }
}
