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
}
