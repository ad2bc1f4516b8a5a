package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Pipeline, TestSpark}
import graft.config.EtlConf
import graft.rdf.{TripleFixture, Vocab}

/** READ CONSISTENCY of the merge-on-read mirror across a compaction
  * swap: a reader whose plan straddles [[CdcStream.startMirror]]'s
  * fold-and-swap must never observe a TORN state. The contract has
  * two legs, proven here:
  *
  *  1. NO-OP RE-FOLD — folding already-compacted run partitions
  *     onto the post-compaction base reproduces the base exactly.
  *     This is the invariant that makes every swap-crossing
  *     interleaving consistent: a reader that captured the OLD
  *     delta listing but lands on the NEW base folds redundant
  *     changes onto a base that already contains them (adds match
  *     existing rows, removes target absent rows — the same
  *     highest-run-id argmax either way).
  *  2. CONSISTENT-OR-LOUD — a [[CdcStream.readMirror]] plan built
  *     BEFORE the compaction, executed AFTER it, either throws
  *     (the old base/delta files were swapped away mid-scan — a
  *     retryable FileNotFound-class failure, never silent) or
  *     returns exactly one of the two consistent states
  *     (pre-compaction or post-compaction view).
  *
  * Writer-side serialization stays single-writer (healSwap's
  * documented discipline); this spec is about READERS, which take
  * no locks. */
class CdcMirrorConsistencySpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def res(df: DataFrame): Pipeline.Result =
    Pipeline.Result(df, EtlConf.fromEnv(Map.empty), Map.empty)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("re-folding already-compacted run partitions onto the new " +
      "base is a no-op — the invariant behind swap-crossing reads") {
    val dir = Files.createTempDirectory("cdc-refold").toFile.getAbsolutePath
    val snap = s"$dir/pub-snapshot"
    val log = s"$dir/changes"
    val mirror = s"$dir/mirror"
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
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    Pipeline.publishDelta(res(v3), snap, log, "run3")

    CdcStream.startMirror(spark, log, mirror, s"$dir/ckpt",
      compactEvery = 3).awaitTermination()
    assert(new java.io.File(s"$mirror/base").exists())
    assert(Option(new java.io.File(s"$mirror/delta").list())
      .forall(_.count(_.startsWith("run_id=")) == 0))

    // replay the publisher's change log (the exact rows that were
    // folded) onto the post-compaction base: must be a no-op
    val newBase = spark.read.parquet(s"$mirror/base")
    val foldedAgain = Pipeline.applyLog(Some(newBase),
      spark.read.option("basePath", log).parquet(log))
    assert(rows(foldedAgain) == rows(newBase))
    assert(rows(newBase) == rows(v3))
  }

  test("a readMirror plan built before a compaction swap is " +
      "consistent-or-loud when executed after it — never torn") {
    val dir = Files.createTempDirectory("cdc-straddle")
      .toFile.getAbsolutePath
    val snap = s"$dir/pub-snapshot"
    val log = s"$dir/changes"
    val mirror = s"$dir/mirror"
    val v1 = TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val v2 = v1.filter(col("predicate") =!= Vocab.OmekaIsPublic)
      .localCheckpoint()
    val v3 = v2.filter(col("predicate") =!= Vocab.OmekaResourceTemplate)
      .localCheckpoint()

    // two runs land, no compaction yet: the mirror view is pure log
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    CdcStream.startMirror(spark, log, mirror, s"$dir/ckpt",
      compactEvery = 3).awaitTermination()
    val preView = rows(CdcStream.readMirror(spark, mirror))
    assert(preView == rows(v2))

    // build (but do not execute) the reader's plan
    val straddling = CdcStream.readMirror(spark, mirror)

    // third run crosses the threshold: fold + atomic swap + folded
    // partitions dropped — the files the plan captured are gone
    Pipeline.publishDelta(res(v3), snap, log, "run3")
    CdcStream.startMirror(spark, log, mirror, s"$dir/ckpt",
      compactEvery = 3).awaitTermination()
    val postView = rows(CdcStream.readMirror(spark, mirror))
    assert(postView == rows(v3))

    // executing the stale plan: loud failure or a consistent state
    val outcome =
      try Right(rows(straddling))
      catch { case e: Throwable => Left(e) }
    outcome match {
      case Right(got) =>
        assert(got == preView || got == postView,
          "straddling reader returned a state that is neither the " +
            "pre- nor the post-compaction snapshot — torn read")
      case Left(e) =>
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(8).toSeq
        assert(chain.exists(c =>
          c.isInstanceOf[java.io.FileNotFoundException] ||
            c.getMessage != null &&
            (c.getMessage.contains("FileNotFound") ||
              c.getMessage.contains("does not exist"))),
          s"straddling reader failed with a non-file-listing error: $e")
    }
  }
}
