package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.EtlConf

/** [[Pipeline.compactDelta]]: folding change partitions up to a
  * checkpoint into a base snapshot must preserve the bootstrap
  * EXACTLY (bootstrap-from-compacted == bootstrap-from-full-log ==
  * the latest published snapshot), survive last-change-wins
  * sequences (add → remove → re-add across runs), and be
  * retry-idempotent across the crash window between the base write
  * and the partition deletes. */
class PipelineCompactionSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def res(df: DataFrame): Pipeline.Result =
    Pipeline.Result(df, EtlConf.fromEnv(Map.empty), Map.empty)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  test("compactDelta: bootstrap-from-compacted == bootstrap-from-full" +
    " == latest snapshot, through add→remove→re-add sequences; " +
    "retry across the crash window is a no-op") {
    val root = Files.createTempDirectory("pub-compact")
    val base = root.toFile.getAbsolutePath
    val snap = s"$base/snapshot"
    val log = s"$base/changes"
    val compacted = s"$base/compacted-base"
    val v1 = rdf.TripleFixture.triples(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    // run2 removes the is-public rows; run3 re-ADDS them (last-change-
    // wins must resurface rows whose latest change is 'added') and
    // removes the resource-template rows instead
    val v2 = v1.filter(col("predicate") =!= rdf.Vocab.OmekaIsPublic)
      .localCheckpoint()
    val v3 = v1.filter(col("predicate") =!= rdf.Vocab.OmekaResourceTemplate)
      .localCheckpoint()
    Pipeline.publishDelta(res(v1), snap, log, "run1")
    Pipeline.publishDelta(res(v2), snap, log, "run2")
    Pipeline.publishDelta(res(v3), snap, log, "run3")
    val expected = rows(v3)
    // full-log replay from empty (no base written yet)
    assert(rows(Pipeline.bootstrapFromLog(spark, s"$base/nope", log))
      == expected)
    // keep the full pre-compaction log for the equivalence check,
    // and the to-be-folded partitions for the crash-window replay
    val fullLog = s"$base/changes-full"
    copyDir(Paths.get(log), Paths.get(fullLog))

    Pipeline.compactDelta(spark, log, compacted, "run2")
    val partsAfter = Paths.get(log).toFile.listFiles()
      .map(_.getName).filter(_.startsWith("run_id=")).toSet
    assert(partsAfter == Set("run_id=run3"))
    // the base holds exactly the fold of runs 1–2
    assert(rows(spark.read.parquet(compacted)) == rows(v2))
    // bootstrap equivalence: compacted base + remaining log ==
    // full-log replay == latest snapshot
    assert(rows(Pipeline.bootstrapFromLog(spark, compacted, log))
      == expected)
    assert(rows(Pipeline.bootstrapFromLog(spark, s"$base/nope", fullLog))
      == expected)

    // crash window: base written, partition deletes lost — restore
    // the folded partitions and retry; the re-fold must be a no-op
    for (p <- Seq("run_id=run1", "run_id=run2"))
      copyDir(Paths.get(fullLog, p), Paths.get(log, p))
    Pipeline.compactDelta(spark, log, compacted, "run2")
    assert(Paths.get(log).toFile.listFiles()
      .map(_.getName).filter(_.startsWith("run_id=")).toSet
      == Set("run_id=run3"))
    assert(rows(spark.read.parquet(compacted)) == rows(v2))
    assert(rows(Pipeline.bootstrapFromLog(spark, compacted, log))
      == expected)
  }

  test("compactDelta on a missing log is a no-op; bootstrap with " +
    "neither base nor log throws") {
    val base = Files.createTempDirectory("pub-compact-empty")
      .toFile.getAbsolutePath
    Pipeline.compactDelta(spark, s"$base/changes", s"$base/b", "run9")
    assert(!Paths.get(s"$base/b").toFile.exists())
    intercept[IllegalArgumentException] {
      Pipeline.bootstrapFromLog(spark, s"$base/b", s"$base/changes")
    }
  }
}
