package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The artifact-read discipline ([[Artifacts.readParquet]]): only a
  * genuinely MISSING path is "first batch, empty state"; a corrupt
  * artifact must fail loudly — a maintainer that silently treats
  * corruption as a fresh start loses its accumulated state. */
class ArtifactsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("missing path → None; present artifact → its rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("artifacts").toString
    assert(Artifacts.readParquet(spark, s"$dir/nope").isEmpty)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$dir/t")
    val got = Artifacts.readParquet(spark, s"$dir/t")
    assert(got.isDefined && got.get.count() == 2)
  }

  test("a corrupt artifact propagates instead of masquerading as " +
    "first-batch empty state") {
    val dir = Files.createTempDirectory("artifacts-bad").toString
    Files.createDirectory(Paths.get(s"$dir/t"))
    Files.write(Paths.get(s"$dir/t/part-00000.parquet"),
      "this is not parquet".getBytes("US-ASCII"))
    intercept[Exception] {
      Artifacts.readParquet(spark, s"$dir/t").get.collect()
    }
  }

  // ---- BatchManifest ledger compaction ----

  import org.apache.spark.sql.functions._

  private def freshStore(tag: String): String = {
    val store = Files.createTempDirectory(tag).toString + "/store"
    val df = spark.range(4).select(col("id").as("k"),
      (col("id") % 2).cast("int").as("cid"))
    BatchManifest.initStore(df, store, Seq("cid"))
    store
  }

  private def extendBatch(store: String, b: Long): Unit = {
    val df = spark.range(2).select((col("id") + 100 * b).as("k"),
      (col("id") % 2).cast("int").as("cid"))
    BatchManifest.writeBatch(df, store, b, Seq("cid"))
    BatchManifest.commit(spark, store, b)
  }

  test("compaction: the committed view is IDENTICAL before and " +
    "after, and a contiguous ledger of N batches reads ONE row") {
    val store = freshStore("bm-compact")
    for (b <- 0L until 8L) extendBatch(store, b)
    def view = BatchManifest.committedOnly(spark, store,
      spark.read.parquet(store)).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    val before = view
    assert(spark.read.parquet(BatchManifest.path(store)).count() == 8L)
    BatchManifest.compact(spark, store)
    assert(spark.read.parquet(BatchManifest.path(store)).count() == 1L,
      "contiguous ledger must compact to one high-water row")
    assert(view == before, "compaction changed the committed view")
    for (b <- 0L until 8L)
      assert(BatchManifest.applied(spark, store, b),
        s"batch $b lost its committed status")
    assert(!BatchManifest.applied(spark, store, 8L))
    // a later extend nests cleanly on the compacted ledger
    extendBatch(store, 8L)
    assert(BatchManifest.applied(spark, store, 8L))
    assert(view == before ++ Seq(800L, 801L))
  }

  test("compaction with a GAP: ids above the first gap stay as " +
    "exception rows and uncommitted ids in the gap stay invisible") {
    val store = freshStore("bm-gap")
    for (b <- Seq(0L, 1L, 2L, 5L)) extendBatch(store, b)
    // an orphan (uncommitted) batch 3 in the gap
    BatchManifest.writeBatch(
      spark.range(2).select((col("id") + 300).as("k"),
        (col("id") % 2).cast("int").as("cid")), store, 3L, Seq("cid"))
    BatchManifest.compact(spark, store)
    // hw = 2, exception = {5}: two ledger rows
    assert(spark.read.parquet(BatchManifest.path(store)).count() == 2L)
    assert(BatchManifest.applied(spark, store, 2L))
    assert(!BatchManifest.applied(spark, store, 3L),
      "an orphan inside the gap must stay uncommitted")
    assert(!BatchManifest.applied(spark, store, 4L))
    assert(BatchManifest.applied(spark, store, 5L))
    val ks = BatchManifest.committedOnly(spark, store,
      spark.read.parquet(store)).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(!ks.contains(300L) && !ks.contains(301L),
      "orphan rows leaked through the compacted committed view")
    assert(ks.contains(500L) && ks.contains(501L))
  }

  test("compaction keeps the partition-filter property: the " +
    "committed view scans with batch_id in partitionFilters only") {
    val store = freshStore("bm-prune")
    for (b <- 0L until 3L) extendBatch(store, b)
    BatchManifest.compact(spark, store)
    val view = BatchManifest.committedOnly(spark, store,
      spark.read.parquet(store))
    view.collect()
    val scans = view.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(
      _.references.exists(_.name == "batch_id"))),
      "compacted committedOnly must still prune partitions")
    assert(scans.forall(!_.dataFilters.exists(
      _.references.exists(_.name == "batch_id"))),
      "batch_id leaked into data filters (a data scan)")
  }

  test("a crash between the compaction renames heals on the next " +
    "ledger read (promote .next), losing nothing") {
    val store = freshStore("bm-crash")
    for (b <- 0L until 4L) extendBatch(store, b)
    BatchManifest.compact(spark, store)
    // simulate the crash window: a NEW complete .next exists and the
    // live ledger is gone (between rename 1 and rename 2)
    val p = BatchManifest.path(store)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(hp, new org.apache.hadoop.fs.Path(s"$p.next"))
    assert(!fs.exists(hp))
    for (b <- 0L until 4L)
      assert(BatchManifest.applied(spark, store, b),
        s"heal lost batch $b")
    assert(fs.exists(hp), "the promote rename did not heal the swap")
  }

  test("commits auto-compact past the threshold: a long-running " +
    "stream's ledger stays O(threshold), not O(#batches)") {
    val store = freshStore("bm-auto")
    val n = BatchManifest.CompactThreshold + 10
    for (b <- 0L until n.toLong) extendBatch(store, b)
    val rows = spark.read.parquet(BatchManifest.path(store)).count()
    assert(rows <= 16L,
      s"ledger should have auto-compacted, has $rows rows")
    for (b <- 0L until n.toLong)
      assert(BatchManifest.applied(spark, store, b))
    assert(BatchManifest.committedOnly(spark, store,
      spark.read.parquet(store)).count() == 4L + 2L * n)
  }
}
