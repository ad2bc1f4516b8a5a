package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** First-batch-vs-corruption discipline for streaming state
  * artifacts (label WALs, remap tables, stored indexes, probe
  * mirrors): "the artifact isn't there yet" is the ONLY condition a
  * maintainer may treat as empty state. A blanket
  * `catch AnalysisException` also swallows schema mismatches and
  * corrupt parquet footers — which would silently replace
  * accumulated state with a fresh start, the worst possible failure
  * mode for an incremental view. So existence is checked explicitly
  * on the path's own filesystem, and every OTHER read failure
  * propagates loudly. */
object Artifacts {

  /** True when `path` holds any artifact content: it exists and —
    * if a directory — contains at least one DATA file anywhere
    * under it. A bare directory is what a writer or tempdir helper
    * creates BEFORE the first commit, and `_SUCCESS` markers /
    * `_temporary` staging / dot-files are metadata Spark readers
    * ignore — all still first-batch, not content. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    if (fs.getFileStatus(p).isFile) return true
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def hasData(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists { st =>
        !hidden(st.getPath.getName) &&
          (st.isFile || hasData(st.getPath))
      }
    hasData(p)
  }

  /** The parquet artifact at `path`, or None only when the path
    * does not exist / has no files yet (first batch); corruption
    * and schema errors propagate. */
  def readParquet(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None
}

/** Per-batch replay ledger for APPEND-maintained stores — the
  * O(delta) replacement for "anti-join the arriving rows against the
  * whole store" replay guards, which cost a corpus-scale scan per
  * micro-batch append at 100 TB.
  *
  * Discipline (the exactly-once append protocol every extend path
  * shares):
  *
  *  1. [[applied]]: read the ledger (one row per COMMITTED batch —
  *     bounded by batch count, never by corpus size). Present →
  *     the whole batch is a no-op.
  *  2. Data write: the batch's rows are stamped `batch_id = K` and
  *     written with DYNAMIC partition overwrite on a `batch_id`
  *     partition column — a crash-replayed attempt REPLACES its own
  *     partial leaf directories (the write is deterministic per
  *     batch), so the data write is idempotent without reading the
  *     store at all.
  *  3. [[commit]]: append the one-row ledger record. The ledger row
  *     is the commit point — a crash between 2 and 3 re-runs 2,
  *     which heals by overwrite.
  *
  * The ledger lives at `<store>/_manifest`: Spark/Hadoop file
  * listings skip `_`-prefixed names, so readers of the store never
  * see ledger rows, while an explicit read of the subdirectory
  * still works. Ledger keys are the `foreachBatch` batch ids, so
  * the guard is scoped to one checkpoint lineage per store — the
  * same contract as the sketch stores' batch-id dedup. */
object BatchManifest {

  def path(store: String): String = s"$store/_manifest"

  /** Ledger rows at or above this count trigger an automatic
    * [[compact]] after a commit — so a high-frequency micro-batch
    * stream's ledger, driver id set and `batch_id` IN-list all stay
    * O(threshold + gaps) instead of O(#batches) forever. */
  val CompactThreshold = 64

  /** The ledger as (batch_id, hw) rows. `hw = true` marks ONE
    * high-water row meaning "every id ≤ batch_id is committed";
    * `hw = false` rows are individually committed ids (the
    * exceptions above the high-water mark). Ledgers written before
    * compaction existed carry only `batch_id` — read as all
    * exceptions. Heals a crashed [[compact]] swap on read: when the
    * ledger directory is missing but a complete `.next` exists, the
    * promote rename is completed here (idempotent — the build is
    * finished before the first rename ever runs). */
  private def ledger(spark: SparkSession, store: String)
      : Option[DataFrame] = {
    val p = path(store)
    if (!Artifacts.exists(spark, p) &&
        Artifacts.exists(spark, s"$p.next")) {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(s"$p.next"), hp)
      fs.delete(new org.apache.hadoop.fs.Path(s"$p.old"), true)
    }
    Artifacts.readParquet(spark, p).map { df =>
      if (df.columns.contains("hw")) df
      else df.select(org.apache.spark.sql.functions.col("batch_id"),
        org.apache.spark.sql.functions.lit(false).as("hw"))
    }
  }

  /** The committed set as (high-water mark, exception ids above it).
    * Driver-bounded: rows = 1 high-water + post-compaction
    * exceptions, capped by [[CompactThreshold]] between commits. */
  private def committedState(spark: SparkSession, store: String)
      : (Long, Set[Long]) =
    ledger(spark, store) match {
      case None => (InitBatch, Set.empty[Long])
      case Some(df) =>
        val rows = df.collect()
        val hw = rows.filter(_.getBoolean(1)).map(_.getLong(0))
          .foldLeft(InitBatch)(math.max)
        (hw, rows.filter(r => !r.getBoolean(1) && r.getLong(0) > hw)
          .map(_.getLong(0)).toSet)
    }

  /** Has batch `batchId` committed to `store`? One bounded read of
    * the ledger (rows ≤ threshold + gaps, never batch count after
    * compaction), never a store scan. */
  def applied(spark: SparkSession, store: String, batchId: Long): Boolean = {
    val (hw, ids) = committedState(spark, store)
    batchId <= hw || ids.contains(batchId)
  }

  /** Record batch `batchId` as committed to `store`; auto-compacts
    * once the ledger exceeds [[CompactThreshold]] rows. Single
    * writer per store (the `foreachBatch` serialization contract
    * every streaming artifact already holds). */
  def commit(spark: SparkSession, store: String, batchId: Long): Unit = {
    spark.range(1)
      .select(org.apache.spark.sql.functions.lit(batchId).as("batch_id"),
        org.apache.spark.sql.functions.lit(false).as("hw"))
      .write.mode("append").parquet(path(store))
    if (ledger(spark, store).exists(_.count() >= CompactThreshold))
      compact(spark, store)
  }

  /** Compact contiguous committed prefixes into ONE high-water row:
    * the new mark extends the old one through every consecutive id
    * present, ids above the first gap stay as exception rows. The
    * committed SET is identical before and after — only its
    * representation shrinks (a ledger of N contiguous batches reads
    * one row after compaction). Crash-safe: the replacement ledger
    * is built COMPLETELY under `.next`, then swapped by two renames
    * (the established atomic-swap discipline); a crash between the
    * renames is healed by [[ledger]]'s promote-on-read. Must not
    * run concurrently with a [[commit]] to the same store — the
    * single-writer contract above. */
  def compact(spark: SparkSession, store: String): Unit = {
    val (hw0, ids) = committedState(spark, store)
    var hw = hw0
    while (ids.contains(hw + 1)) hw += 1
    val except = ids.filter(_ > hw).toSeq.sorted
    val p = path(store)
    val rows = (hw, true) +: except.map((_, false))
    spark.createDataFrame(rows).toDF("batch_id", "hw")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$p.next")
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hpath(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.delete(hpath(s"$p.old"), true)
    if (fs.exists(hp))
      require(fs.rename(hp, hpath(s"$p.old")),
        s"ledger compaction: could not retire $p")
    require(fs.rename(hpath(s"$p.next"), hp),
      s"ledger compaction: could not promote $p.next")
    fs.delete(hpath(s"$p.old"), true)
  }

  /** The idempotent data write of step 2: stamp `batch_id` and
    * dynamically overwrite this batch's own leaf partitions.
    * `partitionCols` precede `batch_id` on disk (e.g. the ANN
    * index keeps `cid` outermost so inverted-list partition pruning
    * stays physical). */
  def writeBatch(df: DataFrame, store: String, batchId: Long,
      partitionCols: Seq[String] = Nil): Unit =
    df.withColumn("batch_id",
        org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy((partitionCols :+ "batch_id"): _*)
      .parquet(store)

  /** The batch id extended stores stamp on their BACKFILL rows:
    * stream batch ids are ≥ 0, so a restarted checkpoint's batch 0
    * can never collide with the build. */
  val InitBatch: Long = -1L

  /** One-time backfill of an extendable store: same layout as
    * [[writeBatch]] (so later extends nest cleanly) under
    * [[InitBatch]], FULL overwrite (a build replaces the store), no
    * ledger record (the ledger tracks extend batches only). */
  def initStore(df: DataFrame, store: String,
      partitionCols: Seq[String] = Nil): Unit =
    df.withColumn("batch_id",
        org.apache.spark.sql.functions.lit(InitBatch))
      .write.mode("overwrite")
      .partitionBy((partitionCols :+ "batch_id"): _*)
      .parquet(store)

  /** The store restricted to COMMITTED rows: the backfill plus every
    * ledger-recorded batch. An extend that crashed between its data
    * write and its ledger commit leaves orphan partitions; a retry
    * that PROBES the store before re-extending must not see them, or
    * the retry's probe verdicts (and thus its healed rewrite) would
    * diverge from the first attempt's. The filter is `batch_id ≤
    * high-water OR batch_id IN (exceptions)` — both partition
    * pruning on `batch_id`, never a data scan; the driver set is
    * compaction-bounded (O(threshold + gaps), not O(#batches)). */
  def committedOnly(spark: SparkSession, store: String,
      df: DataFrame): DataFrame =
    if (!df.columns.contains("batch_id")) df // plain, never-extended store
    else {
      val (hw, ids) = committedState(spark, store)
      val c = org.apache.spark.sql.functions.col("batch_id")
      val base = c <= hw // InitBatch (−1) is always ≤ the mark
      df.filter(
        if (ids.isEmpty) base
        else base || c.isin(ids.toSeq: _*))
    }
}
