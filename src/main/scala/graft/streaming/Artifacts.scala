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

  /** Has batch `batchId` committed to `store`? One bounded read of
    * the ledger (rows = committed batches), never a store scan. */
  def applied(spark: SparkSession, store: String, batchId: Long): Boolean =
    Artifacts.readParquet(spark, path(store)).exists(m =>
      !m.filter(org.apache.spark.sql.functions
        .col("batch_id") === batchId).isEmpty)

  /** Record batch `batchId` as committed to `store`. */
  def commit(spark: SparkSession, store: String, batchId: Long): Unit =
    spark.range(1)
      .select(org.apache.spark.sql.functions.lit(batchId).as("batch_id"))
      .write.mode("append").parquet(path(store))

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
    * diverge from the first attempt's. The id set is ledger-sized
    * (driver-bounded) and the filter is partition pruning on
    * `batch_id` — never a data scan. */
  def committedOnly(spark: SparkSession, store: String,
      df: DataFrame): DataFrame =
    if (!df.columns.contains("batch_id")) df // plain, never-extended store
    else {
      val ids = Artifacts.readParquet(spark, path(store))
        .map(_.select("batch_id").collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long]) + InitBatch
      df.filter(org.apache.spark.sql.functions.col("batch_id")
        .isin(ids.toSeq: _*))
    }
}
