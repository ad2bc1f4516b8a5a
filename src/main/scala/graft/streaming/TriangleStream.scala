package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.queries.RelationalQueries

/** Streaming TRIANGLE-CENSUS maintenance — the streaming twin of
  * [[graft.queries.RelationalQueries.trianglesIncremental]]: order
  * lines arrive in micro-batches, the co-purchase edge table and the
  * triangle count stay current at delta cost.
  *
  * Two subtleties a naive maintainer gets wrong, both spec-pinned:
  *
  *  - pairs are PER-ORDER and an order's lines can straddle
  *    micro-batches — the cross-batch pairs exist in no single
  *    batch. So the batch's AFFECTED ORDERS re-derive their pairs
  *    from the FULL line mirror (the [[Scd2Stream]]
  *    recompute-from-history discipline); a line-level anti-join
  *    guards redelivery.
  *  - the census and the edge table are TWO artifacts, and a crash
  *    between their writes must neither lose nor double-count
  *    triangles. The edge table is the WRITE-AHEAD side: its rows
  *    carry the batch id that introduced them, edges swap FIRST,
  *    and a batch whose census write crashed leaves
  *    `max(edges.bid) > census.bid` — recovered on the next entry
  *    by RE-DERIVING that batch's census from its own edge rows
  *    (the delta is stored, the enumeration is idempotent). The
  *    census is always a pure function of the edge WAL.
  *
  * Per-batch cost: affected orders' lines + delta-keyed enumeration
  * against the posterior adjacency — never a corpus recount.
  * Single-writer, single lineage, like every maintainer. */
object TriangleStream {

  /** Schema of arriving line shards: the (l_orderkey, l_partkey)
    * projection the co-purchase rule needs. */
  val schema: StructType = StructType(Seq(
    StructField("ok", LongType),
    StructField("pk", LongType)))

  /** Streaming lines table over a directory of parquet shards. */
  def lines(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  private def edgesOf(spark: SparkSession, path: String): DataFrame =
    Artifacts.readParquet(spark, path).getOrElse(
      spark.range(0).select(col("id").as("a"), col("id").as("b"),
        col("id").as("bid")))

  private def censusOf(spark: SparkSession, path: String): DataFrame =
    Artifacts.readParquet(spark, path).getOrElse(
      spark.range(1).select(lit(-1L).as("bid"),
        lit(0L).as("n_triangles")))

  /** Re-derive the census for edge-WAL batch `bid` from the stored
    * rows themselves — the crash-recovery step AND the normal
    * publish step (they are the same computation, which is what
    * makes the recovery correct by construction). */
  private def publishCensus(spark: SparkSession, edgesPath: String,
      countPath: String, bid: Long, baseCount: Long): Unit = {
    val all = edgesOf(spark, edgesPath)
    val merged = RelationalQueries.trianglesMerge(
      spark.range(1).select(lit(baseCount).as("n_base")),
      all.filter(col("bid") < bid).select(col("a"), col("b")),
      all.filter(col("bid") === bid).select(col("a"), col("b")))
      .select(col("n_total")).head().getLong(0)
    Pipeline.atomicReplace(
      spark.range(1).select(lit(bid).as("bid"),
        lit(merged).as("n_triangles")),
      countPath)
  }

  /** Start the maintainer: `mirrorPath` accumulates lines,
    * `edgesPath` the batch-stamped canonical (a, b, bid) edge WAL,
    * `countPath` the 1-row (bid, n_triangles) census. */
  def startTriangleMaintenance(lns: DataFrame, mirrorPath: String,
      edgesPath: String, countPath: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    lns.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Pipeline.healSwap(spark, edgesPath)
        Pipeline.healSwap(spark, countPath)
        // recovery: a census older than the edge WAL means the
        // previous batch crashed between the two swaps — replay its
        // publish from the stored delta
        val c0 = censusOf(spark, countPath).head()
        val (cBid, cN) = (c0.getLong(0), c0.getLong(1))
        val maxBid = edgesOf(spark, edgesPath)
          .agg(max(col("bid"))).head() match {
            case r if r.isNullAt(0) => -1L
            case r => r.getLong(0)
          }
        if (maxBid > cBid)
          publishCensus(spark, edgesPath, countPath, maxBid, cN)
        // whole-batch redelivery guard: a census at (or past) this
        // batch id means both swaps landed — re-running would
        // re-enumerate the STORED delta and double-count
        val cNow = censusOf(spark, countPath).head()
        if (cNow.getLong(0) >= batchId) ()
        else applyBatch(spark, batch, batchId, mirrorPath,
          edgesPath, countPath)
        ()
      }
      .trigger(trigger).start()

  private def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, mirrorPath: String, edgesPath: String,
      countPath: String): Unit = {
        // 1. mirror append with the line-level retry guard
        val seen = Artifacts.readParquet(spark, mirrorPath)
          .map(_.select(col("ok").as("s_ok"), col("pk").as("s_pk")))
          .getOrElse(batch.limit(0)
            .select(col("ok").as("s_ok"), col("pk").as("s_pk")))
        batch.dropDuplicates("ok", "pk")
          .join(seen, col("ok") === col("s_ok") &&
            col("pk") === col("s_pk"), "left_anti")
          .write.mode("append").parquet(mirrorPath)
        // 2. affected orders' pairs from FULL mirrored history
        //    (cross-batch pairs included)
        val affected = batch.select(col("ok")).distinct()
        val hist = spark.read.parquet(mirrorPath)
          .join(affected, Seq("ok"), "left_semi")
        val pairs = hist.as("x").join(hist.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
          .distinct()
        // 3. grow the edge WAL first (batch-stamped), then publish
        val edges = edgesOf(spark, edgesPath)
        val delta = pairs
          .join(edges.select(col("a"), col("b")), Seq("a", "b"),
            "left_anti")
          .withColumn("bid", lit(batchId))
        Pipeline.atomicReplace(edges.unionByName(delta), edgesPath)
        val cAfter = censusOf(spark, countPath).head()
        publishCensus(spark, edgesPath, countPath, batchId,
          cAfter.getLong(1))
  }

  /** Read the maintained census (healing a torn swap first). */
  def readCensus(spark: SparkSession, countPath: String): DataFrame = {
    Pipeline.healSwap(spark, countPath)
    spark.read.parquet(countPath).select(col("n_triangles"))
  }
}
