package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline

/** Streaming CONNECTED-COMPONENT maintenance — the streaming twin of
  * [[graft.queries.RelationalQueries.componentsIncremental]]: edges
  * arrive in micro-batches, component membership stays current at
  * delta cost, and NOTHING node-scale is ever rewritten.
  *
  * The state is two artifacts with deliberately different write
  * disciplines:
  *
  *  - `labels` — an APPEND-ONLY node WAL: each node is written ONCE,
  *    when first seen, with itself as its contraction-time
  *    representative (identity-initialized). Immutable thereafter.
  *  - `remap` — a COMPONENT-scale (representative → current
  *    representative) table, atomically swapped per batch. A node's
  *    current component is `remap(labels(node))` with identity
  *    default — reads compose the two, writes never touch the node
  *    table again.
  *
  * Per batch: endpoints map through labels∘remap (delta-keyed joins
  * — the delta side broadcasts onto one pass of each artifact),
  * converged CC runs on the CONTRACTED delta-sized graph
  * ([[graft.llm.LlmQueries.ccFromPairsChk]]), and the remap folds
  * the merge in at component scale.
  *
  * Crash-exactness here needs NO batch bookkeeping — the update is
  * ALGEBRAICALLY idempotent (the [[FrontierStream]] discipline):
  * identity-initialized label rows change nothing if a crash leaves
  * them ahead of the remap (the endpoint map falls back to identity
  * either way), and a REDELIVERED batch contracts every edge to a
  * self-loop under the already-updated remap, so the merge is a
  * fixed point. Representatives stay min-node-ids under contraction,
  * so the maintained rollup is bit-equal to a from-scratch CC over
  * everything delivered (spec-pinned). */
object ComponentsStream {

  /** Schema of arriving edge shards (canonical or not — the
    * maintainer orients nothing; CC is undirected). */
  val schema: StructType = StructType(Seq(
    StructField("a", LongType),
    StructField("b", LongType)))

  /** Streaming edge table over a directory of parquet shards. */
  def edges(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  private def readOr(spark: SparkSession, path: String,
      empty: => DataFrame): DataFrame =
    Artifacts.readParquet(spark, path).getOrElse(empty)

  /** Start the maintainer: `labelsPath` the append-only node WAL,
    * `remapPath` the component-scale current-representative table. */
  def startComponentMaintenance(eds: DataFrame, labelsPath: String,
      remapPath: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    eds.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Pipeline.healSwap(spark, remapPath)
        val labels = readOr(spark, labelsPath,
          spark.range(0).select(col("id").as("node"),
            col("id").as("rep0")))
        val remap = readOr(spark, remapPath,
          spark.range(0).select(col("id").as("rep"),
            col("id").as("cur")))
        // 1. first-seen nodes append to the WAL, identity-labeled
        //    (append-before-merge is safe: identity rows are inert)
        val nodes = batch.select(col("a").as("node"))
          .union(batch.select(col("b").as("node"))).distinct()
        nodes.join(labels, Seq("node"), "left_anti")
          .withColumn("rep0", col("node"))
          .write.mode("append").parquet(labelsPath)
        val labelsNow = readOr(spark, labelsPath,
          spark.range(0).select(col("id").as("node"),
            col("id").as("rep0")))
        // 2. endpoints → current representatives (labels ∘ remap)
        def curOf(side: String): DataFrame = labelsNow
          .join(remap, col("rep0") === col("rep"), "left")
          .select(col("node").as(side),
            coalesce(col("cur"), col("rep0")).as(s"c_$side"))
        val contracted = batch
          .join(curOf("a"), Seq("a"))
          .join(curOf("b"), Seq("b"))
          .select(least(col("c_a"), col("c_b")).as("doc_a"),
            greatest(col("c_a"), col("c_b")).as("doc_b"))
          .distinct()
        // 3. converged CC on the contracted delta graph
        val (chk, m0) = graft.llm.LlmQueries.ccFromPairsChk(contracted)
        val m = m0.select(col("doc_id").as("cnode"),
          col("cluster_id").as("merged"))
        // 4. fold the merge into the remap at component scale:
        //    existing entries re-point through m; contracted nodes
        //    without an entry gain one when the merge moved them
        val kept = remap.join(m, col("cur") === col("cnode"), "left")
          .select(col("rep"),
            coalesce(col("merged"), col("cur")).as("cur"))
        val added = m
          .join(remap.select(col("rep")),
            col("cnode") === col("rep"), "left_anti")
          .filter(col("cnode") =!= col("merged"))
          .select(col("cnode").as("rep"), col("merged").as("cur"))
        Pipeline.atomicReplace(kept.unionByName(added), remapPath)
        org.apache.spark.sql.graftshim.ColumnBridge
          .freeLocalCheckpoint(chk)
        ()
      }
      .trigger(trigger).start()

  /** The maintained membership (node → component) — labels ∘ remap,
    * identity default. */
  def readMembership(spark: SparkSession, labelsPath: String,
      remapPath: String): DataFrame = {
    Pipeline.healSwap(spark, remapPath)
    val labels = readOr(spark, labelsPath,
      spark.range(0).select(col("id").as("node"),
        col("id").as("rep0")))
    val remap = readOr(spark, remapPath,
      spark.range(0).select(col("id").as("rep"),
        col("id").as("cur")))
    labels.join(remap, col("rep0") === col("rep"), "left")
      .select(col("node"),
        coalesce(col("cur"), col("rep0")).as("component_id"))
  }

  /** The maintained rollup (component → size), the batch operator's
    * output shape. */
  def readComponents(spark: SparkSession, labelsPath: String,
      remapPath: String): DataFrame =
    readMembership(spark, labelsPath, remapPath)
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("component_id"))
}
