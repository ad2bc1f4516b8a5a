package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming RDFS-entailment maintenance — the materialized-
  * inference view kept current as instance shards land. Every ρdf
  * rule is per-instance-triple (no rule joins two instance triples),
  * so a micro-batch's deductive closure against the STABLE ontology
  * (the memoized chain-closure artifacts) is exactly its
  * contribution to the full closure: per-batch cost proportional to
  * the batch, the existing entailment table never re-derived — the
  * streaming form of `rdf_rdfs_incremental`.
  *
  * Set semantics are MERGE-ON-READ (the [[CdcStream]] mirror
  * discipline): per-batch appends are batch-local only; conclusions
  * derivable from instances in DIFFERENT batches can coincide (two
  * dom/range chains meeting at the same class), so [[readEntailed]]
  * applies the set dedup. At-least-once safe: appends carry the
  * deriving instance id (`src_k`) and anti-join the out table's ids,
  * so a replayed batch writes nothing (the [[DocsStream]] retry
  * guard).
  */
object RdfStream {

  /** Schema of the instance shards (the `part`-derived `(k, v)`
    * frame the entailment core consumes). */
  val instanceSchema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType)))

  /** Streaming instance table over a directory of parquet shards. */
  def instances(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(instanceSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Start the maintenance stream: each micro-batch of arriving
    * instances is entailed against snapshot `ontologyDir`'s
    * (memoized, broadcast) ontology and appended to `outPath`. */
  def startEntailMaintenance(src: DataFrame, ontologyDir: String,
      outPath: String, checkpointLocation: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val out = graft.rdf.RdfQueries
          .entailInstances(spark, ontologyDir, batch)
          .distinct() // batch-local set semantics
        val seen = Artifacts.readParquet(spark, outPath)
          .map(_.select(col("src_k").as("s_k")).distinct())
          .getOrElse(spark.emptyDataFrame
            .withColumn("s_k", lit(0L)).limit(0))
        out.join(seen, col("src_k") === col("s_k"), "left_anti")
          .write.mode("append").parquet(outPath)
        ()
      }
      .trigger(trigger).start()

  /** The maintained entailment view: merge-on-read set dedup over
    * the appended batches — equal to the batch closure of every
    * instance that has arrived, regardless of the shard split. */
  def readEntailed(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
      .select(col("subject"), col("predicate"), col("obj"))
      .distinct()
}
