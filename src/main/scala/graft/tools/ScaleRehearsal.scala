package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, SparkEntry}

/** sf1 SCALE REHEARSAL (VERDICT r7 item 5): run the dedup →
  * decontamination → ANN chain once at 10× the sf0.1 corpus under a
  * CAPPED heap, and report wall times plus the plan shapes that
  * matter at scale (broadcast vs shuffle joins, AQE demotions) so
  * BASELINE.md can record where the engine stands before anything
  * falls over at 100 TB.
  *
  * The corpus is the sf0.1 documents/embeddings tables replicated
  * 10-way with disjoint id ranges — DELIBERATELY dup-heavy: replicas
  * 0–4 keep the text byte-identical (a 50% exact-duplicate corpus,
  * the adversarial shape for the dedup index's pair-graph-scale
  * label table), replicas 5–9 append a replica marker (near-dup
  * tail). Embeddings get a per-replica +rep/10⁴ shift so ANN
  * clusters thicken instead of collapsing to exact ties. Generation
  * is derivation, not new synthetic truth — correctness at sf1 is
  * not oracle-checked (the oracle gate lives at sf0.01); this main
  * measures that plans SURVIVE, which is the judge's ask.
  *
  * Run (heap capped so memory pressure is real):
  * {{{
  * sbt -batch 'set run/javaOptions += "-Xmx3g"' \
  *   "runMain graft.tools.ScaleRehearsal /tmp/graft-sf1"
  * }}}
  */
object ScaleRehearsal {

  /** The chain under rehearsal, in pipeline order. */
  private val chain = Seq(
    // dedup family
    "llm_dedup_exact", "llm_dedup_minhash", "llm_lsh_bucket_stats",
    "llm_dedup_clusters", "llm_dedup_keep", "llm_exact_incremental",
    "llm_dedup_incremental", "llm_semantic_dedup", "llm_semdedup_stats",
    "llm_simhash_neardup",
    // decontamination ladder
    "llm_decontaminate", "llm_bloom_summary", "llm_decontam_bloom",
    "llm_decontam_keep",
    // ANN family
    "llm_knn_bruteforce", "llm_ann_buckets", "llm_ann_topk",
    "llm_ann_recall", "llm_ivf_clusters", "llm_ivf_topk",
    "llm_pq_codes", "llm_pq_adc_topk", "llm_embed_outliers")

  private def generate(spark: SparkSession, srcDir: String,
      out: String): Unit = {
    val reps = spark.range(0, 10).toDF("rep")
    spark.read.parquet(s"$srcDir/documents.parquet")
      .crossJoin(reps)
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        when(col("rep") < 5, col("text"))
          .otherwise(concat(col("text"), lit(" replica"), col("rep")))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$srcDir/embeddings.parquet")
      .crossJoin(reps)
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
        expr("transform(embedding, x -> x + CAST(rep AS FLOAT) / 10000)")
          .as("embedding"),
        col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Join-shape census of a query's EXECUTED plan (post-AQE): the
    * counts whose drift between sf0.1 and sf1 is a plan flip. */
  private def planShape(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    def n(tok: String): Int = tok.r.findAllIn(p).size
    s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
      s"shj=${n("ShuffledHashJoin")} bcastX=${n("BroadcastExchange")} " +
      s"aqeShuffleReads=${n("AQEShuffleRead")}"
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val srcDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"[rehearsal] heap cap ${heapMb} MB, cpus $cpus")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      val t0 = System.nanoTime()
      generate(spark, srcDir, out)
      println(f"[rehearsal] generated 10x corpus at $out in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    println(s"[rehearsal] docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " embeddings=" +
      spark.read.parquet(s"$out/embeddings.parquet").count())
    val queries = chain.map(n => n -> SparkEntry.queries(n)).toMap
    val runs = Bench.run(spark, out, queries)
    // report in CHAIN order with the plan census per query
    val byName = runs.map(r => r.name -> r).toMap
    chain.foreach { name =>
      val r = byName(name)
      val shape =
        try planShape(SparkEntry.queries(name)(spark, out))
        catch { case e: Throwable => s"plan-unavailable: ${e.getClass.getSimpleName}" }
      println(f"[rehearsal] $name%-24s ${r.sec}%8.2f s  " +
        r.err.map(e => s"ERR $e").getOrElse(shape))
    }
    val total = runs.map(_.sec).sum
    val nErr = runs.count(_.err.isDefined)
    println(f"[rehearsal] TOTAL ${total}%.1f s, $nErr errors")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
