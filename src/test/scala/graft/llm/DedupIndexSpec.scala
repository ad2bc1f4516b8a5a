package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stored-index side of incremental dedup: row-local signatures
  * must equal the explode/groupBy spelling, and the probe must give
  * kept/dropped verdicts with the matched index cluster. */
class DedupIndexSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def realDocs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")

  test("signatures equal an independent row-local HOF spelling") {
    // independent oracle: all 8 lane minima in ONE aggregate() pass
    // over the sha256'd shingles — no explode, no groupBy (slower,
    // interpreted, but structurally unrelated to the shipped path)
    val initFields = (1 to 8).map(j => s"'h$j', 'g'").mkString(", ")
    val stepFields = (1 to 8).map(j =>
      s"'h$j', least(a.h$j, substring(h, ${(j - 1) * 8 + 1}, 8))")
      .mkString(", ")
    val agg =
      s"""aggregate(transform(sh, x -> sha2(x, 256)),
         |named_struct($initFields),
         |(a, h) -> named_struct($stepFields))""".stripMargin
    val rowLocal = realDocs
      .select(col("doc_id"), LlmQueries.tokenExpr.as("w"))
      .withColumn("sh", expr(LlmQueries.shingle3Expr))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(array(expr(agg))).as("m"))
      .select(col("doc_id") +:
        (1 to 8).map(j => col(s"m.h$j").as(s"h$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(j => r.getString(j)).mkString("|")).toMap
    val shipped = DedupIndex.signatures(realDocs)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(j => r.getString(j)).mkString("|")).toMap
    assert(shipped == rowLocal && shipped.nonEmpty)
  }

  test("probe: duplicate of an indexed pair lands in its cluster, " +
    "novel and too-short docs are kept") {
    val s = spark
    import s.implicits._
    val t = "alpha beta gamma delta epsilon zeta"
    // index: docs 1/2 are copies (a pair, cluster rep 1); doc 5 alone
    val indexDocs = Seq(
      (1L, t), (2L, t), (5L, "one unrelated document about rivers here"))
      .toDF("doc_id", "text")
    // arriving: 100 duplicates the 1/2 cluster; 101 is novel; 102 has
    // no 3-gram shingle (2 words)
    val arriving = Seq(
      (100L, t), (101L, "completely fresh words never indexed at all"),
      (102L, "too short")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("dedup-idx").toFile.getAbsolutePath
    val stored = DedupIndex.writeIndex(spark, indexDocs, path)
    // the artifact is real parquet on disk
    assert(new java.io.File(s"$path/bands").exists())
    assert(new java.io.File(s"$path/clusters").exists())
    val got = DedupIndex.probe(arriving, stored)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (100L, "dropped", 1L), (101L, "kept", -1L), (102L, "kept", -1L)))
  }

  test("exact incremental probe drops a byte-identical arrival with " +
    "its index representative (crafted corpus — testdata has no " +
    "exact dupes)") {
    val s = spark
    import s.implicits._
    val t = "the very same normalized text appears twice"
    val dir = Files.createTempDirectory("exact-inc").toFile.getAbsolutePath
    // index shard: ids with id % 10 != 7; arriving: id % 10 == 7.
    // 3 and 13 are index-side copies (rep = 3); 17 arrives as another
    // copy; 27 arrives novel; 37 arrives as a WHITESPACE variant of t
    // (normalization must still match)
    Seq(
      (3L, t, "en", "web", 10L), (13L, t, "en", "web", 10L),
      (5L, "completely different index text here", "en", "web", 10L),
      (17L, t, "en", "web", 10L),
      (27L, "a novel arriving text nothing matches", "en", "web", 10L),
      (37L, "  THE very   same normalized text appears twice ", "en",
        "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.queries("llm_exact_incremental")(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (17L, "dropped", 3L), (37L, "dropped", 3L), (27L, "kept", -1L)))
  }

  test("probe fallback (probeBroadcast=false): bit-equal verdicts, " +
    "no BroadcastExchange anywhere in the plan") {
    val s = spark
    val path = Files.createTempDirectory("dedup-idx-sf").toFile.getAbsolutePath
    val indexDocs = realDocs.filter(col("doc_id") % 10 =!= 7)
    val arriving = realDocs.filter(col("doc_id") % 10 === 7)
    val stored = DedupIndex.writeIndex(s, indexDocs, path)
    def verdicts(df: DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val viaBroadcast = verdicts(DedupIndex.probe(arriving, stored))
    val adaptiveBcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prevAdaptive = s.conf.getOption(adaptiveBcast)
    try {
      s.conf.set(DedupIndex.probeBroadcastConf, "false")
      // forbid AQE's runtime small-side conversion too: the spec is
      // that the fallback never NEEDS a broadcast
      s.conf.set(adaptiveBcast, "-1")
      val df = DedupIndex.probe(arriving, stored)
      val viaShuffle = verdicts(df)
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"fallback probe still broadcasts:\n$plan")
      assert(plan.contains("ShuffledHashJoin"), plan)
    } finally {
      s.conf.unset(DedupIndex.probeBroadcastConf)
      prevAdaptive match {
        case Some(v) => s.conf.set(adaptiveBcast, v)
        case None => s.conf.unset(adaptiveBcast)
      }
    }
  }

  test("AUTO probe shape (no conf set): a shard past the broadcast " +
    "budget plans no BroadcastExchange; a small shard keeps the " +
    "broadcast shape; an explicit conf overrides the measurement") {
    val s = spark
    val path = Files.createTempDirectory("dedup-idx-auto")
      .toFile.getAbsolutePath
    val indexDocs = realDocs.filter(col("doc_id") % 10 =!= 7)
    val arriving = realDocs.filter(col("doc_id") % 10 === 7)
    val stored = DedupIndex.writeIndex(s, indexDocs, path)
    val bcastThr = "spark.sql.autoBroadcastJoinThreshold"
    val adaptiveBcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prevThr = s.conf.getOption(bcastThr)
    val prevAdaptive = s.conf.getOption(adaptiveBcast)
    assert(s.conf.getOption(DedupIndex.probeBroadcastConf).isEmpty)
    try {
      // small shard, default budget: the auto path measures ~50 docs
      // × 384 B ≪ 10 MB and keeps the broadcast shape
      val small = DedupIndex.probe(arriving, stored)
      small.collect()
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      // shrink the budget so the SAME shard exceeds it: the auto
      // path must flip to shuffle-hash with no conf set at all
      s.conf.set(bcastThr, "1KB")
      s.conf.set(adaptiveBcast, "-1")
      val large = DedupIndex.probe(arriving, stored)
      large.collect()
      val plan = large.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"auto probe still broadcasts past the budget:\n$plan")
      assert(plan.contains("ShuffledHashJoin"), plan)
      // explicit override beats the measurement
      s.conf.set(DedupIndex.probeBroadcastConf, "true")
      val forced = DedupIndex.probe(arriving, stored)
      forced.collect()
      assert(forced.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
    } finally {
      s.conf.unset(DedupIndex.probeBroadcastConf)
      Seq((bcastThr, prevThr), (adaptiveBcast, prevAdaptive)).foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }

  test("index build joins labels without a broadcast (shuffle-hash " +
    "on doc_id): a dup-heavy corpus's pair-graph-scale label table " +
    "must never OOM the build") {
    val s = spark
    import s.implicits._
    val t = "alpha beta gamma delta epsilon zeta"
    // every doc a duplicate → label table has one row PER DOC (the
    // adversarial shape: pair-graph-scale == corpus-scale)
    val docs = (1L to 40L).map(i => (i, t)).toDF("doc_id", "text")
    val path = Files.createTempDirectory("dedup-idx-b").toFile.getAbsolutePath
    val sig = DedupIndex.signatures(docs)
    val bands = DedupIndex.bandsOf(sig)
    // assert on the REAL build plan: capture the bands->labels join by
    // rebuilding the final write input exactly as writeIndexSig does
    LlmQueries.ccFromPairs(LlmQueries.clusterEdges(sig))
      .write.mode("overwrite").parquet(s"$path/clusters")
    val labels = s.read.parquet(s"$path/clusters")
      .select(col("doc_id").as("l_id"), col("cluster_id"))
    val buildJoin = bands
      .join(labels.hint("shuffle_hash"), col("doc_id") === col("l_id"), "left")
    buildJoin.collect()
    val plan = buildJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"index build still broadcasts the label table:\n$plan")
    // and the end-to-end artifact is still correct on this corpus
    val stored = DedupIndex.writeIndex(s, docs, path)
    val lbls = stored.bands.select("doc_id", "lbl").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lbls.size == 40 && lbls.values.forall(_ == 1L))
  }

  test("clusterEdges is component-equal to the clique pair graph on " +
    "real data: identical CC labels from both edge sets") {
    val sig = DedupIndex.signatures(realDocs)
    def labels(edges: DataFrame): Map[Long, Long] =
      LlmQueries.ccFromPairs(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaClique = labels(LlmQueries.pairsFromBands(DedupIndex.bandsOf(sig)))
    val viaStars = labels(LlmQueries.clusterEdges(sig))
    assert(viaStars == viaClique && viaStars.nonEmpty)
  }

  test("clusterEdges: a k-clone group contributes k-1 star edges, " +
    "not a k(k-1)/2 clique, and labels still collapse to the min id") {
    val s = spark
    import s.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    // 200 byte-identical clones (ids 1..200) + 3 distinct docs: the
    // clique form would emit 19 900 pairs for the clone group alone
    val docs = ((1L to 200L).map(i => (i, t)) ++ Seq(
      (301L, "one unrelated document about rivers flowing north"),
      (302L, "another unrelated document about glaciers and ice"),
      (303L, "a third unrelated document regarding deserts")))
      .toDF("doc_id", "text")
    val sig = DedupIndex.signatures(docs)
    val edges = LlmQueries.clusterEdges(sig)
    val nEdges = edges.count()
    // 199 stars + banded pairs over the 4 distinct signatures (≤ 6)
    assert(nEdges >= 199 && nEdges <= 205, s"edge count $nEdges")
    val lbls = LlmQueries.ccFromPairs(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach(i => assert(lbls(i) == 1L, s"doc $i"))
    // The raw clique spelling DIVERGES here by design: 200 clones
    // overflow the 64-member bucket cap, the salt splits the bucket,
    // and the clique CC fractures the clone group into one cluster
    // per salt cell — the stars keep hamming-0 clones one component
    // regardless of the guard. This asymmetry is exactly why the
    // clustering consumer collapses before pairing.
    val clique = LlmQueries.ccFromPairs(
      LlmQueries.pairsFromBands(DedupIndex.bandsOf(sig)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 200L).map(clique).distinct.size > 1,
      "expected the salted clique to fracture the over-cap clone group")
  }

  test("llm_dedup_incremental covers exactly the arriving shard and " +
    "drops only docs with an index band match") {
    val out = LlmQueries.queries("llm_dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val arrivingIds = realDocs.filter(expr(LlmQueries.arrivingShardPred))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == arrivingIds && out.length == arrivingIds.size)
    // verdict/cluster coherence: dropped => a real index doc id as
    // cluster (not in the arriving shard); kept => -1
    out.foreach { case (id, v, cl) =>
      if (v == "kept") assert(cl == -1L)
      else assert(cl >= 0L && !arrivingIds.contains(cl), s"doc $id")
    }
  }
}
