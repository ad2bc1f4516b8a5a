package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic invariants for the round-4 pipeline operators (their
  * exact values are pinned by the DuckDB oracle; these check the
  * properties that make the operators *meaningful*). */
class LlmExtrasSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = TestSpark.spark

  test("dedupExact collapses true copies (normalized) and nothing else") {
    // the synthetic corpus has no exact duplicates (500 docs → 500
    // keys), so the collapse path needs its own fixture: write a tiny
    // documents.parquet with two normalization-equal copies
    val tmp = java.nio.file.Files.createTempDirectory("dedup-fix").toFile
    val s = spark
    import s.implicits._
    Seq(
      (0L, "The   Quick\tFox", "en", "src0", 13L),
      (1L, "the quick fox", "en", "src0", 13L),   // same after normalize
      (2L, "the quick fox jumps", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val out = LlmQueries.dedupExact(spark, tmp.getAbsolutePath)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // (keep_id, n_copies): docs 0+1 collapse keeping min id 0; doc 2 alone
    assert(out == Set((0L, 2L), (2L, 1L)))
  }

  test("nested memoized artifacts (keep → clusters → pairs → signatures) " +
    "compute from a cold cache without recursive-update failures") {
    // fresh dir ⇒ every memo key is cold; dedupKeep triggers the full
    // nested chain in one call (regression: ConcurrentHashMap
    // computeIfAbsent threw "Recursive update" on nested keys)
    val tmp = java.nio.file.Files.createTempDirectory("memo-nest").toFile
    val s = spark
    import s.implicits._
    (0L to 9L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta token$i run", "en",
        "src0", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val kept = LlmQueries.dedupKeep(spark, tmp.getAbsolutePath).count()
    assert(kept >= 1 && kept <= 10)
  }

  test("dupSpans finds cross-doc and within-doc duplicated runs as " +
    "maximal spans, at exact token extents") {
    val tmp = java.nio.file.Files.createTempDirectory("spans-fix").toFile
    val s = spark
    import s.implicits._
    val shared = (1 to 10).map(i => s"a$i").mkString(" ") // 10-token run
    val phrase = (1 to 8).map(i => s"b$i").mkString(" ")  // exactly k
    Seq(
      (0L, s"u01 u02 $shared u03 u04", "en", "src0", 0L),
      (1L, s"v01 v02 v03 $shared v04", "en", "src0", 0L),
      (2L, s"w01 $phrase w02 w03 $phrase w04", "en", "src0", 0L),
      (3L, (1 to 12).map(i => s"x$i").mkString(" "), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val out = LlmQueries.dupSpans(spark, tmp.getAbsolutePath)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 0/1: the 10-token shared run = 3 consecutive 8-gram
    // starts = ONE span of 10 tokens (boundary grams mix in unique
    // context tokens, so the span is exactly the shared run)
    assert(out(0L) == ((1L, 10L, 10L)) && out(1L) == ((1L, 10L, 10L)))
    // doc 2: the k-token phrase twice WITHIN one doc = two islands
    // of exactly k tokens each
    assert(out(2L) == ((2L, 16L, 8L)))
    // doc 3: nothing duplicated → no row at all
    assert(!out.contains(3L) && out.size == 3)

    // the removal transform: survivors reassemble in order, the
    // untouched doc passes through with no row, a fully-masked doc
    // drops outright
    val keep = LlmQueries.spanDedupKeep(spark, tmp.getAbsolutePath)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(keep(0L) == ((4L, "u01 u02 u03 u04")))
    assert(keep(1L) == ((4L, "v01 v02 v03 v04")))
    assert(keep(2L) == ((4L, "w01 w02 w03 w04")))
    assert(!keep.contains(3L) && keep.size == 3)

    val tmp2 = java.nio.file.Files.createTempDirectory("spans-full")
      .toFile
    Seq((10L, phrase, "en", "src0", 0L),
      (11L, phrase, "en", "src0", 0L),
      (12L, "y1 y2 y3 y4 y5 y6 y7 y8 y9", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp2.getAbsolutePath}/documents.parquet")
    val full = LlmQueries.spanDedupKeep(spark, tmp2.getAbsolutePath)
    assert(full.isEmpty) // 10/11 fully masked, 12 untouched
    assert(LlmQueries.dupSpans(spark, tmp2.getAbsolutePath)
      .collect().map(_.getLong(0)).toSet == Set(10L, 11L))
  }

  test("decontaminate never flags heldout docs and counts are positive") {
    val out = LlmQueries.decontaminate(spark, dir)
    assert(out.filter(col("doc_id") % 97 === 0).isEmpty)
    assert(out.filter(col("n_shared_5grams") <= 0).isEmpty)
  }

  test("repetition ratios are valid per-mille values") {
    val out = LlmQueries.repetition(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("top_bigram_x1000") < 0 ||
      col("top_bigram_x1000") > 1000).isEmpty)
    assert(out.filter(col("distinct_ratio_x1000") <= 0 ||
      col("distinct_ratio_x1000") > 1000).isEmpty)
  }

  test("packSequences: bins start at 0, are contiguous per shard, and " +
    "only the last doc of a bin may cross the budget") {
    val out = LlmQueries.packSequences(spark, dir).cache()
    try {
      // every doc assigned, bins per shard are 0..max contiguous
      val perShard = out.groupBy("shard")
        .agg(min("seq_bin").as("lo"), countDistinct("seq_bin").as("nbins"),
          max("seq_bin").as("hi"))
      assert(perShard.filter(col("lo") =!= 0 ||
        col("hi") =!= col("nbins") - 1).isEmpty)
      // a bin's tokens minus its LAST doc fit the budget (greedy rule:
      // a doc opens a new bin only when the previous is full)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard", "seq_bin").orderBy(col("doc_id").desc)
      val bins = out
        .withColumn("rn", row_number().over(w))
        .groupBy("shard", "seq_bin")
        .agg(sum(when(col("rn") > 1, col("n_tokens")).otherwise(0L))
          .as("without_last"))
      assert(bins.filter(col("without_last") >= 2048).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("packSequencesSharded: the shard knob re-bins but preserves the " +
    "contract at any parallelism") {
    val byShards = Seq(1, 3, 32).map(k =>
      k -> LlmQueries.packSequencesSharded(spark, dir, k).cache())
    try {
      val base = byShards.head._2
        .select(col("doc_id"), col("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      byShards.foreach { case (k, out) =>
        // same docs, same token counts — sharding never drops/alters
        val docs = out.select(col("doc_id"), col("n_tokens"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(docs == base, s"shards=$k")
        // shard ids live in [0, k) and bins are contiguous from 0
        assert(out.filter(col("shard") < 0 || col("shard") >= k).isEmpty)
        val perShard = out.groupBy("shard")
          .agg(min("seq_bin").as("lo"),
            countDistinct("seq_bin").as("nbins"), max("seq_bin").as("hi"))
        assert(perShard.filter(col("lo") =!= 0 ||
          col("hi") =!= col("nbins") - 1).isEmpty, s"shards=$k")
      }
    } finally { byShards.foreach(_._2.unpersist()); () }
  }

  test("sourceStats partitions the corpus exactly") {
    val out = LlmQueries.sourceStats(spark, dir)
    val total = out.agg(sum("n_docs")).head.getLong(0)
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("topBigrams is 20 rows in non-increasing count order") {
    val rows = LlmQueries.topBigrams(spark, dir).collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("passageDedup flags cross-doc shares but not within-doc repeats") {
    val tmp = java.nio.file.Files.createTempDirectory("passage-fix").toFile
    val s = spark
    import s.implicits._
    // 8-token passages: doc 0 and 1 share their first passage; doc 2
    // repeats ITS first passage internally but shares with nobody
    val shared = "a b c d e f g h"
    val solo = "p q r s t u v w"
    Seq(
      (0L, s"$shared one two three four five six seven eight", "en", "src0", 0L),
      (1L, s"$shared nine ten eleven twelve th fo fi si", "en", "src0", 0L),
      (2L, s"$solo $solo", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val out = LlmQueries.passageDedup(spark, tmp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 0/1: 2 passages each, 1 shared; doc 2: 2 passages, 0 shared
    // (within-doc repetition is min==max on doc_id → not boilerplate)
    assert(out == Set((0L, 2L, 1L), (1L, 2L, 1L), (2L, 2L, 0L)))
  }

  test("termFilter drops docs at or above the 5% blocklist threshold") {
    val tmp = java.nio.file.Files.createTempDirectory("termf-fix").toFile
    val s = spark
    import s.implicits._
    val clean19 = Seq.fill(19)("ok").mkString(" ")
    Seq(
      (0L, s"slow $clean19", "en", "src0", 0L),        // exactly 5% → drop
      (1L, s"slow $clean19 ok", "en", "src0", 0L),     // under 5% → keep
      (2L, "big slow big ok", "en", "src0", 0L),       // 75% → drop
      (3L, clean19, "en", "src0", 0L))                 // 0% → keep
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val kept = LlmQueries.termFilter(spark, tmp.getAbsolutePath)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("kmvDistinct falls back to the exact count under k distinct values") {
    val tmp = java.nio.file.Files.createTempDirectory("kmv-fix").toFile
    val s = spark
    import s.implicits._
    // 6 tokens → 4 shingles, far below k = 64 → est must equal exact
    Seq((0L, "a b c d e f", "en", "srcA", 0L),
        (1L, "a b c d e f", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val r = LlmQueries.kmvDistinct(spark, tmp.getAbsolutePath).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
  }

  test("distinctiveTerms ranks a source-concentrated term first") {
    val tmp = java.nio.file.Files.createTempDirectory("dterm-fix").toFile
    val s = spark
    import s.implicits._
    // "rare" appears only in src1; shared filler spreads evenly
    Seq(
      (0L, "alpha beta gamma delta", "en", "src0", 0L),
      (1L, "alpha beta gamma delta", "en", "src0", 0L),
      (2L, "rare rare alpha beta", "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val out = LlmQueries.distinctiveTerms(spark, tmp.getAbsolutePath)
    val top1 = out.filter(col("source") === "src1" && col("rank") === 1)
      .head()
    assert(top1.getString(1) == "rare")
    // lift = (2/4) / (2/12) = 3.0 exactly
    assert(top1.getLong(2) == 3000L)
    // every source gets at most 3 ranked terms, ranks start at 1
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perSrc.filter(col("n") > 3 || col("lo") =!= 1).isEmpty)
  }

  /** Test-side replica of the engine's salt mix: 60-bit rank of the
    * first 15 md5 hex digits of the decimal id, mod g. */
  private def salt60(id: Long, g: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % g
  }

  private def expectedSaltedPairs(ids: Seq[Long], g: Long): Set[(Long, Long)] =
    ids.groupBy(salt60(_, g)).values.flatMap { cell =>
      if (cell.size > 64) Nil // hard guard drops an over-cap cell
      else for {
        a <- cell; b <- cell; if a < b
      } yield (a, b)
    }.toSet

  test("LSH salt-don't-drop: oversized buckets keep bounded candidates, " +
      "small buckets lose nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("lsh-salt").toFile
    val s = spark
    import s.implicits._
    // 70 byte-identical docs (ids 0..69) → one bucket of 70 > cap 64
    // in EVERY band; plus one small near-dup pair (1000, 1001)
    val giantIds = (0L until 70L)
    val giant = giantIds.map(i =>
      (i, "aaa bbb ccc ddd eee fff", "en", "src", 0L))
    val small = Seq(
      (1000L, "the quick brown fox jumps over dogs", "en", "src", 0L),
      (1001L, "the quick brown fox jumps over dogs", "en", "src", 0L))
    (giant ++ small)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val pairs = LlmQueries.dedupMinhash(spark, tmp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // below the cap: the small pair is never lost
    assert(pairs.contains((1000L, 1001L)))
    // above the cap: candidates KEPT (the old drop yielded zero) but
    // bounded — g = ceil(70/64) = 2 hash-salted cells, pairs only
    // within a cell, never all-pairs C(70,2) = 2415
    val expected = expectedSaltedPairs(giantIds, 2)
    val giantPairs = pairs.filter(p => p._1 < 70L && p._2 < 70L)
    assert(giantPairs == expected,
      s"got ${giantPairs.size}, expected ${expected.size}")
    assert(giantPairs.size < 2415)
  }

  test("LSH salt mix spreads residue-clustered ids (all-even ids split " +
      "across cells instead of collapsing into one over-cap cell)") {
    val tmp = java.nio.file.Files.createTempDirectory("lsh-salt-even").toFile
    val s = spark
    import s.implicits._
    // 70 identical docs whose ids are ALL EVEN: under the old
    // doc_id % g salt every id landed in cell 0, the cell stayed at
    // 70 > cap, and the hard guard dropped ALL its candidates. The
    // md5 mix spreads them regardless of the residue structure.
    val evenIds = (0L until 70L).map(_ * 2L)
    evenIds.map(i => (i, "aaa bbb ccc ddd eee fff", "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val pairs = LlmQueries.dedupMinhash(spark, tmp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = expectedSaltedPairs(evenIds, 2)
    assert(expected.nonEmpty) // the mix really does split this input
    assert(pairs == expected, s"got ${pairs.size}, expected ${expected.size}")
  }

  test("chunkWindows: overlapping fixed-stride windows cover every " +
      "token and repeat the 32-token overlap") {
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toFile
    val s = spark
    import s.implicits._
    val words300 = (1 to 300).map(i => s"w$i")
    Seq(
      (0L, words300.mkString(" "), "en", "src", 0L),
      (1L, "short doc", "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val out = LlmQueries.chunkWindows(spark, tmp.getAbsolutePath)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 300 tokens, len 128, stride 96 → chunks at 1/97/193:
    // sizes 128, 128, 108 — every token covered, 32-token overlaps
    val doc0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.map(c => (c._2, c._3)).toSeq ==
      Seq((0L, 128L), (1L, 128L), (2L, 108L)))
    def md5Of(lo: Int, hi: Int): String = {
      val txt = (lo to hi).map(i => s"w$i").mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(doc0(0)._4 == md5Of(1, 128))
    assert(doc0(1)._4 == md5Of(97, 224))
    assert(doc0(2)._4 == md5Of(193, 300))
    // a short doc still yields exactly one (partial) chunk
    assert(out.filter(_._1 == 1L).map(c => (c._2, c._3)).toSeq ==
      Seq((0L, 2L)))
  }

  test("kmeansConverged partitions the corpus; Lloyd does not lose mass") {
    val out = LlmQueries.kmeansConverged(spark, dir)
    val rows = out.collect()
    assert(rows.length <= 16 && rows.nonEmpty)
    // every vector is assigned to exactly one surviving cluster
    val total = rows.map(_.getLong(1)).sum
    val nVecs = graft.Tables(spark, dir, "embeddings").count()
    assert(total == nVecs, s"clustered $total of $nVecs")
    // cids are a subset of the initial sample's ids
    assert(rows.map(_.getInt(0)).forall(c => c >= 0 && c < 16))
  }

  test("ivfKmeansRecall emits one valid per-mille recall per query") {
    val rows = LlmQueries.ivfKmeansRecall(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows.forall { r =>
      val rec = r.getLong(2); rec >= 0 && rec <= 1000
    })
  }
}
