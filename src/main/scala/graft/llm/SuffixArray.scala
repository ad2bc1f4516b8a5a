package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.{SnapshotMemo, Tables}

/** Distributed bounded-depth suffix array over the document corpus,
  * built by PREFIX DOUBLING (Manber–Myers), plus the two classic
  * consumers a training-data pipeline wants on top of it:
  * Lee et al. 2022 "Deduplicating Training Data Makes Language
  * Models Better" ExactSubstr duplicate-span extraction, and the
  * LCP profile of the suffix order (binary-lifting LCP — the
  * rank-table trick from the same construction).
  *
  * Reference anchor: the reference pipeline's set-semantics dedup is
  * rdflib's triple-set behavior (export_from_omeka_s.py:50); the
  * engine's dedup family generalizes it to content dedup, and this
  * module upgrades the k-gram span approximation (`llm_dup_spans`)
  * to the exact suffix-order formulation.
  *
  * Shape, for 100 TB:
  *  - The corpus is the virtual string S = concat(text_i || 0x01)
  *    over doc_id order. S is NEVER materialized — every operator
  *    works on one row per character position (gpos, code), i.e.
  *    the same cardinality a tokenized corpus already has.
  *  - rank_d tables (one per power-of-two depth d ≤ Depth) are the
  *    only state: rank_d(i) = rank of substr(S, i, d) among all
  *    positions, with EXACT substring-order semantics (shorter
  *    suffixes sort first via the missing-shift -1 sentinel).
  *  - Each doubling round is two bounded shuffles: a position-keyed
  *    self-join (gpos ↔ gpos+d) to form (rank, shifted-rank) keys,
  *    and a range-sort of the DISTINCT keys to re-densify. No round
  *    ever materializes a suffix, compares strings, or exceeds
  *    O(n) rows. O(log Depth) rounds total — depth 32 = 5 rounds.
  *  - Dense ranks are assigned by range-repartition + sorted
  *    zipWithIndex (partition-offset numbering) — the one RDD hop in
  *    the module, used precisely because a global row_number window
  *    would single-partition the sort.
  *
  * Bounded depth: ranks are exact for the first `Depth` characters;
  * the SA order is (rank_Depth, gpos). That is the full suffix array
  * truncated at depth 32 — exactly what duplicate-span detection at
  * threshold L ≤ 32 needs (two suffixes sharing ≥ L chars are
  * adjacent-contiguous in any order that refines first-L-char
  * order). The depth is a knob, not a structural limit: each extra
  * doubling round doubles it.
  */
object SuffixArray {
  /** Bounded suffix-compare depth (chars); power of two. */
  val Depth = 32
  /** ExactSubstr duplicate-span threshold (chars); ≤ Depth. */
  val SpanL = 32
  /** Sampling modulus for the oracle-facing SA dump. */
  val SampleMod = 199

  private def chkSer(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** DISK-resident checkpoint for the BULK SA artifacts (positions,
    * every rank level, the ranked permutation, the dup-start mask):
    * six-plus corpus-position-cardinality tables held simultaneously
    * (the LCP lift needs ALL rank levels) sum past any capped heap —
    * the sf1/3 GB rehearsal OOM'd in a block unroll with them
    * memory-resident. Disk is where stored artifacts live at scale
    * anyway (the dedup indexes write parquet); consumers re-read
    * sequentially, and the per-rep hot tables (the 1-column PLCP)
    * stay memory-first. */
  private def chkDisk(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.DISK_ONLY)

  /** chkDisk CLUSTERED by gpos: hash-repartitioned + sorted within
    * partitions before the checkpoint, because LogicalRDD preserves
    * outputPartitioning/outputOrdering — every downstream merge join
    * on gpos (the next doubling level, the LCP lift's two lookups
    * per level, the SA assembly, the dup-mask probe) then skips BOTH
    * its exchange and its sort on this side. One exchange paid at
    * build, O(consumers) exchanges+sorts saved. */
  private def chkDiskByGpos(df: DataFrame): DataFrame =
    chkDisk(df.repartition(32, col("gpos"))
      .sortWithinPartitions("gpos"))

  // Join-strategy note: every SA-internal join carries an explicit
  // merge hint. The sides are corpus-position-cardinality (or, for
  // the dup-rank table, DATA-DEPENDENT — candidate-sized on normal
  // corpora, corpus-scale on a dup-heavy one like the sf1
  // rehearsal's 50%-duplicate replica corpus), and checkpoint-backed
  // plans carry estimates the planner can mistake for broadcastable:
  // the un-hinted build failed sf1/3 GB with driver broadcast OOMs.
  // Sort-merge spills under a capped heap; a size-triggered
  // broadcast of a data-dependent table does not.

  // ----------------------------------------------------------------
  // Position table: one row per character of the virtual corpus
  // string, sentinel 0x01 rows included (lpos = dlen + 1). Document
  // offsets are metadata-scale (one row per document), so the
  // running-sum window over doc order is an ndocs-row single
  // partition — the same O(#files) driver-side bookkeeping any
  // file-offset assignment does; the EXPLODED table is what scales.
  // ----------------------------------------------------------------
  private[llm] def positions(s: SparkSession, d: String): DataFrame =
    SnapshotMemo.getOrCompute(s, s"sa-pos:$d") {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text"),
          length(col("text")).cast(LongType).as("dlen"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = docs.withColumn("off",
        coalesce(sum(col("dlen") + 1).over(w), lit(0L)))
      // per-character codes via ONE split of the (sentinel-appended)
      // text into a char array + posexplode — the previous
      // explode(sequence)+substr(lpos,1) form both carried the FULL
      // document text on every character row (O(Σ dlen²) bytes
      // through the projection) and paid substr's O(lpos) UTF-8
      // seek per character (O(dlen²) work per document). split('')
      // emits a trailing empty-string artifact (Java regex split
      // semantics) — dropped by the i <= dlen filter; the appended
      // 0x01 char lands at i = dlen with ascii = 1, exactly the old
      // sentinel row.
      // the running-sum window leaves the DOC-level frame in one
      // partition; repartition it (metadata-scale shuffle: one row
      // per document) BEFORE the explode so the per-character
      // expansion and the chkDisk write parallelize instead of
      // running in the window's single task
      chkDisk(offs.repartition(32)
        .select(col("doc_id"), col("dlen"), col("off"),
          posexplode(split(concat(col("text"), lit("\u0001")), ""))
            .as(Seq("i", "ch")))
        .filter(col("i") <= col("dlen"))
        .select(
          col("doc_id"), col("dlen"),
          (col("i") + 1).cast(LongType).as("lpos"),
          (col("off") + col("i")).as("gpos"),
          ascii(col("ch")).cast(LongType).as("code")))
    }

  // ----------------------------------------------------------------
  // Order-preserving dense rank WITHOUT a single-partition window:
  // range-repartition on the key, sort within partitions, then
  // assign contiguous indices by partition offset — entirely in the
  // DataFrame world. monotonically_increasing_id() over the PINNED
  // sorted checkpoint is (partition_id · 2^33 + row_index) in block
  // row order, so subtracting the partition base and adding the
  // exclusive prefix sum of partition counts (≤ 32 rows, collected —
  // bounded by the partition count, not the data) yields exactly the
  // contiguous numbering zipWithIndex produced. The old RDD
  // zipWithIndex form paid a full InternalRow→Row decode plus a
  // re-encode over every position row (≈ the single largest CPU cost
  // in the SA build at sf0.1) and dropped out of whole-stage codegen.
  // Input rows must be distinct on keyCols (ranks would otherwise
  // break ties arbitrarily).
  // ----------------------------------------------------------------
  private[llm] def denseRank(df: DataFrame, keyCols: Seq[String],
      out: String): DataFrame = {
    val sorted = df
      .repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions,
        keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    val withId = sorted
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
    val counts = withId.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (p, c) =>
      val r = (p, acc); acc += c; r
    }.toSeq
    import sorted.sparkSession.implicits._
    val offDf = offRows.toDF("_pid", "_off")
    withId.join(broadcast(offDf), Seq("_pid"))
      .select(df.columns.map(col) :+
        (col("_mid") - col("_pid").cast(LongType) * lit(1L << 33) +
          col("_off")).as(out): _*)
  }

  // ----------------------------------------------------------------
  // rank_d tables. Invariant (spec-pinned): rank_d(i) = rank_d(j)
  // ⟺ substr(S, i, d) == substr(S, j, d), and rank order == that
  // substring's lexicographic order (short suffixes first). Depth 1
  // uses the character code directly (order-preserving; density is
  // not required — doubling keys only need order/equality). Each
  // deeper level joins the half-depth rank with its 2^k-shifted
  // self (-1 when the shift runs off the corpus: a shorter suffix
  // sorts before every longer one sharing its prefix, exactly as
  // string comparison does).
  //
  // Pack/densify alternation: a doubling round only needs an
  // ORDER-PRESERVING single number per (rank, rank2) key, not a
  // dense one — when the incoming ranks are bounded by B, the
  // arithmetic pack r1·(B+2) + (r2+2) preserves the pair's
  // lexicographic order as a pure MAP (no distinct, no sort, no
  // rank-assignment exchange). Packed ranks are ~B², so the NEXT
  // round densifies (sort + partition-offset numbering bounds them
  // by n again). Alternating halves the heavy sort rounds; the
  // packability test is on the actual bound, so at corpus sizes
  // where n² would overflow a long the schedule degrades to
  // densify-every-round by itself.
  // ----------------------------------------------------------------
  /** Depth-1 rank bound: the corpus's ACTUAL maximum character code
    * (one bounded agg over the memoized positions table) instead of
    * the worst-case 2^21 codepoint ceiling. Rank VALUES only need to
    * preserve order/equality, and the pack bound decides how long
    * the pack/densify alternation can keep packing: on ASCII-ish
    * corpora (max code ≈ 2^7) depths 2, 4 AND 8 all pack and the
    * first densify lands at depth 16 — one full position-scale
    * densify (sort + numbering exchange) less than the 2^21 schedule,
    * with the schedule still degrading gracefully by itself on a
    * corpus whose codes are genuinely wide. */
  private def maxCode(s: SparkSession, d: String): Long = {
    val key = s"sa-maxcode:$d"
    SnapshotMemo.getOrCompute(s, key)(
      positions(s, d).agg(max(col("code")).as("m")).localCheckpoint())
      .head.getLong(0)
  }

  private[llm] def levelBound(s: SparkSession, d: String,
      depth: Int): Long = {
    if (depth == 1) maxCode(s, d)
    else {
      val half = levelBound(s, d, depth / 2)
      if (packable(half)) half * (half + 2) + (half + 2)
      else positions(s, d).count() + 1
    }
  }

  private def packable(bound: Long): Boolean = bound <= 2000000000L

  private[llm] def rankLevel(s: SparkSession, d: String,
      depth: Int): DataFrame =
    SnapshotMemo.getOrCompute(s, s"sa-rank:$d:$depth") {
      require(depth >= 1 && Integer.bitCount(depth) == 1,
        s"rank level depth must be a power of two, got $depth")
      if (depth == 1) {
        chkDiskByGpos(positions(s, d)
          .select(col("gpos"), col("code").as("rank")))
      } else {
        val half = depth / 2
        val prev = rankLevel(s, d, half)
        val shifted = prev.select(
          (col("gpos") - half).as("gpos"), col("rank").as("rank2"))
        val keys = prev.join(shifted.hint("merge"), Seq("gpos"), "left")
          .select(col("gpos"), col("rank"),
            coalesce(col("rank2"), lit(-1L)).as("rank2"))
        val halfBound = levelBound(s, d, half)
        chkDiskByGpos(
          if (packable(halfBound)) {
            val k = halfBound + 2
            keys.select(col("gpos"),
              (col("rank") * k + (col("rank2") + 2)).as("rank"))
          } else {
            val ranked = denseRank(
              keys.select("rank", "rank2").distinct(),
              Seq("rank", "rank2"), "nrank")
            keys.join(ranked.hint("merge"), Seq("rank", "rank2"))
              .select(col("gpos"), col("nrank").as("rank"))
          })
      }
    }

  /** Full bounded-depth SA order: dense sa_rank over
    * (rank_Depth, gpos) — gpos tie-break makes the key unique, so
    * the dense rank IS the suffix-array permutation index. */
  private[llm] def saRanked(s: SparkSession, d: String): DataFrame =
    SnapshotMemo.getOrCompute(s, s"sa-ranked:$d") {
     graft.LoopConf.sizedCompute(s, positions(s, d).count()) {
      val joined = positions(s, d)
        .select("gpos", "doc_id", "lpos", "dlen")
        .join(rankLevel(s, d, Depth).hint("merge"), Seq("gpos"))
      chkDisk(denseRank(joined, Seq("rank", "gpos"), "sa_rank"))
     }
    }

  // ----------------------------------------------------------------
  // llm_suffix_array: every SampleMod-th entry of the suffix-array
  // permutation. The oracle recomputes the same order by SORTING THE
  // ACTUAL 32-CHAR SUFFIX STRINGS of the materialized corpus — the
  // structurally independent formulation the engine exists to avoid.
  // ----------------------------------------------------------------
  def suffixArray(s: SparkSession, d: String): DataFrame =
    saRanked(s, d)
      .filter(col("sa_rank") % SampleMod === 0)
      .select(col("sa_rank"), col("doc_id"), col("lpos"))

  // ----------------------------------------------------------------
  // llm_exact_substr — Lee et al. ExactSubstr: maximal spans of
  // positions whose SpanL-char substring occurs elsewhere in the
  // corpus. A within-document gram can only collide with another
  // within-document gram (every tail/sentinel-crossing window
  // contains 0x01, which document text never does), so the global
  // rank_SpanL group count equals the within-document duplicate
  // count. Spans: runs of consecutive duplicated start positions,
  // merged by the islands trick per document (window bounded by
  // document length), span_len = run + SpanL - 1.
  // ----------------------------------------------------------------
  def exactSubstr(s: SparkSession, d: String): DataFrame = {
    // the duplicated-start MASK is the stored artifact (the same
    // role llm_dup_spans' positional k-gram mask plays); the island
    // merge re-derives per read from it (dup-start-sized, cheap).
    // Exchanges across the whole SA build (this is usually the first
    // payer) sized to the measured position count (graft.LoopConf).
    val dupStarts = SnapshotMemo.getOrCompute(s, s"sa-dup-starts:$d") {
     graft.LoopConf.sizedCompute(s, positions(s, d).count()) {
      val r = rankLevel(s, d, SpanL)
      val dupRanks = r.groupBy("rank")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .select("rank")
      chkDisk(positions(s, d)
        .filter(col("lpos") <= col("dlen") - (SpanL - 1))
        .select("gpos", "doc_id", "lpos")
        .join(r.hint("merge"), Seq("gpos"))
        .join(dupRanks.hint("merge"), Seq("rank"), "left_semi"))
     }
    }
    val w = Window.partitionBy("doc_id").orderBy("lpos")
    dupStarts
      .withColumn("grp", col("lpos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("lpos")).as("span_start"),
        (max(col("lpos")) - min(col("lpos")) + SpanL).as("span_len"))
      .select("doc_id", "span_start", "span_len")
  }

  // ----------------------------------------------------------------
  // llm_sa_lcp: histogram of longest-common-prefix lengths between
  // ADJACENT suffix-array entries (capped at Depth), computed by
  // BINARY LIFTING over the stored rank tables: descending powers
  // k = Depth..1, add k and advance both positions whenever the
  // rank_k values match. Never compares a string; 2 position-keyed
  // joins per level. The LCP profile is the corpus's duplication
  // spectrum — the quantity ExactSubstr thresholds.
  // ----------------------------------------------------------------
  def lcpHistogram(s: SparkSession, d: String): DataFrame = {
    // the per-pair LCP table is the stored artifact (the PLCP array
    // of the SA literature); the histogram re-derives per read
    val plcp = SnapshotMemo.getOrCompute(s, s"sa-plcp:$d") {
     graft.LoopConf.sizedCompute(s, positions(s, d).count()) {
      val shim = org.apache.spark.sql.graftshim.ColumnBridge
      val sa = saRanked(s, d).select("sa_rank", "gpos")
      var cur = chkDisk(sa
        .join(sa.select((col("sa_rank") - 1).as("sa_rank"),
          col("gpos").as("gb")).hint("merge"), Seq("sa_rank"))
        .select(col("gpos").as("ia"), col("gb").as("ib"),
          lit(0L).as("lcp")))
      var k = Depth
      while (k >= 1) {
        val lev = rankLevel(s, d, k)
        val eq = col("ra").isNotNull && col("rb").isNotNull &&
          col("ra") === col("rb")
        // checkpoint EVERY level (disk, superseded freed): unrolled,
        // the 6-level lift is one plan with ~12 pipelined sorts
        // whose concurrent spill pressure OOM'd a borderline
        // sf1/3 GB run — bounding the live plan to one level keeps
        // at most two position-scale sorts in flight
        val next = chkDisk(cur
          .join(lev.select(col("gpos").as("ia"), col("rank").as("ra"))
            .hint("merge"), Seq("ia"), "left")
          .join(lev.select(col("gpos").as("ib"), col("rank").as("rb"))
            .hint("merge"), Seq("ib"), "left")
          .select(
            when(eq, col("ia") + k).otherwise(col("ia")).as("ia"),
            when(eq, col("ib") + k).otherwise(col("ib")).as("ib"),
            when(eq, col("lcp") + k).otherwise(col("lcp")).as("lcp")))
        shim.freeLocalCheckpoint(cur)
        cur = next
        k /= 2
      }
      val out = chkSer(
        cur.select(least(col("lcp"), lit(Depth.toLong)).as("lcp")))
      shim.freeLocalCheckpoint(cur)
      out
     }
    }
    plcp.groupBy("lcp").agg(count(lit(1)).as("n_pairs"))
  }
}
