package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import graft.{SnapshotMemo, Tables}

/** Distributed bounded-depth suffix array over the document corpus,
  * built by PREFIX DOUBLING (Manber–Myers), plus the two classic
  * consumers a training-data pipeline wants on top of it:
  * Lee et al. 2022 "Deduplicating Training Data Makes Language
  * Models Better" ExactSubstr duplicate-span extraction, and the
  * LCP profile of the suffix order.
  *
  * Reference anchor: the reference pipeline's set-semantics dedup is
  * rdflib's triple-set behavior (export_from_omeka_s.py:50); the
  * engine's dedup family generalizes it to content dedup, and this
  * module upgrades the k-gram span approximation (`llm_dup_spans`)
  * to the exact suffix-order formulation.
  *
  * Layout (the r18 optimization; before/after plans in plans/r18):
  * every position-scale table carries `block = gpos div B` and is
  * checkpointed hash-partitioned by `block`, sorted by
  * `(block, gpos)`. LogicalRDD preserves outputPartitioning and
  * outputOrdering, so
  *
  *  - every gpos-keyed join is written on `(block, gpos)`: the hash
  *    partitioning on `block` (a prefix of the join keys) satisfies
  *    the join's clustered distribution and the pinned sort
  *    satisfies its ordering — the sort-merge join runs with NO
  *    exchange and NO sort on the clustered side(s);
  *  - the CONSTANT-SHIFT lookups the doubling rounds are made of
  *    (rank at gpos+d) stop being self-joins at all: gpos is dense
  *    (one row per corpus character), so `lead(rank, d)` over the
  *    partition-local `(block) ORDER BY gpos` window is the shifted
  *    value, with the d boundary rows per block (the positions whose
  *    target falls in the next block) patched from a broadcast of
  *    the next blocks' first d rows ("halo" rows — d·nblocks ≈ a few
  *    thousand rows at any scale, since nblocks tracks the cluster
  *    width, not the corpus).
  *
  * The r17 layout paid, per doubling level, one exchange+sort of the
  * shifted side plus one redundant repartition+sort before the
  * checkpoint; measured (SaMicro/ProfileQ, this round) the whole SA
  * family was ~15 position-scale exchange+sort+checkpoint cycles for
  * ~34 s cold at sf0.1, with each atomic op ~1 s. The window+halo
  * form removes every per-level exchange.
  *
  * Shape, for 100 TB (unchanged):
  *  - The corpus is the virtual string S = concat(text_i || 0x01)
  *    over doc_id order; one row per character position, never
  *    materialized as a string.
  *  - rank_d tables (one per power-of-two depth d ≤ Depth) are the
  *    only state: rank_d(i) = rank of substr(S, i, d) among all
  *    positions, with EXACT substring-order semantics (shorter
  *    suffixes sort first via the missing-shift -1 sentinel).
  *  - Pack/densify alternation: a doubling round only needs an
  *    ORDER-PRESERVING single number per (rank, rank2) key — when
  *    the incoming ranks are bounded by B₀ the arithmetic pack
  *    r1·(B₀+2) + (r2+2) preserves the pair's lexicographic order as
  *    a pure MAP; packed ranks are ~B₀², so the next level densifies
  *    (range sort + partition-offset numbering). The packability
  *    test is on the actual bound, so corpora with wide char codes
  *    degrade to densify-every-round by themselves.
  *  - Document offsets are assigned by range-partitioned prefix
  *    sums (partition-local running sum + an exclusive prefix over
  *    the per-partition totals, collected — bounded by the partition
  *    count): no single-partition global window at any scale.
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
    * sum past any capped heap — the sf1/3 GB rehearsal OOM'd in a
    * block unroll with them memory-resident. Disk is where stored
    * artifacts live at scale anyway; consumers re-read sequentially.
    * LogicalRDD preserves the child's partitioning and ordering, so
    * a block-clustered input stays block-clustered. */
  private def chkDisk(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.DISK_ONLY)

  // ----------------------------------------------------------------
  // Block geometry. B (chars per block) and P (cluster width) derive
  // from the measured corpus length: P is the sizedCompute width
  // (executor-parallelism floor, data-derived past it) and B targets
  // ~8 blocks per partition so hash placement stays balanced. B is
  // required ≥ 64 > every shift the module uses (≤ 24), so a shifted
  // value is always either partition-local or in the next block's
  // halo.
  // ----------------------------------------------------------------
  private def corpusLen(s: SparkSession, d: String): Long =
    SnapshotMemo.getOrCompute(s, s"sa-len:$d")(
      Tables(s, d, "documents")
        .agg(coalesce(sum(length(col("text")).cast(LongType) + 1L),
          lit(0L)).as("n")).localCheckpoint())
      .head.getLong(0)

  private def widthFor(s: SparkSession, n: Long): Int =
    math.max(s.sparkContext.defaultParallelism, graft.LoopConf.partsFor(n))

  private def blockFor(n: Long, p: Int): Long =
    math.max(64L, n / (8L * p) + 1L)

  private def geom(s: SparkSession, d: String): (Long, Int) = {
    val n = corpusLen(s, d)
    val p = widthFor(s, n)
    (blockFor(n, p), p)
  }

  /** One exchange into the canonical block clustering; the following
    * checkpoint pins it for every downstream zipper join / window. */
  private def clusterByBlock(df: DataFrame, p: Int): DataFrame =
    df.repartition(p, col("block"))
      .sortWithinPartitions("block", "gpos")

  /** Shifted-value lookup WITHOUT a join: for each requested shift d,
    * adds column `name(d)` = `valueCol` at gpos+d (null past the
    * corpus end). Partition-local `lead` over the pinned
    * (block, gpos) order — no exchange, no sort — plus one broadcast
    * halo join per shift for the d boundary rows per block whose
    * target lives in the next block. Requires the input clustered by
    * block and gpos-dense (one row per corpus position). */
  private def withShifted(df: DataFrame, valueCol: String,
      shifts: Seq[Int], b: Long, name: Int => String): DataFrame = {
    val w = Window.partitionBy("block").orderBy("gpos")
    val led = shifts.foldLeft(df)((acc, dd) =>
      acc.withColumn(s"_w$dd", lead(col(valueCol), dd).over(w)))
    shifts.foldLeft(led) { (acc, dd) =>
      val heads = df.filter(pmod(col("gpos"), lit(b)) < dd)
        .select((col("gpos") - dd).as("gpos"),
          col(valueCol).as(s"_h$dd"))
      acc.join(broadcast(heads), Seq("gpos"), "left")
        .withColumn(name(dd), coalesce(col(s"_w$dd"), col(s"_h$dd")))
        .drop(s"_w$dd", s"_h$dd")
    }
  }

  // ----------------------------------------------------------------
  // Position table: one row per character of the virtual corpus
  // string, sentinel 0x01 rows included (lpos = dlen + 1), clustered
  // by block. Document offsets come from a range-partitioned prefix
  // sum: partition-local running totals plus the exclusive prefix of
  // per-partition sums (collected — one row per partition, bounded
  // by the cluster width, never by the document count).
  // ----------------------------------------------------------------
  private[llm] def positions(s: SparkSession, d: String): DataFrame =
    SnapshotMemo.getOrCompute(s, s"sa-pos:$d") {
      val (b, p) = geom(s, d)
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text"),
          length(col("text")).cast(LongType).as("dlen"))
      // pin the range placement so the per-partition totals and the
      // main pass see the same pid ↔ row assignment
      val ranged = docs
        .repartitionByRange(math.max(2, s.sparkContext.defaultParallelism),
          col("doc_id"))
        .sortWithinPartitions("doc_id")
        .localCheckpoint()
        .withColumn("_pid", spark_partition_id())
      val pidTotals = ranged.groupBy(col("_pid"))
        .agg(sum(col("dlen") + 1L).as("_t"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val pidOffs = pidTotals.map { case (pid, t) =>
        val r = (pid, acc); acc += t; r
      }.toSeq
      import s.implicits._
      val offDf = pidOffs.toDF("_pid", "_poff")
      val wp = Window.partitionBy("_pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = ranged.join(broadcast(offDf), Seq("_pid"))
        .withColumn("off",
          col("_poff") + coalesce(sum(col("dlen") + 1L).over(wp), lit(0L)))
      // per-character codes via ONE split of the (sentinel-appended)
      // text into a char array + posexplode. split('') emits a
      // trailing empty-string artifact (Java regex split semantics)
      // — dropped by the i <= dlen filter; the appended 0x01 char
      // lands at i = dlen with ascii = 1, the sentinel row.
      chkDisk(clusterByBlock(offs
        .select(col("doc_id"), col("dlen"), col("off"),
          posexplode(split(concat(col("text"), lit("\u0001")), ""))
            .as(Seq("i", "ch")))
        .filter(col("i") <= col("dlen"))
        .select(
          col("doc_id"), col("dlen"),
          (col("i") + 1).cast(LongType).as("lpos"),
          (col("off") + col("i")).as("gpos"),
          ascii(col("ch")).cast(LongType).as("code"))
        .withColumn("block", expr(s"gpos div ${b}L")), p))
    }

  // ----------------------------------------------------------------
  // Order-preserving dense rank WITHOUT a single-partition window:
  // range-repartition on the key, sort within partitions, then
  // assign contiguous indices by partition offset — entirely in the
  // DataFrame world. monotonically_increasing_id() over the PINNED
  // sorted checkpoint is (partition_id · 2^33 + row_index) in block
  // row order, so subtracting the partition base and adding the
  // exclusive prefix sum of partition counts (bounded by the
  // partition count, collected) yields exactly the contiguous
  // numbering. Input rows must be distinct on keyCols.
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
  // is the character code itself (order-preserving; density is not
  // required — doubling keys only need order/equality), read
  // straight off the positions checkpoint with no copy. Each deeper
  // level pairs the half-depth rank with its d/2-shifted self via
  // the window+halo lookup (-1 when the shift runs off the corpus:
  // a shorter suffix sorts before every longer one sharing its
  // prefix, exactly as string comparison does), then packs or
  // densifies.
  // ----------------------------------------------------------------
  /** Depth-1 rank bound: the corpus's ACTUAL maximum character code
    * (one bounded agg over the memoized positions table). On
    * ASCII-ish corpora depths 2, 4 and 8 all pack and the first
    * densify lands at depth 16; a corpus with genuinely wide codes
    * degrades the schedule gracefully by itself. */
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
      if (packable(half)) half * (half + 3) + (half + 2)
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
        // a pure projection of the block-clustered positions
        // checkpoint — the r17 build paid a second full
        // exchange+sort+checkpoint here
        positions(s, d).select(col("gpos"), col("code").as("rank"),
          col("block"))
      } else {
        val (b, p) = geom(s, d)
        val half = depth / 2
        val prev = rankLevel(s, d, half)
        val keys = withShifted(prev, "rank", Seq(half), b, _ => "_s")
          .select(col("block"), col("gpos"), col("rank"),
            coalesce(col("_s"), lit(-1L)).as("rank2"))
        val halfBound = levelBound(s, d, half)
        if (packable(halfBound)) {
          // pure map over the clustered frame: clustering and order
          // are preserved, checkpoint directly — no exchange.
          // Radix halfBound+3, NOT +2: the low slot holds rank2+2 ∈
          // {1} ∪ [3, halfBound+2], so +2 would let the max-rank2
          // digit equal the radix and alias into the hi digit under
          // the div/mod decode of lcpSql (order/equality would still
          // hold — the decode would not).
          val k = halfBound + 3
          chkDisk(keys.select(col("gpos"),
            (col("rank") * k + (col("rank2") + 2)).as("rank"),
            col("block")))
        } else {
          val ranked = denseRank(
            keys.select("rank", "rank2").distinct(),
            Seq("rank", "rank2"), "nrank")
          chkDisk(clusterByBlock(
            keys.join(ranked.hint("merge"), Seq("rank", "rank2"))
              .select(col("gpos"), col("nrank").as("rank"),
                col("block")), p))
        }
      }
    }

  /** Full bounded-depth SA order: dense sa_rank over
    * (rank_Depth, gpos) — gpos tie-break makes the key unique, so
    * the dense rank IS the suffix-array permutation index. The
    * positions⋈rank join is a zipper (both sides block-clustered:
    * no exchange, no sort). */
  private[llm] def saRanked(s: SparkSession, d: String): DataFrame =
    SnapshotMemo.getOrCompute(s, s"sa-ranked:$d") {
     graft.LoopConf.sizedCompute(s, corpusLen(s, d)) {
      val joined = positions(s, d)
        .select("block", "gpos", "doc_id", "lpos", "dlen")
        .join(rankLevel(s, d, Depth).hint("merge"), Seq("block", "gpos"))
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
    val dupStarts = SnapshotMemo.getOrCompute(s, s"sa-dup-starts:$d") {
     graft.LoopConf.sizedCompute(s, corpusLen(s, d)) {
      val (_, p) = geom(s, d)
      val r = rankLevel(s, d, SpanL)
      // duplicated ⟺ the rank's group has ≥ 2 members: ONE exchange
      // (the count-over-rank window) instead of the r17
      // groupBy + second full merge-join exchange of the rank table
      val dups = r.withColumn("_c",
          count(lit(1)).over(Window.partitionBy("rank")))
        .filter(col("_c") > 1)
        .select("block", "gpos")
      chkDisk(positions(s, d)
        .filter(col("lpos") <= col("dlen") - (SpanL - 1))
        .select("block", "gpos", "doc_id", "lpos")
        .join(clusterByBlock(dups, p).hint("merge"),
          Seq("block", "gpos"), "left_semi"))
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
  // ADJACENT suffix-array entries (capped at Depth).
  //
  // Fast path (packed-rank digit descent): when depths 2/4/8 all
  // pack (any ASCII-ish corpus), rank_8 values ARE mixed-radix
  // encodings of their 8 character digits (digit = code, or -1
  // for a past-corpus-end position, offset by +2 in the low slots).
  // The LCP of two suffixes capped at 32 is then a PURE EXPRESSION
  // over the four rank_8 values at offsets 0/8/16/24 from each side:
  // count leading equal digits by arithmetic descent (compare the
  // half-depth hi digits: equal ⟹ add k/2 and descend into the lo
  // digits, unequal ⟹ descend into the hi digits). Two distinct
  // positions can never both run off the corpus at the same relative
  // offset (ia+δ = ib+δ = n ⟹ ia = ib), so "both digits missing"
  // never compares equal and the descent agrees with the rank-table
  // lift exactly — the lift's rank_k equality IS k-digit equality.
  // Cost: one window pass for the three shifted blocks + two zipper
  // joins for the pair sides, replacing the 6-level lift's 12
  // position-scale joins and 6 checkpoints (measured 9.1 s of the
  // r17 family's 34 s).
  //
  // Fallback (wide-code corpora where rank_8 is densified and no
  // longer digit-decodable): the binary-lifting walk over the rank
  // tables, unchanged from r17.
  // ----------------------------------------------------------------
  def lcpHistogram(s: SparkSession, d: String): DataFrame = {
    val plcp = SnapshotMemo.getOrCompute(s, s"sa-plcp:$d") {
     graft.LoopConf.sizedCompute(s, corpusLen(s, d)) {
      val packs8 = packable(levelBound(s, d, 1)) &&
        packable(levelBound(s, d, 2)) && packable(levelBound(s, d, 4))
      if (packs8) plcpPacked(s, d) else plcpLift(s, d)
     }
    }
    plcp.groupBy("lcp").agg(count(lit(1)).as("n_pairs"))
  }

  /** Nested-CASE SQL for the leading-equal-digit count of two
    * depth-k packed rank values (k a power of two ≥ 1). A negative
    * operand is a propagated missing-suffix marker — zero matches
    * (the other side's digit is a real char; both-missing cannot
    * happen between distinct positions). */
  private def lcpSql(s: SparkSession, d: String, k: Int,
      x: String, y: String): String =
    if (k == 1)
      s"(CASE WHEN ($x) < 0 OR ($y) < 0 THEN 0" +
        s" WHEN ($x) = ($y) THEN 1 ELSE 0 END)"
    else {
      val kk = levelBound(s, d, k / 2) + 3
      val xh = s"(($x) div ${kk}L)"; val yh = s"(($y) div ${kk}L)"
      val xl = s"(($x) % ${kk}L - 2)"; val yl = s"(($y) % ${kk}L - 2)"
      s"(CASE WHEN ($x) < 0 OR ($y) < 0 THEN 0" +
        s" WHEN $xh = $yh THEN ${k / 2} + ${lcpSql(s, d, k / 2, xl, yl)}" +
        s" ELSE ${lcpSql(s, d, k / 2, xh, yh)} END)"
    }

  private def plcpPacked(s: SparkSession, d: String): DataFrame = {
    val (b, p) = geom(s, d)
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    // rank_8 blocks at offsets 0/8/16/24 per position: one window
    // pass (three leads share one window spec) + three tiny halo
    // broadcasts; clustering preserved, checkpoint directly
    val comp = chkDisk(withShifted(rankLevel(s, d, 8), "rank",
        Seq(8, 16, 24), b, dd => s"b${dd / 8}")
      .select(col("block"), col("gpos"), col("rank").as("b0"),
        col("b1"), col("b2"), col("b3")))
    val sa = saRanked(s, d).select("sa_rank", "gpos")
    val pairs = sa
      .join(sa.select((col("sa_rank") - 1).as("sa_rank"),
        col("gpos").as("gb")).hint("merge"), Seq("sa_rank"))
      .select(col("gpos").as("ia"), col("gb").as("ib"))
    def attach(df: DataFrame, key: String, pfx: String): DataFrame =
      clusterByBlock(df
          .withColumn("block", expr(s"$key div ${b}L"))
          .withColumn("gpos", col(key)), p)
        .join(comp.hint("merge"), Seq("block", "gpos"))
        .drop("block", "gpos")
        .withColumnsRenamed(
          (0 to 3).map(i => s"b$i" -> s"$pfx$i").toMap)
    val both = attach(attach(pairs, "ia", "a"), "ib", "c")
    def blockLcp(i: Int): Column =
      if (i == 0) expr(lcpSql(s, d, 8, "a0", "c0"))
      else expr(s"(CASE WHEN a$i IS NULL OR c$i IS NULL THEN 0 ELSE " +
        lcpSql(s, d, 8, s"a$i", s"c$i") + " END)")
    val l0 = blockLcp(0); val l1 = blockLcp(1)
    val l2 = blockLcp(2); val l3 = blockLcp(3)
    val total = l0 + when(l0 === 8,
      l1 + when(l1 === 8,
        l2 + when(l2 === 8, l3).otherwise(lit(0))).otherwise(lit(0)))
      .otherwise(lit(0))
    val out = chkSer(both.select(
      least(total.cast(LongType), lit(Depth.toLong)).as("lcp")))
    shim.freeLocalCheckpoint(comp)
    out
  }

  /** Binary-lifting fallback: descending powers k = Depth..1, add k
    * and advance both positions whenever the rank_k values match.
    * Never compares a string; 2 position-keyed joins per level.
    * Checkpoint EVERY level (disk, superseded freed): unrolled, the
    * 6-level lift is one plan with ~12 pipelined sorts whose
    * concurrent spill pressure OOM'd a borderline sf1/3 GB run. */
  private def plcpLift(s: SparkSession, d: String): DataFrame = {
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
