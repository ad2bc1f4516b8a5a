package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Content-defined chunking (CDC): chunk boundaries are a pure
  * function of a rolling polynomial hash of the LOCAL window, so
  * inserting or deleting bytes early in a document only disturbs
  * boundaries within one window of the edit — every later chunk
  * realigns and keeps its identity. That shift-robustness is what
  * fixed-stride windows (`llm_chunk_windows`) fundamentally lack,
  * and it is why dedup/storage systems chunk this way (Muthitacharoen
  * et al., LBFS SOSP'01 — the public origin of the technique).
  *
  * Boundary rule: position i (1-based, i ≥ 2) starts a new chunk iff
  * H(text[i .. i+W-1]) ≡ R (mod D), with H the base-B polynomial
  * hash reduced mod M at every step — exact integer arithmetic that
  * the DuckDB oracle replays with the SAME unrolled expression.
  * Deliberately NO min/max chunk-length clamp: a clamp makes a
  * boundary depend on its predecessor (sequential state — neither
  * shift-robust nor parallelizable); the pure rule is what makes the
  * operator embarrassingly parallel at 100 TB AND oracle-replayable.
  *
  * Plan shape: the boundary scan is entirely map-side (explode +
  * a 16-step codegen'd hash fold per position — no shuffle); the
  * chunk assembly is one doc-keyed window + one doc-keyed join; the
  * chunk-dedup rollup is one hash aggregate on the chunk digest.
  */
object CdcChunks {
  val W = 16 // window bytes
  val B = 257L // polynomial base
  val M = 1L << 20 // modulus (per-step reduction keeps longs tiny)
  val D = 64L // boundary divisor → expected chunk length
  val R = 13L // boundary residue

  /** The unrolled H(text[i..i+W-1]) as a codegen'd Column — the
    * same expression the oracle states in SQL. */
  private def hashCol: Column = {
    var acc: Column = lit(0L)
    for (j <- 0 until W) {
      acc = (acc * B +
        ascii(col("text").substr(col("i") + lit(j), lit(1)))) % M
    }
    acc
  }

  /** The oracle's spelling of [[hashCol]], built by the same fold so
    * the two can never drift. */
  private[llm] def hashSql: String = {
    var acc = "0"
    for (j <- 0 until W) {
      acc = s"(($acc * $B + ord(substr(text, t.i::INT + $j, 1))) % $M)"
    }
    acc
  }

  /** (doc_id, chunk_start, chunk_len, chunk_sha) — every chunk of
    * every document. Chunks cover the document exactly: starts are
    * position 1 plus every boundary position ≥ 2. */
  def chunks(s: SparkSession, d: String): DataFrame =
    chunksOfDocs(Tables(s, d, "documents"))

  /** [[chunks]] over an explicit `(doc_id, text, ...)` frame — the
    * probe surface shared with the incremental query and the
    * streaming twin (chunk boundaries are per-document, so a shard's
    * chunks are IDENTICAL to its chunks within the full corpus —
    * the property that makes the stored-digest probe exact). */
  def chunksOfDocs(docsDf: DataFrame): DataFrame = {
    val b = docsDf.select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("len"))
    // sequence(2, len-W+1) is DESCENDING when the bound is < 2 —
    // guard short docs out before exploding (they are single-chunk)
    val cuts = b.filter(col("len") >= W + 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(2L), col("len") - (W - 1))).as("i"))
      .filter(hashCol % D === R)
      .select(col("doc_id"), col("i").as("start"))
    val starts = b.select(col("doc_id"), lit(1L).as("start"))
      .union(cuts)
    val w = Window.partitionBy("doc_id").orderBy("start")
    starts
      .withColumn("next", lead(col("start"), 1).over(w))
      .join(b, Seq("doc_id"))
      .select(col("doc_id"), col("start").as("chunk_start"),
        (coalesce(col("next"), col("len") + 1) - col("start"))
          .as("chunk_len"),
        sha2(col("text").substr(col("start"),
          coalesce(col("next"), col("len") + 1) - col("start")), 256)
          .as("chunk_sha"))
  }

  /** Chunk-level dedup rollup: digests occurring more than once —
    * the shift-robust duplicate signal (a duplicated passage shares
    * its interior chunks even when its byte offset differs between
    * documents). ONE hash aggregate on the digest. */
  def dedup(s: SparkSession, d: String): DataFrame =
    chunks(s, d)
      .groupBy(col("chunk_sha"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") > 1)

  // ----------------------------------------------------------------
  // Incremental rung (the exact/minhash/span-dedup discipline): the
  // base corpus's chunk DIGEST SET is a stored parquet artifact;
  // an arriving shard is chunked locally (map-side) and its digests
  // broadcast against the index scan — the corpus is never re-read.
  // An arriving occurrence is duplicated iff its digest exists in
  // the base index OR occurs twice within the shard — exactly
  // "count ≥ 2 corpus-wide" restricted to arriving occurrences
  // (per-document boundaries make the decomposition exact), so the
  // oracle is the from-scratch full-corpus rule filtered to the
  // shard: sharing it IS the incremental contract.
  // ----------------------------------------------------------------
  private val buildLock = new Object

  private[llm] def storedDigestsPath(s: SparkSession,
      d: String): String = {
    val path = s"${LlmQueries.storedIndexPath(d)}/cdc-digests"
    buildLock.synchronized {
      graft.SnapshotMemo.getOrCompute(s, s"cdc-digests:$d") {
        chunksOfDocs(Tables(s, d, "documents")
            .filter(!expr(LlmQueries.arrivingShardPred)))
          .select("chunk_sha").distinct()
          .write.mode("overwrite").parquet(path)
        s.range(1).toDF("built")
      }
      path
    }
  }

  /** Pure index probe for a docs batch: its chunk occurrences whose
    * digest EXISTS in the stored index. Broadcast-asymmetric (the
    * batch side broadcasts; the corpus-scale index only scans).
    * Shared by [[dedupIncremental]] and the streaming twin
    * [[graft.streaming.DocsStream.startCdcProbe]]. */
  def probe(docsDf: DataFrame, digestIndex: DataFrame): DataFrame =
    digestIndex.join(broadcast(chunksOfDocs(docsDf)), Seq("chunk_sha"))
      .select(col("doc_id"), col("chunk_start"), col("chunk_len"),
        col("chunk_sha"))

  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val idx = s.read.parquet(storedDigestsPath(s, d))
    val arr = chunksOfDocs(Tables(s, d, "documents")
      .filter(expr(LlmQueries.arrivingShardPred)))
    val localDup = arr.groupBy(col("chunk_sha"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select("chunk_sha")
    idx.join(broadcast(arr), Seq("chunk_sha"))
      .select(col("doc_id"), col("chunk_start"), col("chunk_len"),
        col("chunk_sha"))
      .union(arr.join(localDup, Seq("chunk_sha"), "left_semi")
        .select(col("doc_id"), col("chunk_start"), col("chunk_len"),
          col("chunk_sha")))
      .distinct()
  }

  private[llm] def chunksOracle: String =
    s"""WITH base AS (
       |  SELECT doc_id, text, length(text)::BIGINT AS len
       |  FROM documents),
       |cuts AS (
       |  SELECT doc_id, t.i::BIGINT AS start
       |  FROM base, generate_series(2, 4096) t(i)
       |  WHERE t.i <= len - ${W - 1} AND $hashSql % $D = $R),
       |starts AS (
       |  SELECT doc_id, 1::BIGINT AS start FROM base
       |  UNION ALL SELECT doc_id, start FROM cuts),
       |chunks AS (
       |  SELECT s.doc_id, s.start,
       |    coalesce(lead(s.start) OVER (PARTITION BY s.doc_id
       |      ORDER BY s.start), b.len + 1) - s.start AS chunk_len,
       |    b.text
       |  FROM starts s JOIN base b USING (doc_id))""".stripMargin

  private[llm] def chunksOracleSelect: String =
    s"""$chunksOracle
       |SELECT doc_id, start AS chunk_start, chunk_len,
       |  sha256(substr(text, start::INT, chunk_len::INT)) AS chunk_sha
       |FROM chunks""".stripMargin

  private[llm] def dedupIncrementalOracleSelect: String =
    s"""$chunksOracle,
       |occ AS (
       |  SELECT doc_id, start, chunk_len,
       |    sha256(substr(text, start::INT, chunk_len::INT))
       |      AS chunk_sha
       |  FROM chunks),
       |marked AS (
       |  SELECT doc_id, start, chunk_len, chunk_sha,
       |    count(*) OVER (PARTITION BY chunk_sha) AS c
       |  FROM occ)
       |SELECT doc_id, start AS chunk_start, chunk_len, chunk_sha
       |FROM marked
       |WHERE c > 1 AND ${LlmQueries.arrivingShardPred}""".stripMargin

  private[llm] def dedupOracleSelect: String =
    s"""$chunksOracle
       |SELECT chunk_sha, count(*) AS n_copies,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM (SELECT doc_id,
       |        sha256(substr(text, start::INT, chunk_len::INT))
       |          AS chunk_sha
       |      FROM chunks)
       |GROUP BY chunk_sha HAVING count(*) > 1""".stripMargin
}
