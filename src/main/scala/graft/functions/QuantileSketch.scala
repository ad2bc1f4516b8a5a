package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, mergeable approximate-quantile sketch.
  *
  * Shape: a bottom-k "coordinated sample" — per group, keep the k
  * rows whose 60-bit md5-of-row-key rank is smallest, then read
  * quantiles off the sorted sample. Implemented by composition on the
  * existing bounded-heap [[TopKByLong]] aggregate (score = -rank), per
  * the engine's extension-preference order: compose existing operators
  * before writing a new Catalyst tier.
  *
  * Why not KLL / GK / t-digest: their compactor schedules depend on
  * the ORDER partial buffers merge in, and Spark guarantees no merge
  * order across partial-aggregation trees — the sketch content (and
  * so the correctness-gate hash) would be run-dependent. The bottom-k
  * sample is a pure function of the input SET: merge-order
  * independent, mergeable with O(k) state, and exactly reproducible
  * in ANSI SQL (the DuckDB oracle replays it with a `row_number` over
  * the same md5 rank). Rank error is O(1/sqrt(k)) w.h.p. — k = 256
  * gives a few percent typical rank error, and accuracy is MEASURED
  * per group by `rel_q25_median_sketch` (cnt_le/n vs the target rank)
  * rather than claimed.
  *
  * Scale shape (what this retires): exact median/ntile windows sort
  * every group on one reducer — the acknowledged scale caveat of
  * `rel_q16`/`rel_q23`. This aggregate participates in partial
  * aggregation: each map task reduces its partition to <= k pairs per
  * group, so the exchange carries O(partitions x k) rows and no
  * per-group sort ever happens. Quantile ASSIGNMENT (rel_q26) is then
  * a broadcast join of the O(groups) boundary table + map-side
  * comparisons — the standard two-pass distributed-quantile plan.
  */
object QuantileSketch {

  /** Integer rank of `len` lowercase hex digits of column `hCol`
    * starting at 1-based digit `start` — digit-position arithmetic
    * only, so the SAME text runs on Spark (`posFn` = "instr") and
    * DuckDB ("strpos"). The single definition behind [[rank60Sql]]
    * and the Bloom filter's windowed double-hash values
    * (graft.llm.LlmQueries); keep `4 * len < 63` so every partial
    * sum stays in BIGINT range in both engines. Parenthesize at the
    * call site before applying any operator of higher precedence
    * than `+`. */
  def hexRankSql(posFn: String, hCol: String, start: Int, len: Int): String =
    (0 until len).map { i =>
      val p = 1L << (4 * (len - 1 - i))
      s"CAST($posFn('0123456789abcdef', substring($hCol, ${start + i}, " +
        s"1)) - 1 AS BIGINT) * $p"
    }.mkString(" + ")

  /** 60-bit integer rank from the first 15 hex digits of an md5 hex
    * string in column `hCol` (default "h"). */
  def rank60Sql(posFn: String, hCol: String = "h"): String =
    hexRankSql(posFn, hCol, 1, 15)

  /** The sketch state: the k pairs with smallest rank, as
    * `array<struct<score:bigint,id:bigint>>` (score = -rank, id =
    * value), rank-ascending. Ties on rank break by ascending value,
    * mirroring the oracle's `ORDER BY rank, value`. */
  def quantileSample(rank: Column, value: Column, k: Int): Column =
    TopKByLong.topK(-rank, value, k)

  /** Sample values sorted ascending — the estimator's input. */
  def sampleValues(sample: Column): Column =
    array_sort(transform(sample, x => x.getField("id")))

  /** q(p) = the ceil(p*m)-th smallest of the m sample values
    * (1-based, clamped to >= 1 so the empty-fraction edge p ~ 0 still
    * indexes). SQL twin: `vals[greatest(1, CAST(ceil(p*len(vals)) AS
    * INT))]`. */
  def sampleQuantile(values: Column, p: Double): Column =
    element_at(values,
      greatest(lit(1), ceil(lit(p) * size(values)).cast("int")))
}
