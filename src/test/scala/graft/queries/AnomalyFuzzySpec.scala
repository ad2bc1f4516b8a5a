package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the round-12 analytics additions: the median/MAD
  * anomaly rule's ROBUSTNESS (the reason it exists instead of a
  * mean/stddev z-score), and the blocked fuzzy match's relationship
  * to the unblocked ground truth (the blocking tradeoff, measured).
  */
class AnomalyFuzzySpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  import s.implicits._

  test("median/MAD flags exactly the injected outlier — and the " +
      "outlier does NOT drag the threshold (robustness vs mean-based)") {
    // 20 quiet hours at 10±1 events, one thundering-herd hour at 990
    val hours = ((1 to 20).map(h => (h.toLong, 9L + (h % 3))) :+
      (21L, 990L)).toDF("hour_ts", "n")
    val out = RelationalQueries.anomalyOf(hours).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getLong(0)).toSet
    assert(flagged === Set(21L))
    // the median/MAD stats ignore the outlier: both stay in the
    // quiet band (a mean-based rule would report mean ~56)
    val med = out.head.getAs[Double]("med")
    val mad = out.head.getAs[Double]("mad")
    assert(med >= 9.0 && med <= 11.0 && mad <= 1.0)
  }

  test("all-identical counts (MAD = 0) flags any deviating hour and " +
      "never divides") {
    val hours = ((1 to 10).map(h => (h.toLong, 5L)) :+ (11L, 6L))
      .toDF("hour_ts", "n")
    val out = RelationalQueries.anomalyOf(hours).collect()
    assert(out.count(_.getAs[Boolean]("is_anomaly")) === 1)
    assert(out.forall(r => !r.getAs[Double]("mad").isNaN))
  }

  test("blocked fuzzy match equals the unblocked ground truth " +
      "restricted to shared blocks; blocking recall is measured") {
    val blocked = RelationalQueries.entityFuzzy(s, d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val sup = graft.Tables(s, d, "supplier")
      .select(col("s_suppkey").as("ak"), col("s_name").as("an"))
    val sup2 = graft.Tables(s, d, "supplier")
      .select(col("s_suppkey").as("bk"), col("s_name").as("bn"))
    // unblocked ground truth (affordable only at spec scale)
    val naive = sup.crossJoin(sup2)
      .filter(col("ak") < col("bk") &&
        levenshtein(col("an"), col("bn")) <= 1)
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    // every blocked pair is a true pair...
    assert(blocked.subsetOf(naive) && blocked.nonEmpty)
    // ...and equals the truth restricted to shared blocking keys
    val sameBlock = naive.filter { case (a, b) =>
      a.substring(0, 16) == b.substring(0, 16)
    }
    assert(blocked === sameBlock)
    // measured recall of the 16-char-prefix blocking on this corpus
    val recall = blocked.size.toDouble / naive.size
    assert(recall > 0.8, s"blocking recall $recall")
  }
}
