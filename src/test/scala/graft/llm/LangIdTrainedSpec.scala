package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The trained NB language-ID lane measured, not claimed: on the
  * labeled fixture the stored-counts classifier must get the
  * held-out split fully right (the pools are separable with
  * deliberate cross-language collisions — "water" en+nl, "licht"
  * nl+de — so a presence-lookup that ignored the Bayes weights
  * would NOT be guaranteed this). */
class LangIdTrainedSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("held-out accuracy is 100% on the labeled fixture and every " +
    "language appears") {
    val rows = LlmQueries.queries("llm_langid_score")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // diagonal confusion matrix: pred == true for every row
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"misclassified: true=${r.getString(0)} pred=${r.getString(1)}")
    }
    assert(rows.map(_.getString(0)).toSet == Set("de", "en", "fr", "nl"))
    // the whole held-out split is covered
    val n = rows.map(_.getLong(2)).sum
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(expr("doc_id % 5 = 3")).count()
    assert(n == expected)
  }

  test("the stored counts artifact is vocabulary-sized and covers " +
    "all four languages") {
    val t = LlmQueries.queries("llm_langid_train")(spark, sf)
    val langs = t.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs == Set("de", "en", "fr", "nl"))
    assert(t.count() < 500, "counts must stay vocabulary-sized")
    // shared grams really span languages (the Bayes work is real)
    val shared = t.groupBy("gram")
      .agg(countDistinct("lang").as("nl"))
      .filter(col("nl") >= 2).count()
    assert(shared > 10, s"expected cross-language grams, got $shared")
  }
}
