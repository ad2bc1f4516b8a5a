package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The count-min sketch's defining guarantee is ONE-SIDED error:
  * collisions only inflate, so est ≥ exact for every queried key —
  * structurally, because each of the key's d cells counts at least
  * every one of the key's own occurrences. */
class CmsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("cms estimates are one-sided (est >= exact) and cover the " +
      "exact top-20") {
    val rows = LlmQueries.cmsBigrams(s, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_est")
      val over = r.getAs[Long]("overestimate")
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
      assert(over === est - exact && over >= 0)
    }
    // the sketch is USEFUL at this geometry, not saturated: the
    // median overestimate stays well under the top-20 counts
    val overs = rows.map(_.getAs[Long]("overestimate")).sorted
    val exacts = rows.map(_.getAs[Long]("exact_n")).min
    assert(overs(overs.length / 2) < exacts,
      s"median overestimate ${overs(overs.length / 2)} vs min top-20 " +
        s"count $exacts — sketch saturated, grow w")
  }
}
