package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Regression pin for the sf1/3 GB rehearsal's broadcast findings:
  * the queries whose DATA-DEPENDENT join sides once rode
  * size-estimate broadcasts (and OOM'd the capped heap on the
  * dup-heavy corpus) must plan with NO BroadcastHashJoin at all —
  * their only broadcastable sides are the ones we excised. The
  * entailment family's broadcasts are legitimate (vocabulary-sized
  * ontology frames) but bounded: the restructure capped the census
  * at 8 (the naive tree hit 20), pinned here so subtree re-expansion
  * can't silently return. */
class BroadcastDisciplineSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def executedString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def count(plan: String, tok: String): Int =
    tok.r.findAllIn(plan).size

  test("SA family and span-keep plan zero broadcast joins") {
    Seq("llm_suffix_array", "llm_sa_lcp", "llm_exact_substr",
        "llm_span_dedup_keep").foreach { q =>
      val p = executedString(q)
      assert(count(p, "BroadcastHashJoin") == 0,
        s"$q regrew a broadcast join:\n${p.take(2000)}")
    }
  }

  test("llm_mix_temperature ranks via the bounded heap, never a corpus window") {
    val p = executedString("llm_mix_temperature")
    assert(count(p, "Window") == 0,
      s"llm_mix_temperature regrew the per-source row_number window " +
        s"(a full corpus exchange + sort for a 200-row answer):\n${p.take(2000)}")
    assert(p.contains("top_k_l"),
      s"llm_mix_temperature lost the TopKByLong heap aggregate:\n${p.take(2000)}")
  }

  test("llm_ivf_incremental probes BROADCAST into the stored index " +
    "scan and never sort-merges the corpus side") {
    val p = executedString("llm_ivf_incremental")
    // the delta-sized probe set must ride broadcast; a size
    // misestimate that SMJ'd the corpus-scale assignment scan would
    // be the scale-killer this family exists to avoid
    assert(count(p, "SortMergeJoin") == 0,
      s"llm_ivf_incremental sort-merged a corpus-scale side:\n${p.take(2000)}")
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"llm_ivf_incremental lost its broadcast probe:\n${p.take(2000)}")
    assert(p.contains("top_k_l"),
      "llm_ivf_incremental must rank through the bounded heap")
  }

  test("llm_ivf_drift never sort-merges the corpus-scale assignment " +
    "scan: centroids ride broadcast on both aggregate legs") {
    val p = executedString("llm_ivf_drift")
    assert(count(p, "SortMergeJoin") == 0,
      s"llm_ivf_drift sort-merged a corpus-scale side:\n${p.take(2000)}")
    assert(count(p, "BroadcastHashJoin") +
      count(p, "BroadcastNestedLoopJoin") >= 1,
      s"llm_ivf_drift lost its broadcast centroid row:\n${p.take(2000)}")
  }

  test("llm_ivfpq_topk: codes join probed lists and LUTs by " +
    "BROADCAST only, ranks through the bounded heap, no corpus " +
    "window") {
    val p = executedString("llm_ivfpq_topk")
    assert(count(p, "SortMergeJoin") == 0,
      s"llm_ivfpq_topk sort-merged a corpus-scale side:\n${p.take(2000)}")
    assert(count(p, "Window") == 0,
      s"llm_ivfpq_topk regrew a corpus window:\n${p.take(2000)}")
    assert(count(p, "BroadcastHashJoin") +
      count(p, "BroadcastNestedLoopJoin") >= 2,
      s"llm_ivfpq_topk lost a broadcast side (lists/LUTs/codebooks):\n${p.take(2000)}")
    assert(p.contains("top_k_l"),
      "llm_ivfpq_topk must rank through the bounded heap")
  }

  test("entailment broadcasts stay at the restructured bound") {
    val p = executedString("rdf_rdfs_entail")
    val bhj = count(p, "BroadcastHashJoin")
    assert(bhj <= 8, s"rdf_rdfs_entail bhj=$bhj — subtree " +
      "re-expansion returned (the naive tree measured 20)")
    assert(count(p, "SortMergeJoin") == 0,
      "ontology joins must stay broadcast (vocabulary-sized)")
  }
}
