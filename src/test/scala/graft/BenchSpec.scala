package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must surface failures, not time them as successes:
  * a query that throws gets an `err` marker in the JSON (and main exits
  * nonzero), so a broken query can never bench as a fast pass. */
class BenchSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ok_count" -> ((s, dir) => Tables(s, dir, "region")),
    // count() prunes unused columns, so the failure must be in the
    // aggregated path itself: divide-by-zero under ANSI inside a
    // HAVING-style filter won't do either (also prunable) — a missing
    // table fails at analysis, which count() can never optimize away
    "boom" -> ((s, _) => s.sql("SELECT * FROM graft_bench_no_such_table")))

  test("a throwing query is recorded as err, healthy queries still time") {
    val s = TestSpark.spark
    val runs = Bench.run(s, sf, queries)
    val byName = runs.map(r => r.name -> r).toMap
    assert(byName("ok_count").err.isEmpty)
    assert(byName("boom").err.isDefined)
    // sorted order is stable
    assert(runs.map(_.name) == runs.map(_.name).sorted)

    val json = Bench.renderJson(runs, sf)
    assert(json.contains("\"errors\":{\"boom\":\""))
    assert(!json.contains("\"errors\":{\"ok_count\""))
    assert(json.contains("\"load_avg_1m\":"))
    // still one line, still has per-query timings for both
    assert(!json.contains("\n"))
    assert(json.contains("\"ok_count\":"))
  }
}
