package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Priority dedup on a corpus with CROSS-SOURCE duplicate groups —
  * the branch the driver testdata (all-unique texts) never fires.
  * The winner must be the lowest-priority-number source's copy even
  * when a higher-priority-number source holds a lower doc_id. */
class DedupPrioritySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val fixture = Seq(
    // group A: src9 holds the LOWEST doc_id (1) but src2 must win
    (1L, "the shared passage", "src9"),
    (5L, "The  shared   passage", "src2"), // normalization collapses
    (9L, "the shared passage", "src4"),
    // group B: same source twice → doc_id breaks the tie
    (3L, "another text", "src7"),
    (8L, "another text", "src7"),
    // singleton
    (4L, "unique", "src0"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("prio-fixture").toFile.getAbsolutePath
    val s = spark
    import s.implicits._
    fixture.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("highest-priority source wins over lower doc_id; same-source " +
      "ties break by doc_id; counts are per-group") {
    val got = LlmQueries.queries("llm_dedup_priority")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet // (keep_id, keep_priority, n_copies, n_sources)
    assert(got === Set(
      (5L, 2L, 3L, 3L), // group A: src2's doc 5, NOT doc 1
      (3L, 7L, 2L, 1L), // group B: min doc_id within src7
      (4L, 0L, 1L, 1L)))
  }
}
