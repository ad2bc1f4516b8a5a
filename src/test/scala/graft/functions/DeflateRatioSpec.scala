package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String

/** Pins the deflate-ratio semantics the oracle cannot mirror:
  * driver-vs-executor agreement, monotonicity on known content
  * classes, SQL registration, and codegen execution. */
class DeflateRatioSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def ratio(t: String): Long =
    DeflateUtil.ratioX1000(UTF8String.fromString(t))

  test("repetitive text compresses far below high-entropy text") {
    val rep = "spam spam spam spam " * 200
    val rnd = new scala.util.Random(42)
    val hi = Seq.fill(4000)(rnd.nextPrintableChar()).mkString
    assert(ratio(rep) < 100)        // boilerplate collapses
    assert(ratio(hi) > 700)         // near-incompressible stays high
    assert(ratio(rep) < ratio(hi))
  }

  test("empty and null inputs have no ratio") {
    assert(DeflateUtil.ratioX1000(null) == -1L)
    assert(ratio("") == -1L)
  }

  test("expression matches the driver-side helper row by row (codegen path)") {
    val texts = Seq("once upon a time", "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "x", "the quick brown fox jumps over the lazy dog " * 10, "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id", DeflateRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ratio(t), s"text #$i")
    }
  }

  test("registered as SQL function deflate_ratio") {
    val r = s.sql(
      "SELECT deflate_ratio('spam spam spam spam spam spam spam spam') AS r")
      .collect().head.getLong(0)
    assert(r == ratio("spam spam spam spam spam spam spam spam"))
  }

  test("llm_compress_ratio covers every document with a verdict") {
    val out = graft.llm.LlmQueries.queries("llm_compress_ratio")(
      s, "/root/testdata/sf0.001")
    val n = s.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val rows = out.collect()
    assert(rows.length == n)
    assert(rows.forall(r => Set("ok", "repetitive", "empty")
      .contains(r.getAs[String]("verdict"))))
  }

  test("golden fixture (independent Deflater replay) == engine on the " +
      "live corpus, and the sha key matches the raw text") {
    val d = "/root/testdata/sf0.001"
    val goldenPath = graft.llm.LlmQueries.compressGoldenPath(s, d)
    val golden = s.read.parquet(goldenPath)
    val engine = graft.llm.LlmQueries.queries("llm_compress_ratio")(s, d)
    val joined = engine.as("e")
      .join(golden.as("g"), $"e.doc_id" === $"g.doc_id", "full")
      .select($"e.doc_id", $"e.ratio_x1000".as("er"),
        $"g.ratio_x1000".as("gr")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(0), "golden row with no engine twin")
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"null disagreement at doc ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2),
          s"ratio disagreement at doc ${r.get(0)}")
    }
    // the oracle's join key: golden sha == sha256 of the raw text
    val docs = s.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "sha2(text, 256) AS sp")
    val mism = golden.join(docs, "doc_id")
      .filter($"text_sha" =!= $"sp").count()
    assert(mism == 0, "golden text_sha diverges from sha256(text)")
  }

  test("verdict branches: null text vs empty text vs repetitive vs ok") {
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "spam spam spam spam " * 200),
      (4L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = graft.llm.LlmQueries.compressRatioOf(df)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    assert(got == Map(1L -> "null", 2L -> "empty",
      3L -> "repetitive", 4L -> "ok"))
  }
}
