package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII scrub semantics on crafted rows: every pattern class is
  * found, redaction replaces the match exactly once per occurrence,
  * and PII-free docs pass through untouched. */
class PiiScrubSpec extends AnyFunSuite {

  test("emails/phones/ips are counted and redacted; clean text is " +
    "untouched; multiple occurrences all replaced") {
    val s = TestSpark.spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toFile
      .getAbsolutePath
    // doc 91 (7×13): injected email AND ip; doc 77 (7×11): email AND
    // phone; doc 1: nothing injected, clean text; doc 3: organic PII
    // in the base text itself (two emails)
    Seq(
      (91L, "plain words here", "en", "web", 10L),
      (77L, "more plain words", "en", "web", 10L),
      (1L, "nothing sensitive at all", "en", "web", 10L),
      (3L, "mail a@b.org and c@d.net thanks", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = LlmQueries.piiScrub(s, dir).collect()
    assert(row.length == 1)
    val r = row.head
    val get = r.getValuesMap[Any](Seq("n_docs", "n_emails", "n_phones",
      "n_ips", "n_docs_pii", "redacted_chars"))
    assert(get("n_docs") == 4L)
    // 91 and 77 get injected emails; doc 3 has two organic ones
    assert(get("n_emails") == 4L)
    assert(get("n_phones") == 1L && get("n_ips") == 1L)
    assert(get("n_docs_pii") == 3L) // doc 1 stays clean
    // redaction really replaces: doc 3's redacted text is the base
    // text with both emails -> <EMAIL>
    val red = "mail <EMAIL> and <EMAIL> thanks"
    val clean = "nothing sensitive at all"
    val expectedRedLen = red.length + clean.length +
      // doc 91: text + " contact user91@example.com" -> <EMAIL>,
      //         " host 10.91.0.1" -> <IP>
      ("plain words here" + " contact " + "<EMAIL>" + " host " + "<IP>")
        .length +
      // doc 77: " contact user77@example.com" -> <EMAIL>,
      //         " call +1-555-1077" -> <PHONE>
      ("more plain words" + " contact " + "<EMAIL>" + " call " +
        "<PHONE>").length
    assert(get("redacted_chars") == expectedRedLen.toLong)
  }
}
