package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LangIdSpec extends AnyFunSuite {

  test("detects the language of real sentences") {
    assert(LangId.detect(
      "the cat sat on the mat and it was happy") == "en")
    assert(LangId.detect(
      "de muurschildering in het koor van de kerk is niet zichtbaar") == "nl")
    assert(LangId.detect(
      "die Wandmalerei ist nicht mehr sichtbar und wir wissen das") == "de")
    assert(LangId.detect(
      "la peinture murale est dans le choeur et vous ne la voyez pas") == "fr")
    assert(LangId.detect(
      "el mural es una obra que no se puede ver por los visitantes") == "es")
  }

  test("falls back to character trigrams when no stopwords hit") {
    assert(LangId.detect("painting illumination") == "en") // ing/ion
    assert(LangId.detect("moeilijk praktijk") == "nl") // ijk
  }

  test("is deterministic on empty/unknown input") {
    assert(LangId.detect("") == LangId.Unknown)
    assert(LangId.detect(null) == LangId.Unknown)
    assert(LangId.detect("zzz qqq xxx") == LangId.Unknown)
  }

  test("tagLanguages appends a detected_lang column, partition-local") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog are in the house"),
      (2L, "het schilderij is een werk van de meester"))
      .toDF("doc_id", "text")
    val tagged = LangId.tagLanguages(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tagged == Map(1L -> "en", 2L -> "nl"))
  }
}
