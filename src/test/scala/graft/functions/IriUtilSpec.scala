package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The IRI validity contract (SURVEY.md O5/O7): the fast scalar
  * implementation must agree exactly with the oracle regex that the
  * DuckDB side evaluates — that equivalence is what makes the
  * cleaning-pass oracle comparison sound.
  */
class IriUtilSpec extends AnyFunSuite {

  private def valid(s: String): Boolean =
    IriUtil.isValidIri(UTF8String.fromString(s))

  private val oracle = IriUtil.oracleRegex.r

  test("accepts ordinary IRIs") {
    assert(valid("http://example.org/a"))
    assert(valid("https://linkeddata.cultureelerfgoed.nl/def/ceo#Rijksmonument"))
    assert(valid("urn:isbn:0451450523"))
    assert(valid("a:b"))
    assert(valid("scheme+x.y-z:path"))
  }

  test("rejects malformed inputs") {
    assert(!IriUtil.isValidIri(null))
    assert(!valid(""))
    assert(!valid("nocolon"))
    assert(!valid("not a uri"))
    assert(!valid("http://bad uri/with space"))
    assert(!valid("http://x/ctrl"))
    assert(!valid("http://x/<angle>"))
    assert(!valid("http://x/{brace}"))
    assert(!valid("http://x/back\\slash"))
    assert(!valid("1http://leading-digit"))
    assert(!valid(":nakedcolon"))
    assert(!valid("http:")) // colon must not be last
    assert(!valid("ht@tp://bad-scheme-char"))
  }

  test("agrees with the oracle regex on targeted strings") {
    val cases = Seq("http://x/y", "x:", ":x", "a:b", "A9+.-:ok",
      "9a:b", "http://sp ace", "http://ok?q=1#frag", "tab:\tno",
      "mailto:a@b.c", "http://x`tick", "http://x^caret", "")
    cases.foreach { s =>
      assert(valid(s) == oracle.matches(s), s"disagreement on '$s'")
    }
  }

  test("agrees with the oracle regex on 2000 generated strings") {
    val iriLike: Gen[String] = for {
      scheme <- Gen.oneOf("http", "a", "x9+.-", "Z", "9bad", "")
      sep <- Gen.oneOf(":", "://", "", " :")
      rest <- Gen.listOf(Gen.frequency(
        8 -> Gen.alphaNumChar,
        3 -> Gen.oneOf('/', '.', '#', '?', '=', '-'),
        2 -> Gen.oneOf(' ', '<', '{', '\\', '`', '^', '')))
        .map(_.mkString)
    } yield scheme + sep + rest
    val gen = Gen.oneOf(iriLike, Gen.asciiPrintableStr)
    var seed = Seed(42L)
    (1 to 2000).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach { s =>
        assert(valid(s) == oracle.matches(s), s"disagreement on '$s'")
      }
      seed = seed.next
    }
  }
}
