package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 URL normalization ([[UrlCanon]]) pinned on the RFC's
  * OWN examples (§5.2.4's two remove_dot_segments traces), the
  * §6.2.2/§6.2.3 normalization rules case by case, and the
  * fail-closed boundary. */
class UrlCanonSpec extends AnyFunSuite {

  test("§5.2.4's own examples trace exactly") {
    assert(UrlCanon.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(UrlCanon.removeDotSegments("mid/content=5/../6") == "mid/6")
  }

  test("remove_dot_segments corner cases: leading .., trailing " +
    "dots, empty segments preserved") {
    assert(UrlCanon.removeDotSegments("/../x") == "/x")
    assert(UrlCanon.removeDotSegments("/a//b/./c/..") == "/a//b/")
    assert(UrlCanon.removeDotSegments("/a/.") == "/a/")
    assert(UrlCanon.removeDotSegments("/a/..") == "/")
    assert(UrlCanon.removeDotSegments(".") == "")
    assert(UrlCanon.removeDotSegments("/") == "/")
  }

  test("percent normalization: unreserved decoded, reserved kept " +
    "with uppercase hex, malformed escapes pass through") {
    assert(UrlCanon.pctNormalize("%7e%41%2f") == "~A%2F")
    assert(UrlCanon.pctNormalize("a%2Gb%") == "a%2Gb%")
    assert(UrlCanon.pctNormalize("%5F%2d") == "_-")
  }

  test("full normalization: case, default ports, empty path, " +
    "fragment removal, query preserved verbatim") {
    assert(UrlCanon.normalizeStr("HTTPS://WWW.Ex.COM:443/a/b/../c#f")
      == "https://www.ex.com/a/c")
    assert(UrlCanon.normalizeStr("http://h.example.com:80") ==
      "http://h.example.com/")
    // non-default port and other-scheme ports stay
    assert(UrlCanon.normalizeStr("http://h:8080/x") ==
      "http://h:8080/x")
    assert(UrlCanon.normalizeStr("ftp://h:80/x") == "ftp://h:80/x")
    // https with http's default port stays
    assert(UrlCanon.normalizeStr("https://h:80/") == "https://h:80/")
    // query order and escapes preserved (only hex case + unreserved)
    assert(UrlCanon.normalizeStr("https://h/s?b=%2f&a=%7e#x") ==
      "https://h/s?b=%2F&a=~")
  }

  test("%2E-encoded dot segments decode BEFORE dot-segment removal " +
    "(§6.2.2 order) and the result is idempotent") {
    assert(UrlCanon.normalizeStr("http://h/a/%2e%2e/b") ==
      "http://h/b")
    assert(UrlCanon.normalizeStr("http://h/a/%2E/b") ==
      "http://h/a/b")
    assert(UrlCanon.normalizeStr("http://h/%2e%2e/%2e%2e/x") ==
      "http://h/x")
    // idempotence: canonicalizing a canonical URL is a no-op
    val once = UrlCanon.normalizeStr("http://h/a/%2e%2e/b/%7ec")
    assert(UrlCanon.normalizeStr(once) == once)
  }

  test("fail-closed: no scheme, empty authority, relative refs") {
    assert(UrlCanon.normalizeStr("not a url") == null)
    assert(UrlCanon.normalizeStr("/relative/path") == null)
    assert(UrlCanon.normalizeStr("://host/x") == null)
    assert(UrlCanon.normalizeStr("https:///x") == null)
    assert(UrlCanon.normalizeStr("ht tp://h/x") == null)
  }
}
