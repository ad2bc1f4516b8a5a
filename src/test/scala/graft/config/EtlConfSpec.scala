package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Env-config grammar (O11/O13), exercising the A.2 fixture
  * (FIXTURES.md) including the bogus-filter skip and the documented
  * B4 delta (underscore predicates are addressable here). */
class EtlConfSpec extends AnyFunSuite {

  private val a2 = Map(
    "MAP_DCTERMS_TITLE" -> "SDO.name",
    "FILTER_O_ISPUBLIC" -> "http://omeka.org/s/vocabs/o#is_public",
    "FILTER_O_RESOURCECLASS" -> "http://omeka.org/s/vocabs/o#resource_class",
    "FILTER_O_RESOURCE_TEMPLATE" -> "http://omeka.org/s/vocabs/o#resource_template",
    "FILTER_BOGUS" -> "not-a-uri",
    "UNRELATED" -> "ignored")

  test("A.2 fixture parses: 1 mapping, 3 filters, 1 warning") {
    val conf = EtlConf.fromEnv(a2)
    assert(conf.mapping == Map(
      "http://purl.org/dc/terms/title" -> "https://schema.org/name"))
    assert(conf.filterList.toSet == Set(
      "http://omeka.org/s/vocabs/o#is_public",
      "http://omeka.org/s/vocabs/o#resource_class",
      "http://omeka.org/s/vocabs/o#resource_template"))
    assert(conf.warnings.size == 1 &&
      conf.warnings.head.contains("FILTER_BOGUS"))
  }

  test("predicate name is lowercased (reference behavior, B4)") {
    val conf = EtlConf.fromEnv(Map("MAP_DCTERMS_TiTLE" -> "SDO.name"))
    assert(conf.mapping.keySet == Set("http://purl.org/dc/terms/title"))
  }

  test("underscore predicates are addressable (documented B4 delta)") {
    val conf = EtlConf.fromEnv(Map("MAP_O_IS_PUBLIC" -> "SDO.isAccessibleForFree"))
    assert(conf.mapping == Map(
      "http://omeka.org/s/vocabs/o#is_public" ->
        "https://schema.org/isAccessibleForFree"))
  }

  test("unknown namespaces and malformed values warn and skip") {
    val conf = EtlConf.fromEnv(Map(
      "MAP_NOPE_X" -> "SDO.name",
      "MAP_DCTERMS_TITLE" -> "NOPE.name",
      "MAP_DCTERMS" -> "SDO.name",
      "MAP_SDO_X" -> "noDotHere"))
    assert(conf.mapping.isEmpty)
    assert(conf.warnings.size == 4)
  }
}
