package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** RDFS subClassOf entailment vs a driver-side brute force: walk the
  * size chain per instance and compare the full (subject, cls) set.
  * The oracle row proves SQL equivalence; this spec pins the
  * SEMANTICS (asserted class included, every ancestor reached, no
  * duplicates) against an independent in-memory walk. */
class RdfsTypesSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entailed types == brute-force chain walk, duplicate-free") {
    val s = spark
    import s.implicits._
    val parts = Tables(s, dir, "part")
      .select("p_partkey", "p_size").as[(Long, Int)].collect()
    val sizes = parts.map(_._2).toSet
    // brute force: C_v climbs v -> v+1 while the EDGE exists, i.e.
    // while v is an occurring size (each occurring size asserts an
    // edge to its successor class, instances or not)
    def ancestors(v: Int): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var cur = v
      while (sizes.contains(cur)) { out += cur + 1; cur += 1 }
      out.result()
    }
    val want = parts.flatMap { case (k, v) =>
      (v +: ancestors(v)).map(c =>
        (s"http://ex.org/item/$k", s"${Vocab.OntoClassNs}$c"))
    }
    val got = RdfQueries.queries("rdf_rdfs_types")(s, dir)
      .as[(String, String)].collect()
    assert(got.length === got.toSet.size, "no duplicate entailments")
    assert(got.toSet === want.toSet)
    // multi-hop is genuinely exercised: some instance must infer
    // 10+ ancestor classes through the chain
    val byInst = got.groupBy(_._1).view.mapValues(_.length)
    assert(byInst.values.max >= 10, "chain too shallow to be a test")
  }
}
