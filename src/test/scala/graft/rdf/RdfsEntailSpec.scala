package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Full ρdf entailment vs an independent driver-side brute force
  * that applies the four rules in the naive order (sp per triple,
  * dom/range per sp-derived predicate, sc per derived type). Pins
  * the stratification argument: applying dom/range AFTER the sp
  * closure loses nothing vs naive rule saturation. */
class RdfsEntailSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val item = "http://ex.org/item/"

  test("stratified DAG == naive rule saturation, set semantics") {
    val s = spark
    import s.implicits._
    val parts = Tables(s, dir, "part")
      .select("p_partkey", "p_size").as[(Long, Int)].collect()
    val sizes = parts.map(_._2).toSet
    def chain(v: Int): Seq[Int] = { // ancestors INDICES above v
      val out = Seq.newBuilder[Int]
      var cur = v
      while (sizes.contains(cur)) { out += cur + 1; cur += 1 }
      out.result()
    }
    val want = scala.collection.mutable.Set.empty[(String, String, String)]
    parts.foreach { case (k, v) =>
      val subj = s"$item$k"
      val obj = s"$item${k * 2}"
      val predIdxs = v +: chain(v) // sp-closed predicate indices
      predIdxs.foreach { u =>
        want += ((subj, s"${Vocab.OntoPropNs}$u", obj))
        // dom/rng exist only for OCCURRING sizes
        if (sizes.contains(u) && u % 5 == 0)
          (u +: chain(u)).foreach(c =>
            want += ((subj, Vocab.RdfType, s"${Vocab.OntoClassNs}$c")))
        if (sizes.contains(u) && u % 7 == 0)
          ((u + 1) +: chain(u + 1)).foreach(c =>
            want += ((obj, Vocab.RdfType, s"${Vocab.OntoClassNs}$c")))
      }
    }
    val got = RdfQueries.queries("rdf_rdfs_entail")(s, dir)
      .as[(String, String, String)].collect()
    assert(got.length === got.toSet.size, "output must be a set")
    assert(got.toSet === want.toSet)
    // every rule genuinely fired, multi-hop deep
    val typeTriples = got.filter(_._2 == Vocab.RdfType)
    assert(typeTriples.nonEmpty, "dom/range fired")
    assert(typeTriples.groupBy(_._1).map(_._2.length).max >= 10,
      "sc expansion too shallow to be a test")
  }

  test("incremental == the shard triples' own deductive closure " +
      "under the FULL-vocabulary ontology, and ⊆ the full closure") {
    val s = spark
    import s.implicits._
    val parts = Tables(s, dir, "part")
      .select("p_partkey", "p_size").as[(Long, Int)].collect()
    val sizes = parts.map(_._2).toSet // full vocabulary, unfiltered
    def chain(v: Int): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var cur = v
      while (sizes.contains(cur)) { out += cur + 1; cur += 1 }
      out.result()
    }
    // brute-force derivations from SHARD instance triples only
    val want = scala.collection.mutable.Set.empty[(String, String, String)]
    parts.filter(_._1 % 10 == 7).foreach { case (k, v) =>
      val subj = s"$item$k"
      val obj = s"$item${k * 2}"
      (v +: chain(v)).foreach { u =>
        want += ((subj, s"${Vocab.OntoPropNs}$u", obj))
        if (sizes.contains(u) && u % 5 == 0)
          (u +: chain(u)).foreach(c =>
            want += ((subj, Vocab.RdfType, s"${Vocab.OntoClassNs}$c")))
        if (sizes.contains(u) && u % 7 == 0)
          ((u + 1) +: chain(u + 1)).foreach(c =>
            want += ((obj, Vocab.RdfType, s"${Vocab.OntoClassNs}$c")))
      }
    }
    val incr = RdfQueries.queries("rdf_rdfs_incremental")(s, dir)
      .as[(String, String, String)].collect().toSet
    assert(incr === want.toSet)
    val full = RdfQueries.queries("rdf_rdfs_entail")(s, dir)
      .as[(String, String, String)].collect().toSet
    assert(incr.subsetOf(full) && incr.size < full.size)
  }
}
