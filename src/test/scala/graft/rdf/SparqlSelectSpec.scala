package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** The SPARQL text front-end's contract: a parsed query string plans
  * IDENTICALLY to its hand-built DataFrame twin — proven with
  * `optimizedPlan.sameResult` (canonicalized plan equality: same
  * operators, same exchanges, alias/exprId differences normalized),
  * plus schema-name and result equality. Five canonical strings
  * cover the grammar: star pivot, star + constant-object flag,
  * OPTIONAL, chain join (non-star), single-scan FILTER + LIMIT. */
class SparqlSelectSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  import s.implicits._

  private def t: DataFrame = TripleFixture.triples(s, d)

  private def assertTwin(compiled: DataFrame, hand: DataFrame): Unit = {
    assert(compiled.schema.fieldNames.sameElements(hand.schema.fieldNames),
      s"schema mismatch: ${compiled.schema.fieldNames.mkString(",")} vs " +
        hand.schema.fieldNames.mkString(","))
    assert(compiled.queryExecution.optimizedPlan
      .sameResult(hand.queryExecution.optimizedPlan),
      "compiled plan is not the hand-built plan:\n" +
        compiled.queryExecution.optimizedPlan.toString + "\nvs\n" +
        hand.queryExecution.optimizedPlan.toString)
  }

  test("1: star BGP with numeric FILTER == hand-built bgpStarOf") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?title ?monument_number ?part_size
        |WHERE {
        |  ?item a ceo:Rijksmonument ;
        |        dcterms:title ?title ;
        |        ceo:rijksmonumentnummer ?monument_number ;
        |        def:size ?part_size .
        |  FILTER(?part_size >= 25)
        |}""".stripMargin)
    val hand = RdfQueries.bgpStarOf(t)
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("2: OPTIONAL pattern == hand-built bgpOptional") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?title ?template
        |WHERE {
        |  ?item a ceo:Rijksmonument ;
        |        dcterms:title ?title .
        |  OPTIONAL { ?item o:resource_template ?template }
        |}""".stripMargin)
    val hand = RdfQueries.bgpOptional(s, d)
    assertTwin(compiled, hand)
    val c = compiled.collect().map(_.toSeq).toSet
    assert(c === hand.collect().map(_.toSeq).toSet && c.nonEmpty)
  }

  test("3: chain with a type-membership pattern == broadcast semi " +
      "against the distinct typed set (the hand-built dimension shape)") {
    val compiled = SparqlSelect(t,
      """SELECT ?ptr ?item
        |WHERE {
        |  ?ptr dcterms:relation ?item .
        |  ?item a ceo:Rijksmonument .
        |}""".stripMargin)
    val hand = {
      val rel = t.filter(col("predicate") === DctermsRelation)
        .select(col("subject").as("ptr"), col("obj_value").as("item"))
      val typed = t.filter(col("predicate") === RdfType &&
          col("obj_value") === CeoRijksmonument)
        .select(col("subject").as("item")).distinct()
      rel.join(broadcast(typed), Seq("item"), "left_semi")
        .select(col("ptr"), col("item"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("4: single-pattern scan with string FILTER and LIMIT") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?pub
        |WHERE { ?item o:is_public ?pub . FILTER(?pub = "true") }
        |LIMIT 50""".stripMargin)
    val hand = t.filter(col("predicate") === OmekaIsPublic)
      .select(col("subject").as("item"), col("obj_value").as("pub"))
      .filter(col("pub") === "true")
      .limit(50)
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("5: SELECT * star with constant-object flag == hand pivot") {
    val compiled = SparqlSelect(t,
      """SELECT *
        |WHERE { ?item a ceo:Rijksmonument ;
        |        ceo:rijksmonumentnummer ?m . }""".stripMargin)
    val hand = {
      val p = col("predicate")
      t.groupBy(col("subject"))
        .agg(
          max(when(p === RdfType && col("obj_value") === CeoRijksmonument, 1)
            .otherwise(0)).as("_m0"),
          min(when(p === CeoRijksmonumentnummer, col("obj_value"))).as("m"))
        .filter(col("_m0") === 1 && col("m").isNotNull)
        .select(col("subject").as("item"), col("m"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("6: DISTINCT + ORDER BY DESC + LIMIT == hand-built top-k, and " +
      "plans as bounded TakeOrderedAndProject, not a full sort") {
    val compiled = SparqlSelect(t,
      """SELECT DISTINCT ?brand
        |WHERE { ?item <http://ex.org/def#brand> ?brand . }
        |ORDER BY DESC(?brand) LIMIT 5""".stripMargin)
    val hand = t.filter(col("predicate") === "http://ex.org/def#brand")
      .select(col("obj_value").as("brand"))
      .distinct()
      .orderBy(col("brand").desc)
      .limit(5)
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.getString(0)).toSeq ===
      hand.collect().map(_.getString(0)).toSeq)
    assert(compiled.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT should plan as bounded top-k")
  }

  test("the registered rdf_sparql_select query parses, runs, and keeps " +
      "OPTIONAL rows null where the template is absent") {
    val df = RdfQueries.queries("rdf_sparql_select")(s, d)
    assert(df.schema.fieldNames.toSeq ===
      Seq("item", "title", "template", "part_size"))
    assert(df.count() > 0)
    assert(df.schema("part_size").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("7: prefix names are case-sensitive — two case-distinct " +
      "declarations resolve independently") {
    val compiled = SparqlSelect(t,
      """PREFIX DEF: <http://ex.org/def#>
        |PREFIX def: <http://ex.org/not-def#>
        |SELECT ?item ?size
        |WHERE { ?item DEF:size ?size . }""".stripMargin)
    val hand = t.filter(col("predicate") === "http://ex.org/def#size")
      .select(col("subject").as("item"), col("obj_value").as("size"))
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    // the lowercase homonym must hit the OTHER namespace, not the
    // lowercased table entry for DEF
    val other = SparqlSelect(t,
      """PREFIX DEF: <http://ex.org/def#>
        |PREFIX def: <http://ex.org/not-def#>
        |SELECT ?item ?size
        |WHERE { ?item def:size ?size . }""".stripMargin)
    assert(other.count() === 0)
    // an undeclared mixed-case prefix is an error, not a silent
    // match against its lowercased cousin
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      "SELECT ?x ?y WHERE { ?x Dcterms:title ?y }"))
  }

  test("8: FILTER on the subject variable compiles in the star-pivot " +
      "path (and matches the hand-built pivot)") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?title ?m
        |WHERE {
        |  ?item a ceo:Rijksmonument ;
        |        dcterms:title ?title ;
        |        ceo:rijksmonumentnummer ?m .
        |  FILTER(?item != "nope")
        |}""".stripMargin)
    val hand = {
      val p = col("predicate")
      t.groupBy(col("subject"))
        .agg(
          max(when(p === RdfType && col("obj_value") === CeoRijksmonument, 1)
            .otherwise(0)).as("_m0"),
          min(when(p === DctermsTitle, col("obj_value"))).as("title"),
          min(when(p === CeoRijksmonumentnummer, col("obj_value"))).as("m"))
        .filter(col("_m0") === 1 && col("title").isNotNull &&
          col("m").isNotNull && col("subject") =!= "nope")
        .select(col("subject").as("item"), col("title"), col("m"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("parser rejects malformed queries with a diagnostic") {
    val bad = Seq(
      "SELECT ?x WHERE { ?x }",                     // incomplete pattern
      "SELECT ?x WHERE { ?x unknownpfx:y ?z }",     // undeclared prefix
      "SELECT ?x WHERE { }",                        // empty group
      "SELECT ?x WHERE { ?a dcterms:title ?t }",    // unbound select var
      // OPTIONAL inside a UNION branch is out of scope
      "SELECT ?x ?t WHERE { { ?x dcterms:title ?t } UNION " +
        "{ OPTIONAL { ?x dcterms:title ?t } } }",
      // projected var not in GROUP BY
      "SELECT ?item (COUNT(*) AS ?n) WHERE { ?item dcterms:title ?t } " +
        "GROUP BY ?t",
      // HAVING without aggregates
      "SELECT ?x ?t WHERE { ?x dcterms:title ?t } HAVING(COUNT(*) > 1)")
    bad.foreach { q =>
      assertThrows[IllegalArgumentException](SparqlSelect(t, q))
    }
  }

  // ---- round-12 productions: UNION / aggregates / property paths ----

  private val DefBrandIri = "http://ex.org/def#brand"

  test("9: predicate-only UNION merges into ONE isin scan — never a " +
      "union of per-predicate scans") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlUnionQuery)
    val hand = t.filter(col("predicate").isin(DctermsTitle, DefBrandIri))
      .select(col("subject").as("item"), col("obj_value").as("value"))
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    assert(!compiled.queryExecution.optimizedPlan.toString.contains("Union"),
      "mergeable UNION must not plan a Union node")
  }

  test("10: heterogeneous UNION pads unbound vars with typed nulls") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlUnionHetQuery)
    val hand = {
      val titles = t.filter(col("predicate") === DctermsTitle)
        .select(col("subject").as("item"), col("obj_value").as("title"),
          lit(null).cast("string").as("brand"))
      val brands = t.filter(col("predicate") === DefBrandIri)
        .select(col("subject").as("item"), lit(null).cast("string").as("title"),
          col("obj_value").as("brand"))
      titles.union(brands)
    }
    assertTwin(compiled, hand)
    val c = compiled.collect().map(_.toSeq).toSet
    assert(c === hand.collect().map(_.toSeq).toSet && c.nonEmpty)
    assert(compiled.filter(col("brand").isNull).count() > 0 &&
      compiled.filter(col("title").isNull).count() > 0)
  }

  test("11: GROUP BY + COUNT/MIN == the hand-built groupAgg shape " +
      "(registered rdf_group_agg)") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlAggQuery)
    val hand = RdfQueries.queries("rdf_group_agg")(s, d)
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("12: GROUP_CONCAT with separator == the hand-built groupConcat " +
      "shape (order pinned lexicographic)") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?brand (COUNT(*) AS ?n_items)
        |       (GROUP_CONCAT(?item; separator=";") AS ?items_concat)
        |WHERE { ?item def:brand ?brand . ?item a ceo:Rijksmonument . }
        |GROUP BY ?brand""".stripMargin)
    val hand = RdfQueries.queries("rdf_group_concat")(s, d)
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("13: HAVING reuses the projected aggregate's column == the " +
      "hand-built groupHaving shape") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?brand (COUNT(*) AS ?n_items)
        |WHERE { ?item def:brand ?brand . ?item a ceo:Rijksmonument . }
        |GROUP BY ?brand HAVING(COUNT(*) > 1)""".stripMargin)
    val hand = RdfQueries.queries("rdf_group_having")(s, d)
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("14: sequence path p1/p2 threads a hidden variable and joins " +
      "on it once") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlPathQuery)
    val hand = {
      val rel = t.filter(col("predicate") === DctermsRelation)
        .select(col("subject").as("src"), col("obj_value").as("_path0"))
      val ti = t.filter(col("predicate") === DctermsTitle)
        .select(col("subject").as("_path0"), col("obj_value").as("title"))
      rel.join(ti, Seq("_path0")).select(col("src"), col("title"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    // the hidden variable never leaks into the projection
    assert(compiled.schema.fieldNames.toSeq === Seq("src", "title"))
  }

  test("15: inverse path ^p swaps endpoints (no reversed edge set) " +
      "and the type membership compiles to a broadcast semi") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlPathInvQuery)
    val hand = {
      val typed = t.filter(col("predicate") === RdfType &&
          col("obj_value") === CeoRijksmonument)
        .select(col("subject").as("item")).distinct()
      t.filter(col("predicate") === DctermsRelation)
        .select(col("subject").as("pointer"), col("obj_value").as("item"))
        .join(broadcast(typed), Seq("item"), "left_semi")
        .select(col("item"), col("pointer"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("16: closure path p+ walks a synthetic multi-hop graph to the " +
      "full pair set, IRI objects only") {
    val t2 = graft.TestSpark.triples(Seq(
      ("g", "a", "iri", "http://p", "b", "iri", null, null),
      ("g", "b", "iri", "http://p", "c", "iri", null, null),
      ("g", "c", "iri", "http://p", "d", "iri", null, null),
      // a literal object must not join the walk
      ("g", "c", "iri", "http://p", "not-a-node", "literal", null, null)))
    val df = SparqlSelect(t2,
      "SELECT ?s ?o WHERE { ?s <http://p>+ ?o . }")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("17: alternation under closure (p|q)+ is ONE fixpoint over " +
      "the union edge set") {
    val t2 = graft.TestSpark.triples(Seq(
      ("g", "a", "iri", "http://p", "b", "iri", null, null),
      ("g", "b", "iri", "http://q", "c", "iri", null, null)))
    val df = SparqlSelect(t2,
      "SELECT ?s ?o WHERE { ?s (<http://p>|<http://q>)+ ?o . }")
    // (a, c) exists only through BOTH predicates — the union edge set
    // is genuinely walked as one graph
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "c"), ("a", "c")))
  }

  test("19: text filters — LANGMATCHES pushes into the scan, " +
      "REGEX/CONTAINS filter the binding, OFFSET+LIMIT page the order") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlTextFiltersQuery)
    val hand = t.filter(col("predicate") === DctermsTitle &&
        col("obj_lang") === "nl")
      .select(col("subject").as("item"), col("obj_value").as("title"))
      .filter(col("title").contains("a"))
      .filter(col("title").rlike("^[a-z]"))
      .orderBy(col("item").asc, col("title").asc)
      .offset(10).limit(50)
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.toSeq).toSeq ===
      hand.collect().map(_.toSeq).toSeq && compiled.count() > 0)
    // the language test never survives past the scan: no Filter above
    // the scan mentions obj_lang
    val plan = compiled.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "ORDER BY + OFFSET + LIMIT should plan as one bounded top-k")
  }

  test("20: LANGMATCHES works inside the star pivot (binds only the " +
      "matching-language triple)") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?title ?m
        |WHERE {
        |  ?item a ceo:Rijksmonument ;
        |        dcterms:title ?title ;
        |        ceo:rijksmonumentnummer ?m .
        |  FILTER(langMatches(lang(?title), "nl"))
        |}""".stripMargin)
    val hand = {
      val p = col("predicate")
      t.groupBy(col("subject"))
        .agg(
          max(when(p === RdfType && col("obj_value") === CeoRijksmonument, 1)
            .otherwise(0)).as("_m0"),
          min(when(p === DctermsTitle && col("obj_lang") === "nl",
            col("obj_value"))).as("title"),
          min(when(p === CeoRijksmonumentnummer, col("obj_value"))).as("m"))
        .filter(col("_m0") === 1 && col("title").isNotNull &&
          col("m").isNotNull)
        .select(col("subject").as("item"), col("title"), col("m"))
    }
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
  }

  test("21: OFFSET without ORDER BY is rejected; LANGMATCHES on an " +
      "unbound or subject var is rejected") {
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      "SELECT ?x ?t WHERE { ?x dcterms:title ?t } LIMIT 5 OFFSET 5"))
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?t WHERE { ?x dcterms:title ?t .
        |FILTER(langMatches(lang(?x), "nl")) }""".stripMargin))
  }

  test("18: global aggregate without GROUP BY") {
    val compiled = SparqlSelect(t,
      "SELECT (COUNT(*) AS ?n) WHERE { ?item dcterms:title ?title . }")
    val hand = t.filter(col("predicate") === DctermsTitle).count()
    assert(compiled.collect().head.getLong(0) === hand && hand > 0)
  }

  test("22: VALUES == the hand-built valuesJoin shape — inline data " +
      "broadcast-joined into the BINDING scan before the big join") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlValuesQuery)
    val vals = Seq("Brand#13", "Brand#32", "Brand#55").toDF("brand")
    val br = t.filter(col("predicate") === "http://ex.org/def#brand")
      .select(col("subject").as("item"), col("obj_value").as("brand"))
    val ti = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject").as("item"), col("obj_value").as("title"))
    val hand = br.join(broadcast(vals), Seq("brand"))
      .join(ti, Seq("item"))
      .select(col("item"), col("brand"), col("title"))
    assertTwin(compiled, hand)
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
    // the inline relation is broadcast — the triple scan never
    // shuffles for inline data
    assert(compiled.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("23: BIND == the bindStrFuns discipline — scalar projections " +
      "only, FILTER on a BIND target pushes into the scan, ZERO " +
      "exchanges") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlBindQuery)
    // semantically equal to the hand-built rdf_bind_strfuns builder
    // (its obj_kind = 'literal' conjunct is implied by obj_lang='nl')
    val hand = RdfQueries.queries("rdf_bind_strfuns")(s, d)
    assert(compiled.schema.fieldNames.sameElements(
      hand.schema.fieldNames))
    assert(compiled.schema("title_len").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
    // the whole query is one map-side pass: no exchange of any kind
    assert(!compiled.queryExecution.executedPlan.toString
      .contains("Exchange"),
      "BIND query must plan with zero exchanges:\n" +
        compiled.queryExecution.executedPlan.toString)
  }

  test("24: BIND CONCAT/LCASE compose over earlier BIND targets in " +
      "declaration order") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?tag
        |WHERE { ?item dcterms:title ?title .
        |        BIND(LCASE(?title) AS ?lc)
        |        BIND(CONCAT("t:", ?lc) AS ?tag) }""".stripMargin)
    val hand = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject").as("item"),
        concat(lit("t:"), lower(col("obj_value"))).as("tag"))
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("26: { SELECT ... } subquery — inner aggregate + ORDER/LIMIT " +
      "plans as bounded top-k and drives the outer OPTIONAL join") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlSubqueryQuery)
    // independent hand spelling of the same multiset semantics
    val top = t.groupBy(col("subject"))
      .agg(count(lit(1)).as("n_triples"))
      .orderBy(col("n_triples").desc, col("subject").asc)
      .limit(5)
    val ti = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject"), col("obj_value").as("title"))
    val hand = top.join(ti, Seq("subject"), "left")
      .select(col("subject").as("item"), col("n_triples"), col("title"))
    assert(compiled.schema.fieldNames.sameElements(
      hand.schema.fieldNames))
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
    // the inner modifier plans as a bounded top-k heap, not a full
    // sort of the aggregate
    assert(compiled.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("27: variable predicate ?s ?p ?o binds the predicate column " +
      "(census == groupBy over the raw store)") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlPredAggQuery)
    val hand = t.groupBy(col("predicate").as("p"))
      .agg(count(lit(1)).as("n"))
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("28: variable predicate joins with a constant-predicate " +
      "pattern on the shared subject") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?p ?brand
        |WHERE { ?item ?p ?brand .
        |        ?item def:brand ?brand . }""".stripMargin)
    // every (item, brand) via ANY predicate that also carries the
    // brand value — includes the brand assertion itself
    val br = t.filter(col("predicate") === "http://ex.org/def#brand")
      .select(col("subject").as("item"), col("obj_value").as("brand"))
    val any = t.select(col("subject").as("item"),
      col("predicate").as("p"), col("obj_value").as("brand"))
    val hand = any.join(br, Seq("item", "brand"))
      .select(col("item"), col("p"), col("brand"))
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("29: ASK form — true for a matched pattern, false for the " +
      "@context-leak assertion") {
    val pos = SparqlSelect.queryForm(t, RdfQueries.sparqlAskQuery)
    assert(pos.schema.fieldNames.toSeq === Seq("ask"))
    assert(pos.collect().map(_.getBoolean(0)).toSeq === Seq(true))
    // the RAW export fixture still carries @context leaks (cleaning
    // removes them), so that assertion is TRUE here; a genuinely
    // absent substring is the negative control
    val leak = SparqlSelect.queryForm(t,
      """ASK { ?s ?p ?o . FILTER(CONTAINS(?s, "@context")) }""")
    assert(leak.collect().map(_.getBoolean(0)).toSeq === Seq(true))
    val neg = SparqlSelect.queryForm(t,
      """ASK { ?s ?p ?o . FILTER(CONTAINS(?s, "no-such-substring-q")) }""")
    assert(neg.collect().map(_.getBoolean(0)).toSeq === Seq(false))
  }

  test("30: CONSTRUCT form — template instantiation carries the " +
      "binding triple's term metadata into the canonical schema") {
    val compiled = SparqlSelect.queryForm(t, RdfQueries.sparqlConstructQuery)
    assert(compiled.schema.fieldNames.toSeq === Seq("graph", "subject",
      "subject_kind", "predicate", "obj_value", "obj_kind", "obj_lang",
      "obj_datatype"))
    val typed = t.filter(col("predicate") === RdfType &&
        col("obj_value") === CeoRijksmonument)
      .select(col("subject")).distinct()
    val hand = t.filter(col("predicate") === CeoRijksmonumentnummer)
      .join(typed, Seq("subject"), "left_semi")
      .select(lit("default").as("graph"), col("subject"),
        lit("iri").as("subject_kind"), lit(SdoSameAs).as("predicate"),
        col("obj_value"), col("obj_kind"), col("obj_lang"),
        col("obj_datatype"))
      .distinct()
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("31: DESCRIBE form == the hand-built describe (every triple " +
      "about the matched resources, hint-free semi-join)") {
    val compiled = SparqlSelect.queryForm(t, RdfQueries.sparqlDescribeQuery)
    val hand = RdfQueries.queries("rdf_describe")(s, d)
    assert(compiled.schema.fieldNames.sameElements(hand.schema.fieldNames))
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
    // DESCRIBE <iri> without WHERE resolves directly
    val one = SparqlSelect.queryForm(t,
      "DESCRIBE <http://example.com/nonexistent>")
    assert(one.count() === 0)
  }

  test("32: MINUS anti-joins on shared vars; with NO shared vars it " +
      "removes nothing (the SPARQL disjoint-domain rule)") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlMinusQuery)
    val typed = t.filter(col("predicate") === RdfType &&
        col("obj_value") === CeoRijksmonument)
      .select(col("subject").as("item"))
    val tpl = t.filter(col("predicate") === OmekaResourceTemplate)
      .select(col("subject").as("item")).distinct()
    val hand = typed.join(tpl, Seq("item"), "left_anti")
    assert(compiled.collect().map(_.getString(0)).toSet ===
      hand.collect().map(_.getString(0)).toSet && compiled.count() > 0)
    // disjoint-domain: the MINUS group binds only its own vars →
    // no-op, every typed subject survives
    val noop = SparqlSelect(t,
      """SELECT ?item
        |WHERE { ?item a ceo:Rijksmonument .
        |        MINUS { ?x o:resource_template ?tpl . } }""".stripMargin)
    assert(noop.count() === typed.count())
  }

  test("33: p* adds zero-length self rows for every edge-incident " +
      "node on top of the p+ closure") {
    val star = SparqlSelect(t, RdfQueries.sparqlPathStarQuery)
    val plus = SparqlSelect(t, RdfQueries.sparqlPathPlusQuery)
    val starSet = star.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val plusSet = plus.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plusSet.subsetOf(starSet))
    val selfRows = starSet.filter { case (a, b) => a == b }
    val nodes = t.filter(col("predicate") === DctermsRelation &&
        col("obj_kind") === "iri")
      .select(col("subject")).union(
        t.filter(col("predicate") === DctermsRelation &&
          col("obj_kind") === "iri").select(col("obj_value")))
      .distinct().count()
    assert(selfRows.size.toLong === nodes)
  }

  test("34: GRAPH blocks — a constant graph filters the scan, a " +
      "graph variable binds the column, unscoped patterns match the " +
      "union graph") {
    val mg = RdfQueries.multiGraph(s, d)
    val byVar = SparqlSelect(mg, RdfQueries.sparqlGraphQuery)
    val hand = mg.filter(col("predicate") === DctermsTitle)
      .groupBy(col("graph").as("g")).agg(count(lit(1)).as("n"))
    assert(byVar.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && byVar.count() > 1)
    // constant graph scopes the pattern to one named graph
    val g0 = SparqlSelect(mg,
      """SELECT ?s ?t
        |WHERE { GRAPH <http://ex.org/graph/0> {
        |  ?s dcterms:title ?t . } }""".stripMargin)
    val handG0 = mg.filter(col("predicate") === DctermsTitle &&
      col("graph") === "http://ex.org/graph/0")
    assert(g0.count() === handG0.count() && g0.count() > 0)
    // a literal graph term is rejected
    assertThrows[IllegalArgumentException](SparqlSelect(mg,
      """SELECT ?s WHERE { GRAPH "nope" { ?s dcterms:title ?t . } }"""))
    // a graph var over a closure path is rejected (crosses graphs)
    assertThrows[IllegalArgumentException](SparqlSelect(mg,
      "SELECT ?g WHERE { GRAPH ?g { ?a dcterms:relation+ ?b . } }"))
  }

  test("35: p? = edges plus incident self rows, strictly between " +
      "the plain scan and p*") {
    val opt = SparqlSelect(t, RdfQueries.sparqlPathOptQuery)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val star = SparqlSelect(t, RdfQueries.sparqlPathStarQuery)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val edges = t.filter(col("predicate") === DctermsRelation &&
        col("obj_kind") === "iri")
      .select(col("subject"), col("obj_value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges.subsetOf(opt) && opt.subsetOf(star))
    assert(opt.filter { case (a, b) => a != b } === edges.filter {
      case (a, b) => a != b
    })
  }

  test("36: FILTER (NOT) EXISTS — semi/anti on shared vars; with no " +
      "shared vars the block's emptiness gates globally (unlike " +
      "MINUS's disjoint no-op)") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlExistsQuery)
    val titles = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject").as("item"), col("obj_value").as("title"))
    val tpl = t.filter(col("predicate") === OmekaResourceTemplate)
      .select(col("subject").as("item")).distinct()
    val size = t.filter(col("predicate") === "http://ex.org/def#size")
      .select(col("subject").as("item"),
        col("obj_value").cast("int").as("size"))
      .filter(col("size") >= 30)
    val hand = titles.join(tpl, Seq("item"), "left_anti")
      .join(size, Seq("item"), "left")
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
    // the OPTIONAL's filter UNBINDS (null size), never drops rows:
    // every anti-surviving title row is present
    assert(compiled.count() === titles.join(tpl, Seq("item"),
      "left_anti").count())
    // uncorrelated EXISTS gates globally
    val gatedOut = SparqlSelect(t,
      """SELECT ?s ?t WHERE { ?s dcterms:title ?t .
        |FILTER EXISTS { ?x dcterms:identifier "no-such-id-xyz" . } }"""
        .stripMargin)
    assert(gatedOut.count() === 0)
    val gatedIn = SparqlSelect(t,
      """SELECT ?s ?t WHERE { ?s dcterms:title ?t .
        |FILTER NOT EXISTS { ?x dcterms:identifier "no-such-id-xyz" . } }"""
        .stripMargin)
    assert(gatedIn.count() === titles.count())
  }

  test("37: positive FILTER EXISTS == the membership semi-join") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?title
        |WHERE { ?item dcterms:title ?title .
        |        FILTER EXISTS { ?item a ceo:Rijksmonument . } }"""
        .stripMargin)
    val typed = t.filter(col("predicate") === RdfType &&
        col("obj_value") === CeoRijksmonument)
      .select(col("subject").as("item")).distinct()
    val hand = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject").as("item"), col("obj_value").as("title"))
      .join(typed, Seq("item"), "left_semi")
    assert(compiled.collect().map(_.toSeq).toSet ===
      hand.collect().map(_.toSeq).toSet && compiled.count() > 0)
  }

  test("25: VALUES/BIND misuse is rejected with a diagnostic") {
    // VALUES var not bound by any required pattern
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?t WHERE { ?x dcterms:title ?t .
        |VALUES ?other { "a" } }""".stripMargin))
    // BIND target collides with a pattern-bound var
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?t WHERE { ?x dcterms:title ?t .
        |BIND(UCASE(?t) AS ?t) }""".stripMargin))
    // BIND referencing an unbound var
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?t WHERE { ?x dcterms:title ?t .
        |BIND(UCASE(?nope) AS ?u) }""".stripMargin))
    // empty VALUES block
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?t WHERE { ?x dcterms:title ?t .
        |VALUES ?t { } }""".stripMargin))
  }

  test("38: negated property set == NOT-isin scan; quantified or " +
    "inverted negation rejected") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?value
        |WHERE { ?item !(a|dcterms:title) ?value . }""".stripMargin)
    val hand = t.filter(!col("predicate")
        .isin(RdfType, DctermsTitle))
      .select(col("subject").as("item"), col("obj_value").as("value"))
    assert(compiled.schema.fieldNames
      .sameElements(hand.schema.fieldNames))
    assert(compiled.queryExecution.optimizedPlan
      .sameResult(hand.queryExecution.optimizedPlan))
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a !(dcterms:title)+ ?b . }"))
    // ^!S (inverse OF the negated set) IS the endpoint-swapped scan
    val invNeg = SparqlSelect(t,
      """SELECT ?v ?s
        |WHERE { ?v ^!(a|dcterms:title) ?s . }""".stripMargin)
    val invHand = t.filter(!col("predicate")
        .isin(RdfType, DctermsTitle))
      .select(col("obj_value").as("v"), col("subject").as("s"))
    assert(invNeg.count() === invHand.count() && invNeg.count() > 0)
  }

  test("38b: !^p ≡ ^!{p} (§18.2.2.5 — reverse(NPS) both ways): " +
    "PLAN identity, and the pure-inverse set form too") {
    // `?a !^p ?b` matches (b, q, a) with q ∉ {p} — exactly the
    // endpoint-swapped negated scan the `^!p` spelling compiles to
    val negInv = SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a !^dcterms:title ?b . }")
    val invNeg = SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a ^!dcterms:title ?b . }")
    assert(negInv.queryExecution.optimizedPlan
      .sameResult(invNeg.queryExecution.optimizedPlan))
    assert(negInv.count() === invNeg.count() && negInv.count() > 0)
    // the set form `!(^p1|^p2)` normalizes identically
    val setForm = SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a !(^a|^dcterms:title) ?b . }")
    val setHand = SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a ^!(a|dcterms:title) ?b . }")
    assert(setForm.queryExecution.optimizedPlan
      .sameResult(setHand.queryExecution.optimizedPlan))
    // double inverse stays a loud rejection
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a ^!(^dcterms:title) ?b . }"))
  }

  test("38d: SERVICE against an unreachable endpoint fails LOUDLY " +
    "naming the endpoint (round-15: implemented, no longer a " +
    "rejection — SparqlServiceSpec covers the live paths); dataset " +
    "clauses against a graph-less store name the missing column") {
    val e1 = intercept[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x WHERE {
        |  SERVICE <http://remote.example.org/sparql> {
        |    ?x dcterms:title ?t . } }""".stripMargin,
      // a client that always fails — the no-network analog of the
      // default HTTP client against a dead endpoint
      new SparqlSelect.ServiceClient {
        override def fetch(e: String, q: String) = None
      }))
    assert(e1.getMessage.contains("SERVICE") &&
      e1.getMessage.contains("remote.example.org") &&
      e1.getMessage.contains("SILENT"))
    // a plain (s, p, o)-only frame: FROM must bounce with the
    // engine message, not Spark's unresolved-column error
    val noGraph = t.drop("graph")
    val e2 = intercept[IllegalArgumentException](SparqlSelect(noGraph,
      """SELECT ?x FROM <http://ex.org/g1>
        |WHERE { ?x dcterms:title ?t . }""".stripMargin))
    assert(e2.getMessage.contains("graph-partitioned"))
    val e3 = intercept[IllegalArgumentException](SparqlSelect(noGraph,
      """SELECT ?x WHERE {
        |  GRAPH <http://ex.org/g1> { ?x dcterms:title ?t . } }"""
        .stripMargin))
    assert(e3.getMessage.contains("graph-partitioned"))
    // and the same store runs fine WITHOUT dataset scoping
    assert(SparqlSelect(noGraph,
      "SELECT ?x ?t WHERE { ?x dcterms:title ?t . }").count() > 0)
  }

  test("38c: MIXED negated set !(p|^q) = forward NPS UNION ALL " +
    "endpoint-swapped NPS (the spec's alternation translation, " +
    "multiset semantics)") {
    val mixed = SparqlSelect(t,
      """SELECT ?a ?b
        |WHERE { ?a !(a|^dcterms:title) ?b . }""".stripMargin)
    val fwd = t.filter(col("predicate") =!= RdfType)
      .select(col("subject").as("a"), col("obj_value").as("b"))
    val inv = t.filter(col("predicate") =!= DctermsTitle)
      .select(col("obj_value").as("a"), col("subject").as("b"))
    val hand = fwd.union(inv)
    assert(mixed.count() === hand.count() && mixed.count() > 0)
    // multiset: both scans are in the union (count = sum of halves)
    assert(mixed.count() === fwd.count() + inv.count())
    // set-equal row-wise too
    assert(mixed.exceptAll(hand).isEmpty && hand.exceptAll(mixed).isEmpty)
  }

  test("39: COUNT(DISTINCT) counts values once; SAMPLE is the MIN " +
    "pin; DISTINCT rejected off COUNT") {
    val got = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?brand (COUNT(DISTINCT ?tpl) AS ?n)
        |       (SAMPLE(?item) AS ?an_item)
        |WHERE { ?item def:brand ?brand ; o:resource_template ?tpl . }
        |GROUP BY ?brand""".stripMargin)
    val hand = t.filter(col("predicate") === "http://ex.org/def#brand")
      .select(col("subject").as("item"), col("obj_value").as("brand"))
      .join(t.filter(col("predicate") === OmekaResourceTemplate)
        .select(col("subject").as("item"), col("obj_value").as("tpl")),
        Seq("item"))
      .groupBy(col("brand"))
      .agg(countDistinct(col("tpl")).as("n"), min(col("item")).as("an_item"))
    val g = got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val h = hand.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(g == h && g.nonEmpty)
    // a brand with 2+ items sharing one template counts it once
    assert(g.forall(_._2 <= 4)) // only 4 distinct template IRIs exist
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?brand (SUM(DISTINCT ?x) AS ?s)
        |WHERE { ?item def:brand ?brand ; def:size ?x . }
        |GROUP BY ?brand""".stripMargin))
  }

  test("40: !BOUND over OPTIONAL == the not-exists rows, via the " +
    "pivot (one exchange)") {
    val got = SparqlSelect(t, RdfQueries.sparqlBoundQuery)
    val withTpl = t.filter(col("predicate") === OmekaResourceTemplate)
      .select(col("subject")).distinct()
      .collect().map(_.getString(0)).toSet
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !withTpl.contains(r.getString(0))))
    // positive BOUND keeps exactly the complement
    val pos = SparqlSelect(t, RdfQueries.sparqlBoundQuery
      .replace("!BOUND", "BOUND"))
    assert(pos.collect().forall(r => withTpl.contains(r.getString(0))))
    // pivot shape: exactly ONE exchange in the positive-filter plan
    val exchanges = got.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected the pivot's bounded exchange " +
      s"count, got $exchanges")
  }

  test("41: SUBSTR/STRBEFORE/STRAFTER/COALESCE bind columns match " +
    "direct computation") {
    val got = SparqlSelect(t,
      """SELECT ?item ?pre ?before ?tail
        |WHERE {
        |  ?item dcterms:title ?title .
        |  BIND(SUBSTR(?title, 2, 3) AS ?pre)
        |  BIND(STRBEFORE(?title, "a") AS ?before)
        |  BIND(STRAFTER(?title, "a") AS ?tail)
        |}""".stripMargin)
    val hand = t.filter(col("predicate") === DctermsTitle)
      .select(col("subject").as("item"), col("obj_value").as("ti"))
      .collect().map { r =>
        val ti = r.getString(1)
        val i = ti.indexOf('a')
        (r.getString(0), ti.substring(1, math.min(4, ti.length)),
          if (i >= 0) ti.substring(0, i) else "",
          if (i >= 0) ti.substring(i + 1) else "")
      }.toSet
    assert(got.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet == hand)
    // COALESCE defaults the unbound OPTIONAL side
    val co = SparqlSelect(t, RdfQueries.sparqlCoalesceQuery)
    val labels = co.collect().map(_.getString(1))
    assert(labels.contains("no-template") &&
      labels.exists(_.startsWith("http://ex.org/template/")))
    // empty STRBEFORE separator is rejected, not special-cased
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?x ?b WHERE { ?x dcterms:title ?t .
        |BIND(STRBEFORE(?t, "") AS ?b) }""".stripMargin))
  }

  test("42: (p1/p2)+ is the fixpoint over the composed edge set; " +
    "unquantified parens desugar to the plain sequence") {
    // hand graph: chain 1→2→3→4→5 under :r — (r/r)+ from 1 reaches
    // exactly the even-distance nodes {3, 5}
    val rows = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"))
      .map { case (a, b) => ("default", s"http://ex.org/item/$a",
        "iri", DctermsRelation, s"http://ex.org/item/$b", "iri",
        null: String, null: String) }
    val chain = graft.TestSpark.triples(rows)
    val got = SparqlSelect(chain,
      "SELECT ?src ?dst WHERE { ?src (dcterms:relation/" +
        "dcterms:relation)+ ?dst . }")
      .collect().map(r => (r.getString(0).split('/').last,
        r.getString(1).split('/').last)).toSet
    assert(got == Set(("1", "3"), ("1", "5"), ("2", "4"), ("3", "5")))
    // without a quantifier the parens mean nothing: plan identity
    // with the plain sequence spelling
    val paren = SparqlSelect(t,
      "SELECT ?src ?title WHERE { ?src (dcterms:relation/" +
        "dcterms:title) ?title . }")
    val plain = SparqlSelect(t,
      "SELECT ?src ?title WHERE { ?src dcterms:relation/" +
        "dcterms:title ?title . }")
    assert(paren.queryExecution.optimizedPlan
      .sameResult(plain.queryExecution.optimizedPlan))
    // mixing | and / inside one group is rejected
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      "SELECT ?a ?b WHERE { ?a (dcterms:relation/dcterms:title" +
        "|def:size) ?b . }"))
  }

  test("43: BIND arithmetic == hand-built BIGINT projection; " +
    "mis-associated precedence rejected") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?scaled
        |WHERE {
        |  ?item def:size ?sz .
        |  BIND(?sz * 3 + 7 AS ?scaled)
        |  FILTER(?sz >= 10)
        |}""".stripMargin)
    val hand = t.filter(col("predicate") === "http://ex.org/def#size")
      .select(col("subject").as("item"),
        col("obj_value").cast("int").as("sz"))
      .withColumn("scaled", col("sz").cast("bigint") * lit(3L) + lit(7L))
      .filter(col("sz") >= 10)
      .select(col("item"), col("scaled"))
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    // subtraction arrives as a negative-int token and folds as + (-n)
    val sub = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?x WHERE {
        |  ?item def:size ?sz . BIND(?sz -2 AS ?x) FILTER(?sz = 10) }"""
        .stripMargin).select("x").distinct().collect()
    assert(sub.map(_.getLong(0)).toSeq == Seq(8L))
    // mixed precedence associates correctly: * binds tighter
    val mixed = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?x WHERE {
        |  ?i def:size ?sz . BIND(?sz + 1 * 2 AS ?x)
        |  FILTER(?sz = 10) }""".stripMargin)
      .select("x").distinct().collect()
    assert(mixed.map(_.getLong(0)).toSeq == Seq(12L)) // 10 + (1*2)
    // parentheses override: (?sz + 1) * 2
    val parens = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?x WHERE {
        |  ?i def:size ?sz . BIND((?sz + 1) * 2 AS ?x)
        |  FILTER(?sz = 10) }""".stripMargin)
      .select("x").distinct().collect()
    assert(parens.map(_.getLong(0)).toSeq == Seq(22L))
    // negative factor opens a multiplicative run: ?sz -2 * 3
    val negMul = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?x WHERE {
        |  ?i def:size ?sz . BIND(?sz -2 * 3 AS ?x)
        |  FILTER(?sz = 10) }""".stripMargin)
      .select("x").distinct().collect()
    assert(negMul.map(_.getLong(0)).toSeq == Seq(4L)) // 10 - (2*3)
    // a bare-variable BIND stays rejected
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?x WHERE { ?i def:size ?sz . BIND(?sz AS ?x) }"""
        .stripMargin))
  }

  test("44: IN is one isin scan (plan identity); NOT IN excludes; " +
    "IF binds conditionally") {
    val compiled = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?b ?bucket
        |WHERE {
        |  ?item def:brand ?b .
        |  FILTER(?b IN ("Brand#4", "Brand#19"))
        |  BIND(IF(?b = "Brand#4", "flag", "other") AS ?bucket)
        |}""".stripMargin)
    val hand = t.filter(col("predicate") === "http://ex.org/def#brand")
      .select(col("subject").as("item"), col("obj_value").as("b"))
      .withColumn("bucket",
        when(col("b") === "Brand#4", lit("flag")).otherwise(lit("other")))
      .filter(col("b").isin("Brand#4", "Brand#19"))
    assertTwin(compiled, hand)
    val got = compiled.collect()
    assert(got.nonEmpty &&
      got.forall(r => Set("Brand#4", "Brand#19").contains(r.getString(1))))
    assert(got.forall(r => (r.getString(1) == "Brand#4") ==
      (r.getString(2) == "flag")))
    // NOT IN: complementary row set over the same scan
    val notIn = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?b WHERE {
        |  ?item def:brand ?b . FILTER(?b NOT IN ("Brand#4", "Brand#19")) }"""
        .stripMargin)
    val all = t.filter(col("predicate") === "http://ex.org/def#brand").count()
    assert(notIn.count() + got.length === all)
  }

  test("45: LANG/DATATYPE/STR follow §17.4.2 — langString/xsd:string " +
    "defaults, NULL (unbound) on IRIs; multi-bound arg rejected") {
    val got = SparqlSelect(t,
      """SELECT ?p ?sv ?lg ?dt
        |WHERE {
        |  ?item ?p ?o .
        |  BIND(STR(?o) AS ?sv)
        |  BIND(LANG(?o) AS ?lg)
        |  BIND(DATATYPE(?o) AS ?dt)
        |}""".stripMargin).collect()
    val byPred = got.groupBy(_.getString(0))
    // titles: lang-tagged 'nl' literals → LANG 'nl', DATATYPE langString
    val titles = byPred(DctermsTitle)
    assert(titles.forall(r => r.getString(2) == "nl" &&
      r.getString(3) == Vocab.RdfLangString))
    // sizes: typed literals → LANG "", DATATYPE xsd:integer
    val sizes = byPred("http://ex.org/def#size")
    assert(sizes.forall(r => r.getString(2) == "" &&
      r.getString(3) == Vocab.XsdInteger))
    // brands: plain literals → LANG "", DATATYPE defaults xsd:string
    val brands = byPred("http://ex.org/def#brand")
    assert(brands.forall(r => r.getString(2) == "" &&
      r.getString(3) == Vocab.XsdString))
    // relations: IRIs → LANG/DATATYPE unbound (NULL), STR still bound
    val rels = byPred(DctermsRelation)
    assert(rels.forall(r => r.isNullAt(2) && r.isNullAt(3) &&
      !r.isNullAt(1)))
    // metadata threading needs exactly one object-binding pattern
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?lg WHERE {
        |  ?a dcterms:title ?o . ?b def:brand ?o .
        |  BIND(LANG(?o) AS ?lg) }""".stripMargin))
  }

  test("46: term-kind filters compile at the binding site — scan " +
    "filter on the joins path, pivot match condition on the star " +
    "path; OPTIONAL-scoped kinds rejected") {
    val compiled = SparqlSelect(t,
      """SELECT ?item ?o
        |WHERE { ?item ?p ?o . FILTER(ISLITERAL(?o)) }""".stripMargin)
    val hand = t.filter(col("obj_kind") === "literal")
      .select(col("subject").as("item"), col("obj_value").as("o"))
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    // negation: !ISIRI == the same scan with =!= — complementary
    val neg = SparqlSelect(t,
      """SELECT ?item ?o
        |WHERE { ?item ?p ?o . FILTER(!ISIRI(?o)) }""".stripMargin)
    val iris = t.filter(col("obj_kind") === "iri").count()
    assert(neg.count() + iris === t.count())
    // star path: the kind test joins the pivot's match condition —
    // still ONE exchange (one Aggregate over the scan)
    val star = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?title ?rel
        |WHERE {
        |  ?item dcterms:title ?title ;
        |        dcterms:relation ?rel .
        |  FILTER(ISIRI(?rel)) FILTER(ISLITERAL(?title))
        |}""".stripMargin)
    val exchanges = star.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"star + kind filters should stay one exchange, saw $exchanges")
    assert(star.count() > 0)
    // ISBLANK: the fixture has no bnodes — zero rows, not an error
    assert(SparqlSelect(t,
      """SELECT ?item ?o
        |WHERE { ?item ?p ?o . FILTER(ISBLANK(?o)) }""".stripMargin)
      .count() === 0)
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?item WHERE {
        |  ?item dcterms:title ?t .
        |  OPTIONAL { ?item def:brand ?b . FILTER(ISLITERAL(?b)) } }"""
        .stripMargin))
  }

  test("47: || is three-valued (a NULL alternative never suppresses " +
    "a passing one); var-var = drives an equi-join, not a product; " +
    "mixed &&/|| rejected") {
    // OPTIONAL-bound ?tpl is NULL for most items: rows must still
    // pass through the ?sz alternative — error || true = true
    val or = SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?item ?sz ?tpl
        |WHERE {
        |  ?item def:size ?sz .
        |  OPTIONAL { ?item o:resource_template ?tpl }
        |  FILTER(?tpl = "http://ex.org/template/1" || ?sz >= 45)
        |}""".stripMargin).collect()
    assert(or.exists(r => r.isNullAt(2) && r.getInt(1) >= 45),
      "NULL-tpl rows passing via the numeric alternative are missing")
    assert(or.forall(r => (!r.isNullAt(2) &&
      r.getString(2) == "http://ex.org/template/1") || r.getInt(1) >= 45))
    // var-var equality: the declared product + FILTER must optimize
    // into an equi-join — no cartesian product in the physical plan
    val cmp = SparqlSelect(t, RdfQueries.sparqlVarCmpQuery)
    val phys = cmp.queryExecution.executedPlan.toString()
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoop"),
      s"var-var = should join, not product:\n$phys")
    assert(cmp.count() > 0)
    // mixed chains are rejected, not mis-associated
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """PREFIX def: <http://ex.org/def#>
        |SELECT ?i WHERE { ?i def:size ?sz . ?i def:brand ?b .
        |  FILTER(?sz >= 10 && ?sz <= 20 || ?b = "Brand#4") }"""
        .stripMargin))
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?i WHERE { ?i ?p ?o .
        |  FILTER(ISLITERAL(?o) || ISIRI(?o)) }""".stripMargin))
  }

  test("bounded repetition p{lo,hi}: plan-identical to the " +
    "composition ladder, lo > 1 semantics on a diamond, bounds " +
    "validated") {
    val compiled = SparqlSelect(t, RdfQueries.sparqlPathBoundedQuery)
    val hand = RdfOps.pathBounded(
      t.filter(col("predicate") === Vocab.DctermsRelation &&
        col("obj_kind") === "iri")
        .select(col("subject").as("src"), col("obj_value").as("dst")),
      2, 4).select(col("src"), col("dst"))
    assertTwin(compiled, hand)
    assert(compiled.count() === hand.count() && compiled.count() > 0)
    // diamond semantics: a→b (1 hop only) must DROP under {2,2};
    // a→c has both a 1-hop and a 2-hop witness and must stay
    val edges = Seq(("a", "b"), ("a", "x"), ("x", "c"), ("a", "c"))
      .toDF("src", "dst")
    val got = RdfOps.pathBounded(edges, 2, 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "c")))
    // a parenthesized SEQUENCE under bounded repetition keeps the
    // quantifier (regression: the unquantified desugar used to
    // swallow it): (p/p){2} == pathBounded over the COMPOSED edges
    val seqRep = SparqlSelect(t,
      """SELECT ?src ?dst WHERE {
        |  ?src (dcterms:relation/dcterms:relation){2} ?dst . }"""
        .stripMargin)
    val e1 = t.filter(col("predicate") === Vocab.DctermsRelation &&
        col("obj_kind") === "iri")
      .select(col("subject").as("src"), col("obj_value").as("dst"))
    val composed = e1.join(
        e1.select(col("src").as("_m"), col("dst").as("_n")),
        col("dst") === col("_m"))
      .select(col("src"), col("_n").as("dst"))
    val seqHand = RdfOps.pathBounded(composed, 2, 2)
      .select(col("src"), col("dst"))
    assert(seqRep.collect().map(_.toSeq).toSet ==
      seqHand.collect().map(_.toSeq).toSet)
    // {n} exact form parses; out-of-range bounds fail loudly
    assert(SparqlSelect(t,
      """SELECT ?src ?dst
        |WHERE { ?src dcterms:relation{2} ?dst . }""".stripMargin)
      .columns.sameElements(Seq("src", "dst")))
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?s ?o
        |WHERE { ?s dcterms:relation{0,3} ?o . }""".stripMargin))
    assertThrows[IllegalArgumentException](SparqlSelect(t,
      """SELECT ?s ?o
        |WHERE { ?s dcterms:relation{2,99} ?o . }""".stripMargin))
  }

  test("51: FROM / FROM NAMED dataset semantics (§13.2)") {
    val mg = RdfQueries.multiGraph(s, d)
    val g0 = "http://ex.org/graph/0"
    val g1 = "http://ex.org/graph/1"
    // FROM restricts unscoped patterns to the merge
    val from = SparqlSelect(mg,
      s"""SELECT ?s ?t FROM <$g0>
         |WHERE { ?s dcterms:title ?t . }""".stripMargin)
    val hand = mg.filter(col("graph") === g0 &&
        col("predicate") === Vocab.DctermsTitle)
      .select(col("subject"), col("obj_value"))
    assert(from.count() === hand.count() && from.count() > 0)
    // an explicit dataset with NO FROM NAMED: GRAPH ?g matches nothing
    val noNamed = SparqlSelect(mg,
      s"""SELECT ?g ?o FROM <$g0>
         |WHERE { GRAPH ?g { ?x dcterms:title ?o . } }""".stripMargin)
    assert(noNamed.count() === 0)
    // a constant GRAPH outside FROM NAMED matches nothing; inside
    // it matches that graph exactly
    val outside = SparqlSelect(mg,
      s"""SELECT ?x ?o FROM NAMED <$g1>
         |WHERE { GRAPH <$g0> { ?x dcterms:title ?o . } }""".stripMargin)
    assert(outside.count() === 0)
    val inside = SparqlSelect(mg,
      s"""SELECT ?x ?o FROM NAMED <$g0>
         |WHERE { GRAPH <$g0> { ?x dcterms:title ?o . } }""".stripMargin)
    assert(inside.count() === hand.count())
    // FROM NAMED only: unscoped patterns see an EMPTY default graph
    val emptyDefault = SparqlSelect(mg,
      s"""SELECT ?s ?t FROM NAMED <$g0>
         |WHERE { ?s dcterms:title ?t . }""".stripMargin)
    assert(emptyDefault.count() === 0)
    // no dataset clause: the documented union-graph default holds
    val union = SparqlSelect(mg,
      "SELECT ?s ?t WHERE { ?s dcterms:title ?t . }")
    assert(union.count() ===
      mg.filter(col("predicate") === Vocab.DctermsTitle).count())
  }
}
