package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Vocab.RdfType

/** A SPARQL SELECT text front-end — the entry point a user holding a
  * query *string* expects (the reference's data model answers
  * `rdflib.Graph.query()` strings; reference: src/
  * transform_datamodel.py:20 imports rdflib, whose Graph exposes
  * `query`). The engine's execution shapes already exist as
  * DataFrame builders ([[RdfQueries]]); this parser routes a
  * restricted-but-canonical SELECT grammar into those SAME shapes,
  * so a parsed query plans identically to its hand-built twin
  * (SparqlSelectSpec proves plan-equality via `sameResult`).
  *
  * Supported grammar (whitespace-insensitive, keywords
  * case-insensitive):
  * {{{
  *   query    := prefix* SELECT DISTINCT? (?var+ | *) WHERE { group }
  *               (ORDER BY key+)? (LIMIT n)?
  *   prefix   := PREFIX pname: <iri>
  *   group    := (triples | optional | filter)+
  *   triples  := term pred obj (';' pred obj)* '.'?
  *   optional := OPTIONAL { triples }
  *   filter   := FILTER ( cond (&& cond)* )
  *   cond     := ?var op (integer | "string")
  *   op       := = | != | < | <= | > | >=
  *   term     := ?var | <iri> | pname:local
  *   pred     := <iri> | pname:local | a          (constant only)
  *   obj      := ?var | <iri> | pname:local | "string"
  *   key      := ?var | ASC(?var) | DESC(?var)   (selected vars only)
  * }}}
  * The prefixes of [[Vocab.namespaces]] are pre-declared; PREFIX
  * clauses add or override. ORDER BY + LIMIT plans as Spark's
  * bounded top-k (TakeOrderedAndProject), never a full sort. Out of
  * scope (use the DataFrame builders directly): variable predicates,
  * UNION/MINUS, property paths, GROUP BY, nested OPTIONAL.
  *
  * Compilation strategy mirrors the hand-built forms exactly:
  *  - A BGP whose required patterns share ONE subject variable (and
  *    ≥ 2 patterns or an OPTIONAL) compiles to the star PIVOT — one
  *    exchange, conditional aggregates per predicate
  *    ([[RdfQueries.bgpStarOf]]'s shape; same functional-property
  *    caveat, guarded by RdfPathSpec).
  *  - Anything else compiles to per-pattern filtered scans joined on
  *    shared variables (the naive BGP join), OPTIONAL groups as left
  *    joins — exact SPARQL multiset semantics.
  * A FILTER comparing a variable to an integer makes that variable's
  * binding numeric (`cast("int")` inside the pivot aggregate, like
  * the hand-built `part_size`); bound-by-comparison variables skip
  * the redundant isNotNull (a comparison on NULL is never true in
  * either engine).
  */
object SparqlSelect {

  // ---- AST ----
  sealed trait Term
  final case class V(name: String) extends Term
  final case class I(iri: String) extends Term
  final case class L(value: String) extends Term

  /** One triple pattern; the predicate is always a constant IRI. */
  final case class Pattern(s: Term, p: String, o: Term)

  /** `?variable op rhs` — rhs either integer or string literal. */
  final case class Cond(v: String, op: String, rhs: Either[Long, String])

  final case class Query(
      selectVars: Seq[String], // empty = SELECT * (expand in compile)
      required: Seq[Pattern],
      optionals: Seq[Seq[Pattern]],
      filters: Seq[Cond],
      distinct: Boolean,
      orderBy: Seq[(String, Boolean)], // (var, ascending)
      limit: Option[Int])

  def apply(triples: DataFrame, queryText: String): DataFrame =
    compile(triples, parse(queryText))

  // ---- tokenizer ----

  private val Tok = (
    """\s*(<[^>\s]*>|"(?:[^"\\]|\\.)*"|\?\w+|&&|!=|<=|>=|=|<|>|""" +
      """\{|\}|\(|\)|\.|;|\*|[A-Za-z_][\w-]*:[\w.-]*|-?\d+|\w+)""").r

  private def tokenize(q: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var rest = q.trim
    while (rest.nonEmpty) {
      Tok.findPrefixMatchOf(rest) match {
        case Some(m) =>
          out += m.group(1)
          rest = rest.substring(m.end).trim
        case None =>
          throw new IllegalArgumentException(
            s"SPARQL: cannot tokenize at: ${rest.take(40)}")
      }
    }
    out.result()
  }

  // ---- parser (recursive descent over the token vector) ----

  def parse(q: String): Query = new Parser(tokenize(q)).query()

  private final class Parser(ts: Vector[String]) {
    private var i = 0
    private def peek: String = if (i < ts.size) ts(i) else ""
    private def next(): String = { val t = peek; i += 1; t }
    private def expect(t: String): Unit = {
      val g = next()
      if (!g.equalsIgnoreCase(t)) throw new IllegalArgumentException(
        s"SPARQL: expected '$t' but found '$g'")
    }
    private def kw(t: String): Boolean = peek.equalsIgnoreCase(t)

    private var prefixes: Map[String, String] = Vocab.namespaces

    private def resolve(tok: String): String =
      if (tok.startsWith("<")) tok.substring(1, tok.length - 1)
      else {
        val c = tok.indexOf(':')
        require(c > 0, s"SPARQL: expected an IRI or pname, got '$tok'")
        val (p, local) = (tok.substring(0, c), tok.substring(c + 1))
        // SPARQL pnames are case-sensitive: `PREFIX Foo:` and
        // `PREFIX foo:` are distinct declarations.
        prefixes.get(p).map(_ + local).getOrElse(
          throw new IllegalArgumentException(
            s"SPARQL: undeclared prefix '$p'"))
      }

    private def term(): Term = {
      val t = next()
      if (t.startsWith("?")) V(t.substring(1))
      else if (t.startsWith("\"")) L(unquote(t))
      else I(resolve(t))
    }

    private def pred(): String = {
      val t = next()
      if (t == "a") RdfType else resolve(t)
    }

    private def unquote(t: String): String =
      t.substring(1, t.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\")

    /** `term pred obj (';' pred obj)* '.'?` */
    private def triples(): Seq[Pattern] = {
      val s = term()
      val out = Seq.newBuilder[Pattern]
      out += Pattern(s, pred(), term())
      while (peek == ";") { next(); out += Pattern(s, pred(), term()) }
      if (peek == ".") next()
      out.result()
    }

    private def cond(): Cond = {
      val v = next()
      require(v.startsWith("?"), s"SPARQL: FILTER lhs must be a var, got '$v'")
      val op = next()
      require(Set("=", "!=", "<", "<=", ">", ">=").contains(op),
        s"SPARQL: unsupported FILTER op '$op'")
      val r = next()
      val rhs = if (r.startsWith("\"")) Right(unquote(r)) else Left(r.toLong)
      Cond(v.substring(1), op, rhs)
    }

    def query(): Query = {
      while (kw("PREFIX")) {
        next()
        val p = next()
        require(p.endsWith(":"), s"SPARQL: bad prefix decl '$p'")
        val iri = next()
        require(iri.startsWith("<"), s"SPARQL: prefix IRI must be <...>")
        prefixes += (p.dropRight(1) ->
          iri.substring(1, iri.length - 1))
      }
      expect("SELECT")
      val dist = kw("DISTINCT")
      if (dist) next()
      val vars = Seq.newBuilder[String]
      var star = false
      if (peek == "*") { next(); star = true }
      else while (peek.startsWith("?")) vars += next().substring(1)
      expect("WHERE"); expect("{")
      val req = Seq.newBuilder[Pattern]
      val opts = Seq.newBuilder[Seq[Pattern]]
      val fils = Seq.newBuilder[Cond]
      while (peek != "}") {
        if (kw("OPTIONAL")) {
          next(); expect("{")
          opts += triples()
          expect("}")
        } else if (kw("FILTER")) {
          next(); expect("(")
          fils += cond()
          while (peek == "&&") { next(); fils += cond() }
          expect(")")
        } else req ++= triples()
      }
      expect("}")
      val order = Seq.newBuilder[(String, Boolean)]
      if (kw("ORDER")) {
        next(); expect("BY")
        var more = true
        while (more) {
          if (peek.startsWith("?")) order += ((next().substring(1), true))
          else if (kw("ASC") || kw("DESC")) {
            val asc = kw("ASC")
            next(); expect("(")
            val v = next()
            require(v.startsWith("?"), s"SPARQL: ORDER BY key must " +
              s"be a var, got '$v'")
            expect(")")
            order += ((v.substring(1), asc))
          } else more = false
        }
        require(order.result().nonEmpty, "SPARQL: empty ORDER BY")
      }
      val limit = if (kw("LIMIT")) { next(); Some(next().toInt) } else None
      require(i == ts.size, s"SPARQL: trailing tokens at '${peek}'")
      val q = Query(if (star) Seq.empty else vars.result(),
        req.result(), opts.result(), fils.result(), dist,
        order.result(), limit)
      require(q.required.nonEmpty, "SPARQL: empty WHERE group")
      q
    }
  }

  // ---- compiler ----

  private def varsOf(p: Pattern): Seq[String] = Seq(p.s, p.o).collect {
    case V(n) => n
  }

  def compile(t: DataFrame, q: Query): DataFrame = {
    val allPats = q.required ++ q.optionals.flatten
    val inOrderVars = allPats.flatMap(varsOf).distinct
    val select = if (q.selectVars.nonEmpty) q.selectVars else inOrderVars
    val unknown = select.filterNot(inOrderVars.contains) ++
      q.filters.map(_.v).filterNot(inOrderVars.contains)
    require(unknown.isEmpty,
      s"SPARQL: unbound variable(s) ${unknown.mkString(", ")}")

    val subjVar = q.required.head.s match {
      case V(n) => Some(n)
      case _ => None
    }
    val starShaped = subjVar.exists { sv =>
      allPats.forall(p => p.s == V(sv) && (p.o match {
        case V(n) => n != sv
        case _ => true
      })) &&
        allPats.flatMap(_.o match { case V(n) => Seq(n); case _ => Nil })
          .groupBy(identity).forall(_._2.size == 1) &&
        (q.required.size + q.optionals.flatten.size) >= 2
    }
    val badKeys = q.orderBy.map(_._1).filterNot(select.contains)
    require(badKeys.isEmpty,
      s"SPARQL: ORDER BY key(s) ${badKeys.mkString(", ")} not in the " +
        "projection")
    val base =
      if (starShaped) pivot(t, q, subjVar.get)
      else joins(t, q)
    val projected = base.select(select.map(col): _*)
    val distinct = if (q.distinct) projected.distinct() else projected
    val ordered =
      if (q.orderBy.isEmpty) distinct
      else distinct.orderBy(q.orderBy.map { case (v, asc) =>
        if (asc) col(v).asc else col(v).desc
      }: _*)
    q.limit.fold(ordered)(ordered.limit)
  }

  /** Numeric variables: any var some FILTER compares to an integer —
    * its binding is cast to int (inside the pivot aggregate, so the
    * compiled plan matches the hand-built star's
    * `min(when(..., obj.cast("int")))`). */
  private def numericVars(q: Query): Set[String] =
    q.filters.collect { case Cond(v, _, Left(_)) => v }.toSet

  /** Vars already bound-and-constrained by a FILTER comparison — the
    * comparison rejects NULL itself, so the required-pattern
    * isNotNull would be redundant (and the hand-built forms omit
    * it). */
  private def filteredVars(q: Query): Set[String] = q.filters.map(_.v).toSet

  private def condCol(c: Cond, v: Column): Column = {
    val rhs: Column = c.rhs match {
      case Left(n) => lit(n.toInt)
      case Right(s) => lit(s)
    }
    c.op match {
      case "=" => v === rhs
      case "!=" => v =!= rhs
      case "<" => v < rhs
      case "<=" => v <= rhs
      case ">" => v > rhs
      case ">=" => v >= rhs
    }
  }

  /** The one-exchange star pivot — [[RdfQueries.bgpStarOf]]'s shape
    * generalized: constant-object patterns become 0/1 match flags,
    * variable-object patterns conditional `min` bindings; required
    * patterns contribute a filter (flag = 1 / binding not null),
    * optional ones don't. */
  private def pivot(t: DataFrame, q: Query, subjVar: String): DataFrame = {
    val nums = numericVars(q)
    val filtered = filteredVars(q)
    val p = col("predicate")
    val allPats = q.required ++ q.optionals.flatten
    val requiredSet = q.required.toSet

    def objExpr(v: String): Column =
      if (nums.contains(v)) col("obj_value").cast("int") else col("obj_value")

    var flagIdx = -1
    // one (aggregate, optional required-condition) per pattern, in
    // pattern order — the same ordering the hand-built forms use
    val aggConds: Seq[(Column, Option[Column])] = allPats.map { pat =>
      pat.o match {
        case V(n) =>
          val agg = min(when(p === pat.p, objExpr(n))).as(n)
          val c = if (requiredSet.contains(pat) && !filtered.contains(n))
            Some(col(n).isNotNull) else None
          (agg, c)
        case o =>
          val ov = o match { case I(x) => x; case L(x) => x; case _ => "" }
          flagIdx += 1
          val name = s"_m$flagIdx"
          val agg = max(when(p === pat.p && col("obj_value") === ov, 1)
            .otherwise(0)).as(name)
          val c = if (requiredSet.contains(pat)) Some(col(name) === 1)
            else None
          (agg, c)
      }
    }
    val aggs = aggConds.map(_._1)
    // A FILTER on the subject variable runs before the rename below,
    // where the grouping column is still named `subject`.
    val conds: Seq[Column] = aggConds.flatMap(_._2) ++
      q.filters.map(c => condCol(c,
        if (c.v == subjVar) col("subject") else col(c.v)))

    t.groupBy(col("subject"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(conds.reduce(_ && _))
      .withColumn(subjVar, col("subject"))
      .drop("subject")
  }

  /** The general BGP evaluation — one filtered scan per pattern,
    * equi-joined on shared variables (cartesian if none — the SPARQL
    * product semantics), OPTIONAL groups as left joins. Exact
    * multiset semantics (no functional-property assumption); at
    * scale each join shuffles on its variable, which is the
    * unavoidable cost of a non-star BGP over a triple store. */
  private def joins(t: DataFrame, q: Query): DataFrame = {
    val nums = numericVars(q)

    def scan(pat: Pattern): DataFrame = {
      var df = t.filter(col("predicate") === pat.p)
      pat.s match {
        case I(iri) => df = df.filter(col("subject") === iri)
        case L(v) => df = df.filter(col("subject") === v)
        case V(_) =>
      }
      pat.o match {
        case I(iri) => df = df.filter(col("obj_value") === iri)
        case L(v) => df = df.filter(col("obj_value") === v)
        case V(_) =>
      }
      val cols = (pat.s match {
        case V(n) => Seq(col("subject").as(n))
        case _ => Nil
      }) ++ (pat.o match {
        case V(n) => Seq(
          (if (nums.contains(n)) col("obj_value").cast("int")
           else col("obj_value")).as(n))
        case _ => Nil
      })
      require(cols.nonEmpty,
        "SPARQL: fully-constant pattern not supported")
      df.select(cols: _*)
    }

    def joinInto(acc: DataFrame, nxt: DataFrame, joinType: String): DataFrame = {
      val common = acc.columns.intersect(nxt.columns).toSeq
      if (common.isEmpty) acc.crossJoin(nxt)
      else acc.join(nxt, common, joinType)
    }

    val required = q.required.map(scan)
      .reduceLeft(joinInto(_, _, "inner"))
    val withOpts = q.optionals.foldLeft(required) { (acc, grp) =>
      joinInto(acc, grp.map(scan).reduceLeft(joinInto(_, _, "inner")), "left")
    }
    q.filters.foldLeft(withOpts)((df, c) => df.filter(condCol(c, col(c.v))))
  }
}
