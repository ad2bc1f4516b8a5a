package graft.rdf

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Turtle codec (SURVEY.md O3/O9; reference:
  * src/export_from_omeka_s.py:50,84 and
  * src/transform_datamodel.py:81–86,129–137 use rdflib's parser and
  * `auto_compact` serializer).
  *
  * Scale design: a Turtle *document* is not line-splittable (prefix
  * directives scope the whole document), so the unit of
  * parallelism is a document — the paginated source already yields
  * page-sized documents (≤100 items each, export_from_omeka_s.py:39),
  * and `parse` runs one document per row via `flatMap` on executors.
  * Serialization is `mapPartitions`: each partition emits its own
  * `@prefix` header + one statement per triple (legal Turtle — the
  * concatenation of Turtle documents is a Turtle document, the same
  * property the reference exploits when appending pages, O2).
  *
  * Parity contract: *graph equality*, not byte equality — rdflib's
  * heuristic prefix compaction is not reproduced (SURVEY §7 "what's
  * hard" #5); round-trip tests assert triple-set equivalence.
  *
  * Supported syntax (superset of what [[serialize]] emits): @prefix /
  * PREFIX directives, IRIs in `<>`, prefixed names, blank nodes
  * (`_:label`), anonymous blank-node property lists (`[ p o ; … ]`),
  * collections (`( o1 o2 … )` → rdf:first/rest/nil chains), short and
  * long (triple-quoted) string literals in both quote styles with
  * `\"\'\\\n\r\t\b\f\u….\U….` escapes, `@lang` tags, `^^` datatypes,
  * numeric and boolean literals (delimiter-checked — `truefoo:x` is a
  * prefixed name), predicate lists (`;`), object lists (`,`), `a` for
  * rdf:type (delimiter-checked, so `a:x` is a prefixed name and
  * `a<iri>` is rdf:type), and comments — the constructs rdflib's own
  * Turtle output uses (reference parse sites:
  * src/export_from_omeka_s.py:50, src/transform_datamodel.py:84).
  *
  * Blank-node scoping: labels are document-scoped in RDF — rdflib
  * emits fresh `_:N` labels per serialization, so the same label in
  * two independently-fetched pages denotes two different nodes. With
  * `scopeBnodeLabels = true` (the multi-document sources opt in),
  * explicit labels are rewritten with a deterministic per-document
  * content-hash prefix: distinct documents never conflate, while
  * re-parsing byte-identical page text still dedups (O2 set
  * semantics). Generated nodes (`[ ]`, collections) are always
  * content-hash-scoped — they are anonymous by construction.
  */
object Turtle {

  // ------------------------------------------------------------------
  // Parsing (O3)
  // ------------------------------------------------------------------

  /** Parse a Dataset of whole Turtle documents into a triple table
    * with set semantics (the rdflib-Graph behavior the reference
    * relies on when re-parsing overlapping pages). */
  def parse(docs: Dataset[String], graphId: String = "default",
      scopeBnodeLabels: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap(parseDocument(_, graphId, scopeBnodeLabels))
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
      .dropDuplicates()
  }

  type FlatTriple =
    (String, String, String, String, String, String, String, String)

  /** Parse one Turtle document. Pure function: safe inside executors. */
  def parseDocument(doc: String, graphId: String = "default",
      scopeBnodeLabels: Boolean = false): Seq[FlatTriple] = {
    val p = new Parser(doc, graphId, scopeBnodeLabels)
    p.parseAll()
  }

  private final class Parser(doc: String, graphId: String,
      scopeLabels: Boolean) {
    private var i = 0
    private val n = doc.length
    private val prefixes = mutable.Map[String, String]()
    private val out = mutable.ArrayBuffer[FlatTriple]()

    /** Deterministic per-document tag (full 128-bit md5 of the text):
      * identical documents re-parse to identical labels (set-semantics
      * dedup still collapses them), distinct documents never collide —
      * a truncated tag would re-conflate labels at corpus scale
      * (birthday bound: 32 bits collide with ~1% probability at just
      * 10k documents; 128 bits are negligible at any realistic N). */
    private lazy val docTag: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
    private var genCounter = 0
    private def freshBnode(): String = {
      genCounter += 1
      s"_:g${docTag}n$genCounter"
    }
    private def scopedLabel(raw: String): String =
      if (scopeLabels) "_:d" + docTag + "_" + raw.substring(2) else raw

    /** The graph receiving parsed triples: `graphId` at top level,
      * the block label inside a TriG graph block. */
    private var currentGraph: String = graphId

    def parseAll(): Seq[FlatTriple] = {
      skipWs()
      while (i < n) {
        if (peekDirective()) parseDirective() else parseBlock()
        skipWs()
      }
      out.toSeq
    }

    /** One top-level unit: a TriG graph block (`GRAPH <g> { … }` or
      * `<g> { … }`) or a plain statement. Accepting the TriG superset
      * unconditionally is safe — plain Turtle never contains `{`. */
    private def parseBlock(): Unit = {
      if (doc.regionMatches(true, i, "GRAPH", 0, 5) && i + 5 < n &&
        !isNameChar(doc.charAt(i + 5)) && doc.charAt(i + 5) != ':') {
        i += 5
        skipWs()
        val (lbl, _) = parseSubject() // iri | prefixed | bnode label
        skipWs()
        if (i >= n || doc.charAt(i) != '{') fail("GRAPH requires '{'")
        i += 1
        parseWrapped(lbl)
      } else if (doc.charAt(i) == '{') {
        // unlabeled wrappedGraph: default-graph triples in a block
        i += 1
        parseWrapped(currentGraph)
      } else {
        val (s, sKind) = parseSubject()
        skipWs()
        if (i < n && doc.charAt(i) == '{') { i += 1; parseWrapped(s) }
        // a standalone blank-node property list statement: "[ p o ] ."
        else if (sKind == "bnode" && i < n && doc.charAt(i) == '.') i += 1
        else parsePOList(s, sKind, '.')
      }
    }

    /** Statements inside `{ … }` land in graph `lbl`; the closing
      * brace restores the enclosing graph. The trailing '.' of the
      * LAST triple before '}' is optional per the TriG grammar
      * (`triples ('.' triplesBlock?)?` — the spec's own examples
      * omit it). */
    private def parseWrapped(lbl: String): Unit = {
      val prev = currentGraph
      currentGraph = lbl
      skipWs()
      while (i < n && doc.charAt(i) != '}') {
        val (s, sKind) = parseSubject()
        skipWs()
        if (sKind == "bnode" && i < n &&
          (doc.charAt(i) == '.' || doc.charAt(i) == '}')) {
          if (doc.charAt(i) == '.') i += 1
        } else parsePOList(s, sKind, '.', stopAtBrace = true)
        skipWs()
      }
      if (i >= n) fail("unterminated graph block")
      i += 1
      currentGraph = prev
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"turtle parse error at offset $i: $msg")

    private def skipWs(): Unit = {
      var go = true
      while (go && i < n) {
        val c = doc.charAt(i)
        if (c == '#') { while (i < n && doc.charAt(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }

    private def peekDirective(): Boolean =
      doc.startsWith("@prefix", i) || doc.startsWith("PREFIX", i) ||
        doc.startsWith("@base", i) || doc.startsWith("BASE", i)

    private def parseDirective(): Unit = {
      val atStyle = doc.charAt(i) == '@'
      if (doc.startsWith("@prefix", i) || doc.startsWith("PREFIX", i)) {
        i += 7 // both keywords are 6–7 chars; adjust below
        if (!atStyle) i -= 1
        skipWs()
        val colon = doc.indexOf(':', i)
        if (colon < 0) fail("prefix name missing ':'")
        val name = doc.substring(i, colon).trim
        i = colon + 1
        skipWs()
        val iri = parseIriRef()
        prefixes(name) = iri
      } else { // @base / BASE — later relative IRIs resolve against it
        i += (if (atStyle) 5 else 4)
        skipWs()
        setBase(parseIriRef())
      }
      skipWs()
      if (atStyle) {
        if (i >= n || doc.charAt(i) != '.') fail("directive missing '.'")
        i += 1
      }
    }

    /** predicateObjectList, terminated by (and consuming) `terminator`
      * — '.' for a top-level statement, ']' inside an anonymous
      * blank-node property list. With `stopAtBrace` (inside a TriG
      * graph block) an unconsumed '}' also ends the statement — the
      * grammar makes the final '.' before '}' optional. */
    private def parsePOList(s: String, sKind: String,
        terminator: Char, stopAtBrace: Boolean = false): Unit = {
      def atBrace: Boolean =
        stopAtBrace && i < n && doc.charAt(i) == '}'
      var done = false
      while (!done) {
        skipWs()
        val pred = parsePredicate()
        var moreObjects = true
        while (moreObjects) {
          skipWs()
          val (ov, oKind, oLang, oDt) = parseObject()
          out += ((currentGraph, s, sKind, pred, ov, oKind, oLang, oDt))
          skipWs()
          if (i < n && doc.charAt(i) == ',') i += 1 else moreObjects = false
        }
        skipWs()
        if (i < n && doc.charAt(i) == ';') {
          i += 1
          skipWs()
          // trailing ';' (possibly repeated) before the terminator is legal
          while (i < n && doc.charAt(i) == ';') { i += 1; skipWs() }
          if (i < n && doc.charAt(i) == terminator) { i += 1; done = true }
          else if (atBrace) done = true
        } else if (i < n && doc.charAt(i) == terminator) {
          i += 1; done = true
        } else if (atBrace) {
          done = true
        } else fail(s"expected '$terminator', ';' or ','")
      }
    }

    private def parseSubject(): (String, String) = {
      val c = doc.charAt(i)
      if (c == '<') (parseIriRef(), "iri")
      else if (doc.startsWith("_:", i)) (parseBnode(), "bnode")
      else if (c == '[') (parseBnodePropertyList(), "bnode")
      else if (c == '(') parseCollection()
      else (parsePrefixedName(), "iri")
    }

    /** Name-ish character — used for the delimiter checks on the `a`
      * keyword and boolean literals. */
    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-'

    private def parsePredicate(): String = {
      val c = doc.charAt(i)
      if (c == '<') parseIriRef()
      // 'a' is the rdf:type keyword iff NOT part of a longer name or a
      // prefixed name ("a:x"); any delimiter (whitespace, '<', '[', …)
      // after it is legal per the grammar
      else if (c == 'a' && (i + 1 >= n ||
        (!isNameChar(doc.charAt(i + 1)) && doc.charAt(i + 1) != ':'))) {
        i += 1; Vocab.RdfType
      } else parsePrefixedName()
    }

    private def parseObject(): (String, String, String, String) = {
      val c = doc.charAt(i)
      if (c == '<') (parseIriRef(), "iri", null, null)
      else if (doc.startsWith("_:", i)) (parseBnode(), "bnode", null, null)
      else if (c == '[') (parseBnodePropertyList(), "bnode", null, null)
      else if (c == '(') {
        val (v, k) = parseCollection(); (v, k, null, null)
      }
      else if (c == '"' || c == '\'') parseLiteral()
      else if (c.isDigit || c == '-' || c == '+' ||
        (c == '.' && i + 1 < n && doc.charAt(i + 1).isDigit))
        parseNumber()
      else if (boolAhead() != null) parseBoolean()
      else (parsePrefixedName(), "iri", null, null)
    }

    /** Anonymous blank-node property list `[ p o ; … ]` (also the
      * empty `[]`): a fresh content-scoped node carrying the inner
      * triples. */
    private def parseBnodePropertyList(): String = {
      i += 1 // '['
      val label = freshBnode()
      skipWs()
      if (i < n && doc.charAt(i) == ']') { i += 1; label }
      else { parsePOList(label, "bnode", ']'); label }
    }

    /** Collection `( o1 o2 … )` → the standard rdf:first/rdf:rest
      * chain; `()` is rdf:nil. Returns the head term. */
    private def parseCollection(): (String, String) = {
      i += 1 // '('
      val items =
        mutable.ArrayBuffer[(String, String, String, String)]()
      skipWs()
      while (i < n && doc.charAt(i) != ')') { items += parseObject(); skipWs() }
      if (i >= n) fail("unterminated collection")
      i += 1
      if (items.isEmpty) (Vocab.RdfNil, "iri")
      else {
        val nodes = items.indices.map(_ => freshBnode())
        items.indices.foreach { j =>
          val (ov, oKind, oLang, oDt) = items(j)
          out += ((currentGraph, nodes(j), "bnode", Vocab.RdfFirst,
            ov, oKind, oLang, oDt))
          val (rv, rk) =
            if (j + 1 < nodes.size) (nodes(j + 1), "bnode")
            else (Vocab.RdfNil, "iri")
          out += ((currentGraph, nodes(j), "bnode", Vocab.RdfRest,
            rv, rk, null, null))
        }
        (nodes.head, "bnode")
      }
    }

    private var base: String = null
    // parsed once per @base directive, not once per IRI reference —
    // a 100k-triple document would otherwise re-parse the base string
    // for every term
    private var baseUri: java.net.URI = null

    private def setBase(b: String): Unit = {
      base = b
      baseUri = try new java.net.URI(b) catch { case _: Exception => null }
    }

    private def parseIriRef(): String = {
      if (doc.charAt(i) != '<') fail("expected '<'")
      val end = doc.indexOf('>', i + 1)
      if (end < 0) fail("unterminated IRI")
      val iri = doc.substring(i + 1, end)
      i = end + 1
      resolveAgainstBase(iri)
    }

    /** Relative IRIs resolve against the in-scope @base (rdflib
      * parity) — including the empty reference `<>`, which RFC 3986
      * resolves to the base itself (the common `<> dcterms:title …`
      * self-reference idiom); absolute IRIs (scheme present) and
      * documents without a base pass through untouched. Malformed
      * references stay raw — the IRI-validity filters downstream are
      * the cleaning pass. */
    private def resolveAgainstBase(iri: String): String = {
      if (base == null) return iri
      if (iri.isEmpty) return base
      val hasScheme = {
        val c = iri.indexOf(':')
        c > 0 && iri.substring(0, c).forall(ch =>
          ch.isLetterOrDigit || ch == '+' || ch == '-' || ch == '.') &&
          iri.charAt(0).isLetter
      }
      if (hasScheme || baseUri == null) iri
      else try baseUri.resolve(iri).toString
      catch { case _: Exception => iri }
    }

    private def parseBnode(): String = {
      val start = i
      i += 2
      while (i < n && (doc.charAt(i).isLetterOrDigit ||
        doc.charAt(i) == '_' || doc.charAt(i) == '-')) i += 1
      scopedLabel(doc.substring(start, i))
    }

    /** Characters a backslash may escape inside a PN_LOCAL (the
      * grammar's PN_LOCAL_ESC set) — rdflib emits these for local
      * names containing reserved chars. */
    private val pnLocalEsc = "_~.-!$&'()*+,;=/?#@%"

    private def parsePrefixedName(): String = {
      val start = i
      // PN_PREFIX allows interior dots ("ex.v2:name"); the scan stops
      // only at ':' or a hard delimiter, so a declared dotted prefix
      // is also usable at its reference sites
      while (i < n && !doc.charAt(i).isWhitespace &&
        !";,{}".contains(doc.charAt(i)) && doc.charAt(i) != ':' &&
        // a '.' can't END the prefix — stop there only when the next
        // char can't continue a name toward ':'
        !(doc.charAt(i) == '.' && (i + 1 >= n ||
          !isNameChar(doc.charAt(i + 1)))))
        i += 1
      if (i >= n || doc.charAt(i) != ':')
        fail(s"expected prefixed name, got '${doc.substring(start, i)}'")
      val prefix = doc.substring(start, i)
      i += 1
      val local = new StringBuilder
      var go = true
      while (go && i < n) {
        val c = doc.charAt(i)
        if (c == '\\' && i + 1 < n && pnLocalEsc.contains(doc.charAt(i + 1))) {
          local += doc.charAt(i + 1) // PN_LOCAL_ESC: "\." means "."
          i += 2
        } else if (c.isWhitespace || c == ';' || c == ',' ||
          c == ')' || c == ']' || c == '{' || c == '}' ||
          // a '.' ends the local name only before whitespace, EOF, or
          // a closing delimiter (e.g. "ex:o.}" inside a graph block)
          (c == '.' && (i + 1 >= n || doc.charAt(i + 1).isWhitespace ||
            "})];,".contains(doc.charAt(i + 1))))) {
          go = false
        } else { local += c; i += 1 }
      }
      prefixes.get(prefix) match {
        case Some(ns) => ns + local.toString
        case None => fail(s"undeclared prefix '$prefix'")
      }
    }

    /** String literal in either quote style, short (`"…"` / `'…'`) or
      * long (`\"\"\"…\"\"\"` / `'''…'''`). Long literals take raw
      * newlines and embedded quotes (runs shorter than the closing
      * delimiter), as rdflib emits for multi-line values. */
    private def parseLiteral(): (String, String, String, String) = {
      val quote = doc.charAt(i)
      val isLong = i + 2 < n && doc.charAt(i + 1) == quote &&
        doc.charAt(i + 2) == quote
      val sb = new StringBuilder
      if (isLong) {
        i += 3
        var closed = false
        while (!closed) {
          if (i >= n) fail("unterminated long literal")
          val c = doc.charAt(i)
          if (c == '\\') readEscape(sb)
          else if (c == quote) {
            var run = 0
            while (i < n && doc.charAt(i) == quote) { run += 1; i += 1 }
            if (run >= 3) {
              (0 until run - 3).foreach(_ => sb += quote)
              closed = true
            } else (0 until run).foreach(_ => sb += quote)
          } else { sb += c; i += 1 }
        }
      } else {
        i += 1 // opening quote
        while (i < n && doc.charAt(i) != quote) {
          val c = doc.charAt(i)
          if (c == '\\') readEscape(sb) else { sb += c; i += 1 }
        }
        if (i >= n) fail("unterminated literal")
        i += 1 // closing quote
      }
      if (doc.startsWith("@", i)) {
        i += 1
        val start = i
        while (i < n && (doc.charAt(i).isLetterOrDigit ||
          doc.charAt(i) == '-')) i += 1
        (sb.toString, "literal", doc.substring(start, i), null)
      } else if (doc.startsWith("^^", i)) {
        i += 2
        val dt = if (doc.charAt(i) == '<') parseIriRef()
        else parsePrefixedName()
        (sb.toString, "literal", null, dt)
      } else (sb.toString, "literal", null, null)
    }

    private def parseNumber(): (String, String, String, String) = {
      val start = i
      if (doc.charAt(i) == '-' || doc.charAt(i) == '+') i += 1
      var isDecimal = false
      var isDouble = false
      while (i < n && (doc.charAt(i).isDigit ||
        (doc.charAt(i) == '.' && i + 1 < n && doc.charAt(i + 1).isDigit))) {
        if (doc.charAt(i) == '.') isDecimal = true
        i += 1
      }
      // exponent ⇒ xsd:double ("1.2e3", "4E-5" — the grammar's DOUBLE)
      if (i < n && (doc.charAt(i) == 'e' || doc.charAt(i) == 'E')) {
        var j = i + 1
        if (j < n && (doc.charAt(j) == '-' || doc.charAt(j) == '+')) j += 1
        if (j < n && doc.charAt(j).isDigit) {
          isDouble = true
          i = j
          while (i < n && doc.charAt(i).isDigit) i += 1
        }
      }
      val dt =
        if (isDouble) "http://www.w3.org/2001/XMLSchema#double"
        else if (isDecimal) "http://www.w3.org/2001/XMLSchema#decimal"
        else Vocab.XsdInteger
      (doc.substring(start, i), "literal", null, dt)
    }

    private def readEscape(sb: StringBuilder): Unit = {
      i += 1 // backslash
      if (i >= n) fail("dangling escape")
      doc.charAt(i) match {
        case 't' => sb += '\t'
        case 'n' => sb += '\n'
        case 'r' => sb += '\r'
        case 'b' => sb += '\b'
        case 'f' => sb += '\f'
        case '"' => sb += '"'
        case '\'' => sb += '\''
        case '\\' => sb += '\\'
        case 'u' =>
          sb += Integer.parseInt(doc.substring(i + 1, i + 5), 16).toChar
          i += 4
        case 'U' =>
          val cp = Integer.parseInt(doc.substring(i + 1, i + 9), 16)
          sb.appendAll(Character.toChars(cp))
          i += 8
        case other => fail(s"unsupported escape '\\$other'")
      }
      i += 1
    }

    /** The boolean keyword ahead, or null — a boolean must be followed
      * by a delimiter, so `truefoo:x` parses as a prefixed name. */
    private def boolAhead(): String = {
      val v =
        if (doc.startsWith("true", i)) "true"
        else if (doc.startsWith("false", i)) "false"
        else null
      if (v == null) null
      else {
        val j = i + v.length
        if (j >= n || (!isNameChar(doc.charAt(j)) && doc.charAt(j) != ':'))
          v
        else null
      }
    }

    private def parseBoolean(): (String, String, String, String) = {
      val v = boolAhead()
      i += v.length
      (v, "literal", null, Vocab.XsdBoolean)
    }
  }

  // ------------------------------------------------------------------
  // Serialization (O9)
  // ------------------------------------------------------------------

  /** Serialize a triple table to Turtle lines. Each partition is a
    * self-contained Turtle document (own @prefix header); write with
    * `.write.text(...)` for a sharded corpus or `coalesce(1)` for the
    * reference's single-file parity. `sortWithinPartitions("subject")`
    * groups statements per subject without a global sort. */
  def serialize(df: DataFrame,
      prefixes: Map[String, String] = Vocab.namespaces): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pfx = prefixes.toSeq.sortBy(_._1) // deterministic header order
    df.select("subject", "subject_kind", "predicate", "obj_value",
        "obj_kind", "obj_lang", "obj_datatype")
      .sortWithinPartitions("subject")
      .mapPartitions { rows =>
        val body = rows.map { r =>
          statement(r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getString(5), r.getString(6),
            pfx)
        }
        if (rows.isEmpty) Iterator.empty else header(pfx).iterator ++ body
      }
  }

  /** The `@prefix` header lines for a Turtle document. */
  def header(pfx: Seq[(String, String)]): Seq[String] =
    pfx.map { case (p, ns) => s"@prefix $p: <$ns> ." }

  /** TriG serialization — Turtle's graph-aware superset: rows in the
    * default graph emit as plain statements, every other graph id
    * emits inside a `GRAPH <id> { … }` block (one block per
    * statement: TriG unions repeated labels, and per-row blocks keep
    * the iterator streaming — no per-graph buffering). This is the
    * sink that round-trips the graph column; plain Turtle cannot
    * encode it. Non-IRI graph ids other than `defaultGraph` are the
    * caller's responsibility (TriG labels are IRIs or bnode labels). */
  def serializeTrig(df: DataFrame,
      prefixes: Map[String, String] = Vocab.namespaces,
      defaultGraph: String = "default"): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pfx = prefixes.toSeq.sortBy(_._1)
    df.select("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
      .sortWithinPartitions("graph", "subject")
      .mapPartitions { rows =>
        val body = rows.map { r =>
          trigStatement(r.getString(0),
            statement(r.getString(1), r.getString(2), r.getString(3),
              r.getString(4), r.getString(5), r.getString(6),
              r.getString(7), pfx),
            defaultGraph)
        }
        if (rows.isEmpty) Iterator.empty else header(pfx).iterator ++ body
      }
  }

  /** Wrap one serialized statement in its TriG graph block (or leave
    * it bare for the default graph) — the single kernel shared by
    * [[serializeTrig]] and the DSv2 `syntax=trig` writer. */
  def trigStatement(graph: String, stmt: String,
      defaultGraph: String): String =
    if (graph == defaultGraph) stmt
    else {
      val lbl = if (graph.startsWith("_:")) graph else s"<$graph>"
      s"GRAPH $lbl { $stmt }"
    }

  /** One Turtle statement line for a flat triple — the per-row kernel
    * shared by [[serialize]] and the `turtle` DSv2 writer. */
  def statement(subject: String, subjectKind: String, predicate: String,
      objValue: String, objKind: String, objLang: String,
      objDatatype: String, pfx: Seq[(String, String)]): String = {
    val subj = term(subject, subjectKind, pfx)
    val pred = compact(predicate, pfx)
    val obj = objectTerm(objValue, objKind, objLang, objDatatype, pfx)
    s"$subj $pred $obj ."
  }

  /** Like [[serialize]] but emits one whole self-contained Turtle
    * document per partition — the shape [[parse]] consumes, and the
    * unit a sharded Turtle corpus would store per file. */
  def serializeDocuments(df: DataFrame,
      prefixes: Map[String, String] = Vocab.namespaces): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    serialize(df, prefixes).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator(it.mkString("\n"))
    }
  }

  /** N-Triples serialization — the line-splittable interchange
    * subset (rdflib's `format="nt"`, the reference's
    * OUTPUT_FILE_FORMAT knob at transform_datamodel.py:129–137
    * accepts any rdflib format name): one triple per line, absolute
    * `<IRI>`s, no prefix header, newlines always escaped (never
    * long-quoted). The property that matters at 100 TB: an
    * N-Triples corpus is re-readable by ANY line-oriented source
    * (`spark.read.text` + per-LINE parse — arbitrary splits, no
    * document atomicity), which Turtle fundamentally lacks. Every
    * N-Triples document is valid Turtle, so [[parse]] round-trips
    * it. */
  def serializeNTriples(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    // no subject sort: N-Triples lines are self-contained and
    // order-independent (the ttl/trig sort exists to group subject
    // blocks for compaction) — a per-partition corpus sort would be
    // pure waste here
    df.select("subject", "subject_kind", "predicate", "obj_value",
        "obj_kind", "obj_lang", "obj_datatype")
      .mapPartitions(_.map { r =>
        ntStatement(r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getString(5), r.getString(6))
      })
  }

  /** One N-Triples statement line — the per-row kernel shared by
    * [[serializeNTriples]] and the `turtle` DSv2 `syntax=nt` writer.
    */
  def ntStatement(subject: String, subjectKind: String, predicate: String,
      objValue: String, objKind: String, objLang: String,
      objDatatype: String): String = {
    val subj = if (subjectKind == "bnode") subject else s"<$subject>"
    val obj = objKind match {
      case "iri" => s"<$objValue>"
      case "bnode" => objValue
      case _ =>
        val quoted = "\"" + escape(objValue) + "\""
        if (objLang != null) s"$quoted@$objLang"
        else if (objDatatype != null) s"$quoted^^<$objDatatype>"
        else quoted
    }
    s"$subj <$predicate> $obj ."
  }

  private def term(value: String, kind: String,
      pfx: Seq[(String, String)]): String =
    if (kind == "bnode") value else compact(value, pfx)

  private def objectTerm(value: String, kind: String, lang: String,
      datatype: String, pfx: Seq[(String, String)]): String = kind match {
    case "iri" => compact(value, pfx)
    case "bnode" => value
    case _ =>
      // multi-line values go out long-quoted with raw newlines, the
      // form rdflib emits; every embedded quote is escaped so no
      // accidental '"""' run can close the literal early
      val quoted =
        if (value.indexOf('\n') >= 0 || value.indexOf('\r') >= 0)
          "\"\"\"" + escapeLong(value) + "\"\"\""
        else "\"" + escape(value) + "\""
      if (lang != null) s"$quoted@$lang"
      else if (datatype != null) s"$quoted^^${compact(datatype, pfx)}"
      else quoted
  }

  /** Prefix compaction: longest matching namespace wins; falls back
    * to `<iri>`. The local part must be a simple name (no '/', '#')
    * for the prefixed form to round-trip. */
  private def compact(iri: String, pfx: Seq[(String, String)]): String = {
    var best: (String, String) = null
    pfx.foreach { case (p, ns) =>
      if (iri.startsWith(ns) && (best == null || ns.length > best._2.length))
        best = (p, ns)
    }
    if (best != null) {
      val local = iri.substring(best._2.length)
      if (local.nonEmpty && local.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-'))
        return s"${best._1}:$local"
    }
    s"<$iri>"
  }

  /** Escapes for a long (triple-quoted) literal: backslash and quote
    * only — newlines/tabs stay raw. */
  private def escapeLong(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }
}
