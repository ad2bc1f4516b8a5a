package graft.rdf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.SerializableHadoopConf

/** SINGLE-DOCUMENT Turtle at scale: a one-file 100 GB Turtle dump is
  * one `wholetext` task (and one > 2 GB String) for the per-document
  * parser — this parser instead splits the file into byte-range
  * CHUNKS that parse in parallel, with statement-boundary resync at
  * chunk edges. Two distributed passes:
  *
  *  1. LEXICAL STATE PASS: a chunk cannot know locally whether it
  *     starts inside a long literal/IRI/comment, so each chunk runs
  *     a small lexical DFA over its bytes once for EVERY possible
  *     start state (a transition VECTOR — the parallel-parenthesis-
  *     matching construction), and the driver composes the per-chunk
  *     vectors in order to assign each chunk its true start state.
  *     Metadata exchanged is one |states|-vector per chunk.
  *  2. PARSE PASS: each chunk, from its true state, scans to its
  *     first top-level statement boundary (a `.` in default lexical
  *     state followed by whitespace/comment/EOF — names and numbers
  *     never match because their dots are followed by name/digit
  *     chars), then parses every statement STARTING in its range,
  *     reading past its range end to finish the straddler (the
  *     TextInputFormat convention). Both neighbours compute the
  *     shared cut as "first dot at-or-after the range edge", so
  *     regions tile the file exactly — no gaps, no overlaps.
  *     Statements are handed to the ordinary [[Turtle]] parser, so
  *     chunking adds NO second grammar implementation.
  *
  * Boundary safety: chunk edges land on ASCII (`.` + whitespace)
  * positions, so multi-byte UTF-8 sequences are never split across
  * regions; continuation bytes step the DFA as ordinary characters
  * and cannot forge a dot.
  *
  * PREFIX CONTRACT: `@prefix`/`PREFIX` directives must form a
  * directive HEAD at the top of the file (one directive per line —
  * the layout every common serializer, including [[Turtle.serialize]]
  * and rdflib, produces). The head is read once on the driver and
  * prepended verbatim to every chunk's region. A directive at a
  * statement start in the BODY of a later chunk would silently scope
  * to one chunk, so pass 2 detects it (`@` at a top-level statement
  * start — language tags never sit at statement starts) and fails
  * loudly. TriG graph blocks (`{`) are rejected the same way: a
  * block spanning chunks would mis-scope graph labels; multi-graph
  * corpora use the per-file source instead.
  *
  * Scale shape: pass 1 is one sequential byte scan per chunk (the
  * |states|-way vector is a constant factor; a production variant
  * composes 256-entry transition matrices per block instead), pass 2
  * one scan + parse; the only driver-side data is the chunk-state
  * table (one row per chunk). Blank-node safety across chunks: the
  * per-document content-hash tag makes each chunk's GENERATED nodes
  * collision-free, while explicit `_:label`s pass through raw and
  * keep meaning document-wide.
  */
object TurtleChunked {

  // ---- lexical DFA ----
  // states: 0 default, 1 comment, 2 IRI, 3 short-', 4 short-",
  // 5 short-'-esc, 6 short-"-esc, 7 long-', 8 long-' q1, 9 long-' q2,
  // 10 long-'-esc, 11 long-", 12 long-" q1, 13 long-" q2,
  // 14 long-"-esc, 15 opened-', 16 opened-'', 17 opened-",
  // 18 opened-""
  private[rdf] val NStates = 19
  private final val Default = 0

  private[rdf] def step(state: Int, c: Char): Int = (state: @annotation.switch) match {
    case 0 => c match {
      case '#' => 1
      case '<' => 2
      case '\'' => 15
      case '"' => 17
      case _ => 0
    }
    case 1 => if (c == '\n') 0 else 1
    case 2 => if (c == '>') 0 else 2
    case 3 => c match { case '\'' => 0; case '\\' => 5; case _ => 3 }
    case 4 => c match { case '"' => 0; case '\\' => 6; case _ => 4 }
    case 5 => 3
    case 6 => 4
    case 7 => c match { case '\'' => 8; case '\\' => 10; case _ => 7 }
    case 8 => c match { case '\'' => 9; case '\\' => 10; case _ => 7 }
    case 9 => c match { case '\'' => 0; case '\\' => 10; case _ => 7 }
    case 10 => 7
    case 11 => c match { case '"' => 12; case '\\' => 14; case _ => 11 }
    case 12 => c match { case '"' => 13; case '\\' => 14; case _ => 11 }
    case 13 => c match { case '"' => 0; case '\\' => 14; case _ => 11 }
    case 14 => 11
    case 15 => c match { case '\'' => 16; case '\\' => 5; case _ => 3 }
    case 16 => if (c == '\'') 7 else step(0, c) // '' was an empty string
    case 17 => c match { case '"' => 18; case '\\' => 6; case _ => 4 }
    case 18 => if (c == '"') 11 else step(0, c) // "" was an empty string
  }

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** States 16/18 (just closed an EMPTY short literal, `''`/`""`)
    * are default-equivalent for every next char except the third
    * quote: a statement dot can legally follow them with no
    * intervening whitespace (`<s> <p> '' .` minus the space), and the
    * boundary/ownership predicates test BEFORE stepping — so they
    * must accept a dot in these states or both neighbours extend the
    * region past the chunk edge and skip the fail-loudly checks for
    * one statement. */
  private def isDefaultLike(state: Int): Boolean =
    state == Default || state == 16 || state == 18

  /** One chunk's DFA end state for every possible start state. */
  private def transitionVector(bytes: Array[Byte]): Array[Int] = {
    val v = Array.tabulate(NStates)(identity)
    var i = 0
    while (i < bytes.length) {
      val c = (bytes(i) & 0xff).toChar
      var k = 0
      while (k < NStates) { v(k) = step(v(k), c); k += 1 }
      i += 1
    }
    v
  }

  private final case class Chunk(idx: Int, start: Long, end: Long)

  /** Parse one (possibly huge) Turtle file into the canonical triple
    * table, `chunkBytes` per parallel task. Set semantics, like
    * [[Turtle.parse]]. */
  def parse(spark: SparkSession, path: String,
      graphId: String = "default",
      chunkBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(chunkBytes >= 1024, "chunkBytes must be >= 1 KiB")
    import spark.implicits._
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val len = fs.getFileStatus(p).getLen

    // driver-side head: the maximal leading run of blank, comment and
    // directive lines (one directive per line — the contract above)
    val headLen: Long = {
      val in = fs.open(p)
      val buf = new Array[Byte](math.min(len, 1L << 20).toInt)
      try in.readFully(0L, buf, 0, buf.length) finally in.close()
      val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      var consumed = 0
      var done = false
      text.linesWithSeparators.foreach { line =>
        if (!done) {
          val t = line.trim
          val isDirective = t.isEmpty || t.startsWith("#") ||
            t.startsWith("@prefix") || t.startsWith("@base") ||
            t.toUpperCase.startsWith("PREFIX ") ||
            t.toUpperCase.startsWith("BASE ")
          if (isDirective) consumed += line.length else done = true
        }
      }
      // a directive run that reaches the probe cap is ambiguous: the
      // final probed line may be truncated mid-directive (or the head
      // may simply continue past the buffer), which would put headLen
      // mid-line and prepend a corrupt header to every chunk — fail
      // loudly rather than guess
      if (!done && buf.length < len) throw new IllegalArgumentException(
        s"TurtleChunked: directive head exceeds the ${buf.length}-byte " +
          "probe — file has an abnormally long prefix/comment header; " +
          "use the per-file Turtle source")
      text.substring(0, consumed)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
    }
    val head: String = {
      val in = fs.open(p)
      val buf = new Array[Byte](headLen.toInt)
      try in.readFully(0L, buf, 0, buf.length) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    }

    val chunks = (headLen until len by chunkBytes).zipWithIndex.map {
      case (start, idx) => Chunk(idx, start, math.min(start + chunkBytes, len))
    }
    if (chunks.isEmpty) return Turtle.parse(Seq(head).toDS(), graphId)

    // pass 1: per-chunk transition vectors → composed true states.
    // Function composition is ASSOCIATIVE, so the prefix composition
    // is a fold over the (tiny, one-row-per-chunk) vector table —
    // done with SQL higher-order functions on a single collected-
    // list row and exploded back to (idx, startState): the data
    // never leaves the cluster, and the fold input is chunk-count ×
    // NStates ints (metadata-scale by construction).
    val vecDf = spark.sparkContext
      .parallelize(chunks, chunks.size)
      .map { ch =>
        val f = new Path(path).getFileSystem(conf.value)
        val in = f.open(new Path(path))
        val buf = new Array[Byte]((ch.end - ch.start).toInt)
        try in.readFully(ch.start, buf, 0, buf.length) finally in.close()
        (ch.idx, transitionVector(buf))
      }
      .toDF("idx", "vec")
    val statesDf = vecDf
      .agg(org.apache.spark.sql.functions.expr(
        "sort_array(collect_list(struct(idx, vec)))").as("vs"))
      // prefix states: acc(i) = start state of chunk i; each step
      // appends vec[acc.last + 1] (element_at is 1-based)
      .selectExpr(
        s"""aggregate(vs, array($Default),
           |  (acc, x) -> concat(acc,
           |    array(element_at(x.vec, element_at(acc, -1) + 1))))
           |  AS states""".stripMargin)
      .selectExpr("posexplode(slice(states, 1, size(states) - 1)) " +
        "AS (idx, startState)")
    val chunkDf = chunks
      .map(c => (c.idx, c.start, c.end)).toDF("idx", "start", "end")

    // pass 2: resync + parse owned statements
    val triples = chunkDf.join(statesDf, "idx")
      .select("idx", "start", "end", "startState")
      .as[(Int, Long, Long, Int)]
      .flatMap { case (idx, start, end, startState) =>
        val f = new Path(path).getFileSystem(conf.value)
        val in = f.open(new Path(path))
        try {
          val fileLen = f.getFileStatus(new Path(path)).getLen
          in.seek(start)
          var buf = new java.io.BufferedInputStream(in, 1 << 16)
          var pos = start
          var state = startState
          var cur: Int = if (pos < fileLen) buf.read() else -1
          def advance(): Unit = {
            state = step(state, (cur & 0xff).toChar)
            pos += 1
            cur = if (pos < fileLen) buf.read() else -1
          }
          // the first dot at-or-after `from` in default state whose
          // successor is ws/#/EOF; returns the position AFTER it, or
          // -1 when the scan runs past `scanLimit` without one
          def nextBoundary(scanLimit: Long): Long = {
            while (cur >= 0 && pos < scanLimit) {
              if (isDefaultLike(state) && cur == '.') {
                advance()
                if (cur < 0 || isWs(cur) || cur == '#') return pos
              } else advance()
            }
            if (cur < 0) fileLen else -1L
          }
          val regionStart =
            if (idx == 0) start
            else nextBoundary(end) match {
              case -1L => -1L // whole chunk inside one statement
              case b => b
            }
          if (regionStart < 0) Iterator.empty
          else {
            // collect bytes from regionStart to the first boundary
            // at-or-after `end` (statements starting before `end`
            // are ours; the straddler is finished by reading on)
            val outBytes = new java.io.ByteArrayOutputStream()
            // reposition: the resync consumed ahead; regionStart ≤
            // pos always (the boundary was just passed)
            in.seek(regionStart)
            buf = new java.io.BufferedInputStream(in, 1 << 16)
            pos = regionStart
            state = Default
            cur = if (pos < fileLen) buf.read() else -1
            var atStatementStart = true
            var stop = false
            while (!stop && cur >= 0) {
              if (isDefaultLike(state) && cur == '.') {
                outBytes.write(cur)
                advance()
                if (cur < 0 || isWs(cur) || cur == '#') {
                  // ownership is by DOT position (pos - 1 here, after
                  // the advance): the statement following a dot in
                  // [start, end) is ours — the same convention the
                  // resync uses, so a statement starting exactly at a
                  // chunk edge has exactly one owner
                  if (pos - 1 >= end) stop = true
                  else atStatementStart = true
                }
              } else {
                if (state == Default && (cur == '{' || cur == '}'))
                  throw new IllegalArgumentException(
                    "TurtleChunked: TriG graph blocks are not chunkable " +
                      "— use the per-file Turtle/TriG source")
                if (state == Default && atStatementStart && !isWs(cur)) {
                  // chunk 0's region starts past the head by
                  // construction, so ANY top-level directive here —
                  // in any chunk — is a body directive: fail loudly
                  if (cur == '@') throw new IllegalArgumentException(
                    s"TurtleChunked: directive at byte ${pos} is outside " +
                      "the file's directive head — chunked parsing " +
                      "requires all prefix/base directives in the head")
                  atStatementStart = false
                }
                outBytes.write(cur)
                advance()
              }
            }
            val region = new String(outBytes.toByteArray,
              java.nio.charset.StandardCharsets.UTF_8)
            Turtle.parseDocument(head + "\n" + region, graphId).iterator
          }
        } finally in.close()
      }
    triples
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
      .dropDuplicates()
  }
}
