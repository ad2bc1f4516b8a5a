package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IsValidIri
import Vocab._

/** The reference pipeline's operators (SURVEY.md §2, O4–O18) as pure
  * `DataFrame => DataFrame` transformations over the canonical triple
  * schema (Model.columns).
  *
  * Everything here is declarative Catalyst: filters and projections
  * are map-side (no shuffle), the two join-shaped operators
  * (customvocab anti-join, typed semi-join) broadcast their
  * intrinsically-small build sides. At 100 TB the fact side (the
  * triple table) is never shuffled by the cleaning pass — only
  * `dropDuplicates` after unions repartitions, on all 8 columns.
  */
object RdfOps {

  /** O4 — remove JSON-LD `@context` artifacts
    * (reference: src/export_from_omeka_s.py:54,59). */
  def filterContextLeaks(df: DataFrame): DataFrame =
    df.filter(!col("subject").contains("@context") &&
      !col("obj_value").contains("@context"))

  /** O5 — drop triples whose subject is not a valid IRI
    * (reference: src/export_from_omeka_s.py:54,59; `uritools
    * .is_valid_uri`). Native codegen expression, stays in
    * whole-stage codegen. */
  def filterValidSubjects(df: DataFrame): DataFrame =
    df.filter(IsValidIri(col("subject")))

  /** O7 — drop triples whose object is an IRI-kind term but not a
    * valid IRI (reference: src/export_from_omeka_s.py:66–71). */
  def filterValidObjectIris(df: DataFrame): DataFrame =
    df.filter(col("obj_kind") =!= "iri" || IsValidIri(col("obj_value")))

  /** O6 — customvocab anti-join, implementing the *intent* of the
    * reference's dead filter (bug B1, SURVEY §2.4; reference:
    * src/export_from_omeka_s.py:60–65): remove triples whose object
    * references a subject typed with a customvocab class.
    *
    * The build side is the set of custom-vocabulary term subjects —
    * vocabulary-scale (thousands), not corpus-scale — so it is
    * explicitly broadcast: the 100 TB fact side streams map-side
    * through a broadcast hash anti-join, no shuffle.
    */
  def filterCustomvocabRefs(df: DataFrame): DataFrame = {
    val cv = df
      .filter(col("predicate") === RdfType &&
        col("obj_value").contains("customvocab"))
      .select(col("subject").as("cv_subject"))
      .distinct()
    df.join(broadcast(cv), col("obj_value") === col("cv_subject"),
      "left_anti")
  }

  /** The full export cleaning pass (O4 → O5 → O7 → O6), i.e. the body
    * of the reference's export filter loop
    * (src/export_from_omeka_s.py:53–71) as one composed dataflow.
    *
    * `faithful = true` replays the reference's OBSERVED behavior for
    * bug B1 instead of its intent: the customvocab check at
    * export_from_omeka_s.py:60 evaluates `"customvocab" in
    * str(<generator>)` — the str of a generator object, never the
    * types — so the O6 filter removes NOTHING in the real run. The
    * flag exists for differential testing (intent vs observed), per
    * SURVEY §7 hard-point 3. */
  def cleanExport(df: DataFrame, faithful: Boolean = false): DataFrame = {
    val base = filterValidObjectIris(filterValidSubjects(
      filterContextLeaks(df)))
    if (faithful) base else filterCustomvocabRefs(base)
  }

  /** O17 — predicate rename (reference:
    * src/transform_datamodel.py:112–119). The reference removes and
    * re-adds every mapped triple; here it is a pure map-side
    * projection through a literal-map lookup (`element_at` on a
    * `typedLit` map — codegen'd, broadcast implicitly as part of the
    * plan, zero shuffle at any scale). */
  def applyMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (mapping.isEmpty) df
    else df.withColumn("predicate",
      coalesce(element_at(typedLit(mapping), col("predicate")),
        col("predicate")))

  /** O18 — predicate delete (reference:
    * src/transform_datamodel.py:121–127): `isin` anti-filter, pushed
    * into the scan when reading parquet. */
  def applyFilter(df: DataFrame, filterList: Seq[String]): DataFrame =
    if (filterList.isEmpty) df
    else df.filter(!col("predicate").isin(filterList: _*))

  /** O15/O2 — set-semantics union: rdflib graphs are sets, so
    * re-parsing overlapping pages/enrichment into one graph implicitly
    * dedups (reference: src/export_from_omeka_s.py:50,
    * src/transform_datamodel.py:102). One shuffle on all columns. */
  def unionDedup(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).dropDuplicates()

  /** O14 (key step) — normalized enrichment lookup keys: triples with
    * the rijksmonumentnummer predicate and a *literal* object (bug
    * B2's intent, SURVEY §2.4), key normalized by stripping a leading
    * "RM" (reference: src/transform_datamodel.py:91–96), deduplicated
    * (the reference fetches once per occurrence — B5; the engine
    * fetches once per distinct key).
    *
    * `faithful = true` replays B2's OBSERVED behavior: the guard at
    * transform_datamodel.py:92 is `not isinstance(str(obj), URIRef)`
    * — str() always yields a `str`, so the guard is always true and
    * the reference fetches for IRI-valued objects too. */
  def enrichmentKeys(df: DataFrame, faithful: Boolean = false): DataFrame = {
    val rm = df.filter(col("predicate") === CeoRijksmonumentnummer)
    val keyed = if (faithful) rm else rm.filter(col("obj_kind") === "literal")
    keyed.select(normalizeMonumentKey(col("obj_value")).as("monument_key"))
      .distinct()
  }

  def normalizeMonumentKey(c: Column): Column =
    when(c.startsWith("RM"), c.substr(lit(3), length(c))).otherwise(c)

  /** O14 incremental fetch list WITH the reference's freshness
    * contract. The pure anti-join delta ([[graft.rdf.RdfQueries]]
    * `rdf_enrich_delta`) fetches only keys the stored snapshot has
    * never seen — but the reference re-fetches EVERY key weekly
    * (transform_datamodel.py:88–101), so upstream monument-record
    * updates propagate within a week; never refreshing a fetched key
    * silently changes that freshness semantics. This form restores
    * it: the fetch list is
    *
    *   - `missing`: export keys absent from the ledger, plus
    *   - `stale`:   export keys whose last fetch is `ttlDays` or more
    *     days old (`age_days >= ttlDays`),
    *
    * tagged with a `reason` column so the fetch loop can meter both
    * populations. `ledger` is `(monument_key, age_days)` — the
    * fetched-at sidecar a production snapshot stores next to its
    * triples. Scale shape: both joins key on `monument_key`; the
    * ledger is dimension-scale (one row per stored monument), so AQE
    * broadcasts it, and the export-key side — already distinct'd,
    * key-scale — is scanned twice at trivial cost. A key is missing
    * XOR covered, so the union is disjoint and needs no dedup. */
  def enrichmentFetchList(exportKeys: DataFrame, ledger: DataFrame,
      ttlDays: Int = 7): DataFrame = {
    val missing = exportKeys
      .join(ledger.select("monument_key"), Seq("monument_key"), "left_anti")
      .withColumn("reason", lit("missing"))
    val stale = exportKeys
      .join(ledger.filter(col("age_days") >= ttlDays)
        .select("monument_key"), Seq("monument_key"), "left_semi")
      .withColumn("reason", lit("stale"))
    missing.union(stale)
  }

  /** O14+O15+O16 — the enrichment stage (reference:
    * src/transform_datamodel.py:88–109): union the fetched enrichment
    * triples into the graph, then for every rijksmonumentnummer triple
    * whose subject is typed `ceo#Rijksmonument` in the *enriched*
    * graph, derive `(subj, sdo:sameAs, obj)`.
    *
    * The typed-subject set is dimension-scale (one row per monument)
    * → broadcast left-semi join; the enriched graph itself is never
    * shuffled except by the final set-union dedup.
    */
  def enrich(graph: DataFrame, fetched: DataFrame): DataFrame = {
    // One full-width dedup shuffle at the end, not one per union: the
    // intermediate set-semantics dedup the reference gets from rdflib
    // (transform:102) is subsumed by the final one — the typed-subject
    // set only needs its own narrow distinct on `subject`.
    val combined = graph.union(fetched)
    val rmnr = graph.filter(col("predicate") === CeoRijksmonumentnummer &&
      col("obj_kind") === "literal")
    val typed = combined
      .filter(col("predicate") === RdfType &&
        col("obj_value") === CeoRijksmonument)
      .select(col("subject")).distinct()
    val sameAs = rmnr
      .join(broadcast(typed), Seq("subject"), "left_semi")
      .select(col("graph"), col("subject"), col("subject_kind"),
        lit(SdoSameAs).as("predicate"), col("obj_value"),
        col("obj_kind"), col("obj_lang"), col("obj_datatype"))
    combined.union(sameAs).dropDuplicates()
  }

  /** SPARQL property-path reachability `p{1,maxHops}` (the bounded
    * form of `dcterms:relation+`) — a recursive query Spark SQL
    * cannot express (no recursive CTE); implemented as SEMI-NAIVE
    * Datalog iteration, the standard distributed transitive-closure
    * shape: each round joins only the FRONTIER (pairs first reached
    * last round) against the edge table, so per-round work is
    * O(frontier × out-degree) — never O(all reached pairs). The BFS
    * invariant (a pair is emitted the first round it appears) makes
    * the reported `hops` the MINIMUM path length without any min-
    * aggregation over enumerated paths. Cycles are handled exactly:
    * a pair already reached is dropped by the anti-join, so the
    * frontier is monotone-decreasing on a finite node set and the
    * loop always terminates — and (s, s, c) rows for cycles back to
    * a seed ARE emitted, matching SPARQL/recursive-CTE semantics.
    *
    * Scale shape (100 TB): the edge table is scanned once per round
    * and hash-joined on `src`; a store that bucket-partitions edges
    * by `src` makes every round's join co-located. The frontier and
    * reached sets are localCheckpoint'ed per round — same lineage
    * discipline as the connected-components and Lloyd loops.
    *
    * @param edges (src, dst) edge table
    * @param seeds (src) roots to walk from
    * @return (src, dst, hops) with hops = min path length in [1, maxHops]
    */
  def reachable(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame =
    walk(edges, seeds, Some(maxHops))

  /** SPARQL `p+` — the UNBOUNDED closure: the same semi-naive loop
    * run to FIXPOINT (empty frontier), no hop cap. Termination is
    * structural, not configured: every round's anti-join keeps only
    * never-seen (src, dst) pairs, the pair space over a finite node
    * set is finite, so the frontier must empty — cycles included
    * (a cycle's pairs are each discovered once, then suppressed).
    * Round COUNT is data-driven: it equals the graph's seed-to-
    * anywhere diameter, so `+` over a bounded-diameter graph (the
    * common shape — hierarchies, doubling indexes) costs O(diameter)
    * rounds regardless of node count. */
  def reachablePlus(edges: DataFrame, seeds: DataFrame): DataFrame =
    walk(edges, seeds, None)

  /** Unbounded `p+` PAIR closure (no hop counts) by the EDGE-STEP
    * LADDER — O(log diameter) rounds like path doubling, but the
    * relation squared each round is the EXACT-LENGTH step set
    * E_{2^k} (paths of length exactly 2^k), never the reach set:
    *
    *   P_1 = seeds ∘ E;   E_{2^k} = E_{2^{k-1}} ∘ E_{2^{k-1}}
    *   P_{k+1} = P_k ∪ (P_k ∪ id_seeds) ∘ E_{2^k}
    *
    * Invariant: after phase k, P covers every pair with SOME path of
    * length in [1, 2^k − 1]. Fixpoint proof: if phase k adds nothing,
    * take a missing pair with MINIMAL shortest-path length L
    * (L ≥ 2^k, else covered); split its path as
    * (s →^{L−2^k} u →^{2^k} t); (s,u) is shorter so covered (or u = s
    * via id_seeds), (u,t) ∈ E_{2^k} — so (s,t) would have been added.
    * Contradiction ⟹ converged, with no dependence on knowing the
    * diameter.
    *
    * Work/memory vs the alternatives: the frontier walk
    * ([[reachablePlus]]) pays one cluster barrier per HOP — measured
    * 44 rounds × ~0.6 s of fixed per-round driver cost on the sf0.1
    * relation graph (ClosureProbe), 27 s of pure round overhead for
    * a 308k-pair closure. Reach-set squaring
    * ([[reachablePlusDoubling]]) is O(log d) rounds but squares the
    * CLOSURE — Θ(L³) chain intermediates, the measured capped-heap
    * OOM at sf1. The ladder keeps log-depth while squaring only
    * exact-length step sets: each E_{2^k} is bounded by the pair
    * closure itself (every exact-length pair is a closure pair), the
    * squaring join's intermediates are one row per (pair, midpoint at
    * exactly half) — the single fixed decomposition point, not every
    * decomposition — and superseded E/P checkpoints are freed each
    * phase, so at most three pair-scale tables are live at once
    * (capped-heap safe: re-measured with ClosureProbe at 3 GB,
    * see OPTIMIZATION_r17.md). Use it for STORED pair-closure builds;
    * [[reachablePlus]] remains the path for MIN-HOP consumers. */
  def reachablePlusPairs(edges: DataFrame, seeds: DataFrame): DataFrame = {
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    // the noAqe scope covers the initial edge/seed materializations
    // too — they are the same fixed-shape checkpoint jobs as the
    // phase interiors (measured: scoping only the while-loop left
    // ~2 s of AQE sub-jobs on the doubling fixture's build)
    graft.LoopConf.noAqe(edges.sparkSession) {
    val id = seeds.select(col("src"), col("src").as("dst")).distinct()
    // with AQE off nothing coalesces the initial checkpoints, so
    // their width must be sized too — from one cheap map-only edge
    // count (the pair count that sizes the interior needs `p`, which
    // doesn't exist yet); every phase then scans em/p at a width
    // that matches their size instead of 32 near-empty partitions
    // (measured: unsized prep cost ~11 s of 130 ms near-empty tasks
    // across the phases on the doubling fixture)
    val ec = math.max(edges.count(), 1L)
    var em: DataFrame = null
    var p: DataFrame = null
    graft.LoopConf.sized(edges.sparkSession, ec) {
      em = chkSerW(edges.select(col("src"), col("dst")).distinct())
      p = chkSerW(em.join(
        seeds.select(col("src")).distinct(), Seq("src"), "left_semi"))
    }
    var n = p.count()
    var done = n == 0
    // interior exchanges sized to the measured pair count
    // (graft.LoopConf discipline); the pair set grows toward the
    // closure, which stays within a small factor of the edge count
    // per phase — partitions stay in the guide's 100 MB–1 GB band.
    // AQE off in the interior: the phase plan is fixed-shape over
    // checkpointed inputs at a measured width, and AQE's per-stage
    // re-optimization + sub-job materialization tripled the ladder's
    // wall on the doubling fixture (rdf_path_inv_plus cold: 57 jobs /
    // 8.4 s with AQE vs 24 jobs / 3.2 s without — identical result;
    // r16's frontier walk was 3.3 s, so this removes the whole r17
    // fullClosure regression, VERDICT item 1).
    graft.LoopConf.sized(edges.sparkSession, math.max(n, 1L)) {
    while (!done) {
      val em2 = chkSerW(em.as("l")
        .join(em.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
        .distinct())
      shim.freeLocalCheckpoint(em)
      em = em2
      val stepped = p.union(id).as("l")
        .join(em.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
      val pNew = chkSerW(p.union(stepped).distinct())
      val m = pNew.count()
      if (m == n) {
        shim.freeLocalCheckpoint(pNew)
        done = true
      } else {
        shim.freeLocalCheckpoint(p)
        p = pNew
        n = m
      }
    }
    }
    shim.freeLocalCheckpoint(em)
    p
    }
  }

  /** [[reachablePlusPairs]] behind a NODE DICTIONARY: assign each
    * distinct node a stable long id (monotonically_increasing_id
    * over a checkpointed distinct — partition-deterministic once
    * pinned), run the ladder on long pairs, decode back at the end.
    * Every squaring round's join + set-dedup then exchanges, hashes
    * and compares 8-byte longs instead of IRI strings (~40–60 bytes
    * plus string equality on the relation fixture) — and the ladder
    * is compute-bound in exactly those operators (ClosureProbe:
    * 9.3 s → see OPTIMIZATION_r18.md for the encoded number). The
    * dict build and the single decode are one-off edge/closure-scale
    * passes OUTSIDE the ladder's AQE-off scope, so the planner picks
    * their join strategy from runtime sizes (broadcast at vocabulary
    * scale, shuffle at corpus scale). Returns a checkpointed frame;
    * callers must NOT re-checkpoint. */
  def reachablePlusPairsEncoded(edges: DataFrame,
      seeds: DataFrame): DataFrame = {
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    val dict = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .withColumn("nid", monotonically_increasing_id())
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val eN = edges
      .join(dict.select(col("node").as("src"), col("nid").as("_s")),
        Seq("src"))
      .join(dict.select(col("node").as("dst"), col("nid").as("_t")),
        Seq("dst"))
      .select(col("_s").as("src"), col("_t").as("dst"))
    val seedsN = seeds
      .join(dict.select(col("node").as("src"), col("nid")), Seq("src"))
      .select(col("nid").as("src"))
    val pN = reachablePlusPairs(eN, seedsN)
    val out = pN
      .join(dict.select(col("nid").as("src"), col("node").as("_sv")),
        Seq("src"))
      .join(dict.select(col("nid").as("dst"), col("node").as("_dv")),
        Seq("dst"))
      .select(col("_sv").as("src"), col("_dv").as("dst"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    shim.freeLocalCheckpoint(pN)
    shim.freeLocalCheckpoint(dict)
    out
  }

  /** Unbounded ALL-SOURCES `p+` pair closure by PATH DOUBLING —
    * O(log diameter) rounds instead of the frontier walk's
    * O(diameter): after round r the pair set holds every path of
    * length ≤ 2^r, and squaring the relation (pairs ∘ pairs)
    * doubles the horizon each round.
    *
    * This is the classic WORK-vs-DEPTH tradeoff, and the engine's
    * measurements put real numbers on it ([[graft.tools.ClosureProbe]],
    * the capped-heap repro distilled from the sf1 rehearsal's OOM):
    * the frontier walk discovers each pair ONCE (work = O(closure),
    * memory = frontier-bounded) but pays one cluster barrier per
    * hop; squaring rediscovers a pair once per path DECOMPOSITION —
    * Θ(L³) join intermediates per L-hop chain segment — so on the
    * ~45-hop-chain relation graph doubling wins at toy scale where
    * barriers dominate (10.0 s vs 36.3 s at sf0.1) and LOSES at
    * capped-heap scale where work and memory dominate (OOM at 3 GB
    * vs the frontier's 80.3 s at sf1). Use doubling for interactive
    * queries over pair sets small enough to square; STORED-artifact
    * builds and capped-heap jobs use [[reachablePlus]] — which is
    * also the only choice when MIN-HOP counts are needed (doubling
    * computes reachability, not shortest paths). Pair set
    * localCheckpoints serialized+spillable each round; superseded
    * rounds' blocks are freed eagerly. */
  def reachablePlusDoubling(edges: DataFrame): DataFrame = {
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    // SERIALIZED + spillable checkpoints: a round holds two pair-set
    // states plus the squaring join's intermediates; deserialized
    // row caches tripled the resident size and OOM'd a capped heap
    // at 10× scale (caught by the sf1 rehearsal)
    def chk(df: DataFrame): DataFrame = df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var pairs = chk(edges.select(col("src"), col("dst")).distinct())
    var n = pairs.count()
    var done = false
    // interior exchanges sized to the measured pair count
    // (graft.LoopConf discipline; vocabulary-scale callers run the
    // whole squaring loop at width 1 instead of session width).
    // AQE off in the interior — same measurement as
    // [[reachablePlusPairs]]: fixed-shape phases over checkpointed
    // inputs at a measured width leave AQE nothing to adapt.
    graft.LoopConf.sized(edges.sparkSession, n) {
    graft.LoopConf.noAqe(edges.sparkSession) {
    while (!done) {
      val stepped = pairs.as("l")
        .join(pairs.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
      val next = chk(pairs.union(stepped).distinct())
      val m = next.count()
      if (m == n) {
        // fixpoint: doubling the horizon found nothing new
        shim.freeLocalCheckpoint(next)
        done = true
      } else {
        shim.freeLocalCheckpoint(pairs)
        pairs = next
        n = m
      }
    }
    }
    }
    pairs
  }

  /** SPARQL `p*` — `p+` plus the ZERO-LENGTH paths: every seed
    * reaches itself at hop 0. A cycle returning to its seed would
    * also surface from `p+` as (s, s, cycleLen); SPARQL's distinct
    * path semantics collapse the two, and `hops` is documented as
    * the MINIMUM path length, so the hop-0 self row wins and the
    * cycle row is anti-joined away. */
  def reachableStar(edges: DataFrame, seeds: DataFrame): DataFrame = {
    val self = seeds.select(col("src"), col("src").as("dst"),
      lit(0).as("hops")).distinct()
    val plus = reachablePlus(edges, seeds)
    self.union(
      plus.join(self.select("src", "dst"), Seq("src", "dst"), "left_anti")
        .select(col("src"), col("dst"), col("hops")))
  }

  /** INCREMENTAL closure maintenance for `p+` — the weekly-delta
    * form of [[reachablePlus]]: given the stored pair closure of the
    * base edge set and a batch of NEW edges, produce the closure of
    * the union WITHOUT recomputing from scratch. Pair semantics
    * (src, dst) — the SPARQL `+`/`*` binding set; min-hop counts are
    * not maintained incrementally (a new edge can shorten existing
    * paths; a consumer needing hops recomputes, a consumer needing
    * bindings — the common case — pays only for the delta).
    *
    * Semi-naive delta seeding: every genuinely new path crosses at
    * least one new edge (u, v), and its prefix up to u is already in
    * the stored closure (or u IS a seed). So the initial frontier is
    * exactly {(s, v) : (s, u) ∈ closure ∪ seed-self, (u, v) ∈ ΔE}
    * minus already-known pairs, and the walk then continues over the
    * UNION edge set (new paths may chain through further new edges).
    * Work is O(affected pairs), not O(closure): an empty or
    * irrelevant ΔE converges in zero rounds.
    *
    * Scale shape: the stored closure is scanned twice (delta seeding
    * + each round's anti-join) — the same accepted semi-naive cost
    * as the base walk; ΔE is batch-scale and drives every join. */
  def reachablePlusDelta(edges: DataFrame, deltaEdges: DataFrame,
      seeds: DataFrame, closure: DataFrame): DataFrame = {
    // union edge relation checkpointed once for the delta walk
    // (same per-round rescan argument as [[walk]]); freed on return
    val allE = chkSerW(edges.union(deltaEdges)
      .select(col("src").as("e_src"), col("dst").as("e_dst")))
    val known = closure.select(col("src"), col("dst"))
    // who can reach a new edge's tail: stored pairs + seed hop-0
    val reachers = known
      .union(seeds.select(col("src"), col("src").as("dst")))
    val de = deltaEdges.select(col("src").as("u"), col("dst").as("v"))
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    // same per-round discipline as [[walk]]: lazy checkpoints driven
    // by count() — one job per round. AQE stays ON here (unlike the
    // ladder): the anti-join's fresh-frontier side is runtime-tiny
    // and AQE converts the join to broadcast — measured 2x task time
    // with it off (static planning keeps sort-merge over the
    // checkpoint-backed sides).
    graft.LoopConf.sized(edges.sparkSession, known.count()) {
    var frontier = reachers.join(de, reachers("dst") === col("u"))
      .select(reachers("src"), col("v").as("dst")).distinct()
      .join(known, Seq("src", "dst"), "left_anti")
      .localCheckpoint(false)
    var freshN = frontier.count()
    // same bounded-plan discipline as [[walk]]: the stored closure
    // stays ONE branch; per-round fresh frames compact every
    // CompactEvery rounds so the anti-join's plan never grows with
    // round count
    var parts = Vector(frontier)
    def reached: DataFrame = parts.foldLeft(known)(_.union(_))
    while (freshN > 0L) {
      val next = frontier.join(allE, frontier("dst") === col("e_src"))
        .select(frontier("src"), col("e_dst").as("dst"))
        .distinct()
      val fresh = next.join(reached, Seq("src", "dst"), "left_anti")
        .localCheckpoint(false)
      freshN = fresh.count()
      if (freshN > 0L) {
        parts :+= fresh
        frontier = fresh
        if (parts.size >= CompactEvery) {
          val prefix = parts.dropRight(1)
          val compacted = chkSerW(prefix.reduce(_.union(_)))
          prefix.foreach(shim.freeLocalCheckpoint)
          parts = Vector(compacted, parts.last)
        }
      } else {
        shim.freeLocalCheckpoint(fresh)
      }
    }
    val out = reached
    shim.freeLocalCheckpoint(allE)
    out
    }
  }

  /** Compaction width of the walk's reached-set plan: the union of
    * per-round checkpoint frames is re-planned and re-scanned by
    * every subsequent round's anti-join, so letting it grow one
    * frame per round makes round r carry an r-branch union — task
    * binaries past 1 MB and O(rounds²) planning on a ~45-round
    * diameter (measured: rdf_sparql_path_plus at 233 driver jobs /
    * 3.8k tasks for a 308k-pair closure). Folding every
    * `CompactEvery` frames into ONE serialized checkpoint bounds the
    * plan at ≤ CompactEvery+1 branches for an amortized extra
    * closure rewrite every CompactEvery rounds — O(closure·d/8)
    * total bytes, strictly below the semi-naive walk's own
    * O(closure·d) anti-join read cost, so the 100 TB shape is
    * unchanged. */
  private val CompactEvery = 8

  private def chkSerW(df: DataFrame): DataFrame = df.localCheckpoint(true,
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  private def walk(edges: DataFrame, seeds: DataFrame,
      maxHops: Option[Int]): DataFrame = {
    val shim = org.apache.spark.sql.graftshim.ColumnBridge
    // the edge relation is CHECKPOINTED once for the walk: every
    // round joins against it, and re-running the scan+filter lineage
    // per round paid a parquet scan per hop (measured ~40% of
    // rdf_reachable's cold task time). Serialized+spillable, freed
    // before return — same transient footprint the per-round scan
    // already had in flight.
    val e = chkSerW(edges.select(col("src").as("e_src"),
      col("dst").as("e_dst")))
    val empty = seeds.select(col("src"), col("src").as("dst"),
      lit(0).as("hops")).limit(0)
    // frontier starts at the seeds themselves (hop 0) but those self
    // rows are NOT in `reached`: a cycle returning to its seed must
    // be discovered as a fresh (s, s, c) pair, not suppressed.
    var frontier = seeds.select(col("src"), col("src").as("dst")).distinct()
    // reached = union of `parts`: each round appends its fresh frame;
    // every CompactEvery frames the union is folded into one
    // checkpoint and the superseded frames' blocks are freed.
    var parts = Vector.empty[DataFrame]
    def reached: DataFrame =
      if (parts.isEmpty) empty else parts.reduce(_.union(_))
    val dbg = sys.env.contains("SPARK_GRAFT_WALK_DEBUG")
    var d = 1
    // one edge-count job (over the checkpoint — cheap) sizes every
    // interior exchange for the whole walk (graft.LoopConf
    // discipline). AQE stays ON for the walk (measured: the
    // anti-join's runtime-tiny frontier side gets converted to
    // broadcast; with AQE off the static planner keeps sort-merge
    // over the checkpoint-backed sides and task time doubles).
    graft.LoopConf.sized(edges.sparkSession, e.count()) {
    var fresh = 1L
    while (maxHops.forall(d <= _) && fresh > 0L) {
      val t0 = System.nanoTime()
      val next = frontier.join(e, frontier("dst") === e("e_src"))
        .select(frontier("src"), col("e_dst").as("dst"))
        .distinct()
      // LAZY checkpoint driven by count(): materializing and testing
      // emptiness is ONE job per round, where the previous eager
      // checkpoint + isEmpty paid two (measured 2 jobs/round on
      // rdf_reachable's 22-round walk)
      val frame = next.join(reached.select("src", "dst"), Seq("src", "dst"),
          "left_anti")
        .withColumn("hops", lit(d))
        .localCheckpoint(false)
      fresh = frame.count()
      if (dbg) println(f"[walk] round $d fresh=$fresh chk=${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (fresh > 0L) {
        parts :+= frame
        frontier = frame.select(col("src"), col("dst"))
        if (parts.size >= CompactEvery) {
          // compact the PREFIX only: `frontier` aliases the newest
          // frame, and freeing a localCheckpoint kills its blocks with
          // no lineage to recompute from
          val prefix = parts.dropRight(1)
          val compacted = chkSerW(prefix.reduce(_.union(_)))
          prefix.foreach(shim.freeLocalCheckpoint)
          parts = Vector(compacted, parts.last)
        }
      } else {
        shim.freeLocalCheckpoint(frame)
      }
      d += 1
    }
    // final fold: hand consumers ONE frame, not a round-count union,
    // and release the interior rounds' blocks (and the edge
    // checkpoint) for the session
    val folded = if (parts.size > 1) {
      val out = chkSerW(reached)
      parts.foreach(shim.freeLocalCheckpoint)
      out
    } else reached
    shim.freeLocalCheckpoint(e)
    folded
    }
  }

  /** O19 — the composed reference pipeline EP1→EP2 (export cleaning →
    * enrichment → rename → delete), one lazy dataflow end-to-end
    * (reference: src/transform_datamodel.py:140–168 + workflow DAG).
    *
    * The cleaned graph is MATERIALIZED once (localCheckpoint): it
    * feeds three downstream consumers (the enrichment union, the
    * rijksmonument scan, the typed-subject scan), and recomputing the
    * parse+clean lineage per consumer tripled the scan work. This
    * mirrors the reference's own design — EP1 writes the cleaned
    * export to a file that EP2 reads (workflow artifact hand-off,
    * yml:33–54); at cluster scale the same stage boundary is a
    * parquet write of the cleaned triple table. */
  def pipeline(raw: DataFrame, fetched: DataFrame,
      mapping: Map[String, String], filterList: Seq[String]): DataFrame =
    applyFilter(applyMapping(
      enrich(cleanExport(raw).localCheckpoint(), fetched), mapping),
      filterList)

  /** SPARQL `p{lo,hi}` bounded-REPETITION pairs: every (src, dst)
    * connected by SOME path of length k with lo ≤ k ≤ hi — the
    * exists-a-path-of-each-length semantics, which MIN-HOP reach
    * ([[reachable]]) cannot answer for lo > 1: on a diamond a pair
    * with min-hop 1 may or may not also have a length-2 path.
    * Computed by relation composition: R¹ = E, Rᵏ = Rᵏ⁻¹ ∘ E with a
    * per-level set-dedup (pairs, not paths — the composition stays
    * bounded by |V|² even through cycles), union of the in-range
    * levels. hi is REQUIRED small (the parser caps it): each level
    * is one equi-join + one dedup exchange, and an unbounded request
    * is `p+`'s fixpoint, not this ladder. */
  def pathBounded(edges: DataFrame, lo: Int, hi: Int): DataFrame = {
    require(lo >= 1 && hi >= lo,
      s"pathBounded: need 1 <= lo <= hi, got {$lo,$hi}")
    val e1 = edges.select(col("src"), col("dst")).distinct()
    var rk = e1
    var acc: DataFrame = if (lo <= 1) rk else null
    var k = 2
    while (k <= hi) {
      rk = rk.join(
          e1.select(col("src").as("_mid"), col("dst").as("_nxt")),
          col("dst") === col("_mid"))
        .select(col("src"), col("_nxt").as("dst"))
        .distinct()
      if (k >= lo) acc = if (acc == null) rk else acc.union(rk)
      k += 1
    }
    acc.distinct()
  }
}
