package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** rdf_pagerank: the 3-iteration fixed-point integer PageRank must
  * match an independent driver-side implementation node for node,
  * and conserve (bounded-loss) rank mass. */
class PagerankSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Scale = 1000000000L

  /** Plain-Scala replay of the identical integer recurrence. */
  private def reference(): Map[String, Long] = {
    val parts = s.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
    val mx = parts.max
    val item = "http://ex.org/item/"
    val edges = parts.filter(k => k * 4 <= mx)
      .map(k => (s"$item$k", s"$item${k * 4}")) ++
      parts.filter(_ % 16 == 0)
        .map(k => (s"$item$k", s"$item${k / 16}"))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> Scale / n).toMap
    (1 to 3).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map { case (u, _) => pr(u) / odeg(u) }.sum).toMap
      pr = nodes.map(v => v ->
        ((Scale / n) * 15 / 100 + 85 * contrib.getOrElse(v, 0L) / 100))
        .toMap
    }
    pr
  }

  test("engine ranks equal the driver-side integer recurrence, node for node") {
    val got = RdfQueries.queries("rdf_pagerank")(s, dir).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("pr_scaled"))
      .toMap
    val want = reference()
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (node, v) => assert(v == want(node), node) }
  }

  test("rank mass is conserved up to damping leakage and integer floors") {
    val rows = RdfQueries.queries("rdf_pagerank")(s, dir).collect()
    val total = rows.map(_.getAs[Long]("pr_scaled")).sum
    val n = rows.length
    // each node holds at least the teleport floor; total cannot
    // exceed the initial mass (dangling + floor losses only shrink it)
    val teleport = (Scale / n) * 15 / 100 * n
    assert(total >= teleport)
    assert(total <= Scale)
  }

  private val CScale = 100000L // = RdfQueries.PrcScale

  /** Driver-side FLAT replay of the converged variant: the identical
    * truncating recurrence with dangling mass redistributed, run for
    * exactly PrcCap rounds — the fixed-depth sequence the oracle
    * computes, which the engine's limit-cycle early exit must land
    * on by parity. Also reports the round at which the state reached
    * its period ≤ 2 limit cycle (0 if never). */
  private def referenceConverged(): (Map[String, Long], Int) = {
    val parts = s.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
    val mx = parts.max
    val item = "http://ex.org/item/"
    val edges = parts.filter(k => k * 4 <= mx)
      .map(k => (s"$item$k", s"$item${k * 4}")) ++
      parts.filter(_ % 16 == 0)
        .map(k => (s"$item$k", s"$item${k / 16}"))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val srcs = edges.map(_._1).toSet
    val dangling = nodes.filterNot(srcs.contains)
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> CScale / n).toMap
    var window = Vector.empty[Map[String, Long]]
    var cycleAt = 0
    (1 to RdfQueries.PrcCap).foreach { it =>
      val dm = dangling.map(pr).sum
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map { case (u, _) => pr(u) / odeg(u) }.sum).toMap
      val next = nodes.map(v => v ->
        ((CScale / n) * 15 / 100 +
          85 * (contrib.getOrElse(v, 0L) + dm / n) / 100)).toMap
      window = (window :+ pr).takeRight(RdfQueries.PrcWindow)
      if (cycleAt == 0 && window.contains(next)) cycleAt = it
      pr = next
    }
    (pr, cycleAt)
  }

  test("converged variant equals the fixed-depth driver replay node " +
      "for node, and the limit cycle arrives under the cap") {
    val got = RdfQueries.queries("rdf_pagerank_converged")(s, dir)
      .collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("pr_scaled"))
      .toMap
    val (want, cycleAt) = referenceConverged()
    assert(cycleAt > 0 && cycleAt < RdfQueries.PrcCap,
      "state never re-entered the detection window under the cap — " +
        "the engine's early exit would run to the cap")
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (node, v) => assert(v == want(node), node) }
  }

  test("redistributed variant conserves mass tighter than the " +
      "leaking one: dangling mass is recycled, losses are only " +
      "integer floors") {
    val rows = RdfQueries.queries("rdf_pagerank_converged")(s, dir)
      .collect()
    val total = rows.map(_.getAs[Long]("pr_scaled")).sum
    val n = rows.length.toLong
    // at the fixpoint every unit of mass is either kept (teleport +
    // damped inflow incl. recycled dangling mass) or lost to integer
    // floors: ≤ ~4 one-unit truncations per node + one per edge
    // (edges ≈ 1.07·n), AMPLIFIED by 1/0.15 at the fixpoint (total =
    // S − floors/0.15 from the balance equation) → bound ≈ 30·n,
    // still a far tighter conservation than the leaking variant,
    // which sheds the entire dangling outflow every round
    assert(total <= CScale)
    assert(total > CScale - 30 * n,
      s"mass $total leaked more than integer floors allow")
    // and the dangling set is genuinely nonempty on this fixture —
    // the redistribution branch is exercised, not vacuous
    val e = rows // rank rows = all nodes; recompute dangling directly
    val parts = s.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
    val mx = parts.max
    val hasOut = (k: Long) => k * 4 <= mx || k % 16 == 0
    val dsts = parts.filter(k => k * 4 <= mx).map(_ * 4) ++
      parts.filter(_ % 16 == 0).map(_ / 16)
    assert(dsts.exists(m => !hasOut(m)), "fixture has no dangling node")
    assert(e.nonEmpty)
  }

  // ---------------- incremental (warm-start) variant ----------------

  private def fixtureParts(): Array[Long] =
    s.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))

  private def baseEdges(parts: Array[Long]): Array[(String, String)] = {
    val mx = parts.max
    val item = "http://ex.org/item/"
    parts.filter(k => k * 4 <= mx)
      .map(k => (s"$item$k", s"$item${k * 4}")) ++
      parts.filter(_ % 16 == 0).map(k => (s"$item$k", s"$item${k / 16}"))
  }

  private def deltaEdges(parts: Array[Long]): Array[(String, String)] = {
    val mx = parts.max
    val item = "http://ex.org/item/"
    parts.filter(k => k % 10 == 0 && k * 3 <= mx)
      .map(k => (s"$item$k", s"$item${k * 3}"))
  }

  /** Fixed-depth driver replay of the dangling-redistributing
    * recurrence from an arbitrary init. */
  private def replay(edges: Array[(String, String)],
      init: Map[String, Long], steps: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val srcs = edges.map(_._1).toSet
    val dangling = nodes.filterNot(srcs.contains)
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(v => v -> init.getOrElse(v, CScale / n)).toMap
    (1 to steps).foreach { _ =>
      val dm = dangling.map(pr).sum
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map { case (u, _) => pr(u) / odeg(u) }.sum).toMap
      pr = nodes.map(v => v ->
        ((CScale / n) * 15 / 100 +
          85 * (contrib.getOrElse(v, 0L) + dm / n) / 100)).toMap
    }
    pr
  }

  test("incremental variant equals the warm fixed-depth driver " +
      "replay node for node (base cap steps, then warm incr-cap " +
      "steps on the delta-extended graph)") {
    val parts = fixtureParts()
    val base = replay(baseEdges(parts), Map.empty, RdfQueries.PrcCap)
    val want = replay(baseEdges(parts) ++ deltaEdges(parts), base,
      RdfQueries.PrcIncrCap)
    val got = RdfQueries.queries("rdf_pagerank_incr")(s, dir)
      .collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("pr_scaled"))
      .toMap
    assert(deltaEdges(parts).nonEmpty, "fixture delta is empty")
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (node, v) => assert(v == want(node), node) }
  }

  test("warm start re-converges in fewer rounds than a cold restart " +
      "on the same posterior graph — log(Δ)-proportional saving; " +
      "this fixture's delta perturbs ~10% of nodes, so the gap is " +
      "modest here and grows as the delta share shrinks") {
    val (_, warmRounds) = RdfQueries.computePagerankIncr(s, dir)
    assert(warmRounds > 0)
    assert(warmRounds < RdfQueries.PrcIncrCap,
      s"warm start ran to its cap ($warmRounds) — no early exit")
    // cold cycle entry on the POSTERIOR graph, measured by replay
    val parts = fixtureParts()
    val v2 = baseEdges(parts) ++ deltaEdges(parts)
    var pr = Map.empty[String, Long]
    var prev = Vector.empty[Map[String, Long]]
    var coldCycleAt = 0
    var it = 0
    while (coldCycleAt == 0 && it < RdfQueries.PrcCap) {
      val next = replay(v2, if (it == 0) Map.empty else pr, 1)
      it += 1
      if (prev.contains(next)) coldCycleAt = it
      prev = (prev :+ next).takeRight(RdfQueries.PrcWindow)
      pr = next
    }
    assert(coldCycleAt > 0, "cold restart never cycled under the cap")
    assert(warmRounds < coldCycleAt,
      s"warm rounds $warmRounds not under cold cycle-entry " +
        s"$coldCycleAt")
  }

  test("incremental result conserves mass like the converged one " +
      "and stays close to a full cold recompute on the posterior " +
      "graph (same limit cycle modulo phase)") {
    val rows = RdfQueries.queries("rdf_pagerank_incr")(s, dir).collect()
    val total = rows.map(_.getAs[Long]("pr_scaled")).sum
    val n = rows.length.toLong
    assert(total <= CScale)
    assert(total > CScale - 30 * n,
      s"mass $total leaked more than integer floors allow")
    // warm-vs-cold: a truncating recurrence's cycle PHASE at the cap
    // is trajectory-dependent, so bit equality is not guaranteed —
    // but both must sit on the same attractor: per-node distance
    // bounded by the cycle amplitude (a handful of ±1 rotations)
    val parts = fixtureParts()
    val cold = replay(baseEdges(parts) ++ deltaEdges(parts), Map.empty,
      RdfQueries.PrcCap)
    val warm = rows.map(r =>
      r.getAs[String]("node") -> r.getAs[Long]("pr_scaled")).toMap
    assert(warm.keySet == cold.keySet)
    val l1 = warm.map { case (k, v) => math.abs(v - cold(k)) }.sum
    assert(l1 <= 5 * n,
      s"warm result L1-distance $l1 from cold recompute exceeds " +
        s"cycle-amplitude bound (n = $n)")
  }
}
