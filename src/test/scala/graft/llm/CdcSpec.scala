package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Content-defined chunking vs brute force, and the property the
  * operator exists for: boundary positions realign after an edit
  * (shift-robustness), which fixed-stride windows cannot do. */
class CdcSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  // deterministic pseudo-text with enough variety to cut on
  private def synth(seed: Long, n: Int): String = {
    var x = seed
    val sb = new StringBuilder
    while (sb.length < n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val c = ('a' + ((x >>> 33) % 27)).toChar
      sb += (if (c > 'z') ' ' else c)
    }
    sb.toString
  }

  private val shared = synth(7L, 400)
  private val fixture: Seq[(Long, String)] = Seq(
    (0L, shared),
    (1L, synth(99L, 37) + shared), // same passage, shifted by 37
    (2L, "short"), // sub-window doc: single chunk, no cuts
    (3L, synth(5L, 200))
  )

  private lazy val dir: String = {
    val d = Files.createTempDirectory("cdc-fixture").toFile.getAbsolutePath
    val s = spark
    import s.implicits._
    fixture.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // ---- brute force ----
  private def bruteChunks(text: String): Seq[(Long, Long)] = {
    def h(i: Int): Long = { // 1-based window start
      var acc = 0L
      for (j <- 0 until CdcChunks.W)
        acc = (acc * CdcChunks.B + text.charAt(i - 1 + j)) % CdcChunks.M
      acc
    }
    val cuts = (2 to text.length - CdcChunks.W + 1)
      .filter(i => h(i) % CdcChunks.D == CdcChunks.R)
      .map(_.toLong)
    val starts = 1L +: cuts
    starts.zip(starts.drop(1) :+ (text.length + 1L))
      .map { case (s0, next) => (s0, next - s0) }
  }

  test("chunks equal brute force on every doc (short doc = one " +
      "chunk), and chunks tile the document exactly") {
    val got = CdcChunks.chunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val want = fixture.flatMap { case (id, t) =>
      bruteChunks(t).map { case (s0, l) =>
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.substring(s0.toInt - 1, (s0 + l - 1).toInt)
            .getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, s0, l, sha)
      }
    }.toSet
    assert(got === want)
    assert(got.exists(_._1 == 2L) &&
      got.count(_._1 == 2L) == 1, "short doc must be a single chunk")
    // coverage: per doc, lens sum to the doc length (toSeq first —
    // a Set.map would collapse equal lengths before the sum)
    fixture.foreach { case (id, t) =>
      assert(got.toSeq.filter(_._1 == id).map(_._3).sum == t.length)
    }
  }

  test("shift-robustness: a 37-char prefix edit leaves the shared " +
      "passage's interior chunks identical") {
    val byDoc = CdcChunks.chunks(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sharedChunks = byDoc(0L) intersect byDoc(1L)
    // everything after the first post-edit boundary realigns: only
    // the chunk(s) touching the splice can differ
    assert(sharedChunks.size >= byDoc(0L).size - 2,
      s"expected near-total realignment, shared ${sharedChunks.size} " +
        s"of ${byDoc(0L).size}")
    assert(sharedChunks.nonEmpty)
    // and the dedup rollup surfaces exactly those shared digests
    val dups = CdcChunks.dedup(spark, dir).collect()
      .map(_.getString(0)).toSet
    assert(sharedChunks.subsetOf(dups))
  }
}
