package graft.llm

import java.security.MessageDigest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized property checks for the corpus-hygiene operators:
  * each distributed formulation must equal a direct plain-Scala
  * reference on generated corpora (the oracle pins exact values on
  * the fixed test tables; these pin the SEMANTICS on adversarial
  * shapes — partial passages, repeated passages, boundary ratios,
  * sub-k cardinalities). */
class LlmPropertySpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g")

  private def tokensOf(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  private def md5hex(x: String): String =
    MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** First 8 md5 hex digits as a long — mirrors hexHashExpr. */
  private def hash32(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(8), 16)

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("llm-prop").toFile
    val s = spark
    import s.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    tmp.getAbsolutePath
  }

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String, String)] =
    (0L until nDocs).map { id =>
      val n = 1 + rnd.nextInt(30)
      // duplicate whole 8-token blocks across docs with some odds, so
      // shared passages actually occur
      val toks = (0 until n).map { i =>
        if (rnd.nextInt(4) == 0) vocab(i % vocab.size)
        else vocab(rnd.nextInt(vocab.size))
      }
      (id, toks.mkString(" "), s"src${rnd.nextInt(3)}")
    }

  test("passageDedup equals the direct per-doc passage scan") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val rows = randomCorpus(rnd, 40)
      val dir = writeDocs(rows)
      val passages = rows.map { case (id, text, _) =>
        id -> tokensOf(text).grouped(8).map(_.mkString(" ")).toVector
      }
      val docsPerPassage = passages
        .flatMap { case (id, ps) => ps.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.size }
      val expected = passages.map { case (id, ps) =>
        (id, ps.size.toLong, ps.count(docsPerPassage(_) >= 2).toLong)
      }.toSet
      val got = LlmQueries.passageDedup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("termFilter equals the direct ratio scan") {
    val blocked = Set("a", "e")
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val rows = randomCorpus(rnd, 60)
      val dir = writeDocs(rows)
      val expected = rows.flatMap { case (id, text, _) =>
        val toks = tokensOf(text)
        val nb = toks.count(blocked)
        if (nb * 20 < toks.length) Some((id, toks.length.toLong, nb.toLong))
        else None
      }.toSet
      // operator blocklist is ("slow", "big") which the vocab never
      // hits; check the shape against a vocab-intersecting list by
      // rewriting text: map blocked stand-ins onto the real blocklist
      val mapped = rows.map { case (id, text, src) =>
        (id, tokensOf(text).map {
          case "a" => "slow"
          case "e" => "big"
          case t => t
        }.mkString(" "), src)
      }
      val dir2 = writeDocs(mapped)
      val got = LlmQueries.termFilter(spark, dir2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed")
      assert(dir != dir2)
    }
  }

  test("winnow equals the direct computation and holds the MOSS " +
    "guarantee (shared 6-token run => shared fingerprint)") {
    val rnd = new Random(7)
    val planted = "x1 x2 x3 x4 x5 x6" // 6 tokens: 4 shingles, >= 1 window
    val rows = randomCorpus(rnd, 30).map {
      case (id, text, src) if id % 3 == 0 => (id, s"$text $planted", src)
      case r => r
    }
    val dir = writeDocs(rows)

    def refFps(text: String): Set[Long] = {
      val t = tokensOf(text)
      if (t.length < 3) Set.empty
      else {
        val hv = t.sliding(3).map(g => hash32(g.mkString(" "))).toVector
        if (hv.length <= 4 - 1) Set(hv.min)
        else hv.sliding(4).map(_.min).toSet
      }
    }

    val expected = rows.flatMap { case (id, text, _) =>
      val f = refFps(text)
      if (f.isEmpty) None
      else Some((id, f.size.toLong, f.min, f.sum))
    }.toSet
    val got = LlmQueries.winnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)

    // MOSS guarantee across the planted run
    val fps = rows.filter(_._1 % 3 == 0).map(r => refFps(r._2))
    assert(fps.combinations(2).forall(p => (p(0) & p(1)).nonEmpty))
  }

  test("kmvDistinct equals the direct KMV computation") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val rows = randomCorpus(rnd, 50)
      val dir = writeDocs(rows)
      val expected = rows.groupBy(_._3).map { case (src, docs) =>
        val hvs = docs.flatMap { case (_, text, _) =>
          val t = tokensOf(text)
          if (t.length < 3) Seq.empty
          else t.sliding(3).map(_.mkString(" ")).toSeq
        }.map(hash32).distinct.sorted
        val n = hvs.size.toLong
        val est =
          if (n < 64) n else 63L * 4294967296L / (hvs(63) + 1L)
        (src, n, est)
      }.toSet
      val got = LlmQueries.kmvDistinct(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("kmvIncremental: merged per-shard sketches equal the monolithic sketch") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(40 + seed)
      // seed 1 keeps the corpus tiny so |union| < k exercises the
      // exact fallback; the others exceed k and use the estimator
      val rows = randomCorpus(rnd, if (seed == 1) 6 else 60)
      val dir = writeDocs(rows)
      val got = LlmQueries.kmvIncremental(spark, dir).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(got.nonEmpty, s"seed $seed")
      got.foreach { case (src, nMerged, estMerged, estFull, nExact) =>
        assert(estMerged == estFull, s"seed $seed src $src")
        // a merged union below k means every shard sketch was
        // complete — the union must BE the exact distinct set
        if (nMerged < 64) assert(nMerged == nExact, s"seed $seed src $src")
      }
    }
  }

  test("bloom prefilter never misses an exactly-contaminated doc, and " +
    "per-doc exact counts survive the join (random corpora)") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(100 + seed)
      // 200 docs so ids 0, 97, 194 land in the heldout slice
      val rows = randomCorpus(rnd, 200)
      val dir = writeDocs(rows)
      def grams(text: String): Set[String] = {
        val t = tokensOf(text)
        if (t.length < 5) Set.empty
        else (0 to t.length - 5).map(i =>
          t.slice(i, i + 5).mkString(" ")).toSet
      }
      val held = rows.filter(_._1 % 97 == 0)
        .flatMap(r => grams(r._2)).toSet
      val exactByDoc = rows
        .filter(r => r._1 % 97 != 0)
        .map(r => (r._1, grams(r._2).count(held)))
        .filter(_._2 > 0).toMap
      assert(exactByDoc.nonEmpty, s"seed $seed degenerate")
      val flagged = LlmQueries.decontamBloom(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // structural no-false-negatives + exact counts intact
      exactByDoc.foreach { case (id, n) =>
        assert(flagged.contains(id), s"seed $seed missed doc $id")
        assert(flagged(id) == n.toLong, s"seed $seed count for $id")
      }
      // the shipped clean corpus contains no contaminated doc
      val clean = LlmQueries.bloomCleanOf(
          graft.Tables(spark, dir, "documents"),
          LlmQueries.bloomBitset(spark, dir))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert((clean & exactByDoc.keySet).isEmpty, s"seed $seed")
    }
  }
}
