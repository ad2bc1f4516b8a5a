package graft.llm

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized roundtrip property for the WARC walk: ANY record list
  * built to spec — random types, optional URIs, random bodies that
  * deliberately embed CRLFs, blank lines, separators, and the
  * "WARC/1.0" magic itself — must parse back EXACTLY. This is the
  * property the content-length discipline exists for: no body
  * content whatsoever may desynchronize the walk. */
class WarcPropertySpec extends AnyFunSuite {

  private def build(recs: Seq[(String, Option[String], String)],
      rnd: Random): String =
    recs.map { case (typ, uri, body) =>
      val ver = if (rnd.nextBoolean()) "WARC/1.0" else "WARC/1.1"
      // header order and junk headers vary too
      val hs = rnd.shuffle(Seq(
        Some(s"WARC-Type: $typ"),
        uri.map(u => s"WARC-Target-URI: $u"),
        Some(s"Content-Length: ${body.getBytes("UTF-8").length}"),
        if (rnd.nextBoolean())
          Some(s"WARC-Record-ID: <urn:uuid:${rnd.nextInt(999999)}>")
        else None).flatten)
      s"$ver\r\n" + hs.map(_ + "\r\n").mkString +
        "\r\n" + body + "\r\n\r\n"
    }.mkString

  test("any to-spec record stream roundtrips, hostile bodies " +
    "included (200 random corpora)") {
    val rnd = new Random(42)
    val traps = Seq("", "\r\n", "\r\n\r\n", "WARC/1.0\r\n",
      "WARC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n",
      "Content-Length: 0", "a\r\nb", "é-ünïcode-テスト")
    (1 to 200).foreach { _ =>
      val recs = (0 to rnd.nextInt(4)).map { i =>
        val body =
          if (rnd.nextBoolean()) traps(rnd.nextInt(traps.length))
          else Random.alphanumeric.take(rnd.nextInt(60)).mkString +
            (if (rnd.nextBoolean()) "\r\n" + traps(rnd.nextInt(traps.length))
             else "")
        (Seq("response", "request", "warcinfo", "resource")(
          rnd.nextInt(4)),
          if (rnd.nextBoolean()) Some(s"http://x/${rnd.nextInt(99)}")
          else None,
          body)
      }
      val parsed = Warc.parse(build(recs, rnd).getBytes("UTF-8"))
      assert(parsed.isDefined, s"failed on $recs")
      assert(parsed.get.map(r =>
        (r.warcType, Option(r.uri), r.body)) == recs)
      parsed.get.zip(recs).foreach { case (r, (_, _, b)) =>
        assert(r.len == b.getBytes("UTF-8").length)
      }
    }
  }

  test("single-byte corruption of a length digit is detected, " +
    "never silently resynced (100 trials)") {
    val rnd = new Random(7)
    (1 to 100).foreach { _ =>
      val body = Random.alphanumeric.take(20 + rnd.nextInt(20)).mkString
      val good = build(Seq(("response", Some("http://x/1"), body),
        ("request", None, "tail")), rnd)
      val at = good.indexOf("Content-Length: ") + 16
      val bad = good.updated(at,
        if (good(at) == '9') '1' else (good(at) + 1).toChar)
      // a perturbed length either fails the walk or changes the
      // parsed body — it can never reproduce the original records
      Warc.parse(bad.getBytes("UTF-8")) match {
        case None => ()
        case Some(recs) =>
          assert(!recs.exists(_.body == body) || recs.length != 2)
      }
    }
  }
}
