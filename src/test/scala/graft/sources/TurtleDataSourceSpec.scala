package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rdf.Turtle

/** `spark.read.format("turtle")` — one file = one partition = one
  * parsed document. */
class TurtleDataSourceSpec extends AnyFunSuite {

  private def doc(i: Int): String =
    s"""@prefix ex: <http://ex.org/> .
       |<http://x/$i> ex:p "v$i"@nl .
       |<http://x/$i> ex:q <http://y/$i> .
       |_:b$i ex:r ${i}4 .
       |""".stripMargin

  test("reads a directory of Turtle documents into the triple schema") {
    val dir = Files.createTempDirectory("ttl").toFile
    (1 to 3).foreach { i =>
      Files.writeString(new java.io.File(dir, s"page$i.ttl").toPath, doc(i))
    }
    val df = TestSpark.spark.read.format("turtle")
      .load(dir.getAbsolutePath)
    assert(df.columns.toSeq == graft.rdf.Model.columns)
    assert(df.count() == 9)
    assert(df.rdd.getNumPartitions == 3) // one partition per document
    val expected = (1 to 3).flatMap(i => Turtle.parseDocument(doc(i))).toSet
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6), r.getString(7)))
      .toSet
    assert(got == expected)
  }

  test("graph option sets the graph column") {
    val dir = Files.createTempDirectory("ttl2").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    val df = TestSpark.spark.read.format("turtle")
      .option("graph", "g1").load(dir.getAbsolutePath)
    assert(df.select("graph").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("g1"))
  }
}
