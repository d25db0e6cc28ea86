package graft

import org.apache.spark.sql.functions._
import graft.sources.{WarcIO, XmlIO}

/** XML (wiki-dump shape) and WARC (CommonCrawl shape) round-trips:
  * escaping fidelity, malformed-input loudness, and the multi-file /
  * multi-partition split behavior the lineSep record delimiter must
  * survive. */
class TextFormatsIOSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, "plain text body", "en", "src0", 15L),
      (1L, "xml specials & < > &amp; kept <doc> literal", "en", "src1", 43L),
      (2L, "warc magic WARC/1.0 inside a payload", "de", "src2", 36L),
      (3L, "", "fr", "src3", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("XmlIO: escaped round-trip is bit-exact, including specials") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_spec").toString
    // repartition: multiple part files exercise per-file line splitting
    XmlIO.writeDocuments(fixture.repartition(3), dir)
    val back = XmlIO.readDocuments(spark, dir).orderBy("doc_id").collect()
    val orig = fixture.orderBy("doc_id").collect()
    assert(back.map(_.toSeq.toList).toList === orig.map(_.toSeq.toList).toList)
  }

  test("JsonlIO gzip: shards carry .gz, read-back is bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gz_spec").toString
    graft.sources.JsonlIO.writeDocumentsGz(fixture.repartition(3), dir)
    val parts = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.endsWith(".json.gz")),
      s"expected gzip shards, got ${parts.toList}")
    val back = graft.sources.JsonlIO.readDocuments(spark, dir)
      .orderBy("doc_id").collect()
    val orig = fixture.orderBy("doc_id").collect()
    assert(back.map(_.toSeq.toList).toList === orig.map(_.toSeq.toList).toList)
  }

  test("XmlIO: malformed line raises, never silently drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.txt"),
      "<doc id=\"1\" lang=\"en\" source=\"s\" n_chars=\"3\">abc</doc>\nnot xml at all\n")
    val ex = intercept[Exception] {
      XmlIO.readDocuments(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }

  test("XmlIO + WarcIO: newline-bearing text fails the WRITE loudly") {
    import spark.implicits._
    val bad = Seq((9L, "line one\nline two", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    intercept[Exception] {
      XmlIO.writeDocuments(bad,
        java.nio.file.Files.createTempDirectory("graft_xml_nl").toString)
    }
    intercept[Exception] {
      WarcIO.writeDocuments(bad,
        java.nio.file.Files.createTempDirectory("graft_warc_nl").toString)
    }
  }

  test("WarcIO: multi-record round-trip across part files, payload with WARC magic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_spec").toString
    WarcIO.writeDocuments(fixture.repartition(3), dir)
    val back = WarcIO.readDocuments(spark, dir).orderBy("doc_id").collect()
    val orig = fixture.orderBy("doc_id").collect()
    assert(back.map(_.toSeq.toList).toList === orig.map(_.toSeq.toList).toList)
  }

  test("WarcIO: a corrupted Content-Length raises on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.txt"),
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:1>\r\n" +
        "X-Graft-Lang: en\r\nX-Graft-Source: s\r\nX-Graft-N-Chars: 3\r\n" +
        "Content-Length: 999\r\n\r\nabc\r\n\r\n")
    val ex = intercept[Exception] {
      WarcIO.readDocuments(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
