package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The WARC container-splitting contract
  * (graft.functions.WarcExpressions + TextAnalysis.warcRecordsTable):
  * well-formed multi-record containers, CRLF/LF variants, truncated
  * records, Content-Length mismatches (resync), missing lengths,
  * leading noise, and degenerate inputs. The DuckDB side of the
  * well-formed contract is the `text_warc_parse` oracle row's
  * string-slicing replay.
  */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(warcType: String, uri: String, id: String,
                  payload: String, sep: String = "\r\n",
                  declaredLen: Option[Long] = None): String = {
    val cl = declaredLen.getOrElse(payload.getBytes("UTF-8").length.toLong)
    s"WARC/1.0${sep}WARC-Type: $warcType${sep}WARC-Target-URI: $uri$sep" +
      s"WARC-Record-ID: $id${sep}Content-Length: $cl$sep$sep$payload$sep$sep"
  }

  private def parse(container: String) = {
    import spark.implicits._
    TextAnalysis.warcRecordsTable(
      Seq((1L, container)).toDF("doc_id", "warc"), "doc_id", "warc")
      .orderBy("rec_idx").collect()
  }

  test("well-formed multi-record container splits exactly") {
    val c = rec("warcinfo", "", "<urn:uuid:0>", "software: test") +
      rec("conversion", "http://ex.com/a", "<urn:uuid:1>", "first page body text") +
      rec("conversion", "http://ex.com/b", "<urn:uuid:2>", "second page body text")
    val out = parse(c)
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "conversion", "conversion"))
    assert(out(1).getAs[String]("target_uri") == "http://ex.com/a")
    assert(out(2).getAs[String]("record_id") == "<urn:uuid:2>")
    assert(out(1).getAs[String]("text") == "first page body text")
    assert(out(1).getAs[Long]("content_length") == 20L)
    assert(out.forall(!_.getAs[Boolean]("truncated")))
    assert(out.map(_.getAs[Long]("rec_idx")).toSeq == Seq(0L, 1L, 2L))
  }

  test("bare-LF line endings parse identically to CRLF") {
    val crlf = parse(rec("conversion", "http://x/1", "<a>", "payload one") +
      rec("conversion", "http://x/2", "<b>", "payload two"))
    val lf = parse(rec("conversion", "http://x/1", "<a>", "payload one", sep = "\n") +
      rec("conversion", "http://x/2", "<b>", "payload two", sep = "\n"))
    assert(lf.map(_.toSeq).toSeq == crlf.map(_.toSeq).toSeq)
  }

  test("truncated final record: partial payload, truncated flag") {
    val c = rec("conversion", "http://x/1", "<a>", "intact body") +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://x/2\r\n" +
      "WARC-Record-ID: <b>\r\nContent-Length: 9999\r\n\r\nonly this much arrived"
    val out = parse(c)
    assert(out.length == 2)
    assert(!out(0).getAs[Boolean]("truncated"))
    assert(out(1).getAs[Boolean]("truncated"))
    assert(out(1).getAs[String]("text") == "only this much arrived")
    assert(out(1).getAs[Long]("content_length") == 9999L)
  }

  test("short declared Content-Length resyncs to the next record without corruption") {
    // declared 4 but the payload is longer — the splitter takes 4
    // octets, then scans past the garbage to the next line-start WARC/
    val c = rec("conversion", "http://x/1", "<a>", "full payload text here",
        declaredLen = Some(4L)) +
      rec("conversion", "http://x/2", "<b>", "clean second record")
    val out = parse(c)
    assert(out.length == 2)
    assert(out(0).getAs[String]("text") == "full")
    assert(!out(0).getAs[Boolean]("truncated")) // short, not overrun
    assert(out(1).getAs[String]("text") == "clean second record")
    assert(out(1).getAs[String]("target_uri") == "http://x/2")
  }

  test("missing Content-Length: payload runs to the next record start") {
    val c = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://x/1\r\n\r\n" +
      "unmeasured body line\r\n\r\n" +
      rec("conversion", "http://x/2", "<b>", "measured body")
    val out = parse(c)
    assert(out.length == 2)
    assert(out(0).getAs[String]("text") == "unmeasured body line")
    assert(out(0).getAs[Long]("content_length") == -1L)
    assert(out(1).getAs[String]("text") == "measured body")
  }

  test("leading noise skips; non-WARC and empty containers yield no rows, never null") {
    val noisy = "HTTP/1.1 junk preamble\r\nmore junk\r\n" +
      rec("conversion", "http://x/1", "<a>", "the actual record")
    val out = parse(noisy)
    assert(out.length == 1 && out(0).getAs[String]("text") == "the actual record")
    assert(parse("no records at all").isEmpty)
    assert(parse("").isEmpty)
    import spark.implicits._
    // NULL container coalesces like every front-door table op
    val n = TextAnalysis.warcRecordsTable(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "warc"), "doc_id", "warc")
    assert(n.count() == 0L)
  }

  test("a record-like string INSIDE a measured payload does not split the record") {
    val tricky = "inner text mentioning\nWARC/1.0\nwhich is payload, not a record"
    val c = rec("conversion", "http://x/1", "<a>", tricky) +
      rec("conversion", "http://x/2", "<b>", "after")
    val out = parse(c)
    assert(out.length == 2)
    assert(out(0).getAs[String]("text") == tricky)
    assert(out(1).getAs[String]("text") == "after")
  }
}
