package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC container record splitting — the step BEFORE everything else
  * in a real web pipeline: CommonCrawl-style corpora arrive as WARC
  * files (ISO 28500: records of `WARC/x.y` version line + header
  * lines + blank line + Content-Length octets of payload + blank
  * separator), not as a pre-split documents table. The reference app
  * starts from pre-extracted parquet (worker/index.js ingests GeoParquet
  * directly); this engine also owns the container step so a raw crawl
  * shard can flow container → records → [[graft.ops.IngestPipeline]]
  * as one plan.
  *
  * One kernel pass per container row, byte-level (Content-Length
  * counts OCTETS — a UTF-8 payload slices on bytes, never chars), no
  * shuffle; the per-record fan-out happens declaratively with
  * `posexplode` on top. Zero UDFs — the kernel is a Catalyst
  * expression like every other text kernel here.
  *
  * Robustness contract (planted fixtures in WarcSpec):
  *   - both CRLF and bare-LF line endings parse (real WET files mix
  *     them);
  *   - a record whose Content-Length overruns the remaining input
  *     yields its partial payload with `truncated = true`;
  *   - a Content-Length SHORTER than the actual payload does not
  *     crash or corrupt later records: after the declared octets the
  *     splitter resyncs by scanning to the next `WARC/` at a line
  *     start, and the un-consumed tail stays out of every payload;
  *   - a record with no parseable Content-Length takes everything up
  *     to the next line-start `WARC/` (or EOF) as payload;
  *   - non-WARC noise before the first record / between records is
  *     skipped by the same resync scan; a container with no `WARC/`
  *     at all yields an empty array (never null — the
  *     extractHtmlTable consistency rule).
  */
object WarcExpressions {

  /** The per-record output shape: the three headers every downstream
    * stage keys on (type to filter `conversion`/`response`, URI for
    * the URL front door, record id for provenance), the declared
    * length, the payload, and the truncation flag.
    */
  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("record_id", StringType),
    StructField("content_length", LongType),
    StructField("payload", StringType),
    StructField("truncated", BooleanType)))

  private[graft] final case class Rec(warcType: String, targetUri: String,
                                      recordId: String, contentLength: Long,
                                      payload: Array[Byte], truncated: Boolean)

  /** True iff `b` has "WARC/" at `i`. */
  private def isRecordStart(b: Array[Byte], i: Int): Boolean =
    i + 5 <= b.length && b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
      b(i + 3) == 'C' && b(i + 4) == '/'

  /** Next line-start position with "WARC/" at or after `from`
    * (position 0 counts as a line start), or -1.
    */
  private def nextRecordStart(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i < b.length) {
      if ((i == 0 || b(i - 1) == '\n') && isRecordStart(b, i)) return i
      i += 1
    }
    -1
  }

  /** End of the current line (index of '\r' or '\n', or length). */
  private def eol(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\r' && b(i) != '\n') i += 1
    i
  }

  /** Position after the line terminator at `i` (CRLF or LF). */
  private def skipEol(b: Array[Byte], i: Int): Int =
    if (i < b.length && b(i) == '\r')
      if (i + 1 < b.length && b(i + 1) == '\n') i + 2 else i + 1
    else if (i < b.length && b(i) == '\n') i + 1
    else i

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse every record of a WARC container (see object doc for the
    * robustness contract). Shared by the expression and the specs.
    */
  private[graft] def parseWarc(bytes: Array[Byte], maxRecords: Int = 1 << 20): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer[Rec]()
    var pos = nextRecordStart(bytes, 0)
    while (pos >= 0 && out.length < maxRecords) {
      // version line
      var i = skipEol(bytes, eol(bytes, pos))
      // header lines until the blank line
      var warcType = ""; var targetUri = ""; var recordId = ""
      var contentLength = -1L
      var headerDone = false
      while (!headerDone && i < bytes.length) {
        val e = eol(bytes, i)
        if (e == i) { // blank line → headers done
          i = skipEol(bytes, e); headerDone = true
        } else {
          val line = ascii(bytes, i, e)
          val c = line.indexOf(':')
          if (c > 0) {
            val name = line.substring(0, c).trim.toLowerCase
            val value = line.substring(c + 1).trim
            name match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => targetUri = value
              case "warc-record-id" => recordId = value
              case "content-length" =>
                contentLength = try value.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          i = skipEol(bytes, e)
        }
      }
      // payload
      val next =
        if (contentLength >= 0L) {
          val avail = bytes.length - i
          val take = math.min(contentLength, avail.toLong).toInt
          val truncated = contentLength > avail
          out += Rec(warcType, targetUri, recordId, contentLength,
            java.util.Arrays.copyOfRange(bytes, i, i + take), truncated)
          var p = i + take
          // well-formed: separator newlines then the next record; a
          // short declared length leaves garbage → resync to the next
          // line-start 'WARC/'
          p = skipEol(bytes, p); p = skipEol(bytes, p)
          if (isRecordStart(bytes, p) && (p == 0 || bytes(p - 1) == '\n')) p
          else nextRecordStart(bytes, p)
        } else {
          // no usable length: payload runs to the next record start
          val n = nextRecordStart(bytes, i)
          val end = if (n < 0) bytes.length else n
          // strip the trailing separator newlines off the payload
          var e2 = end
          var guard = 0
          while (guard < 2 && e2 > i && (bytes(e2 - 1) == '\n' || bytes(e2 - 1) == '\r')) {
            if (bytes(e2 - 1) == '\n' && e2 - 2 >= i && bytes(e2 - 2) == '\r') e2 -= 2
            else e2 -= 1
            guard += 1
          }
          out += Rec(warcType, targetUri, recordId, -1L,
            java.util.Arrays.copyOfRange(bytes, i, math.max(e2, i)), truncated = false)
          n
        }
      pos = next
    }
    out.toSeq
  }

  /** The kernel expression over a STRING container column (WET-style
    * text records; for binary WARC feed the bytes through a BINARY →
    * STRING cast upstream or extend with a binary twin — payloads
    * here are text by contract). Returns
    * `array<struct<warc_type, target_uri, record_id, content_length,
    * payload, truncated>>`; '' container → empty array.
    */
  case class WarcRecordsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(recordType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "warc_records"
    override protected def nullSafeEval(v: Any): Any = {
      val recs = parseWarc(v.asInstanceOf[UTF8String].getBytes)
      new GenericArrayData(recs.map(r => InternalRow(
        UTF8String.fromString(r.warcType),
        UTF8String.fromString(r.targetUri),
        UTF8String.fromString(r.recordId),
        r.contentLength,
        UTF8String.fromBytes(r.payload),
        r.truncated)).toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def warc_records(container: Column): Column =
    ColumnBridge.column(WarcRecordsExpr(ColumnBridge.expression(container)))
}
