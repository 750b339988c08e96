package graft.session

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Shareable state payloads: JSON → gzip → base64url and back
  * (reference: src/lib/urlState.js compress→base64url→decompress
  * round-trip, tested by urlState.test.js).
  */
object UrlState {

  def encode(payload: String): String = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(payload.getBytes("UTF-8"))
    gz.close()
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bos.toByteArray)
  }

  def decode(encoded: String): Option[String] =
    try {
      val bytes = java.util.Base64.getUrlDecoder.decode(encoded)
      val gz = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = gz.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
      Some(out.toString("UTF-8"))
    } catch { case _: Exception => None } // corrupt share links degrade to None
}

/** Result-cell stringification for table rendering (reference:
  * SqlQueryPanel.jsx:39-47 — bigint, binary and nested values become
  * display strings; everything else passes through).
  */
object RowShape {

  def stringifyCell(v: Any): String = v match {
    case null => ""
    case b: Array[Byte] => s"<binary ${b.length}B>"
    case s: String => s
    case m: Map[_, _] =>
      m.map { case (k, x) => s""""$k":${stringifyCell(x)}""" }.mkString("{", ",", "}")
    case seq: Seq[_] => seq.map(stringifyCell).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(stringifyCell).mkString("(", ",", ")")
    case other => other.toString
  }
}
