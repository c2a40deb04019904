package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive) record plumbing — the container format web-crawl
  * corpora actually arrive in (ISO 28500; CommonCrawl's distribution
  * format). A WARC file is a concatenation of records, each framed as
  *
  * {{{
  * WARC/1.0\r\n
  * <Name>: <value>\r\n  (repeated; Content-Length is mandatory)
  * \r\n
  * <Content-Length bytes of payload>
  * \r\n\r\n
  * }}}
  *
  * [[parseWarc]] is a REAL byte-walking parser for that framing (the same
  * honest-decoder contract as the PPM/WAV/PNG/BMP parsers): header lines
  * are US-ASCII up to the blank line, payload is length-framed raw bytes,
  * and any malformation (bad magic, unparsable/missing Content-Length,
  * payload overrunning the buffer) STOPS the walk and returns the records
  * parsed so far — a truncated tail costs its own records, never an
  * executor.
  *
  * Scale shape: [[warcRecords]] is a flatMap inside shuffle-free
  * `mapPartitions`; each input row (one WARC blob) explodes to its records
  * on the executor that scanned it, and only the extracted COLUMNS travel
  * on. At 100 TB the blobs come off the source as binary rows and the
  * parse is embarrassingly parallel.
  */
object Warc {

  final case class WarcRecord(
      recIdx: Int, warcType: String, targetUri: String,
      contentLength: Long, byteSum: Long)

  /** Parse a WARC blob into its records (see object doc for the stop-on-
    * malformation contract). Features, not payload bytes, are returned:
    * `byteSum` is the payload byte total — enough for an engine-portable
    * oracle while proving every payload byte was visited. */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] =
    walk(bytes).map { case (idx, tpe, uri, off, len, sum) =>
      WarcRecord(idx, tpe, uri, len.toLong, sum)
    }

  /** Records with their payloads DECODED as text (ISO-8859-1 — byte
    * transparent, so ASCII/Latin-1 crawl bodies round-trip exactly) — the
    * ingestion form feeding [[TextAnalysis.stripHtml]] and the text
    * pipeline. Same walk, same stop-on-malformation contract. */
  def parseWarcBodies(bytes: Array[Byte]): Seq[(Int, String, String, String)] =
    walk(bytes).map { case (idx, tpe, uri, off, len, _) =>
      (idx, tpe, uri, new String(bytes, off, len, "ISO-8859-1"))
    }

  /** (recIdx, warcType, targetUri, bodyOffset, bodyLen, byteSum) per
    * record — the single parser both public forms share. */
  private def walk(bytes: Array[Byte]): Seq[(Int, String, String, Int, Int, Long)] = {
    if (bytes == null) return Seq.empty
    val out = Seq.newBuilder[(Int, String, String, Int, Int, Long)]
    var pos = 0
    var idx = 0
    def lineEnd(p: Int): Int = {
      var i = p
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    var ok = true
    while (ok && pos < bytes.length) {
      val e0 = lineEnd(pos)
      if (e0 < 0 || new String(bytes, pos, e0 - pos, "US-ASCII") != "WARC/1.0") { ok = false }
      else {
        var p = e0 + 2
        var warcType = ""; var uri = ""; var clen = -1L
        var headersDone = false
        while (ok && !headersDone) {
          val e = lineEnd(p)
          if (e < 0) ok = false
          else if (e == p) { headersDone = true; p += 2 } // blank line
          else {
            val line = new String(bytes, p, e - p, "US-ASCII")
            val ci = line.indexOf(':')
            if (ci < 0) ok = false
            else {
              val name = line.substring(0, ci).trim.toLowerCase
              val value = line.substring(ci + 1).trim
              name match {
                case "warc-type" => warcType = value
                case "warc-target-uri" => uri = value
                case "content-length" =>
                  try clen = value.toLong
                  catch { case _: NumberFormatException => ok = false }
                case _ => () // tolerate unknown headers (real files have many)
              }
              p = e + 2
            }
          }
        }
        if (ok && (clen < 0 || p + clen > bytes.length)) ok = false
        if (ok) {
          var sum = 0L
          var i = p
          val end = p + clen.toInt
          while (i < end) { sum += bytes(i) & 0xff; i += 1 }
          out += ((idx, warcType, uri, p, clen.toInt, sum))
          idx += 1
          pos = end
          // records terminate with \r\n\r\n; tolerate its absence at EOF
          if (pos + 4 <= bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
            bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n') pos += 4
          else if (pos < bytes.length) ok = false
        }
      }
    }
    out.result()
  }

  /** Synthesize a deterministic WARC blob from text: `nRecords` response
    * records, record `i` carrying a `16 + (7·i mod 32)`-byte payload whose
    * byte `k` is the text's code point at `(i + k) mod len` (mod 256) —
    * both engines derive every field from the text alone, the exact scheme
    * of [[Multimodal.encodePpmFromText]]. */
  def encodeWarcFromText(text: String, docId: Long, nRecords: Int): Array[Byte] = {
    val cps = if (text == null || text.isEmpty) Array(0) else text.codePoints().toArray
    val bb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    var i = 0
    while (i < nRecords) {
      val len = 16 + (7 * i % 32)
      w("WARC/1.0\r\n")
      w("WARC-Type: response\r\n")
      w(s"WARC-Target-URI: http://corpus.invalid/doc/$docId/$i\r\n")
      w("WARC-Record-ID: <urn:test:" + docId + ":" + i + ">\r\n")
      w(s"Content-Length: $len\r\n")
      w("\r\n")
      var k = 0
      while (k < len) { bb.write(cps((i + k) % cps.length) & 0xff); k += 1 }
      w("\r\n\r\n")
      i += 1
    }
    bb.toByteArray
  }

  /** Attach a synthesized WARC blob column (see [[encodeWarcFromText]]). */
  def withWarcPayload(df: DataFrame, idCol: String, textCol: String,
      nRecords: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeWarcFromText(text, id, nRecords)) }
      .toDF(idCol, "payload")
  }

  /** Explode WARC blobs into per-record feature rows — flatMap inside
    * shuffle-free `mapPartitions`; malformed tails yield only their parsed
    * prefix (see [[parseWarc]]). */
  def warcRecords(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        parseWarc(bytes).map(r =>
          (id, r.recIdx, r.warcType, r.targetUri, r.contentLength, r.byteSum))
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "content_length", "byte_sum")
  }

  /** Explode WARC blobs into per-record TEXT rows (body decoded
    * ISO-8859-1) — the ingestion head of the text pipeline: downstream
    * stages chain [[TextAnalysis.stripHtml]], quality gates, and dedup on
    * the `body` column. Same shuffle-free flatMap shape; bodies leave the
    * scanning executor only when a downstream stage shuffles them. */
  def warcTextRecords(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        parseWarcBodies(bytes).map { case (idx, tpe, uri, body) => (id, idx, tpe, uri, body) }
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "body")
  }
}
