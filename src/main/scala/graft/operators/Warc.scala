package graft.operators

import org.apache.spark.sql.Dataset

/** WARC (ISO 28500 / the Common Crawl container) record parsing — the
  * entry point of a web-scale training-data pipeline: WARC → HTTP
  * response → body → [[graft.plans.HtmlKernel]] → quality/dedup.
  *
  * Scope: WARC/1.0 and 1.1 record framing (header block terminated by
  * CRLFCRLF, `Content-Length` payload bytes, CRLFCRLF record separator),
  * case-insensitive header names, both PLAIN and per-record-gzip-member
  * payloads (the Common Crawl convention — `GZIPInputStream` consumes
  * concatenated members natively). `response` records additionally parse
  * the enclosed HTTP/1.x message: status code, `Content-Type` and the
  * body after the header terminator. Structural damage KEEPS the records
  * framed before it and appends one `ok = false` marker row for the
  * damaged tail — never a task failure, never a silently-skipped tail,
  * never a discarded good prefix.
  *
  * Scale shape: one narrow mapPartitions; the multi-GB WARC payload never
  * reaches a shuffle — only per-record header fields and the (bounded)
  * body string survive into the plan, and callers drop the body right
  * after text extraction.
  */
object Warc {

  final case class WarcRecord(media_id: Long, rec_idx: Int, warc_type: String,
                              target_uri: String, http_status: Int,
                              content_type: String, body: String, ok: Boolean)

  def records(media: Dataset[Multimodal.MediaRow]): Dataset[WarcRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      parse(r.media_id, p)
    })
  }

  private[graft] def parse(id: Long, payload: Array[Byte]): Iterator[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var idx = 0
    // Structural damage truncates the WALK, never the result: every record
    // framed BEFORE the damage is real corpus data (a truncated final
    // record is a routine crawl-download shape), so it is kept and one
    // trailing ok=false marker records the damaged tail — the Tar.parse
    // convention. Discarding the good prefix threw away thousands of valid
    // pages per damaged archive.
    def damaged(): Iterator[WarcRecord] = {
      out += WarcRecord(id, idx, "", "", 0, "", "", ok = false)
      out.result().iterator
    }
    try {
      val p =
        if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f &&
          (payload(1) & 0xff) == 0x8b) gunzipAll(payload)
        else payload
      var pos = 0
      while (pos < p.length) {
        // skip inter-record blank lines
        while (pos < p.length && (p(pos) == '\r' || p(pos) == '\n')) pos += 1
        if (pos >= p.length) { /* clean end */ }
        else {
          val hdrEnd = indexOfDoubleCrlf(p, pos)
          if (hdrEnd < 0) return damaged()
          val head = new String(p, pos, hdrEnd - pos, "UTF-8")
          val lines = head.split("\r\n")
          if (!lines(0).startsWith("WARC/")) return damaged()
          val h = headerMap(lines.drop(1))
          val len = h.getOrElse("content-length", "-1").trim.toLong
          val bodyStart = hdrEnd + 4
          if (len < 0 || bodyStart + len > p.length) return damaged()
          // WARC-Type values compare case-insensitively (the field is not
          // normalized by producers; 'Response' must not skip HTTP parsing
          // or downstream warc_type filters) — emitted lowercased
          val warcType = h.getOrElse("warc-type", "").toLowerCase
          val uri = h.getOrElse("warc-target-uri", "")
          var status = 0
          var cType = h.getOrElse("content-type", "")
          var body = ""
          var recOk = true
          if (warcType == "response") {
            // a response record must carry an application/http payload we
            // can parse; anything else quarantines THIS record (ok=false,
            // framing intact so the walk continues) — an ok=true row with
            // an empty body would silently drop the page's text from the
            // corpus, including the Content-Type-missing shape
            recOk = false
          }
          if (warcType == "response" &&
            cType.toLowerCase.startsWith("application/http")) {
            val httpEnd = indexOfDoubleCrlf(p, bodyStart)
            if (httpEnd >= 0 && httpEnd + 4 <= bodyStart + len) {
              val httpHead = new String(p, bodyStart, httpEnd - bodyStart, "UTF-8")
              val hl = httpHead.split("\r\n")
              if (hl(0).startsWith("HTTP/")) {
                val parts = hl(0).split(" ")
                if (parts.length >= 2) status =
                  try parts(1).toInt catch { case _: NumberFormatException => 0 }
                cType = headerMap(hl.drop(1)).getOrElse("content-type", "")
                body = new String(p, httpEnd + 4,
                  (bodyStart + len - (httpEnd + 4)).toInt, charsetOf(cType))
                recOk = true
              }
            }
          } else if (warcType != "response") {
            body = "" // warcinfo/request/metadata payloads aren't corpus text
          }
          out += WarcRecord(id, idx, warcType, uri, status, cType, body, recOk)
          idx += 1
          pos = (bodyStart + len).toInt
        }
      }
      val res = out.result()
      if (res.isEmpty) damaged() else res.iterator
    } catch { case scala.util.control.NonFatal(_) => damaged() }
  }

  /** Body charset from the Content-Type `charset=` parameter — a latin-1
    * or windows-1252 page decoded as UTF-8 would turn every high byte
    * into U+FFFD and silently corrupt the corpus. Unknown or absent
    * charsets fall back to UTF-8 (the web default). */
  private[graft] def charsetOf(contentType: String): java.nio.charset.Charset = {
    val lower = contentType.toLowerCase
    val i = lower.indexOf("charset=")
    if (i < 0) java.nio.charset.StandardCharsets.UTF_8
    else {
      val raw = lower.substring(i + 8).takeWhile(c => c != ';' && c != ' ')
        .stripPrefix("\"").stripSuffix("\"")
      try java.nio.charset.Charset.forName(raw)
      catch { case scala.util.control.NonFatal(_) =>
        java.nio.charset.StandardCharsets.UTF_8 }
    }
  }

  private def headerMap(lines: Array[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase ->
        l.substring(i + 1).trim)
    }.toMap

  private def indexOfDoubleCrlf(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' && p(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def gunzipAll(z: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(z), 8192)
    try in.readAllBytes() finally in.close()
  }

  // --------------------------------------------------------- fixture side

  /** One WARC record's bytes (header block + payload + separator). */
  private def record(warcType: String, uri: String, recordId: String,
                     contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"WARC-Record-ID: <urn:uuid:$recordId>\r\n")
    sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** A two-record WARC (warcinfo + one HTTP 200 text/html response whose
    * body is `html`), optionally as two concatenated gzip members — the
    * Common Crawl layout in miniature. */
  def warcBytes(uri: String, html: String, seed: Long,
                gzipped: Boolean): Array[Byte] = {
    val info = record("warcinfo", "", s"info-$seed", "application/warc-fields",
      "software: graft-fixture\r\n".getBytes("UTF-8"))
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"X-Fixture-Seed: $seed\r\n" +
      "\r\n").getBytes("UTF-8") ++ html.getBytes("UTF-8")
    val resp = record("response", uri, s"resp-$seed",
      "application/http; msgtype=response", http)
    if (!gzipped) info ++ resp
    else gzipMember(info) ++ gzipMember(resp)
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }
}
