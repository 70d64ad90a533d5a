package graft.sources

import java.nio.charset.StandardCharsets

/** Pure-JVM WARC (ISO 28500) reader/writer — the container format of
  * Common Crawl, i.e. THE source format of a 100 TB pre-training corpus.
  * Follows the [[BinaryExtract]] discipline: a real parser over the
  * public spec plus a matching canonical writer, so fixtures round-trip
  * genuine binary files without blobs in the repo.
  *
  *   - Framing is the spec's: `WARC/1.0` version line, CRLF header block,
  *     `Content-Length` payload octets, CRLF CRLF trailer. No
  *     regex-splitting — records are walked by declared length, the only
  *     framing that survives binary payloads.
  *   - `response` records carry an HTTP/1.1 message; the status line and
  *     headers are split off and the HTML body is reduced to text
  *     (script/style blocks dropped, tags stripped, entities decoded,
  *     whitespace collapsed — the CC-pipeline HTML→text step in
  *     miniature).
  *   - A malformed record boundary (bad magic) QUARANTINES the bytes up
  *     to the next `\r\nWARC/1.0\r\n` magic and parsing continues — the
  *     same skip-and-continue recovery contract as `Oplog.resync`.
  *
  * Scale shape: Common Crawl ships one ~1 GB member-gzipped WARC per
  * task-sized unit; each file parses independently inside one task
  * (binaryFile source → flatMap), so a crawl dump parallelizes at
  * file granularity with zero shuffle. (Member-gzip decompression is a
  * per-record `Inflater` loop over the same framing; the fixtures here
  * exercise the uncompressed layout.)
  */
object Warc {

  /** One parsed record. `corrupt` is non-null ONLY for quarantine rows
    * (then every payload field is zeroed).
    */
  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      httpStatus: Int,
      mime: String,
      text: String,
      nPayloadBytes: Long,
      corrupt: String)

  private val Magic = "WARC/1.0"
  private val CRLF = "\r\n"

  // ------------------------------------------------------------- writer

  /** Canonical writer: a leading `warcinfo` record, then one `response`
    * record per (uri, htmlBody). Deterministic byte-for-byte (fixed date,
    * fixed software line).
    */
  def write(responses: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    val info = "software: graft-warc-writer/1.0"
    sb.append(record("warcinfo", None,
      "application/warc-fields", info))
    responses.foreach { case (uri, html) =>
      val http = "HTTP/1.1 200 OK" + CRLF +
        "Content-Type: text/html; charset=utf-8" + CRLF + CRLF + html
      sb.append(record("response", Some(uri),
        "application/http; msgtype=response", http))
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def record(warcType: String, uri: Option[String],
      contentType: String, payload: String): String = {
    val body = payload.getBytes(StandardCharsets.UTF_8)
    Magic + CRLF +
      s"WARC-Type: $warcType" + CRLF +
      uri.map(u => s"WARC-Target-URI: $u" + CRLF).getOrElse("") +
      "WARC-Date: 2024-01-01T00:00:00Z" + CRLF +
      s"Content-Type: $contentType" + CRLF +
      s"Content-Length: ${body.length}" + CRLF +
      CRLF + payload + CRLF + CRLF
  }

  /** Corrupt ONE record in a written file for recovery tests: flips the
    * version magic of the record holding `uri` (framing survives; the
    * parser must quarantine that record's span and resync on the next
    * magic).
    */
  def corruptRecord(warc: Array[Byte], uri: String): Array[Byte] = {
    val s = new String(warc, StandardCharsets.ISO_8859_1)
    val at = s.indexOf(s"WARC-Target-URI: $uri")
    require(at >= 0, s"no record for $uri")
    val start = s.lastIndexOf(Magic, at)
    (s.substring(0, start) + "WARC/9.9" +
      s.substring(start + Magic.length)).getBytes(StandardCharsets.ISO_8859_1)
  }

  // ------------------------------------------------------------ gzip

  /** Member-gzip a written WARC the way Common Crawl ships them: EACH
    * record is its own gzip member, concatenated — the property that lets
    * an index seek to a record without decompressing the file. Splits on
    * the record framing (never a scan), compresses each span.
    */
  def gzipMembers(warc: Array[Byte]): Array[Byte] = {
    val s = new String(warc, StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < s.length) {
      val next = s.indexOf(CRLF + Magic + CRLF, pos)
      val end = if (next < 0) s.length else next + CRLF.length
      val member = s.substring(pos, end).getBytes(StandardCharsets.ISO_8859_1)
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(member); gz.finish()
      pos = end
    }
    out.toByteArray
  }

  /** Parse a member-gzipped WARC: JDK `GZIPInputStream` consumes
    * concatenated members natively, so decompression is one stream pass
    * and the framing walk is identical to the plain case.
    */
  def parseGz(bytes: Array[Byte]): Seq[WarcRecord] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    parse(out.toByteArray)
  }

  // ------------------------------------------------------------- parser

  /** Parse a WARC file. Records with intact framing but unexpected
    * content degrade gracefully (empty text); a broken record BOUNDARY
    * becomes one quarantine row covering the skipped span.
    *
    * Framing walks OCTETS, as Content-Length demands: the buffer is
    * decoded ISO-8859-1 (one char per octet, lossless round trip), so
    * string offsets ARE byte offsets even when payloads carry multi-byte
    * UTF-8; each payload re-decodes to UTF-8 only after it is framed.
    */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < s.length) {
      // Skip inter-record CRLFs.
      while (pos < s.length &&
        (s.charAt(pos) == '\r' || s.charAt(pos) == '\n')) pos += 1
      if (pos >= s.length) return out.toSeq
      if (!s.startsWith(Magic + CRLF, pos)) {
        // Broken boundary: quarantine up to the next magic (or EOF).
        val next = s.indexOf(CRLF + Magic + CRLF, pos)
        val end = if (next < 0) s.length else next + CRLF.length
        out += WarcRecord("corrupt", "-", 0, "-", "", 0L,
          s"bad_magic_at_$pos")
        pos = end
      } else {
        val headEnd = s.indexOf(CRLF + CRLF, pos)
        if (headEnd < 0) {
          out += WarcRecord("corrupt", "-", 0, "-", "", 0L, "torn_header")
          return out.toSeq
        }
        val headers = s.substring(pos + Magic.length + CRLF.length, headEnd)
          .split("\r\n").iterator
          .map(_.split(":", 2))
          .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
          .toMap
        val len = headers.get("content-length").flatMap(_.toLongOption)
        len match {
          case None =>
            out += WarcRecord("corrupt", "-", 0, "-", "", 0L, "no_length")
            val next = s.indexOf(CRLF + Magic + CRLF, headEnd)
            pos = if (next < 0) s.length else next + CRLF.length
          case Some(n) =>
            val bodyStart = headEnd + 2 * CRLF.length
            val bodyEnd = math.min(bodyStart + n.toInt, s.length)
            val payload = s.substring(bodyStart, bodyEnd)
            val wtype = headers.getOrElse("warc-type", "unknown")
            val uri = headers.getOrElse("warc-target-uri", "-")
            if (wtype == "response") {
              // HTTP headers are ASCII; only the BODY re-decodes UTF-8.
              val (status, mime, body) = splitHttp(payload)
              out += WarcRecord(wtype, uri, status, mime,
                htmlText(utf8(body)), n, null)
            } else {
              out += WarcRecord(wtype, uri, 0,
                headers.getOrElse("content-type", "-"), utf8(payload), n, null)
            }
            pos = bodyEnd
        }
      }
    }
    out.toSeq
  }

  /** Octet-chars (ISO-8859-1) back to real text (UTF-8). */
  private def utf8(octetChars: String): String =
    new String(octetChars.getBytes(StandardCharsets.ISO_8859_1),
      StandardCharsets.UTF_8)

  /** Split an HTTP/1.1 response payload into (status, mime, body). */
  private def splitHttp(payload: String): (Int, String, String) = {
    val headEnd = payload.indexOf(CRLF + CRLF)
    if (!payload.startsWith("HTTP/") || headEnd < 0) return (0, "-", payload)
    val lines = payload.substring(0, headEnd).split("\r\n")
    val status = lines.head.split(" ").lift(1)
      .flatMap(_.toIntOption).getOrElse(0)
    val mime = lines.tail.iterator.map(_.split(":", 2))
      .collectFirst { case Array(k, v)
        if k.trim.equalsIgnoreCase("content-type") =>
        v.trim.split(";").head.trim }
      .getOrElse("-")
    (status, mime, payload.substring(headEnd + 2 * CRLF.length))
  }

  /** The CC-pipeline HTML→text step in miniature: drop script/style
    * blocks, strip tags, decode the five XML entities, collapse
    * whitespace runs to single spaces, trim.
    */
  def htmlText(html: String): String =
    html
      .replaceAll("(?is)<script.*?</script>", " ")
      .replaceAll("(?is)<style.*?</style>", " ")
      .replaceAll("(?s)<[^>]*>", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
      .replaceAll("\\s+", " ")
      .trim
}
