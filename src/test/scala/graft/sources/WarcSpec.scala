package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC reader/writer: spec framing round trip, HTTP splitting, HTML
  * text reduction, and the quarantine-and-resync recovery contract.
  */
class WarcSpec extends AnyFunSuite {

  test("write/parse round trip preserves records in order") {
    val bytes = Warc.write(Seq(
      ("https://a/1", "<html><body><p>hello world</p></body></html>"),
      ("https://a/2", "<html><body>second &amp; last</body></html>")))
    val recs = Warc.parse(bytes).toSeq
    assert(recs.map(_.warcType) === Seq("warcinfo", "response", "response"))
    assert(recs(1).targetUri === "https://a/1")
    assert(recs(1).httpStatus === 200)
    assert(recs(1).mime === "text/html")
    assert(recs(1).text === "hello world")
    assert(recs(2).text === "second & last")
    assert(recs.forall(_.corrupt == null))
  }

  test("payload byte accounting matches Content-Length framing") {
    // A body containing the magic string must NOT confuse framing —
    // records are walked by declared length, never by scanning.
    val trap = "<html><body>WARC/1.0 looks like a record</body></html>"
    val recs = Warc.parse(Warc.write(Seq(("https://t/x", trap)))).toSeq
    assert(recs.length === 2)
    assert(recs(1).text === "WARC/1.0 looks like a record")
  }

  test("corrupt record quarantines its span, parsing resyncs after it") {
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>"),
      ("https://a/3", "<p>three</p>")))
    val broken = Warc.corruptRecord(bytes, "https://a/2")
    val recs = Warc.parse(broken).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "response", "corrupt", "response"))
    assert(recs(1).text === "one")
    assert(recs(2).corrupt != null && recs(2).corrupt.startsWith("bad_magic"))
    assert(recs(3).targetUri === "https://a/3" && recs(3).text === "three")
  }

  test("html text reduction: script/style dropped, tags stripped, entities") {
    val html = "<html><head><title>T</title><style>p{}</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body>\n  <h1>A &lt;tag&gt;</h1>\n  <p>b&quot;c&apos;d&amp;e</p></body></html>"
    assert(Warc.htmlText(html) === "T A <tag> b\"c'd&e")
  }

  test("multi-byte UTF-8 bodies don't break octet framing") {
    // 'héllo wörld' is 13 octets / 11 chars — a char-offset walker would
    // misframe the SECOND record; octet framing keeps both intact and the
    // text still decodes as UTF-8.
    val bytes = Warc.write(Seq(
      ("https://u/1", "<p>héllo wörld</p>"),
      ("https://u/2", "<p>plain ascii</p>")))
    val recs = Warc.parse(bytes).toSeq
    assert(recs.map(_.warcType) === Seq("warcinfo", "response", "response"))
    assert(recs(1).text === "héllo wörld")
    assert(recs(2).text === "plain ascii")
    assert(recs.forall(_.corrupt == null))
  }

  test("member-gzip round trip: parseGz(gzipMembers(w)) == parse(w)") {
    val w = Warc.write(Seq(
      ("https://a/1", "<p>alpha beta</p>"),
      ("https://a/2", "<p>gamma &amp; delta</p>")))
    val gz = Warc.gzipMembers(w)
    // Really member-per-record: three gzip magics (warcinfo + 2 responses).
    val magics = gz.sliding(2).count(p =>
      (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
    assert(magics === 3, s"expected 3 gzip members, saw $magics")
    assert(Warc.parseGz(gz).toSeq === Warc.parse(w).toSeq)
  }

  test("truncated file yields a quarantine row, no exception") {
    val bytes = Warc.write(Seq(("https://a/1", "<p>x</p>")))
    val cut = bytes.take(bytes.length / 4)
    val recs = Warc.parse(cut).toSeq
    assert(recs.nonEmpty)
    assert(recs.last.corrupt != null || recs.last.warcType == "warcinfo")
  }

  /** `n` zero bytes without materializing them — the shape of a payload
    * the old whole-file parse could never hold.
    */
  private final class ZeroStream(n: Long) extends java.io.InputStream {
    private var left = n
    override def read(): Int = if (left <= 0) -1 else { left -= 1; 0 }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (left <= 0) -1
      else {
        val k = math.min(len.toLong, left).toInt
        java.util.Arrays.fill(b, off, off + k, 0.toByte)
        left -= k; k
      }
  }

  test("a 3 GB record streams through a bounded payload cap (no 2 GiB cliff)") {
    // 3e9 declared octets exceed the JVM's maximum array size, so ANY
    // whole-file (or whole-record) materialization — what parse did
    // before r14 — fails here regardless of heap. The streaming walk
    // reads `cap` bytes, SKIPS the rest with Long arithmetic, and keeps
    // framing the records that follow.
    val giantLen = 3000000000L
    val head = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"Content-Length: $giantLen\r\n\r\n").getBytes("ISO-8859-1")
    val tail = "\r\n\r\n".getBytes("ISO-8859-1") ++
      Warc.write(Seq(("https://after/1", "<p>after the giant</p>")))
    val in = new java.io.SequenceInputStream(
      java.util.Collections.enumeration(java.util.Arrays.asList[java.io.InputStream](
        new java.io.ByteArrayInputStream(head),
        new ZeroStream(giantLen),
        new java.io.ByteArrayInputStream(tail))))
    val recs = Warc.parse(in, 4096).toSeq
    assert(recs.map(_.warcType) === Seq("resource", "warcinfo", "response"))
    assert(recs(0).nPayloadBytes === giantLen)
    assert(recs(0).text.length === 4096) // capped prefix, not 3 GB
    assert(recs(2).targetUri === "https://after/1")
    assert(recs(2).text === "after the giant")
  }

  test("corrupt oversized Content-Length quarantines and rescues the rest") {
    // A bit-flipped length (9999999999 > file size) must NOT wrap
    // through Int and crash (the pre-r14 failure) — it quarantines the
    // overshot span and the walk recovers the records inside it.
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>"),
      ("https://a/3", "<p>three</p>")))
    val s = new String(bytes, "ISO-8859-1")
    val at = s.indexOf("WARC-Target-URI: https://a/2")
    val lenAt = s.indexOf("Content-Length: ", at)
    val lenEnd = s.indexOf("\r", lenAt)
    val hacked = (s.substring(0, lenAt) + "Content-Length: 9999999999" +
      s.substring(lenEnd)).getBytes("ISO-8859-1")
    val recs = Warc.parse(hacked).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "response", "corrupt", "response"))
    assert(recs(1).text === "one")
    assert(recs(2).corrupt === "torn_payload")
    assert(recs(3).targetUri === "https://a/3" && recs(3).text === "three")
  }

  test("negative Content-Length quarantines (bad_length) and resyncs") {
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>"),
      ("https://a/3", "<p>three</p>")))
    val s = new String(bytes, "ISO-8859-1")
    val at = s.indexOf("WARC-Target-URI: https://a/2")
    val lenAt = s.indexOf("Content-Length: ", at)
    val lenEnd = s.indexOf("\r", lenAt)
    val hacked = (s.substring(0, lenAt) + "Content-Length: -7" +
      s.substring(lenEnd)).getBytes("ISO-8859-1")
    val recs = Warc.parse(hacked).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "response", "corrupt", "response"))
    assert(recs(2).corrupt === "bad_length")
    assert(recs(3).targetUri === "https://a/3" && recs(3).text === "three")
  }

  test("wrong length whose bytes all exist: trailer check catches it, rest rescued") {
    // A corrupt Content-Length that stays INSIDE the file is the case EOF
    // can never catch: the walk reads the declared span successfully and
    // would silently report the swallowed next records as payload. The
    // spec-mandated record-final CRLF CRLF no longer matches at the wrong
    // offset, so the record quarantines (bad_trailer) and the records
    // inside the falsely-claimed span parse from the materialized buffer.
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>"),
      ("https://a/3", "<p>three</p>")))
    val s = new String(bytes, "ISO-8859-1")
    val at = s.indexOf("WARC-Target-URI: https://a/2")
    val lenAt = s.indexOf("Content-Length: ", at)
    val lenEnd = s.indexOf("\r", lenAt)
    val declared = s.substring(lenAt + "Content-Length: ".length, lenEnd).toInt
    val hacked = (s.substring(0, lenAt) +
      s"Content-Length: ${declared + 40}" +
      s.substring(lenEnd)).getBytes("ISO-8859-1")
    val recs = Warc.parse(hacked).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "response", "corrupt", "response"))
    assert(recs(2).corrupt === "bad_trailer")
    assert(recs(3).targetUri === "https://a/3" && recs(3).text === "three")
  }

  test("wrong SHORT length: trailer check quarantines, later records recovered") {
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one one one</p>"),
      ("https://a/2", "<p>three</p>")))
    val s = new String(bytes, "ISO-8859-1")
    val at = s.indexOf("WARC-Target-URI: https://a/1")
    val lenAt = s.indexOf("Content-Length: ", at)
    val lenEnd = s.indexOf("\r", lenAt)
    val declared = s.substring(lenAt + "Content-Length: ".length, lenEnd).toInt
    val hacked = (s.substring(0, lenAt) +
      s"Content-Length: ${declared - 10}" +
      s.substring(lenEnd)).getBytes("ISO-8859-1")
    val recs = Warc.parse(hacked).toSeq
    // The under-declared record quarantines at its trailer; the leftover
    // payload tail degrades to bad_magic; record 2 parses intact.
    assert(recs.exists(_.corrupt == "bad_trailer"))
    val ok = recs.filter(_.corrupt == null)
    assert(ok.map(_.warcType) === Seq("warcinfo", "response"))
    assert(ok(1).targetUri === "https://a/2" && ok(1).text === "three")
  }

  test("EOF inside a skipped over-cap remainder quarantines, never reports valid") {
    // Declared length far past the cap AND past EOF, with more than a
    // cap's worth of real bytes remaining: the capped prefix reads fully,
    // the remainder skip hits EOF — the record must quarantine
    // (torn_payload), not surface as a valid truncated response.
    val big = "x" * 5000
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", s"<p>$big</p>")))
    val s = new String(bytes, "ISO-8859-1")
    val at = s.indexOf("WARC-Target-URI: https://a/2")
    val lenAt = s.indexOf("Content-Length: ", at)
    val lenEnd = s.indexOf("\r", lenAt)
    val hacked = (s.substring(0, lenAt) + "Content-Length: 100000" +
      s.substring(lenEnd)).getBytes("ISO-8859-1")
    val recs = Warc.parse(
      new java.io.ByteArrayInputStream(hacked), 1024).toSeq
    assert(recs.map(_.warcType) === Seq("warcinfo", "response", "corrupt"))
    assert(recs(2).corrupt === "torn_payload")
  }

  test("WET round trip: conversion payloads decode verbatim, no HTTP split") {
    val texts = Seq(
      ("https://wet/1", "plain extracted text, no tags"),
      ("https://wet/2", "líne with ünïcode and a WARC/1.0 trap"),
      ("https://wet/3", "HTTP/1.1 200 OK looks like a response but is text"))
    val recs = Warc.parse(Warc.writeWet(texts)).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "conversion", "conversion", "conversion"))
    assert(recs.forall(_.corrupt == null))
    recs.tail.zip(texts).foreach { case (r, (uri, t)) =>
      assert(r.targetUri === uri)
      assert(r.mime === "text/plain")
      assert(r.text === t) // verbatim — no HTML strip, no HTTP split
      assert(r.httpStatus === 0)
    }
    // Member-gzip works on WET exactly as on WARC (same container).
    assert(Warc.parseGz(Warc.gzipMembers(Warc.writeWet(texts))).toSeq === recs)
  }

  test("streaming gz parse never inflates the file whole") {
    // Member-gzip a 40 MB corpus and parse it via the InputStream entry:
    // the walk decompresses record-by-record (no whole-file inflate) and
    // results equal the plain parse of the same corpus.
    val big = "word " * 8192 // 40 KiB html body
    val w = Warc.write((1 to 1000).map(i => (s"https://gz/$i", s"<p>$big</p>")))
    val gz = Warc.gzipMembers(w)
    val recs = Warc.parseGz(new java.io.ByteArrayInputStream(gz)).toSeq
    assert(recs === Warc.parse(w).toSeq)
    assert(recs.length === 1001)
  }

  test("parse is lazy: records frame on demand, not at call time") {
    // VERDICT r14 #3: the parsed OUTPUT must never reside whole in one
    // heap. Pull two records from a 500-record file through a
    // position-counting stream: the stream must NOT be exhausted — a
    // whole-file materializer would have read it to EOF on the first pull.
    // ~8 KB per record / ~4 MB total: the 64 KiB BufferedInputStream
    // read-ahead stays far below the tenth-of-file laziness bound.
    val w = Warc.write((1 to 500).map(i =>
      (s"https://lazy/$i", s"<p>body $i ${"pad " * 2000}</p>")))
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(w)
      override def read(): Int = { val c = in.read(); if (c >= 0) consumed += 1; c }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = Warc.parse(counting)
    val first = it.next(); val second = it.next()
    assert(first.warcType === "warcinfo")
    assert(second.targetUri === "https://lazy/1")
    assert(consumed < w.length / 10,
      s"consumed $consumed of ${w.length} bytes after 2 of 501 records — not lazy")
    assert(it.size === 499) // the rest still arrives
  }

  test("single-CRLF separator (lenient writer): records kept, flagged, not lost") {
    // ADVICE r14: a writer separating records with one CRLF instead of
    // CRLF CRLF has every payload fully framed — strict bad_trailer
    // quarantine would zero EVERY record's text. The parser keeps each
    // record (payload intact) flagged lenient_trailer; the final record
    // (trailer cut by EOF) stays clean per the EOF-truncation rule.
    val strict = new String(Warc.write(Seq(
      ("https://len/1", "<p>one</p>"),
      ("https://len/2", "<p>two</p>"),
      ("https://len/3", "<p>three</p>"))), "ISO-8859-1")
    val lenient = strict.replace("\r\n\r\nWARC/1.0\r\n", "\r\nWARC/1.0\r\n")
      .getBytes("ISO-8859-1")
    val recs = Warc.parse(lenient).toSeq
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "response", "response", "response"))
    assert(recs.map(_.text).drop(1) === Seq("one", "two", "three"))
    assert(recs.init.forall(_.corrupt == "lenient_trailer"))
    // Garbage between records is still a genuine framing break, never
    // rescued by leniency (trailer bytes are neither CRLFCRLF nor
    // CRLF+magic): the last separator becomes "\r\nJ\r\n" — the swallowed
    // record quarantines (bad_trailer), the junk degrades to bad_magic,
    // and the following record still parses clean after resync.
    val at = strict.lastIndexOf("\r\n\r\nWARC/1.0\r\n")
    val garbage = (strict.substring(0, at) + "\r\nJ" +
      strict.substring(at + 2)).getBytes("ISO-8859-1")
    val g = Warc.parse(garbage).toSeq
    assert(g.exists(_.corrupt == "bad_trailer"))
    assert(g.exists(r => r.corrupt != null && r.corrupt.startsWith("bad_magic")))
    assert(g.exists(r => r.targetUri == "https://len/3" && r.corrupt == null))
  }
}
