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
    val recs = Warc.parse(bytes)
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
    val recs = Warc.parse(Warc.write(Seq(("https://t/x", trap))))
    assert(recs.length === 2)
    assert(recs(1).text === "WARC/1.0 looks like a record")
  }

  test("corrupt record quarantines its span, parsing resyncs after it") {
    val bytes = Warc.write(Seq(
      ("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>"),
      ("https://a/3", "<p>three</p>")))
    val broken = Warc.corruptRecord(bytes, "https://a/2")
    val recs = Warc.parse(broken)
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
    val recs = Warc.parse(bytes)
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
    assert(Warc.parseGz(gz) === Warc.parse(w))
  }

  test("truncated file yields a torn-header quarantine, no exception") {
    val bytes = Warc.write(Seq(("https://a/1", "<p>x</p>")))
    val cut = bytes.take(bytes.length / 4)
    val recs = Warc.parse(cut)
    assert(recs.nonEmpty)
    assert(recs.last.corrupt != null || recs.last.warcType == "warcinfo")
  }
}
