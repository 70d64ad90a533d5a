package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater, ZipEntry, ZipInputStream, ZipOutputStream}

/** Pure-JVM binary document extraction — the in-process "advanced parser"
  * leg of the loader chain (reference `pkg/rag/loader_pdf_advanced.go:36`,
  * `loader_docx.go:19`; dispatch order in `loader.go`: advanced parser
  * first, CLI tool as fallback). No external jars, no child processes:
  *
  *   - DOCX is a zip archive; the text lives in `word/document.xml` as
  *     `<w:t>` runs inside `<w:p>` paragraphs (public OOXML/ISO 29500
  *     structure). Unzip with `java.util.zip`, stream-parse with the JDK's
  *     StAX reader, join runs, newline per paragraph.
  *   - PDF text (the subset real text-based PDFs use) lives in content
  *     streams: scan for `stream…endstream` objects, FlateDecode via
  *     `java.util.zip.Inflater` when the preceding dictionary says so, then
  *     read the text-showing operators `Tj`, `'`, `"`, `TJ` with PDF
  *     literal-string escapes and hex strings (public PDF-1.7/ISO 32000
  *     syntax). Image-only PDFs yield no operators → error → the chain
  *     falls through to the CLI converter, exactly the reference's
  *     scanned-PDF behavior.
  *
  * Extraction is a pure function of the bytes — safe under Spark task
  * retries, usable from any executor without local tooling.
  *
  * [[minimalPdf]] / [[minimalDocx]] are the matching minimal WRITERS (valid
  * single-page PDF / minimal OOXML package). They exist so fixtures and
  * tests can round-trip real binary files through the extractors without
  * shipping binary blobs in the repo.
  */
object BinaryExtract {

  // ---------------------------------------------------------------- DOCX

  /** Extract paragraph text from a .docx (OOXML) file. */
  def docx(bytes: Array[Byte]): Either[String, String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "word/document.xml")
          return docxXmlText(readAll(zin))
        e = zin.getNextEntry
      }
      Left("docx: word/document.xml not found")
    } catch {
      case ex: Exception => Left(s"docx: ${String.valueOf(ex.getMessage)}")
    } finally zin.close()
  }

  /** `<w:t>` runs joined; newline per `</w:p>`; `<w:tab/>` → tab. */
  private def docxXmlText(xml: Array[Byte]): Either[String, String] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    val sb = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "t"   => inT = true
              case "tab" => sb.append('\t')
              case "br"  => sb.append('\n')
              case _     => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "p" => sb.append('\n')
              case _   => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case _ => ()
        }
      }
    } finally r.close()
    val text = sb.result().trim
    if (text.isEmpty) Left("docx: no text runs") else Right(text)
  }

  // ----------------------------------------------------------------- PDF

  /** Extract text operators from a PDF's content streams. */
  def pdf(bytes: Array[Byte]): Either[String, String] = {
    if (bytes.length < 5 ||
        new String(bytes, 0, math.min(bytes.length, 5),
          StandardCharsets.ISO_8859_1) != "%PDF-")
      return Left("pdf: missing %PDF- header")
    try {
      val sb = new StringBuilder
      var from = 0
      var found = false
      while (from >= 0 && from < bytes.length) {
        val s = indexOf(bytes, "stream", from)
        if (s < 0) from = -1
        else {
          // Dictionary between the previous "obj" (or stream end) and
          // "stream" says whether the data is Flate-compressed.
          val dictStart = math.max(0, lastIndexOf(bytes, "<<", s))
          val dict = new String(bytes, dictStart, s - dictStart,
            StandardCharsets.ISO_8859_1)
          // stream keyword is followed by CRLF or LF (ISO 32000 7.3.8.1).
          var dataStart = s + "stream".length
          if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
          val e = indexOf(bytes, "endstream", dataStart)
          if (e < 0) from = -1
          else {
            var dataEnd = e
            // Strip the EOL that precedes "endstream".
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
            val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val content =
              if (dict.contains("/FlateDecode")) inflate(raw) else Some(raw)
            content.foreach { c =>
              val t = contentStreamText(c)
              if (t.nonEmpty) { sb.append(t); found = true }
            }
            from = e + "endstream".length
          }
        }
      }
      val text = sb.result().trim
      if (!found || text.isEmpty) Left("pdf: no text operators")
      else Right(text)
    } catch {
      case ex: Exception => Left(s"pdf: ${String.valueOf(ex.getMessage)}")
    }
  }

  /** Shown strings of `Tj` / `'` / `"` / `TJ`, in stream order; newline per
    * show op (one op per line is how writers emit lines).
    */
  private def contentStreamText(c: Array[Byte]): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder // strings seen since the last operator
    var i = 0
    def flushOp(): Unit =
      if (pending.nonEmpty) { sb.append(pending).append('\n'); pending.clear() }
    while (i < c.length) {
      c(i) match {
        case '(' =>
          val (s, next) = literalString(c, i)
          pending.append(s); i = next
        case '<' if i + 1 < c.length && c(i + 1) != '<' &&
            (i == 0 || c(i - 1) != '<') =>
          val (s, next) = hexString(c, i)
          pending.append(s); i = next
        case 'T' if i + 1 < c.length && (c(i + 1) == 'j' || c(i + 1) == 'J') =>
          flushOp(); i += 2
        case '\'' | '"' => flushOp(); i += 1
        case '%' => // comment to EOL
          while (i < c.length && c(i) != '\n' && c(i) != '\r') i += 1
        case _ => i += 1
      }
    }
    // Unterminated trailing strings are dropped (no show operator ran).
    sb.result()
  }

  /** PDF literal string at `c(start) == '('` → (decoded, index after ')').
    * Handles balanced nested parens, the standard escapes, and 1–3 digit
    * octal codes (ISO 32000 7.3.4.2).
    */
  private def literalString(c: Array[Byte], start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < c.length && depth > 0) {
      c(i) match {
        case '\\' if i + 1 < c.length =>
          c(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => // line continuation
              i += 2; if (i < c.length && c(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0; i += 1
              while (n < 3 && i < c.length && c(i) >= '0' && c(i) <= '7') {
                v = v * 8 + (c(i) - '0'); i += 1; n += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other.toChar); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case b => sb.append((b & 0xff).toChar); i += 1
      }
    }
    (sb.result(), i)
  }

  /** PDF hex string at `c(start) == '<'` → (decoded, index after '>'). */
  private def hexString(c: Array[Byte], start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var hi = -1
    while (i < c.length && c(i) != '>') {
      val ch = c(i).toChar
      val v = Character.digit(ch, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar) // odd count: last digit ≙ X0
    (sb.result(), i + 1)
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val out = new ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated / not actually deflate
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  // ------------------------------------------------------------- writers

  /** Minimal valid single-page PDF with a Flate-compressed content stream
    * showing `text` one line per `Tj`. Used to build real binary fixtures.
    */
  def minimalPdf(text: String): Array[Byte] = {
    def esc(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '('  => "\\("
        case ')'  => "\\)"
        case c    => c.toString
      }
    val shows = text.split("\n", -1).zipWithIndex.map { case (line, i) =>
      val op = if (i == 0) "BT /F1 12 Tf 72 720 Td" else "0 -14 Td"
      s"$op (${esc(line)}) Tj"
    }.mkString("", "\n", "\nET")
    val content = deflate(shows.getBytes(StandardCharsets.ISO_8859_1))

    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def obj(body: String): Unit = { offsets += out.size(); w(body) }
    w("%PDF-1.4\n")
    obj("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    obj("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    obj("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets += out.size()
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    obj("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xref = out.size()
    w(s"xref\n0 6\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString)
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Minimal valid .docx (OOXML package): content types, package rels, and
    * `word/document.xml` with one `<w:p>/<w:t>` per input line.
    */
  def minimalDocx(text: String): Array[Byte] = {
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    def escXml(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }
    val paras = text.split("\n", -1).map { line =>
      s"""<w:p><w:r><w:t xml:space="preserve">${escXml(line)}</w:t></w:r></w:p>"""
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$w"><w:body>$paras</w:body></w:document>"""
        .stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin

    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("[Content_Types].xml", contentTypes)
    entry("_rels/.rels", rels)
    entry("word/document.xml", doc)
    zos.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------- helpers

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DeflaterOutputStream(bos, new Deflater(Deflater.BEST_SPEED))
    dos.write(data); dos.close()
    bos.toByteArray
  }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    val last = hay.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val n = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.min(before, hay.length) - n.length
    while (i >= 0) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i -= 1
    }
    -1
  }
}
