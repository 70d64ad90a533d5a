package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM PDF/DOCX extraction — round-trips through the minimal writers
  * plus syntax-level cases (escapes, hex strings, TJ arrays, uncompressed
  * streams, corrupt inputs) that a writer round-trip alone wouldn't pin.
  */
class BinaryExtractSpec extends AnyFunSuite {

  test("docx round-trip: single paragraph") {
    val text = "key agg row scan slow fast table value"
    assert(BinaryExtract.docx(BinaryExtract.minimalDocx(text)) == Right(text))
  }

  test("docx round-trip: multi-paragraph with xml-special chars") {
    val text = "a < b & c > d\nsecond <para> line\nthird"
    assert(BinaryExtract.docx(BinaryExtract.minimalDocx(text)) == Right(text))
  }

  test("docx: zip without document.xml and non-zip bytes are errors") {
    assert(BinaryExtract.docx("plain text".getBytes).isLeft)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zos.write("x".getBytes); zos.closeEntry(); zos.close()
    assert(BinaryExtract.docx(bos.toByteArray) ==
      Left("docx: word/document.xml not found"))
  }

  test("pdf round-trip: single line through FlateDecode") {
    val text = "batch window spark order data column agg join"
    assert(BinaryExtract.pdf(BinaryExtract.minimalPdf(text)) == Right(text))
  }

  test("pdf round-trip: multi-line and paren/backslash escapes") {
    val text = "f(x) = (a \\ b)\nsecond (nested (deep)) line"
    assert(BinaryExtract.pdf(BinaryExtract.minimalPdf(text)) == Right(text))
  }

  test("pdf: uncompressed stream, TJ array, and hex strings parse") {
    val content = "BT [(he) -120 (llo)] TJ ET\nBT <776f726c64> Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF\n").getBytes
    assert(BinaryExtract.pdf(pdf) == Right("hello\nworld"))
  }

  test("pdf: octal escapes and line continuations decode") {
    val content = "BT (A\\101\\12B\\\nC) Tj ET" // \101='A', \12='\n', \<eol> elided
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF\n").getBytes
    assert(BinaryExtract.pdf(pdf) == Right("AA\nBC"))
  }

  test("pdf: plain text (no %PDF header) and textless pdf are errors") {
    assert(BinaryExtract.pdf("just some text".getBytes) ==
      Left("pdf: missing %PDF- header"))
    val noText = "%PDF-1.4\n1 0 obj << >> endobj\n%%EOF\n".getBytes
    assert(BinaryExtract.pdf(noText) == Left("pdf: no text operators"))
  }

  test("chain integration: real pdf wins on jvm leg, corrupt pdf falls to cli") {
    // Direct extract-level check of the s9 semantics without Spark.
    val good = BinaryExtract.pdf(BinaryExtract.minimalPdf("good body"))
    assert(good == Right("good body"))
    assert(BinaryExtract.pdf("corrupt bytes".getBytes).isLeft)
  }
}
