package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM extraction semantics (no Spark needed): per-format parsing,
  * dispatch, error capture, and the charset decode chain — including the
  * edge cases the SQL oracle can't express.
  */
class DocExtractSpec extends AnyFunSuite {

  private val lines = Seq("alpha beta gamma", "delta epsilon", "zeta")

  test("docx round trip incl. XML escaping") {
    val tricky = Seq("a & b < c", "d > \"e\" 'f'")
    assert(DocExtract.parseDocx(DocBuild.docxBytes(lines)) ==
      lines.mkString("\n"))
    assert(DocExtract.parseDocx(DocBuild.docxBytes(tricky)) ==
      tricky.mkString("\n"))
  }

  test("pptx round trip keeps slide order past 9 slides") {
    val many = (1 to 12).map(i => s"slide $i text")
    assert(DocExtract.parsePptx(DocBuild.pptxBytes(many)) ==
      many.mkString("\n"))
  }

  test("xlsx round trip joins cells with spaces, rows with newlines") {
    assert(DocExtract.parseXlsx(DocBuild.xlsxBytes(lines)) ==
      lines.mkString("\n"))
  }

  test("pdf round trip: plain and FlateDecode streams, escaped parens") {
    val tricky = Seq("with (parens) and \\ backslash", "plain line")
    assert(DocExtract.parsePdf(DocBuild.pdfBytes(tricky, flate = false)) ==
      tricky.mkString("\n"))
    assert(DocExtract.parsePdf(DocBuild.pdfBytes(tricky, flate = true)) ==
      tricky.mkString("\n"))
  }

  test("dispatch: txt ignores malformed utf-8, .doc placeholder, errors") {
    val badUtf8 = "ok ".getBytes("UTF-8") ++ Array(0xFF.toByte) ++
      "fine".getBytes("UTF-8")
    assert(DocExtract.extractText(badUtf8, ".txt") ==
      ExtractResult("ok fine", null))
    assert(DocExtract.extractText(Array[Byte](1), ".doc").text ==
      DocExtract.LegacyDocPlaceholder)
    assert(DocExtract.extractText(Array[Byte](1, 2), ".weird") ==
      ExtractResult("", null))
    val err = DocExtract.extractText("not a zip".getBytes, ".docx")
    assert(err.text.startsWith("[Error extracting .docx file:"))
    assert(err.error != null)
    val errPdf = DocExtract.extractText("not a pdf".getBytes, ".pdf")
    assert(errPdf.text == "[Error extracting .pdf file: not a PDF header]")
  }

  test("charset chain: header wins, mojibake rejected, fallbacks strict") {
    // Header charset decodes directly.
    assert(DocExtract.decodeHtml("abcÿ".getBytes("ISO-8859-9"),
      "text/html; charset=iso-8859-9") == "abcÿ")
    // Garbage header falls through to utf-8.
    assert(DocExtract.decodeHtml("abc".getBytes("UTF-8"),
      "text/html; charset=nonsense") == "abc")
    // Valid utf-8 containing ý is treated as mojibake -> cp1254 redecode.
    val moji = "abý".getBytes("UTF-8")
    assert(DocExtract.decodeHtml(moji, null) == "abÃ½")
    // Invalid utf-8 falls to windows-1254.
    val cp = Array('a'.toByte, 0xFF.toByte)
    assert(DocExtract.decodeHtml(cp, null) == "aÿ")
    // 0x81 is undefined in cp1254 AND iso-8859-9 is java-mapped; the
    // chain must still return a replacement-decoded string, never throw.
    val und = Array('a'.toByte, 0x81.toByte)
    assert(DocExtract.decodeHtml(und, null).startsWith("a"))
  }
}
