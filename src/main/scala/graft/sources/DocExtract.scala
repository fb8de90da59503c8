package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.{Charset, CodingErrorAction}
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Extraction result: `text` carries the reference's sentinel strings on
  * failure (`/root/reference/crawler/file_ingestion.py:61-63`), `error`
  * the raw message (null on success).
  */
final case class ExtractResult(text: String, error: String)

/** Bytes -> text extraction for the crawler's document formats
  * (S4-S10, `/root/reference/crawler/file_ingestion.py:19-63`), plus the
  * charset-fallback HTML decode (F15/C16,
  * `/root/reference/crawler/crawler_core.py:33-55`).
  *
  * No external parser libraries ship with this environment, so the
  * OOXML formats (docx/pptx/xlsx) are parsed for real from their
  * ZIP+XML containers with the JDK alone, matching what the reference's
  * libraries emit per format:
  *   - .docx: paragraph texts (runs concatenated) joined with \n
  *   - .ppt/.pptx: non-empty shape texts per slide, joined with \n
  *   - .xls/.xlsx: non-empty stringified cells joined with spaces, rows
  *     joined with \n
  *   - .pdf: minimal text-operator extraction (Tj/TJ inside BT/ET,
  *     FlateDecode streams supported) — one line per text-show op, the
  *     shape PyMuPDF emits for simple pages
  *   - .txt: UTF-8 with malformed input ignored
  *   - .doc: fixed legacy placeholder (`file_ingestion.py:30-34`)
  *   - anything else: empty string
  * Any parser exception is captured as the reference's
  * `[Error extracting {ext} file: ...]` sentinel — extraction never
  * fails a job (S10).
  *
  * Everything here is a scalar UDF over BinaryType: at scale it runs
  * inside the scan projection, partition-parallel, no shuffle.
  */
object DocExtract {

  val LegacyDocPlaceholder =
    "[Legacy .doc file - extraction not supported with current library]"

  // ---- format parsers ------------------------------------------------------

  /** Zip container entries; any underlying corruption surfaces as one
    * deterministic message (the sentinel text must be stable for the
    * differential oracle).
    */
  private def zipEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    {
      // close() in finally ends the stream's native Inflater; leaking
      // one per document throttles the whole session (Cleaner backlog).
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        val out = ArrayBuffer.empty[(String, Array[Byte])]
        var e = zin.getNextEntry
        while (e != null) {
          out += ((e.getName, zin.readAllBytes()))
          e = zin.getNextEntry
        }
        out.toSeq
      } catch {
        case _: Exception =>
          throw new IllegalArgumentException("bad zip container")
      } finally zin.close()
    }

  private def unescapeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  private val WT = "(?s)<w:t[^>]*>(.*?)</w:t>".r
  private val AT = "(?s)<a:t[^>]*>(.*?)</a:t>".r
  private val WP = "(?s)<w:p[ >].*?</w:p>".r
  private val SP = "(?s)<p:sp>.*?</p:sp>".r
  private val ROW = "(?s)<row[^>]*>.*?</row>".r
  private val CELL = "(?s)<c[ >].*?</c>".r
  private val IST = "(?s)<is><t[^>]*>(.*?)</t></is>".r
  private val V = "(?s)<v>(.*?)</v>".r

  /** .docx: python-docx's "\n".join(p.text for p in paragraphs). */
  def parseDocx(bytes: Array[Byte]): String = {
    val doc = zipEntries(bytes).collectFirst {
      case ("word/document.xml", b) => new String(b, "UTF-8")
    }.getOrElse(throw new IllegalArgumentException("no word/document.xml entry"))
    WP.findAllIn(doc)
      .map(p => WT.findAllMatchIn(p).map(m => unescapeXml(m.group(1))).mkString)
      .mkString("\n")
  }

  /** .pptx: non-empty shape texts across slides (slide order), "\n"-joined. */
  def parsePptx(bytes: Array[Byte]): String = {
    val slideNum = "ppt/slides/slide(\\d+)\\.xml".r
    val slides = zipEntries(bytes).flatMap {
      case (slideNum(n), b) => Some(n.toInt -> new String(b, "UTF-8"))
      case _ => None
    }.sortBy(_._1)
    if (slides.isEmpty)
      throw new IllegalArgumentException("no ppt/slides entries")
    slides.flatMap { case (_, xml) =>
      SP.findAllIn(xml)
        .map(sp => AT.findAllMatchIn(sp).map(m => unescapeXml(m.group(1)))
          .mkString.trim)
        .filter(_.nonEmpty)
    }.mkString("\n")
  }

  /** .xlsx: cells (inline strings or <v> values) joined with spaces,
    * non-empty rows joined with "\n", sheets in order.
    */
  def parseXlsx(bytes: Array[Byte]): String = {
    val sheetNum = "xl/worksheets/sheet(\\d+)\\.xml".r
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] = entries.collectFirst {
      case ("xl/sharedStrings.xml", b) =>
        IST.findAllMatchIn(new String(b, "UTF-8"))
          .map(m => unescapeXml(m.group(1))).toIndexedSeq
    }.getOrElse(IndexedSeq.empty)
    val sheets = entries.flatMap {
      case (sheetNum(n), b) => Some(n.toInt -> new String(b, "UTF-8"))
      case _ => None
    }.sortBy(_._1)
    if (sheets.isEmpty)
      throw new IllegalArgumentException("no xl/worksheets entries")
    sheets.flatMap { case (_, xml) =>
      ROW.findAllIn(xml).map { row =>
        CELL.findAllIn(row).flatMap { cell =>
          val inline = IST.findFirstMatchIn(cell).map(m => unescapeXml(m.group(1)))
          val value = V.findFirstMatchIn(cell).map { m =>
            if (cell.contains("t=\"s\"")) shared(m.group(1).trim.toInt)
            else m.group(1)
          }
          inline.orElse(value).map(_.trim).filter(_.nonEmpty)
        }.mkString(" ")
      }.filter(_.nonEmpty)
    }.mkString("\n")
  }

  private val STREAM = "(?s)<<(.*?)>>\\s*stream\r?\n(.*?)endstream".r
  private val TJ = "\\((((?:[^()\\\\]|\\\\.)*))\\)\\s*Tj".r

  private def unescapePdf(s: String): String =
    s.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")

  /** .pdf: text-show strings from content streams (Flate or plain),
    * one line per Tj, "\n"-joined — the layout PyMuPDF's get_text
    * produces for simple generated pages.
    */
  def parsePdf(bytes: Array[Byte]): String = {
    val raw = new String(bytes, "ISO-8859-1")
    if (!raw.startsWith("%PDF"))
      throw new IllegalArgumentException("not a PDF header")
    STREAM.findAllMatchIn(raw).flatMap { m =>
      val dict = m.group(1)
      val body = m.group(2)
      val content =
        if (dict.contains("/FlateDecode")) {
          // end() in finally — same native-state leak as zipEntries.
          val inf = new Inflater()
          try {
            inf.setInput(body.getBytes("ISO-8859-1"))
            val buf = new Array[Byte](1 << 16)
            val out = new java.io.ByteArrayOutputStream()
            while (!inf.finished() && !inf.needsInput()) {
              val n = inf.inflate(buf)
              if (n > 0) out.write(buf, 0, n)
            }
            new String(out.toByteArray, "ISO-8859-1")
          } finally inf.end()
        } else body
      TJ.findAllMatchIn(content).map(t => unescapePdf(t.group(1)))
    }.mkString("\n")
  }

  /** .txt: UTF-8, malformed input ignored (errors="ignore"). */
  def decodeTxtUtf8Ignore(bytes: Array[Byte]): String = {
    val dec = Charset.forName("UTF-8").newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  // ---- dispatch (S3-S10) ---------------------------------------------------

  /** Per-extension dispatch with the reference's error sentinel. */
  def extractText(bytes: Array[Byte], ext: String): ExtractResult = {
    val e = if (ext == null) "" else ext.toLowerCase
    try {
      val text = e match {
        case ".pdf" => parsePdf(bytes)
        case ".docx" => parseDocx(bytes)
        case ".doc" => LegacyDocPlaceholder
        case ".ppt" | ".pptx" => parsePptx(bytes)
        case ".xls" | ".xlsx" => parseXlsx(bytes)
        case ".txt" => decodeTxtUtf8Ignore(bytes)
        case _ => ""
      }
      ExtractResult(text, null)
    } catch {
      case ex: Exception =>
        ExtractResult(s"[Error extracting $e file: ${ex.getMessage}]",
          ex.getMessage)
    }
  }

  /** (payload, ext) -> struct(text, error). */
  val extractUdf: UserDefinedFunction =
    udf { (bytes: Array[Byte], ext: String) =>
      if (bytes == null) ExtractResult("", "no payload")
      else extractText(bytes, ext)
    }

  // ---- charset fallback decode (F15/C16) -----------------------------------

  private def strictDecode(bytes: Array[Byte], charset: String): Option[String] =
    try {
      val dec = Charset.forName(charset).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  /** The reference's decode chain (`crawler_core.py:33-55`): header
    * charset -> strict UTF-8 unless it smells like mojibake (ý/þ) ->
    * windows-1254 -> iso-8859-9 -> UTF-8 with replacement.
    */
  def decodeHtml(bytes: Array[Byte], contentType: String): String = {
    val fromHeader =
      if (contentType != null && contentType.toLowerCase.contains("charset=")) {
        val cs = contentType.toLowerCase.split("charset=").last
          .split(";")(0).trim
        strictDecode(bytes, cs)
      } else None
    fromHeader
      .orElse(strictDecode(bytes, "UTF-8")
        .filter(t => !t.contains('ý') && !t.contains('þ')))
      .orElse(strictDecode(bytes, "windows-1254"))
      .orElse(strictDecode(bytes, "ISO-8859-9"))
      .getOrElse(new String(bytes, "UTF-8"))
  }

  /** (payload, content_type) -> decoded html/text. */
  val decodeHtmlUdf: UserDefinedFunction =
    udf { (bytes: Array[Byte], contentType: String) =>
      if (bytes == null) null else decodeHtml(bytes, contentType)
    }
}
