package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import graft.operators.Upsert
import graft.sources.{DocBuild, DocExtract, Store}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/extraction surface (SURVEY §2.1 S3-S10, §2.2 F10/F15):
  * document payload -> text with per-format dispatch and error capture,
  * size gating, and the charset-fallback decode.
  *
  * The testdata carries no binary columns, so payloads are synthesized
  * deterministically from `documents.text` (split into 8-word lines)
  * with `DocBuild`, run through the REAL extraction UDFs, and compared
  * against the SQL-expressible expected text — a differential test of
  * the whole bytes -> text path.
  */
object SourceQueries {

  /** documents + `lines` (array of 8-word chunks of text). */
  private def withLines(docs: DataFrame): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    docs.withColumn("toks", toks)
      .withColumn("n_lines",
        ceil(size(col("toks")) / lit(8.0)).cast("int"))
      .withColumn("lines",
        transform(sequence(lit(1), col("n_lines")),
          i => concat_ws(" ", slice(col("toks"), (i - lit(1)) * 8 + 1, lit(8)))))
  }

  /** The identical chunking as a DuckDB CTE: `ls` = 8-word lines. */
  private val LinesCte =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(text, ' '), ' '), x -> x <> '') AS l
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id,
      |    list_transform(range(1, cast(ceil(len(l) / 8.0) AS INT) + 1),
      |      i -> array_to_string(l[((i-1)*8+1):least(i*8, len(l))], ' ')) AS ls
      |  FROM toks)
      |""".stripMargin

  private def extractedText(payload: Column, ext: String): Column =
    DocExtract.extractUdf(payload, lit(ext)).getField("text")

  private def roundTrip(name: String, ext: String)(
      payload: DataFrame => Column): QueryDef =
    QueryDef(
      name,
      LinesCte +
        """SELECT doc_id, array_to_string(ls, chr(10)) AS text
          |FROM lines ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = withLines(Tables.documents(s, d))
      docs.select(col("doc_id"),
        extractedText(payload(docs), ext).as("text"))
        .presentSorted(col("doc_id"))
    }

  val defs: Seq[QueryDef] = Seq(

    // S5: docx container -> paragraph texts.
    roundTrip("s5_docx_roundtrip_extract", ".docx")(
      _ => DocBuild.docxUdf(col("lines"))),

    // S7: pptx container -> per-slide shape texts.
    roundTrip("s7_pptx_roundtrip_extract", ".pptx")(
      _ => DocBuild.pptxUdf(col("lines"))),

    // S8: xlsx container -> cells joined by spaces, rows by newlines.
    roundTrip("s8_xlsx_roundtrip_extract", ".xlsx")(
      _ => DocBuild.xlsxUdf(col("lines"))),

    // S4: pdf content streams (Flate-compressed for every even doc).
    roundTrip("s4_pdf_roundtrip_extract", ".pdf")(
      _ => DocBuild.pdfUdf(col("lines"), col("doc_id") % 2 === 0)),

    // S6+S9+S10: dispatch matrix — txt passthrough, legacy .doc
    // placeholder, unknown ext, and error capture on a well-formed zip
    // that is not a docx.
    QueryDef(
      "s6_s10_extract_dispatch",
      """SELECT doc_id, CASE doc_id % 4
        |  WHEN 0 THEN text
        |  WHEN 1 THEN '[Legacy .doc file - extraction not supported with current library]'
        |  WHEN 2 THEN ''
        |  ELSE '[Error extracting .docx file: no word/document.xml entry]'
        |  END AS text
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = withLines(Tables.documents(s, d))
      val ext = element_at(
        array(lit(".txt"), lit(".doc"), lit(".bin"), lit(".docx")),
        (col("doc_id") % 4 + 1).cast("int"))
      val payload = when(col("doc_id") % 4 === 0, encode(col("text"), "UTF-8"))
        .when(col("doc_id") % 4 === 3, DocBuild.xlsxUdf(col("lines")))
        .otherwise(encode(lit("x"), "UTF-8"))
      docs.select(col("doc_id"),
        DocExtract.extractUdf(payload, ext).getField("text").as("text"))
        .presentSorted(col("doc_id"))
    },

    // F10: size gate before extraction (max_file_bytes,
    // /root/reference/crawler/file_ingestion.py:79-80) — oversized
    // payloads are skipped with a marker, never extracted.
    QueryDef(
      "f10_size_gate",
      """SELECT route, count(*) AS n, sum(n_text)::BIGINT AS total_text FROM (
        |  SELECT CASE WHEN strlen(text) > 300 THEN 'skipped_too_large'
        |              ELSE 'extracted' END AS route,
        |    CASE WHEN strlen(text) > 300 THEN 0 ELSE strlen(text) END AS n_text
        |  FROM documents)
        |GROUP BY route ORDER BY route""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
      docs
        .withColumn("route",
          when(octet_length(col("payload")) > 300, lit("skipped_too_large"))
            .otherwise(lit("extracted")))
        .withColumn("extracted",
          when(col("route") === "extracted",
            extractedText(col("payload"), ".txt")).otherwise(lit("")))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("extracted"))).as("total_text"))
        .presentSorted(col("route"))
    },

    // S13-S17 + T1: the physical store — write a site-partitioned
    // parquet store, MERGE an incoming batch (updates + inserts) with
    // dynamic partition overwrite, then re-deliver the same batch. The
    // partitions_rewritten_* columns PROVE the physical semantics: the
    // first merge touches every site, the idempotent second rewrites 0.
    QueryDef(
      "s13_s17_partitioned_merge_store",
      """WITH store AS (
        |  SELECT doc_id, source AS site, text FROM documents WHERE doc_id % 3 <> 0),
        |inc AS (
        |  SELECT doc_id, source AS site, 'v2 ' || text AS text
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 8000000, source, 'new ' || text
        |  FROM documents WHERE doc_id % 10 = 0),
        |merged AS (
        |  SELECT coalesce(i.doc_id, s.doc_id) AS doc_id,
        |         coalesce(i.site, s.site) AS site,
        |         coalesce(i.text, s.text) AS text
        |  FROM store s FULL OUTER JOIN inc i ON s.doc_id = i.doc_id)
        |SELECT site, count(*) AS n,
        |  sum(CASE WHEN text LIKE 'v2 %' THEN 1 ELSE 0 END)::BIGINT AS n_updated,
        |  sum(CASE WHEN text LIKE 'new %' THEN 1 ELSE 0 END)::BIGINT AS n_new,
        |  (SELECT count(DISTINCT source) FROM documents
        |   WHERE doc_id % 4 = 0 OR doc_id % 10 = 0) AS partitions_rewritten_first,
        |  0::BIGINT AS partitions_rewritten_second
        |FROM merged GROUP BY site ORDER BY site""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val store0 = Upsert.withContentHash(
        docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), col("source").as("site"), col("text")), "text")
      val incoming = Upsert.withContentHash(
        docs.filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"), col("source").as("site"),
            concat(lit("v2 "), col("text")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 8000000).as("doc_id"),
              col("source").as("site"),
              concat(lit("new "), col("text")).as("text"))), "text")
      val path = java.nio.file.Files.createTempDirectory("graft-store")
        .toString + "/docs"
      Store.writePartitioned(store0, path, "site")
      val first = Store.mergeInto(s, path, incoming, "doc_id", "site")
      val second = Store.mergeInto(s, path, incoming, "doc_id", "site")
      Store.read(s, path)
        .groupBy(col("site"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("text").startsWith("v2 "), 1).otherwise(0)).as("n_updated"),
          sum(when(col("text").startsWith("new "), 1).otherwise(0)).as("n_new"))
        .withColumn("partitions_rewritten_first", lit(first))
        .withColumn("partitions_rewritten_second", lit(second))
        .presentSorted(col("site"))
    },

    // Small-file compaction (Store.compact): a fragmented
    // site-partitioned store (16-way shuffled write = up to 16 files
    // per site) is compacted to ceil(rows/40) files per site — file
    // counts become a pure function of the data, verified against the
    // REAL post-compaction directory listing, row counts against the
    // re-read store.
    QueryDef(
      "s17_compact_small_files",
      """SELECT source AS site, count(*)::BIGINT AS n_rows,
        |  cast(ceil(count(*) / 40.0) AS BIGINT) AS n_files
        |FROM documents WHERE doc_id % 2 = 0
        |GROUP BY source ORDER BY site""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source").as("site"), col("text"))
      val path = java.nio.file.Files.createTempDirectory("graft-compact")
        .toString + "/docs"
      docs.repartition(16).write.partitionBy("site").parquet(path)
      Store.compact(s, path, "site", maxRecordsPerFile = 40)
      val files = Store.filesPerPartition(s, path).toDF("site", "n_files")
      Store.read(s, path)
        .groupBy(col("site")).agg(count(lit(1)).as("n_rows"))
        .join(files, Seq("site"))
        .select(col("site"), col("n_rows"), col("n_files"))
        .presentSorted(col("site"))
    },

    // Z-order layout (operators.Layout): Morton-interleave two bounded
    // keys and bucket by fixed-width z-ranges — each bucket covers a
    // small rectangle in (a, b) space, the file-level min/max pruning
    // a single-key sort can't give. The oracle evaluates the identical
    // generated bit formula.
    QueryDef(
      "s17_zorder_buckets",
      s"""WITH k AS (
         |  SELECT l_orderkey % 1024 AS a, l_partkey % 1024 AS b FROM lineitem),
         |z AS (SELECT a, b,
         |  ${graft.operators.Layout.zorderValueSql("a", "b", 10)} AS z FROM k)
         |SELECT (z >> 15)::BIGINT AS bucket, count(*)::BIGINT AS n,
         |  min(a)::BIGINT AS min_a, max(a)::BIGINT AS max_a,
         |  min(b)::BIGINT AS min_b, max(b)::BIGINT AS max_b
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val k = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 1024).as("a"),
          (col("l_partkey") % 1024).as("b"))
      k.withColumn("z",
          graft.operators.Layout.zorderValue(col("a"), col("b"), 10))
        .groupBy(shiftright(col("z"), 15).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("min_a"), max(col("a")).as("max_a"),
          min(col("b")).as("min_b"), max(col("b")).as("max_b"))
        .presentSorted(col("bucket"))
    },

    // F15/C16: charset-fallback decode chain — header charset wins,
    // then strict UTF-8 (rejected on ý/þ mojibake), then windows-1254.
    QueryDef(
      "f15_charset_decode",
      """SELECT doc_id, CASE doc_id % 3
        |  WHEN 0 THEN text || 'ÿ'
        |  WHEN 1 THEN text
        |  ELSE text || 'Ã½'
        |  END AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // 0: header says iso-8859-9; trailing 0xFF decodes to 'ÿ'.
      // 1: no header, clean ascii -> strict utf-8 path.
      // 2: no header, valid utf-8 containing 'ý' -> mojibake reject ->
      //    windows-1254 re-decode turns the two utf-8 bytes into 'Ã½'.
      val payload = when(col("doc_id") % 3 === 0,
          concat(encode(col("text"), "UTF-8"), unhex(lit("FF"))))
        .when(col("doc_id") % 3 === 1, encode(col("text"), "UTF-8"))
        .otherwise(encode(concat(col("text"), lit("ý")), "UTF-8"))
      val ctype = when(col("doc_id") % 3 === 0,
        lit("text/html; charset=iso-8859-9")).otherwise(lit(null).cast("string"))
      docs.select(col("doc_id"),
        DocExtract.decodeHtmlUdf(payload, ctype).as("decoded"))
        .presentSorted(col("doc_id"))
    }
  )
}
