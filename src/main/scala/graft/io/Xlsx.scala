package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Minimal driver-side .xlsx (ECMA-376 SpreadsheetML) reader/writer for
  * the metadata-codebook path (SURVEY.md §2.1 S3/S8): the reference's
  * pipelines START from an Excel codebook
  * (`pd.read_excel('updated_dataframe.xlsx')`, final-assignment/legacy/
  * modeling.py:87; 빅데이터분석_팀프로젝트3/0.meta_data_check.ipynb cell 0)
  * and WRITE one filtered workbook (1-1.data_processing.ipynb cell 13).
  * Codebooks are tiny dimension tables (hundreds of rows), so a
  * driver-side parse feeding a broadcast-scale DataFrame is the right
  * altitude — the cluster never touches the xlsx, and the resulting
  * relation drives expression GENERATION via [[graft.meta.Codebook]].
  *
  * Scope: first worksheet; shared, inline, and formula-cached string
  * cells plus numeric cells (kept as their literal text — the codebook
  * consumer parses types itself); first row = header; all columns
  * surface as strings. Deliberately NOT a general Excel library: styles,
  * dates-as-numbers and live formulas are out of scope.
  */
object Xlsx {

  // ------------------------------------------------------------- reading

  /** Read the first worksheet into a DataFrame of string columns (header
    * from row 1, missing/blank cells → null). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip, e)).getOrElse(Vector.empty)
      val sheetEntry = firstSheetEntry(zip)
      val rows = parseSheet(zip, sheetEntry, shared)
      require(rows.nonEmpty, s"no rows in $path")
      val header = rows.head.map(h => Option(h).getOrElse("").trim)
      val width = header.length
      val data = rows.tail.map { r =>
        Row.fromSeq(r.padTo(width, null).take(width).toSeq)
      }
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      spark.createDataFrame(data.asJava, schema)
    } finally zip.close()
  }

  private def dom(zip: ZipFile, entry: ZipEntry) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // no DTD/external-entity resolution: spreadsheet payloads are data
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val in = zip.getInputStream(entry)
    try f.newDocumentBuilder().parse(in) finally in.close()
  }

  private def elems(parent: Element, local: String): Seq[Element] = {
    val nl = parent.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** One entry per <si>: concatenated text of every descendant <t> (plain
    * and rich-text-run strings both flatten to their visible text). */
  private def parseSharedStrings(zip: ZipFile, e: ZipEntry): Vector[String] = {
    val doc = dom(zip, e)
    elems(doc.getDocumentElement, "si").map { si =>
      elems(si, "t").map(_.getTextContent).mkString
    }.toVector
  }

  /** The first worksheet part, by the conventional sheetN.xml ordering
    * (workbook-relationship indirection is unnecessary for single-sheet
    * codebooks and pandas/openpyxl output). */
  private def firstSheetEntry(zip: ZipFile): ZipEntry = {
    val sheets = zip.entries().asScala
      .filter(e => e.getName.matches("xl/worksheets/sheet[0-9]+\\.xml"))
      .toSeq.sortBy(e => e.getName.replaceAll("[^0-9]", "").toInt)
    require(sheets.nonEmpty, "xlsx has no worksheet parts")
    sheets.head
  }

  /** Rows as dense string arrays (A1-style cell refs place values; gaps
    * stay null). */
  private def parseSheet(zip: ZipFile, e: ZipEntry,
                         shared: Vector[String]): Vector[Array[String]] = {
    val doc = dom(zip, e)
    val out = ArrayBuffer.empty[Array[String]]
    for (rowEl <- elems(doc.getDocumentElement, "row")) {
      val cells = ArrayBuffer.empty[(Int, String)]
      for (c <- elems(rowEl, "c")) {
        val idx = colIndex(c.getAttribute("r"))
        val t = c.getAttribute("t")
        val value: String = t match {
          case "inlineStr" =>
            elems(c, "t").map(_.getTextContent).mkString
          case "s" =>
            val v = elems(c, "v").headOption.map(_.getTextContent.trim)
            v.map(i => shared(i.toInt)).orNull
          case _ => // "str" (formula-cached), "n", "b", or untyped numeric
            elems(c, "v").headOption.map(_.getTextContent).orNull
        }
        if (value != null) cells += idx -> value
      }
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val arr = new Array[String](width)
      cells.foreach { case (i, v) => arr(i) = v }
      out += arr
    }
    out.toVector
  }

  /** "BC7" → 0-based column 54 (letters are bijective base-26). */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty, s"cell ref without column letters: $ref")
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  // ------------------------------------------------------------- writing

  /** Write a SMALL DataFrame (codebook/summary scale — it is collected to
    * the driver) as a single-sheet xlsx with a header row; every cell is
    * an inline string (self-contained part, no sharedStrings table). */
  def write(df: DataFrame, path: String): Unit = {
    val header = df.columns
    val rows = df.collect()
    val sheet = new StringBuilder
    sheet ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def rowXml(r: Int, values: Seq[Any]): Unit = {
      sheet ++= s"""<row r="${r + 1}">"""
      values.zipWithIndex.foreach { case (v, i) =>
        if (v != null) {
          sheet ++= s"""<c r="${colRef(i)}${r + 1}" t="inlineStr"><is><t>"""
          sheet ++= escape(String.valueOf(v))
          sheet ++= "</t></is></c>"
        }
      }
      sheet ++= "</row>"
    }
    rowXml(0, header.toSeq)
    rows.zipWithIndex.foreach { case (r, i) => rowXml(i + 1, r.toSeq) }
    sheet ++= "</sheetData></worksheet>"

    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def part(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", workbookRels)
      part("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }

  /** 0-based column → letters (0→A, 26→AA). */
  private[graft] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
}
