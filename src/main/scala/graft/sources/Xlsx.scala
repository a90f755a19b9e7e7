package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal xlsx source — closes the one reference *source* with no engine
  * path: the ETL entry points read Excel workbooks directly
  * (/root/reference/02_Extract_and_transform_raw_data/A2_hr_etl.py:14
  * `pd.read_excel("HR_Dataset_Dirty.xlsx")`; likewise B2/C2), which core
  * Spark cannot ingest. An .xlsx file is a zip of XML parts, so the reader
  * needs only the JDK: `java.util.zip` for the container and StAX
  * (`javax.xml.stream`, streaming pull-parser — no DOM allocation) for
  * `xl/worksheets/sheetN.xml` + `xl/sharedStrings.xml`.
  *
  * Shape mirrors the CSV raw-ingest contract ([[graft.etl.Etl]]): header
  * row promoted to column names, every column string-typed (late typing —
  * the staging tables are TEXT, combined_dw_schema.sql:156,172), absent or
  * empty cells null. Numeric cells render in shortest-round-trip double
  * form (`<v>2.4</v>` → "2.4", integrals without ".0"), boolean cells as
  * TRUE/FALSE — matching a CSV export of the sheet; XlsxSpec asserts
  * full-frame equality between each reference workbook and its dbt seed
  * CSV. Known limit: DATE-FORMATTED numeric cells surface as their raw
  * Excel serial (resolving them needs styles.xml number-format parsing);
  * the reference workbooks store dates as text, so the ETL path is
  * unaffected — callers ingesting other workbooks should store dates as
  * text or convert serials downstream.
  *
  * Scale: workbooks are inherently small files (a sheet caps at ~1M rows),
  * so the 100 TB shape is MANY files, not one big one. The reader is built
  * for that: `binaryFile` lists the glob into a distributed DataFrame and
  * each executor parses its files' bytes independently — only the header
  * probe (first file, one sheet) runs on the driver, and parallelism scales
  * with file count. No temp files, no driver collect of row data.
  */
object Xlsx {

  /** Read workbook(s) at `path` (file or glob) into an all-string DataFrame,
    * promoting sheet `sheet`'s first row to column names. All files must
    * share the header (asserted per-file at parse time). */
  def read(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    // Header probe: one small driver-side parse of the first file, schema
    // only — the row payload below is parsed distributed.
    val firstBytes = files.orderBy("path").select("content").head().getAs[Array[Byte]](0)
    val header = parseSheet(firstBytes, sheet).headOption
      .getOrElse(throw new IllegalArgumentException(s"$path: sheet $sheet is empty"))
      .map(v => Option(v).getOrElse(""))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val width = header.length

    val rows = files.rdd.flatMap { r =>
      val all = parseSheet(r.getAs[Array[Byte]]("content"), sheet)
      require(all.nonEmpty,
        s"${r.getAs[String]("path")}: sheet $sheet has no rows (no header)")
      val fileHeader = all.head.map(v => Option(v).getOrElse(""))
      require(fileHeader.sameElements(header),
        s"${r.getAs[String]("path")}: header ${fileHeader.mkString(",")} != ${header.mkString(",")}")
      all.iterator.drop(1).map(cells => Row.fromSeq(cells.padTo(width, null).take(width).toSeq))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Parse one worksheet out of an xlsx byte payload into rows of cell
    * strings (null = absent/empty cell). Pure function of the bytes — safe
    * to call from executors. */
  private[graft] def parseSheet(bytes: Array[Byte], sheet: Int): Array[Array[String]] = {
    var shared: Array[String] = Array.empty
    var sheetXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml"       => shared = parseSharedStrings(readAll(zin))
          case n if n == s"xl/worksheets/sheet$sheet.xml" => sheetXml = readAll(zin)
          case _ => ()
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, s"xl/worksheets/sheet$sheet.xml not present in workbook")
    parseRows(sheetXml, shared)
  }

  private def readAll(zin: ZipInputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = zin.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
    out.toByteArray
  }

  private def reader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // Harden against malicious workbook XML (no DTDs / external entities).
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** `<sst><si><t>text</t></si>…</sst>` → index-addressable string pool.
    * Rich-text runs (`<si><r><t>a</t></r><r><t>b</t></r></si>`) concatenate. */
  private def parseSharedStrings(bytes: Array[Byte]): Array[String] = {
    val r = reader(bytes)
    val pool = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => inSi = false; pool += cur.toString
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    pool.toArray
  }

  /** `<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c>…` → dense rows.
    * Cell column comes from the `r="C7"` reference so gaps (cells Excel
    * omits entirely) stay null; `t="s"` indexes the shared-string pool,
    * `t="inlineStr"` reads `<is><t>`, anything else takes the raw `<v>`
    * lexical value. Empty strings normalize to null (CSV parity). */
  private def parseRows(bytes: Array[Byte], shared: Array[String]): Array[Array[String]] = {
    val r = reader(bytes)
    val rows = ArrayBuffer.empty[Array[String]]
    var row: ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = 0
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty[String]
            case "c" if row != null =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellCol = colIndex(Option(r.getAttributeValue(null, "r")).getOrElse(""))
                .getOrElse(row.length)
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if row != null =>
              val raw = text.toString
              val value = cellType match {
                case "s" =>
                  if (raw.isEmpty) null
                  else {
                    val i = raw.trim.toInt
                    require(i < shared.length,
                      s"shared-string index $i but pool has ${shared.length} entries " +
                        "(xl/sharedStrings.xml missing or truncated)")
                    shared(i)
                  }
                case "b"      => if (raw.trim == "1") "TRUE" else "FALSE"
                case "" | "n" => renderNumeric(raw)
                case _        => raw
              }
              while (row.length <= cellCol) row += null
              row(cellCol) = if (value == null || value.isEmpty) null else value
            case "row" => rows += row.toArray; row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.toArray
  }

  /** Numeric cells store the full binary-double lexical form ("142.36" is
    * serialized as "142.36000000000001"); a CSV export of the sheet shows
    * the shortest string that round-trips to the same double — which is
    * exactly `Double.toString`'s contract. Integral values render without
    * the ".0" (Excel shows 94088, not 94088.0). Non-parsable text passes
    * through untouched. */
  private def renderNumeric(raw: String): String =
    if (raw.isEmpty) raw
    else try {
      val d = raw.toDouble
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    } catch { case _: NumberFormatException => raw }

  /** "C7" → 2 (zero-based column from the letter prefix); None if absent. */
  private[graft] def colIndex(ref: String): Option[Int] = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) None
    else Some(letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1)
  }
}
