package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}

import scala.collection.mutable

/** Pure-JDK XLSX reader/writer for the Excel connector — the reference's
  * headline non-SQL source/sink (reference engine/excel_source.go:95-281,
  * excel_dest.go:10-166, docs-src/docs/connections.md "Excel").
  *
  * An XLSX file is a zip of XML parts; `java.util.zip` + JAXP DOM suffice —
  * no external dependency. Semantics matched to the reference:
  *
  *  - RANGE `A1:C4` with at most one wildcard, `A1:B*` (unbounded rows) or
  *    `A1:*2` (unbounded columns) — aql/parser.go:379-463 ParseExcelRange;
  *  - source: when COLUMNS is absent the first row of the range holds the
  *    column names (excel_source.go:156-166 scanColumns), and the range
  *    cannot then be column-wildcarded; with a row wildcard, reading stops
  *    at the first fully-empty row (excel_source.go:185-197);
  *  - per-cell type probe int → float → bool → datetime → string
  *    (excel_source.go:226-272; default date format RFC3339). Divergence:
  *    a custom DATEFORMAT is a java.time pattern, not a Go layout;
  *  - destination: writes data rows only (no header row — the reference
  *    dest never emits column names), honors OVERWRITE / TEMPLATE /
  *    TRANSPOSE, and errors on fixed-range overflow in either axis
  *    (excel_dest.go:117-124).
  *
  * Scale note: an XLSX is a single driver-side artifact, like the console
  * sink — the reference's row-at-a-time writer is inherently single-file.
  * Distributed output belongs to the file connector; this one exists for
  * format parity and is bounded by its RANGE contract.
  */
object Excel {

  final case class RangePoint(wildcard: Boolean, p: Int)
  final case class CellRange(x1: Int, y1: Int, x2: RangePoint, y2: RangePoint)

  /** Parse `A1:C4` / `A1:B*` / `A1:*4` (reference aql/parser.go:379-463).
    * Columns and rows are 1-based.
    */
  def parseRange(s: String): CellRange = {
    val ps = s.split(":", -1)
    require(ps.length == 2, s"expected separator ':' in range '$s'")
    val (x1, y1) = parseCell(ps(0).trim)
    val (x2, y2) = parseCellWildcard(ps(1).trim)
    require(!(x2.wildcard && y2.wildcard),
      "the Excel source/destination range can have at most one wildcard")
    CellRange(x1, y1, x2, y2)
  }

  private def parseCell(s: String): (Int, Int) = {
    val letters = s.takeWhile(_.isLetter)
    val digits = s.drop(letters.length)
    require(letters.nonEmpty && digits.nonEmpty && digits.forall(_.isDigit),
      s"expected cell like 'A1' in range part '$s'")
    (lettersToCol(letters), digits.toInt)
  }

  private def parseCellWildcard(s: String): (RangePoint, RangePoint) = {
    val (colPart, rest) =
      if (s.startsWith("*")) ("*", s.drop(1))
      else { val l = s.takeWhile(_.isLetter); (l, s.drop(l.length)) }
    require(colPart.nonEmpty && rest.nonEmpty,
      s"expected cell like 'B2', 'B*' or '*2' in range part '$s'")
    val x = if (colPart == "*") RangePoint(wildcard = true, 0)
            else RangePoint(wildcard = false, lettersToCol(colPart))
    val y = if (rest == "*") RangePoint(wildcard = true, 0)
            else { require(rest.forall(_.isDigit),
                     s"expected row number in range part '$s'")
                   RangePoint(wildcard = false, rest.toInt) }
    (x, y)
  }

  /** 1-based column index ⇄ letters ("A"=1, "AA"=27). */
  def lettersToCol(s: String): Int =
    s.toUpperCase.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1))

  def colLetters(x: Int): String = {
    var n = x; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  // ------------------------------------------------------------- workbook

  /** In-memory workbook: raw zip entries (template passthrough) + parsed
    * per-sheet cell display strings, keyed (col, row) 1-based.
    */
  final class Workbook private[Excel] (
      private[Excel] val entries: mutable.LinkedHashMap[String, Array[Byte]],
      private[Excel] val sheetEntry: mutable.LinkedHashMap[String, String],
      private[Excel] val cells: mutable.LinkedHashMap[String, mutable.Map[(Int, Int), CellVal]]) {
    def sheetNames: Seq[String] = sheetEntry.keys.toSeq
    def cellsOf(sheet: String): mutable.Map[(Int, Int), CellVal] =
      cells.getOrElse(sheet,
        throw new IllegalArgumentException(s"unknown sheet '$sheet'"))
  }

  /** A cell value with its XLSX type; `display` is what the reference's
    * GetCellValue-based probe sees.
    */
  sealed trait CellVal { def display: String }
  final case class NumCell(raw: String) extends CellVal { def display: String = raw }
  final case class BoolCell(b: Boolean) extends CellVal {
    def display: String = if (b) "true" else "false"
  }
  final case class StrCell(s: String) extends CellVal { def display: String = s }

  def newWorkbook(): Workbook = new Workbook(
    mutable.LinkedHashMap.empty, mutable.LinkedHashMap.empty,
    mutable.LinkedHashMap.empty)

  def load(path: Path): Workbook = {
    val entries = mutable.LinkedHashMap.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(Files.readAllBytes(path)))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) entries(e.getName) = zin.readAllBytes()
        zin.closeEntry(); e = zin.getNextEntry
      }
    } finally zin.close()

    def xml(name: String): Option[Document] = entries.get(name).map(parseXml)
    val wbDoc = xml("xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException(s"$path: not an XLSX (no xl/workbook.xml)"))
    val relTargets: Map[String, String] =
      xml("xl/_rels/workbook.xml.rels").map { rels =>
        children(rels.getDocumentElement, "Relationship").map { r =>
          r.getAttribute("Id") -> r.getAttribute("Target")
        }.toMap
      }.getOrElse(Map.empty)
    val shared: IndexedSeq[String] = xml("xl/sharedStrings.xml").map { ss =>
      children(ss.getDocumentElement, "si").map(textOf).toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    val sheetEntry = mutable.LinkedHashMap.empty[String, String]
    val cells = mutable.LinkedHashMap.empty[String, mutable.Map[(Int, Int), CellVal]]
    val sheetsEl = children(wbDoc.getDocumentElement, "sheets")
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"$path: workbook.xml has no <sheets>"))
    var fallbackIdx = 0
    children(sheetsEl, "sheet").foreach { sh =>
      val name = sh.getAttribute("name")
      fallbackIdx += 1
      val rid = Option(sh.getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
        .filter(_.nonEmpty).orElse(Option(sh.getAttribute("r:id")).filter(_.nonEmpty))
      val target = rid.flatMap(relTargets.get)
        .getOrElse(s"worksheets/sheet$fallbackIdx.xml")
      val entry =
        if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
      sheetEntry(name) = entry
      cells(name) = entries.get(entry).map(b => parseSheet(parseXml(b), shared))
        .getOrElse(mutable.Map.empty)
    }
    new Workbook(entries, sheetEntry, cells)
  }

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // XXE hardening: XLSX parts never need external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def children(e: Element, local: String): Seq[Element] = {
    val out = mutable.ArrayBuffer.empty[Element]
    val nl = e.getChildNodes
    var i = 0
    while (i < nl.getLength) {
      nl.item(i) match {
        case el: Element if el.getLocalName == local ||
          el.getTagName.split(':').last == local => out += el
        case _ => ()
      }
      i += 1
    }
    out.toSeq
  }

  private def textOf(e: Element): String = {
    // concat all descendant <t> text (rich-text <si> has several runs)
    val sb = new StringBuilder
    def walk(el: Element): Unit =
      if (el.getLocalName == "t" || el.getTagName.split(':').last == "t")
        sb.append(el.getTextContent)
      else {
        val nl = el.getChildNodes
        var i = 0
        while (i < nl.getLength) {
          nl.item(i) match { case c: Element => walk(c); case _ => () }
          i += 1
        }
      }
    walk(e)
    sb.toString
  }

  private def parseSheet(doc: Document, shared: IndexedSeq[String])
      : mutable.Map[(Int, Int), CellVal] = {
    val out = mutable.Map.empty[(Int, Int), CellVal]
    val data = children(doc.getDocumentElement, "sheetData").headOption
    var rowNum = 0
    data.foreach(children(_, "row").foreach { row =>
      rowNum = Option(row.getAttribute("r")).filter(_.nonEmpty)
        .map(_.toInt).getOrElse(rowNum + 1)
      var colNum = 0
      children(row, "c").foreach { c =>
        val ref = Option(c.getAttribute("r")).filter(_.nonEmpty)
        colNum = ref.map(r => lettersToCol(r.takeWhile(_.isLetter)))
          .getOrElse(colNum + 1)
        val t = c.getAttribute("t")
        val v = children(c, "v").headOption.map(_.getTextContent)
        val value: Option[CellVal] = t match {
          case "s" => v.map(i => StrCell(shared.lift(i.trim.toInt).getOrElse("")))
          case "inlineStr" =>
            children(c, "is").headOption.map(is => StrCell(textOf(is)))
          case "b" => v.map(x => BoolCell(x.trim == "1" || x.trim == "true"))
          case "str" => v.map(StrCell)
          case _ => v.map(NumCell) // plain numeric (or date-serial) cell
        }
        value.foreach(out((colNum, rowNum)) = _)
      }
    })
    out
  }

  // ----------------------------------------------------------------- read

  /** Go strconv.ParseBool's exact accepted set (excel_source.go:248). */
  private val BoolTokens: Map[String, Boolean] = Map(
    "1" -> true, "t" -> true, "T" -> true, "TRUE" -> true, "true" -> true,
    "True" -> true, "0" -> false, "f" -> false, "F" -> false,
    "FALSE" -> false, "false" -> false, "False" -> false)

  /** Go reference-layout → java.time pattern translation. The reference's
    * DATEFORMAT option takes a Go `time.Parse` layout — a literal rendering
    * of the magic instant `Mon Jan 2 15:04:05 MST 2006`
    * (excel_source.go:256-268) — so a script ported from the reference
    * carries strings like `2006-01-02 15:04:05`.
    *
    * Dialect detection is the presence of the Go YEAR token `2006`
    * (documented in README "Divergences"): such layouts are translated
    * token-for-token (longest match first; literal letters quoted);
    * anything else — including yearless or two-digit-year Go layouts
    * like `15:04` or `01/02/06`, which are indistinguishable from digit
    * literals in a java pattern — is treated as a java.time pattern
    * directly. Offsets parse as wall-clock fields; the probe pins
    * custom-format timestamps to UTC (same divergence note as before —
    * Go applies the parsed offset).
    */
  def goLayoutToJavaPattern(layout: String): String = {
    val tokens = Seq(
      "2006" -> "yyyy", "January" -> "MMMM", "Jan" -> "MMM",
      "Monday" -> "EEEE", "Mon" -> "EEE",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      ".00" -> ".SS", ".0" -> ".S",
      // Go's .9-family is a trailing-zero-trimmed fraction that may be
      // absent entirely — java's closest is an optional section of fixed
      // width ([.SSS]): the absent case and full-width case parse; a
      // partially-trimmed fraction (".12" under ".999") does not
      // (documented divergence — java patterns cannot express "any
      // number of fraction digits")
      ".999999999" -> "[.SSSSSSSSS]", ".999999" -> "[.SSSSSS]",
      ".999" -> "[.SSS]", ".99" -> "[.SS]", ".9" -> "[.S]",
      "002" -> "DDD",
      "-07:00" -> "XXX", "-0700" -> "Z", "Z07:00" -> "XXX",
      "MST" -> "zzz",
      "15" -> "HH", "01" -> "MM", "02" -> "dd", "03" -> "hh",
      "04" -> "mm", "05" -> "ss", "06" -> "yy",
      // meridiem: java 'a' — the probe's formatter parses
      // case-insensitively, so Go's lowercase "pm" layout accepts both
      // "pm" and "PM" cell values
      "PM" -> "a", "pm" -> "a",
      "1" -> "M", "2" -> "d", "3" -> "h", "4" -> "m", "5" -> "s")
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      // Go's fraction guard: ".0"/".9" runs are fraction tokens only when
      // the run is NOT followed by another digit — in "02.01.2006" the
      // dot is a literal date separator and ".0" must not fire (Go
      // format.go nextStdChunk applies the same rule), else the layout
      // mistranslates and every cell degrades to string
      def applies(go: String): Boolean =
        layout.startsWith(go, i) && (!go.startsWith(".") ||
          i + go.length >= layout.length ||
          !layout.charAt(i + go.length).isDigit)
      tokens.find { case (go, _) => applies(go) } match {
        case Some((go, java)) => sb ++= java; i += go.length
        case None =>
          val c = layout.charAt(i)
          if (c.isLetter) { sb += '\''; sb += c; sb += '\'' } else sb += c
          i += 1
      }
    }
    sb.toString
  }

  /** The reference's cell probe (excel_source.go:226-272): int → float →
    * bool → datetime → string; empty cell stays "" (and flags the row).
    */
  def probeCell(display: String, dateFormat: Option[String]): (Any, Boolean) = {
    val empty = display.isEmpty
    def tryLong = display.toLongOption
    def tryDouble = display.toDoubleOption
    def tryBool = BoolTokens.get(display)
    def tryDate: Option[java.sql.Timestamp] =
      try {
        val inst = dateFormat match {
          case Some(fmt) =>
            val pattern =
              if (fmt.contains("2006")) goLayoutToJavaPattern(fmt) else fmt
            // Parse date and time fields separately so BOTH date-only
            // formats (midnight default) and 12-hour h+a formats work: a
            // parseDefaulting(HOUR_OF_DAY, 0) would CONFLICT with the
            // resolver's own HOUR_OF_DAY derived from AmPmOfDay and make
            // every AM/PM format silently unparseable.
            // case-insensitive + ENGLISH: Go month/meridiem names are
            // English regardless of host locale, and Go layouts like
            // "3:04pm" must accept "PM"/"pm"/"Pm" cell values alike
            val f = new java.time.format.DateTimeFormatterBuilder()
              .parseCaseInsensitive().appendPattern(pattern)
              .toFormatter(java.util.Locale.ENGLISH)
            val ta = f.parse(display)
            val date = java.time.LocalDate.from(ta)
            val time =
              try java.time.LocalTime.from(ta)
              catch { case _: java.time.DateTimeException =>
                java.time.LocalTime.MIDNIGHT }
            java.time.LocalDateTime.of(date, time)
              .atZone(java.time.ZoneOffset.UTC).toInstant
          case None => java.time.OffsetDateTime.parse(display).toInstant
        }
        Some(java.sql.Timestamp.from(inst))
      } catch { case _: Exception => None }
    val v: Any = tryLong.orElse(tryDouble).orElse(tryBool)
      .orElse(tryDate).getOrElse(display)
    (v, empty)
  }

  /** Read a table per reference source semantics. Returns (columns, rows)
    * with per-cell probed values. `columns = None` ⇒ the first row of the
    * range holds the names (then the range must be column-bounded).
    */
  def readTable(path: Path, sheet: String, range: CellRange,
                columns: Option[Seq[String]], dateFormat: Option[String])
      : (Seq[String], Seq[Seq[Any]]) = {
    val wb = load(path)
    val cs = wb.cellsOf(sheet)
    def display(x: Int, y: Int): String = cs.get((x, y)).map(_.display).getOrElse("")

    val (cols, dataStartY) = columns match {
      case Some(cc) => (cc, range.y1)
      case None =>
        require(!range.x2.wildcard,
          "the Excel source range cannot be dynamic in X if it includes columns")
        // scan the header row until an empty cell or the range edge
        val cc = Iterator.from(range.x1).takeWhile(x => x <= range.x2.p)
          .map(x => display(x, range.y1)).takeWhile(_.nonEmpty).toSeq
        require(cc.nonEmpty,
          "the Excel range should either include columns or they should be specified in the COLUMNS option")
        (cc, range.y1 + 1)
    }
    val width = if (range.x2.wildcard) cols.length else range.x2.p - range.x1 + 1
    require(width == cols.length,
      s"range is $width columns wide but ${cols.length} column names given")

    val rows = mutable.ArrayBuffer.empty[Seq[Any]]
    var y = dataStartY
    var continue = true
    while (continue) {
      val probed = (0 until width).map(i => probeCell(display(range.x1 + i, y), dateFormat))
      val nonEmpty = probed.exists(!_._2)
      if (range.y2.wildcard) {
        if (nonEmpty) { rows += probed.map(_._1); y += 1 }
        else continue = false // dynamic range: stop at first empty row
      } else {
        rows += probed.map(_._1)
        if (y < range.y2.p) y += 1 else continue = false
      }
    }
    (cols, rows.toSeq)
  }

  // ---------------------------------------------------------------- write

  /** Write data rows per reference dest semantics (excel_dest.go:65-166):
    * no header row; OVERWRITE gate; TEMPLATE copy-then-populate; TRANSPOSE
    * swaps the fill axes; fixed ranges error on overflow. When the target
    * file already exists under OVERWRITE (e.g. an earlier block of the same
    * script wrote another sheet), it is loaded and merged — the analogue of
    * the reference's shared excelFileManager (excel_source.go:37-93).
    */
  def writeTable(path: Path, sheet: String, range: CellRange,
                 rows: Seq[Seq[Any]], overwrite: Boolean,
                 template: Option[Path], transpose: Boolean): Unit = {
    require(!(range.x2.wildcard && range.y2.wildcard),
      "the Excel source/destination range can have at most one wildcard")
    if (Files.exists(path) && !overwrite)
      throw new IllegalArgumentException(
        s"destination file $path already exists and OVERWRITE is false")
    template.foreach { t =>
      require(Files.exists(t), s"template $t does not exist")
    }

    val wb = template match {
      case Some(t) => load(t)
      case None if Files.exists(path) =>
        try load(path) catch { case _: Exception => newWorkbook() }
      case None => newWorkbook()
    }
    if (!wb.sheetEntry.contains(sheet)) addSheet(wb, sheet)
    val cs = wb.cellsOf(sheet)

    rows.zipWithIndex.foreach { case (row, r) =>
      row.zipWithIndex.foreach { case (v, c) =>
        val (x, y) = if (transpose) (range.x1 + r, range.y1 + c)
                     else (range.x1 + c, range.y1 + r)
        if (!range.x2.wildcard && x > range.x2.p)
          throw new IllegalArgumentException(
            s"range overflow: too many columns. Expected ${range.x2.p - range.x1 + 1} columns")
        if (!range.y2.wildcard && y > range.y2.p)
          throw new IllegalArgumentException(
            s"range overflow: too many rows. Expected ${range.y2.p - range.y1 + 1} rows")
        cellVal(v).foreach(cs((x, y)) = _)
      }
    }
    save(wb, path)
  }

  private def cellVal(v: Any): Option[CellVal] = v match {
    case null => None
    case b: Boolean => Some(BoolCell(b))
    case n @ (_: Byte | _: Short | _: Int | _: Long) => Some(NumCell(n.toString))
    case d: Double => Some(NumCell(fmtDouble(d)))
    case f: Float => Some(NumCell(fmtDouble(f.toDouble)))
    case d: java.math.BigDecimal => Some(NumCell(d.toPlainString))
    case d: BigDecimal => Some(NumCell(d.bigDecimal.toPlainString))
    case t: java.sql.Timestamp =>
      // RFC3339 text — the format the reference's source probe expects
      Some(StrCell(java.time.OffsetDateTime
        .ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)))
    case d: java.sql.Date => Some(StrCell(d.toString))
    case other => Some(StrCell(other.toString))
  }

  private def fmtDouble(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString

  private def addSheet(wb: Workbook, name: String): Unit = {
    val idx = wb.sheetEntry.size + 1
    wb.sheetEntry(name) = s"xl/worksheets/graftSheet$idx.xml"
    wb.cells(name) = mutable.Map.empty
  }

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c >= 0x20 || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ => () // control chars are illegal in XML 1.0
    }
    sb.toString
  }

  private def sheetXml(cells: mutable.Map[(Int, Int), CellVal]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    cells.keys.map(_._2).toSeq.distinct.sorted.foreach { y =>
      sb.append(s"""<row r="$y">""")
      cells.collect { case ((x, `y`), v) => (x, v) }.toSeq.sortBy(_._1)
        .foreach { case (x, v) =>
          val ref = s"${colLetters(x)}$y"
          v match {
            case NumCell(raw) => sb.append(s"""<c r="$ref"><v>$raw</v></c>""")
            case BoolCell(b) =>
              sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
            case StrCell(s) => sb.append(
              s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>""")
          }
        }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString.getBytes(UTF_8)
  }

  /** Serialize: regenerate the structural parts (workbook, rels, content
    * types) from the sheet list, re-render every sheet from its cell map,
    * and pass all other template entries (styles, themes, other parts)
    * through byte-for-byte.
    */
  def save(wb: Workbook, path: Path): Unit = {
    val structural = Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels")
    val sheets = wb.sheetEntry.toSeq // (name, entry), insertion-ordered

    val contentTypes = {
      val overrides = sheets.map { case (_, entry) =>
        s"""<Override PartName="/$entry" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      val shared =
        if (wb.entries.contains("xl/sharedStrings.xml"))
          """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>"""
        else ""
      val styles =
        if (wb.entries.contains("xl/styles.xml"))
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>"""
        else ""
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$shared$styles$overrides</Types>"""
    }
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val workbook = {
      val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rIdS${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>"""
    }
    val wbRels = {
      val rels = sheets.zipWithIndex.map { case ((_, entry), i) =>
        val target = entry.stripPrefix("xl/")
        s"""<Relationship Id="rIdS${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="$target"/>"""
      }.mkString
      val shared =
        if (wb.entries.contains("xl/sharedStrings.xml"))
          """<Relationship Id="rIdShared" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>"""
        else ""
      val styles =
        if (wb.entries.contains("xl/styles.xml"))
          """<Relationship Id="rIdStyles" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
        else ""
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels$shared$styles</Relationships>"""
    }

    val sheetEntries = sheets.map(_._2).toSet
    val out = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(out)
    def put(name: String, bytes: Array[Byte]): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    }
    put("[Content_Types].xml", contentTypes.getBytes(UTF_8))
    put("_rels/.rels", rootRels.getBytes(UTF_8))
    put("xl/workbook.xml", workbook.getBytes(UTF_8))
    put("xl/_rels/workbook.xml.rels", wbRels.getBytes(UTF_8))
    sheets.foreach { case (name, entry) => put(entry, sheetXml(wb.cells(name))) }
    wb.entries.foreach { case (name, bytes) =>
      if (!structural(name) && !sheetEntries(name)) put(name, bytes)
    }
    zos.close()
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(path, out.toByteArray)
  }
}
