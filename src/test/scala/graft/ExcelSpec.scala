package graft

import graft.engine.{Aql, Excel}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Excel connector semantics, mirroring the reference's own tests
  * (reference engine/excel_source_test.go, excel_dest_test.go) plus an
  * AQL e2e round-trip.
  */
class ExcelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(name: String): Path =
    Files.createTempDirectory("graft_excel").resolve(name)

  test("parseRange: fixed, row-wildcard, column-wildcard, errors") {
    assert(Excel.parseRange("A1:C4") ==
      Excel.CellRange(1, 1, Excel.RangePoint(false, 3), Excel.RangePoint(false, 4)))
    assert(Excel.parseRange("B2:B*") ==
      Excel.CellRange(2, 2, Excel.RangePoint(false, 2), Excel.RangePoint(true, 0)))
    assert(Excel.parseRange("A1:*2") ==
      Excel.CellRange(1, 1, Excel.RangePoint(true, 0), Excel.RangePoint(false, 2)))
    assert(Excel.parseRange("AA10:AB12").x1 == 27)
    intercept[IllegalArgumentException](Excel.parseRange("A1:**"))
    intercept[IllegalArgumentException](Excel.parseRange("A1B2"))
    intercept[IllegalArgumentException](Excel.parseRange("A1:B"))
  }

  test("column letters round-trip") {
    Seq(1 -> "A", 26 -> "Z", 27 -> "AA", 52 -> "AZ", 53 -> "BA", 703 -> "AAA")
      .foreach { case (n, s) =>
        assert(Excel.colLetters(n) == s)
        assert(Excel.lettersToCol(s) == n)
      }
  }

  test("typed round-trip: long / double / bool / string / timestamp") {
    val f = tmp("typed.xlsx")
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:30:00Z"))
    val rows: Seq[Seq[Any]] = Seq(
      Seq(1L, 1.5, true, "hello world", ts),
      Seq(-2L, 2.0, false, "ünïcode & <xml>", ts))
    Excel.writeTable(f, "Data", Excel.parseRange("A1:E*"), rows,
      overwrite = false, template = None, transpose = false)
    val (cols, got) = Excel.readTable(f, "Data", Excel.parseRange("A1:E*"),
      Some(Seq("a", "b", "c", "d", "e")), None)
    assert(cols == Seq("a", "b", "c", "d", "e"))
    assert(got.size == 2)
    assert(got(0) == Seq(1L, 1.5, true, "hello world", ts))
    // 2.0 renders as "2" and probes back as the integer 2 — the
    // reference's int-first probe does exactly this (excel_source.go:234)
    assert(got(1) == Seq(-2L, 2L, false, "ünïcode & <xml>", ts))
  }

  test("header-in-range read (COLUMNS absent => first row is names)") {
    val f = tmp("hdr.xlsx")
    val rows: Seq[Seq[Any]] = Seq(
      Seq("Month", "Sales"), Seq("Jan", 100L), Seq("Feb", 200L))
    Excel.writeTable(f, "2017", Excel.parseRange("A1:B*"), rows,
      overwrite = false, template = None, transpose = false)
    val (cols, got) = Excel.readTable(f, "2017", Excel.parseRange("A1:B*"),
      None, None)
    assert(cols == Seq("Month", "Sales"))
    assert(got == Seq(Seq("Jan", 100L), Seq("Feb", 200L)))
    // column-wildcard + header row is rejected (excel_source.go:128)
    intercept[IllegalArgumentException] {
      Excel.readTable(f, "2017", Excel.parseRange("A1:*3"), None, None)
    }
  }

  test("row-wildcard read stops at first fully-empty row") {
    val f = tmp("gap.xlsx")
    Excel.writeTable(f, "S", Excel.parseRange("A1:A*"),
      Seq(Seq(1L), Seq(2L)), overwrite = false, template = None,
      transpose = false)
    // rows 1-2 filled, row 3 empty, then more data at row 4
    val wb2 = Excel.load(f)
    wb2.cellsOf("S")((1, 4)) = Excel.NumCell("99")
    Excel.save(wb2, f)
    val (_, got) = Excel.readTable(f, "S", Excel.parseRange("A1:A*"),
      Some(Seq("v")), None)
    assert(got == Seq(Seq(1L), Seq(2L))) // stopped before the gap
    val (_, fixed) = Excel.readTable(f, "S", Excel.parseRange("A1:A4"),
      Some(Seq("v")), None)
    assert(fixed == Seq(Seq(1L), Seq(2L), Seq(""), Seq(99L))) // fixed range keeps empties
  }

  test("transpose writes columns down the sheet") {
    val f = tmp("tr.xlsx")
    Excel.writeTable(f, "T", Excel.parseRange("A1:B2"),
      Seq(Seq(1L, 2L), Seq(3L, 4L)), overwrite = false, template = None,
      transpose = true)
    val (_, got) = Excel.readTable(f, "T", Excel.parseRange("A1:B2"),
      Some(Seq("c1", "c2")), None)
    // row i of input became column i: cell (A2)=2 (row1 col2 transposed)
    assert(got == Seq(Seq(1L, 3L), Seq(2L, 4L)))
  }

  test("overwrite gate and fixed-range overflow") {
    val f = tmp("ow.xlsx")
    Excel.writeTable(f, "S", Excel.parseRange("A1:A*"), Seq(Seq(1L)),
      overwrite = false, template = None, transpose = false)
    intercept[IllegalArgumentException] {
      Excel.writeTable(f, "S", Excel.parseRange("A1:A*"), Seq(Seq(2L)),
        overwrite = false, template = None, transpose = false)
    }
    intercept[IllegalArgumentException] { // 2 rows into a 1-row range
      Excel.writeTable(tmp("of.xlsx"), "S", Excel.parseRange("A1:A1"),
        Seq(Seq(1L), Seq(2L)), overwrite = false, template = None,
        transpose = false)
    }
    intercept[IllegalArgumentException] { // 2 cols into a 1-col range
      Excel.writeTable(tmp("of2.xlsx"), "S", Excel.parseRange("A1:A9"),
        Seq(Seq(1L, 2L)), overwrite = false, template = None,
        transpose = false)
    }
  }

  test("template: populated copy keeps the template's other cells") {
    val tpl = tmp("template.xlsx")
    Excel.writeTable(tpl, "Report", Excel.parseRange("A1:B1"),
      Seq(Seq("Title", "KeepMe")), overwrite = false, template = None,
      transpose = false)
    val out = tmp("filled.xlsx")
    Excel.writeTable(out, "Report", Excel.parseRange("A2:B*"),
      Seq(Seq(10L, 20L), Seq(30L, 40L)), overwrite = false,
      template = Some(tpl), transpose = false)
    val (_, got) = Excel.readTable(out, "Report", Excel.parseRange("A1:B3"),
      Some(Seq("a", "b")), None)
    assert(got == Seq(Seq("Title", "KeepMe"), Seq(10L, 20L), Seq(30L, 40L)))
    // template itself untouched
    val (_, t) = Excel.readTable(tpl, "Report", Excel.parseRange("A1:B1"),
      Some(Seq("a", "b")), None)
    assert(t == Seq(Seq("Title", "KeepMe")))
  }

  test("two blocks writing different sheets of one workbook accumulate") {
    val f = tmp("multi.xlsx")
    Excel.writeTable(f, "One", Excel.parseRange("A1:A*"), Seq(Seq(1L)),
      overwrite = false, template = None, transpose = false)
    Excel.writeTable(f, "Two", Excel.parseRange("A1:A*"), Seq(Seq(2L)),
      overwrite = true, template = None, transpose = false)
    assert(Excel.readTable(f, "One", Excel.parseRange("A1:A*"),
      Some(Seq("v")), None)._2 == Seq(Seq(1L)))
    assert(Excel.readTable(f, "Two", Excel.parseRange("A1:A*"),
      Some(Seq("v")), None)._2 == Seq(Seq(2L)))
  }

  test("reads foreign XLSX: sharedStrings, t=\"s\" cells, r-less rows") {
    // files from real Excel/excelize use a sharedStrings table and may
    // omit r attributes; our writer never emits that shape, so build one
    // by hand to pin the reader's coverage of it
    val f = tmp("foreign.xlsx")
    def entry(name: String, body: String): (String, Array[Byte]) =
      name -> body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val parts = Seq(
      entry("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""),
      entry("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      entry("xl/workbook.xml",
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sales" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      entry("xl/sharedStrings.xml",
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>Month</t></si><si><r><t>Sa</t></r><r><t>les</t></r></si><si><t>Jan</t></si></sst>"""),
      // rows and cells with NO r attributes (positions are implicit)
      entry("xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row><c t="s"><v>0</v></c><c t="s"><v>1</v></c></row><row><c t="s"><v>2</v></c><c><v>100</v></c></row></sheetData></worksheet>"""))
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(f))
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    val (cols, rows) = Excel.readTable(f, "Sales", Excel.parseRange("A1:B*"),
      None, None)
    assert(cols == Seq("Month", "Sales")) // "Sales" from a rich-text <si>
    assert(rows == Seq(Seq("Jan", 100L)))
  }

  test("AQL e2e: query -> Excel dest -> Excel source round-trip") {
    // mirrors the reference docs' dest example (connections.md "As
    // destination") + source example, chained with AFTER
    val f = tmp("e2e.xlsx")
    val r = Aql.run(spark,
      s"""CONNECTION 'Workbook' (
         |  DRIVER = 'excel', FILE = '$f', SHEET = 'TestSheet',
         |  RANGE = 'A1:B*', COLUMNS = 'Id, Name'
         |)
         |
         |DATA 'People' (
         |  [[1, "Bob"], [2, "Alice"]]
         |) WITH (COLUMNS = 'Id, Name')
         |
         |TRANSFORM 'Out' FROM BLOCK People (
         |  APPLY Id, Name
         |) INTO CONNECTION Workbook
         |
         |TRANSFORM 'Back' FROM CONNECTION Workbook (
         |  AGGREGATE COUNT(Id) AS n, SUM(Id) AS total
         |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON') AFTER Out""".stripMargin)
    assert(r.console.exists(s => s.contains("\"n\":2") && s.contains("\"total\":3")))
  }

  test("DATEFORMAT accepts Go reference layouts as well as java patterns") {
    // the reference's DATEFORMAT is a Go time.Parse layout
    // (excel_source.go:256-268, magic instant `Mon Jan 2 15:04:05 MST
    // 2006`); layouts containing the Go year token translate
    // token-for-token, java patterns pass through unchanged
    import graft.engine.Excel
    assert(Excel.goLayoutToJavaPattern("2006-01-02 15:04:05")
      == "yyyy-MM-dd HH:mm:ss")
    assert(Excel.goLayoutToJavaPattern("02/01/2006") == "dd/MM/yyyy")
    assert(Excel.goLayoutToJavaPattern("Jan 2, 2006 3:04 PM")
      == "MMM d, yyyy h:mm a")
    // literal letters get quoted (the T in an ISO-ish layout)
    assert(Excel.goLayoutToJavaPattern("2006-01-02T15:04:05")
      == "yyyy-MM-dd'T'HH:mm:ss")

    def ts(display: String, fmt: String): Any =
      Excel.probeCell(display, Some(fmt))._1
    val want = java.sql.Timestamp.from(
      java.time.Instant.parse("2020-03-04T05:06:07Z"))
    // Go layout verbatim from the reference docs
    assert(ts("2020-03-04 05:06:07", "2006-01-02 15:04:05") == want)
    // the same cell through the equivalent java pattern
    assert(ts("2020-03-04 05:06:07", "yyyy-MM-dd HH:mm:ss") == want)
    // date-only Go layout probes as midnight, not string fall-through
    assert(ts("04/03/2020", "02/01/2006") == java.sql.Timestamp.from(
      java.time.Instant.parse("2020-03-04T00:00:00Z")))
    // 12-hour + AM/PM layouts actually PARSE (a naive
    // parseDefaulting(HOUR_OF_DAY, 0) conflicts with the resolver's
    // AmPmOfDay-derived hour and silently breaks every such format)
    assert(ts("Mar 4, 2020 5:06 PM", "Jan 2, 2006 3:04 PM") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T17:06:00Z")))
    assert(ts("Mar 4, 2020 5:06 AM", "Jan 2, 2006 3:04 PM") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T05:06:00Z")))
    // fractional-second layouts: .000 (fixed) and .999 (optional) both
    // parse instead of silently degrading the column to strings
    assert(ts("2020-03-04 05:06:07.123", "2006-01-02 15:04:05.000") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T05:06:07.123Z")))
    assert(ts("2020-03-04 05:06:07.123", "2006-01-02 15:04:05.999") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T05:06:07.123Z")))
    // .999 = trailing-zero-trimmed in Go: the absent-fraction case parses
    assert(ts("2020-03-04 05:06:07", "2006-01-02 15:04:05.999") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T05:06:07Z")))
    // dot-separated date layouts: the fraction tokens (.0/.9 family)
    // must NOT fire when the run is followed by another digit (Go's own
    // nextStdChunk guard) — '.' here is a literal separator
    assert(Excel.goLayoutToJavaPattern("02.01.2006") == "dd.MM.yyyy")
    assert(ts("04.03.2020", "02.01.2006") == java.sql.Timestamp.from(
      java.time.Instant.parse("2020-03-04T00:00:00Z")))
    // lowercase Go meridiem layouts accept pm/PM cell values alike
    assert(ts("5:06pm 2020-03-04", "3:04pm 2006-01-02") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T17:06:00Z")))
    assert(ts("5:06PM 2020-03-04", "3:04pm 2006-01-02") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T17:06:00Z")))
    // ...through the java dialect too
    assert(ts("2020-03-04 05:06 PM", "yyyy-MM-dd hh:mm a") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2020-03-04T17:06:00Z")))
    // an unparseable display still falls through to string
    assert(ts("not a date", "2006-01-02") == "not a date")
  }
}
