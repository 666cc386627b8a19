package graft

import graft.aql.{Ast, Lexer, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** Lexer/parser unit tests (reference aql/lexer_test.go, parser_test.go). */
class AqlParserSpec extends AnyFunSuite {

  test("lexer: paren bodies verbatim, nesting, strings, comments") {
    val toks = Lexer.lex(
      """QUERY 'Q' FROM GLOBAL (
        |  SELECT a, count(*) FROM t -- trailing (comment
        |  WHERE s = 'quoted ) paren' /** multi (( **/
        |) WITH (A = 'b')""".stripMargin)
    val bodies = toks.collect { case Lexer.ParenBody(b, _) => b }
    assert(bodies.size == 2)
    assert(bodies.head.contains("count(*)"))
    assert(bodies.head.contains("'quoted ) paren'"))
    assert(bodies(1).trim == "A = 'b'")
  }

  test("lexer: doubled-quote escape and backtick strings") {
    val toks = Lexer.lex("DECLARE 'it''s' INCLUDE `f.{{ M }}.aql`")
    val strs = toks.collect { case Lexer.Str(v, _) => v }
    assert(strs == Vector("it's", "f.{{ M }}.aql"))
  }

  test("parser: full query block shape") {
    val js = Parser.parse(
      """QUERY 'Q1' EXTERN 'q.sql' FROM CONNECTION Db (
        |  SELECT 1
        |) USING PARAMETER @P1, @P2
        |INTO GLOBAL, CONSOLE, PARAMETER(@Out)
        |WITH (TABLE = 'T', N = 5)
        |AFTER Setup, Load;""".stripMargin)
    val q = js.blocks.head.asInstanceOf[Ast.Query]
    assert(q.name == "Q1" && q.extern.contains("q.sql"))
    assert(q.source == Ast.FromConnection("Db"))
    assert(q.usingParams == Seq("@P1", "@P2"))
    assert(q.dests == Seq(Ast.IntoGlobal, Ast.IntoConsole,
      Ast.IntoParameter(Seq("@Out"))))
    assert(q.options("TABLE") == Ast.OptStr("T"))
    assert(q.options("N") == Ast.OptNum(5))
    assert(q.after == Seq("Setup", "Load"))
  }

  test("parser: keywords are case-insensitive; blocks separated freely") {
    val js = Parser.parse(
      "set x = 1\n data 'D' ([[1]]) with (columns = 'C');" +
        "transform PLUGIN 'P' from block D ()")
    assert(js.blocks.length == 3)
    val t = js.blocks(2).asInstanceOf[Ast.Transform]
    assert(t.plugin && t.sources == Seq(Ast.FromBlock("D")))
  }

  test("parser: option truthiness matches reference parser.go:357-377") {
    assert(Ast.truthy(Ast.OptStr("True")) && Ast.truthy(Ast.OptStr("yes")) &&
      Ast.truthy(Ast.OptStr("1")) && Ast.truthy(Ast.OptNum(2)))
    assert(!Ast.truthy(Ast.OptStr("no")) && !Ast.truthy(Ast.OptNum(0)))
  }

  test("parser: connection body is an option list") {
    val js = Parser.parse(
      "CONNECTION 'Wb' (Driver = 'file', File = './x.csv')")
    val c = js.blocks.head.asInstanceOf[Ast.Connection]
    assert(c.options("DRIVER") == Ast.OptStr("file"))
    assert(c.options("FILE") == Ast.OptStr("./x.csv"))
  }

  test("template: {{ Param }} substitution and default-value pipes") {
    import graft.aql.Template
    val params = Map("NAME" -> "lineitem")
    assert(Template.eval("read {{ Name }} now", params) == "read lineitem now")
    assert(Template.eval("read {{ .NAME }} now", params) == "read lineitem now")
    // default pipe fires only when the parameter is undefined
    assert(Template.eval("{{ Missing | default 'fb' }}", params) == "fb")
    assert(Template.eval("{{ Missing | default \"fb2\" }}", params) == "fb2")
    assert(Template.eval("{{ Missing | default 42 }}", params) == "42")
    assert(Template.eval("{{ Name | default 'fb' }}", params) == "lineitem")
    intercept[IllegalArgumentException](Template.eval("{{ Missing }}", params))
  }

  test("template: {{ if }}/{{ else }}/{{ end }} conditional subset") {
    import graft.aql.Template
    val params = Map("ENV" -> "prod", "DEBUG" -> "", "NAME" -> "lineitem")
    // truthiness: non-empty param = true; missing/empty = false (Go map
    // semantics — conditions never error on undefined keys)
    assert(Template.eval("{{ if .Env }}on{{ end }}", params) == "on")
    assert(Template.eval("{{ if .Debug }}on{{ end }}", params) == "")
    assert(Template.eval("{{ if .Nope }}on{{ else }}off{{ end }}", params)
      == "off")
    // eq / ne with params and quoted literals
    assert(Template.eval(
      "{{ if eq .Env \"prod\" }}strict{{ else }}lax{{ end }}", params)
      == "strict")
    assert(Template.eval(
      "{{ if ne .Env 'prod' }}lax{{ else }}strict{{ end }}", params)
      == "strict")
    // nesting + substitution inside the selected branch
    assert(Template.eval(
      "{{ if .Env }}{{ if eq .Name 'lineitem' }}t={{ Name }}{{ end }}{{ end }}",
      params) == "t=lineitem")
    // unsupported/malformed constructs fail loudly
    intercept[IllegalArgumentException](
      Template.eval("{{ range .Xs }}x{{ end }}", params))
    intercept[IllegalArgumentException](
      Template.eval("{{ if .Env }}no end", params))
    intercept[IllegalArgumentException](
      Template.eval("stray {{ end }}", params))
  }

  test("parser: errors carry position") {
    val e = intercept[Parser.ParseError](Parser.parse("FROB 'x' ()"))
    assert(e.msg.contains("unknown block type"))
  }
}
