package graft.aql

import Ast._
import Lexer._

/** Recursive-descent AQL parser over [[Lexer]] tokens.
  *
  * Grammar per reference docs (docs-src/docs/blocks.md and per-block pages;
  * struct shapes in reference aql/parser.go:146-320):
  *
  * {{{
  * script     := block*
  * block      := include | declare | set | connection | query | exec
  *             | data | global | transform | test
  * include    := INCLUDE STRING
  * declare    := DECLARE (STRING | IDENT)            -- '@Param' or 'Param'
  * set        := SET IDENT '=' optval
  * connection := CONNECTION STRING PARENBODY         -- body is option list
  * query      := (QUERY|EXEC) STRING [EXTERN STRING] FROM source PARENBODY
  *               [USING PARAMETER ident,*] [INTO dest,*]
  *               [WITH PARENBODY] [AFTER ident,*]
  * data       := DATA STRING [EXTERN STRING] PARENBODY [INTO dest,*]
  *               [WITH PARENBODY] [AFTER ident,*]
  * global     := GLOBAL STRING PARENBODY [WITH PARENBODY]
  * transform  := TRANSFORM [PLUGIN] STRING FROM source,* PARENBODY
  *               [INTO dest,*] [WITH PARENBODY] [AFTER ident,*]
  * test       := TEST IDENT WITH ASSERTIONS PARENBODY
  * source     := GLOBAL | CONNECTION ident | BLOCK ident
  * dest       := GLOBAL | CONSOLE | CONNECTION ident | PARAMETER PARENBODY
  * }}}
  *
  * Blocks may be separated by optional `;`. Keywords are case-insensitive.
  */
object Parser {

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"parse error at offset $pos: $msg")

  def parse(input: String): JobScript = new P(Lexer.lex(input)).script()

  /** Parse a `WITH (...)` option body: NAME = VALUE [, ...]. Also used for
    * CONNECTION bodies (same shape, reference aql/parser.go:829-875).
    */
  def parseOptions(body: String): Options = {
    if (body.trim.isEmpty) return Map.empty
    val toks = Lexer.lex(body)
    val p = new P(toks)
    val out = Map.newBuilder[String, OptVal]
    var first = true
    while (!p.atEof) {
      if (!first) p.expectPunct(',')
      first = false
      val key = p.expectIdent().upper
      p.expectPunct('=')
      out += key -> p.optVal()
    }
    out.result()
  }

  private final class P(toks: Vector[Token]) {
    private var i = 0

    def cur: Token = toks(i)
    def atEof: Boolean = cur.isInstanceOf[EOF]
    private def advance(): Token = { val t = cur; i += 1; t }

    def expectIdent(): Ident = cur match {
      case id: Ident => advance(); id
      case t => throw ParseError(s"expected identifier, got $t", t.pos)
    }
    private def expectKeyword(kw: String): Unit = cur match {
      case id: Ident if id.upper == kw => advance()
      case t => throw ParseError(s"expected $kw, got $t", t.pos)
    }
    def expectPunct(ch: Char): Unit = cur match {
      case Punct(`ch`, _) => advance()
      case t => throw ParseError(s"expected '$ch', got $t", t.pos)
    }
    private def expectString(): String = cur match {
      case Str(v, _) => advance(); v
      case t => throw ParseError(s"expected string literal, got $t", t.pos)
    }
    private def expectBody(): String = cur match {
      case ParenBody(b, _) => advance(); b
      case t => throw ParseError(s"expected '(', got $t", t.pos)
    }
    /** Block names may be quoted (usual) or bare identifiers. */
    private def blockName(): String = cur match {
      case Str(v, _) => advance(); v
      case id: Ident => advance(); id.raw
      case t => throw ParseError(s"expected block name, got $t", t.pos)
    }
    private def peekKeyword(kw: String): Boolean = cur match {
      case id: Ident => id.upper == kw
      case _ => false
    }
    private def acceptKeyword(kw: String): Boolean =
      if (peekKeyword(kw)) { advance(); true } else false
    private def acceptPunct(ch: Char): Boolean = cur match {
      case Punct(`ch`, _) => advance(); true
      case _ => false
    }

    def optVal(): OptVal = cur match {
      case Str(v, _) => advance(); OptStr(v)
      case Num(d, _) => advance(); OptNum(d)
      case id: Ident if id.upper == "TRUE" => advance(); OptStr("True")
      case id: Ident if id.upper == "FALSE" => advance(); OptStr("False")
      case t => throw ParseError(s"expected option value, got $t", t.pos)
    }

    private def identList(): Seq[String] = {
      val out = Seq.newBuilder[String]
      out += expectIdent().raw
      while (acceptPunct(',')) out += expectIdent().raw
      out.result()
    }

    private def sourceRef(): SourceRef = {
      if (acceptKeyword("GLOBAL")) FromGlobal
      else if (acceptKeyword("CONNECTION")) FromConnection(expectIdent().raw)
      else if (acceptKeyword("BLOCK")) FromBlock(expectIdent().raw)
      else throw ParseError(s"expected GLOBAL|CONNECTION|BLOCK, got $cur",
        cur.pos)
    }

    private def destRef(): DestRef = {
      if (acceptKeyword("GLOBAL")) IntoGlobal
      else if (acceptKeyword("CONSOLE")) IntoConsole
      else if (acceptKeyword("CONNECTION")) IntoConnection(expectIdent().raw)
      else if (acceptKeyword("PARAMETER")) {
        val body = expectBody()
        IntoParameter(body.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      } else throw ParseError(
        s"expected GLOBAL|CONSOLE|CONNECTION|PARAMETER, got $cur", cur.pos)
    }

    /** Shared tail: [USING PARAMETER ...] [INTO ...] [WITH (...)] [AFTER ...] */
    private def tail(): (Seq[String], Seq[DestRef], Options, Seq[String]) = {
      var using = Seq.empty[String]
      var dests = Seq.empty[DestRef]
      var opts: Options = Map.empty
      var after = Seq.empty[String]
      var go = true
      while (go) {
        if (acceptKeyword("USING")) {
          expectKeyword("PARAMETER")
          using = identList()
        } else if (acceptKeyword("INTO")) {
          val d = Seq.newBuilder[DestRef]
          d += destRef()
          while (acceptPunct(',')) d += destRef()
          dests = d.result()
        } else if (acceptKeyword("WITH")) {
          opts = parseOptions(expectBody())
        } else if (acceptKeyword("AFTER")) {
          after = identList()
        } else go = false
      }
      (using, dests, opts, after)
    }

    private def externOpt(): Option[String] =
      if (acceptKeyword("EXTERN")) Some(expectString()) else None

    def script(): JobScript = {
      val blocks = Vector.newBuilder[Block]
      while (!atEof) {
        if (!acceptPunct(';')) blocks += block()
      }
      JobScript(blocks.result())
    }

    private def block(): Block = {
      val kw = expectIdent().upper
      kw match {
        case "INCLUDE" => Include(expectString())
        case "DECLARE" =>
          val p = cur match {
            case Str(v, _) => advance(); v
            case id: Ident => advance(); id.raw
            case t => throw ParseError(s"expected parameter name, got $t", t.pos)
          }
          Declare(p.stripPrefix("@"))
        case "SET" =>
          val key = expectIdent().upper
          expectPunct('=')
          SetOpt(key, optVal())
        case "CONNECTION" =>
          Connection(blockName(), parseOptions(expectBody()))
        case "QUERY" | "EXEC" =>
          val name = blockName()
          val ext = externOpt()
          expectKeyword("FROM")
          val src = sourceRef()
          val content = expectBody()
          val (using, dests, opts, after) = tail()
          Query(name, ext, src, content, using, dests, opts, after,
            execOnly = kw == "EXEC")
        case "DATA" =>
          val name = blockName()
          val ext = externOpt()
          val content = expectBody()
          val (_, dests, opts, after) = tail()
          Data(name, ext, content, dests, opts, after)
        case "GLOBAL" =>
          val name = blockName()
          val content = expectBody()
          val (_, _, opts, _) = tail()
          Global(name, content, opts)
        case "TRANSFORM" =>
          val plugin = acceptKeyword("PLUGIN")
          val name = blockName()
          expectKeyword("FROM")
          val srcs = Seq.newBuilder[SourceRef]
          srcs += sourceRef()
          while (acceptPunct(',')) srcs += sourceRef()
          val content = expectBody()
          val (_, dests, opts, after) = tail()
          Transform(name, plugin, srcs.result(), content, dests, opts, after)
        case "TEST" =>
          val target = blockName()
          expectKeyword("WITH")
          expectKeyword("ASSERTIONS")
          Test(target, expectBody())
        case other =>
          throw ParseError(s"unknown block type $other", cur.pos)
      }
    }
  }
}
