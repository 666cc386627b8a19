package graft.aql

/** Hand-rolled AQL lexer.
  *
  * Mirrors the reference's key design decision (reference aql/lexer.go:127-309):
  * any top-level parenthesized group is captured VERBATIM as one `ParenBody`
  * token — block bodies (SQL text, transform DSL, JSON literals, assertion
  * lists) are never tokenized here, so arbitrary content rides through
  * untouched. Nesting is tracked, and single-quoted strings / `--` line
  * comments / `/** **/` block comments inside a body are respected while
  * counting parens.
  *
  * Keywords and identifiers are case-insensitive (docs-src/docs/blocks.md);
  * comments outside bodies use the same two styles; strings are
  * single-quoted or backtick-quoted (backtick form used for templated paths).
  */
object Lexer {

  sealed trait Token { def pos: Int }
  final case class Ident(raw: String, pos: Int) extends Token {
    def upper: String = raw.toUpperCase
  }
  final case class Str(value: String, pos: Int) extends Token
  final case class Num(value: Double, pos: Int) extends Token
  final case class Punct(ch: Char, pos: Int) extends Token
  final case class ParenBody(body: String, pos: Int) extends Token
  final case class EOF(pos: Int) extends Token

  final case class LexError(msg: String, pos: Int)
      extends RuntimeException(s"lex error at offset $pos: $msg")

  def lex(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length

    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < n && input(i).isWhitespace) { i += 1; moved = true }
        if (i + 1 < n && input(i) == '-' && input(i + 1) == '-') {
          while (i < n && input(i) != '\n') i += 1
          moved = true
        }
        if (i + 2 < n && input.startsWith("/**", i)) {
          val end = input.indexOf("**/", i + 3)
          if (end < 0) throw LexError("unterminated /** comment", i)
          i = end + 3
          moved = true
        }
      }
    }

    def lexString(quote: Char): Str = {
      val start = i
      i += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= n) throw LexError("unterminated string", start)
        val c = input(i)
        if (c == quote) {
          // SQL-style doubled quote escapes itself: 'it''s'
          if (quote == '\'' && i + 1 < n && input(i + 1) == quote) {
            sb += quote; i += 2
          } else { i += 1; done = true }
        } else { sb += c; i += 1 }
      }
      Str(sb.toString, start)
    }

    def lexParenBody(): ParenBody = {
      val start = i
      i += 1 // consume '('
      var depth = 1
      val sb = new StringBuilder
      while (i < n && depth > 0) {
        val c = input(i)
        if (c == '\'') {
          // copy a quoted string verbatim, not counting parens inside
          sb += c; i += 1
          while (i < n && input(i) != '\'') { sb += input(i); i += 1 }
          if (i >= n) throw LexError("unterminated string in body", start)
          sb += '\''; i += 1
        } else if (i + 1 < n && c == '-' && input(i + 1) == '-') {
          while (i < n && input(i) != '\n') { sb += input(i); i += 1 }
        } else if (input.startsWith("/**", i)) {
          val end = input.indexOf("**/", i + 3)
          if (end < 0) throw LexError("unterminated comment in body", start)
          sb ++= input.substring(i, end + 3); i = end + 3
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) sb += c
          i += 1
        }
      }
      if (depth != 0) throw LexError("unbalanced parentheses", start)
      ParenBody(sb.toString, start)
    }

    while ({ skipWsAndComments(); i < n }) {
      val c = input(i)
      if (c == '\'' || c == '`') out += lexString(c)
      else if (c == '(') out += lexParenBody()
      else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (input(i).isDigit || input(i) == '.')) i += 1
        out += Num(input.substring(start, i).toDouble, start)
      } else if (c.isLetter || c == '_' || c == '@') {
        val start = i
        i += 1
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_' ||
          input(i) == '.')) i += 1
        out += Ident(input.substring(start, i), start)
      } else if (",=;)".contains(c)) {
        out += Punct(c, i); i += 1
      } else throw LexError(s"unexpected character '$c'", i)
    }
    out += EOF(n)
    out.result()
  }
}
