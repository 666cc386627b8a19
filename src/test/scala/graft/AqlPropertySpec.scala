package graft

import graft.aql.{Ast, Lexer, Parser}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parser tests: arbitrary well-formed scripts parse to the
  * expected IR and arbitrary body text survives the PAREN_BODY round trip
  * verbatim (the reference's key lexer invariant, aql/lexer.go:144-186 —
  * SQL inside block parens must reach the target engine untokenized).
  * Plain scalacheck generators sampled under a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class AqlPropertySpec extends AnyFunSuite {

  private val Cases = 200

  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until Cases).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // body text with balanced parens and single-quoted strings that may
  // contain unbalanced parens, newlines, comment markers
  private val bodyChunk: Gen[String] = Gen.oneOf(
    ident,
    Gen.const("count(*)"),
    Gen.const("( nested ( twice ) )"),
    Gen.const("'a string with ) unbalanced ( parens'"),
    Gen.const("'it''s escaped'"),
    Gen.const("\n  SELECT x,\n  y"),
    Gen.const("a <= 3 AND b >= 'z'"),
  )
  private val body: Gen[String] =
    Gen.nonEmptyListOf(bodyChunk).map(_.mkString(" "))

  test("property: QUERY body text survives lexing verbatim") {
    for ((name, b) <- samples(Gen.zip(ident, body))) {
      val script = s"QUERY '$name' FROM GLOBAL ($b)"
      val js = Parser.parse(script)
      val q = js.blocks.head.asInstanceOf[Ast.Query]
      assert(q.name == name, script)
      assert(q.content == b, script)
    }
  }

  test("property: N DATA blocks parse to N blocks in script order") {
    val names = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, ident))
      .map(_.zipWithIndex.map { case (s, i) => s + i }) // unique
    for (ns <- samples(names)) {
      val script = ns.map(n => s"DATA '$n' ([[1]]) WITH (COLUMNS = 'C')")
        .mkString("\n")
      val js = Parser.parse(script)
      assert(js.blocks.map { case d: Ast.Data => d.name }.toList == ns)
    }
  }

  test("property: option values round-trip through WITH lists") {
    val optVal: Gen[(String, Ast.OptVal)] = Gen.oneOf(
      Gen.chooseNum(0, 1000000)
        .map(n => (n.toString, Ast.OptNum(n))),
      Gen.listOf(Gen.frequency(
        9 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', ',', '(', ')', '=')))
        .map(_.mkString)
        .map(s => (s"'${s.replace("'", "''")}'", Ast.OptStr(s))))
    for ((k, (lit, expected)) <- samples(Gen.zip(ident, optVal))) {
      val js = Parser.parse(s"CONNECTION 'C' ($k = $lit)")
      val c = js.blocks.head.asInstanceOf[Ast.Connection]
      assert(c.options(k.toUpperCase) == expected, s"$k = $lit")
    }
  }

  test("property: lexer never crashes on arbitrary printable input") {
    val printable = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\n', '\'', '(', ')', '-', '/', '*', '=', ','),
    )).map(_.mkString)
    for (s <- samples(printable)) {
      try { Lexer.lex(s); () }
      catch {
        case _: Lexer.LexError => ()
        case _: Parser.ParseError => ()
      }
    }
  }
}
