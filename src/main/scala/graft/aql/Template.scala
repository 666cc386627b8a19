package graft.aql

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Compile-time template + include/extern resolution.
  *
  * The reference evaluates Go `text/template` over block contents and
  * extern paths with global+local options as parameters (reference
  * aql/parser.go:589-687), and resolves INCLUDE/EXTERN files up to depth 8
  * (parser.go:717-827). We support the documented usage — `{{ Param }}` /
  * `{{ .Param }}` substitution (docs-src/docs/blocks.md "Templating") —
  * plus a default-value pipe `{{ .Param | default 'x' }}` for optional
  * parameters, and the conditional subset of the template language:
  * `{{ if .Flag }} … {{ else }} … {{ end }}` (nested), with `eq`/`ne`
  * two-argument tests and Go's map semantics for conditions (a missing
  * parameter is empty ⇒ false — only value *substitution* of an undefined
  * parameter errors). `{{ range }}` is rejected with a clear error: AQL
  * parameters are flat strings, so there is nothing iterable to range
  * over; the residual divergence is recorded in README "Divergences".
  */
object Template {

  val MaxIncludeDepth = 8

  private val Param =
    raw"""\{\{\s*\.?(\w+)(?:\s*\|\s*default\s+(?:"([^"]*)"|'([^']*)'|(\S+)))?\s*\}\}""".r

  private val Action = raw"""\{\{\s*(if|else|end|range)\b([^\}]*)\}\}""".r

  def eval(content: String, params: Map[String, String]): String =
    Param.replaceAllIn(evalConditionals(content, params), m => {
      val key = m.group(1)
      val fallback = Option(m.group(2))
        .orElse(Option(m.group(3))).orElse(Option(m.group(4)))
      params.collectFirst {
        case (k, v) if k.equalsIgnoreCase(key) =>
          scala.util.matching.Regex.quoteReplacement(v)
      }.orElse(fallback.map(scala.util.matching.Regex.quoteReplacement))
        .getOrElse(throw new IllegalArgumentException(
          s"undefined template parameter: $key"))
    })

  /** Resolves `{{ if }} / {{ else }} / {{ end }}` blocks before parameter
    * substitution. Conditions: `.Param` (non-empty = true, Go truthiness
    * for map lookups) or `eq/ne <arg> <arg>` where each arg is `.Param`
    * or a quoted literal.
    */
  private def evalConditionals(content: String,
      params: Map[String, String]): String = {
    val ms = Action.findAllMatchIn(content).toVector
    if (ms.isEmpty) return content

    def lookup(key: String): String =
      params.collectFirst {
        case (k, v) if k.equalsIgnoreCase(key.stripPrefix(".")) => v
      }.getOrElse("")

    def argValue(tok: String): String = {
      val t = tok.trim
      if ((t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) ||
          (t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
          (t.startsWith("`") && t.endsWith("`") && t.length >= 2))
        t.substring(1, t.length - 1)
      else lookup(t)
    }

    def truthy(cond: String): Boolean = {
      val c = cond.trim
      val cmp = raw"""(eq|ne)\s+(\S+)\s+(.+)""".r
      c match {
        case cmp(op, a, b) =>
          val same = argValue(a) == argValue(b)
          if (op == "eq") same else !same
        case ref if ref.nonEmpty => argValue(ref).nonEmpty
        case _ => throw new IllegalArgumentException("empty {{ if }} condition")
      }
    }

    // Recursive descent over the action stream: renders content from
    // `pos` using actions from `mi`, stopping at an else/end terminator
    // belonging to this nesting level.
    def seq(pos: Int, mi: Int): (String, Int, Int, Option[String]) = {
      val sb = new StringBuilder
      var p = pos
      var i = mi
      while (i < ms.length) {
        val m = ms(i)
        sb ++= content.substring(p, m.start)
        m.group(1) match {
          case "range" => throw new IllegalArgumentException(
            "{{ range }} is not supported: AQL template parameters are " +
              "flat strings (see README Divergences)")
          case "if" =>
            val keep = truthy(m.group(2))
            val (thenS, p1, i1, term1) = seq(m.end, i + 1)
            term1 match {
              case Some("else") =>
                val (elseS, p2, i2, term2) = seq(p1, i1)
                if (!term2.contains("end"))
                  throw new IllegalArgumentException("{{ if }} without {{ end }}")
                sb ++= (if (keep) thenS else elseS)
                p = p2; i = i2
              case Some("end") =>
                sb ++= (if (keep) thenS else "")
                p = p1; i = i1
              case _ =>
                throw new IllegalArgumentException("{{ if }} without {{ end }}")
            }
          case "else" => return (sb.result(), m.end, i + 1, Some("else"))
          case "end"  => return (sb.result(), m.end, i + 1, Some("end"))
        }
      }
      sb ++= content.substring(p)
      (sb.result(), content.length, ms.length, None)
    }

    val (rendered, _, _, term) = seq(0, 0)
    if (term.isDefined)
      throw new IllegalArgumentException(s"unexpected {{ ${term.get} }}")
    rendered
  }

  /** Parse a script, resolving INCLUDE blocks (recursively, relative to
    * the including file) and EXTERN contents, with templating applied to
    * paths and file contents.
    */
  def resolve(script: String, baseDir: Path,
              params: Map[String, String]): Ast.JobScript = {
    def resolveIn(text: String, dir: Path, depth: Int): Vector[Ast.Block] = {
      if (depth > MaxIncludeDepth)
        throw new IllegalStateException(s"include depth > $MaxIncludeDepth")
      val parsed = Parser.parse(eval(text, params))
      parsed.blocks.flatMap {
        case Ast.Include(file) =>
          val p = dir.resolve(eval(file, params))
          resolveIn(Files.readString(p), p.getParent, depth + 1)
        case q: Ast.Query if q.extern.isDefined =>
          val p = dir.resolve(eval(q.extern.get, params))
          Vector(q.copy(content = eval(Files.readString(p), params)))
        case d: Ast.Data if d.extern.isDefined =>
          val p = dir.resolve(eval(d.extern.get, params))
          Vector(d.copy(content = Files.readString(p)))
        case b => Vector(b)
      }
    }
    Ast.JobScript(resolveIn(script, baseDir, 0))
  }
}
