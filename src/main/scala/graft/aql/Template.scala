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
  * parameters. The full Go template language (conditionals/loops) is
  * undocumented and unused in the reference's own scripts and tests; the
  * divergence is recorded in README "Divergences".
  */
object Template {

  val MaxIncludeDepth = 8

  private val Param =
    raw"""\{\{\s*\.?(\w+)(?:\s*\|\s*default\s+(?:"([^"]*)"|'([^']*)'|(\S+)))?\s*\}\}""".r

  def eval(content: String, params: Map[String, String]): String =
    Param.replaceAllIn(content, m => {
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
