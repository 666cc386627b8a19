package graft.transforms

import org.apache.spark.sql.DataFrame

import TransformParser.TransformError

/** A TRANSFORM block verb — the interface every block body compiles to.
  *
  * Lives at package level (round 14, moved out of [[TransformParser]])
  * because the hierarchy deliberately spans two files — the 15 language
  * verbs in TransformParser and the INDEX maintenance family in
  * [[IndexMaintenance]] — and Scala's `sealed` binds subclasses to the
  * defining FILE: re-sealing would mean collapsing ~3 500 lines of
  * verbs back into one file to buy exhaustiveness on a trait nothing
  * pattern-matches over (dispatch is by verb keyword in
  * TransformParser.parse, never by type). The intended bound is the
  * package: every implementation lives in `graft.transforms`, and the
  * verb registry in `parse` is the closed list of what a block can
  * contain.
  */
trait Verb {
  /** Build the output DataFrame. `sources` maps UPPERCASE source alias →
    * DataFrame; `primary` is the first FROM source (used when the body
    * references sources positionally).
    */
  def build(sources: Map[String, DataFrame], primary: DataFrame): DataFrame
}

/** Shared verb-grammar and frame-prep helpers, extracted from
  * [[TransformParser]] (round 14, mechanical move): the top-level
  * clause splitters the verb parsers share, the bounded option parses,
  * and the CPU-spread guard the shingle/minhash/dot-product stages
  * apply before fan-out work.
  */
private[transforms] object VerbSupport {

  /** Split on top-level commas (not inside parens or quotes). */
  private[transforms] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false
    val sb = new StringBuilder
    for (c <- s) c match {
      case '\'' => inStr = !inStr; sb += c
      case '(' if !inStr => depth += 1; sb += c
      case ')' if !inStr => depth -= 1; sb += c
      case ',' if !inStr && depth == 0 =>
        out += sb.toString.trim; sb.clear()
      case _ => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.result()
  }

  /** Spread a small-or-unknown-size source across all cores before a
    * CPU-heavy projection (shingle/minhash/dot-product stages): a small
    * parquet source may be one input split = one task, and a JDBC (or
    * other driver-side) relation without partitioning options is ONE
    * partition regardless of size. Plan-only (optimizer stats), no RDD
    * materialization. "Unknown" = the optimizer's defaultSizeInBytes
    * placeholder (conservatively huge) — for such sources the scan's own
    * parallelism is at most its configured partition count, so one
    * exchange is the safe default before CPU-bound work; a many-split
    * 100 TB parquet corpus reports its real size, blows the bound, and
    * keeps its scan splits.
    */
  private[transforms] def spreadForCpu(df: DataFrame,
      projected: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val small = size <= BigInt(par.toLong) * (16L << 20)
    val unknown = size >= BigInt(Long.MaxValue)
    // size alone misses sources whose SCAN parallelism is capped below
    // their size: a large non-splittable compressed file reads as one
    // task per FILE, and a driver-side relation (JDBC et al.) is one
    // partition unless explicitly range-partitioned — both would run the
    // CPU-heavy projection serially however big they are. Still
    // plan-only (the file index is already resolved; no RDD
    // materialization). A deliberately partitioned JDBC read pays one
    // extra exchange here — acceptable before CPU-bound stages.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scanCapped = df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val files = fs.location.inputFiles
          files.length < par && files.exists(f =>
            f.endsWith(".gz") || f.endsWith(".bz2") ||
              f.endsWith(".zst") || f.endsWith(".deflate"))
        case _ => true // JDBC & other driver-side relations
      }
    }.getOrElse(false)
    if (small || unknown || scanCapped) projected.repartition(par)
    else projected
  }

  /** Bounded integer option parse: the verb grammars match `\d+`, which
    * admits values beyond Int.MaxValue — surface those as TransformError
    * like every other malformed clause, not a NumberFormatException.
    */
  private[transforms] def intOption(verb: String, name: String, s: String): Int =
    try s.toInt
    catch { case _: NumberFormatException => throw TransformError(
      s"$verb $name $s out of integer range") }

  /** Case-insensitive regex split helper keeping SQL-ish casing intact. */
  private[transforms] def splitKeyword(s: String, kw: String)
      : (String, Option[String]) = {
    val m = s"(?is)\\b$kw\\b".r.findFirstMatchIn(s)
    m match {
      case Some(mm) => (s.substring(0, mm.start).trim,
        Some(s.substring(mm.end).trim))
      case None => (s.trim, None)
    }
  }

  private[transforms] def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1)
    else t
  }

  /** `expr [AS alias]` — alias may be quoted or bare. */
  private[transforms] def splitAlias(term: String)
      : (String, Option[String]) = {
    val m = raw"(?is)^(.*?)\s+AS\s+('[^']*'|[A-Za-z_][\w]*)\s*$$".r
    term.trim match {
      case m(e, a) => (e.trim, Some(stripQuotes(a)))
      case e => (e.trim, None)
    }
  }

  /** NEARDEDUP METHOD COSINE's (TABLES, BITS) defaults — ONE definition
    * for the parser's partial-option fill and both builders.
    */
  private[transforms] val CosineDefaults = (32, 4)
}
