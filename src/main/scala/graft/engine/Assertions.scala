package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEST-block assertion grammar + evaluation (reference
  * aql/assertions.go:19-77, engine/condition.go:50-167,
  * docs-src/docs/tests.md). The reference checks per-row/at-EOF inside the
  * stream; here each assertion is one aggregate over the target block's
  * DataFrame — same semantics, distributed evaluation.
  */
object Assertions {

  sealed trait Assertion { def check(df: DataFrame): Option[String] }

  private def fail(msg: String) = Some(msg)

  final case class RowCount(op: String, n: Long) extends Assertion {
    def check(df: DataFrame): Option[String] = {
      val c = df.count()
      op match {
        case "AT LEAST" if c < n => fail(s"outputs $c rows, expected ≥ $n")
        case "AT MOST" if c > n => fail(s"outputs $c rows, expected ≤ $n")
        case "EXACTLY" if c != n => fail(s"outputs $c rows, expected $n")
        case _ => None
      }
    }
  }

  final case class DistinctCount(column: String, op: String, n: Long)
      extends Assertion {
    def check(df: DataFrame): Option[String] = {
      val c = df.select(countDistinct(col(column))).head().getLong(0)
      op match {
        case "AT LEAST" if c < n =>
          fail(s"column $column has $c distinct values, expected ≥ $n")
        case "AT MOST" if c > n =>
          fail(s"column $column has $c distinct values, expected ≤ $n")
        case "EXACTLY" if c != n =>
          fail(s"column $column has $c distinct values, expected $n")
        case _ => None
      }
    }
  }

  final case class Unique(column: String) extends Assertion {
    def check(df: DataFrame): Option[String] = {
      val dups = df.groupBy(col(column)).count().filter(col("count") > 1)
        .count()
      if (dups > 0) fail(s"column $column has $dups duplicated values")
      else None
    }
  }

  final case class NoNulls(column: String) extends Assertion {
    def check(df: DataFrame): Option[String] = {
      val nulls = df.filter(col(column).isNull).count()
      if (nulls > 0) fail(s"column $column has $nulls null values") else None
    }
  }

  /** `IT SATISFIES <sql-expr>` — per-row predicate; every row must
    * evaluate TRUE (reference assertions.go GlobalAssertion.Expr +
    * engine/condition.go:20-37 NewSQLCondition via qlbridge). A row where
    * the expression is NULL is a failure, matching "not satisfied".
    */
  final case class Satisfies(expression: String) extends Assertion {
    def check(df: DataFrame): Option[String] = {
      val bad = df.count() - df.filter(expr(expression)).count()
      if (bad > 0) fail(s"$bad rows do not satisfy: $expression") else None
    }
  }

  private val RowsRe =
    raw"(?i)^IT\s+OUTPUTS\s+(AT\s+LEAST|AT\s+MOST|EXACTLY)\s+(\d+)\s+ROWS?$$".r
  private val DistinctRe =
    raw"(?i)^COLUMN\s+(\w+)\s+HAS\s+(AT\s+LEAST|AT\s+MOST|EXACTLY)\s+(\d+)\s+DISTINCT\s+VALUES?$$".r
  private val UniqueRe = raw"(?i)^COLUMN\s+(\w+)\s+HAS\s+UNIQUE\s+VALUES?$$".r
  private val NoNullRe =
    raw"(?i)^COLUMN\s+(\w+)\s+HAS\s+NO\s+NULL\s+VALUES?$$".r
  private val SatisfiesRe = raw"(?is)^IT\s+SATISFIES\s+(.+)$$".r

  private def normOp(s: String) = s.toUpperCase.replaceAll("\\s+", " ")

  /** Parse a TEST body: `;`-separated assertions. */
  def parse(body: String): Seq[Assertion] =
    body.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case RowsRe(op, n) => RowCount(normOp(op), n.toLong)
      case SatisfiesRe(e) => Satisfies(e.trim)
      case DistinctRe(c, op, n) => DistinctCount(c, normOp(op), n.toLong)
      case UniqueRe(c) => Unique(c)
      case NoNullRe(c) => NoNulls(c)
      case other =>
        throw new IllegalArgumentException(s"cannot parse assertion: $other")
    }

  /** Evaluate all assertions; returns failure messages (empty = pass). */
  def check(target: String, body: String, df: DataFrame): Seq[String] =
    parse(body).flatMap(_.check(df)).map(m => s"[FAIL] $target: $m")
}
