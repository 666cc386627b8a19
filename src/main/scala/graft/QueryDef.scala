package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage entry: a Spark build function plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query that the
  * driver hash-compares at sf0.01. Column names/aliases must match exactly
  * between the two — the compare sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
