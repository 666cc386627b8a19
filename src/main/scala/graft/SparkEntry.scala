package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage inventory (SURVEY.md §2): one entry per
  * implemented operator, each with a DuckDB oracle in `oracleSql` where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    _root_.graft.queries.Relational.entries ++
      _root_.graft.queries.Advanced.entries ++
      _root_.graft.queries.Timeseries.entries ++
      _root_.graft.queries.StreamingQ.entries ++
      _root_.graft.queries.Dedup.entries ++
      _root_.graft.queries.Similarity.entries ++
      _root_.graft.queries.TextAnalysis.entries ++
      _root_.graft.queries.Curation.entries ++
      _root_.graft.queries.MultimodalQ.entries ++
      _root_.graft.queries.AqlQ.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
