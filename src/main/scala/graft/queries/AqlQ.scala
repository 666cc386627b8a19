package graft.queries

import graft.QueryDef
import graft.engine.Aql

/** Operator-coverage entry driving the full AQL engine end-to-end: script
  * text → lexer → parser → transform compile → Spark execution, with the
  * result hash-checked against the DuckDB oracle like any other query.
  * This pins the whole language stack (not just individual operators) to
  * reference semantics at every verification round.
  */
object AqlQ {

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "q43_aql_engine_e2e",
      """SELECT l_returnflag,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(l_quantity) AS DOUBLE) AS n_rows,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
        |  CAST(AVG(l_quantity) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      // l_quantity is integral-valued, so double sums are exact and
      // order-independent — safe for the cross-engine hash compare.
      val script =
        s"""CONNECTION 'LineItems' (
           |  DRIVER = 'file', FILE = '$dir/lineitem.parquet',
           |  FORMAT = 'parquet'
           |)
           |
           |TRANSFORM 'Sums' FROM CONNECTION LineItems (
           |  AGGREGATE l_returnflag,
           |    SUM(l_quantity) AS sum_qty,
           |    COUNT(l_quantity) AS n_rows,
           |    MIN(l_quantity) AS min_qty,
           |    MAX(l_quantity) AS max_qty,
           |    AVG(l_quantity) AS avg_qty
           |  GROUP BY l_returnflag
           |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin
      Aql.run(s, script).outputs("SUMS")
    },
  )
}
