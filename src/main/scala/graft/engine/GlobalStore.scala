package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** The GLOBAL database — the reference's shared in-memory SQLite
  * (reference compiler.go:20-21, docs-src/docs/global.md) re-expressed as
  * Spark temp views over driver-built DataFrames.
  *
  * GLOBAL block bodies are sequences of `CREATE TABLE` / `INSERT INTO …
  * VALUES` statements (the documented usage, e.g. the ZOH walkthrough in
  * docs-src/docs/transforms.md); a mini-interpreter materializes them into
  * DataFrames and registers each table as a temp view, so QUERY FROM
  * GLOBAL gets full Spark SQL over them — the dialect shift from SQLite
  * is documented in SURVEY §7.3.
  *
  * Sink-side appends (`INTO GLOBAL WITH (TABLE='t')`) union new rows in
  * and re-register the view.
  */
final class GlobalStore(spark: SparkSession) {

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  private val appendDepth = mutable.Map.empty[String, Int].withDefaultValue(0)

  def tableNames: Seq[String] = tables.keys.toSeq

  def get(name: String): Option[DataFrame] = tables.get(name.toUpperCase)

  def register(name: String, df: DataFrame): Unit = {
    tables(name.toUpperCase) = df
    df.createOrReplaceTempView(name)
  }

  /** Register a table whose lineage starts fresh (CREATE / CTAS): the
    * append-cap cycle restarts with it. UPDATE/DELETE rewrites go through
    * plain `register` — they DEEPEN lineage on top of prior appends, so
    * the counter must survive them or interleaved INSERT+UPDATE would
    * keep resetting it and the every-8 checkpoint could never fire.
    */
  private def registerFresh(name: String, df: DataFrame): Unit = {
    appendDepth.remove(name.toUpperCase)
    register(name, df)
  }

  /** Appends every 8 unions are truncated with a lazy localCheckpoint:
    * a script looping appends would otherwise build a linearly deepening
    * union lineage whose analysis cost grows per statement. Lazy, so
    * nothing materializes until the table is actually read; the cap
    * keeps plan depth O(1) per read regardless of append count.
    */
  def append(name: String, df: DataFrame): Unit =
    tables.get(name.toUpperCase) match {
      case Some(existing) =>
        val unioned = existing.unionByName(df, allowMissingColumns = true)
        val depth = appendDepth(name.toUpperCase) + 1
        if (depth % 8 == 0) {
          appendDepth(name.toUpperCase) = 0
          register(name, unioned.localCheckpoint(false))
        } else {
          appendDepth(name.toUpperCase) = depth
          register(name, unioned)
        }
      case None => register(name, df)
    }

  /** Execute a GLOBAL block body: `;`-separated statements. The reference
    * hands the body to SQLite verbatim ("any valid SQL",
    * compiler.go:348-366 globalInit); here the DML surface — CREATE TABLE,
    * INSERT VALUES, INSERT…SELECT, CREATE TABLE AS SELECT, UPDATE, DELETE,
    * DROP — is interpreted as DataFrame rewrites over the stored tables,
    * with expressions in Spark SQL dialect (divergence documented in
    * SURVEY §7.3).
    */
  def execute(body: String): Unit =
    GlobalStore.splitStatements(body).foreach(executeOne)

  private val CreateRe =
    raw"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*$$".r
  private val CtasRe =
    raw"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(SELECT\b.*)$$".r
  private val InsertRe =
    raw"(?is)^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)$$".r
  private val InsertSelectRe =
    raw"(?is)^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(SELECT\b.*)$$".r
  private val UpdateRe =
    raw"(?is)^UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.+?))?\s*$$".r
  private val DeleteRe =
    raw"(?is)^DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s*$$".r
  private val DropRe = raw"(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$$".r

  private def executeOne(stmt: String): Unit = stmt.trim match {
    case "" => ()
    case CreateRe(name, colsSpec) =>
      val fields = GlobalStore.splitTop(colsSpec).map { colDef =>
        val parts = colDef.trim.split("\\s+")
        val nullable = !colDef.toUpperCase.contains("NOT NULL")
        StructField(parts(0), GlobalStore.sqlType(parts.lift(1)
          .getOrElse("TEXT")), nullable)
      }
      registerFresh(name, spark.createDataFrame(
        java.util.Collections.emptyList[Row](), StructType(fields)))
    case InsertRe(name, colList, valuesPart) =>
      val target = get(name).getOrElse(throw new IllegalArgumentException(
        s"INSERT into unknown GLOBAL table $name"))
      val schema = target.schema
      val insertCols = Option(colList).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(schema.map(_.name))
      val tuples = GlobalStore.splitTuples(valuesPart)
      val rows = tuples.map { tup =>
        val vals = GlobalStore.splitTop(tup).map(GlobalStore.parseValue)
        if (vals.length != insertCols.length)
          throw new IllegalArgumentException(
            s"INSERT arity mismatch for $name: $tup")
        val byCol = insertCols.map(_.toUpperCase).zip(vals).toMap
        Row.fromSeq(schema.map { f =>
          byCol.get(f.name.toUpperCase).flatMap(Option(_))
            .map(v => GlobalStore.coerce(v, f.dataType)).orNull
        })
      }
      append(name, spark.createDataFrame(rows.asJava, schema))
    case CtasRe(name, select) =>
      // CREATE TABLE AS SELECT: the select resolves against the already-
      // registered views, so the new table's plan snapshots their state
      registerFresh(name, spark.sql(select))
    case InsertSelectRe(name, colList, select) =>
      val target = get(name).getOrElse(throw new IllegalArgumentException(
        s"INSERT into unknown GLOBAL table $name"))
      val src = spark.sql(select)
      val insertCols = Option(colList).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(target.schema.map(_.name).toSeq)
      if (src.columns.length != insertCols.length)
        throw new IllegalArgumentException(
          s"INSERT arity mismatch for $name: ${src.columns.length} select " +
            s"columns vs ${insertCols.length} target columns")
      val renamed = src.toDF(insertCols: _*)
      val aligned = target.schema.map { f =>
        if (insertCols.exists(_.equalsIgnoreCase(f.name)))
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }
      append(name, renamed.select(aligned.toSeq: _*))
    case UpdateRe(name, setList, whereOpt) =>
      import org.apache.spark.sql.functions.{col, expr, when, lit}
      val df = get(name).getOrElse(throw new IllegalArgumentException(
        s"UPDATE of unknown GLOBAL table $name"))
      val cond = Option(whereOpt).map(expr).getOrElse(lit(true))
      val assigns = GlobalStore.splitTop(setList).map { a =>
        val i = a.indexOf('=')
        if (i < 0) throw new IllegalArgumentException(
          s"UPDATE $name: bad assignment '$a'")
        (a.take(i).trim, a.drop(i + 1).trim)
      }
      assigns.foreach { case (c, _) =>
        if (!df.columns.exists(_.equalsIgnoreCase(c)))
          throw new IllegalArgumentException(s"UPDATE $name: no column $c")
      }
      // one select evaluating every RHS against the OLD row (SQL update
      // semantics — later assignments must not see earlier ones); WHEN
      // treats a NULL condition as false, keeping the old value, and the
      // cast pins each column to its declared type
      val updated = df.select(df.schema.map { f =>
        assigns.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((_, e)) =>
            when(cond, expr(e).cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
      register(name, updated)
    case DeleteRe(name, whereOpt) =>
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      val df = get(name).getOrElse(throw new IllegalArgumentException(
        s"DELETE from unknown GLOBAL table $name"))
      val remaining = Option(whereOpt) match {
        // keep rows where the condition is FALSE or NULL (SQL deletes
        // only TRUE rows)
        case Some(w) => df.filter(not(coalesce(expr(w), lit(false))))
        case None => df.limit(0)
      }
      register(name, remaining)
    case DropRe(name) =>
      tables.remove(name.toUpperCase)
      appendDepth.remove(name.toUpperCase)
      spark.catalog.dropTempView(name)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported GLOBAL statement (CREATE TABLE / INSERT [VALUES|" +
          s"SELECT] / CREATE TABLE AS SELECT / UPDATE / DELETE / DROP): " +
          other.take(80))
  }
}

object GlobalStore {

  /** SQLite-ish type affinity → Spark types (reference
    * auto_sql_transform.go:110-128 works the other way round).
    */
  def sqlType(t: String): DataType = {
    val u = t.toUpperCase.takeWhile(_ != '(')
    u match {
      case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" => LongType
      case "REAL" | "FLOAT" | "DOUBLE" | "NUMERIC" | "DECIMAL" => DoubleType
      case "BOOL" | "BOOLEAN" => BooleanType
      case "DATE" | "DATETIME" | "TIMESTAMP" => TimestampType
      case _ => StringType // TEXT, VARCHAR, CLOB, …
    }
  }

  def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (d: Double, LongType) => d.toLong
    case (d: Double, DoubleType) => d
    case (d: Double, StringType) =>
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case (d: Double, BooleanType) => d != 0
    case (s: String, TimestampType) =>
      java.sql.Timestamp.from(java.time.OffsetDateTime.parse(s).toInstant)
    case (s: String, LongType) => s.toLong
    case (s: String, DoubleType) => s.toDouble
    case (b: Boolean, LongType) => if (b) 1L else 0L
    case (x, _) => x
  }

  def parseValue(s: String): Any = {
    val t = s.trim
    if (t.equalsIgnoreCase("NULL")) null
    else if (t.equalsIgnoreCase("TRUE")) true
    else if (t.equalsIgnoreCase("FALSE")) false
    else if (t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t.toDouble
  }

  /** Split on top-level `;` (outside quotes/parens). */
  def splitStatements(s: String): Seq[String] =
    splitOn(s, ';')

  /** Split on top-level commas. */
  def splitTop(s: String): Seq[String] = splitOn(s, ',')

  private def splitOn(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false
    val sb = new StringBuilder
    for (c <- s) c match {
      case '\'' => inStr = !inStr; sb += c
      case '(' if !inStr => depth += 1; sb += c
      case ')' if !inStr => depth -= 1; sb += c
      case `sep` if !inStr && depth == 0 =>
        if (sb.toString.trim.nonEmpty) out += sb.toString.trim
        sb.clear()
      case _ => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.result()
  }

  /** Split a VALUES clause `(…), (…)` into tuple bodies. */
  def splitTuples(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false
    val sb = new StringBuilder
    for (c <- s) c match {
      case '\'' => inStr = !inStr; if (depth > 0) sb += c
      case '(' if !inStr =>
        depth += 1; if (depth > 1) sb += c
      case ')' if !inStr =>
        depth -= 1
        if (depth == 0) { out += sb.toString; sb.clear() } else sb += c
      case _ => if (depth > 0) sb += c
    }
    out.result()
  }
}
