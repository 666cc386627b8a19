package graft.engine

import graft.aql.{Ast, Parser, Template}
import graft.aql.Ast._
import graft.transforms.TransformParser
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Path, Paths}
import scala.collection.mutable

/** The AQL driver — analogue of the reference compiler + coordinator
  * (reference compiler.go:97-223 `execute`, engine/coordinator.go:277-413
  * `Execute`), re-architected for Spark: blocks compile to DataFrames
  * (lazy logical plans), GLOBAL is temp views, and the only *actions* are
  * the destinations — so Catalyst sees whole pipelines and optimizes
  * across block boundaries, where the reference streamed rows through
  * goroutine channels per block edge.
  *
  * Execution contract:
  *  - blocks are built memoized + on demand, starting from blocks with
  *    destinations (a query with no destination that nothing reads is
  *    never executed — documented reference behavior, query.md);
  *  - AFTER establishes happens-before between block *actions*
  *    (coordinator.go:496-523); FROM BLOCK implies it;
  *  - GLOBAL blocks run first, in script order (compiler.go:352-366);
  *  - test mode neutralizes destinations and EXECs and evaluates TEST
  *    assertions (compiler.go:33-56, §3.2);
  *  - the first failing block aborts the job (first logged error wins,
  *    coordinator.go:405-408) — here: exceptions propagate.
  */
object Aql {

  /** `AS 'alias'` (SQLite) → rewritten to backticks for Spark; see runSql. */
  private val SqliteAlias = raw"(?i)\bAS\s+'([A-Za-z_][\w ]*)'".r

  /** Apply the SqliteAlias rewrite only outside string literals: an
    * `AS 'x'` sequence inside a double-quoted Spark string literal
    * (e.g. `WHERE x = "foo AS 'bar'"`) is data, not an alias, and must
    * survive untouched. Quote state tracks both quote kinds; SQL's
    * doubled-quote escape toggles twice, leaving the state correct.
    */
  private[graft] def rewriteSqliteAliases(sql: String): String = {
    val m = SqliteAlias.pattern.matcher(sql)
    val sb = new java.lang.StringBuilder
    var last = 0
    var inSingle = false
    var inDouble = false
    def scan(from: Int, to: Int): Unit = {
      var i = from
      while (i < to) {
        val c = sql.charAt(i)
        // Backslash escapes are live inside Spark string literals (default
        // escapedStringLiterals=false): \' / \" must not toggle state.
        if ((inSingle || inDouble) && c == '\\' && i + 1 < to) i += 1
        else if (c == '\'' && !inDouble) inSingle = !inSingle
        else if (c == '"' && !inSingle) inDouble = !inDouble
        else if (!inSingle && !inDouble && c == '-' && i + 1 < to &&
          sql.charAt(i + 1) == '-') {
          // -- line comment: an apostrophe in it must not desync the scan
          while (i < to && sql.charAt(i) != '\n') i += 1
        } else if (!inSingle && !inDouble && c == '/' && i + 1 < to &&
          sql.charAt(i + 1) == '*') {
          i += 2
          while (i + 1 < to &&
            !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i += 1 // lands on '/' (or past to) — loop increment steps over
        }
        i += 1
      }
    }
    while (m.find()) {
      scan(last, m.start())
      sb.append(sql, last, m.start())
      if (!inSingle && !inDouble)
        sb.append("AS `").append(m.group(1)).append('`')
      else sb.append(sql, m.start(), m.end())
      scan(m.start(), m.end()) // the match's own quotes are balanced
      last = m.end()
    }
    sb.append(sql, last, sql.length)
    sb.toString
  }

  /** One TRANSACTIONAL sink's staging record. Registered *before* the
    * distributed stage write starts so a save() that dies partway still
    * gets its partial staging table dropped on the failure path;
    * `written` flips only after save() returns, and publishStaged
    * publishes written entries only.
    */
  private final case class Staged(
      conn: Connection, stage: String, target: String, cols: Seq[String],
      var written: Boolean = false)

  final case class RunResult(
      outputs: Map[String, DataFrame],
      console: Seq[String],
      params: Map[String, Any],
      testFailures: Seq[String])

  final case class AqlError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** JDBC read with optional parallel ingest.
    *
    * The reference reads every SQL source through a single connection
    * (engine/sql_source.go:92-234); we default to the same single-query
    * read for verbatim parity, but that path cannot scale — a 10 TB table
    * through one socket is a driver-side bottleneck by construction.
    * Connection WITH-options turn on Spark's range-partitioned JDBC scan,
    * where each executor task opens its own connection:
    *
    *   - `NUM_PARTITIONS n` — split the read into n concurrent
    *     range-bounded queries;
    *   - `PARTITION_COLUMN c` — numeric/date/timestamp column to split on
    *     (required when NUM_PARTITIONS > 1);
    *   - `LOWER_BOUND` / `UPPER_BOUND` — split bounds; when omitted they
    *     are probed with one `SELECT MIN(c), MAX(c)` roundtrip (bounds
    *     only shape the stride — rows outside them are still read);
    *   - `FETCH_SIZE n` — per-roundtrip row count hint on every
    *     connection (single-connection reads honor it too).
    *
    * A verbatim query is wrapped as a derived table so Spark can append
    * the per-partition range predicates to it.
    */
  private def readJdbc(spark: SparkSession, connName: String, url: String,
      target: Either[String, String], options: Options): DataFrame = {
    def o(k: String) = Connectors.opt(options, k)
    def intOpt(k: String): Option[Int] = o(k).map { v =>
      // strict integer parse: 4.9 partitions silently truncating to 4
      // would hide a config typo
      try v.trim.toInt
      catch { case _: NumberFormatException => throw AqlError(
        s"connection $connName: $k must be an integer, got '$v'") }
    }
    val numParts = intOpt("NUM_PARTITIONS")
    // n = 1 legitimately means single-connection; n < 1 is a config error
    // (same strict-parse rationale as rejecting '4.9' above)
    numParts.filter(_ < 1).foreach(n => throw AqlError(
      s"connection $connName: NUM_PARTITIONS must be >= 1, got $n"))
    var r = spark.read.format("jdbc").option("url", url)
    intOpt("FETCH_SIZE").foreach(f => r = r.option("fetchsize", f.toString))
    numParts.filter(_ > 1) match {
      case None =>
        target match {
          case Left(table) => r.option("dbtable", table).load()
          case Right(query) => r.option("query", query).load()
        }
      case Some(n) =>
        val partCol = o("PARTITION_COLUMN").getOrElse(throw AqlError(
          s"connection $connName: NUM_PARTITIONS > 1 requires PARTITION_COLUMN"))
        val dbtable = target match {
          case Left(table) => table
          case Right(query) => s"($query) AS graft_sub"
        }
        // honor a single explicit bound: only the MISSING side is probed
        // (LOWER_BOUND=0 without UPPER_BOUND previously fell through to
        // the probe and silently ignored the configured value)
        val (lo, hi) = (o("LOWER_BOUND"), o("UPPER_BOUND")) match {
          case (Some(l), Some(h)) => (l, h)
          case (optL, optH) =>
            val jc = java.sql.DriverManager.getConnection(url)
            try {
              val st = jc.createStatement()
              try {
                val rs = st.executeQuery(
                  s"SELECT MIN($partCol), MAX($partCol) FROM $dbtable")
                if (!rs.next() || rs.getObject(1) == null)
                  throw AqlError(s"connection $connName: cannot derive " +
                    s"bounds for empty PARTITION_COLUMN $partCol " +
                    "(set LOWER_BOUND/UPPER_BOUND explicitly)")
                (optL.getOrElse(String.valueOf(rs.getObject(1))),
                  optH.getOrElse(String.valueOf(rs.getObject(2))))
              } finally st.close()
            } finally jc.close()
        }
        r.option("dbtable", dbtable)
          .option("partitionColumn", partCol)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", n.toString)
          .load()
    }
  }

  /** Render a value as a SQL literal for GLOBAL statement binding. */
  private def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp => "'" + t.toInstant.toString + "'"
    case n => n.toString
  }

  /** Substitute `?` placeholders (outside string literals) positionally —
    * the GLOBAL-side analogue of the JDBC PreparedStatement binding.
    */
  private def bindPositional(owner: String, sql: String, args: Seq[Any]): String = {
    val sb = new StringBuilder
    var inStr = false
    var ai = 0
    for (c <- sql) c match {
      case '\'' => inStr = !inStr; sb += c
      case '?' if !inStr =>
        if (ai >= args.length)
          throw AqlError(s"$owner: more ? placeholders than USING PARAMETER values")
        sb ++= sqlLiteral(args(ai)); ai += 1
      case _ => sb += c
    }
    if (ai < args.length)
      throw AqlError(s"$owner: ${args.length} parameters but only $ai placeholders")
    sb.toString
  }

  /** Compile-only validation (reference cmd/validate.go → ValidateFile):
    * syntax, include/template resolution, reference integrity (blocks,
    * connections, TEST targets), transform-verb parses, assertion parses,
    * and FROM BLOCK cycle detection — no data access, no Spark actions.
    * Returns the list of problems (empty = valid).
    */
  def validate(
      scriptText: String,
      cliParams: Map[String, String] = Map.empty,
      baseDir: Path = Paths.get(".")): Seq[String] =
    try {
      val pre = Parser.parse(scriptText)
      val templateParams =
        pre.globalOptions.map { case (k, v) => k -> v.asString } ++ cliParams
      val script = Template.resolve(scriptText, baseDir, templateParams)
      val errs = mutable.ArrayBuffer.empty[String]
      val nodeNames = script.blocks.collect {
        case b @ (_: Query | _: Data | _: Transform) => b.name.toUpperCase
      }.toSet
      val connNames = script.connections.keySet

      def checkSrc(owner: String, s: SourceRef): Unit = s match {
        case FromBlock(n) if !nodeNames(n.toUpperCase) =>
          errs += s"$owner: unknown block $n"
        case FromConnection(c) if !connNames(c.toUpperCase) =>
          errs += s"$owner: unknown connection $c"
        case _ => ()
      }

      val deps = mutable.Map.empty[String, Seq[String]]
      script.blocks.foreach {
        case q: Query =>
          checkSrc(q.name, q.source)
          deps(q.name.toUpperCase) = (q.source match {
            case FromBlock(n) => Seq(n.toUpperCase)
            case _ => Seq.empty
          }) ++ q.after.map(_.toUpperCase)
        case t: Transform =>
          t.sources.foreach(checkSrc(t.name, _))
          if (!t.plugin)
            try { TransformParser.parse(t.content); () }
            catch { case e: Exception => errs += s"${t.name}: ${e.getMessage}" }
          deps(t.name.toUpperCase) = t.sources.collect {
            case FromBlock(n) => n.toUpperCase
          } ++ t.after.map(_.toUpperCase)
        case d: Data =>
          deps(d.name.toUpperCase) = d.after.map(_.toUpperCase)
        case tst: Test =>
          if (!nodeNames(tst.target.toUpperCase))
            errs += s"TEST: unknown target ${tst.target}"
          try { Assertions.parse(tst.assertions); () }
          catch { case e: Exception => errs += s"TEST ${tst.target}: ${e.getMessage}" }
        case _ => ()
      }

      // cycle detection over FROM BLOCK + AFTER edges (reference:
      // Tarjan SCC in coordinator.Compile, coordinator.go:217-260)
      val visiting = mutable.Set.empty[String]
      val done = mutable.Set.empty[String]
      def dfs(n: String, path: List[String]): Unit =
        if (!done(n)) {
          if (!visiting.add(n)) {
            errs += s"cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}"
          } else {
            deps.getOrElse(n, Seq.empty).filter(deps.contains)
              .foreach(dfs(_, n :: path))
            visiting.remove(n)
            done.add(n)
          }
        }
      deps.keys.foreach(dfs(_, Nil))
      errs.toSeq.distinct
    } catch {
      case e: Exception => Seq(Option(e.getMessage).getOrElse(e.toString))
    }

  def run(
      spark: SparkSession,
      scriptText: String,
      cliParams: Map[String, String] = Map.empty,
      baseDir: Path = Paths.get("."),
      testMode: Boolean = false,
      httpFetch: (String, Map[String, String]) => String = Connectors.defaultHttpFetch,
      notifyPost: Notify.Post = Notify.defaultPost,
      consoleHook: String => Unit = _ => (),
      logger: (String, String, String) => Unit = (_, _, _) => ()): RunResult = {

    // graft kernels (vec_dot, minhash_sig, …) available to delegated SQL,
    // matching a cluster configured with spark.sql.extensions
    graft.GraftExtensions.register(spark)

    // 1. pre-parse for SET globals; precedence CLI > SET (blocks.md)
    val pre = Parser.parse(scriptText)
    val templateParams =
      pre.globalOptions.map { case (k, v) => k -> v.asString } ++ cliParams

    // 2. template + include/extern resolution, then the real parse
    val script = Template.resolve(scriptText, baseDir, templateParams)
    // relative FILE paths are script-relative (the reference resolves
    // against its CWD, which its CLI runs from the script's directory)
    val connections = script.connections.map { case (k, c) =>
      k -> (Connectors.opt(c.options, "FILE") match {
        case Some(f) if !Paths.get(f).isAbsolute =>
          c.copy(options = c.options +
            ("FILE" -> OptStr(baseDir.resolve(f).normalize().toString)))
        case _ => c
      })
    }

    // 3. parameter table (DECLARE; reference engine/parameters.go:16-54)
    val paramTable = mutable.LinkedHashMap.empty[String, Any]
    script.blocks.foreach {
      case Declare(p) => paramTable(p.toUpperCase) = null
      case _ => ()
    }

    // 4. GLOBAL database init, script order
    val global = new GlobalStore(spark)
    script.blocks.foreach {
      case g: Global => global.execute(g.content)
      case _ => ()
    }

    // 5. node table
    val nodes: Map[String, Block] = script.blocks.collect {
      case b @ (_: Query | _: Data | _: Transform) => b.name.toUpperCase -> b
    }.toMap
    val scriptOrder = script.blocks.collect {
      case b @ (_: Query | _: Data | _: Transform) => b.name.toUpperCase
    }

    def node(name: String): Block = nodes.getOrElse(name.toUpperCase,
      throw AqlError(s"unknown block: $name"))

    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    val actionDone = mutable.Set.empty[String]
    val consoleOut = mutable.ArrayBuffer.empty[String]
    val building = mutable.Set.empty[String] // cycle detection
    // TRANSACTIONAL sinks stage here; published atomically after all
    // actions succeed
    val runId = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val pendingPublish = mutable.ArrayBuffer.empty[Staged]

    def optionOf(opts: Options, conn: Option[Connection], key: String)
        : Option[String] = {
      val k = key.toUpperCase
      opts.get(k).map(_.asString)
        .orElse(conn.flatMap(_.options.get(k)).map(_.asString))
        .orElse(cliParams.collectFirst {
          case (ck, v) if ck.equalsIgnoreCase(k) => v })
        .orElse(pre.globalOptions.get(k).map(_.asString))
    }

    def connection(name: String): Connection =
      connections.getOrElse(name.toUpperCase,
        throw AqlError(s"unknown connection: $name"))

    def driverOf(c: Connection): String =
      Connectors.opt(c.options, "DRIVER").getOrElse(
        throw AqlError(s"connection ${c.name}: DRIVER required")).toLowerCase

    def readConnection(c: Connection): DataFrame = driverOf(c) match {
      case "file" | "csv" | "parquet" | "json" => Connectors.readFile(spark, c)
      case "http" => Connectors.readHttp(spark, c, httpFetch)
      case "excel" => Connectors.readExcel(spark, c)
      case "mssql" | "postgres" | "sqlite3" | "derby" =>
        // JDBC path: ships the query/table to the database verbatim,
        // like the reference (sql_source.go:170); needs a live DB.
        // NUM_PARTITIONS/PARTITION_COLUMN/FETCH_SIZE → parallel ingest.
        readJdbc(spark, c.name,
          Connectors.opt(c.options, "CONNECTIONSTRING").getOrElse(
            throw AqlError(s"connection ${c.name}: CONNECTIONSTRING required")),
          Left(Connectors.opt(c.options, "TABLE").getOrElse(
            throw AqlError(s"connection ${c.name}: TABLE required"))),
          c.options)
      case other => throw AqlError(
        s"connection ${c.name}: unknown driver $other")
    }

    /** Run SQL with views for GLOBAL tables + any FROM BLOCK/CONNECTION
      * dependencies registered, binding `?` placeholders positionally from
      * USING PARAMETER (reference sql_source.go:68-81; Spark ≥3.4
      * parameterized sql).
      */
    def runSql(sql0: String, usingParams: Seq[String]): DataFrame = {
      // SQLite-dialect shim: the reference's delegated SQL executes on its
      // SQLite scratch DB, which accepts single-quoted column aliases
      // (`SELECT 1 AS 'Value'`, reference example.aql:8). Spark rejects
      // that form, so rewrite just the alias quoting to backticks —
      // skipping matches inside string literals, where `AS 'x'` is data.
      val sql = Aql.rewriteSqliteAliases(sql0)
      if (usingParams.isEmpty) spark.sql(sql)
      else {
        val args = usingParams.map { p =>
          val k = p.stripPrefix("@").toUpperCase
          if (!paramTable.contains(k))
            throw AqlError(s"parameter @$k not declared")
          paramTable(k)
        }
        spark.sql(sql, args.toArray)
      }
    }

    def build(name: String): DataFrame = {
      val key = name.toUpperCase
      built.getOrElseUpdate(key, {
        if (!building.add(key)) throw AqlError(s"cycle through block $name")
        try buildBlock(node(key)) finally building.remove(key)
      })
    }

    def buildBlock(b: Block): DataFrame = b match {
      case d: Data =>
        Connectors.literal(spark, d.content, d.options)

      case q: Query if q.execOnly =>
        // EXEC returns no rows (sql_source.go ExecOnly); test mode
        // neutralizes (→ SELECT 1, compiler.go:34-39). Against a SQL
        // connection the statement ships verbatim to the database on the
        // driver — DDL/DML has no distributed component (reference
        // sql_source.go:158-168 ExecOnly tx.Exec path). USING PARAMETER
        // binds `?` placeholders positionally, as on queries
        // (sql_source.go:68-81 — the params path is shared with ExecOnly).
        if (!testMode) {
          val args = q.usingParams.map { p =>
            val k = p.stripPrefix("@").toUpperCase
            if (!paramTable.contains(k))
              throw AqlError(s"parameter @$k not declared")
            paramTable(k)
          }
          q.source match {
            case FromGlobal =>
              global.execute(
                if (args.isEmpty) q.content
                else bindPositional(q.name, q.content, args))
            case FromConnection(cn) =>
              val c = connection(cn)
              driverOf(c) match {
                case "mssql" | "postgres" | "sqlite3" | "derby" =>
                  val url = Connectors.opt(c.options, "CONNECTIONSTRING")
                    .getOrElse(throw AqlError(
                      s"connection ${c.name}: CONNECTIONSTRING required"))
                  val jc = java.sql.DriverManager.getConnection(url)
                  try { val st = jc.prepareStatement(q.content)
                    try {
                      args.zipWithIndex.foreach { case (v, i) =>
                        st.setObject(i + 1, v) }
                      st.executeUpdate()
                    } finally st.close()
                  } finally jc.close()
                case other => throw AqlError(
                  s"EXEC ${q.name}: driver $other is not executable")
              }
            case _ => throw AqlError(
              s"EXEC ${q.name}: requires GLOBAL or a SQL connection")
          }
        }
        spark.emptyDataFrame

      case q: Query =>
        q.source match {
          case FromGlobal => runSql(q.content, q.usingParams)
          case FromBlock(src) =>
            build(src).createOrReplaceTempView(src)
            runSql(q.content, q.usingParams)
          case FromConnection(cn) =>
            val c = connection(cn)
            driverOf(c) match {
              case "mssql" | "postgres" | "sqlite3" | "derby" =>
                // ship query verbatim to the database (reference behavior);
                // NUM_PARTITIONS et al. on the connection → parallel ingest
                readJdbc(spark, c.name,
                  Connectors.opt(c.options, "CONNECTIONSTRING")
                    .getOrElse(throw AqlError(
                      s"connection ${c.name}: CONNECTIONSTRING required")),
                  Right(q.content), c.options)
              case _ =>
                // AutoSQL equivalent (auto_sql_transform.go → SURVEY §2.8):
                // stage the connection as a temp view, run Spark SQL on it
                readConnection(c).createOrReplaceTempView(c.name)
                runSql(q.content, q.usingParams)
            }
        }

      case t: Transform if t.plugin =>
        // external-process transform over the reference's JSON-RPC stdio
        // protocol (plugins/api.go, transform_rpc.go) — see [[Plugins]]
        val exe = optionOf(t.options, None, "EXECUTABLE").getOrElse(
          throw AqlError(
            s"TRANSFORM PLUGIN ${t.name}: EXECUTABLE option required"))
        val args = optionOf(t.options, None, "ARGS")
          .map(Plugins.parseArgs).getOrElse(Seq.empty)
        val srcs: Seq[(String, DataFrame)] = t.sources.map {
          case FromBlock(srcName) => srcName -> build(srcName)
          case FromConnection(cn) =>
            val c = connection(cn); c.name -> readConnection(c)
          case FromGlobal => throw AqlError(
            s"TRANSFORM PLUGIN ${t.name}: FROM GLOBAL requires a TABLE — " +
              "use FROM BLOCK over a QUERY instead")
        }
        val destNames = t.dests.map {
          case IntoConnection(cn) => cn
          case IntoConsole => "CONSOLE"
          case IntoGlobal => "GLOBAL"
          case IntoParameter(_) => "PARAMETER"
        }
        Plugins.runTransform(spark, exe, args, t.options, srcs, destNames,
          cwd = Some(baseDir))

      case t: Transform =>
        val srcs: Seq[(String, DataFrame)] = t.sources.map {
          case FromBlock(srcName) => srcName -> build(srcName)
          case FromConnection(cn) =>
            val c = connection(cn)
            c.name -> readConnection(c)
          case FromGlobal =>
            val table = optionOf(t.options, None, "TABLE").getOrElse(
              throw AqlError(
                s"TRANSFORM ${t.name} FROM GLOBAL requires WITH (TABLE=…)"))
            table -> global.get(table).getOrElse(
              throw AqlError(s"unknown GLOBAL table $table"))
        }
        val byName = srcs.map { case (n, df) => n.toUpperCase -> df }.toMap
        // multi-source = interleaved union when schemas line up
        // (compiler.go:441-569; MULTISOURCE_ORDER is meaningless under
        // Spark's execution model and accepted as a no-op)
        val primary =
          if (srcs.size == 1) srcs.head._2
          else {
            val colSets = srcs.map(_._2.columns.map(_.toUpperCase).toSet)
            if (colSets.forall(_ == colSets.head))
              srcs.map(_._2).reduce(_ unionByName _)
            else srcs.head._2
          }
        TransformParser.parse(t.content).build(byName, primary)
    }

    // ---- actions -------------------------------------------------------
    def destsOf(b: Block): Seq[DestRef] = b match {
      case q: Query => q.dests
      case d: Data => d.dests
      case t: Transform => t.dests
      case _ => Seq.empty
    }
    def afterOf(b: Block): Seq[String] = b match {
      case q: Query => q.after
      case d: Data => d.after
      case t: Transform => t.after
      case _ => Seq.empty
    }
    def optsOf(b: Block): Options = b match {
      case q: Query => q.options
      case d: Data => d.options
      case t: Transform => t.options
      case _ => Map.empty
    }

    def runAction(name: String): Unit = {
      val key = name.toUpperCase
      if (actionDone.add(key)) {
        val b = node(key)
        afterOf(b).foreach(dep => runAction(dep))
        val isExec = b match { case q: Query => q.execOnly; case _ => false }
        val hasDest = destsOf(b).nonEmpty
        if (isExec || hasDest || testMode) {
          val df = build(key)
          if (!testMode) destsOf(b).foreach(dest =>
            writeDest(b, df, dest))
        }
      }
    }

    def writeDest(b: Block, df: DataFrame, dest: DestRef): Unit = dest match {
      case IntoConsole =>
        val rendered = Connectors.renderConsole(df, optsOf(b))
        consoleOut += rendered
        // streaming observer for server-side output hooks (reference
        // http/hooks.go redirects ConsoleDestination writes to the ws)
        consoleHook(rendered)
      case IntoGlobal =>
        val table = optionOf(optsOf(b), None, "TABLE").getOrElse(
          throw AqlError(s"${b.name}: INTO GLOBAL requires WITH (TABLE=…)"))
        global.append(table, df)
      case IntoConnection(cn) =>
        val c = connection(cn)
        val dropNulls = optionOf(optsOf(b), Some(c), "DROP_NULLS")
          .exists(v => Ast.truthy(OptStr(v)))
        val out = if (dropNulls) df.na.drop() else df
        driverOf(c) match {
          case "file" | "csv" | "parquet" | "json" =>
            Connectors.writeFile(out, c)
          case "excel" =>
            Connectors.writeExcel(out, c, optionOf(optsOf(b), Some(c), _))
          case "mandrill" =>
            // Templated email destination (reference
            // engine/mandrill_destination.go); transport injectable
            Notify.sendTemplateEmails(out,
              optionOf(optsOf(b), Some(c), _), notifyPost, c.name)
            ()
          case "mssql" | "postgres" | "sqlite3" | "derby" =>
            // Batched JDBC append (reference engine/sql_dest.go:70-192;
            // default 500 rows/batch, ROWS_PER_BATCH override :110-115).
            // The executor-side writer batches per partition — the
            // distributed analogue of the reference's single inserter.
            //
            // TRANSACTIONAL='TRUE' gives the reference's transaction-
            // manager guarantee (engine/transaction_manager.go:21-224:
            // every SQL destination commits or rolls back together) in
            // the shape a distributed writer permits: partitions write
            // a staging table in parallel (non-transactional, invisible
            // to readers), then after ALL script actions succeed one
            // driver-side transaction per connection publishes
            // stage→target, and the commit loop spans connections like
            // the reference's TxManager.CommitAll. Targets must exist.
            val url = Connectors.opt(c.options, "CONNECTIONSTRING")
              .getOrElse(throw AqlError(
                s"connection ${c.name}: CONNECTIONSTRING required"))
            val table = optionOf(optsOf(b), Some(c), "TABLE").getOrElse(
              throw AqlError(s"${b.name}: INTO CONNECTION ${c.name} " +
                "requires WITH (TABLE=…)"))
            val transactional = optionOf(optsOf(b), Some(c), "TRANSACTIONAL")
              .exists(v => Ast.truthy(OptStr(v)))
            // per-sink suffix: two TRANSACTIONAL sinks may target the
            // same table (both staged, both published in the same tx)
            val sinkTable =
              if (transactional)
                s"${table}__stage_${runId}_${pendingPublish.size}"
              else table
            val staged =
              if (transactional) {
                val s = Staged(c, sinkTable, table, out.schema.fieldNames.toSeq)
                pendingPublish += s
                Some(s)
              } else None
            out.write.format("jdbc")
              .option("url", url)
              .option("dbtable", sinkTable)
              .option("batchsize",
                optionOf(optsOf(b), Some(c), "ROWS_PER_BATCH")
                  .getOrElse("500"))
              .mode(if (transactional) "overwrite" else "append").save()
            staged.foreach(_.written = true)
          case other => throw AqlError(
            s"${b.name}: INTO CONNECTION with driver $other not supported " +
              "offline")
        }
      case IntoParameter(ps) =>
        val rows = df.limit(2).collect()
        if (rows.length != 1) throw AqlError(
          s"${b.name}: INTO PARAMETER requires exactly one result row " +
            s"(got ${rows.length}; docs-src/docs/query.md)")
        val row = rows.head
        ps.zipWithIndex.foreach { case (p, i) =>
          val k = p.stripPrefix("@").toUpperCase
          if (!paramTable.contains(k))
            throw AqlError(s"parameter @$k not declared")
          paramTable(k) = row.get(i)
        }
    }

    // roots: blocks with destinations, EXECs, and (test mode) test targets
    val roots = scriptOrder.filter { n =>
      val b = node(n)
      destsOf(b).nonEmpty ||
        (b match { case q: Query => q.execOnly; case _ => false })
    } ++ (if (testMode) script.blocks.collect {
      case t: Test => t.target.toUpperCase
    } else Seq.empty)

    // Slack log forwarding, configured via SET / CLI params (reference
    // SlackWrapper, engine/slack.go:104-141; docs cli.md "Logging to
    // Slack"): block completions at INFO, failures at ERROR.
    val slack = Notify.slackLogger(k => optionOf(Map.empty, None, k), notifyPost)
    // every engine event goes to the caller-supplied logger too — the
    // CLI's --v/--vv console verbosity (reference cmd flags `v`/`vv`,
    // docs cli.md "Logging": TRACE/INFO/WARNING/ERROR)
    def emit(level: String, source: String, message: String): Unit = {
      logger(level, source, message)
      slack.foreach(_(level, source, message))
    }
    // transform-verb advisory warnings (derived-geometry contract
    // violations, clamped cell derivations) surface through the same
    // logger at WARNING; the hook is process-global, so the last run's
    // wiring wins — fine under the engine's one-run-at-a-time contract
    graft.transforms.IndexMaintenance.Warnings.hook =
      m => emit("warning", "transform", m)
    try {
      roots.distinct.foreach { n =>
        emit("trace", n, "executing block")
        runAction(n)
        emit("info", n, "block executed")
      }
      publishStaged(pendingPublish.toSeq)
    } catch {
      case e: Throwable =>
        emit("error", "run",
          Option(e.getMessage).getOrElse(e.toString))
        // a failed run leaves no staged leftovers behind
        dropStaged(pendingPublish.toSeq)
        throw e
    }

    // TEST assertions (test mode only; reference §3.2)
    val failures =
      if (!testMode) Seq.empty
      else script.blocks.collect { case t: Test =>
        Assertions.check(t.target, t.assertions, build(t.target))
      }.flatten

    RunResult(built.toMap, consoleOut.toSeq, paramTable.toMap, failures)
  }

  /** Atomic publish of TRANSACTIONAL staging tables: one driver-side
    * transaction per connection runs every stage→target INSERT, then the
    * commit loop spans all connections (the reference TxManager's
    * CommitAll shape, engine/transaction_manager.go:150-186 — same
    * guarantee per connection, same best-effort across connections).
    * Any failure rolls every open transaction back, so either all
    * targets see their rows or none do. Staging tables are dropped
    * either way.
    */
  private def publishStaged(pending: Seq[Staged]): Unit = {
    val ready = pending.filter(_.written)
    if (ready.isEmpty) return
    val opened = mutable.ArrayBuffer.empty[java.sql.Connection]
    try {
      val byConn = ready.groupBy(_.conn.name).values.toSeq
      val conns = byConn.map { items =>
        val url = Connectors.opt(items.head.conn.options, "CONNECTIONSTRING").get
        val jc = java.sql.DriverManager.getConnection(url)
        jc.setAutoCommit(false)
        opened += jc
        (jc, items)
      }
      conns.foreach { case (jc, items) =>
        // Identifier quoting per the connection's own quote string:
        // column names with spaces (the AS 'x y' alias shim produces
        // them) or reserved words (ORDER, USER, …) must be quoted or the
        // INSERT fails and rolls back every sink. Quoting is
        // case-sensitive, so target columns are resolved against the
        // database's stored names case-insensitively first (the
        // reference's column model is case-insensitive everywhere,
        // transforms/aggregate.go:256-263) and the stored spelling is
        // quoted; stage-side columns are always the DataFrame's exact
        // case because Spark's JDBC writer creates them quoted.
        val meta = jc.getMetaData
        val qs = Option(meta.getIdentifierQuoteString)
          .map(_.trim).getOrElse("\"")
        def quoted(id: String): String =
          if (qs.isEmpty) id else qs + id.replace(qs, qs + qs) + qs
        def plainOr(id: String): String = // tables: keep DB case folding
          if (qs.isEmpty || id.matches("[A-Za-z_][A-Za-z0-9_]*")) id
          else quoted(id)
        def tbl(id: String): String = id.split('.').map(plainOr).mkString(".")
        def storedColumns(table: String): Map[String, String] = {
          val bare = table.split('.').last
          // getColumns treats the table argument as a LIKE pattern: _ and %
          // are wildcards, so EVENT_LOG would also match EVENTSLOG and the
          // case map could resolve to another table's spelling. Escape them
          // with the driver's escape string and keep only exact-name rows.
          val esc = Option(meta.getSearchStringEscape).getOrElse("\\")
          def likeEscape(t: String): String =
            if (esc.isEmpty) t
            else t.replace(esc, esc + esc)
              .replace("_", esc + "_").replace("%", esc + "%")
          Seq(bare, bare.toUpperCase, bare.toLowerCase).distinct.view
            .map { t =>
              val rs = meta.getColumns(null, null, likeEscape(t), null)
              val b = Map.newBuilder[String, String]
              try while (rs.next()) {
                if (t == rs.getString("TABLE_NAME")) {
                  val n = rs.getString("COLUMN_NAME")
                  b += (n.toLowerCase -> n)
                }
              } finally rs.close()
              b.result()
            }.find(_.nonEmpty).getOrElse(Map.empty)
        }
        items.foreach { s =>
          val stored = storedColumns(s.target)
          val targetCols =
            s.cols.map(c => quoted(stored.getOrElse(c.toLowerCase, c)))
          val st = jc.createStatement()
          try st.executeUpdate(
            s"INSERT INTO ${tbl(s.target)} (${targetCols.mkString(", ")}) " +
              s"SELECT ${s.cols.map(quoted).mkString(", ")} FROM ${tbl(s.stage)}")
          finally st.close()
        }
      }
      opened.foreach(_.commit())
    } catch {
      case e: Throwable =>
        opened.foreach(c => try c.rollback() catch { case _: Exception => () })
        throw AqlError("transactional publish failed; all staged " +
          s"destinations rolled back: ${e.getMessage}")
    } finally {
      opened.foreach(c => try c.close() catch { case _: Exception => () })
      dropStaged(pending)
    }
  }

  /** Best-effort staging-table cleanup (post-publish or post-failure);
    * drops every registered stage, including ones whose distributed
    * write died partway (registered-before-save above).
    */
  private def dropStaged(pending: Seq[Staged]): Unit =
    pending.groupBy(_.conn.name).values.foreach { items =>
      try {
        val url = Connectors.opt(items.head.conn.options, "CONNECTIONSTRING").get
        val jc = java.sql.DriverManager.getConnection(url)
        try items.foreach { s =>
          val st = jc.createStatement()
          try { st.executeUpdate(s"DROP TABLE ${s.stage}"); () }
          catch { case _: Exception => () } finally st.close()
        } finally jc.close()
      } catch { case _: Exception => () }
    }
}
