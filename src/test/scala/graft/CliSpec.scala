package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CLI lifecycle tests — reference cmd/run.go + cmd/test.go semantics:
  * run executes destinations, test neutralizes them and evaluates
  * assertions with nonzero exit on failure.
  */
class CliSpec extends AnyFunSuite {
  import SparkTestSession._

  private def script(body: String): String = {
    val f = Files.createTempFile("graft_cli", ".aql")
    Files.write(f, body.getBytes("UTF-8"))
    f.toString
  }

  test("run mode: executes script, prints console output, exit 0") {
    val p = script(
      """DATA 'Vals' ([[1],[2],[3]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Sum' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin)
    val lines = Seq.newBuilder[String]
    val code = Main.run(Seq("run", "--script", p), spark, lines += _)
    assert(code == 0)
    assert(lines.result().exists(_.contains("\"Total\":6")))
  }

  test("run mode: --v / --vv console verbosity (reference cli.md params v/vv)") {
    val p = script(
      """DATA 'Vals' ([[1],[2]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Sum' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin)
    def run(extra: String*): Seq[String] = {
      val lines = Seq.newBuilder[String]
      assert(Main.run(Seq("run", "--script", p) ++ extra, spark,
        lines += _) == 0)
      lines.result()
    }
    // default: no event lines, just the console sink output
    val quiet = run()
    assert(!quiet.exists(_.startsWith("[INFO]")), quiet.mkString("\n"))
    // --v: INFO block-executed events, no TRACE
    val v = run("--v")
    assert(v.exists(l => l.startsWith("[INFO]") && l.contains("block executed")),
      v.mkString("\n"))
    assert(!v.exists(_.startsWith("[TRACE]")), v.mkString("\n"))
    // --vv: TRACE events appear; flag order must not break --params pairing
    val vv = run("--vv")
    assert(vv.exists(_.startsWith("[TRACE]")), vv.mkString("\n"))
    assert(vv.exists(_.contains("\"Total\":3")), vv.mkString("\n"))
  }

  test("run mode: --params templating reaches the script") {
    val p = script(
      """DATA 'Vals' ([[{{ .N }}]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Out' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin)
    val lines = Seq.newBuilder[String]
    val code = Main.run(
      Seq("run", "--script", p, "--params", """{"N":"41"}"""), spark, lines += _)
    assert(code == 0)
    assert(lines.result().exists(_.contains("\"Total\":41")))
  }

  test("test mode: failing assertion exits 1 with [FAIL]") {
    val p = script(
      """DATA 'Vals' ([[1],[2]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Out' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE
        |TEST Out WITH ASSERTIONS (
        |  IT OUTPUTS EXACTLY 99 ROWS
        |)""".stripMargin)
    val lines = Seq.newBuilder[String]
    val code = Main.run(Seq("test", "--script", p), spark, lines += _)
    assert(code == 1)
    assert(lines.result().exists(_.startsWith("[FAIL]")))
  }

  test("test mode: passing assertions exit 0; destinations neutralized") {
    val p = script(
      """DATA 'Vals' ([[1],[2]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Out' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE
        |TEST Out WITH ASSERTIONS (
        |  IT OUTPUTS EXACTLY 1 ROW
        |)""".stripMargin)
    val lines = Seq.newBuilder[String]
    val code = Main.run(Seq("test", "--script", p), spark, lines += _)
    assert(code == 0, lines.result().mkString("; "))
    // console destination was neutralized in test mode — no JSON output
    assert(!lines.result().exists(_.contains("Total")))
  }

  test("serve mode: boots the API + scheduler, polls, runs a due task, exits") {
    // end-to-end smoke of the daemon path (reference http/main.go):
    // ephemeral ports, a JSON db file, one scheduled AQL task created
    // over HTTP, two 1s poll laps, clean shutdown
    val dir = Files.createTempDirectory("graft_serve")
    val repo = dir.resolve("jobs")
    Files.createDirectories(repo)
    Files.write(repo.resolve("tick.aql"),
      """DATA 'D' ([[41],[1]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'T' FROM BLOCK D (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin.getBytes("UTF-8"))
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val serveThread = new Thread(() =>
      Main.run(Seq("serve", "--port", "0", "--ws-port", "0",
        "--db", dir.resolve("db.json").toString,
        "--repos", dir.resolve("repos").toString,
        "--interval", "1", "--iterations", "10"), spark, lines.add(_)))
    serveThread.setDaemon(true)
    serveThread.start()
    val deadline = System.nanoTime() + 30e9.toLong
    def banner: Option[String] = {
      val it = lines.iterator(); var found: Option[String] = None
      while (it.hasNext && found.isEmpty) {
        val l = it.next(); if (l.contains("listening on")) found = Some(l)
      }
      found
    }
    while (banner.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    val port = ":(\\d+) ".r.findFirstMatchIn(banner.get).get.group(1).toInt

    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String) = client.send(
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    def put(path: String) = client.send(
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .method("PUT", java.net.http.HttpRequest.BodyPublishers.noBody()).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    def get(path: String) = client.send(
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())

    assert(post("/tasks",
      s"""{"name":"tick","schedule":"@every 1s","is_aql":true,
         |"repository":"$repo","command":"tick.aql","coalesce":true}"""
        .stripMargin).statusCode() == 200)
    assert(put("/tasks/1/enable").statusCode() == 204)
    // within the poll laps the scheduler must have run the task
    var ok = false
    while (!ok && System.nanoTime() < deadline) {
      val inv = get("/tasks/1/invocations").body()
      ok = inv.contains("\"success\":true") && inv.contains("Total")
      if (!ok) Thread.sleep(100)
    }
    assert(ok, s"task never ran: ${get("/tasks/1/invocations").body()}")
    serveThread.join(30000)
    assert(!serveThread.isAlive, "serve --iterations did not exit")
    // db persisted: a fresh store sees the task
    assert(Files.exists(dir.resolve("db.json")))
  }

  test("explain mode: prints a formatted plan per block, writes nothing") {
    val outDir = Files.createTempDirectory("graft_cli_explain").resolve("out")
    val p = script(
      s"""DATA 'Vals' ([[1],[2],[3]]) WITH (COLUMNS = 'V')
         |CONNECTION 'Sink' (
         |  DRIVER = 'file', FILE = '$outDir', FORMAT = 'parquet'
         |)
         |TRANSFORM 'Agg' FROM BLOCK Vals (
         |  AGGREGATE SUM(V) AS Total
         |) INTO CONNECTION Sink""".stripMargin)
    val lines = Seq.newBuilder[String]
    val code = Main.run(Seq("explain", "--script", p), spark, lines += _)
    val text = lines.result().mkString("\n")
    assert(code == 0)
    assert(text.contains("== BLOCK AGG =="), text.take(500))
    assert(text.contains("Physical Plan"), text.take(500))
    assert(text.contains("HashAggregate"), text.take(2000))
    // explain must not execute the sink (test-mode neutralization)
    assert(!Files.exists(outDir), "explain wrote the destination")
  }

  test("bad usage exits 2") {
    val lines = Seq.newBuilder[String]
    assert(Main.run(Seq("frobnicate"), spark, lines += _) == 2)
    assert(Main.run(Seq("run"), spark, lines += _) == 2)
  }

  test("validate mode: clean script exits 0, broken references exit 1") {
    val good = script(
      """DATA 'D' ([[1]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'T' FROM BLOCK D (
        |  FILTER V > 0
        |) INTO CONSOLE""".stripMargin)
    val lines = Seq.newBuilder[String]
    assert(Main.run(Seq("validate", "--script", good), spark, lines += _) == 0)
    assert(lines.result().exists(_.contains("valid")))

    val bad = script(
      """TRANSFORM 'T' FROM BLOCK Missing (
        |  FROBNICATE x
        |) INTO CONSOLE
        |TEST Nope WITH ASSERTIONS (IT OUTPUTS EXACTLY 1 ROW)""".stripMargin)
    val errs = Seq.newBuilder[String]
    assert(Main.run(Seq("validate", "--script", bad), spark, errs += _) == 1)
    val es = errs.result().mkString("\n")
    assert(es.contains("unknown block Missing"), es)
    assert(es.contains("unknown transform verb"), es)
    assert(es.contains("unknown target Nope"), es)
  }

  test("validate mode: FROM BLOCK cycles are reported") {
    val p = script(
      """TRANSFORM 'A' FROM BLOCK B (FILTER x > 0)
        |TRANSFORM 'B' FROM BLOCK A (FILTER x > 0) INTO CONSOLE""".stripMargin)
    val lines = Seq.newBuilder[String]
    assert(Main.run(Seq("validate", "--script", p), spark, lines += _) == 1)
    assert(lines.result().exists(_.contains("cycle")), lines.result())
  }
}
