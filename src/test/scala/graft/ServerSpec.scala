package graft

import graft.engine.Aql
import graft.server._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.{Instant, ZoneOffset}

/** HTTP server + scheduler tests, mirroring the reference's own suites
  * (reference http/scheduler_test.go:1-140, http/db_test.go:1-129,
  * http/models/repository_test.go) plus route-level coverage of
  * http/main.go:173-189.
  */
class ServerSpec extends AnyFunSuite {
  import SparkTestSession._

  private val utc = ZoneOffset.UTC
  private def at(s: String): Instant = Instant.parse(s)

  // ---- cron ------------------------------------------------------------

  test("cron: 6-field spec with seconds") {
    val s = Cron.parse("15 30 10 * * *", utc)
    assert(s.next(at("2026-08-12T10:05:00Z")) == at("2026-08-12T10:30:15Z"))
    assert(s.next(at("2026-08-12T10:30:15Z")) == at("2026-08-13T10:30:15Z"))
  }

  test("cron: 5-field standard spec gets seconds=0") {
    val s = Cron.parse("30 * * * *", utc)
    assert(s.next(at("2026-08-12T10:05:17Z")) == at("2026-08-12T10:30:00Z"))
  }

  test("cron: steps, ranges, weekday names") {
    val s = Cron.parse("0 */15 9-17 * * mon-fri", utc)
    // 2026-08-15 is a Saturday -> next slot is Monday 09:00
    assert(s.next(at("2026-08-14T17:46:00Z")) == at("2026-08-17T09:00:00Z"))
    assert(s.next(at("2026-08-12T09:16:00Z")) == at("2026-08-12T09:30:00Z"))
  }

  test("cron: dom/dow OR rule when both restricted") {
    // day 1 of month OR a Monday (standard cron OR semantics)
    val s = Cron.parse("0 0 0 1 * 1", utc)
    // Fri 2026-08-07 -> Mon 2026-08-10 comes before Sep 1
    assert(s.next(at("2026-08-07T12:00:00Z")) == at("2026-08-10T00:00:00Z"))
    // Mon 2026-08-31 23:00 -> Tue Sep 1 (dom match)
    assert(s.next(at("2026-08-31T23:00:00Z")) == at("2026-09-01T00:00:00Z"))
  }

  test("cron: month names and descriptors") {
    val s = Cron.parse("0 0 0 1 jan *", utc)
    assert(s.next(at("2026-03-01T00:00:00Z")) == at("2027-01-01T00:00:00Z"))
    assert(Cron.parse("@daily", utc).next(at("2026-08-12T05:00:00Z")) ==
      at("2026-08-13T00:00:00Z"))
    assert(Cron.parse("@hourly", utc).next(at("2026-08-12T05:10:00Z")) ==
      at("2026-08-12T06:00:00Z"))
  }

  test("cron: @every parses go durations; floor-plus-delay semantics") {
    assert(Cron.parseGoDuration("1h30m") == 5400)
    assert(Cron.parseGoDuration("90s") == 90)
    assert(Cron.parseGoDuration("500ms") == 1) // floored at 1s
    val e = Cron.parse("@every 90s", utc)
    assert(e.next(at("2026-08-12T10:00:00.400Z")) == at("2026-08-12T10:01:30Z"))
    intercept[IllegalArgumentException](Cron.parseGoDuration("bogus"))
  }

  test("cron: unsatisfiable spec fails instead of looping") {
    val s = Cron.parse("0 0 0 30 2 *", utc) // Feb 30
    intercept[IllegalArgumentException](s.next(at("2026-01-01T00:00:00Z")))
  }

  test("shell splitting matches quoting rules") {
    assert(Scheduler.shellSplit("a b  c") == Seq("a", "b", "c"))
    assert(Scheduler.shellSplit("""--name "two words" 'single q'""") ==
      Seq("--name", "two words", "single q"))
    assert(Scheduler.shellSplit("""esc\ aped""") == Seq("esc aped"))
    intercept[IllegalArgumentException](Scheduler.shellSplit("'open"))
  }

  // ---- store -----------------------------------------------------------

  test("store: persistence round-trip and unique task names") {
    val dir = Files.createTempDirectory("graft-store")
    val db = dir.resolve("analyst.db.json")
    val s1 = new TaskStore(Some(db))
    val t = s1.createTask(Task(0, "nightly", "@daily", isAql = true,
      repository = "/tmp", command = "job.aql"))
    s1.createInvocation(Invocation(0, t.id, success = true, log = "ok",
      start = Some(Instant.parse("2026-08-12T00:00:00Z"))))
    intercept[IllegalArgumentException](
      s1.createTask(Task(0, "nightly", "@hourly")))

    val s2 = new TaskStore(Some(db)) // reload from disk
    assert(s2.listTasks().map(_.name) == Seq("nightly"))
    assert(s2.listTasks().head.isAql)
    assert(s2.lastInvocation(t.id).exists(_.log == "ok"))
    val t2 = s2.createTask(Task(0, "other", "@hourly"))
    assert(t2.id > t.id) // id sequence survives restart
  }

  test("store: invocation listing is most-recent-first with limit") {
    val s = new TaskStore()
    val t = s.createTask(Task(0, "t", "@daily"))
    (1 to 5).foreach(i => s.createInvocation(Invocation(0, t.id, log = s"run$i")))
    assert(s.listInvocations(3).map(_.log) == Seq("run5", "run4", "run3"))
    assert(s.listInvocations(50, Some(t.id)).size == 5)
    s.deleteTask(t.id) // cascades to invocations (reference task.go:69-75)
    assert(s.listInvocations(50).isEmpty)
  }

  // ---- scheduler -------------------------------------------------------

  /** Inline executor + canned runAql: deterministic, no Spark needed. */
  private def newScheduler(store: TaskStore,
      result: ExecResult = ExecResult(success = true, log = "ran", error = ""))
      : (Scheduler, () => Int) = {
    var calls = 0
    val sch = new Scheduler(store,
      runAql = (_, _) => { calls += 1; result },
      execute = r => r.run(), zone = utc)
    (sch, () => calls)
  }

  test("scheduler: due task runs, records invocation, advances next_run") {
    val store = new TaskStore()
    val t0 = store.createTask(Task(0, "job", "@every 60s", isAql = true,
      repository = "/tmp", command = "x.aql"))
    store.updateTask(t0.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val (sch, calls) = newScheduler(store)
    sch.next(at("2026-08-12T10:00:30Z"))
    assert(calls() == 1)
    val inv = store.lastInvocation(t0.id).get
    assert(inv.success && inv.log == "ran")
    assert(inv.scheduledAt.contains(at("2026-08-12T10:00:00Z")))
    assert(inv.start.isDefined && inv.finish.isDefined)
    // non-coalesced: next from the *scheduled* slot (+1ns), not from now
    assert(store.getTask(t0.id).get.nextRun.contains(at("2026-08-12T10:01:00Z")))
  }

  test("scheduler: not yet due / disabled tasks do not run") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "早い", "@every 60s"))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T11:00:00Z"))))
    val (sch, calls) = newScheduler(store)
    sch.next(at("2026-08-12T10:59:00Z"))
    assert(calls() == 0)
    store.updateTask(store.getTask(t.id).get.copy(enabled = false))
    sch.next(at("2026-08-12T12:00:00Z"))
    assert(calls() == 0)
  }

  test("scheduler: coalesced task catches up with a single run") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "co", "@every 1s", isAql = true,
      coalesce = true))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val (sch, calls) = newScheduler(store)
    sch.next(at("2026-08-12T10:00:10Z")) // 10 missed slots
    assert(calls() == 1) // coalesce=true: one catch-up, next from `now`
    assert(store.getTask(t.id).get.nextRun.contains(at("2026-08-12T10:00:11Z")))
  }

  test("scheduler: non-coalesced task replays each missed slot") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "each", "@every 1s", isAql = true))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val (sch, calls) = newScheduler(store)
    sch.next(at("2026-08-12T10:00:05Z"))
    // slots 10:00:00..10:00:04 run (next_run advances 1s per lap until ≥ now)
    assert(calls() == 5)
    assert(store.listInvocations(50).size == 5)
    assert(store.getTask(t.id).get.nextRun.contains(at("2026-08-12T10:00:05Z")))
  }

  test("scheduler: failures land in the invocation record") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "boom", "@every 60s", isAql = true))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val (sch, _) = newScheduler(store,
      ExecResult(success = false, log = "", error = "unknown block: X"))
    sch.next(at("2026-08-12T10:00:01Z"))
    val inv = store.lastInvocation(t.id).get
    assert(!inv.success && inv.errorMessage.contains("unknown block"))
  }

  test("scheduler: command task captures stdout and exit code") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "cmd", "@every 60s",
      command = "echo", arguments = "hello 'quoted arg'"))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val sch = new Scheduler(store, runAql = (_, _) => fail("not an AQL task"),
      execute = r => r.run(), zone = utc)
    sch.next(at("2026-08-12T10:00:01Z"))
    val inv = store.lastInvocation(t.id).get
    assert(inv.success && inv.log.trim == "hello quoted arg")
  }

  test("scheduler: {{ .TaskStartTime }} argument template renders") {
    val store = new TaskStore()
    val t = store.createTask(Task(0, "tpl", "@every 60s",
      command = "echo", arguments = "start={{ .TaskStartTime }}"))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val sch = new Scheduler(store, runAql = (_, _) => fail("not aql"),
      execute = r => r.run(), zone = utc)
    sch.next(at("2026-08-12T10:00:01Z"))
    assert(store.lastInvocation(t.id).get.log.trim ==
      "start=2026-08-12T10:00:00Z")
  }

  test("scheduler: AQL task runs a real script end-to-end") {
    val dir = Files.createTempDirectory("graft-repo")
    Files.write(dir.resolve("job.aql"),
      """DATA 'Vals' ([[1],[2],[3]]) WITH (COLUMNS = 'V')
        |TRANSFORM 'Out' FROM BLOCK Vals (
        |  AGGREGATE SUM(V) AS Total
        |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin.getBytes("UTF-8"))
    val store = new TaskStore()
    val t = store.createTask(Task(0, "aql", "@every 60s", isAql = true,
      repository = dir.toString, command = "job.aql"))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(at("2026-08-12T10:00:00Z"))))
    val sch = new Scheduler(store,
      runAql = (path, params) => {
        val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
        val r = Aql.run(spark, text, cliParams = params,
          baseDir = Paths.get(path).getParent)
        ExecResult(success = true, log = r.console.mkString("\n"), error = "")
      },
      execute = r => r.run(), zone = utc)
    sch.next(at("2026-08-12T10:00:01Z"))
    val inv = store.lastInvocation(t.id).get
    assert(inv.success && inv.log.contains("\"Total\":6"))
  }

  test("scheduler: cancel interrupts a long-running command invocation") {
    // reference scheduler_test.go "interrupt a long-running invocation":
    // Shutdown/Cancel kills the subprocess; the record shows the failure
    val store = new TaskStore()
    val t = store.createTask(Task(0, "slow", "@daily",
      command = "sleep", arguments = "30"))
    store.updateTask(t.copy(enabled = true,
      nextRun = Some(Instant.now().minusSeconds(1))))
    val sch = new Scheduler(store, runAql = (_, _) => fail("not aql"),
      execute = r => { val th = new Thread(r); th.setDaemon(true); th.start() },
      zone = utc)
    sch.next(Instant.now())
    // wait until the invocation record exists (created just before exec)
    val deadline = System.nanoTime() + 10e9.toLong
    while (store.listInvocations(1).isEmpty && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(store.listInvocations(1).nonEmpty, "invocation never started")
    Thread.sleep(200) // let the subprocess spawn
    sch.cancel(t.id)
    while (store.lastInvocation(t.id).exists(_.finish.isEmpty) &&
      System.nanoTime() < deadline) Thread.sleep(20)
    val inv = store.lastInvocation(t.id).get
    assert(inv.finish.isDefined, "cancel did not stop the invocation")
    assert(!inv.success, "killed invocation must not be marked successful")
  }

  test("scheduler: params string forms parse like the CLI") {
    assert(Scheduler.parseParams("""{"a":"1","b":"x"}""") ==
      Map("a" -> "1", "b" -> "x"))
    assert(Scheduler.parseParams("a=1, b = x") == Map("a" -> "1", "b" -> "x"))
    assert(Scheduler.parseParams("") == Map.empty)
  }

  // ---- HTTP API --------------------------------------------------------

  private def withServer[A](f: (Int, TaskStore) => A): A = {
    val store = new TaskStore()
    val sch = new Scheduler(store, runAql = (_, _) =>
      ExecResult(success = true, log = "", error = ""), zone = utc)
    val reposDir = Files.createTempDirectory("graft-repos")
    val runInline: (String, Map[String, String]) => ExecResult =
      (script, params) =>
        try {
          val r = Aql.run(spark, script, cliParams = params)
          ExecResult(success = true, log = r.console.mkString("\n"), error = "")
        } catch {
          case e: Exception =>
            ExecResult(success = false, log = "", error = e.getMessage)
        }
    val app = new HttpServerApp(store, sch, runInline,
      s => Aql.validate(s, Map.empty, Paths.get(".")), reposDir, utc)
    val port = app.start(0)
    try f(port, store) finally app.stop()
  }

  private val client = HttpClient.newHttpClient()
  private def http(port: Int, method: String, path: String, body: String = "")
      : (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("http: task CRUD lifecycle round-trip") {
    withServer { (port, store) =>
      val (c1, created) = http(port, "POST", "/tasks",
        """{"name":"nightly","schedule":"@daily","is_aql":true,
          |"repository":"/tmp","command":"job.aql","coalesce":true}""".stripMargin)
      assert(c1 == 200 && created.contains("\"id\":1"))
      assert(created.contains("\"next_run\":null")) // armed only by /enable

      val (_, listed) = http(port, "GET", "/tasks")
      assert(listed.contains("\"name\":\"nightly\""))

      assert(http(port, "PUT", "/tasks/1/enable")._1 == 204)
      val (_, afterEnable) = http(port, "GET", "/tasks")
      assert(!afterEnable.contains("\"next_run\":null"))
      assert(store.getTask(1).get.enabled)

      assert(http(port, "PUT", "/tasks/1/disable")._1 == 204)
      assert(store.getTask(1).get.nextRun.isEmpty)

      val (c2, _) = http(port, "PUT", "/tasks/1",
        """{"id":1,"name":"renamed","schedule":"@hourly"}""")
      assert(c2 == 204 && store.getTask(1).get.name == "renamed")

      assert(http(port, "GET", "/tasks/1/invocations")._2 == "[]")
      assert(http(port, "GET", "/invocations")._2 == "[]")
      assert(http(port, "GET", "/invocations?limit=bogus")._1 == 400)
      assert(http(port, "GET", "/tasks/1/last-invocation")._1 == 404)

      assert(http(port, "DELETE", "/tasks/1")._1 == 204)
      assert(http(port, "GET", "/tasks")._2 == "[]")
      assert(http(port, "DELETE", "/tasks/9")._1 == 404)
    }
  }

  test("http: invocations surface through the API") {
    withServer { (port, store) =>
      val t = store.createTask(Task(0, "t", "@daily"))
      store.createInvocation(Invocation(0, t.id, success = true, log = "done",
        start = Some(at("2026-08-12T00:00:00Z")),
        finish = Some(at("2026-08-12T00:00:05Z"))))
      val (_, one) = http(port, "GET", s"/tasks/${t.id}/last-invocation")
      assert(one.contains("\"success\":true") && one.contains("\"log\":\"done\""))
      val (_, all) = http(port, "GET", "/invocations?limit=1")
      assert(all.contains("\"task_id\":1"))
    }
  }

  test("http: /run and /validate are the ws RUN/COMPILE channel") {
    withServer { (port, _) =>
      val script =
        """DATA 'V' ([[5],[7]]) WITH (COLUMNS = 'N')
          |TRANSFORM 'S' FROM BLOCK V (
          |  AGGREGATE SUM(N) AS Total
          |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin
      val body = new com.fasterxml.jackson.databind.ObjectMapper()
        .createObjectNode().put("script", script).toString
      val (c, resp) = http(port, "POST", "/run", body)
      assert(c == 200 && resp.contains("\"success\":true"))
      // console output rides `log` (JSON-escaped inside the response string)
      assert(resp.contains("\\\"Total\\\":12"),
        s"expected script output in response: $resp")

      val (c2, resp2) = http(port, "POST", "/validate", body)
      assert(c2 == 200 && resp2.contains("\"success\":true"))

      val bad = new com.fasterxml.jackson.databind.ObjectMapper()
        .createObjectNode()
        .put("script", "TRANSFORM 'X' FROM BLOCK Nope (AGGREGATE SUM(v) AS s) INTO CONSOLE")
        .toString
      val (c3, resp3) = http(port, "POST", "/validate", bad)
      assert(c3 == 200 && resp3.contains("\"success\":false"))
      assert(resp3.contains("error"))
    }
  }

  test("websocket: RUN streams RESULT frames, then the response frame") {
    val ws = new WsServer(WsChannel.handler(
      (script, onEntry) =>
        try {
          val r = Aql.run(spark, script, consoleHook = onEntry)
          ExecResult(success = true, log = r.console.mkString("\n"), error = "")
        } catch {
          case e: Exception =>
            ExecResult(success = false, log = "", error = e.getMessage)
        },
      s => Aql.validate(s, Map.empty, Paths.get("."))))
    val port = ws.start(0)
    try {
      val received = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(w: java.net.http.WebSocket, data: CharSequence,
            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { received.add(sb.toString); sb.clear() }
          w.request(1)
          null
        }
      }
      val sock = client.newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:$port/ws"), listener).join()

      def frames(until: String => Boolean): Seq[String] = {
        val out = Seq.newBuilder[String]
        var done = false
        while (!done) {
          val f = received.poll(60, java.util.concurrent.TimeUnit.SECONDS)
          assert(f != null, "timed out waiting for ws frame")
          out += f
          if (until(f)) done = true
        }
        out.result()
      }

      val script =
        """DATA 'V' ([[2],[3],[4]]) WITH (COLUMNS = 'N')
          |TRANSFORM 'S' FROM BLOCK V (
          |  AGGREGATE SUM(N) AS Total
          |) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')""".stripMargin
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val runMsg = m.createObjectNode()
      runMsg.put("type", "RUN")
      runMsg.putObject("data").put("script", script)
      sock.sendText(runMsg.toString, true).join()

      val got = frames(_.contains("\"type\":\"RUN\""))
      // streamed console output arrives as a RESULT frame before the
      // final RUN response (reference hooks.go redirection)
      assert(got.exists(f => f.contains("\"type\":\"RESULT\"") &&
        f.contains("Total") && f.contains("9")), got.mkString("\n"))
      assert(got.last.contains("\"success\":true"), got.last)

      val badCompile = m.createObjectNode()
      badCompile.put("type", "COMPILE")
      badCompile.putObject("data")
        .put("script", "TRANSFORM 'X' FROM BLOCK Nope (FILTER 1=1) INTO CONSOLE")
      sock.sendText(badCompile.toString, true).join()
      val got2 = frames(_.contains("\"type\":\"COMPILE\""))
      assert(got2.last.contains("\"success\":false"), got2.last)

      sock.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bye").join()
    } finally ws.stop()
  }

  test("websocket: oversized declared frame length closes with 1009") {
    // ADVICE r4: the 64-bit client-declared payload length was trusted —
    // len.toInt overflow / multi-GB up-front allocation on an
    // unauthenticated socket. The server must refuse with a 1009 close
    // instead of allocating.
    val ws = new WsServer((_, _) => ())
    val port = ws.start(0)
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(10000)
      val out = sock.getOutputStream
      out.write(("GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
      out.flush()
      val in = sock.getInputStream
      // consume the 101 response headers
      var prev = 0; var done = false
      while (!done) {
        val c = in.read(); assert(c >= 0, "EOF during handshake")
        if (c == '\n' && prev == '\n') done = true
        else if (c != '\r') prev = c
      }
      // masked text frame declaring an 8 GiB payload (64-bit length)
      val declared = 8L * 1024 * 1024 * 1024
      val hdr = java.nio.ByteBuffer.allocate(14)
      hdr.put(0x81.toByte).put((0x80 | 127).toByte).putLong(declared)
        .put(Array[Byte](0, 0, 0, 0))
      out.write(hdr.array()); out.flush()
      // server answers with a close frame carrying status 1009
      assert(in.read() == 0x88, "expected close frame")
      val plen = in.read() & 0x7F
      assert(plen >= 2)
      val code = (in.read() << 8) | in.read()
      assert(code == 1009, s"close code $code")
    } finally { sock.close(); ws.stop() }
  }

  test("ws: fragmented multi-byte UTF-8 reassembles without corruption") {
    // a continuation boundary may fall INSIDE a UTF-8 sequence; decoding
    // per frame would turn the split char into U+FFFD — the message must
    // be decoded once over the assembled bytes
    @volatile var got: String = null
    val latch = new java.util.concurrent.CountDownLatch(1)
    val ws = new WsServer((_, msg) => { got = msg; latch.countDown() })
    val port = ws.start(0)
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(10000)
      val out = sock.getOutputStream
      out.write(("GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
      out.flush()
      val in = sock.getInputStream
      var prev = 0; var done = false
      while (!done) {
        val c = in.read(); assert(c >= 0, "EOF during handshake")
        if (c == '\n' && prev == '\n') done = true
        else if (c != '\r') prev = c
      }
      val bytes = "héllo".getBytes("UTF-8") // 68 C3 A9 6C 6C 6F
      def frame(opcode: Int, fin: Boolean, payload: Array[Byte]): Unit = {
        out.write((if (fin) 0x80 | opcode else opcode).toByte.toInt)
        out.write((0x80 | payload.length).toByte.toInt) // masked, short len
        out.write(Array[Byte](0, 0, 0, 0)) // zero mask = identity
        out.write(payload)
      }
      frame(0x1, fin = false, bytes.take(2)) // ...ends mid-é (C3|A9)
      frame(0x0, fin = true, bytes.drop(2))
      out.flush()
      assert(latch.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "no reassembled message")
      assert(got == "héllo", s"fragment decode corrupted the text: $got")
    } finally { sock.close(); ws.stop() }
  }

  test("git clone rejects option-injection and non-allowlisted remotes") {
    // ADVICE r4: a remote_url starting with '-' was passed as a git argv
    // element (argument injection); ext:: URLs reach git remote helpers
    val dest = Files.createTempDirectory("graft_clone_guard").resolve("r")
    for (bad <- Seq(
        "--upload-pack=touch${IFS}/tmp/pwned",
        "ext::sh -c whoami",
        "-o/tmp/x",
        "not a url"))
      assertThrows[RuntimeException](Git.clone(bad, dest))
    // file:// is local-file disclosure on an unauthenticated endpoint —
    // rejected unless explicitly opted in (serve --allow-file-repos)
    val saved = sys.props.remove("graft.server.allowFileRepos")
    try {
      val denied = intercept[RuntimeException](
        Git.clone("file:///nonexistent/graft/repo", dest))
      assert(denied.getMessage.contains("remote_url must be"),
        denied.getMessage)
      sys.props("graft.server.allowFileRepos") = "true"
      // guard passes with the opt-in (clone itself fails: no remote)
      val e = intercept[RuntimeException](
        Git.clone("file:///nonexistent/graft/repo", dest))
      assert(!e.getMessage.contains("remote_url must be"), e.getMessage)
    } finally {
      sys.props.remove("graft.server.allowFileRepos")
      saved.foreach(sys.props("graft.server.allowFileRepos") = _)
    }
  }

  test("http: static dir serving with traversal protection") {
    // reference serveStatic (http/main.go:195-201) — UI file serving
    val www = Files.createTempDirectory("graft_static")
    Files.writeString(www.resolve("index.html"), "<h1>graft</h1>")
    Files.writeString(www.resolve("app.js"), "console.log(1)")
    val store = new TaskStore()
    val sch = new Scheduler(store, runAql = (_, _) =>
      ExecResult(success = true, log = "", error = ""), zone = utc)
    val app = new HttpServerApp(store, sch,
      (_, _) => ExecResult(success = true, log = "", error = ""),
      _ => Seq.empty, Files.createTempDirectory("graft_repos2"), utc,
      staticDir = Some(www))
    val port = app.start(0)
    try {
      assert(http(port, "GET", "/")._2 == "<h1>graft</h1>")
      assert(http(port, "GET", "/app.js")._2 == "console.log(1)")
      assert(http(port, "GET", "/../etc/passwd")._1 == 404)
      assert(http(port, "GET", "/nope.css")._1 == 404)
      // API routes still win over static fallback
      assert(http(port, "GET", "/tasks")._2 == "[]")
    } finally app.stop()
  }

  test("http: repository clone / files / pull / delete via local git") {
    val prevAllow = sys.props.get("graft.server.allowFileRepos")
    sys.props("graft.server.allowFileRepos") = "true" // dev opt-in under test
    try withServer { (port, _) =>
      // build an origin repo with one committed .aql file (file:// remote —
      // same flow as the reference's go-git clone, no network)
      val origin = Files.createTempDirectory("graft-origin")
      def git(args: String*): Unit = {
        val pb = new ProcessBuilder(
          (Seq("git", "-C", origin.toString,
            "-c", "user.email=t@example.com", "-c", "user.name=t") ++ args): _*)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        assert(p.waitFor() == 0, out)
      }
      git("init", "-b", "main", ".")
      Files.write(origin.resolve("etl.aql"), "-- job".getBytes("UTF-8"))
      git("add", "."); git("commit", "-m", "first job")

      val (c, repo) = http(port, "POST", "/repositories",
        s"""{"name":"jobs","remote_url":"file://$origin"}""")
      assert(c == 200, repo)
      assert(repo.contains("\"last_commit_message\":\"first job\""))
      val firstHash = "\"last_commit_hash\":\"([0-9a-f]+)\"".r
        .findFirstMatchIn(repo).get.group(1)

      val (_, files) = http(port, "GET", "/repositories/1/files")
      assert(files.contains("etl.aql"))

      Files.write(origin.resolve("more.aql"), "-- two".getBytes("UTF-8"))
      git("add", "."); git("commit", "-m", "second job")
      val (c2, pulled) = http(port, "POST", "/repositories/1/update")
      assert(c2 == 200 && !pulled.contains(firstHash))
      assert(pulled.contains("\"last_commit_message\":\"second job\""))

      assert(http(port, "DELETE", "/repositories/1")._1 == 204)
      assert(http(port, "GET", "/repositories")._2 == "[]")
    } finally prevAllow match {
      case Some(v) => sys.props("graft.server.allowFileRepos") = v
      case None => sys.props -= "graft.server.allowFileRepos"
    }
  }
}
