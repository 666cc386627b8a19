package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.time.Instant
import scala.util.control.NonFatal

/** REST façade over the store + scheduler — the reference's HTTP service
  * (reference http/main.go:142-193, task_handler.go, repos_handler.go),
  * re-hosted on the JDK's built-in server (zero extra dependencies).
  *
  * Route-for-route parity with the reference's echo registrations:
  *   GET    /tasks                         list tasks
  *   POST   /tasks                         create (201-with-body contract: 200 + full object)
  *   PUT    /tasks/{id}                    update (next_run never client-writable)
  *   DELETE /tasks/{id}                    delete task + its invocations
  *   PUT    /tasks/{id}/enable             enable + compute next_run
  *   PUT    /tasks/{id}/disable            cancel current run, clear next_run
  *   GET    /tasks/{id}/invocations?limit  per-task history (desc, default 50)
  *   GET    /tasks/{id}/last-invocation
  *   GET    /invocations?limit             global history (desc, default 50)
  *   GET    /repositories                  list cloned script repos
  *   POST   /repositories                  git clone {name, remote_url, auth_user, auth_password}
  *   POST   /repositories/{id}/update      git pull + refresh commit stats
  *   DELETE /repositories/{id}             delete record + working copy
  *   GET    /repositories/{id}/files       recursive file listing
  *
  * The reference's websocket channel (ws RUN / COMPILE messages,
  * http/main.go:46-97) carries exactly {script} → {success, error}; the JDK
  * server has no websocket support, so the same two messages are exposed as
  *   POST /run      {"script": …} → {"success": bool, "error"?: str}
  *   POST /validate {"script": …} → {"success": bool, "error"?: str}
  * (documented divergence: request/response only, no push log frames).
  *
  * Repository git operations shell out to the `git` CLI (clone/pull/log) —
  * the role go-git plays in the reference (http/models/repository.go).
  */
final class HttpServerApp(
    store: TaskStore,
    scheduler: Scheduler,
    runScript: (String, Map[String, String]) => ExecResult,
    validateScript: String => Seq[String],
    reposDir: Path = Paths.get("repositories"),
    zone: java.time.ZoneId = java.time.ZoneId.systemDefault(),
    staticDir: Option[Path] = None) {

  private val mapper = new ObjectMapper()
  private var server: JdkHttpServer = _

  /** Starts on the given port (0 = ephemeral); returns the bound port. */
  def start(port: Int): Int = {
    server = JdkHttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => handleSafe(ex))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handleSafe(ex: HttpExchange): Unit =
    try handle(ex)
    catch {
      case e: IllegalArgumentException => sendError(ex, 400, e.getMessage)
      case e: NoSuchElementException   => sendError(ex, 404, e.getMessage)
      case NonFatal(e) =>
        sendError(ex, 500, Option(e.getMessage).getOrElse(e.toString))
    } finally ex.close()

  private val TaskId = "/tasks/([0-9]+)".r
  private val TaskEnable = "/tasks/([0-9]+)/enable".r
  private val TaskDisable = "/tasks/([0-9]+)/disable".r
  private val TaskInvocations = "/tasks/([0-9]+)/invocations".r
  private val TaskLastInvocation = "/tasks/([0-9]+)/last-invocation".r
  private val RepoId = "/repositories/([0-9]+)".r
  private val RepoUpdate = "/repositories/([0-9]+)/update".r
  private val RepoFiles = "/repositories/([0-9]+)/files".r

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath.stripSuffix("/") match {
      case "" => "/"
      case p  => p
    }
    (method, path) match {
      case ("GET", "/tasks") =>
        val arr = mapper.createArrayNode()
        store.listTasks().foreach(t => arr.add(Json.task(mapper, t)))
        sendJson(ex, 200, arr)

      case ("POST", "/tasks") =>
        val t = Json.taskFrom(readBody(ex))
        // created disabled with no next_run; /enable arms it (task_handler.go:64-76)
        val stored = store.createTask(t.copy(id = 0, nextRun = None))
        sendJson(ex, 200, Json.task(mapper, stored))

      case ("PUT", TaskEnable(id)) =>
        val task = need(store.getTask(id.toLong))
        val nextRun = Cron.parse(task.schedule, zone).next(Instant.now())
        store.updateTask(task.copy(enabled = true, nextRun = Some(nextRun)))
        ex.sendResponseHeaders(204, -1)

      case ("PUT", TaskDisable(id)) =>
        val task = need(store.getTask(id.toLong))
        scheduler.cancel(task.id)
        store.updateTask(task.copy(enabled = false, nextRun = None))
        ex.sendResponseHeaders(204, -1)

      case ("PUT", TaskId(id)) =>
        val incoming = Json.taskFrom(readBody(ex), id.toLong)
        if (incoming.id == 0)
          throw new IllegalArgumentException("ID must be specified")
        val old = need(store.getTask(incoming.id))
        // next_run is scheduler-owned (task_handler.go:105 `t.NextRun = nil`)
        store.updateTask(incoming.copy(nextRun = old.nextRun))
        ex.sendResponseHeaders(204, -1)

      case ("DELETE", TaskId(id)) =>
        need(store.getTask(id.toLong))
        store.deleteTask(id.toLong)
        ex.sendResponseHeaders(204, -1)

      case ("GET", TaskInvocations(id)) =>
        val arr = mapper.createArrayNode()
        store.listInvocations(limitParam(ex), Some(id.toLong))
          .foreach(i => arr.add(Json.invocation(mapper, i)))
        sendJson(ex, 200, arr)

      case ("GET", TaskLastInvocation(id)) =>
        val i = need(store.lastInvocation(id.toLong))
        sendJson(ex, 200, Json.invocation(mapper, i))

      case ("GET", "/invocations") =>
        val arr = mapper.createArrayNode()
        store.listInvocations(limitParam(ex))
          .foreach(i => arr.add(Json.invocation(mapper, i)))
        sendJson(ex, 200, arr)

      case ("GET", "/repositories") =>
        val arr = mapper.createArrayNode()
        store.listRepos().foreach(r => arr.add(Json.repo(mapper, r)))
        sendJson(ex, 200, arr)

      case ("POST", "/repositories") =>
        val body = readBody(ex)
        val url = body.path("remote_url").asText("")
        if (url.isEmpty) throw new IllegalArgumentException("remote_url required")
        val name = Option(body.path("name").asText(""))
          .filter(_.nonEmpty).getOrElse(Git.repoName(url))
        val local = reposDir.resolve(Git.repoName(url))
        Files.createDirectories(reposDir)
        Git.clone(url, local)
        val r0 = store.createRepo(Repo(id = 0, name = name, remoteUrl = url,
          authUser = body.path("auth_user").asText(""),
          localPath = local.toString))
        val r = Git.withStats(r0)
        store.updateRepo(r)
        sendJson(ex, 200, Json.repo(mapper, r))

      case ("POST", RepoUpdate(id)) =>
        val r0 = need(store.getRepo(id.toLong))
        Git.pull(Paths.get(r0.localPath))
        val r = Git.withStats(r0)
        store.updateRepo(r)
        sendJson(ex, 200, Json.repo(mapper, r))

      case ("DELETE", RepoId(id)) =>
        val r = need(store.getRepo(id.toLong))
        store.deleteRepo(r.id)
        Git.deleteRecursively(Paths.get(r.localPath))
        ex.sendResponseHeaders(204, -1)

      case ("GET", RepoFiles(id)) =>
        val r = need(store.getRepo(id.toLong))
        val arr = mapper.createArrayNode()
        Git.files(Paths.get(r.localPath)).foreach(arr.add)
        sendJson(ex, 200, arr)

      case ("POST", "/run") =>
        val script = readBody(ex).path("script").asText("")
        val result = runScript(script, Map.empty)
        val n = mapper.createObjectNode()
        n.put("success", result.success)
        if (!result.success) n.put("error", result.error)
        // console output rides the response — the REST stand-in for the
        // ws channel's streamed OUTPUT/LOG frames (reference http/hooks.go)
        n.put("log", result.log)
        sendJson(ex, 200, n)

      case ("POST", "/validate") =>
        val script = readBody(ex).path("script").asText("")
        val errs = validateScript(script)
        val n = mapper.createObjectNode()
        n.put("success", errs.isEmpty)
        if (errs.nonEmpty) n.put("error", errs.mkString("; "))
        sendJson(ex, 200, n)

      case ("GET", p) if staticDir.isDefined =>
        // UI file serving (reference serveStatic, http/main.go:195-201 —
        // there a packed ./static box on :8080; here any --static dir on
        // the API port). Path-traversal-safe: resolved paths must stay
        // inside the root.
        val root = staticDir.get.toAbsolutePath.normalize
        val rel = if (p == "/") "index.html" else p.stripPrefix("/")
        val f = root.resolve(rel).normalize
        if (!f.startsWith(root) || !Files.isRegularFile(f))
          sendError(ex, 404, s"no route GET $p")
        else {
          val bytes = Files.readAllBytes(f)
          val ctype = rel.substring(rel.lastIndexOf('.') + 1) match {
            case "html" => "text/html"
            case "js"   => "application/javascript"
            case "css"  => "text/css"
            case "json" => "application/json"
            case "png"  => "image/png"
            case "svg"  => "image/svg+xml"
            case _      => "application/octet-stream"
          }
          ex.getResponseHeaders.set("Content-Type", ctype)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        }

      case _ => sendError(ex, 404, s"no route $method $path")
    }
  }

  private def need[A](o: Option[A]): A =
    o.getOrElse(throw new NoSuchElementException("not found"))

  private def limitParam(ex: HttpExchange): Int = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").collectFirst {
      case kv if kv.startsWith("limit=") =>
        val v = kv.drop(6)
        try v.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            "limit parameter should be a number")
        }
    }.getOrElse(50) // DefaultLimit, task_handler.go:10
  }

  private def readBody(ex: HttpExchange): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8)) match {
      case null => mapper.createObjectNode()
      case n    => n
    }

  private def sendJson(ex: HttpExchange, code: Int,
      node: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def sendError(ex: HttpExchange, code: Int, msg: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("message", if (msg == null) "error" else msg)
    try sendJson(ex, code, n)
    catch { case NonFatal(_) => () } // headers may already be sent
  }
}

/** git CLI wrappers standing in for go-git (http/models/repository.go). */
object Git {

  /** Last path segment of the remote URL (repository.go:97-118). */
  def repoName(url: String): String = {
    val trimmed = url.stripSuffix("/")
    val i = trimmed.lastIndexOf('/')
    if (i < 0) trimmed else trimmed.substring(i + 1)
  }

  /** Remote URLs accepted by POST /repositories. The allowlist (plus the
    * `--` separator below) keeps a client-supplied value from being
    * parsed as a git option (`--upload-pack=…`) or reaching git's
    * `ext::`/transport-helper machinery — the reference used go-git,
    * which had neither surface. `file://` additionally lets any client of
    * the unauthenticated endpoint read arbitrary local git repos through
    * the serving API, so it is opt-in (-Dgraft.server.allowFileRepos=true
    * or the serve flag --allow-file-repos) for local/dev use only.
    */
  private val AllowedRemote =
    raw"(?i)^(https?|ssh)://\S+$$|^[\w.-]+@[\w.-]+:\S+$$".r
  private val FileRemote = raw"(?i)^file://\S+$$".r

  // equalsIgnoreCase, not .toBoolean: a malformed value ("yes", a typo)
  // must read as false and hit the guard's clear error below, not throw an
  // opaque IllegalArgumentException from Boolean parsing.
  private def fileReposAllowed: Boolean =
    sys.props.get("graft.server.allowFileRepos")
      .exists(_.trim.equalsIgnoreCase("true"))

  def clone(url: String, dest: Path): Unit = {
    val u = url.trim
    val ok = AllowedRemote.matches(u) ||
      (FileRemote.matches(u) && fileReposAllowed)
    if (!ok)
      throw new RuntimeException(
        "remote_url must be an http(s)/ssh URL (file:// requires " +
          s"--allow-file-repos): $url")
    run(Seq("git", "clone", "--single-branch", "--", u, dest.toString), None)
  }

  def pull(repo: Path): Unit =
    run(Seq("git", "pull", "--ff-only", "origin"), Some(repo))

  def files(repo: Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(repo)) return Seq.empty
    Files.walk(repo).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(_.toString.contains(".git"))
      .map(_.toString).toSeq.sorted
  }

  /** HEAD commit metadata → repo record (repository.go:74-96). */
  def withStats(r: Repo): Repo = {
    val out = run(Seq("git", "log", "-1", "--format=%H%x1f%an%x1f%aI%x1f%s"),
      Some(Paths.get(r.localPath)))
    out.trim.split('\u001f') match {
      case Array(hash, author, date, msg) => r.copy(
        lastCommitHash = hash, lastCommitAuthor = author,
        lastCommitMessage = msg,
        lastCommitDate = Some(java.time.OffsetDateTime.parse(date).toInstant))
      case _ => r
    }
  }

  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
  }

  private def run(cmd: Seq[String], cwd: Option[Path]): String = {
    val pb = new ProcessBuilder(cmd: _*)
    cwd.foreach(d => pb.directory(d.toFile))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    if (p.waitFor() != 0)
      throw new RuntimeException(s"${cmd.take(2).mkString(" ")} failed: ${out.take(500)}")
    out
  }
}
