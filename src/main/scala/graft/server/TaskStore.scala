package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.Instant
import scala.collection.mutable

/** Scheduled task — the reference's `models.Task`
  * (reference http/models/task.go:17-29). `repository` is a directory,
  * `command` a script path inside it (AQL tasks) or an executable
  * (non-AQL); `arguments` may use the `{{ .TaskStartTime }}` template
  * (reference http/scheduler.go:231-246).
  */
final case class Task(
    id: Long,
    name: String,
    schedule: String,
    repository: String = "",
    command: String = "",
    arguments: String = "",
    isAql: Boolean = false,
    enabled: Boolean = false,
    coalesce: Boolean = false,
    nextRun: Option[Instant] = None,
    createdAt: Instant = Instant.EPOCH,
    updatedAt: Instant = Instant.EPOCH)

/** One run of a task (reference http/models/invocation.go:9-18). */
final case class Invocation(
    id: Long,
    taskId: Long,
    scheduledAt: Option[Instant] = None,
    start: Option[Instant] = None,
    finish: Option[Instant] = None,
    success: Boolean = false,
    errorMessage: String = "",
    log: String = "")

/** Cloned script repository (reference http/models/repository.go:14-24). */
final case class Repo(
    id: Long,
    name: String,
    remoteUrl: String,
    authUser: String = "",
    localPath: String = "",
    lastCommitHash: String = "",
    lastCommitMessage: String = "",
    lastCommitAuthor: String = "",
    lastCommitDate: Option[Instant] = None)

/** Thread-safe store for tasks / invocations / repositories with JSON-file
  * persistence. Stands in for the reference's SQLite+gorm `analyst.db`
  * (reference http/main.go:29, db.go) — same records and query surface, a
  * single JSON document instead of a SQL file, written atomically on every
  * mutation so a restarted server resumes its schedule (the reference gets
  * the same durability from SQLite).
  */
final class TaskStore(persistPath: Option[Path] = None) {

  private val tasks = mutable.LinkedHashMap.empty[Long, Task]
  private val invocations = mutable.LinkedHashMap.empty[Long, Invocation]
  private val repos = mutable.LinkedHashMap.empty[Long, Repo]
  private var nextTaskId = 1L
  private var nextInvocationId = 1L
  private var nextRepoId = 1L
  private val mapper = new ObjectMapper()

  persistPath.filter(Files.exists(_)).foreach(load)

  // ---- tasks ----------------------------------------------------------

  def createTask(t: Task): Task = synchronized {
    if (tasks.valuesIterator.exists(_.name == t.name))
      throw new IllegalArgumentException(s"task name '${t.name}' already exists")
    val now = Instant.now()
    val stored = t.copy(id = nextTaskId, createdAt = now, updatedAt = now)
    nextTaskId += 1
    tasks(stored.id) = stored
    persist()
    stored
  }

  def updateTask(t: Task): Task = synchronized {
    val old = tasks.getOrElse(t.id,
      throw new NoSuchElementException(s"no task ${t.id}"))
    val stored = t.copy(createdAt = old.createdAt, updatedAt = Instant.now())
    tasks(t.id) = stored
    persist()
    stored
  }

  def getTask(id: Long): Option[Task] = synchronized(tasks.get(id))

  def listTasks(): Seq[Task] = synchronized(tasks.values.toSeq)

  def enabledDueTasks(): Seq[Task] = synchronized {
    tasks.values.filter(t => t.enabled && t.nextRun.isDefined).toSeq
  }

  def deleteTask(id: Long): Unit = synchronized {
    // reference deletes the task's log entries first (task.go:69-75)
    val dead = invocations.valuesIterator.filter(_.taskId == id).map(_.id).toSeq
    dead.foreach(invocations.remove)
    tasks.remove(id)
    persist()
  }

  // ---- invocations ----------------------------------------------------

  def createInvocation(i: Invocation): Invocation = synchronized {
    val stored = i.copy(id = nextInvocationId)
    nextInvocationId += 1
    invocations(stored.id) = stored
    persist()
    stored
  }

  def updateInvocation(i: Invocation): Unit = synchronized {
    invocations(i.id) = i
    persist()
  }

  /** Most recent first (reference orders `id desc`, task.go:77-81). */
  def listInvocations(limit: Int, taskId: Option[Long] = None): Seq[Invocation] =
    synchronized {
      invocations.values.toSeq.reverseIterator
        .filter(i => taskId.forall(_ == i.taskId)).take(limit).toSeq
    }

  def lastInvocation(taskId: Long): Option[Invocation] = synchronized {
    invocations.values.toSeq.reverseIterator.find(_.taskId == taskId)
  }

  // ---- repositories ---------------------------------------------------

  def createRepo(r: Repo): Repo = synchronized {
    val stored = r.copy(id = nextRepoId)
    nextRepoId += 1
    repos(stored.id) = stored
    persist()
    stored
  }

  def updateRepo(r: Repo): Unit = synchronized { repos(r.id) = r; persist() }

  def getRepo(id: Long): Option[Repo] = synchronized(repos.get(id))

  def listRepos(): Seq[Repo] = synchronized(repos.values.toSeq)

  def deleteRepo(id: Long): Unit = synchronized { repos.remove(id); persist() }

  // ---- persistence ----------------------------------------------------

  private def persist(): Unit = persistPath.foreach { p =>
    val root = mapper.createObjectNode()
    val ts = root.putArray("tasks")
    tasks.values.foreach(t => ts.add(Json.task(mapper, t)))
    val is = root.putArray("invocations")
    invocations.values.foreach(i => is.add(Json.invocation(mapper, i)))
    val rs = root.putArray("repositories")
    repos.values.foreach(r => rs.add(Json.repoStored(mapper, r)))
    root.put("next_task_id", nextTaskId)
    root.put("next_invocation_id", nextInvocationId)
    root.put("next_repo_id", nextRepoId)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(p: Path): Unit = {
    val root = mapper.readTree(Files.readAllBytes(p))
    root.path("tasks").forEach { n =>
      val t = Json.taskFrom(n); tasks(t.id) = t
    }
    root.path("invocations").forEach { n =>
      val i = Json.invocationFrom(n); invocations(i.id) = i
    }
    root.path("repositories").forEach { n =>
      val r = Json.repoFrom(n); repos(r.id) = r
    }
    nextTaskId = root.path("next_task_id").asLong(tasks.keys.maxOption.getOrElse(0L) + 1)
    nextInvocationId = root.path("next_invocation_id").asLong(invocations.keys.maxOption.getOrElse(0L) + 1)
    nextRepoId = root.path("next_repo_id").asLong(repos.keys.maxOption.getOrElse(0L) + 1)
  }
}

/** JSON wire format — field names match the reference's struct tags
  * (task.go/invocation.go/repository.go) so clients of the reference API
  * see identical payloads.
  */
object Json {

  def task(m: ObjectMapper, t: Task): ObjectNode = {
    val n = m.createObjectNode()
    n.put("id", t.id)
    n.put("created_at", t.createdAt.toString)
    n.put("updated_at", t.updatedAt.toString)
    n.put("name", t.name)
    n.put("schedule", t.schedule)
    n.put("repository", t.repository)
    n.put("command", t.command)
    n.put("args", t.arguments)
    n.put("is_aql", t.isAql)
    n.put("enabled", t.enabled)
    n.put("coalesce", t.coalesce)
    t.nextRun match {
      case Some(x) => n.put("next_run", x.toString)
      case None    => n.putNull("next_run")
    }
    n
  }

  def taskFrom(n: JsonNode, id: Long = 0L): Task = Task(
    id = if (n.hasNonNull("id")) n.path("id").asLong else id,
    name = n.path("name").asText(""),
    schedule = n.path("schedule").asText(""),
    repository = n.path("repository").asText(""),
    command = n.path("command").asText(""),
    arguments = n.path("args").asText(""),
    isAql = n.path("is_aql").asBoolean(false),
    enabled = n.path("enabled").asBoolean(false),
    coalesce = n.path("coalesce").asBoolean(false),
    nextRun = instantOpt(n, "next_run"),
    createdAt = instantOpt(n, "created_at").getOrElse(Instant.EPOCH),
    updatedAt = instantOpt(n, "updated_at").getOrElse(Instant.EPOCH))

  def invocation(m: ObjectMapper, i: Invocation): ObjectNode = {
    val n = m.createObjectNode()
    n.put("id", i.id)
    n.put("task_id", i.taskId)
    putInstant(n, "scheduled_to_start_at", i.scheduledAt)
    putInstant(n, "started_at", i.start)
    putInstant(n, "finished_at", i.finish)
    n.put("success", i.success)
    n.put("error_message", i.errorMessage)
    n.put("log", i.log)
    n
  }

  def invocationFrom(n: JsonNode): Invocation = Invocation(
    id = n.path("id").asLong,
    taskId = n.path("task_id").asLong,
    scheduledAt = instantOpt(n, "scheduled_to_start_at"),
    start = instantOpt(n, "started_at"),
    finish = instantOpt(n, "finished_at"),
    success = n.path("success").asBoolean(false),
    errorMessage = n.path("error_message").asText(""),
    log = n.path("log").asText(""))

  def repo(m: ObjectMapper, r: Repo): ObjectNode = {
    val n = m.createObjectNode()
    n.put("id", r.id)
    n.put("name", r.name)
    n.put("remote_url", r.remoteUrl)
    n.put("auth_user", r.authUser)
    // local_path deliberately not serialized on the wire (json:"-" in the
    // reference); the store's own file does keep it so clones survive restart
    n.put("last_commit_hash", r.lastCommitHash)
    n.put("last_commit_message", r.lastCommitMessage)
    n.put("last_commit_author", r.lastCommitAuthor)
    putInstant(n, "last_commit_date", r.lastCommitDate)
    n
  }

  def repoStored(m: ObjectMapper, r: Repo): ObjectNode = {
    val n = repo(m, r)
    n.put("local_path", r.localPath)
    n
  }

  def repoFrom(n: JsonNode): Repo = Repo(
    id = n.path("id").asLong,
    name = n.path("name").asText(""),
    remoteUrl = n.path("remote_url").asText(""),
    authUser = n.path("auth_user").asText(""),
    localPath = n.path("local_path").asText(""),
    lastCommitHash = n.path("last_commit_hash").asText(""),
    lastCommitMessage = n.path("last_commit_message").asText(""),
    lastCommitAuthor = n.path("last_commit_author").asText(""),
    lastCommitDate = instantOpt(n, "last_commit_date"))

  private def putInstant(n: ObjectNode, key: String, v: Option[Instant]): Unit =
    v match {
      case Some(x) => n.put(key, x.toString)
      case None    => n.putNull(key)
    }

  private def instantOpt(n: JsonNode, key: String): Option[Instant] =
    if (n.hasNonNull(key)) {
      val s = n.path(key).asText("")
      if (s.isEmpty) None else Some(Instant.parse(s))
    } else None
}
