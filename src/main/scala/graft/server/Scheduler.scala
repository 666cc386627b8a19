package graft.server

import java.time.Instant
import scala.collection.mutable
import scala.util.control.NonFatal

/** Result of one task execution, feeding the invocation record. */
final case class ExecResult(success: Boolean, log: String, error: String)

/** Cron task scheduler — behavioral twin of the reference's
  * (reference http/scheduler.go:23-299), differing only in how an AQL task
  * runs: the reference shells out to `analyst run --script … --params …`
  * (scheduler.go:196-199); here AQL tasks run in-process on the shared
  * SparkSession (one JVM, one Spark app — a subprocess per invocation would
  * re-pay Spark startup per run). Non-AQL tasks still exec a subprocess,
  * like the reference's arbitrary-command branch (scheduler.go:200-206).
  *
  * Semantics kept 1:1:
  *   - `next(now)` runs every enabled task whose next_run ≤ now, skipping
  *     tasks already running (scheduler.go:88-115);
  *   - catch-up loop: while next_run < now, run and advance; coalesced
  *     tasks advance next_run from `now` (one catch-up run at most),
  *     non-coalesced from next_run+1ns, replaying each missed slot
  *     (scheduler.go:143-168, 248-264);
  *   - every run writes an Invocation row: scheduled_at, start/finish,
  *     success, stdout log, error (scheduler.go:170-195, 266-284);
  *   - `{{ .TaskStartTime }}` argument templating (scheduler.go:231-246);
  *   - `cancel(taskId)` best-effort stops the running invocation
  *     (scheduler.go:287-294).
  *
  * `runAql` is injectable so tests (and the HTTP layer) decide how scripts
  * execute; `execute` is the thread launcher — the default spawns a daemon
  * thread per invocation (the reference's `go s.execute(...)`), tests pass
  * an inline executor for determinism.
  */
final class Scheduler(
    store: TaskStore,
    runAql: (String, Map[String, String]) => ExecResult,
    execute: Runnable => Unit = Scheduler.daemonThread,
    zone: java.time.ZoneId = java.time.ZoneId.systemDefault()) {

  private final class RunState {
    var running = false
    var lastExec: Instant = Instant.MIN
    @volatile var process: Option[Process] = None
    @volatile var cancelled = false
  }

  private val states = mutable.Map.empty[Long, RunState]

  /** Runs all due tasks; returns the enabled task set it considered. */
  def next(now: Instant): Seq[Task] = {
    val tasks = store.enabledDueTasks()
    tasks.foreach { task =>
      if (!task.nextRun.exists(_.isAfter(now))) {
        val proceed = synchronized {
          val st = states.getOrElseUpdate(task.id, new RunState)
          if (st.running) false else { st.running = true; true }
        }
        if (proceed) execute(() => runCatchUp(task, now))
      }
    }
    tasks
  }

  private def runCatchUp(task0: Task, now: Instant): Unit = {
    val st = synchronized(states(task0.id))
    try {
      var task = task0
      // superseded check (scheduler.go:131-143): a newer invocation already
      // covered this next_run — just advance the schedule
      if (!st.lastExec.isBefore(task.nextRun.get)) {
        task = updateNextRun(task, now)
        return
      }
      var continue = true
      while (continue && task.nextRun.exists(_.isBefore(now))) {
        // re-check enabled each lap (scheduler.go:146-157)
        if (!store.getTask(task.id).exists(_.enabled) || st.cancelled) {
          continue = false
        } else {
          st.lastExec = task.nextRun.get
          runSingleInvocation(task, st)
          task = updateNextRun(task, now)
        }
      }
    } catch {
      case NonFatal(_) => () // schedule advance failed; next poll retries
    } finally synchronized {
      st.running = false
      st.cancelled = false
    }
  }

  private def runSingleInvocation(task: Task, st: RunState): Unit = {
    val inv0 = store.createInvocation(Invocation(
      id = 0, taskId = task.id, scheduledAt = task.nextRun,
      start = Some(Instant.now())))
    val result =
      try {
        val args = renderArgs(task)
        if (task.isAql) {
          // script path resolved relative to the repository, like the
          // reference's path.Join(task.Repository, task.Command)
          val script = java.nio.file.Paths.get(task.repository, task.command)
          runAql(script.toString, Scheduler.parseParams(args))
        } else runCommand(task.command, args, st)
      } catch {
        case NonFatal(e) =>
          ExecResult(success = false, log = "",
            error = Option(e.getMessage).getOrElse(e.toString))
      }
    store.updateInvocation(inv0.copy(
      finish = Some(Instant.now()),
      success = result.success,
      errorMessage = result.error,
      log = result.log))
  }

  /** `{{ .TaskStartTime }}` is the only variable the reference exposes to
    * the argument template (scheduler.go:231-239).
    */
  private def renderArgs(task: Task): String = {
    val start = task.nextRun.map(_.toString).getOrElse("")
    task.arguments.replaceAll(
      "\\{\\{\\s*\\.TaskStartTime\\s*\\}\\}",
      java.util.regex.Matcher.quoteReplacement(start))
  }

  private def runCommand(command: String, args: String, st: RunState)
      : ExecResult = {
    val argv = command +: Scheduler.shellSplit(args)
    val pb = new ProcessBuilder(argv: _*)
    val proc = pb.start()
    st.process = Some(proc)
    try {
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
      val code = proc.waitFor()
      ExecResult(success = code == 0, log = out,
        error = if (code == 0) "" else err)
    } finally st.process = None
  }

  private def updateNextRun(task: Task, now: Instant): Task = {
    val sched = Cron.parse(task.schedule, zone)
    val from =
      if (task.coalesce) now
      else task.nextRun.getOrElse(now).plusNanos(1)
    val updated = task.copy(nextRun = Some(sched.next(from)))
    store.updateTask(updated)
    updated
  }

  /** Best-effort cancel of a running invocation (scheduler.go:287-294):
    * destroys a live subprocess, flags the catch-up loop to stop before
    * its next lap (an in-flight Spark job itself is not interrupted —
    * neither is the reference's in-flight process guaranteed to die).
    */
  def cancel(taskId: Long): Unit = synchronized {
    states.get(taskId).foreach { st =>
      st.cancelled = true
      st.process.foreach(_.destroy())
    }
  }

  def shutdown(): Unit = synchronized {
    states.keys.toSeq.foreach(cancel)
  }
}

object Scheduler {

  def daemonThread: Runnable => Unit = { r =>
    val t = new Thread(r, "graft-scheduler-invocation")
    t.setDaemon(true)
    t.start()
  }

  /** Task arguments for AQL tasks become `--params`: accepts the CLI's JSON
    * object form or `k=v,k2=v2` pairs (the reference forwards the rendered
    * string verbatim to `analyst run --params`, cmd/run.go:14-55).
    */
  def parseParams(args: String): Map[String, String] = {
    val s = args.trim
    if (s.isEmpty) Map.empty
    else if (s.startsWith("{")) {
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      import scala.jdk.CollectionConverters._
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    } else
      s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k.trim -> v.trim
          case Array(k)    => k.trim -> ""
        }
      }.toMap
  }

  /** Minimal POSIX shell word splitting (quotes + backslash), the role
    * shellquote.Split plays in the reference (scheduler.go:190-194).
    */
  def shellSplit(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inWord = false
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == '\'') {
        if (c == '\'') quote = 0 else cur.append(c)
      } else if (quote == '"') {
        if (c == '"') quote = 0
        else if (c == '\\' && i + 1 < s.length &&
          "\"\\$`".contains(s.charAt(i + 1))) { cur.append(s.charAt(i + 1)); i += 1 }
        else cur.append(c)
      } else c match {
        case '\'' | '"' => quote = c; inWord = true
        case '\\' if i + 1 < s.length => cur.append(s.charAt(i + 1)); i += 1; inWord = true
        case w if w.isWhitespace =>
          if (inWord) { out += cur.result(); cur.clear(); inWord = false }
        case other => cur.append(other); inWord = true
      }
      i += 1
    }
    if (quote != 0) throw new IllegalArgumentException("unterminated quote")
    if (inWord) out += cur.result()
    out.toSeq
  }
}
