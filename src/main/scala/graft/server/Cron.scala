package graft.server

import java.time.{Instant, LocalDateTime, ZoneId}

/** Cron schedule parser/evaluator compatible with the library the reference's
  * scheduler uses (robfig/cron v1, via reference http/models/task.go:31-43
  * `NextInvocation` → `cron.Parse`):
  *
  *   - 6 fields: seconds minutes hours day-of-month month day-of-week
  *     (a 5-field standard-cron spec is accepted and gets seconds=0);
  *   - `*` `?` `N` `N-M` lists `a,b,c` and steps `/s` per field; month and
  *     weekday names (JAN..DEC, SUN..SAT, case-insensitive); 0 or 7 = Sunday;
  *   - descriptors `@yearly|@annually @monthly @weekly @daily|@midnight
  *     @hourly` and `@every <goDuration>` (h/m/s/ms components, e.g. 1h30m);
  *   - day-of-month vs day-of-week: if both fields are restricted the match
  *     is OR, if either is `*`/`?` it is AND — standard cron semantics.
  *
  * `next(after)` returns the first trigger time strictly after `after`,
  * truncated to whole seconds, or fails if none exists within 5 years
  * (e.g. `0 0 0 30 2 *`).
  */
object Cron {

  sealed trait Schedule {
    def next(after: Instant): Instant
  }

  /** `@every d` — fires at fixed delay, second granularity. Matches the
    * reference library's constant schedule: next = floor-to-second(after)
    * + delay (it subtracts the sub-second remainder before adding), with
    * the delay floored at 1s — so strictly-after holds for any input.
    */
  final case class Every(delaySeconds: Long) extends Schedule {
    def next(after: Instant): Instant =
      after.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
        .plusSeconds(delaySeconds)
  }

  /** Field-spec schedule. Bitmasks index by the natural value of each unit
    * (seconds/minutes 0-59, hours 0-23, dom 1-31, month 1-12, dow 0-6).
    * `domStar`/`dowStar` record whether the field was `*`/`?` for the OR rule.
    */
  final case class Spec(
      seconds: Long, minutes: Long, hours: Long,
      dom: Long, month: Long, dow: Long,
      domStar: Boolean, dowStar: Boolean,
      zone: ZoneId) extends Schedule {

    private def bit(mask: Long, v: Int): Boolean = (mask & (1L << v)) != 0

    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = bit(dom, t.getDayOfMonth)
      val dowOk = bit(dow, t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 → SUN=0
      if (domStar || dowStar) domOk && dowOk else domOk || dowOk
    }

    def next(after: Instant): Instant = {
      // strictly-after + whole-second truncation, then advance field by
      // field from the largest unit down, wrapping back to the month scan
      // whenever a carry ripples upward (same shape as the reference
      // library's SpecSchedule.Next).
      var t = LocalDateTime.ofInstant(after, zone).withNano(0).plusSeconds(1)
      val limit = t.plusYears(5)
      var added = false // lower fields already zeroed once
      var done = false
      while (!done) {
        if (t.isAfter(limit))
          throw new IllegalArgumentException(
            s"cron spec matches no time in the next 5 years")
        var wrapped = false
        while (!bit(month, t.getMonthValue)) {
          if (!added) {
            added = true
            t = t.withDayOfMonth(1).withHour(0).withMinute(0).withSecond(0)
          }
          t = t.plusMonths(1)
        }
        while (!wrapped && !dayMatches(t)) {
          if (!added) { added = true; t = t.withHour(0).withMinute(0).withSecond(0) }
          t = t.plusDays(1)
          if (t.getDayOfMonth == 1) wrapped = true
        }
        while (!wrapped && !bit(hours, t.getHour)) {
          if (!added) { added = true; t = t.withMinute(0).withSecond(0) }
          t = t.plusHours(1)
          if (t.getHour == 0) wrapped = true
        }
        while (!wrapped && !bit(minutes, t.getMinute)) {
          if (!added) { added = true; t = t.withSecond(0) }
          t = t.plusMinutes(1)
          if (t.getMinute == 0) wrapped = true
        }
        while (!wrapped && !bit(seconds, t.getSecond)) {
          t = t.plusSeconds(1)
          if (t.getSecond == 0) wrapped = true
        }
        if (!wrapped) done = true
      }
      t.atZone(zone).toInstant
    }
  }

  private val monthNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")
  private val dowNames = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")

  def parse(spec: String, zone: ZoneId = ZoneId.systemDefault()): Schedule = {
    val s = spec.trim
    if (s.isEmpty) throw new IllegalArgumentException("empty cron spec")
    if (s.startsWith("@")) return parseDescriptor(s, zone)
    val fields0 = s.split("\\s+").toSeq
    val fields = fields0.size match {
      case 6 => fields0
      case 5 => "0" +: fields0 // standard cron → seconds pinned to 0
      case n => throw new IllegalArgumentException(
        s"expected 5 or 6 cron fields, got $n in '$spec'")
    }
    def f(expr: String, min: Int, max: Int, names: Seq[String], nameBase: Int)
        : (Long, Boolean) = parseField(expr, min, max, names, nameBase)
    val (sec, _)        = f(fields(0), 0, 59, Nil, 0)
    val (minute, _)     = f(fields(1), 0, 59, Nil, 0)
    val (hour, _)       = f(fields(2), 0, 23, Nil, 0)
    val (dm, domIsStar) = f(fields(3), 1, 31, Nil, 0)
    val (mo, _)         = f(fields(4), 1, 12, monthNames, 1)
    val (dw, dowIsStar) = f(fields(5), 0, 7, dowNames, 0)
    // 7 = Sunday alias → fold onto bit 0
    val dowMask = if ((dw & (1L << 7)) != 0) (dw & ~(1L << 7)) | 1L else dw
    Spec(sec, minute, hour, dm, mo, dowMask, domIsStar, dowIsStar, zone)
  }

  private def parseDescriptor(s: String, zone: ZoneId): Schedule =
    s.split("\\s+", 2).toSeq match {
      case Seq("@yearly") | Seq("@annually") => parse("0 0 0 1 1 *", zone)
      case Seq("@monthly")                   => parse("0 0 0 1 * *", zone)
      case Seq("@weekly")                    => parse("0 0 0 * * 0", zone)
      case Seq("@daily") | Seq("@midnight")  => parse("0 0 0 * * *", zone)
      case Seq("@hourly")                    => parse("0 0 * * * *", zone)
      case Seq("@every", dur)                => Every(parseGoDuration(dur))
      case _ => throw new IllegalArgumentException(s"unknown descriptor '$s'")
    }

  /** Go duration subset: sequences of <num><unit>, unit ∈ h m s ms; result
    * rounded up to whole seconds with a 1s floor (second-granularity timer).
    */
  private[graft] def parseGoDuration(d: String): Long = {
    val re = "([0-9]+(?:\\.[0-9]+)?)(h|ms|m|s)".r
    val parts = re.findAllMatchIn(d).toSeq
    val consumed = parts.map(_.matched).mkString
    if (parts.isEmpty || consumed != d.trim)
      throw new IllegalArgumentException(s"bad duration '$d'")
    val millis = parts.map { m =>
      val n = m.group(1).toDouble
      m.group(2) match {
        case "h"  => n * 3600000L
        case "m"  => n * 60000L
        case "s"  => n * 1000L
        case "ms" => n
      }
    }.sum
    math.max(1L, math.ceil(millis / 1000.0).toLong)
  }

  private def parseField(expr: String, min: Int, max: Int,
      names: Seq[String], nameBase: Int): (Long, Boolean) = {
    var mask = 0L
    var star = false
    expr.split(",").foreach { part =>
      val (rangePart, step) = part.split("/").toSeq match {
        case Seq(r)    => (r, 1)
        case Seq(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad field '$part'")
      }
      if (step < 1) throw new IllegalArgumentException(s"bad step in '$part'")
      def resolve(tok: String): Int = {
        val t = tok.trim.toLowerCase
        val byName = names.indexOf(t)
        if (byName >= 0) byName + nameBase
        else t.toInt
      }
      val (lo, hi) = rangePart.trim match {
        case "*" | "?" =>
          star = true
          (min, max)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-", 2)
          (resolve(a), resolve(b))
        case single =>
          val v = resolve(single)
          // "N/step" means N-max/step in cron; bare N is just N
          if (part.contains("/")) (v, max) else (v, v)
      }
      if (lo < min || hi > max || lo > hi)
        throw new IllegalArgumentException(
          s"field '$part' out of range [$min,$max]")
      var v = lo
      while (v <= hi) { mask |= (1L << v); v += step }
    }
    (mask, star)
  }
}
