package graft

import graft.server.Cron
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Property tests for the cron engine: for arbitrary valid specs and
  * arbitrary start instants, `next` must (1) return a time strictly after
  * its input, (2) return a time whose fields MATCH the spec, (3) skip no
  * earlier matching second (verified against a brute-force
  * second-by-second scan over a bounded window), and (4) chain
  * monotonically. Same plain-scalacheck sampling as AqlPropertySpec
  * (fixed seeds — the scalatest bridge isn't in the offline cache).
  */
class CronPropertySpec extends AnyFunSuite {

  private val Cases = 120
  private val utc = ZoneOffset.UTC

  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until Cases).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val fieldGen: Int => Int => Gen[String] = min => max =>
    Gen.oneOf(
      Gen.const("*"),
      Gen.choose(min, max).map(_.toString),
      for { a <- Gen.choose(min, max - 1); b <- Gen.choose(a, max) }
        yield s"$a-$b",
      Gen.choose(2, 15).map(s => s"*/$s"),
      for { a <- Gen.choose(min, max); b <- Gen.choose(min, max) }
        yield s"$a,$b")

  // dom capped at 28 so every generated spec matches in every month
  private val specGen: Gen[String] = for {
    sec <- fieldGen(0)(59)
    min <- fieldGen(0)(59)
    hour <- fieldGen(0)(23)
    dom <- Gen.oneOf(Gen.const("*"), Gen.choose(1, 28).map(_.toString))
    dow <- Gen.oneOf(Gen.const("*"), Gen.choose(0, 6).map(_.toString))
  } yield s"$sec $min $hour $dom * $dow"

  private val instantGen: Gen[Instant] =
    Gen.choose(0L, 4102444800L). // 1970..2100
      map(Instant.ofEpochSecond(_, 123456789L))

  private def matches(spec: String, t: Instant): Boolean = {
    // independent field-by-field check (not via Cron internals)
    val d = LocalDateTime.ofInstant(t, utc)
    val fs = spec.split(" ")
    def ok(expr: String, v: Int, min: Int, max: Int): Boolean =
      expr.split(",").exists { part =>
        val (r, step) = part.split("/") match {
          case Array(a)    => (a, 1)
          case Array(a, s) => (a, s.toInt)
        }
        val (lo, hi) = r match {
          case "*" => (min, max)
          case x if x.contains("-") =>
            val Array(a, b) = x.split("-"); (a.toInt, b.toInt)
          case x => if (part.contains("/")) (x.toInt, max)
                    else (x.toInt, x.toInt)
        }
        v >= lo && v <= hi && (v - lo) % step == 0
      }
    val domR = fs(3); val dowR = fs(5)
    val domOk = ok(domR, d.getDayOfMonth, 1, 31)
    val dowOk = ok(dowR, d.getDayOfWeek.getValue % 7, 0, 7)
    val dayOk =
      if (domR == "*" || dowR == "*") domOk && dowOk else domOk || dowOk
    ok(fs(0), d.getSecond, 0, 59) && ok(fs(1), d.getMinute, 0, 59) &&
      ok(fs(2), d.getHour, 0, 23) && dayOk
  }

  test("next() is strictly after, matches the spec, and chains monotonically") {
    val cases = samples(for {
      s <- specGen; t <- instantGen
    } yield (s, t))
    assert(cases.nonEmpty)
    cases.foreach { case (spec, from) =>
      val sched = Cron.parse(spec, utc)
      val n1 = sched.next(from)
      assert(n1.isAfter(from), s"$spec from $from -> $n1 not after")
      assert(n1.getNano == 0, s"$spec -> $n1 has sub-second part")
      assert(matches(spec, n1), s"$spec from $from -> $n1 does not match")
      val n2 = sched.next(n1)
      assert(n2.isAfter(n1), s"$spec chain $n1 -> $n2 not increasing")
      assert(matches(spec, n2), s"$spec chain -> $n2 does not match")
    }
  }

  test("next() never skips an earlier matching second (brute-force window)") {
    // narrow specs with a dense match set so brute force stays cheap
    val cases = samples(for {
      sec <- fieldGen(0)(59)
      min <- fieldGen(0)(59)
      t <- instantGen
    } yield (s"$sec $min * * * *", t))
    cases.take(40).foreach { case (spec, from) =>
      val got = Cron.parse(spec, utc).next(from)
      var t = from.plusSeconds(1).truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
      if (from.getNano > 0) () // truncation above already rounds down; scan forward
      var found: Instant = null
      var i = 0
      while (found == null && i < 3700) { // one hour + slack covers any sec/min spec
        if (t.isAfter(from) && matches(spec, t)) found = t
        t = t.plusSeconds(1); i += 1
      }
      assert(found != null, s"brute force found no match for $spec")
      assert(got == found, s"$spec from $from: next=$got but first match=$found")
    }
  }

  test("5-field specs equal their 6-field zero-second form") {
    samples(for {
      min <- fieldGen(0)(59); hour <- fieldGen(0)(23); t <- instantGen
    } yield (min, hour, t)).take(60).foreach { case (min, hour, t) =>
      val five = Cron.parse(s"$min $hour * * *", utc)
      val six = Cron.parse(s"0 $min $hour * * *", utc)
      assert(five.next(t) == six.next(t))
    }
  }
}
