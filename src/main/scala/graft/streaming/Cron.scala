package graft.streaming

import java.time.ZonedDateTime
import java.time.temporal.ChronoUnit

/** Minimal 5-field cron expressions (minute hour day-of-month month
  * day-of-week) — the reference's cron entry-point triggers
  * (`agent_runtime.py:382-516`). Supports `*`, lists `1,2,3`, ranges
  * `1-5`, and steps `*&#47;15`; next-fire computation for the
  * scheduler.
  */
object Cron {

  final case class Schedule(minute: Set[Int], hour: Set[Int], dayOfMonth: Set[Int],
      month: Set[Int], dayOfWeek: Set[Int]) {

    def matches(t: ZonedDateTime): Boolean =
      minute(t.getMinute) && hour(t.getHour) && dayOfMonth(t.getDayOfMonth) &&
        month(t.getMonthValue) && dayOfWeek(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday

    /** First matching minute strictly after `from` (bounded scan: cron
      * grids always fire within 366 days).
      */
    def nextAfter(from: ZonedDateTime): ZonedDateTime = {
      var t = from.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val limit = from.plusDays(366)
      while (!matches(t)) {
        t = t.plusMinutes(1)
        if (t.isAfter(limit)) throw new IllegalStateException("cron never fires")
      }
      t
    }
  }

  private def parseField(spec: String, min: Int, max: Int): Set[Int] = {
    def expand(part: String): Seq[Int] = {
      val (body, step) = part.split("/") match {
        case Array(b) => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
      }
      val range = body match {
        case "*" => min to max
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-").map(_.toInt); a to b
        case n => val v = n.toInt; v to v
      }
      range.filter(v => (v - range.head) % step == 0)
    }
    val values = spec.split(",").toSeq.flatMap(expand)
    require(values.forall(v => v >= min && v <= max),
      s"cron field '$spec' out of range [$min,$max]")
    values.toSet
  }

  def parse(expr: String): Schedule = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron needs 5 fields, got: '$expr'")
    Schedule(
      minute = parseField(fields(0), 0, 59),
      hour = parseField(fields(1), 0, 23),
      dayOfMonth = parseField(fields(2), 1, 31),
      month = parseField(fields(3), 1, 12),
      dayOfWeek = parseField(fields(4), 0, 6))
  }
}
