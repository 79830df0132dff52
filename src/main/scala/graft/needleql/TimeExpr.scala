package graft.needleql

/** Natural-language time expressions for AS OF clauses (SURVEY.md §2.9;
  * reference: src/persistence/time_travel.rs:129-360). Grammar:
  *   - named: now | yesterday | last week|month|year | today | start of day
  *     | this week | start of week | this month | start of month
  *     | this year | start of year
  *   - "<n> <unit>[s] ago" / "in <n> <unit>[s]" / bare "<unit> ago"
  *     (units second..year; month = 30 d, year = 365 d, like the reference)
  *   - "last <day-of-week>" (start of that day; epoch-Thursday arithmetic)
  *   - bare Unix timestamp
  *   - "snapshot:<name>" / "@<name>" — resolved against the session's
  *     snapshot registry, not to a timestamp
  */
object TimeExpr {

  sealed trait Parsed
  final case class Timestamp(ts: Long) extends Parsed
  final case class RelativeSeconds(offset: Long) extends Parsed
  final case class Named(name: String) extends Parsed
  final case class LastDayOfWeek(dow: Long) extends Parsed // 0 = Sunday
  final case class AtSnapshot(name: String) extends Parsed

  private val unitSeconds = Map(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L,
    "week" -> 604800L, "month" -> 2592000L, "year" -> 31536000L)

  private val dows = Map(
    "sunday" -> 0L, "sun" -> 0L, "monday" -> 1L, "mon" -> 1L,
    "tuesday" -> 2L, "tue" -> 2L, "tues" -> 2L, "wednesday" -> 3L,
    "wed" -> 3L, "thursday" -> 4L, "thu" -> 4L, "thur" -> 4L,
    "thurs" -> 4L, "friday" -> 5L, "fri" -> 5L, "saturday" -> 6L,
    "sat" -> 6L)

  private val namedSet = Set("now", "yesterday", "last week", "last month",
    "last year", "today", "start of day", "this week", "start of week",
    "this month", "start of month", "this year", "start of year")

  private def parseDuration(s: String): Option[Long] = {
    val parts = s.trim.split("\\s+")
    if (parts.length < 2) unitSeconds.get(s.trim)
    else for {
      n <- parts(0).toLongOption
      m <- unitSeconds.get(parts(1).stripSuffix("s"))
    } yield n * m
  }

  def parse(input: String): Parsed = {
    val in = input.trim.toLowerCase(java.util.Locale.ROOT)
    if (namedSet(in)) Named(in)
    else if (in.endsWith(" ago") && parseDuration(in.stripSuffix(" ago")).isDefined)
      RelativeSeconds(-parseDuration(in.stripSuffix(" ago")).get)
    else if (in.startsWith("last ") && dows.contains(in.stripPrefix("last ").trim))
      LastDayOfWeek(dows(in.stripPrefix("last ").trim))
    else if (in.startsWith("in ") && parseDuration(in.stripPrefix("in ")).isDefined)
      RelativeSeconds(parseDuration(in.stripPrefix("in ")).get)
    else if (in.toLongOption.isDefined) Timestamp(in.toLong)
    else if (in.startsWith("snapshot:")) AtSnapshot(input.trim.substring("snapshot:".length))
    else if (in.startsWith("@")) AtSnapshot(input.trim.stripPrefix("@"))
    else throw Parser.ParseError(s"Could not parse time expression: '$input'")
  }

  /** Resolve to a Unix timestamp (AtSnapshot has no timestamp — callers
    * route it to the snapshot registry first).
    */
  def resolve(p: Parsed, now: Long): Long = p match {
    case Timestamp(ts)       => ts
    case RelativeSeconds(o)  => if (o >= 0) now + o else math.max(0L, now + o)
    case Named(n) => n match {
      case "now"                        => now
      case "yesterday"                  => now - 86400
      case "last week"                  => now - 604800
      case "last month"                 => now - 2592000
      case "last year"                  => now - 31536000
      case "today" | "start of day"     => now - (now % 86400)
      case "this week" | "start of week" =>
        val dow = (now / 86400 + 4) % 7 // Unix epoch was a Thursday
        now - (now % 86400) - dow * 86400
      case "this month" | "start of month" => now - (now % 2592000)
      case _                               => now - (now % 31536000)
    }
    case LastDayOfWeek(target) =>
      val cur = (now / 86400 + 4) % 7
      val back0 = if (cur >= target) cur - target else 7 - (target - cur)
      val back = if (back0 == 0) 7 else back0
      val t = now - back * 86400
      t - (t % 86400)
    case AtSnapshot(n) =>
      throw Parser.ParseError(s"Snapshot reference '$n' has no timestamp")
  }
}
