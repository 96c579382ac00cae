package graft.ast

import java.time.LocalDate

/** Frequency of the active FAME session / of a series calendar.
  *
  * Mirrors the reference's canonical frequency table
  * (`fame2pygen/formulas_generator.py:58-93`): daily, business-daily,
  * weekly (optionally anchored to a weekday), monthly, quarterly, annual.
  */
sealed abstract class Frequency(val suffix: String)
object Frequency {
  case object Daily     extends Frequency("_DD")
  case object Business  extends Frequency("_BUSD")
  /** anchor: 1=Mon .. 7=Sun (ISO); None = week starting Monday. */
  final case class Weekly(anchor: Option[Int]) extends Frequency("_WK")
  case object Monthly   extends Frequency("_MON")
  case object Quarterly extends Frequency("_QTRLY")
  case object Annual    extends Frequency("_ANN")

  // weekday aliases incl. the reference's single/double-letter forms
  // (`formulas_generator.py:85-93`); exposed so `start_by` day arguments
  // (`formulas_generator.py:213-217`) resolve with the same table
  val weekdays = Map(
    "m" -> 1, "mon" -> 1, "monday" -> 1,
    "tu" -> 2, "tue" -> 2, "tues" -> 2, "tuesday" -> 2,
    "w" -> 3, "wed" -> 3, "wednesday" -> 3,
    "th" -> 4, "thu" -> 4, "thur" -> 4, "thurs" -> 4, "thursday" -> 4,
    "f" -> 5, "fri" -> 5, "friday" -> 5,
    "sa" -> 6, "sat" -> 6, "saturday" -> 6,
    "su" -> 7, "sun" -> 7, "sunday" -> 7)

  /** Parse a FAME frequency token incl. aliases
    * (`fame2pygen/formulas_generator.py:68-93`): d/daily, b/bus/business,
    * w/weekly/w(wed), m/monthly, q/quarterly, a/y/annual/yearly.
    */
  def parse(tok0: String): Option[Frequency] = {
    val tok = tok0.trim.toLowerCase
    val wk = """w(?:eekly)?\s*\(\s*([a-z]+)\s*\)""".r
    tok match {
      case "d" | "daily" | "1d"              => Some(Daily)
      case "b" | "bus" | "business" | "busd" => Some(Business)
      case "w" | "weekly" | "1w"             => Some(Weekly(None))
      case wk(day)                           => Some(Weekly(weekdays.get(day)))
      case "m" | "monthly" | "mon" | "1mo"   => Some(Monthly)
      case "q" | "quarterly" | "qtrly" | "1q"=> Some(Quarterly)
      case "a" | "y" | "annual" | "yearly" | "ann" | "1y" => Some(Annual)
      case _ => None
    }
  }

  /** Rank by period length (shorter period = finer = smaller rank). */
  def rank(f: Frequency): Int = f match {
    case Daily      => 0
    case Business   => 0
    case Weekly(_)  => 1
    case Monthly    => 2
    case Quarterly  => 3
    case Annual     => 4
  }
}

/** FAME date-literal parsing — the 7 formats of SURVEY §2.4
  * (`fame2pygen/formulas_generator.py:312-380`):
  * ISO `2020-01-31`; quarterly `2020Q3` → first day of quarter;
  * `12jul1985` → day-month-year; bare year `2020` → Jan 1;
  * `2020m03` → first of month; `jan2020` → first of month;
  * weekly `2020.05` → Jan 1 + 7*(w-1) days (reference-compatible
  * approximation; real ISO weeks behind [[withIsoWeeks]]).
  */
object FameDate {
  private val months = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val iso      = """(\d{4})-(\d{1,2})-(\d{1,2})""".r
  private val quarter  = """(\d{4})[qQ]([1-4])""".r
  private val dmy      = """(\d{1,2})([a-zA-Z]{3})(\d{4})""".r
  private val year     = """(\d{4})""".r
  private val ym       = """(\d{4})[mM](\d{1,2})""".r
  private val my       = """([a-zA-Z]{3})(\d{4})""".r
  private val weekly   = """(\d{4})\.(\d{1,2})""".r

  /** ISO-8601 week-date mode for the weekly literal `yyyy.ww`: ON makes
    * `2020.05` the Monday of ISO week 5 of week-based-year 2020; OFF
    * (default) keeps the reference's approximate Jan-1 + 7·(w−1)
    * arithmetic. Dynamically scoped (parsing is a synchronous
    * driver-thread phase), set via [[withIsoWeeks]] — the
    * `FameSession.run(isoWeeks = …)` plumbing.
    */
  private val isoWeeks = new scala.util.DynamicVariable[Boolean](false)
  def withIsoWeeks[A](on: Boolean)(body: => A): A =
    isoWeeks.withValue(on)(body)

  private def weekDate(y: Int, w: Int): LocalDate =
    if (isoWeeks.value)
      // Jan 4 is in ISO week 1 of every week-based year; set the week,
      // then snap to that week's Monday
      LocalDate.of(y, 1, 4)
        .`with`(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear(),
          w.toLong)
        .`with`(java.time.temporal.ChronoField.DAY_OF_WEEK, 1L)
    else LocalDate.of(y, 1, 1).plusDays(7L * (w - 1))

  def parse(raw0: String): Option[LocalDate] = {
    val raw = raw0.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim
    raw match {
      case iso(y, m, d)    => Some(LocalDate.of(y.toInt, m.toInt, d.toInt))
      case quarter(y, q)   => Some(LocalDate.of(y.toInt, (q.toInt - 1) * 3 + 1, 1))
      case ym(y, m)        => Some(LocalDate.of(y.toInt, m.toInt, 1))
      case weekly(y, w)    => Some(weekDate(y.toInt, w.toInt))
      case dmy(d, mon, y)  => months.get(mon.toLowerCase).map(m => LocalDate.of(y.toInt, m, d.toInt))
      case my(mon, y)      => months.get(mon.toLowerCase).map(m => LocalDate.of(y.toInt, m, 1))
      case year(y)         => Some(LocalDate.of(y.toInt, 1, 1))
      case _               => None
    }
  }
}

/** Expression AST — a real tree, unlike the reference's string-rewriting IR
  * (`fame2pygen/formulas_generator.py:714-917`, deliberately not copied;
  * SURVEY §3.4).
  */
sealed trait FameExpr
object FameExpr {
  /** numeric literal */
  final case class Num(v: Double) extends FameExpr
  /** string literal (date strings, function parameters) */
  final case class Str(s: String) extends FameExpr
  /** bare series reference `v2` → column V2 */
  final case class Ref(name: String) extends FameExpr
  /** the FAME time variable `T` → the DATE column */
  case object TimeVar extends FameExpr
  /** FAME nd/na/nc — all collapse to SQL NULL (SURVEY §1.2) */
  case object Missing extends FameExpr
  /** `v[t+k]` (k>0: lead) / `v[t-k]` (lag) */
  final case class TimeShift(series: String, offset: Int) extends FameExpr
  /** `v[someScalar]` — value of series at the date held in a scalar */
  final case class DynLookup(series: String, scalar: String) extends FameExpr
  /** `v["2020-01-01"]` with a literal date — lookup at a fixed date */
  final case class DateLookup(series: String, date: LocalDate) extends FameExpr
  /** binary op: + - * / and gt lt ge le eq ne and or */
  final case class Bin(op: String, l: FameExpr, r: FameExpr) extends FameExpr
  final case class Un(op: String, e: FameExpr) extends FameExpr // "not", "-"
  /** function call: pct, diff, sqrt, abs, log, exp, ave, lsum, exists,
    * firstvalue, lastvalue, min, max, dateof, make, … */
  final case class Call(name: String, args: Seq[FameExpr]) extends FameExpr
  /** if c then a else b (nested else-if allowed) */
  final case class Cond(c: FameExpr, t: FameExpr, e: FameExpr) extends FameExpr
  /** inline `$chain("a - b + c", "year")` */
  final case class ChainCall(terms: Seq[(Int, String)], baseYear: Int) extends FameExpr

  /** Collect the series names an expression references (for the DAG). */
  def refs(e: FameExpr): Set[String] = e match {
    case Ref(n)           => Set(n)
    case TimeShift(n, _)  => Set(n)
    case DynLookup(n, s)  => Set(n, s)
    case DateLookup(n, _) => Set(n)
    case Bin(_, l, r)     => refs(l) ++ refs(r)
    case Un(_, x)         => refs(x)
    // make(date(m), "...")'s arguments are frequency tokens and date
    // literals, never series — treating them as refs would fabricate
    // dependencies and defeat the dateof-over-literal fast path
    case Call("make", _)  => Set.empty
    case Call(_, as)      => as.flatMap(refs).toSet
    case Cond(c, t, el)   => refs(c) ++ refs(t) ++ refs(el)
    case ChainCall(terms, _) =>
      terms.flatMap { case (_, q) => Seq(q.toUpperCase, "P" + q.toUpperCase) }.toSet
    case _                => Set.empty
  }
}

/** One end of a `date A to B` range; `*` = open. */
final case class DateBound(date: Option[LocalDate]) // None = '*'

/** The active date mask threaded through statements (SURVEY §2.2). */
final case class DateFilter(start: Option[LocalDate], end: Option[LocalDate])

/** Statement AST — the 17 parse types of SURVEY §2.1. */
sealed trait FameStmt
object FameStmt {
  import FameExpr._

  /** `freq m` */
  final case class SetFreq(f: Frequency) extends FameStmt
  /** `date A to B`; `date *` = ClearDate */
  final case class SetDate(filter: DateFilter) extends FameStmt
  case object ClearDate extends FameStmt
  /** `target = expr` (covers assign_series, simple, conditional, lsum…).
    * inlineFilter: the `set <date A to B> v = e` one-shot mask.
    * localDb: Some("AA") when target was `aa'abc`.
    */
  final case class Assign(target: String, expr: FameExpr,
      inlineFilter: Option[DateFilter] = None,
      localDb: Option[String] = None) extends FameStmt
  /** `scalar x = expr` or bare `lambda20 = 20` promoted by the binder */
  final case class ScalarAssign(name: String, expr: FameExpr) extends FameStmt
  /** `gdp["2020-01-01"] = expr` */
  final case class PointInTime(target: String, date: LocalDate, expr: FameExpr)
      extends FameStmt
  /** `v27 = {a, b, c}` */
  final case class ListAlias(name: String, members: Seq[String]) extends FameStmt
  /** `x = convert(src, freq, technique, observed[, asFreq[, startBy]])` —
    * `asFreq` (5th arg, `*` = unset) overrides the session frequency as the
    * SOURCE frequency; `startBy` (6th arg, `off` = unset, or implied by a
    * `w(wed)`-style target) anchors the weekly calendar
    * (`fame2pygen/formulas_generator.py:184-187,207-217`).
    */
  final case class ConvertAssign(target: String, source: String, freq: Frequency,
      technique: String, observed: String, asFreq: Option[Frequency],
      startBy: Option[String]) extends FameStmt
  /** `set x = $chain("a - b + c", "2020")` at statement level */
  final case class ChainAssign(target: String, terms: Seq[(Int, String)],
      baseYear: Int) extends FameStmt
  /** `x = fishvol_rebase({v1,v2},{p1,p2},2020)` */
  final case class FishvolAssign(target: String, volumes: Seq[String],
      prices: Seq[String], baseYear: Int) extends FameStmt
  /** `a_t = nlrx(lambda, y, w1, w2, w3, w4, gss, gpr)` */
  final case class NlrxAssign(target: String, lambdaRef: FameExpr,
      args: Seq[String]) extends FameStmt
  /** `v[t] = v[t+1] / (1 + (pct(p[t+1]) / 100))` — shift-pct back-cast */
  final case class ShiftPctAssign(target: String, pctSeries: String, k: Int)
      extends FameStmt
}
