package graft.kernels

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable business-day calendar for business-frequency conversion
  * (SURVEY §2.5). The reference's `is_business_day` is weekday-only
  * (`fame2pygen/fame2py_converter.py:401-402`); [[BusinessCalendar.WeekdaysOnly]]
  * reproduces it exactly and is the default everywhere, so parity behavior
  * is unchanged unless a caller opts into a holiday set.
  */
trait BusinessCalendar extends Serializable {
  /** Predicate over a `DateType` column: true iff the date is a business
    * day. Must be a plain Column expression (codegen'd per row — no join,
    * no UDF) so the calendar filter never adds a shuffle.
    */
  def isBusinessDay(d: Column): Column
}

object BusinessCalendar {

  /** Mon–Fri, no holidays — the reference's `is_business_day` semantics. */
  case object WeekdaysOnly extends BusinessCalendar {
    def isBusinessDay(d: Column): Column = !dayofweek(d).isin(1, 7)
  }

  /** Closed-form weekday count in the half-open interval (a, b] —
    * O(1) integer arithmetic per row, NO per-day explode (the naive
    * sequence-and-filter spelling is O(lag) rows per pair and 100×s a
    * fact-table scan). Derivation: with d(x) = days since the reference
    * Monday 1970-01-05, W(n) = weekdays among the first n days of a
    * Monday-started axis = 5·(n div 7) + min(n mod 7, 5); then
    * businessDaysBetween(a, b) = W(d(b)+1) − W(d(a)+1). Negative for
    * b < a by the same formula (antisymmetric), weekdays-only —
    * holiday calendars subtract a bounded IN-list count.
    */
  def businessDaysBetween(a: Column, b: Column): Column = {
    def w(dPlus1: Column): Column =
      lit(5) * floor(dPlus1 / 7).cast("long") +
        least(pmod(dPlus1, lit(7)), lit(5)).cast("long")
    val ref = to_date(lit("1970-01-05"))
    w(datediff(to_date(b), ref) + 1) - w(datediff(to_date(a), ref) + 1)
  }

  /** Mon–Fri minus an explicit holiday set. Holiday lists are small
    * (tens of dates per year), so they embed as an IN-list literal — the
    * predicate stays inside whole-stage codegen and broadcast-free at any
    * corpus size.
    */
  final case class WithHolidays(holidays: Set[LocalDate]) extends BusinessCalendar {
    def isBusinessDay(d: Column): Column = {
      val weekday = !dayofweek(d).isin(1, 7)
      if (holidays.isEmpty) weekday
      else weekday &&
        !to_date(d).isin(holidays.toSeq.sorted.map(java.sql.Date.valueOf): _*)
    }
  }
}
