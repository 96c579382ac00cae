package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ast._
import graft.ast.FameExpr._
import graft.ast.FameStmt._
import graft.parse.FameParser

/** Parser unit tests — the reference's rung-1 suite re-expressed over our
  * AST (`tests/test_fame2pygen.py:6-95`, `tests/test_master_suite.py:95-634`).
  */
class ParserSpec extends AnyFunSuite {
  import FameParser.parseLine

  test("assign literal series") {
    assert(parseLine("vbot = 1") == Assign("VBOT", Num(1.0)))
  }

  test("simple arithmetic") {
    assert(parseLine("v1 = v2 + v3 - v4") ==
      Assign("V1", Bin("-", Bin("+", Ref("V2"), Ref("V3")), Ref("V4"))))
  }

  test("operator precedence") {
    assert(parseLine("x = a + b * c") ==
      Assign("X", Bin("+", Ref("A"), Bin("*", Ref("B"), Ref("C")))))
  }

  test("freq and date statements") {
    assert(parseLine("freq m") == SetFreq(Frequency.Monthly))
    assert(parseLine("freq q") == SetFreq(Frequency.Quarterly))
    assert(parseLine("date *") == ClearDate)
    assert(parseLine("date 2020-01-01 to 2020-12-31") ==
      SetDate(DateFilter(Some(LocalDate.of(2020, 1, 1)), Some(LocalDate.of(2020, 12, 31)))))
    assert(parseLine("date 01Jan2021 to *") ==
      SetDate(DateFilter(Some(LocalDate.of(2021, 1, 1)), None)))
  }

  test("scalar") {
    assert(parseLine("scalar x = 5 * 2") ==
      ScalarAssign("X", Bin("*", Num(5), Num(2))))
  }

  test("inline date filter via set <date a to b>") {
    val s = parseLine("set <date 2020-01-01 to 2020-06-30> v = v2 * 2")
    assert(s == Assign("V", Bin("*", Ref("V2"), Num(2)),
      Some(DateFilter(Some(LocalDate.of(2020, 1, 1)), Some(LocalDate.of(2020, 6, 30))))))
  }

  test("point-in-time forms (F4)") {
    assert(parseLine("""gdp["2020-01-01"] = 500""") ==
      PointInTime("GDP", LocalDate.of(2020, 1, 1), Num(500)))
    assert(parseLine("set a[12mar2020] = 33") ==
      PointInTime("A", LocalDate.of(2020, 3, 12), Num(33)))
    assert(parseLine("cpi[2020Q1] = 105.5") ==
      PointInTime("CPI", LocalDate.of(2020, 1, 1), Num(105.5)))
  }

  test("conditional with word comparisons") {
    assert(parseLine("result = if x gt 5 then y else z") ==
      Assign("RESULT", Cond(Bin("gt", Ref("X"), Num(5)), Ref("Y"), Ref("Z"))))
  }

  test("nested else-if and logic ops") {
    val s = parseLine("r = if a gt 1 and not (b lt 2) then 1 else if c eq 3 then 2 else nd")
    assert(s == Assign("R", Cond(
      Bin("and", Bin("gt", Ref("A"), Num(1)), Un("not", Bin("lt", Ref("B"), Num(2)))),
      Num(1),
      Cond(Bin("eq", Ref("C"), Num(3)), Num(2), Missing))))
  }

  test("lsum") {
    assert(parseLine("total = lsum(a, b, c)") ==
      Assign("TOTAL", Call("lsum", Seq(Ref("A"), Ref("B"), Ref("C")))))
  }

  test("time indexing") {
    assert(parseLine("x = v[t+1] - v[t-2]") ==
      Assign("X", Bin("-", TimeShift("V", 1), TimeShift("V", -2))))
    assert(parseLine("x = v[T]") == Assign("X", TimeShift("V", 0)))
  }

  test("dynamic lookup and date lookup") {
    assert(parseLine("x = v[somedate]") == Assign("X", DynLookup("V", "SOMEDATE")))
    assert(parseLine("""x = v["2020-03-01"]""") ==
      Assign("X", DateLookup("V", LocalDate.of(2020, 3, 1))))
  }

  test("shift-pct backward pattern (SURVEY §2.6)") {
    assert(parseLine("v1014s[t] = v1014s[t+1]/(1+(pct(v123s[t+1])/100))") ==
      ShiftPctAssign("V1014S", "V123S", 1))
    // the same self-referential pattern without [t] on the LHS
    // (tests/test_nlrx.py style) must classify too, not cycle
    assert(parseLine("v123s = v123s[t+1]/(1+(pct(v1014s[t+1])/100))") ==
      ShiftPctAssign("V123S", "V1014S", 1))
  }

  test("symbolic date bounds become open bounds (reference parity)") {
    assert(parseLine("date start to end") == SetDate(DateFilter(None, None)))
    val s = parseLine("set <date start-7 to end> b1 = 0")
    assert(s == Assign("B1", Num(0), Some(DateFilter(None, None))))
  }

  test("convert") {
    assert(parseLine("x = convert(v_monthly, q, discrete, average)") ==
      ConvertAssign("X", "V_MONTHLY", Frequency.Quarterly, "discrete", "average", None, None))
    assert(parseLine("vd = convert(vm, b, linear, end)") ==
      ConvertAssign("VD", "VM", Frequency.Business, "linear", "end", None, None))
  }

  test("convert as_freq/start_by (test_convert_grouping.py:95-116)") {
    // `*` as_freq and `off` start_by mean unset
    assert(parseLine("a2 = convert(a, b, disc, ave, *, off)") ==
      ConvertAssign("A2", "A", Frequency.Business, "discrete", "average", None, None))
    // explicit as_freq overrides the session source frequency
    assert(parseLine("x = convert(v, m, const, ave, q, off)") ==
      ConvertAssign("X", "V", Frequency.Monthly, "constant", "average",
        Some(Frequency.Quarterly), None))
    // start_by weekday anchors an un-anchored weekly target, same as w(fri)
    assert(parseLine("x = convert(v, w, disc, sum, *, fri)") ==
      ConvertAssign("X", "V", Frequency.Weekly(Some(5)), "discrete", "sum",
        None, Some("fri")))
    assert(parseLine("cc = convert(c, w(w), disc, ave)") ==
      ConvertAssign("CC", "C", Frequency.Weekly(Some(3)), "discrete", "average",
        None, None))
  }

  test("chain statement and inline") {
    assert(parseLine("""set x = $chain("a - b + c", "2020")""") ==
      ChainAssign("X", Seq((1, "A"), (-1, "B"), (1, "C")), 2020))
    assert(parseLine("""y = 2 * $chain("a", "2019")""") ==
      Assign("Y", Bin("*", Num(2), ChainCall(Seq((1, "A")), 2019))))
  }

  test("fishvol") {
    assert(parseLine("x = fishvol_rebase({v1,v2},{p1,p2},2020)") ==
      FishvolAssign("X", Seq("V1", "V2"), Seq("P1", "P2"), 2020))
  }

  test("nlrx drops extra params (tests/test_nlrx.py:333-338)") {
    assert(parseLine("a_t = nlrx(lambda20, a, b1, b2, b3, b4, c, d, extra1)") ==
      NlrxAssign("A_T", Ref("LAMBDA20"),
        Seq("A", "B1", "B2", "B3", "B4", "C", "D")))
  }

  test("list alias") {
    assert(parseLine("v27 = {a, b, c}") == ListAlias("V27", Seq("A", "B", "C")))
  }

  test("local db names (F9)") {
    assert(parseLine("aa'abc = 5") ==
      Assign("AA_ABC", Num(5), localDb = Some("AA")))
    assert(parseLine("work'x = 5") == Assign("X", Num(5)))
  }

  test("name normalization: $, quote, dots (tests/test_new_features.py:63-84)") {
    assert(FameParser.colName("v$x.y") == "V_X.Y")
    assert(parseLine("a.b = 1") == Assign("A.B", Num(1)))
  }

  test("FAME date formats (SURVEY §2.4 goldens)") {
    def p(s: String) = FameDate.parse(s).get
    assert(p("2020-01-15") == LocalDate.of(2020, 1, 15))
    assert(p("2020Q3") == LocalDate.of(2020, 7, 1))
    assert(p("12jul1985") == LocalDate.of(1985, 7, 12))
    assert(p("2020") == LocalDate.of(2020, 1, 1))
    assert(p("2020m03") == LocalDate.of(2020, 3, 1))
    assert(p("jan2020") == LocalDate.of(2020, 1, 1))
    assert(p("2020.05") == LocalDate.of(2020, 1, 29)) // Jan1 + 7*(w-1)
  }

  test("weekly literals: ISO-8601 mode vs reference approximation") {
    def p(s: String) = FameDate.parse(s).get
    def iso(s: String) =
      FameDate.withIsoWeeks(true)(FameDate.parse(s)).get
    // 2020 week 1 starts Mon 2019-12-30, so ISO week 5 = Mon Jan 27
    assert(iso("2020.05") == LocalDate.of(2020, 1, 27))
    assert(p("2020.05") == LocalDate.of(2020, 1, 29))
    // Jan 1 2021 is a Friday in ISO week 53 OF 2020; week-based-year
    // 2021 starts Mon Jan 4 — the case the approximation can't express
    assert(iso("2021.01") == LocalDate.of(2021, 1, 4))
    assert(p("2021.01") == LocalDate.of(2021, 1, 1))
    // ISO week 1 of 2015 starts in the PREVIOUS calendar year
    assert(iso("2015.01") == LocalDate.of(2014, 12, 29))
    assert(p("2015.01") == LocalDate.of(2015, 1, 1))
    // ISO mode results always land on Mondays; default stays off
    assert(iso("1999.26").getDayOfWeek == java.time.DayOfWeek.MONDAY)
    assert(FameDate.parse("2020.05").get == LocalDate.of(2020, 1, 29))
  }

  test("splitLines: comments strip per newline BEFORE ';' statement " +
      "splits (r17 adversarial-corpus find)") {
    import graft.parse.FameParser
    // a ';' INSIDE a comment line used to produce a bogus statement
    // fragment with no comment marker
    assert(FameParser.splitLines(
      "# intro; still the same comment\nfreq m\nv = rev + 1") ==
      Seq("freq m", "v = rev + 1"))
    assert(FameParser.splitLines(
      "! bang; comment too\na = 1; b = 2 -- trailer\n# x; y") ==
      Seq("a = 1", "b = 2"))
    // a fragment after ';' that itself starts a comment is dropped
    assert(FameParser.splitLines("a = 1; # trailing note") ==
      Seq("a = 1"))
    // r18: '--' strips per PHYSICAL line BEFORE the ';' split — a ';'
    // inside the trailing comment is comment text, not a statement
    assert(FameParser.splitLines("x = 1 -- a; b") == Seq("x = 1"))
    assert(FameParser.splitLines("x = 1; y = 2 -- note; z = 3\nw = 4") ==
      Seq("x = 1", "y = 2", "w = 4"))
  }
}
