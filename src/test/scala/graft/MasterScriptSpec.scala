package graft

import graft.api.FameSession

/** End-to-end run of a master scenario script consolidating every supported
  * construct (the analogue of the reference's consolidated scenario corpus,
  * `fame_script_master.inp`) with hand-computed expectations.
  */
class MasterScriptSpec extends SparkSpec {

  private val months =
    (0 until 24).map(i => f"${2020 + i / 12}%04d-${i % 12 + 1}%02d-01")

  test("master scenario script end-to-end") {
    val in = frame(months, "A" -> (1 to 24).map(_.toDouble))
    val sf = FameSession.run(
      """freq m
        |v_base = 100
        |date 2020-01-01 to 2020-12-31
        |v_2020 = v_base * 2
        |date 2021-01-01 to *
        |v_2021 = v_base * 3
        |date *
        |v_all = lsum(v_2020, v_2021)
        |s1 = a[t+1] - a[t-1]
        |p1 = pct(a)
        |d1 = diff(a, 2)
        |c1 = if t ge "2021-01-01" and a gt 2 then a else nd
        |c2 = if exists(c1) then 1 else 0
        |scalar mu = ave(a)
        |dev = a - mu
        |scalar anchor = make(date(m), "2020-03-01")
        |lk = a[anchor]
        |g = a
        |g[2020-02-01] = 99
        |g[2020Q2] = 77
        |set g[01mar2020] = 55
        |aq = convert(a, 'q', 'disc', 'ave')
        |dl = dateof(c1, *, CONTAIN, END)
        |dm = dateof(make(date(m), "2020-06-01"), *, contain, end)
        |mm = min(a, 12)
        |mx = max(a, 12)
        |db1'x = a * 2
        |grp = {a, g}""".stripMargin, in)
    val out = sf.df

    def d(i: Int) = Some((i + 1).toDouble)
    assertSeq(column(out, "V_BASE"), Seq.fill(24)(Some(100.0)))
    assertSeq(column(out, "V_2020"),
      (0 until 24).map(i => if (i < 12) Some(200.0) else None))
    assertSeq(column(out, "V_2021"),
      (0 until 24).map(i => if (i >= 12) Some(300.0) else None))
    assertSeq(column(out, "V_ALL"),
      (0 until 24).map(i => Some(if (i < 12) 200.0 else 300.0)))
    assertSeq(column(out, "S1"),
      (0 until 24).map(i => if (i == 0 || i == 23) None else Some(2.0)))
    assertSeq(column(out, "P1"),
      (0 until 24).map(i => if (i == 0) None else Some(100.0 / i)))
    assertSeq(column(out, "D1"),
      (0 until 24).map(i => if (i < 2) None else Some(2.0)))
    assertSeq(column(out, "C1"),
      (0 until 24).map(i => if (i >= 12) d(i) else None))
    assertSeq(column(out, "C2"),
      (0 until 24).map(i => Some(if (i >= 12) 1.0 else 0.0)))
    assertSeq(column(out, "DEV"), (0 until 24).map(i => Some(i + 1 - 12.5)))
    assertSeq(column(out, "LK"), Seq.fill(24)(Some(3.0)))
    assertSeq(column(out, "G"), (0 until 24).map {
      case 1 => Some(99.0); case 2 => Some(55.0); case 3 => Some(77.0)
      case i => d(i)
    })
    // quarterly averages land on quarter-start rows only
    assertSeq(column(out, "A_QTRLY"), (0 until 24).map { i =>
      if (i % 3 == 0) Some(i + 2.0) else None
    })
    // dateof over the masked series / over a literal
    val dl = out.orderBy("DATE").select("DL").collect()
    assert(dl.forall(_.getDate(0).toString == "2021-12-01"))
    val dm = out.orderBy("DATE").select("DM").collect()
    assert(dm.forall(_.getDate(0).toString == "2020-06-01"))
    assertSeq(column(out, "MM"), (1 to 24).map(a => Some(math.min(a, 12).toDouble)))
    assertSeq(column(out, "MX"), (1 to 24).map(a => Some(math.max(a, 12).toDouble)))
    // local database projection
    assert(sf.localDbs.keySet == Set("DB1"))
    assert(sf.localDbs("DB1").columns.toSeq == Seq("DATE", "X"))
    assertSeq(column(sf.localDbs("DB1"), "X"), (1 to 24).map(a => Some(a * 2.0)))
  }

  test("runFile executes a .inp script with # comments") {
    val f = tmpFile("graft", ".inp")
    java.nio.file.Files.writeString(f,
      """# scenario file
        |freq m
        |z = x + y  -- trailing comment
        |! another comment style
        |w = z * 2""".stripMargin)
    val in = frame(Seq("2020-01-01"), "X" -> Seq(10), "Y" -> Seq(20))
    val out = FameSession.runFile(f.toString, in).df
    assertSeq(column(out, "Z"), Seq(Some(30.0)))
    assertSeq(column(out, "W"), Seq(Some(60.0)))
  }

  test("convert round-trip: up(constant) then down(last) is identity") {
    import graft.ast.Frequency
    import graft.kernels.Convert
    import org.apache.spark.sql.functions.col
    val in = frame(
      Seq("2020-01-01", "2020-04-01", "2020-07-01", "2020-10-01"),
      "V" -> Seq(10, 20, 30, 40))
    val up = Convert.up(in, "DATE", Seq("V"),
      Frequency.Quarterly, Frequency.Monthly, "constant")
    assert(up.count() == 12) // full quarters of monthly rows
    val down = Convert.down(up, "DATE", Seq("V"),
      Frequency.Monthly, Frequency.Quarterly, "last")
    val got = down.orderBy("DATE").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1))).toSeq
    assert(got == Seq("2020-01-01" -> 10.0, "2020-04-01" -> 20.0,
      "2020-07-01" -> 30.0, "2020-10-01" -> 40.0))
  }

  test("the reference's full consolidated scenario corpus parses") {
    // parse-coverage over the reference's own master .inp (144 lines of
    // every construct its tests exercise); skipped when the reference
    // tree isn't mounted
    val p = java.nio.file.Paths.get("/root/reference/fame_script_master.inp")
    assume(java.nio.file.Files.exists(p))
    val script = java.nio.file.Files.readString(p)
    val stmts = graft.parse.FameParser.parseScript(script)
    assert(stmts.size > 100, s"only ${stmts.size} statements parsed")
  }

  test("quoted convert args and alias normalization parse") {
    import graft.ast.FameStmt._
    import graft.ast.Frequency
    assert(FameParserHelpers.parse("set v23 = convert(v24, 'Q', 'disc', 'AVG', 'END')") ==
      ConvertAssign("V23", "V24", Frequency.Quarterly, "discrete", "average", None, None))
    assert(FameParserHelpers.parse("b2 = convert(temp, bus, disc, ave)") ==
      ConvertAssign("B2", "TEMP", Frequency.Business, "discrete", "average", None, None))
  }
}

private object FameParserHelpers {
  def parse(line: String) = graft.parse.FameParser.parseLine(line)
}
