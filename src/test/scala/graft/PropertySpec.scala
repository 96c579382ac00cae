package graft

import java.time.LocalDate

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ast.{FameDate, FameExpr, FameStmt}
import graft.parse.FameParser
import graft.plan.Scheduler

/** Property-based tests for the plan-time machinery (pure Scala — fast).
  * Uses a deterministic sampler over ScalaCheck generators (the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xC0FFEE + i), retries = 100))
    }

  private val genDate: Gen[LocalDate] = for {
    y <- Gen.choose(1950, 2050)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield LocalDate.of(y, m, d)

  test("FameDate: ISO strings round-trip") {
    forAllN(genDate) { d =>
      assert(FameDate.parse(d.toString).contains(d))
    }
  }

  test("FameDate: ddMMMyyyy round-trips") {
    val mon = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    forAllN(genDate) { d =>
      val s = f"${d.getDayOfMonth}%02d${mon(d.getMonthValue - 1)}${d.getYear}%04d"
      assert(FameDate.parse(s).contains(d))
    }
  }

  test("FameDate: quarterly/monthly formats map to period starts") {
    forAllN(Gen.zip(Gen.choose(1900, 2100), Gen.choose(1, 4))) { case (y, q) =>
      assert(FameDate.parse(s"${y}Q$q").contains(LocalDate.of(y, (q - 1) * 3 + 1, 1)))
    }
    forAllN(Gen.zip(Gen.choose(1900, 2100), Gen.choose(1, 12))) { case (y, m) =>
      assert(FameDate.parse(f"${y}m$m%02d").contains(LocalDate.of(y, m, 1)))
    }
  }

  test("parser: arithmetic expressions evaluate with correct precedence") {
    val env = Map("A" -> 3.0, "B" -> 5.0, "C" -> 7.0, "D" -> 11.0)
    def eval(e: FameExpr): Double = e match {
      case FameExpr.Num(v) => v
      case FameExpr.Ref(n) => env(n)
      case FameExpr.Bin("+", l, r) => eval(l) + eval(r)
      case FameExpr.Bin("-", l, r) => eval(l) - eval(r)
      case FameExpr.Bin("*", l, r) => eval(l) * eval(r)
      case FameExpr.Bin("/", l, r) => eval(l) / eval(r)
      case FameExpr.Un("-", x) => -eval(x)
      case other => fail(s"unexpected $other")
    }
    // independent reference evaluator: precedence climbing over the raw
    // string, so the property genuinely cross-checks the parser
    def refEval(src: String): Double = {
      val toks = src.replace("(", " ( ").replace(")", " ) ")
        .trim.split("\\s+").toList
      var rest = toks
      def primary(): Double = rest match {
        case "(" :: tl => rest = tl; val v = addSub(); rest = rest.tail; v
        case t :: tl   => rest = tl
          if (t.head.isDigit) t.toDouble else env(t.toUpperCase)
        case Nil => fail("empty")
      }
      def mul(): Double = {
        var v = primary()
        while (rest.headOption.contains("*")) { rest = rest.tail; v *= primary() }
        v
      }
      def addSub(): Double = {
        var v = mul()
        var go = true
        while (go) rest.headOption match {
          case Some("+") => rest = rest.tail; v += mul()
          case Some("-") => rest = rest.tail; v -= mul()
          case _ => go = false
        }
        v
      }
      addSub()
    }
    val genLeaf: Gen[String] = Gen.oneOf(
      Gen.oneOf("a", "b", "c", "d"), Gen.choose(1, 9).map(_.toString))
    def genExpr(depth: Int): Gen[String] =
      if (depth == 0) genLeaf
      else for {
        ls <- genExpr(depth - 1)
        rs <- genExpr(depth - 1)
        op <- Gen.oneOf("+", "-", "*")
        paren <- Gen.oneOf(true, false)
      } yield if (paren) s"($ls $op $rs)" else s"$ls $op $rs"
    forAllN(genExpr(3)) { src =>
      FameParser.parseLine(s"x = $src") match {
        case FameStmt.Assign(_, e, _, _) =>
          assert(math.abs(eval(e) - refEval(src)) < 1e-9, s"src=$src")
        case other => fail(s"parsed $other")
      }
    }
  }

  test("scheduler: every reader runs at a later level than its writer") {
    val gen: Gen[Seq[Set[Int]]] = for {
      n <- Gen.choose(2, 12)
      sets <- Gen.sequence[Seq[Set[Int]], Set[Int]](
        (0 until n).map(i =>
          if (i == 0) Gen.const(Set.empty[Int])
          else Gen.someOf(0 until i).map(_.toSet)))
    } yield sets
    forAllN(gen, n = 60) { readSets =>
      val script = readSets.indices.map { i =>
        val rhs = if (readSets(i).isEmpty) "1"
          else readSets(i).map(j => s"t$j").mkString(" + ")
        s"t$i = $rhs"
      }.mkString("\n")
      val stmts = FameParser.parseScript(script)
      val bounds = Scheduler.bind(stmts, Set.empty)
      val levels = Scheduler.levels(bounds, Set.empty)
      val levelOf = levels.zipWithIndex.flatMap { case (lvl, li) =>
        lvl.flatMap(_.target.map(_ -> li))
      }.toMap
      readSets.indices.foreach { i =>
        readSets(i).foreach { j =>
          assert(levelOf(s"T$j") < levelOf(s"T$i"),
            s"t$j must be scheduled before t$i")
        }
      }
    }
  }

  test("scheduler: cycles always error") {
    forAllN(Gen.choose(2, 6), n = 5) { n =>
      val script = (0 until n).map(i => s"c$i = c${(i + 1) % n} + 1").mkString("\n")
      val stmts = FameParser.parseScript(script)
      intercept[Scheduler.CycleError] {
        Scheduler.levels(Scheduler.bind(stmts, Set.empty), Set.empty)
      }
    }
  }

  test("name normalization is idempotent and uppercase") {
    forAllN(Gen.identifier.suchThat(_.nonEmpty)) { s =>
      val once = FameParser.colName(s)
      assert(FameParser.colName(once) == once)
      assert(once == once.toUpperCase)
    }
  }

  // ---- nlrx HP smoother: no SQL oracle exists (q18 is rows-only), so the
  // kernel is machine-checked against its defining equation instead

  private val genSeries = for {
    n <- Gen.choose(3, 60)
    ys <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield ys.toArray

  /** (DᵀD x)_i for the second-difference matrix D. */
  private def dtd(x: Array[Double]): Array[Double] = {
    val n = x.length
    val d = Array.tabulate(math.max(n - 2, 0))(r => x(r) - 2 * x(r + 1) + x(r + 2))
    Array.tabulate(n) { i =>
      var s = 0.0
      if (i < n - 2) s += d(i)
      if (i - 1 >= 0 && i - 1 < n - 2) s += -2 * d(i - 1)
      if (i - 2 >= 0 && i - 2 < n - 2) s += d(i - 2)
      s
    }
  }

  test("nlrx HP solve satisfies its defining equation (I + λDᵀD)x = y") {
    import graft.kernels.Nlrx
    val gen = Gen.zip(genSeries, Gen.oneOf(0.5, 10.0, 1600.0, 1e5))
    forAllN(gen, n = 60) { case (y, lam) =>
      val x = Nlrx.HpSmoother.solve(y, lam)
      val ax = dtd(x)
      val resid = y.indices.map(i => math.abs(x(i) + lam * ax(i) - y(i))).max
      // relative residual: the matrix norm grows with λ, so scale the
      // machine-precision budget by it
      assert(resid < 1e-8 * (1.0 + lam),
        s"residual $resid at λ=$lam, n=${y.length}")
    }
  }

  test("nlrx HP solve: λ→0 is the identity") {
    import graft.kernels.Nlrx
    forAllN(genSeries, n = 40) { y =>
      val x = Nlrx.HpSmoother.solve(y, 0.0)
      assert(y.indices.forall(i => math.abs(x(i) - y(i)) < 1e-12))
    }
  }

  test("nlrx HP solve: curvature decreases in λ and vanishes as λ→∞") {
    import graft.kernels.Nlrx
    def curvature(x: Array[Double]): Double =
      (0 until x.length - 2).map { r =>
        val d = x(r) - 2 * x(r + 1) + x(r + 2); d * d
      }.sum
    forAllN(genSeries, n = 40) { y =>
      val c0 = curvature(y)
      val cs = Seq(1.0, 100.0, 10000.0).map(l =>
        curvature(Nlrx.HpSmoother.solve(y, l)))
      // smoothing never adds curvature, and more λ never smooths less
      assert(cs.head <= c0 + 1e-9)
      assert(cs.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 })
      val cInf = curvature(Nlrx.HpSmoother.solve(y, 1e12))
      assert(cInf <= c0 * 1e-6 + 1e-12, s"λ=1e12 curvature $cInf vs $c0")
    }
  }

  test("winnow_fps kernel: equals a naive reference on random unicode " +
      "text (code-point grams, full windows, first-occurrence distinct)") {
    import org.apache.spark.unsafe.types.UTF8String
    def refFps(text: String, gram: Int, window: Int): Seq[Long] = {
      val cps = text.codePoints().toArray
      if (cps.length < gram) return Seq.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to cps.length - gram).map { i =>
        val g = new String(cps, i, gram)
        md.reset()
        val d = md.digest(g.getBytes("UTF-8"))
        ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      if (hs.length < window) Seq.empty
      else (0 to hs.length - window)
        .map(i => hs.slice(i, i + window).min).distinct
    }
    val alphabet = Gen.oneOf('a', 'b', 'c', ' ', 'é', 'ü', '漢', '字')
    val gen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, alphabet)
      gram <- Gen.choose(1, 6)
      window <- Gen.choose(1, 5)
    } yield (cs.mkString, gram, window)
    forAllN(gen, n = 150) { case (text, gram, window) =>
      val native = graft.plans.WinnowFps
        .fps(UTF8String.fromString(text), gram, window).toLongArray().toSeq
      assert(native == refFps(text, gram, window),
        s"text='$text' gram=$gram window=$window")
    }
  }

  test("nlrx HP solve: null (NaN) positions are preserved, rest finite") {
    import graft.kernels.Nlrx
    val gen = for {
      y <- genSeries
      mask <- Gen.listOfN(y.length, Gen.prob(0.2))
    } yield (y, mask)
    forAllN(gen, n = 40) { case (y0, mask) =>
      val y = y0.clone()
      mask.zipWithIndex.foreach { case (m, i) => if (m) y(i) = Double.NaN }
      val x = Nlrx.HpSmoother.solve(y, 100.0)
      if (!y.forall(_.isNaN)) {
        y.indices.foreach { i =>
          if (y(i).isNaN) assert(x(i).isNaN)
          else assert(!x(i).isNaN && !x(i).isInfinite)
        }
      }
    }
  }
}
