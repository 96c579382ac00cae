package graft.parse

import graft.ast._
import graft.ast.FameExpr._
import graft.ast.FameStmt._

/** Parser for FAME model scripts.
  *
  * Line classifier + recursive-descent expression parser producing the
  * `graft.ast` ADTs. Covers the 17 statement types of SURVEY §2.1
  * (reference classifier: `fame2pygen/formulas_generator.py:956-1146`) and
  * the expression surface of SURVEY §2.3
  * (`fame2pygen/formulas_generator.py:714-917`) — but as a real AST, not
  * string rewriting.
  *
  * Name normalization follows the reference
  * (`fame2pygen/formulas_generator.py:248-257`): uppercase, `$`→`_`,
  * `'`→`_`, dots preserved. `work'`/`fame'` DB prefixes are stripped
  * (`tests/test_new_features.py:343-358`).
  */
object FameParser {

  final case class ParseError(msg: String, line: String)
      extends RuntimeException(s"$msg in: `$line`")

  /** Normalize a FAME series name to its column name. */
  def colName(raw: String): String = {
    val lower = raw.trim
    val stripped =
      if (lower.toLowerCase.startsWith("work'") || lower.toLowerCase.startsWith("fame'"))
        lower.substring(5)
      else lower
    stripped.toUpperCase.replace("$", "_").replace("'", "_")
  }

  /** Local-DB prefix of a raw name: `aa'abc` → Some("AA"); work/fame → None. */
  def localDbOf(raw: String): Option[String] = {
    val i = raw.indexOf('\'')
    if (i <= 0) None
    else {
      val db = raw.substring(0, i).toLowerCase
      if (db == "work" || db == "fame") None else Some(db.toUpperCase)
    }
  }

  // ---------------------------------------------------------------- lexer

  sealed trait Tok { def text: String }
  final case class TId(text: String) extends Tok    // identifiers (may contain . $ ')
  final case class TNum(text: String) extends Tok
  final case class TStr(text: String) extends Tok   // without quotes
  final case class TOp(text: String) extends Tok    // + - * / ( ) [ ] { } , = < > <= >= <>
  final case class TBracket(text: String) extends Tok // raw [ ... ] payload

  /** Tokenize one logical line. Bracket payloads are captured raw so date
    * literals like `12mar2020` survive (they'd otherwise lex as num+id).
    */
  def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def isIdStart(c: Char) = c.isLetter || c == '_' || c == '$'
    def isIdChar(c: Char)  = c.isLetterOrDigit || c == '_' || c == '$' || c == '.' || c == '\''
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val j = s.indexOf('"', i + 1)
        if (j < 0) throw ParseError("unterminated string", s)
        out += TStr(s.substring(i + 1, j)); i = j + 1
      }
      // a single quote STARTING a token is a FAME quoted string ('Q', 'AVG');
      // inside an identifier it is the local-DB separator (aa'abc) and is
      // consumed by the identifier rule below
      else if (c == '\'') {
        val j = s.indexOf('\'', i + 1)
        if (j < 0) throw ParseError("unterminated string", s)
        out += TStr(s.substring(i + 1, j)); i = j + 1
      }
      else if (c == '[') {
        val j = s.indexOf(']', i + 1)
        if (j < 0) throw ParseError("unterminated [", s)
        out += TBracket(s.substring(i + 1, j).trim); i = j + 1
      }
      else if (c.isDigit) {
        var j = i
        while (j < n && (s(j).isDigit || s(j) == '.')) j += 1
        // `2020Q1`-style date-ish tokens only appear inside brackets/strings;
        // here a digit run is a number.
        out += TNum(s.substring(i, j)); i = j
      }
      else if (isIdStart(c)) {
        var j = i
        while (j < n && isIdChar(s(j))) j += 1
        out += TId(s.substring(i, j)); i = j
      }
      else if (c == '<' && i + 1 < n && (s(i + 1) == '=' || s(i + 1) == '>')) {
        out += TOp(s.substring(i, i + 2)); i += 2
      }
      else if (c == '>' && i + 1 < n && s(i + 1) == '=') { out += TOp(">="); i += 2 }
      else if ("+-*/(){},=<>".indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
      else throw ParseError(s"unexpected char '$c'", s)
    }
    out.result()
  }

  // ----------------------------------------------------- expression parser

  private val funcNames = Set("pct", "diff", "sqrt", "abs", "log", "exp",
    "ave", "lsum", "exists", "firstvalue", "lastvalue", "min", "max",
    "dateof", "make", "date", "fishvol_rebase", "nlrx", "convert")

  final class P(toks: Vector[Tok], line: String) {
    private var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def done: Boolean = pos >= toks.length
    def expect(op: String): Unit = peek match {
      case Some(TOp(`op`)) => pos += 1
      case other => throw ParseError(s"expected `$op`, got $other", line)
    }
    def peekIdLower: Option[String] = peek.collect { case TId(t) => t.toLowerCase }

    def parseExpr(): FameExpr = parseIf()

    private def parseIf(): FameExpr = peekIdLower match {
      case Some("if") =>
        next()
        val c = parseOr()
        peekIdLower match {
          case Some("then") => next()
          case _ => throw ParseError("expected `then`", line)
        }
        val t = parseIf()
        peekIdLower match {
          case Some("else") => next(); Cond(c, t, parseIf())
          case _            => Cond(c, t, Missing)
        }
      case _ => parseOr()
    }

    private def parseOr(): FameExpr = {
      var l = parseAnd()
      while (peekIdLower.contains("or")) { next(); l = Bin("or", l, parseAnd()) }
      l
    }
    private def parseAnd(): FameExpr = {
      var l = parseNot()
      while (peekIdLower.contains("and")) { next(); l = Bin("and", l, parseNot()) }
      l
    }
    private def parseNot(): FameExpr = peekIdLower match {
      case Some("not") => next(); Un("not", parseNot())
      case _           => parseCmp()
    }
    private val cmpWords = Map("eq" -> "eq", "ne" -> "ne", "gt" -> "gt",
      "lt" -> "lt", "ge" -> "ge", "le" -> "le")
    private val cmpOps = Map("=" -> "eq", "<>" -> "ne", ">" -> "gt",
      "<" -> "lt", ">=" -> "ge", "<=" -> "le")
    private def parseCmp(): FameExpr = {
      val l = parseAdd()
      peek match {
        case Some(TId(w)) if cmpWords.contains(w.toLowerCase) =>
          next(); Bin(cmpWords(w.toLowerCase), l, parseAdd())
        case Some(TOp(o)) if cmpOps.contains(o) =>
          next(); Bin(cmpOps(o), l, parseAdd())
        case _ => l
      }
    }
    private def parseAdd(): FameExpr = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(TOp("+")) => next(); l = Bin("+", l, parseMul())
        case Some(TOp("-")) => next(); l = Bin("-", l, parseMul())
        case _ => go = false
      }
      l
    }
    private def parseMul(): FameExpr = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case Some(TOp("*")) => next(); l = Bin("*", l, parseUnary())
        case Some(TOp("/")) => next(); l = Bin("/", l, parseUnary())
        case _ => go = false
      }
      l
    }
    private def parseUnary(): FameExpr = peek match {
      case Some(TOp("-")) => next(); Un("-", parseUnary())
      case Some(TOp("+")) => next(); parseUnary()
      case _              => parsePostfix()
    }

    private def parsePostfix(): FameExpr = {
      val base = parsePrimary()
      peek match {
        case Some(TBracket(payload)) =>
          next()
          base match {
            case Ref(name) => bracketExpr(name, payload)
            case _ => throw ParseError(s"cannot index non-series", line)
          }
        case _ => base
      }
    }

    /** `v[t+k]`, `v[t-k]`, `v[t]`, `v["2020-01-01"]`, `v[12mar2020]`,
      * `v[someScalar]` (`fame2pygen/formulas_generator.py:440-487`).
      */
    private def bracketExpr(series: String, payload0: String): FameExpr = {
      val payload = payload0.trim
      val p = payload.toLowerCase.replaceAll("\\s+", "")
      val shift = """t([+-])(\d+)""".r
      p match {
        case "t" => TimeShift(series, 0)
        case shift(sgn, k) =>
          TimeShift(series, if (sgn == "+") k.toInt else -k.toInt)
        case _ =>
          FameDate.parse(payload) match {
            case Some(d) => DateLookup(series, d)
            case None    => DynLookup(series, colName(payload))
          }
      }
    }

    private def parsePrimary(): FameExpr = next() match {
      case TNum(t) => Num(t.toDouble)
      case TStr(t) => Str(t)
      case TOp("(") =>
        val e = parseExpr(); expect(")"); e
      case TId(raw) =>
        val low = raw.toLowerCase
        if (low == "nd" || low == "na" || low == "nc") Missing
        else if (low == "t") TimeVar
        else if ((low == "$chain" || low == "chain" || low == "$mchain" ||
            low == "mchain") && peek.contains(TOp("(")))
          parseChainCall()
        else peek match {
          case Some(TOp("(")) =>
            next()
            val args = parseArgs()
            Call(low.stripPrefix("$"), args)
          case _ => Ref(colName(raw))
        }
      case TBracket(b) => throw ParseError(s"unexpected [$b]", line)
      case other => throw ParseError(s"unexpected token $other", line)
    }

    private def parseArgs(): Seq[FameExpr] = {
      if (peek.contains(TOp(")"))) { next(); return Seq.empty }
      // a bare `*` argument (dateof's wildcard) is not an expression
      def arg(): FameExpr = peek match {
        case Some(TOp("*")) => next(); Str("*")
        case _ => parseExpr()
      }
      val args = Seq.newBuilder[FameExpr]
      args += arg()
      var go = true
      while (go) peek match {
        case Some(TOp(",")) => next(); args += arg()
        case Some(TOp(")")) => next(); go = false
        case other => throw ParseError(s"expected , or ) got $other", line)
      }
      args.result()
    }

    /** `$chain("a - b + c", "2020")` — terms become signed quantity names,
      * each with an implied price column `P<name>`
      * (`fame2pygen/formulas_generator.py:562-626`, `:1149-1169`).
      */
    private def parseChainCall(): FameExpr = {
      expect("(")
      val (terms, year) = (next(), { expect(","); next() }) match {
        case (TStr(t), TStr(y)) => (t, y)
        case (TStr(t), TNum(y)) => (t, y)
        case other => throw ParseError(s"bad $$chain args: $other", line)
      }
      expect(")")
      ChainCall(parseChainTerms(terms, line), year.takeWhile(_.isDigit).toInt)
    }
  }

  /** "a - b + c" → Seq((+1,"A"), (-1,"B"), (+1,"C")). */
  def parseChainTerms(spec: String, line: String): Seq[(Int, String)] = {
    val toks = spec.trim.split("\\s+").toSeq
    if (toks.isEmpty) throw ParseError("empty chain spec", line)
    val out = Seq.newBuilder[(Int, String)]
    var sign = 1
    var expectTerm = true
    toks.foreach {
      case "+" => sign = 1; expectTerm = true
      case "-" => sign = -1; expectTerm = true
      case t if expectTerm =>
        out += ((sign, colName(t))); expectTerm = false; sign = 1
      case t => throw ParseError(s"unexpected chain token `$t`", line)
    }
    out.result()
  }

  // ------------------------------------------------------ statement parser

  /** Split a script into logical lines: `;` and newlines both separate
    * statements; `--` starts a trailing comment, and lines beginning with
    * `#` or `!` are comment lines (the reference's `.inp` corpus uses `#`).
    */
  /** Comment lines are dropped per NEWLINE before `;` splits into
    * statements: splitting first turned a `;` INSIDE a `#`/`!` comment
    * into a bogus statement fragment with no comment marker (found by
    * the r17 adversarial corpus, tools/adversarial_fame.inp). A
    * fragment after `;` that itself starts a comment is still dropped
    * by the final filter.
    */
  def splitLines(script: String): Seq[String] =
    script.split("\n").toSeq
      .map(_.trim)
      .filterNot(l => l.startsWith("#") || l.startsWith("!"))
      // strip `--` trailing comments per PHYSICAL line, before the `;`
      // split: `x = 1 -- a; b` is one statement, not a bogus fragment
      // `b` (r17 ADVICE — the same order bug the `#`/`!` fix addressed)
      .map(_.replaceAll("--.*$", ""))
      .flatMap(_.split(";"))
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("!"))

  def parseScript(script: String): Seq[FameStmt] =
    splitLines(script).map(parseLine)

  private val freqRe   = """(?i)^freq(?:uency)?\s+(.+)$""".r
  private val dateAll  = """(?i)^date\s+\*\s*$""".r
  private val dateRe   = """(?i)^date\s+(\S+)\s+to\s+(\S+)\s*$""".r
  private val scalarRe = """(?i)^scalar\s+(.+)$""".r
  private val setInline= """(?i)^set\s*<\s*date\s+(\S+)\s+to\s+(\S+)\s*>\s*(.+)$""".r
  private val setRe    = """(?i)^set\s+(.+)$""".r

  def parseLine(line0: String): FameStmt = {
    val line = line0.trim
    line match {
      case freqRe(f) =>
        SetFreq(Frequency.parse(f).getOrElse(
          throw ParseError(s"unknown frequency `$f`", line)))
      case dateAll() => ClearDate
      case dateRe(a, b) => SetDate(parseDateFilter(a, b, line))
      case scalarRe(rest) => parseAssign(rest, line) match {
        case Assign(t, e, _, _) => ScalarAssign(t, e)
        case other => other
      }
      case setInline(a, b, rest) =>
        parseAssign(rest, line) match {
          case a2: Assign => a2.copy(inlineFilter = Some(parseDateFilter(a, b, line)))
          case other => other
        }
      case setRe(rest) => parseAssign(rest, line)
      case _ => parseAssign(line, line)
    }
  }

  private def parseDateFilter(a: String, b: String, line: String): DateFilter = {
    // unparseable bounds (symbolic names like `start`, arithmetic like
    // `start-7`) become OPEN bounds — the reference's APPLY_DATE_FILTER
    // parses bound strings at runtime and silently drops ones it cannot
    // parse (`formulas_generator.py:1505-1518`); we preserve that
    // observable behavior rather than erroring
    def bound(s: String): Option[java.time.LocalDate] =
      if (s.trim == "*") None else FameDate.parse(s)
    DateFilter(bound(a), bound(b))
  }

  /** Parse `target = rhs`, classifying the special statement forms. */
  private def parseAssign(s: String, line: String): FameStmt = {
    val eq = topLevelEq(s)
    if (eq < 0) throw ParseError("expected `=`", line)
    val lhsRaw = s.substring(0, eq).trim
    val rhs = s.substring(eq + 1).trim

    // LHS forms: `name`, `name[t]`, `name[<date>]`, `db'name`
    val lb = lhsRaw.indexOf('[')
    val (nameRaw, lhsBracket) =
      if (lb >= 0 && lhsRaw.endsWith("]"))
        (lhsRaw.substring(0, lb).trim, Some(lhsRaw.substring(lb + 1, lhsRaw.length - 1).trim))
      else (lhsRaw, None)
    val target = colName(nameRaw)
    val db = localDbOf(nameRaw)

    // `v27 = {a, b, c}` list alias
    if (rhs.startsWith("{") && rhs.endsWith("}")) {
      val members = rhs.substring(1, rhs.length - 1).split(",").map(m => colName(m)).toSeq
      return ListAlias(target, members)
    }

    lhsBracket match {
      case Some(b) if b.toLowerCase.replaceAll("\\s+", "") == "t" =>
        // candidate shift-pct: v[t] = v[t+k] / (1 + (pct(p[t+k]) / 100))
        val expr = parseRhs(rhs, line)
        matchShiftPct(target, expr) match {
          case Some(sp) => sp
          case None     => Assign(target, expr, localDb = db)
        }
      case Some(b) =>
        val d = FameDate.parse(b).getOrElse(
          throw ParseError(s"bad point-in-time date `$b`", line))
        PointInTime(target, d, parseRhs(rhs, line))
      case None =>
        classifyRhs(target, rhs, db, line)
    }
  }

  /** An `=` at paren/bracket/brace depth 0 that is assignment, not `eq`. */
  private def topLevelEq(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '(' || c == '[' || c == '{') depth += 1
      else if (c == ')' || c == ']' || c == '}') depth -= 1
      else if (c == '"') { i = s.indexOf('"', i + 1).max(i) }
      else if (c == '=' && depth == 0) return i
      i += 1
    }
    -1
  }

  private def parseRhs(rhs: String, line: String): FameExpr =
    new P(lex(rhs), line).parseExpr()

  /** Convert technique/observed alias tables — mirrors the reference's
    * `_TECHNIQUE_ALIAS`/`_OBSERVED_ALIAS` (`formulas_generator.py:96-115`);
    * unknown values pass through lowercased (the reference is equally lax).
    */
  private val techniqueAlias = Map(
    "disc" -> "discrete", "lin" -> "linear", "const" -> "constant")
  private val observedAlias = Map(
    "ave" -> "average", "avg" -> "average", "hi" -> "high", "lo" -> "low",
    "begin" -> "beginning")
  def normTechnique(s: String): String = {
    val t = s.trim.toLowerCase; techniqueAlias.getOrElse(t, t)
  }
  def normObserved(s: String): String = {
    val o = s.trim.toLowerCase; observedAlias.getOrElse(o, o)
  }

  private val fishvolRe =
    """(?i)^fishvol_rebase\s*\(\s*\{([^}]*)\}\s*,\s*\{([^}]*)\}\s*,\s*(\d{4})\s*\)$""".r

  private def classifyRhs(target: String, rhs: String, db: Option[String],
      line: String): FameStmt = {
    // fishvol's `{…}` set braces aren't expression syntax — match raw first.
    rhs.trim match {
      case fishvolRe(vs, ps, y) =>
        return FishvolAssign(target,
          vs.split(",").map(v => colName(v)).toSeq,
          ps.split(",").map(p => colName(p)).toSeq, y.toInt)
      case _ =>
    }
    val expr = parseRhs(rhs, line)
    expr match {
      case Call("convert", args) =>
        val names = args.map {
          case Ref(n) => n
          case Num(v) => v.toLong.toString
          case Str(s) => s
          // anchored weekly `w(wed)` parses as a call in arg position
          case Call(f, Seq(Ref(d))) => s"$f($d)"
          case other  => throw ParseError(s"bad convert arg $other", line)
        }
        if (names.size < 4) throw ParseError("convert needs 4+ args", line)
        val freq0 = Frequency.parse(names(1)).getOrElse(
          throw ParseError(s"bad convert freq `${names(1)}`", line))
        // as_freq (5th arg): source-frequency override; `*` = use session
        // frequency (`formulas_generator.py:207-210`). The reference passes
        // the raw string to its closed kernel unvalidated (the corpus has
        // 'END' here) — honor it only when it IS a frequency token.
        val asFreq = names.drop(4).headOption.map(_.trim.toLowerCase)
          .filter(s => s.nonEmpty && s != "*")
          .flatMap(Frequency.parse)
        // start_by (6th arg): `off` = none (`formulas_generator.py:213-217`)
        val startBy = names.drop(5).headOption.map(_.toLowerCase).filter(_ != "off")
        // a start_by weekday anchors an un-anchored weekly target — same
        // effect as `w(wed)`-style frequency syntax (`:184-187`)
        val freq = (freq0, startBy.flatMap(Frequency.weekdays.get)) match {
          case (Frequency.Weekly(None), Some(d)) => Frequency.Weekly(Some(d))
          case _ => freq0
        }
        ConvertAssign(target, names.head, freq,
          technique = normTechnique(names(2)), observed = normObserved(names(3)),
          asFreq = asFreq, startBy = startBy)
      case ChainCall(terms, year) => ChainAssign(target, terms, year)
      // self-referential shift-pct also appears WITHOUT [t] on the LHS
      // (`v123s = v123s[t+1]/(1+(pct(p[t+1])/100))`, tests/test_nlrx.py);
      // without this classification it would be a dependency cycle
      case e if matchShiftPct(target, e).isDefined =>
        matchShiftPct(target, e).get
      case Call("nlrx", args) =>
        val series = args.tail.map {
          case Ref(n) => n
          case other  => throw ParseError(s"nlrx args must be series, got $other", line)
        }
        // extra trailing params parse but are dropped (tests/test_nlrx.py:333-338)
        NlrxAssign(target, args.head, series.take(7))
      case e => Assign(target, e, localDb = db)
    }
  }

  /** Detect `v[t] = v[t+k] / (1 + (pct(p[t+k]) / 100))` — the reference's
    * shift_pct regex (`fame2pygen/formulas_generator.py:667-670`,
    * `:1089-1096`) done structurally. Self-referential form = backward
    * level reconstruction (SURVEY §2.6).
    */
  private def matchShiftPct(target: String, e: FameExpr): Option[ShiftPctAssign] = {
    def unwrap(x: FameExpr): FameExpr = x
    e match {
      case Bin("/", TimeShift(v, k), denom) if colName(v) == target && k > 0 =>
        unwrap(denom) match {
          case Bin("+", Num(one), Bin("/", Call("pct", Seq(TimeShift(p, k2))), Num(hundred)))
            if one == 1.0 && hundred == 100.0 && k2 == k =>
            Some(ShiftPctAssign(target, colName(p), k))
          case _ => None
        }
      case _ => None
    }
  }
}
