package graft.plan

import graft.ast._
import graft.ast.FameStmt._

/** One schedulable unit: a statement instance with the session state
  * (frequency, active date mask, preserve-existing flag) captured at its
  * position in the script — the reference threads the same state through
  * codegen (`fame2pygen/fame2py_converter.py:177-230`).
  */
final case class Bound(
    order: Int,
    stmt: FameStmt,
    freq: Option[Frequency],
    dateFilter: Option[DateFilter],
    /** target column was assigned earlier in the script (or pre-exists):
      * masked re-assignment preserves old values instead of nulling
      * (`fame2py_converter.py:315,:567`). */
    preserveExisting: Boolean) {

  def target: Option[String] = stmt match {
    case Assign(t, _, _, _)         => Some(t)
    case ScalarAssign(t, _)         => Some(t)
    case PointInTime(t, _, _)       => Some(t)
    case ConvertAssign(t, _, _, _, _, _, _) => Some(t)
    case ChainAssign(t, _, _)       => Some(t)
    case FishvolAssign(t, _, _, _)  => Some(t)
    case NlrxAssign(t, _, _)        => Some(t)
    case ShiftPctAssign(t, _, _)    => Some(t)
    case _                          => None
  }

  /** Series/scalar names this statement reads (self-reference excluded for
    * shift-pct, like the reference's DAG —
    * `fame2pygen/fame2py_converter.py:40-66`). */
  def reads: Set[String] = stmt match {
    case Assign(_, e, _, _)        => FameExpr.refs(e)
    case ScalarAssign(_, e)        => FameExpr.refs(e)
    case PointInTime(_, _, e)      => FameExpr.refs(e)
    case ConvertAssign(_, src, _, _, _, _, _) => Set(src)
    case ChainAssign(_, terms, _)  =>
      terms.flatMap { case (_, q) => Seq(q, "P" + q) }.toSet
    case FishvolAssign(_, vs, ps, _) => (vs ++ ps).toSet
    case NlrxAssign(_, lam, args)  => FameExpr.refs(lam) ++ args.toSet
    case ShiftPctAssign(t, p, _)   => Set(p) // self-ref on t excluded
    case _                         => Set.empty
  }
}

object Scheduler {

  final case class CycleError(names: Seq[String])
      extends RuntimeException(s"dependency cycle among: ${names.mkString(", ")}")

  /** Bind session state through the statements in script order. */
  def bind(stmts: Seq[FameStmt], preExisting: Set[String]): Seq[Bound] = {
    var freq: Option[Frequency] = None
    var filter: Option[DateFilter] = None
    val assigned = collection.mutable.Set.empty[String] ++ preExisting
    val out = Seq.newBuilder[Bound]
    stmts.zipWithIndex.foreach { case (s, i) =>
      s match {
        case SetFreq(f)  => freq = Some(f)
        case SetDate(df) => filter = Some(df)
        case ClearDate   => filter = None
        case other =>
          val b = Bound(i, other, freq, filter, preserveExisting = false)
          val pe = b.target.exists(assigned.contains)
          out += b.copy(preserveExisting = pe)
          b.target.foreach(assigned += _)
      }
    }
    out.result()
  }

  /** Kahn topological levels over statement instances. Edges:
    * writer(B) → every later reader of B, plus successive writers of the
    * same target keep script order. Mirrors the reference's level scheduler
    * (`fame2pygen/fame2py_converter.py:69-93`) but errors on cycles instead
    * of appending them as a trailing level.
    */
  def levels(bounds: Seq[Bound], preExisting: Set[String]): Seq[Seq[Bound]] = {
    val n = bounds.length
    val writersOf: Map[String, Seq[Int]] =
      bounds.zipWithIndex.flatMap { case (b, i) => b.target.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val edges = Array.fill(n)(List.empty[Int]) // from -> to
    val indeg = Array.fill(n)(0)
    def addEdge(from: Int, to: Int): Unit =
      if (from != to) { edges(from) ::= to; indeg(to) += 1 }

    bounds.zipWithIndex.foreach { case (b, i) =>
      // reads: depend on the latest earlier writer; if none earlier and a
      // later writer exists for a non-pre-existing name, depend on it too
      // (the reference's DAG is name-level, order-agnostic).
      b.reads.foreach { name =>
        writersOf.get(name).foreach { ws =>
          val earlier = ws.filter(w => bounds(w).order < b.order)
          if (earlier.nonEmpty) addEdge(earlier.max, i)
          else if (!preExisting.contains(name)) ws.headOption.foreach(addEdge(_, i))
        }
      }
      // successive writes of one target stay ordered
      b.target.foreach { t =>
        val ws = writersOf(t)
        val idx = ws.indexOf(i)
        if (idx > 0) addEdge(ws(idx - 1), i)
      }
    }

    var frontier: Seq[Int] = bounds.indices.filter(indeg(_) == 0)
    val out = Seq.newBuilder[Seq[Bound]]
    val seen = Array.fill(n)(false)
    var remaining = n
    while (frontier.nonEmpty) {
      val lvl = frontier.sortBy(bounds(_).order)
      out += lvl.map(bounds(_))
      lvl.foreach(seen(_) = true)
      remaining -= lvl.size
      val next = collection.mutable.ListBuffer.empty[Int]
      lvl.foreach { i =>
        edges(i).foreach { j =>
          indeg(j) -= 1
          if (indeg(j) == 0) next += j
        }
      }
      frontier = next.distinct.toSeq
    }
    if (remaining > 0) {
      val stuck = bounds.indices.filterNot(seen).flatMap(bounds(_).target)
      throw CycleError(stuck)
    }
    out.result()
  }
}
