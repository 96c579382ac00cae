package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** `fame_run(script, table[, partition_keys_csv])` — the FAME session as
  * a SQL table-valued function, registered via
  * [[GraftExtensions]].injectTableFunction. This is the engine's second
  * entry surface for SQL-first users (the reference's `main()` CLI
  * equivalent, `fame2py_converter.py:785-796`): a multi-statement FAME
  * script runs against any resolvable table/view and the result is a
  * relation usable anywhere a table is —
  *
  * {{{
  * SELECT date, rev, p FROM fame_run(
  *   'freq m\np = pct(rev)', 'monthly_view') ORDER BY date
  * }}}
  *
  * The builder runs at ANALYSIS time: it parses + compiles the script
  * through [[graft.api.FameSession.run]] and splices the resulting
  * (analyzed, still lazy) logical plan into the outer query, so the
  * whole statement stays one Catalyst plan — filters/projections above
  * fame_run(...) optimize into the script's plan like any subquery.
  * Scripts whose statements need driver-side scalar extraction (the
  * bounded collects [[graft.api.FameSession]] documents) perform those
  * during analysis, exactly as the Scala API performs them at call time.
  *
  * All arguments must be foldable strings: the script text, the
  * table/view name (anything `spark.table` resolves, including
  * `parquet.`/path/``), optionally a comma-separated partition-key
  * list for multi-entity execution (SURVEY §4; pass '' for none), and
  * optionally the date column's name when it is not `DATE`.
  */
object FameRun {

  private def strArg(args: Seq[Expression], i: Int, what: String): String = {
    val e = args(i)
    require(e.resolved && e.foldable && e.dataType == StringType,
      s"fame_run: $what (argument ${i + 1}) must be a string literal")
    val v = e.eval()
    require(v != null, s"fame_run: $what (argument ${i + 1}) must not be null")
    v.asInstanceOf[UTF8String].toString
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 4,
      "fame_run expects (script, table[, partition_keys_csv[, date_col]])," +
        s" got ${args.length} argument(s)")
    val script = strArg(args, 0, "script")
    val table = strArg(args, 1, "table name")
    val keys =
      if (args.length > 2)
        strArg(args, 2, "partition keys").split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
      else Nil
    val dateCol =
      if (args.length > 3) strArg(args, 3, "date column") else "DATE"
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException(
        "fame_run requires an active SparkSession"))
    val rel = spark.table(table)
    // name the contract violations HERE, at the fame_run boundary —
    // letting them flow into FameSession surfaces as an unresolved-
    // column error deep inside the compiled script's plan, with no
    // hint that the 4th argument names the date column
    def missing(c: String) = !rel.columns.exists(_.equalsIgnoreCase(c))
    require(!missing(dateCol),
      s"fame_run: table '$table' has no date column '$dateCol' " +
        s"(columns: ${rel.columns.mkString(", ")}); pass the date " +
        "column's name as the 4th argument")
    keys.filter(missing).foreach(k => throw new IllegalArgumentException(
      s"fame_run: table '$table' has no partition-key column '$k' " +
        s"(columns: ${rel.columns.mkString(", ")})"))
    graft.api.FameSession.run(script, rel, dateCol = dateCol,
      partitionKeys = keys).df.queryExecution.analyzed
  }
}
