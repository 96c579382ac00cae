package graft.kernels

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.compile.ColumnCompiler.qcol

/** NLRX — λ-parameterized nonlinear relaxation smoothing — SURVEY §2.8.
  *
  * The reference's surface is `a_t = nlrx(lambda, y, w1, w2, w3, w4, gss,
  * gpr)` returning a new frame with the target column added; the kernel
  * itself is external/closed and its dev mock is the identity
  * (`fame2pygen/polars_econ_mock.py:42-60`,
  * `fame2py_converter.py:510-524`). Exact coefficient semantics are
  * therefore unverifiable — per SURVEY §2.8 we expose a pluggable trait:
  *
  *  - [[Nlrx.Compat]] — mock parity: target := y unchanged.
  *  - [[Nlrx.HpSmoother]] — the documented real kernel: Hodrick–Prescott-
  *    style penalized least squares, min Σ(x−y)² + λ Σ(Δ²x)², i.e. solve
  *    (I + λ DᵀD) x = y with D the second-difference operator — the
  *    standard published λ-relaxation for a single series. The
  *    pentadiagonal system is solved in O(n) with a banded Cholesky.
  *
  * Execution shape: the series is driver-sized by construction (one value
  * per period of an econometric model), so we collect the (DATE, y)
  * columns — same boundary where the reference calls `.item()` — solve on
  * the driver, and broadcast-join the result back by DATE. Weight series
  * w1..w4/gss/gpr are accepted for surface parity and currently unused
  * (documented).
  */
trait Nlrx {
  def apply(df: DataFrame, dateCol: String, target: String, lambda: Double,
      args: Seq[String]): DataFrame

  /** Partitioned form: one independent solve per entity key group,
    * distributed with the groupBy shuffle (no driver collect). Default
    * delegates to the keyless form when no keys are given.
    */
  def grouped(df: DataFrame, dateCol: String, target: String, lambda: Double,
      args: Seq[String], keys: Seq[String]): DataFrame =
    if (keys.isEmpty) apply(df, dateCol, target, lambda, args)
    else Nlrx.groupedSolve(df, dateCol, target, lambda, args, keys)
}

object Nlrx {

  /** Distributed per-entity HP solves: rows group by the entity keys, each
    * group sorts by date and runs the O(n) banded Cholesky in the executor
    * (`mapGroups` — the Scala analogue of grouped-map `applyInPandas`),
    * then the smoothed series joins back on (keys, date). Scales to any
    * number of entities; per-entity series stay driver-of-one-task-sized
    * like every per-key state in this engine.
    */
  def groupedSolve(df: DataFrame, dateCol: String, target: String,
      lambda: Double, args: Seq[String], keys: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val y = args.head
    // ONE null-safe key expression used on both the solve side and the
    // join-back side: a null key column maps to a \u0000 sentinel and
    // columns join with \u0001, so an entity with a null key still gets
    // its smoothed series and separator-containing values can't collide
    // (the old code rendered null differently on the two sides, silently
    // nulling that entity's output).
    val keyExpr = concat_ws("\u0001",
      keys.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val in = df.select(keyExpr.as("__k"), col(dateCol), qcol(y).cast("double"))
    import spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[
      (String, java.sql.Date, java.lang.Double)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.DATE,
        org.apache.spark.sql.Encoders.DOUBLE)
    val ds = in.map { r =>
      (r.getString(0), r.getDate(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))
    }
    val solved = ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray.sortBy(_._2.getTime)
      val ys = rows.map(r => if (r._3 == null) Double.NaN else r._3.doubleValue)
      val xs = HpSmoother.solve(ys, lambda)
      rows.zip(xs).iterator.map { case ((k, d, _), x) =>
        (k, d, if (x.isNaN) null else java.lang.Double.valueOf(x))
      }
    }
    val out = solved.toDF("__k", dateCol, target)
    val withKey = df.withColumn("__k", keyExpr)
    withKey.join(out, Seq("__k", dateCol), "left").drop("__k")
  }

  /** Mock-parity kernel: target is y itself. */
  object Compat extends Nlrx {
    def apply(df: DataFrame, dateCol: String, target: String, lambda: Double,
        args: Seq[String]): DataFrame =
      df.withColumn(target, qcol(args.head))
  }

  /** HP-filter penalized-least-squares smoother, (I + λDᵀD)x = y. */
  object HpSmoother extends Nlrx {
    def apply(df: DataFrame, dateCol: String, target: String, lambda: Double,
        args: Seq[String]): DataFrame = {
      val y = args.head
      val rows = df.select(col(dateCol), qcol(y).cast("double"))
        .where(col(dateCol).isNotNull)
        .orderBy(dateCol)
        .collect()
      val dates = rows.map(_.get(0))
      val ys = rows.map(r => if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
      val xs = solve(ys, lambda)

      val spark = df.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        df.schema(dateCol),
        org.apache.spark.sql.types.StructField(target,
          org.apache.spark.sql.types.DoubleType)))
      val out = spark.createDataFrame(
        java.util.Arrays.asList(dates.zip(xs).map { case (d, x) =>
          Row(d, if (x.isNaN) null else x): Row }: _*),
        schema)
      df.join(broadcast(out), Seq(dateCol), "left")
    }

    /** Solve (I + λDᵀD)x = y for the pentadiagonal HP system, O(n) banded
      * Cholesky (bandwidth 2). NaN inputs (nulls) are interpolated out
      * before solving and restored as NaN after.
      */
    def solve(y0: Array[Double], lambda: Double): Array[Double] = {
      val n = y0.length
      if (n < 3) return y0.clone()
      val nanMask = y0.map(_.isNaN)
      val y = y0.clone()
      // fill interior NaNs by nearest-neighbor carry so the solve is stable
      var lastV = Double.NaN
      for (i <- 0 until n) { if (y(i).isNaN) y(i) = lastV else lastV = y(i) }
      lastV = Double.NaN
      for (i <- (n - 1) to 0 by -1) { if (y(i).isNaN) y(i) = lastV else lastV = y(i) }
      if (y.exists(_.isNaN)) return y0.clone() // all-null series

      // A = I + λ DᵀD, symmetric pentadiagonal: build its 3 bands
      val d0 = new Array[Double](n) // diagonal
      val d1 = new Array[Double](n) // super-diagonal A(i, i+1)
      val d2 = new Array[Double](n) // A(i, i+2)
      for (i <- 0 until n) {
        // diagonal of DᵀD: sum over D-rows r of squared coefficient of
        // column i (D row r has coefs 1, -2, 1 at columns r, r+1, r+2)
        var diag = 0.0
        for (r <- math.max(0, i - 2) to math.min(n - 3, i)) {
          val coef = if (i == r) 1.0 else if (i == r + 1) -2.0 else 1.0
          diag += coef * coef
        }
        d0(i) = 1.0 + lambda * diag
        if (i + 1 < n) {
          var v = 0.0
          for (r <- math.max(0, i - 1) to math.min(n - 3, i)) {
            def coef(cIdx: Int) =
              if (cIdx == r) 1.0 else if (cIdx == r + 1) -2.0
              else if (cIdx == r + 2) 1.0 else 0.0
            v += coef(i) * coef(i + 1)
          }
          d1(i) = lambda * v
        }
        if (i + 2 < n) {
          var v = 0.0
          for (r <- math.max(0, i) to math.min(n - 3, i)) {
            def coef(cIdx: Int) =
              if (cIdx == r) 1.0 else if (cIdx == r + 1) -2.0
              else if (cIdx == r + 2) 1.0 else 0.0
            v += coef(i) * coef(i + 2)
          }
          d2(i) = lambda * v
        }
      }
      // banded Cholesky A = L Lᵀ with L lower-banded (bandwidth 2)
      val l0 = new Array[Double](n); val l1 = new Array[Double](n)
      val l2 = new Array[Double](n)
      for (i <- 0 until n) {
        var s = d0(i)
        if (i >= 1) s -= l1(i - 1) * l1(i - 1)
        if (i >= 2) s -= l2(i - 2) * l2(i - 2)
        l0(i) = math.sqrt(s)
        if (i + 1 < n) {
          var t = d1(i)
          if (i >= 1) t -= l1(i - 1) * l2(i - 1)
          l1(i) = t / l0(i)
        }
        if (i + 2 < n) l2(i) = d2(i) / l0(i)
      }
      // forward solve L z = y
      val z = new Array[Double](n)
      for (i <- 0 until n) {
        var s = y(i)
        if (i >= 1) s -= l1(i - 1) * z(i - 1)
        if (i >= 2) s -= l2(i - 2) * z(i - 2)
        z(i) = s / l0(i)
      }
      // back solve Lᵀ x = z
      val x = new Array[Double](n)
      for (i <- (n - 1) to 0 by -1) {
        var s = z(i)
        if (i + 1 < n) s -= l1(i) * x(i + 1)
        if (i + 2 < n) s -= l2(i) * x(i + 2)
        x(i) = s / l0(i)
      }
      for (i <- 0 until n) if (nanMask(i)) x(i) = Double.NaN
      x
    }
  }
}
