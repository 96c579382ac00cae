package graft

import org.apache.spark.sql.types._

/** Schema contract against the REAL driver testdata.
  *
  * Round 8 lost four green queries because the unit suite stayed green while
  * the testdata drifted underneath it: specs exercised the event operators on
  * synthetic frames, `events.parquet`'s `ts` moved from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS), and the fixture reader's ns-as-long assumption turned
  * into an analysis error only the driver's Verify run could see. This suite
  * opens the cheapest real SF (sf0.001), asserts the loaded dtypes every
  * query assumes, and runs one smoke action through each fixture-reading
  * helper — so the next data drift fails `sbt test`, not the round.
  *
  * Suites must run on boxes without the driver testdata too, so every test
  * `assume`s the directory exists (ScalaTest reports them canceled, not
  * passed, when it is absent).
  */
class TestDataContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sfDir).isDirectory

  private def loadedType(table: String, col: String): DataType =
    spark.read.parquet(s"$sfDir/$table.parquet").schema(col).dataType

  test("events.parquet loaded dtypes match what the event queries assume") {
    assume(available)
    val sch = spark.read.parquet(s"$sfDir/events.parquet").schema
    assert(sch("event_id").dataType == LongType)
    assert(sch("user_id").dataType == LongType)
    assert(sch("event_type").dataType == StringType)
    assert(sch("value").dataType == DoubleType)
    // ts may legitimately arrive as ns-long (nanosAsLong), µs NTZ, or µs
    // adjusted-to-UTC across testdata generations — events() must accept
    // whichever is loaded, so the contract here is membership, and the
    // normalization contract is pinned in the smoke test below.
    val tsOk = sch("ts").dataType match {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    assert(tsOk, s"events.ts loaded as unsupported ${sch("ts").dataType}")
  }

  test("events() normalizes ts to TimestampType and rows survive") {
    assume(available)
    val ev = QueriesExt.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events() must yield session-TZ TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
    // the four round-8 casualties, end-to-end at the cheapest SF: an
    // analysis error anywhere in the event family fails here, loudly
    Seq("q33_event_windows", "q34_sessions", "q42_asof_join",
      "q46_interval_join").foreach { q =>
      assert(SparkEntry.queries(q)(spark, sfDir).count() > 0, s"$q empty")
    }
  }

  test("documents.parquet loaded dtypes match the text/dedup family") {
    assume(available)
    assert(loadedType("documents", "doc_id") == LongType)
    assert(loadedType("documents", "text") == StringType)
    assert(loadedType("documents", "lang") == StringType)
    assert(loadedType("documents", "source") == StringType)
    assert(QueriesExt.docs(spark, sfDir).count() > 0)
  }

  test("embeddings.parquet loaded dtypes match the ANN family") {
    assume(available)
    assert(loadedType("embeddings", "vec_id") == LongType)
    assert(loadedType("embeddings", "embedding") == ArrayType(FloatType, true))
    assert(loadedType("embeddings", "label") == IntegerType)
    assert(QueriesExt.embs(spark, sfDir).count() > 0)
  }

  test("TPC-H tables carry the dtypes the FAME-core queries assume") {
    assume(available)
    assert(loadedType("lineitem", "l_orderkey") == LongType)
    assert(loadedType("lineitem", "l_quantity") == DoubleType)
    assert(loadedType("lineitem", "l_returnflag") == StringType)
    // o_orderdate/l_shipdate arrive as µs timestamps; queries date_trunc
    // or cast, so the contract is timestamp-kind, not exact flavor
    Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate").foreach {
      case (t, c) =>
        val ok = loadedType(t, c) match {
          case TimestampType | TimestampNTZType | DateType => true
          case _ => false
        }
        assert(ok, s"$t.$c loaded as unsupported ${loadedType(t, c)}")
    }
    assert(loadedType("orders", "o_custkey") == LongType)
    assert(loadedType("customer", "c_custkey") == LongType)
    assert(loadedType("customer", "c_nationkey") == IntegerType)
    assert(loadedType("nation", "n_nationkey") == IntegerType)
    assert(loadedType("region", "r_regionkey") == IntegerType)
    assert(loadedType("supplier", "s_suppkey") == LongType)
    assert(loadedType("part", "p_partkey") == LongType)
  }

  test("flagship entry smoke-runs on real sf0.001") {
    assume(available)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("the FAME queries' fixed-read dates sit INSIDE the monthly " +
      "frame (the r16 vacuous-gate lesson: a masked read whose oracle " +
      "mirrors the mask passes on an out-of-range date with all-null " +
      "columns on both sides — this fails sbt test instead)") {
    assume(available)
    import org.apache.spark.sql.functions.{col, lit, min => fmin, max => fmax}
    val m = QueriesCore.monthlyByNation(spark, sfDir)
    val r = m.agg(fmin(col("DATE")), fmax(col("DATE"))).head()
    val (lo, hi) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    // every fixed date the q214/q215/q217/q218 scripts read or anchor:
    // the 1995-H1 base window, the June-1995 lookups, and the rebase
    // starts must all be strictly inside [min, max] so the rebased
    // columns carry real values at the gate
    Seq("1995-01-01", "1995-06-01", "1996-01-01", "1996-03-01",
        "1997-12-01").foreach { ds =>
      val d = java.time.LocalDate.parse(ds)
      assert(!d.isBefore(lo) && !d.isAfter(hi),
        s"fixed read date $ds outside the monthly frame [$lo, $hi] — " +
          "the FAME streaming queries would go vacuously null")
    }
    // and the base window actually matches rows (non-empty support)
    assert(m.where(col("DATE").between(
      lit(java.sql.Date.valueOf("1995-01-01")),
      lit(java.sql.Date.valueOf("1995-06-01")))).count() > 0)
  }

  test("star join broadcasts the fixed-size dims (nation/region) — " +
      "no exchange on the fact path for them") {
    assume(available)
    val df = SparkEntry.queries("q152_star_join")(spark, sfDir)
    assert(df.count() > 0)
    // AQE final plan: the two explicit broadcasts (plus whatever AQE
    // promoted) must appear as BroadcastHashJoins
    val plan = df.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins, plan:\n$plan")
  }
}
