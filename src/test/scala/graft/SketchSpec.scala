package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Sketches

/** Sketch-family invariants: HLL rank/merge/accuracy, CMS bounds and
  * linearity, Morton spreading vs a naive bit loop, and the measured
  * file-skip win of a Z-order layout over a single-column sort.
  */
class SketchSpec extends SparkSpec {
  import Sketches._

  private def itemFrame(items: Seq[String]): DataFrame = {
    val schema = StructType(Seq(StructField("item", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(items.map(Row(_))).asJava), schema)
  }

  test("hllRho equals the numberOfLeadingZeros reference on the Column path") {
    val words = Seq(0L, 1L, 2L, 3L, 0x80000000L, 0xFFFFFFFFL, 0x00010000L) ++
      (1 to 40).map(i => (math.abs(scala.util.hashing.MurmurHash3
        .stringHash(i.toString).toLong)) & 0xFFFFFFFFL)
    val schema = StructType(Seq(StructField("w", LongType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(words.map(Row(_))).asJava), schema)
    val got = df.select(col("w"), hllRho(col("w")).cast("int").as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      val ref =
        if (w == 0) 33
        else java.lang.Integer.numberOfLeadingZeros(w.toInt) + 1
      assert(got(w) == ref, s"rho($w): got ${got(w)}, want $ref")
    }
  }

  test("HLL registers merge: halves max-merge to exactly the whole") {
    val items = (1 to 5000).map(i => s"item$i")
    val all = itemFrame(items)
    val (h1, h2) = (itemFrame(items.take(2300) ++ items.take(100)),
      itemFrame(items.drop(2300)))
    val whole = hllRegisters(all, Seq.empty, col("item"))
      .orderBy("reg").collect().map(r => (r.getLong(0), r.getInt(1)))
    val merged = hllMerge(
      hllRegisters(h1, Seq.empty, col("item")),
      hllRegisters(h2, Seq.empty, col("item")), Seq.empty)
      .orderBy("reg").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(merged.toSeq == whole.toSeq)
  }

  test("HLL estimate lands within the m=256 error regime on 20k distinct") {
    val n = 20000
    val df = itemFrame((1 to n).map(i => s"val#$i") ++
      (1 to 3000).map(i => s"val#${i % 500 + 1}")) // heavy duplication
    val est = hllEstimate(hllRegisters(df, Seq.empty, col("item")), Seq.empty)
      .select("est_distinct").collect().head.getDouble(0)
    // standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est / n - 1.0) < 0.2, s"estimate $est for true $n")
  }

  test("CMS never undercounts and respects the e/w error bound") {
    val stream = (1 to 2000).flatMap(i => Seq.fill(1 + i % 7)(s"tok$i")) ++
      Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2")
    val df = itemFrame(stream)
    val counters = cmsCounters(df, col("item"))
    val exact = df.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val probed = cmsProbe(counters, exact, "item")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = stream.size
    probed.foreach { case (tok, ex, est) =>
      assert(est >= ex, s"$tok: est $est < exact $ex — CMS must overcount")
      // Markov bound per row: overflow <= e/w * N with prob 1 - e^-4
      assert(est - ex <= math.ceil(2.72 / 1024 * total) * 4,
        s"$tok: est $est vs exact $ex exceeds the CMS error envelope")
    }
  }

  test("CMS counters are linear: half-stream counters sum to the whole") {
    val stream = (1 to 3000).map(i => s"w${i % 271}")
    val (a, b) = stream.splitAt(1700)
    val whole = cmsCounters(itemFrame(stream), col("item"))
    val summed = cmsCounters(itemFrame(a), col("item"))
      .unionByName(cmsCounters(itemFrame(b), col("item")))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
    assert(whole.join(summed, Seq("r", "c"))
      .where(whole("cnt") =!= summed("cnt")).isEmpty)
    assert(whole.count() == summed.count())
  }

  test("zValue matches the naive bit-interleave reference") {
    def naive(x: Long, y: Long): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pairs = for (x <- Seq(0L, 1L, 2L, 0xFFFFL, 0x1234L, 43210L, 65535L);
                     y <- Seq(0L, 1L, 0xFFFFL, 0x0F0FL, 54321L)) yield (x, y)
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", LongType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(pairs.map(p => Row(p._1, p._2)).toSeq).asJava), schema)
    val got = df.select(col("x"), col("y"),
      zValue(col("x"), col("y")).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == naive(r.getLong(0), r.getLong(1)),
        s"z(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("Z-order layout bounds file touch for BOTH query dims; 1-D sort only one") {
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("day_idx"),
        col("o_custkey"))
    val z = o.withColumn("z", zValue(col("day_idx"), col("o_custkey") % 65536))
    val nFiles = 16
    val zDir = tmpDir("zorder").toString
    val kDir = tmpDir("keysort").toString
    z.repartitionByRange(nFiles, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(zDir)
    // contrast layout: clustered by custkey alone (the 1-D default)
    z.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(kDir)
    def touched(dir: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val rd = spark.read.parquet(dir).where(pred)
      (rd.count(),
        rd.select(input_file_name().as("f")).distinct().count())
    }
    val dateQ = col("day_idx").between(600, 659)        // ~2% of days
    val custQ = col("o_custkey").between(100, 200)      // ~7% of keys
    val (dnZ, dfZ) = touched(zDir, dateQ)
    val (dnK, dfK) = touched(kDir, dateQ)
    val (cnZ, cfZ) = touched(zDir, custQ)
    val (cnK, cfK) = touched(kDir, custQ)
    assert(dnZ == dnK && dnZ > 20 && cnZ == cnK && cnZ > 20)
    // custkey sort is perfect on its own column …
    assert(cfK <= 3, s"custkey sort touched $cfK files for the custkey slice")
    // … but a date slice lives in every custkey-range file
    assert(dfK >= nFiles - 2, s"custkey sort should scatter dates, got $dfK")
    // z-order keeps BOTH slice shapes inside a strict subset of files —
    // each dim's selectivity prunes with exponent ~1/2 instead of 1/0
    assert(dfZ <= nFiles / 2, s"z layout: date slice touched $dfZ files")
    assert(cfZ <= nFiles / 2, s"z layout: custkey slice touched $cfZ files")
    assert(math.max(dfZ, cfZ) < dfK,
      s"z worst shape ($dfZ/$cfZ) must beat 1-D worst shape ($dfK)")
  }

  private def valFrame(rows: Seq[(String, Double)]): DataFrame = {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (g, v) => Row(g, v) }).asJava), schema)
  }

  test("grid quantile sketch: merge = union, exactly") {
    val rnd = new scala.util.Random(31337)
    val all = (1 to 5000).map(i =>
      (s"g${i % 3}", rnd.nextDouble())) // U[0,1)
    val (a, b) = all.splitAt(2200)
    val bins = 256
    val whole = gridHistogram(valFrame(all), Seq("g"), col("v"), bins)
    val merged = gridMerge(gridHistogram(valFrame(a), Seq("g"), col("v"), bins),
      gridHistogram(valFrame(b), Seq("g"), col("v"), bins), Seq("g"))
    assert(whole.count() == merged.count())
    assert(whole.join(merged, Seq("g", "bin"))
      .where(whole("cnt") =!= merged("cnt")).isEmpty)
    // state is BOUNDED: never more than groups x bins rows
    assert(whole.count() <= 3L * bins)
  }

  test("grid quantiles land within one bin width of planted quantiles") {
    val bins = 1024
    // planted uniform grid: values k/10000 for k in 0..9999, one group —
    // true type-1 quantile of p is value at index ceil(p*n)-1
    val vals = (0 until 10000).map(k => ("g", k / 10000.0))
    val hist = gridHistogram(valFrame(vals), Seq("g"), col("v"), bins)
    val q = gridQuantiles(hist, Seq("g"), Seq(0.5, 0.9, 0.99), bins)
      .collect()(0)
    val w = 1.0 / bins
    Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)).foreach { case (nm, p) =>
      val est = q.getAs[Double](nm)
      val truth = (math.ceil(p * 10000).toInt - 1) / 10000.0
      assert(math.abs(est - truth) <= w, s"$nm: |$est - $truth| > $w")
    }
    // skewed two-point distribution: 99 mass at 0.125, 1 at 0.875 —
    // p50/p90 sit exactly on the low atom's bin edge, p99_5 on the high
    val atoms = Seq.fill(99)(("g", 0.125)) ++ Seq(("g", 0.875))
    val h2 = gridHistogram(valFrame(atoms), Seq("g"), col("v"), bins)
    val q2 = gridQuantiles(h2, Seq("g"), Seq(0.5, 0.9, 0.995), bins)
      .collect()(0)
    assert(q2.getAs[Double]("p50") == 0.125)
    assert(q2.getAs[Double]("p90") == 0.125)
    assert(q2.getAs[Double]("p99_5") == 0.875)
    // out-of-range values clamp to the edge bins instead of vanishing
    val oob = valFrame(Seq(("g", -3.0), ("g", 0.5), ("g", 7.0)))
    val h3 = gridHistogram(oob, Seq("g"), col("v"), bins)
    assert(h3.agg(sum("cnt")).collect()(0).getLong(0) == 3L)
    assert(h3.select(min("bin"), max("bin")).collect()(0).toSeq ==
      Seq(0L, (bins - 1).toLong))
  }

  private def gFrame(rows: Seq[(String, String)]): DataFrame = {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("item", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map { case (g, v) => Row(g, v) }).asJava), schema)
  }

  test("KMV kmv_topk aggregate equals the window top-k form bit-for-bit") {
    // r21: kmvSketch runs on the partially-aggregating KmvTopK native
    // aggregate when GraftExtensions is installed (this session). Pin its
    // output against the pre-r21 window construction, built inline here,
    // on random multi-group data with duplicates — same rows, same ranks.
    import org.apache.spark.sql.expressions.Window
    val k = 16
    val rnd = new scala.util.Random(20211)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(3)}", s"it#${rnd.nextInt(400)}"))
    val df = gFrame(rows)
    val viaAgg = kmvSketch(df, Seq("g"), col("item"), k)
      .orderBy("g", "rank").collect().toSeq
    val hashed = df.select(col("g"),
      graft.ops.Sampling.md5Prefix32(col("item")).as("hv")).distinct()
    val wFin = Window.partitionBy(col("g")).orderBy("hv")
    val viaWindow = hashed.withColumn("rank", row_number().over(wFin))
      .where(col("rank") <= k)
      .orderBy("g", "rank").collect().toSeq
    assert(viaAgg == viaWindow)
    // a group with < k distinct values yields its whole distinct set
    val tiny = kmvSketch(gFrame((1 to 5).map(i => ("t", s"v$i"))),
      Seq("g"), col("item"), k).collect()
    assert(tiny.length == 5)
  }

  test("KMV merge of split sketches equals the sketch of the union, exactly") {
    val k = 64
    val items = (1 to 4000).map(i => ("g", s"item#$i"))
    val (a, b) = items.splitAt(1800)
    // overlap between the halves so dedup-across-sketches is exercised
    val a2 = a ++ b.take(300)
    val whole = kmvSketch(gFrame(items), Seq("g"), col("item"), k)
      .select("g", "hv", "rank").orderBy("rank").collect().toSeq
    val merged = kmvMerge(
      kmvSketch(gFrame(a2), Seq("g"), col("item"), k),
      kmvSketch(gFrame(b), Seq("g"), col("item"), k), Seq("g"), k)
      .select("g", "hv", "rank").orderBy("rank").collect().toSeq
    assert(merged == whole)
    assert(whole.size == k)
  }

  test("KMV estimate: exact below k, within the k=256 error regime above") {
    val k = 256
    // group "small" has 100 distinct — sketch IS the set, estimate exact
    val small = (1 to 100).map(i => ("small", s"s#$i")) ++
      (1 to 400).map(i => ("small", s"s#${i % 50 + 1}"))
    // group "big" has 20000 distinct
    val big = (1 to 20000).map(i => ("big", s"b#$i"))
    val est = kmvEstimate(
      kmvSketch(gFrame(small ++ big), Seq("g"), col("item"), k), Seq("g"), k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(est("small")._1 == 100L && est("small")._2 == 100.0)
    // standard error ~ 1/sqrt(k-1) = 6.3%; allow ~3 sigma
    assert(math.abs(est("big")._2 / 20000.0 - 1.0) < 0.2,
      s"big estimate ${est("big")._2}")
  }

  test("KMV pair overlap estimates a planted 50% Jaccard and nails identity") {
    val k = 256
    // A and B share 4000 of 6000 each: J = 4000/8000 = 0.5
    val shared = (1 to 4000).map(i => s"sh#$i")
    val rows = shared.map(("A", _)) ++ (1 to 2000).map(i => ("A", s"a#$i")) ++
      shared.map(("B", _)) ++ (1 to 2000).map(i => ("B", s"b#$i")) ++
      shared.map(("C", _)) // C == shared exactly
    val sk = kmvSketch(gFrame(rows), Seq("g"), col("item"), k)
    val ov = kmvPairOverlap(sk, "g", k).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = ov(("A", "B"))
    assert(math.abs(ab.getAs[Double]("est_jaccard") - 0.5) < 0.15,
      s"A-B jaccard ${ab.getAs[Double]("est_jaccard")}")
    assert(math.abs(ab.getAs[Double]("est_union") / 8000.0 - 1.0) < 0.2)
    assert(math.abs(ab.getAs[Double]("est_inter") / 4000.0 - 1.0) < 0.35)
    // C ⊂ A with |C| = 4000, |A| = 6000: union = A, inter = C
    val ac = ov(("A", "C"))
    assert(math.abs(ac.getAs[Double]("est_union") / 6000.0 - 1.0) < 0.2)
    ov.values.foreach { r =>
      assert(r.getAs[Long]("n_inter_k") <= r.getAs[Long]("n_union_k"))
      assert(r.getAs[Double]("est_inter") <= r.getAs[Double]("est_union") + 1e-9)
    }
    // identical sets: the union sketch is each group's sketch — J = 1.0 exact
    val idRows = (1 to 5000).map(i => s"x#$i")
    val sk2 = kmvSketch(gFrame(idRows.map(("P", _)) ++ idRows.map(("Q", _))),
      Seq("g"), col("item"), k)
    val pq = kmvPairOverlap(sk2, "g", k).collect()(0)
    assert(pq.getAs[Double]("est_jaccard") == 1.0)
    assert(pq.getAs[Long]("n_inter_k") == k.toLong)
  }
}
