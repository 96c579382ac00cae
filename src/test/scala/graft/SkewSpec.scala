package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Skew

/** Salted aggregation/join equal their unsalted counterparts. */
class SkewSpec extends SparkSpec {

  private def skewed = {
    // one hot key (k=hot, 900 rows) + long tail
    val rows = (0 until 900).map(i => Row("hot", i.toLong, i.toDouble)) ++
      (0 until 100).map(i => Row(s"k$i", i.toLong, i.toDouble))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("k", StringType), StructField("id", LongType),
        StructField("x", DoubleType))))
  }

  test("salted aggregate equals plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), col("id"),
      Seq(
        (col("x"), c => sum(c), c => sum(c), "sum_x"),
        (lit(1), c => count(c), c => sum(c), "n")),
      saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim = {
      val rows = Seq(Row("hot", 1.5), Row("k1", 2.0), Row("k2", 3.0))
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("k", StringType),
          StructField("w", DoubleType))))
    }
    val plain = skewed.join(dim, Seq("k"))
      .select(col("k"), col("id"), col("w"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), col("id"),
      saltBuckets = 8)
      .select(col("k"), col("id"), col("w"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 900 + 2)
  }

  test("AQE skew-join handling fires on a hot key when thresholds are " +
      "tuned (the runtime complement of explicit salting)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~all rows on both sides of an SMJ
      val big = (1 to 400).map(i =>
        (if (i % 100 == 0) s"k$i" else "hot", i.toLong))
        .toDF("k", "v")
      val other = (1 to 100).map(i =>
        (if (i % 50 == 0) s"k$i" else "hot", i.toLong))
        .toDF("k", "w")
      val joined = big.join(other, "k")
      // collect() materializes THIS dataset's own QueryExecution so the
      // adaptive plan finalizes (count() would plan a different query
      // and leave this one un-executed, isFinalPlan=false)
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"not finalized:\n$plan")
      assert(plan.contains("skew="), s"no skew handling in plan:\n$plan")
      // correctness under the split
      val expected = 396L * 98L + // hot × hot
        big.where(col("k") =!= "hot").join(
          other.where(col("k") =!= "hot"), "k").count()
      assert(n == expected, s"$n != $expected")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
