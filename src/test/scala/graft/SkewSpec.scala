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
}
