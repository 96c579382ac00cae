package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native ProductAgg (graft.plans) — registered via GraftExtensions in the
  * shared test session.
  */
class ProductAggSpec extends SparkSpec {

  private def df(vals: Seq[Any]) = {
    val rows = vals.zipWithIndex.map { case (v, i) => Row(i, v) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("i", IntegerType),
        StructField("x", DoubleType))))
  }

  test("extension is registered in the session") {
    assert(spark.catalog.functionExists("product_agg"))
  }

  test("grouped product with null-skip") {
    val out = df(Seq(1.5, 2.0, null, 4.0))
      .agg(call_function("product_agg", col("x"))).collect()(0)
    assert(out.getDouble(0) == 12.0)
  }

  test("all-null and empty input give null") {
    val out = df(Seq(null, null))
      .agg(call_function("product_agg", col("x"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("negative factors are exact (exp-log cannot represent them)") {
    val out = df(Seq(-2.0, 3.0, -0.5))
      .agg(call_function("product_agg", col("x"))).collect()(0)
    assert(out.getDouble(0) == 3.0)
  }

  test("running product over a window frame") {
    val w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    val out = df(Seq(2.0, null, 3.0, 0.5))
      .withColumn("p", call_function("product_agg", col("x")).over(w))
      .orderBy("i").select("p").collect().map(r => r.getDouble(0))
    assert(out.toSeq == Seq(2.0, 2.0, 6.0, 3.0))
  }

  test("integer input is coerced") {
    val rows = Seq(Row(1, 2L), Row(2, 5L))
    val d = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("i", IntegerType), StructField("x", LongType))))
    assert(d.agg(call_function("product_agg", col("x")))
      .collect()(0).getDouble(0) == 10.0)
  }
}
