package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** Scratch profiler for the MinHash-LSH pipeline stages. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("docs count")(docs.count())
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 2)
    time("shingles")(println("  shingle rows=" + sh.count()))
    val sig = Dedup.minHashSignatures(docs, "doc_id", "text", 32, 2)
    time("signatures")(sig.count())
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", 32, 8, 2)
    time("full pairs")(println("  pairs=" + pairs.count()))
    time("full pairs again")(println("  pairs=" + pairs.count()))
    spark.stop()
  }
}
