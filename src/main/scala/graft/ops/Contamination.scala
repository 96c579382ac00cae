package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: find training documents sharing
  * word n-grams with a held-out/benchmark set — the standard pre-training
  * decontamination step (n-gram overlap screening, as popularized by the
  * GPT-3/PaLM data papers, typically at n = 8..13; the synthetic corpus
  * here is short-doc, so queries use n = 5).
  *
  * Scale shape: both sides explode to distinct (doc, gram) rows; the
  * bench side pre-aggregates to one row per gram, and the sides meet in
  * ONE equi-join on the gram string, then aggregate per training doc with
  * map-side partial counts. Cost scales with corpus size × grams per doc,
  * never |train| × |bench|. The skew risk is boilerplate grams shared by
  * thousands of benchmark docs; `maxGramDf` drops grams whose benchmark
  * document frequency exceeds the cap before the join — a relevance
  * filter (boilerplate is not contamination), a hard bound on the hottest
  * join key, AND the bound on the per-gram bench-id set the join carries.
  * Run with a cap at scale; the uncapped path is for small bench sets.
  */
object Contamination {

  /** @param train     corpus to screen (idCol, textCol)
    * @param bench     benchmark/held-out docs (same column names)
    * @param gramWidth shingle width in tokens; docs shorter than this
    *                  contribute nothing
    * @param maxGramDf drop grams appearing in more than this many bench
    *                  docs (None = keep all)
    * @return one row per contaminated training doc:
    *         (idCol, n_shared_grams, n_bench_docs)
    */
  def screen(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, gramWidth: Int = 5,
      maxGramDf: Option[Int] = None): DataFrame = {
    // distinct (doc, gram) rows via the tokenize-once/lead construction
    // (an array-transform shingle lambda would re-tokenize per gram —
    // the Dedup.shingleRows rationale)
    def grams(df: DataFrame, as: String) = Dedup
      .shingleRows(df.select(col(idCol).as(as), col(textCol)), as, textCol,
        gramWidth, strict = true)
      .withColumnRenamed("__sh", "gram")
    val t = grams(train, idCol)
    // pre-aggregate the bench side to ONE row per gram carrying the set of
    // bench docs containing it. The join output is then one row per
    // (train doc, shared gram) — not per (doc, gram, bench doc) triple —
    // and the final per-doc aggregation needs no countDistinct at all, so
    // no Expand doubles the joined rows: n_shared_grams is a plain count
    // (train grams are distinct per doc) and n_bench_docs is the size of
    // the distinct union of the per-gram bench sets.
    // With a cap, the df filter runs as a WINDOW count BEFORE the
    // collect_set (gram rows are distinct per doc, so the row count IS
    // the df; window buffers spill, aggregation buffers don't), so no
    // per-gram set is ever built past the cap — the hottest gram costs
    // O(cap), not O(|bench|).
    val bg = grams(bench, "bench_id")
    val b = maxGramDf match {
      case None =>
        bg.groupBy("gram").agg(collect_set(col("bench_id")).as("__bench"))
      case Some(cap) =>
        bg.withColumn("__df",
            count(lit(1)).over(Window.partitionBy("gram")))
          .where(col("__df") <= cap).drop("__df")
          .groupBy("gram").agg(collect_set(col("bench_id")).as("__bench"))
    }
    t.join(b, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"),
        size(array_distinct(flatten(collect_list(col("__bench")))))
          .cast("long").as("n_bench_docs"))
  }
}
