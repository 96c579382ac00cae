package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: find training documents sharing
  * word n-grams with a held-out/benchmark set — the standard pre-training
  * decontamination step (n-gram overlap screening, as popularized by the
  * GPT-3/PaLM data papers, typically at n = 8..13; the synthetic corpus
  * here is short-doc, so queries use n = 5).
  *
  * Scale shape: both sides explode to distinct (doc, gram) rows and meet
  * in ONE equi-join on the gram string, then aggregate per training doc
  * with map-side partial counts. Cost scales with corpus size × grams per
  * doc, never |train| × |bench|. The skew risk is boilerplate grams
  * shared by thousands of benchmark docs; `maxGramDf` drops grams whose
  * benchmark document frequency exceeds the cap before the join — both a
  * relevance filter (boilerplate is not contamination) and a hard bound
  * on the hottest join key.
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
    def grams(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      explode(array_distinct(
        TextOps.strictWordShingles(col(textCol), gramWidth))).as("gram"))
    val t = grams(train, idCol)
    val b0 = grams(bench, "bench_id")
    val b = maxGramDf match {
      case None => b0
      case Some(cap) =>
        // one extra pre-aggregation on the same key the join shuffles on,
        // so AQE can reuse the exchange; drops boilerplate grams early
        b0.join(b0.groupBy("gram").agg(countDistinct("bench_id").as("__df"))
          .where(col("__df") <= cap).select("gram"), "gram")
    }
    t.join(b, "gram")
      .groupBy(idCol)
      .agg(countDistinct("gram").as("n_shared_grams"),
        countDistinct("bench_id").as("n_bench_docs"))
  }
}
