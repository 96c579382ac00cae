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

  /** Surgical decontamination: instead of dropping a contaminated
    * document ([[screen]] + filter), REMOVE the contaminated token runs
    * and keep the rest — the span-level scrub (as in the Llama/FLAN
    * decontamination writeups, where dropping whole docs over one
    * overlapping sentence wastes data).
    *
    * A training token is contaminated iff it lies inside any `gramWidth`
    * token window that also appears in the benchmark set; all covered
    * tokens are deleted and the survivors rejoin in order (one space,
    * normalized text — the scrub operates on [[TextOps.tokens]], the
    * same normalization every gram operator here uses).
    *
    * Returns one row per training doc, scrubbed or not:
    * (idCol, n_tokens, n_removed, cleaned).
    *
    * Scale shape: the bench side reduces to ONE row per distinct gram
    * (optionally df-capped like [[screen]] — boilerplate grams are not
    * contamination and would otherwise flag every doc); training grams
    * meet it in one equi-join on the gram string; covered positions
    * explode only from MATCHED starts (contamination is rare, so this
    * side is tiny); the rebuild is one anti-join plus one per-doc
    * aggregation. Everything keys on (doc, pos) or the gram — cost is
    * linear in corpus tokens, never |train| × |bench|.
    */
  def scrubSpans(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, gramWidth: Int = 5,
      maxGramDf: Option[Int] = None): DataFrame = {
    require(gramWidth >= 1, "gramWidth must be positive")
    // distinct bench grams, df-capped (shingleRows is already distinct
    // per (doc, gram), so the group count IS the document frequency)
    val bg = Dedup.shingleRows(
        bench.select(col(idCol).as("__bid"), col(textCol)),
        "__bid", textCol, gramWidth, strict = true)
      .groupBy(col("__sh").as("gram"))
      .agg(count(lit(1)).as("__df"))
    val benchGrams = maxGramDf.fold(bg)(cap => bg.where(col("__df") <= cap))
      .select("gram")
    // training gram start positions that hit a bench gram
    val starts = Dedup.posGramRows(train, idCol, textCol, gramWidth)
      .join(benchGrams, "gram")
      .select(col(idCol), col("pos"))
    // positions covered by any matched window
    val covered = starts
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(gramWidth - 1)))
          .as("pos"))
      .distinct()
    val tok = train.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "__t")))
    val kept = tok.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("__t")))),
            s => s.getField("__t")), " ").as("__cleaned"))
    val totals = tok.groupBy(idCol).agg(count(lit(1)).as("__n_tokens"))
    train.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("__n_tokens"), lit(0L)) -
          coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("__cleaned"), lit("")).as("cleaned"))
  }
}
