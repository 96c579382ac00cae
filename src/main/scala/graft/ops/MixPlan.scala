package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture planning — turn "I want a corpus of B tokens with
  * mixture weights w over sources" into executable per-source sampling
  * rates, and execute them deterministically.
  *
  * The plan is the static single-pass allocation every corpus build
  * starts from (DoReMi-style learned weights plug in as the `weights`
  * map): source s with T_s available tokens and target share w_s gets
  * rate_s = min(1, w_s·B / T_s). Sources without enough tokens to fill
  * their share surface a `deficit_tokens` column instead of silently
  * under-delivering — reallocating a deficit is a policy decision the
  * caller makes by adjusting weights and re-planning (the plan frame is
  * #sources rows, so iterating is free).
  *
  * Scale shape: planning is ONE groupBy over the corpus onto #sources
  * keys (map-side partials) plus arithmetic on that bounded frame;
  * execution is a broadcast join of the rate table and a salted
  * [[Sampling.hashUnit]] filter — per-row projection, no shuffle, and
  * the kept set is reproducible on any engine/partitioning (the q60
  * oracle replays plan AND execution end-to-end).
  */
object MixPlan {

  /** Per-source sampling plan over `df`.
    *
    * @param tokenCol per-row token count expression
    * @param weights  target mixture share per source value; sources
    *                 absent from the map get an equal split of the
    *                 remaining weight mass when the map is empty
    *                 (`Map.empty` = uniform mixture), otherwise 0.
    * @return (srcCol, avail_tokens, target_tokens, rate, deficit_tokens)
    */
  def plan(df: DataFrame, srcCol: String, tokenCol: Column, budget: Long,
      weights: Map[String, Double] = Map.empty): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val avail = df.groupBy(col(srcCol))
      .agg(sum(tokenCol.cast("long")).as("avail_tokens"))
    // uniform mixture needs #sources; a 1-row count frame cross-joined in
    // keeps the plan fully declarative (no driver action, no keyless window)
    val withW =
      if (weights.isEmpty)
        avail.crossJoin(broadcast(avail.select(count(lit(1)).as("__n"))))
          .withColumn("__w", lit(1.0) / col("__n")).drop("__n")
      else {
        val w = weights.foldLeft(lit(0.0)) { case (alt, (value, share)) =>
          when(col(srcCol) === value, share).otherwise(alt)
        }
        avail.withColumn("__w", w)
      }
    withW
      .withColumn("target_tokens", col("__w") * budget.toDouble)
      .withColumn("rate", least(lit(1.0),
        col("target_tokens") / col("avail_tokens").cast("double")))
      .withColumn("deficit_tokens", greatest(lit(0.0),
        col("target_tokens") - col("avail_tokens").cast("double")))
      .select(col(srcCol), col("avail_tokens"), col("target_tokens"),
        col("rate"), col("deficit_tokens"))
      // a plan table is consumed repeatedly (inspect, execute, report) —
      // eagerly materialize its #sources rows so each consumer doesn't
      // re-aggregate the whole corpus
      .localCheckpoint(true)
  }

  /** Temperature-flattened mixture plan (the XLM-R/mT5 α-sampling
    * recipe): target share_i ∝ p_i^α where p_i is source i's share of
    * the corpus — α < 1 upweights low-resource sources without the
    * cliff of a fixed uniform split. Fixed at α = 0.5 because that
    * exponent is ENGINE-PORTABLE exactly: the tempered mass is
    * `sqrt` (IEEE-correctly-rounded on every engine, unlike a general
    * `pow`), and the share denominator sums DECIMAL(28,12)-quantized
    * masses so aggregation order can't leak a ulp into the rates —
    * the same portability discipline as the q56 DECIMAL averages.
    * Output: (srcCol, avail_tokens, tempered_share, target_tokens,
    * rate) — feed to [[execute]] like a [[plan]] table.
    */
  def temperaturePlan(df: DataFrame, srcCol: String, tokenCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val avail = df.groupBy(col(srcCol))
      .agg(sum(tokenCol.cast("long")).as("avail_tokens"))
      .withColumn("__mass", sqrt(col("avail_tokens").cast("double"))
        .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    val tot = avail.agg(sum(col("__mass")).as("__tot"))
    avail.crossJoin(broadcast(tot))
      .withColumn("tempered_share",
        col("__mass").cast("double") / col("__tot").cast("double"))
      .withColumn("target_tokens", col("tempered_share") * budget.toDouble)
      .withColumn("rate", least(lit(1.0),
        col("target_tokens") / col("avail_tokens").cast("double")))
      .select(col(srcCol), col("avail_tokens"), col("tempered_share"),
        col("target_tokens"), col("rate"))
      .localCheckpoint(true)
  }

  /** Execute a plan: keep each row iff its salted hash-uniform clears the
    * source's rate. Broadcast join on the bounded rate table + per-row
    * filter — no shuffle of the corpus.
    */
  def execute(df: DataFrame, idCol: String, srcCol: String,
      planDf: DataFrame, salt: String = ""): DataFrame = {
    require(!df.columns.contains("rate"),
      "input already has a 'rate' column — rename it; execute joins the " +
        "plan's rate in under that name")
    df.join(broadcast(planDf.select(col(srcCol), col("rate"))), srcCol)
      .where(Sampling.hashUnit(col(idCol), salt) < col("rate"))
      .drop("rate")
  }

  /** Data-constrained epoch allocation (the multi-epoch mixing question
    * of Muennighoff et al. 2023: when the budget exceeds the unique
    * corpus, how many EPOCHS does each source run?): start from an equal
    * split of `budget`, cap every source at `maxEpochs × avail`, and
    * water-fill — each round moves the summed overflow of newly-capped
    * sources to the uncapped ones in equal integer shares. `rounds`
    * fixed redistribution rounds (each round caps ≥1 more source or
    * moves nothing, so #sources rounds is always enough; leftover after
    * the horizon surfaces as `unallocated_tokens` rather than silently
    * vanishing). All integer arithmetic (truncating DIV, exact sums), so
    * an oracle replays every round cell-exact.
    *
    * Scale shape: ONE groupBy of the corpus onto #sources keys; every
    * round after that is arithmetic on the #sources-row plan frame
    * (aggregate + broadcast cross join), nothing corpus-sized.
    *
    * @return (srcCol, avail_tokens, cap_tokens, alloc_tokens,
    *          unallocated_tokens, epochs_x1000) — epochs as an exact
    *          integer in milli-epochs (alloc·1000 div avail).
    */
  def epochPlan(df: DataFrame, srcCol: String, tokenCol: Column,
      budget: Long, maxEpochs: Int, rounds: Int = 3): DataFrame = {
    require(budget > 0 && maxEpochs > 0 && rounds > 0)
    val avail = df.groupBy(col(srcCol))
      .agg(sum(tokenCol.cast("long")).as("avail_tokens"))
      .withColumn("cap_tokens", col("avail_tokens") * maxEpochs)
      .localCheckpoint(true)
    val n = avail.count() // one driver scalar: #sources (bounded)
    var plan = avail.withColumn("alloc_tokens",
      least(lit(budget / math.max(n, 1L)), col("cap_tokens")))
      .withColumn("overflow",
        lit(budget / math.max(n, 1L)) - col("alloc_tokens"))
    var r = 0
    while (r < rounds) {
      // surplus so far + how many sources still have headroom
      val agg = plan.agg(
        sum(col("overflow")).as("surplus"),
        sum(when(col("alloc_tokens") < col("cap_tokens"), 1L)
          .otherwise(0L)).as("n_open")).localCheckpoint(true)
      val next = plan.crossJoin(broadcast(agg))
        .withColumn("give",
          when(col("n_open") > 0 &&
            col("alloc_tokens") < col("cap_tokens"),
            expr("surplus DIV n_open")).otherwise(lit(0L)))
        .withColumn("take",
          least(col("give"), col("cap_tokens") - col("alloc_tokens")))
        .withColumn("alloc_tokens", col("alloc_tokens") + col("take"))
        .withColumn("overflow", col("give") - col("take"))
        .drop("surplus", "n_open", "give", "take")
      plan = next.localCheckpoint(true)
      r += 1
    }
    // integer shares truncate (surplus DIV n_open), so per-source
    // overflow under-counts by the round remainders; the honest global
    // figure is budget − Σalloc, attached to every row from a 1-row
    // aggregate (both the engine and the oracle compute it this way)
    val totals = plan.agg(sum(col("alloc_tokens")).as("__tot"))
    plan.crossJoin(broadcast(totals))
      .withColumn("unallocated_tokens", lit(budget) - col("__tot"))
      .withColumn("epochs_x1000",
        expr("alloc_tokens * 1000L DIV greatest(avail_tokens, 1L)"))
      .select(col(srcCol), col("avail_tokens"), col("cap_tokens"),
        col("alloc_tokens"), col("unallocated_tokens"),
        col("epochs_x1000"))
  }
}
