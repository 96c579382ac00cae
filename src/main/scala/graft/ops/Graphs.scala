package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation. The headline op is
  * [[pageRank]]: domain/page authority is a first-class quality signal in
  * web-corpus pipelines (OPIC/harmonic-centrality crawl ordering at
  * Common Crawl, URL-level quality priors in CCNet-descended filters), so
  * a training-data engine needs it next to the Gopher rules and perplexity
  * gates.
  *
  * Everything here is INTEGER-SCALED power iteration: ranks live as longs
  * scaled by `scale` and every per-iteration step is integer addition /
  * truncating division. Integer sums are associative-commutative with no
  * rounding, so a SQL oracle can replay each unrolled iteration cell-exact
  * — the same discipline as the q35/q61 integer-grid k-means — at the cost
  * of a bounded truncation error (≤ 1/scale per division, immaterial at
  * scale = 10¹²).
  *
  * Scale design: each iteration is two key-bounded shuffles (join on src,
  * groupBy dst), all keyed by node id — no per-iteration driver state
  * except ONE aggregated scalar (the dangling mass, a single long).
  * Lineage is truncated per iteration with an eager localCheckpoint so
  * `iters` stacked joins never build a mega-plan (the q39 label-propagation
  * pattern). Edges and out-degrees are computed once and cached.
  */
object Graphs {

  /** PageRank by integer-scaled power iteration.
    *
    * @param edges (src: Long, dst: Long) directed edges; duplicates and
    *              self-loops are removed here.
    * @param iters fixed iteration count (deterministic replay needs a
    *              fixed horizon, and 5–10 iterations ranks stably for
    *              curation use; convergence-threshold stopping would make
    *              the oracle depend on float comparisons).
    * @param dampNum/dampDen damping factor as an exact rational (85/100).
    * @param scale rank fixed-point scale.
    * @return (node, rank) — rank scaled by `scale`; sums to ~scale (minus
    *         bounded truncation loss).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    // ONE driver scalar for the whole run: the node count (needed for the
    // teleport share — a broadcast join of a 1-row frame would hide the
    // same round trip behind more plan).
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // src-side edge table with out-degree attached, computed once
    val eo = e.join(outdeg, "src").persist()
    eo.count(): Unit // materialize before the loop so iterations reuse it

    val init = scale / math.max(n, 1L)
    val teleport = (scale / math.max(n, 1L)) * (dampDen - dampNum) / dampDen
    // the dangling-node SET is fixed across iterations — only its rank
    // mass changes. When it is empty (every node has out-edges, common
    // in dense domain graphs) the per-iteration dangling aggregation is
    // provably 0: one up-front existence check then saves `iters`
    // blocking driver round trips (measured 2.96 → 1.83 s on the
    // 97-node bench graph, where fixed per-iteration costs dominate).
    val hasDangling = nodes.join(outdeg,
      nodes("node") === outdeg("src"), "left_anti").limit(1).count() > 0
    var ranks = nodes.withColumn("rank", lit(init)).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // mass of nodes with no out-edges, redistributed evenly; a single
      // aggregated long per iteration (bounded driver traffic)
      val dangShare = if (!hasDangling) 0L else {
        val dangRow = ranks.join(outdeg,
            ranks("node") === outdeg("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L))).head()
        dangRow.getLong(0) / math.max(n, 1L)
      }
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank DIV outdeg")).as("contrib"))
      // integer arithmetic only: Column./ would be DOUBLE division, so the
      // damping step is spelled with SQL DIV (truncating; operands are
      // nonnegative, ≤ 85 * scale — no overflow)
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          expr(s"${teleport}L + (coalesce(contrib, 0L) + ${dangShare}L)" +
            s" * ${dampNum}L DIV ${dampDen}L").as("rank"))
        .localCheckpoint(true)
      it += 1
    }
    eo.unpersist(); e.unpersist(); nodes.unpersist()
    ranks
  }

  /** Per-node degree/reciprocity profile of a link graph — the crawl-
    * graph health table read next to PageRank (degree skew flags link
    * farms; reciprocity separates navigational link exchanges from
    * editorial citations). Self-loops and duplicate edges drop exactly
    * as in [[pageRank]]. Two key-bounded aggregations + one self-join
    * on the deduped edge list; nothing node-quadratic.
    *
    * @return (node, out_deg, in_deg, n_recip) — n_recip counts this
    *         node's out-edges whose reverse edge also exists.
    */
  def degreeProfile(edges: DataFrame): DataFrame = {
    // eager checkpoint: the deduped edge list feeds four consumers
    // (out/in/rev/recip) — without it each re-runs the upstream distinct
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val outD = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val recip = e.join(rev, Seq("src", "dst"))
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("n_recip"))
    outD.join(inD, Seq("node"), "full_outer")
      .join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"))
  }

  /** Per-node triangle counts over the undirected simple graph — the
    * clustering-structure signal next to degree/PageRank (dense
    * triangle neighborhoods = communities / link farms; triangle-free
    * hubs = star spam). Standard ordered-wedge algorithm: canonicalize
    * each edge to (a < b), build wedges (u < v < w sharing the low
    * vertex) with one self-join, close them against the edge list with
    * a second join — every triangle is found exactly once, as its
    * id-ordered triple.
    *
    * Scale shape: two equi-joins on vertex keys; the wedge count is
    * Σ deg(v)² — the real 100 TB variant orders each edge by DEGREE
    * (not id) before wedge-building, which provably bounds wedges at
    * O(E^1.5) on any graph (the hottest hub stops being a wedge
    * pivot). Id-ordering is kept here because it is engine-replayable;
    * the degree-ordered variant changes no output, only the join size.
    *
    * @return (node, n_triangles) for every edge endpoint, zeros kept.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true) // feeds wedge-build, closure join, universe
    val wedges = e.as("x").join(e.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("u"), col("x.b").as("v"), col("y.b").as("w"))
    val tris = wedges.join(
      e.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"))
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    nodes.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Multi-source BFS hop distance over an UNDIRECTED edge set: the
    * minimum number of edges from any seed to each reachable node,
    * capped at `maxHops`. The contamination-blast-radius / influence-
    * neighborhood query over a near-dup or link graph: "everything
    * within k hops of these known-bad docs".
    *
    * Level-synchronous frontier expansion: each round joins the CURRENT
    * frontier (nodes first reached last round — never the full visited
    * set) against the edge table and anti-joins already-visited nodes,
    * so round cost tracks the frontier boundary, not the corpus.
    * Per-round lineage is truncated with an eager localCheckpoint (the
    * pageRank/label-propagation pattern) so `maxHops` stacked joins
    * never build a mega-plan; visited stays distributed throughout —
    * nothing node-shaped touches the driver.
    *
    * @param edges (srcCol, dstCol) edge endpoints; treated as
    *              undirected (both directions are expanded), self-loops
    *              are harmless (the anti-join drops them).
    * @param seeds one column of seed node ids (hop 0).
    * @return (node, hop) with hop = min #edges from any seed, one row
    *         per node within `maxHops` of a seed (seeds included at 0).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .unionAll(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .persist()
    sym.count() // materialize once; every round re-reads the cache
    var visited = seeds
      .select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("hop", lit(0L))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      frontier = frontier
        .join(sym, frontier("node") === sym("b"))
        .select(col("a").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(hop.toLong))
        .localCheckpoint(true)
      visited = visited.unionAll(frontier).localCheckpoint(true)
    }
    sym.unpersist()
    visited
  }

  /** Driver-side naive reference for specs: same integer arithmetic on a
    * small in-memory graph.
    */
  private[graft] def pageRankNaive(edges: Seq[(Long, Long)], iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = math.max(nodes.size.toLong, 1L)
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val inEdges = e.groupBy(_._2)
    val teleport = (scale / n) * (dampDen - dampNum) / dampDen
    var ranks = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outdeg.contains).map(ranks).sum
      val dangShare = dang / n
      ranks = nodes.map { v =>
        val c = inEdges.getOrElse(v, Seq.empty)
          .map { case (s, _) => ranks(s) / outdeg(s) }.sum
        v -> (teleport + (c + dangShare) * dampNum / dampDen)
      }.toMap
    }
    ranks
  }
}
