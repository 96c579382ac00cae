package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ops.Graphs

/** PageRank invariants: the distributed integer-scaled power iteration
  * must equal the naive driver-side reference bit-for-bit (same integer
  * arithmetic), rank mass must be conserved up to truncation loss, and
  * link structure must order ranks (a star's hub outranks its leaves).
  */
class GraphSpec extends SparkSpec {

  private def edgeFrame(edges: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(edges.map { case (s, d) => Row(s, d) }).asJava),
      schema)
  }

  test("distributed pageRank equals the naive integer reference exactly") {
    // mixed topology: a cycle, a hub, a dangling sink, a duplicate edge
    // and a self-loop (both must be dropped)
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),        // cycle
      (4, 1), (5, 1), (6, 1),        // hub in-links
      (1, 7),                        // 7 is dangling (no out-edges)
      (4, 1),                        // duplicate
      (5, 5))                        // self-loop
    val got = Graphs.pageRank(edgeFrame(edges), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Graphs.pageRankNaive(edges, iters = 5)
    assert(got == want, s"got $got\nwant $want")
  }

  test("rank mass is conserved up to bounded truncation loss") {
    val edges = (1L to 40L).map(i => (i, i * 17 % 41 + 1))
    val ranks = Graphs.pageRank(edgeFrame(edges), iters = 5)
      .collect().map(_.getLong(1))
    val total = ranks.sum
    val scale = 1000000000000L
    // each division truncates < 1 unit per node per iteration; with 41
    // nodes x 5 iterations x a few divisions the loss stays far below
    // 0.1% of the mass
    assert(total <= scale && total > scale - scale / 1000,
      s"total mass $total")
  }

  test("random graphs: distributed pageRank equals the naive reference") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(150)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val got = Graphs.pageRank(edgeFrame(edges), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Graphs.pageRankNaive(edges, iters = 4)
      assert(got == want, s"seed $seed")
    }
  }

  test("degree profile counts out/in/reciprocal edges exactly") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 1),        // reciprocal pair
      (1, 3), (3, 4), (4, 1),
      (5, 1),                // 5 has out only
      (2, 2),                // self-loop: dropped
      (1, 2))                // duplicate: dropped
    val got = Graphs.degreeProfile(edgeFrame(edges))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (2L, 3L, 1L)) // out: 2,3; in: 2,4,5; recip: 1<->2
    assert(got(2L) == (1L, 1L, 1L))
    assert(got(3L) == (1L, 1L, 0L))
    assert(got(4L) == (1L, 1L, 0L))
    assert(got(5L) == (1L, 0L, 0L))
  }

  test("a star hub outranks its leaves and ties are structural") {
    val leaves = (2L to 9L)
    val edges = leaves.map(l => (l, 1L)) ++ leaves.map(l => (1L, l))
    val ranks = Graphs.pageRank(edgeFrame(edges), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(1L)
    leaves.foreach(l => assert(hub > ranks(l), s"hub $hub vs leaf ${ranks(l)}"))
    // all leaves are structurally identical -> identical integer ranks
    assert(leaves.map(ranks).toSet.size == 1)
  }

  test("triangle counts: K4 gives every node C(3,2)=3; a path gives " +
      "zeros; direction and duplicate edges don't matter") {
    // K4 on 1..4 with edges in mixed directions + duplicates
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L),
      (3L, 4L), (2L, 4L), (2L, 4L))
    // plus a disjoint path 10-11-12 (no triangles)
    val got = Graphs.triangleCounts(
        edgeFrame(k4 ++ Seq((10L, 11L), (11L, 12L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L, 4L).foreach(n =>
      assert(got(n) == 3L, s"node $n: ${got(n)}"))
    Seq(10L, 11L, 12L).foreach(n => assert(got(n) == 0L))
    // total triangles = K4's 4, each counted at 3 nodes
    assert(got.values.sum == 12L)
  }

  test("bfsHops: min hop wins over longer paths, undirected expansion, " +
      "hop cap binds, unreachable nodes absent") {
    import spark.implicits._
    // seed 1. Diamond 1-2-4 / 1-3-4 (4 at hop 2 via either path) plus a
    // long way round 1-5-6-7-4; chain 4-8-9-10-11 tests the cap (11 is
    // hop 6 > 4); 20-21 is a disconnected island. Edge 2->1 points INTO
    // the seed: undirected expansion must still leave 2 at hop 1.
    val edges = Seq((2L, 1L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L),
      (5L, 6L), (6L, 7L), (7L, 4L), (4L, 8L), (8L, 9L), (9L, 10L),
      (10L, 11L), (20L, 21L))
    val seeds = Seq(1L).toDF("id")
    val got = Graphs.bfsHops(edgeFrame(edges), "src", "dst", seeds, "id",
        maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 4L -> 2L,
      6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> 4L), s"got $got")
    // multi-seed: adding seed 10 pulls 11 inside the cap and re-labels
    // the chain from the nearer source
    val got2 = Graphs.bfsHops(edgeFrame(edges), "src", "dst",
        Seq(1L, 10L).toDF("id"), "id", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(10L) == 0L && got2(11L) == 1L && got2(9L) == 1L &&
      got2(8L) == 2L && got2(4L) == 2L, s"got $got2")
  }
}
