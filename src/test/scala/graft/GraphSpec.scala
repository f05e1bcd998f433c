package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._

/** Graph ops on a hand-checkable fixture: path 1-2-3 plus isolated pair
  * 4-5, directed edges 1->2, 2->3, 3->1 (cycle) and 4->5. */
class GraphSpec extends SparkSpec {

  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
  }

  test("connected components: cycle and pair resolve to min labels") {
    val comp = Graph.connectedComponents(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("bfs hops: distances within the component, -1 beyond reach") {
    val hops = Graph.bfsHops(edges, source = 1L, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // undirected view of the 3-cycle: 2 and 3 are both one hop from 1
    assert(hops === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> -1L, 5L -> -1L))
  }

  test("bfs hops: iteration budget caps reach on a path graph") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val hops = Graph.bfsHops(path, source = 1L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> -1L))
  }

  test("label propagation: two bridged triangles settle into two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3-4, self-loop-only vertex 7.
    // Hand-traced 3 synchronous rounds (ties to smallest): the left
    // triangle converges to label 1, the right to 3, and 7 (no neighbors)
    // keeps its own label.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (7L, 7L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(g, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 7L))
  }

  test("label propagation: count ties break to the smallest label") {
    import spark.implicits._
    // star: center 9 with leaves 1 and 2 — round 1 gives the center
    // equal votes {1, 2}; the mode must pick 1.
    val g = Seq((9L, 1L), (9L, 2L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(g, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(9L) === 1L)
    // leaves see only the center: both adopt 9
    assert(labels(1L) === 9L && labels(2L) === 9L)
  }

  test("label propagation: hub adopts the majority label by count, not by distinct votes") {
    import spark.implicits._
    // hub 10 -- {1,2,3,4}, plus 3-4. Hand-traced 2 synchronous rounds:
    // r1: 1->10, 2->10, 3->min{10,4}=4, 4->min{10,3}=3, 10->min{1,2,3,4}=1.
    // r2: hub 10 sees labels {1:from 10? no —} neighbors' r1 labels are
    // 1->10, 2->10, 3->4, 4->3, so counts {10:2, 4:1, 3:1}: majority 10
    // wins on COUNT even though 3 and 4 are smaller labels — this is the
    // case a distinct-vote (or tie-to-smallest-only) merge would get wrong.
    val g = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(g, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(10L) === 10L)
    // 1 and 2 see only the hub (r1 label 1): both adopt 1; 3 sees
    // {10->1, 4->3} tie {1,3} -> 1; 4 sees {10->1, 3->4} tie {1,4} -> 1
    assert(labels(1L) === 1L && labels(2L) === 1L)
    assert(labels(3L) === 1L && labels(4L) === 1L)
  }

  test("label propagation on a large star: both bipartite classes stay exact") {
    import spark.implicits._
    // center 1000 with leaves 1..200 — the hub shape the (dst, label)
    // pre-count exists for: in round 2 the center receives ONE (label,
    // count=200) struct, never a 200-element raw list. Bipartite stars
    // oscillate under synchronous LPA; after 2 rounds: r1 leaves -> 1000,
    // center -> min(leaf ids) = 1; r2 leaves -> 1 (center's r1 label),
    // center -> 1000 (200 votes for 1000... leaves' r1 labels are all
    // 1000) — hand-traced both classes.
    val g = (1L to 200L).map(i => (1000L, i)).toDF("src", "dst")
    val labels = Graph.labelPropagation(g, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1000L) === 1000L)
    assert((1L to 200L).forall(labels(_) === 1L))
  }

  test("pregel preAggregate contract: merge sees (msg, pre) structs, one per distinct value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // generality beyond LPA's collect-mode: summing the pre-counts through
    // the hook must equal the plain per-vertex message count, because the
    // pre-level collapses duplicates to (value, multiplicity) losslessly
    val raw = Seq((1L, 5L), (1L, 5L), (1L, 5L), (1L, 6L), (2L, 7L))
      .toDF("vertex", "__msg")
    val viaHook = Graph.messageStage(
        raw, m => sum(m.getField("pre")), Some(count(lit(1))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaHook === Map(1L -> 4L, 2L -> 1L))
    // and the struct stream carries one entry per DISTINCT message value
    val distinctVals = Graph.messageStage(
        raw, m => count(m.getField("msg")), Some(count(lit(1))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distinctVals === Map(1L -> 2L, 2L -> 1L))
  }

  test("landmarkHops: per-landmark distances from one pregel run, unreached pairs absent") {
    import spark.implicits._
    // path 1-2-3-4-5 plus isolated pair 6-7; landmarks at both path ends
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L)).toDF("src", "dst")
    val got = Graph.landmarkHops(path, landmarks = Seq(1L, 5L), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      (1L, 1L) -> 0L, (2L, 1L) -> 1L, (3L, 1L) -> 2L, (4L, 1L) -> 3L, (5L, 1L) -> 4L,
      (5L, 5L) -> 0L, (4L, 5L) -> 1L, (3L, 5L) -> 2L, (2L, 5L) -> 3L, (1L, 5L) -> 4L)
    assert(got === want) // 6 and 7 reach no landmark: no rows at all
  }

  test("landmarkHops: iteration budget caps reach per landmark independently") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.landmarkHops(path, landmarks = Seq(1L, 4L), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // from 1: reaches 2,3 within 2 hops; from 4: reaches 2,3,5 within 2
    val want = Map(
      (1L, 1L) -> 0L, (2L, 1L) -> 1L, (3L, 1L) -> 2L,
      (4L, 4L) -> 0L, (3L, 4L) -> 1L, (5L, 4L) -> 1L, (2L, 4L) -> 2L)
    assert(got === want)
  }

  test("landmarkHops equals one bfsHops run per landmark (shared-loop fusion is exact)") {
    val lms = Seq(1L, 4L)
    val fused = Graph.landmarkHops(edges, lms, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val separate = lms.flatMap { lm =>
      Graph.bfsHops(edges, lm, iters = 3).collect()
        .filter(_.getLong(1) >= 0L).map(r => (r.getLong(0), lm) -> r.getLong(1))
    }.toMap
    assert(fused === separate)
  }

  test("scc: cycles confirm, one-way bridges separate, chains are singletons") {
    import spark.implicits._
    // cycle {1,2,3} --one-way bridge 3->4--> cycle {4,5}; self-loop 6;
    // chain 7->8. True SCCs: {1,2,3}, {4,5}, {6}, {7}, {8}.
    // Hand-traced with iters=3, rounds=2: round 1 confirms {1,2,3} (f=b=1),
    // 6, and 7 (bounded f leaves 4,5,8 with f != b); round 2 on the peeled
    // remainder {4,5,8} confirms {4,5} at root 4 and 8 alone.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L),
      (6L, 6L), (7L, 8L)).toDF("src", "dst")
    val got = Graph.scc(g, iters = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L, 8L -> 8L))
  }

  test("scc: budget exhaustion under-assigns (-1), never merges distinct SCCs") {
    import spark.implicits._
    // same graph, rounds=1: the bounded forward pass colors 4,5,8 wrong
    // for confirmation, so they stay unresolved — explicitly -1, and no
    // vertex is ever assigned to a component it is not mutually reachable
    // with (soundness under any budget)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L),
      (6L, 6L), (7L, 8L)).toDF("src", "dst")
    val got = Graph.scc(g, iters = 3, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> -1L, 5L -> -1L,
      6L -> 6L, 7L -> 7L, 8L -> -1L))
  }

  test("pagerank: cycle vertices share rank; sink accumulates from source") {
    val pr = Graph.pageRank(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 3-cycle is symmetric: equal ranks
    assert(math.abs(pr(1L) - pr(2L)) < 1e-12 && math.abs(pr(2L) - pr(3L)) < 1e-12)
    // 5 only receives, 4 only gets reset mass: rank(5) > rank(4)
    assert(pr(5L) > pr(4L))
    assert(math.abs(pr(4L) - 0.15 / 5) < 1e-12)
    // all ranks positive, none above 1
    assert(pr.values.forall(v => v > 0 && v < 1))
  }

  test("pagerank is deterministic across partitionings") {
    val a = Graph.pageRank(edges.repartition(5), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.repartition(2), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("triangle count: cycle closes one triangle, pair closes none") {
    val tc = Graph.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
    // duplicate + reversed edges must not inflate counts
    import spark.implicits._
    val noisy = edges.union(Seq((2L, 1L), (1L, 2L), (3L, 2L)).toDF("src", "dst"))
    val tc2 = Graph.triangleCount(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc2 === tc)
  }

  test("pregel checkpoints each generation: deep iteration keeps a flat output plan") {
    // the returned frame is materialized (caches released) — flat lineage
    // even at real iteration counts
    val joins = Graph.pageRank(edges, iters = 12).queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(joins === 0, s"checkpointed result should have flat lineage, found $joins joins")
  }

  test("sssp: min-plus distances over directed weighted edges, -1 unreached") {
    import spark.implicits._
    // 1->3 direct costs 10, via 2 costs 6; edges are DIRECTED so nothing
    // reaches back to 1's component from 4-5 or vice versa
    val we = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (4L, 5L, 2L))
      .toDF("src", "dst", "w")
    val d = Graph.sssp(we, source = 1L, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> -1L, 5L -> -1L))
  }

  test("sssp iteration budget: the cheaper two-edge route needs two relaxations") {
    import spark.implicits._
    val we = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L)).toDF("src", "dst", "w")
    val d1 = Graph.sssp(we, source = 1L, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1(3L) === 10L) // only the direct edge relaxed so far
    val d2 = Graph.sssp(we, source = 1L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(3L) === 6L)
  }

  test("personalized pagerank: mass stays near the source, unreachable vertices score 0") {
    // run to convergence (short budgets oscillate as mass circulates the
    // cycle in waves): fixpoint is r1 = 0.15/(1-0.85^3), r2 = 0.85*r1,
    // r3 = 0.85*r2
    val ppr = Graph.personalizedPageRank(edges, source = 1L, iters = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // directed 3-cycle 1->2->3->1 keeps all teleport mass; 4->5 is
    // unreachable from 1, so both score exactly 0
    assert(ppr(4L) === 0.0 && ppr(5L) === 0.0)
    val r1 = 0.15 / (1 - math.pow(0.85, 3))
    assert(math.abs(ppr(1L) - r1) < 1e-4) // 0.85^60 residual ~6e-5
    assert(math.abs(ppr(2L) - 0.85 * r1) < 1e-4)
    assert(math.abs(ppr(3L) - 0.85 * 0.85 * r1) < 1e-4)
  }

  test("hits: pure hub and pure authority separate; scores sum to 1 per side") {
    import spark.implicits._
    // 1 and 2 both point at 3 and 4; 3 also points at 4.
    // Hand trace (iter 1): auth raw {3:2, 4:3} -> {0.4, 0.6};
    // hub raw {1: 0.4+0.6=1.0, 2: 1.0, 3: 0.6} -> {1:5/13, 2:5/13, 3:3/13}.
    val g = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.hits(g, iters = 1)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(math.abs(r(1L)._1 - 5.0 / 13) < 1e-12 && r(1L)._2 === 0.0)
    assert(r(4L)._1 === 0.0 && math.abs(r(4L)._2 - 0.6) < 1e-12)
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-12, "hub mass is L1-normalized")
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-12, "auth mass is L1-normalized")
    // a second iteration preserves the ordering on this graph
    val r2 = Graph.hits(g, iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r2(4L)._2 > r2(3L)._2 && r2(1L)._1 === r2(2L)._1)
  }

  test("kCore: triangle survives 2-core, chain peels away round by round") {
    import spark.implicits._
    // triangle 1-2-3 plus a pendant chain 3-4-5-6
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core = Graph.kCore(g, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L), "only the triangle is 2-core")
    // budget semantics: one round only drops the degree-1 frontier (6 and
    // nothing else on the chain yet) — under-peeling, never over-peeling
    val one = Graph.kCore(g, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one === Set(1L, 2L, 3L, 4L, 5L), "round 1 peels only vertex 6")
  }

  test("pregel frontier drains early: converged loop stops before the budget") {
    // a 3-cycle converges its components in 1 superstep; a huge budget
    // must not change the answer (the frontier empties and the loop exits)
    val comp = Graph.connectedComponents(edges, iters = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("power iteration clustering separates two dense cliques across a weak bridge") {
    import spark.implicits._
    // a triangle and a 4-clique (every edge tripled) joined by ONE bridge
    // edge — PIC's embedding must put the cliques in different clusters.
    // The cliques are deliberately DIFFERENT sizes: a clique-swap-
    // symmetric graph gives identical embedding values on both sides
    // under the deterministic degree init (documented limitation).
    val cliqueEdges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++
      Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val e = (cliqueEdges.flatMap(t => Seq(t, t, t)) :+ (3L, 10L)).toDF("src", "dst")
    val out = Graph.powerIterationClustering(e)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L, 13L))
    assert(Set(out(1L), out(2L), out(3L)).size === 1, s"clique A must agree: $out")
    assert(Set(out(10L), out(11L), out(12L), out(13L)).size === 1, s"clique B must agree: $out")
    assert(out(1L) !== out(10L), s"cliques must separate: $out")
    // and the whole pipeline is partitioning-deterministic (pure integer
    // arithmetic end to end)
    val again = Graph.powerIterationClustering(e.repartition(7))
      .orderBy("vertex").collect().toSeq
    assert(again === Graph.powerIterationClustering(e).orderBy("vertex").collect().toSeq)
  }

  test("structural chain: subgraph weight/vertex predicates, mask finds reciprocated edges") {
    import spark.implicits._
    // 1->2 heavy (w3) with a light 2->1 back-edge; 1->3 heavy; 3->4 heavy
    // but 4 never sends back. minW=2: sub={1->2, 1->3, 3->4};
    // rev∩g={2->1} (the light back-edge makes 1->2 reciprocated).
    val edges = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(2)((1L, 3L)) ++ Seq.fill(5)((3L, 4L))).toDF("src", "dst")
    val got = Graph.structuralDegrees(edges, minW = 2L, maxVertex = 100L)
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 0L, 0L), (2L, 0L, 1L, 1L),
      (3L, 1L, 1L, 0L), (4L, 0L, 1L, 0L)))
    // vertex predicate drops BOTH-endpoint-failing edges (3->4 gone when
    // maxVertex=4 excludes vertex 4; vertex 4 leaves the vertex set too)
    val cut = Graph.structuralDegrees(edges, minW = 2L, maxVertex = 4L)
      .orderBy("vertex").collect().map(_.getLong(0))
    assert(cut.toSeq === Seq(1L, 2L, 3L))
  }

  test("aggregateNeighbors: per-direction sends, per-vertex merge, no-message vertices absent") {
    import spark.implicits._
    val we = Seq((1L, 2L, 10L), (1L, 3L, 5L), (2L, 3L, 7L))
      .toDF("src", "dst", "w")
    // collectNeighborIds(Either): both endpoints hear the opposite one
    val nbrs = Graph.aggregateNeighbors(we,
        toDst = Some(col("src")), toSrc = Some(col("dst")),
        mergeMsg = m => sort_array(collect_set(m)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(nbrs === Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L)))
    // in-weight: dst-only sends; vertex 1 receives nothing and is ABSENT
    // (the GraphX VertexRDD-aggregate contract, not a zero row)
    val inW = Graph.aggregateNeighbors(we,
        toDst = Some(col("w")), toSrc = None, mergeMsg = m => sum(m))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inW === Map(2L -> 10L, 3L -> 12L))
    // a message may read any edge attr: max outgoing weight per src
    val maxOut = Graph.aggregateNeighbors(we,
        toDst = None, toSrc = Some(col("w")), mergeMsg = m => max(m))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maxOut === Map(1L -> 10L, 2L -> 7L))
    intercept[IllegalArgumentException] {
      Graph.aggregateNeighbors(we, None, None, m => sum(m))
    }
  }

  test("edgeListFile: comments/blank skipped, whitespace split, canonical swap, parallel edges kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_edgelist").toString
    val text = Seq(
      "# comment line",
      "5 2",            // swaps to 2->5 under canonical orientation
      "1\t3",           // tab separator
      "2   4",          // run of spaces
      "",               // blank line — skipped
      "5 2",            // parallel edge — KEPT
      "# another comment",
      "2 6").mkString("\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "edges.txt"), text.getBytes("UTF-8"))

    val plain = Graph.edgeListFile(spark, dir, canonicalOrientation = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plain.count(_ == ((5L, 2L, 1L))) === 2) // dups preserved, attr 1
    assert(plain.length === 5)

    val canon = Graph.edgeListFile(spark, dir, canonicalOrientation = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(canon.toSeq === Seq(
      (1L, 3L), (2L, 4L), (2L, 5L), (2L, 5L), (2L, 6L)))

    // degrees: parallel edges counted, zero-degree vertices absent
    val deg = Graph.degrees(Graph.edgeListFile(spark, dir, canonicalOrientation = true))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(deg === Map(
      1L -> ((1L, 0L, 1L)), 2L -> ((4L, 0L, 4L)), 3L -> ((0L, 1L, 1L)),
      4L -> ((0L, 1L, 1L)), 5L -> ((0L, 2L, 2L)), 6L -> ((0L, 1L, 1L))))
  }

  test("edge partition strategies: 2D bounds hub replication at 2·sqrt(P), 1D scatters it") {
    import spark.implicits._
    // a hub as the DST of 40 distinct sources: under 2D its row index is
    // pinned by its own hash, so every incident edge lands in one column
    // stripe of the 3x3 grid (<= 3 partitions); under 1D the pid follows
    // the 40 source hashes (4i mod 9 cycles) and hits all 9
    val hub = (1L to 40L).map(i => (i, 0L)).toDF("src", "dst")
    val audit = Graph.partitionStrategyAudit(hub, 9).collect()
    val h = audit.find(_.getLong(0) == 0L).get
    assert(h.getLong(1) === 3L)
    assert(h.getLong(2) === 9L)
    // the 2·√P guarantee holds for every vertex
    assert(audit.forall(r => r.getLong(1) <= r.getLong(3)))
  }

  test("joinVertices keeps the old attribute on a miss; outerJoinVertices rewrites every vertex") {
    import spark.implicits._
    val verts = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("vertex", "attr")
    val attrs = Seq((2L, 7L)).toDF("vertex", "u") // 1 and 3 are ABSENT
    val j = Graph.joinVertices(verts, attrs, "attr + u")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(j === Map(1L -> 100L, 2L -> 207L, 3L -> 300L)) // misses untouched
    val o = Graph.outerJoinVertices(verts, attrs,
        "CASE WHEN u IS NULL THEN 0 ELSE attr + u END")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o === Map(1L -> 0L, 2L -> 207L, 3L -> 0L)) // every vertex rewritten
  }
}
