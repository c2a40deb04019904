package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics — the crawl-side authority signals a
  * web-corpus pipeline feeds back into curation (a page's rank is a prior
  * on document quality, CommonCrawl publishes exactly this).
  *
  * Everything here is FIXED-POINT INTEGER arithmetic: ranks carry ×10^6
  * scaling and every division is an integral `div` in a pinned order, so
  * two engines replaying the same iterations produce bit-identical tables
  * (floating-point PageRank never hash-matches across engines; flooring
  * loses a bounded trickle of probability mass and loses it identically
  * everywhere).
  */
object Graphs {

  private val Scale = 1000000L

  /** PageRank over an edge list, `iters` synchronous iterations:
    *
    *   r₀(v)   = Scale div n
    *   rᵢ₊₁(v) = (Scale div n)·(100−d) div 100
    *             + Σ_{u→v} rᵢ(u)·d div (outdeg(u)·100)
    *
    * with `d` = dampingX100. Per-edge contributions floor BEFORE the sum
    * (the pinned cross-engine order). Dangling-node mass is dropped, the
    * documented behavior of the simplest published formulation.
    *
    * Scale shape: the edge+degree frame materializes ONCE
    * (`localCheckpoint`) and every iteration is one key-shuffled join +
    * one aggregation over it — the textbook synchronous PR plan; ranks
    * re-checkpoint per iteration so iteration N never re-executes
    * 1..N−1. Output (node, rank_x1m). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingX100: Int = 85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingX100 >= 0 && dampingX100 <= 100, "damping is a percentage")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_x1m", lit(0L))
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint() // feeds every iteration; never recompute the scan
    val init = Scale / n
    val basePart = init * (100 - dampingX100) / 100
    var ranks = nodes.withColumn("rank_x1m", lit(init)).localCheckpoint()
    var it = 0
    while (it < iters) {
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"rank_x1m * $dampingX100 div (outdeg * 100)").as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      val prev = ranks
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(basePart) + coalesce(col("in_mass"), lit(0L))).as("rank_x1m"))
        .localCheckpoint()
      graft.tools.Hygiene.quietly(prev.unpersist(blocking = false))
      it += 1
    }
    ranks
  }

  /** Multi-source BFS hop distances: the minimum number of edges from any
    * seed to each reachable node, capped at `maxHops` — the "how far is
    * this page from a trusted seed set" signal (TrustRank-style curation
    * priors weight documents by seed distance).
    *
    * Classic frontier iteration: level k+1 = (frontier ⋈ edges).dst minus
    * every node already labeled. Each level is ONE key-shuffled join + a
    * distinct + an anti join — all hash-partitioned on node id, and the
    * frontier SHRINKS as the reachable set saturates (the loop exits early
    * on an empty frontier, checked on the frame the next level needs
    * anyway). `localCheckpoint` per level caps lineage exactly like
    * [[pageRank]]; distances are exact integers, no floats anywhere.
    * Output: (node, dist) for reached nodes only, dist in [0, maxHops]. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct() // parallel edges never change a hop count; drop them once
      .localCheckpoint()
    var visited = seeds.select(col(seedCol).cast("long").as("node"))
      .filter(col("node").isNotNull).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var level = 0L
    while (level < maxHops && !frontier.isEmpty) {
      level += 1
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(level))
        .localCheckpoint()
      // visited stays EAGERLY checkpointed per level (r18 re-A/B): the
      // lazy-union form saves one job per level but makes level L's
      // anti-join read the union of L frames — O(levels²) frame reads,
      // measured q165 0.69→0.91 s on a clean close-out sweep. Reverted.
      visited = visited.union(next).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** HITS hubs & authorities, `iters` synchronous rounds of the mutual
    * recursion (authority = sum of in-neighbor hub scores, hub = sum of
    * out-neighbor authority scores), each side L1-normalized to ×10^6
    * fixed point with integral division — [[pageRank]]'s bit-identical
    * cross-engine discipline applied to Kleinberg's update.
    *
    * Initial hubs are `10^6 div n` (so score mass is ~10^6 from round
    * zero and every later sum stays ≤ ~outdeg·10^12 — far inside Long;
    * like [[pageRank]], graphs beyond ~10^6 nodes need a bigger scale
    * constant, a documented knob, not a silent overflow). Each round is
    * two key-shuffled join+aggregates over the once-materialized edge
    * frame plus TWO 1-row total reductions (the L1 masses) pulled back
    * to the driver — bounded driver traffic by construction.
    * Output: (node, hub_x1m, auth_x1m). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0)
      return nodes.withColumn("hub_x1m", lit(0L)).withColumn("auth_x1m", lit(0L))
    // One edge endpoint aggregation, normalized to the running L1 mass.
    def propagate(scores: DataFrame, scoreName: String, joinOn: String,
        groupOn: String, outName: String): DataFrame = {
      // NOTE (r18 re-A/B): checkpointing `raw` to share it between the
      // L1-total reduction and the output looked like a saved
      // join+aggregate, but the extra eager barrier measured q166
      // 1.02→1.43 s on a clean close-out sweep — the double evaluation
      // is cheaper than the materialization job at every tested scale.
      val raw = e.join(scores, e(joinOn) === scores("node"))
        .groupBy(col(groupOn).as("node"))
        .agg(sum(col(scoreName)).as("raw"))
      // max(total, 1): a zero L1 mass means every raw is zero, and 0 div 1
      // keeps them zero instead of tripping ANSI division-by-zero.
      val total = math.max(
        Option(raw.agg(sum(col("raw"))).head().get(0)).fold(0L)(_.asInstanceOf[Long]), 1L)
      nodes.join(raw, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(raw, 0) * $Scale div $total").as(outName))
        .localCheckpoint()
    }
    var hubs = nodes.withColumn("hub_x1m", lit(Scale / n)).localCheckpoint()
    var auths: DataFrame = null
    var it = 0
    while (it < iters) {
      auths = propagate(hubs, "hub_x1m", "src", "dst", "auth_x1m")
      hubs = propagate(auths, "auth_x1m", "dst", "src", "hub_x1m")
      it += 1
    }
    hubs.join(auths, "node")
  }

  /** Per-node triangle counts + local clustering coefficient via the
    * degree-ordered orientation (the "node-iterator++" / compact-forward
    * scheme): each undirected edge is directed from its lower-(degree, id)
    * endpoint to the higher one, so every wedge is enumerated exactly once
    * at its lowest-rank apex and oriented out-degrees are bounded by
    * O(√m) on ANY graph — the standard arboricity trick that keeps
    * distributed triangle counting alive under power-law degree skew
    * (a celebrity node with 10⁸ followers contributes zero wedges as an
    * apex; its edges are all inbound).
    *
    * Plan shape: dedupe + degree + orient are three linear key-shuffles;
    * then ONE wedge equi-join on the oriented edges and ONE closure
    * equi-join back against the (distinct) oriented edge set — no node
    * ever self-joins its full unoriented neighborhood. The oriented edge
    * frame materializes once and feeds all three join sides.
    *
    * Clustering coefficient is fixed-point ×10^6 with integral division
    * (2·T(v)·10^6 div (deg·(deg−1))) — bit-identical cross-engine, no
    * float ratios. Output: (node, degree, triangles, clustering_x1m). */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    val und = raw
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val degA = deg.select(col("node").as("a"), col("degree").as("da"))
    val degB = deg.select(col("node").as("b"), col("degree").as("db"))
    // a < b canonically, so `da <= db` IS the (degree, id) tie-break: ties
    // orient a→b, giving a total order and an acyclic oriented graph.
    val oriented = und.join(degA, "a").join(degB, "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("lo"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("hi"))
      .localCheckpoint() // feeds three join sides; compute the orient once
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("x"), col("e1.hi").as("y"), col("e2.hi").as("z"))
      .join(oriented.select(col("lo").as("x"), col("hi").as("z")), Seq("x", "z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering_x1m",
        when(col("degree") >= 2,
          expr("triangles * 2000000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }

  /** Every node's root and depth in a forest, by POINTER DOUBLING: each
    * round replaces every node's ancestor pointer with its ancestor's
    * ancestor and adds the two path lengths, so the known-ancestor
    * distance DOUBLES per round — a depth-d forest converges in ⌈log₂ d⌉
    * self-joins, where [[bfsDistances]]-style level walking would take d
    * shuffles (the difference between 7 rounds and 100 for a deep
    * hierarchy at corpus scale). Roots are rows with NULL parent; their
    * pointer is a depth-0 self-loop, the fold's fixed point, so converged
    * chains pass through later rounds unchanged and `iters` only needs
    * `2^iters ≥ max depth` — overshooting is idempotent, not wrong.
    * Every round is ONE hash self-join on the pointer plus a
    * `localCheckpoint` to stop the doubled lineage itself growing
    * exponentially. Output: (node, root, depth). */
  /** Single-source(s) weighted shortest paths, `maxIters` rounds of
    * synchronous Bellman–Ford relaxation — the weighted sibling of
    * [[bfsDistances]] (hop counts can't rank a weighted crawl graph or a
    * cost-annotated lineage). Each round relaxes EVERY edge once: one
    * key-shuffled join (current distances × out-edges) and one min
    * aggregate; `maxIters ≥` the longest shortest-path's hop count
    * guarantees exactness (n−1 in the worst case — for the small
    * diameters real link graphs have, a few rounds), and extra rounds
    * are fixed-point no-ops, not errors. Negative weights are rejected:
    * without a negative-cycle check Bellman–Ford would silently loop
    * value-down forever. `localCheckpoint` every 3rd round caps lineage
    * like [[pageRank]]. Output: (node, dist) for reached nodes. */
  def ssspBellmanFord(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      maxIters: Int): DataFrame = {
    require(maxIters >= 1, "maxIters must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(weightCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    require(e.filter(col("w") < 0).isEmpty,
      "negative edge weights need a negative-cycle check; not supported")
    var dist = seeds.select(col(seedCol).cast("long").as("node"))
      .filter(col("node").isNotNull).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (i <- 1 to maxIters) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed).groupBy("node").agg(min("dist").as("dist"))
      if (i % 3 == 0 || i == maxIters) dist = dist.localCheckpoint()
    }
    dist
  }

  def treeRootsByDoubling(nodes: DataFrame, nodeCol: String, parentCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 40, "iters: 2^iters must cover max depth")
    var cur = nodes.select(col(nodeCol).cast("long").as("node"),
        coalesce(col(parentCol).cast("long"), col(nodeCol).cast("long")).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val b = cur.select(col("node").as("__bn"), col("anc").as("__ba"),
        col("depth").as("__bd"))
      cur = cur.join(b, col("anc") === col("__bn"))
        .select(col("node"), col("__ba").as("anc"),
          (col("depth") + col("__bd")).as("depth"))
      if (i % 3 == 0 || i == iters) cur = cur.localCheckpoint()
    }
    cur.select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** k-core decomposition by bounded peeling: repeatedly drop nodes whose
    * degree within the SURVIVING subgraph is < k. Returns the survivors of
    * `rounds` peeling rounds with their within-core degree — deterministic
    * for any `rounds` (the caller's spec asserts fixpoint is reached on its
    * data, making the output the true k-core).
    *
    * Edges are treated as an undirected simple graph (normalized to
    * (min,max), deduped, self-loops dropped). Each round is one degree
    * aggregate + one semi-join — linear hash shuffles on node id, no
    * all-pairs anything; `localCheckpoint` every 3rd round caps lineage
    * exactly like the other fixed-point walks here. */
  def kCoreSurvivors(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 64, "rounds out of range")
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val inc = und.select(col("a").as("node"), col("b").as("other"))
      .unionByName(und.select(col("b").as("node"), col("a").as("other")))
    var alive = inc.select("node").distinct().localCheckpoint()
    var deg: DataFrame = null
    // Early exit at fixpoint is SOUND here: survivor sets only ever shrink
    // (alive_r ⊆ alive_{r-1}), so an unchanged COUNT implies an unchanged
    // SET — and from a fixpoint every further round is identity. Each round
    // checkpoints its (small, shrinking) survivor frame, so the count is a
    // cheap local read and lineage never grows.
    var prevCount = -1L
    var i = 0
    while (i < rounds && {
        deg = inc
          .join(alive.withColumnRenamed("node", "__x"), col("node") === col("__x"), "left_semi")
          .join(alive.withColumnRenamed("node", "__y"), col("other") === col("__y"), "left_semi")
          .groupBy("node").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .localCheckpoint()
        alive = deg.select("node")
        val c = deg.count()
        val changed = c != prevCount
        prevCount = c
        changed
      }) { i += 1 }
    deg
  }

  /** Kahn topological layers — the dependency-scheduling primitive under
    * every dbt-style model DAG (the reference's own world: models build in
    * waves, and wave k is exactly the set of models whose longest
    * dependency chain has length k). Iteratively peel in-degree-0 nodes:
    * peeled set = wave, remove their outgoing edges, repeat. Nodes that
    * can never peel — in (or downstream of) a CYCLE — come back with
    * level −1: surfaced as data, never silently dropped, because a cyclic
    * model graph is a bug the scheduler must refuse. A deep-but-ACYCLIC
    * graph whose depth exceeds `maxIters` is a different condition (the
    * caller's budget is wrong, not the graph) and must not masquerade as
    * a cycle — if the wave budget runs out while peelable roots still
    * exist, the walk throws instead of mislabeling a valid DAG.
    *
    * Each wave is one anti-join (current roots) + one semi-join (edge
    * removal) — keyed shuffles, no all-pairs; `localCheckpoint` caps
    * lineage per wave like every iterative walk here. Wave count = DAG
    * depth, the same bound any scheduler pays.
    *
    * Leaner wave loops were A/B-measured and rejected (r12): deriving the
    * survivor set in one chained semi-join and the layers lazily between
    * checkpoints took q306 4.2→5.7 s (the deferred anti-joins pile into
    * one giant final plan); an eager-layer variant landed at 4.1 s ≈
    * parity. The wall cost is the sequential barrier rounds themselves —
    * DAG depth × fixed job latency — not the per-wave bookkeeping, so the
    * simpler three-frame form stays. */
  def topoLayers(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int, driverThreshold: Long = 1000000L): DataFrame = {
    require(maxIters >= 1 && maxIters <= 256, "maxIters out of range")
    // Hybrid execution (r18, the [[graft.operators.Dedup.connectedComponents]]
    // pattern): model/build DAGs are metadata-sized — below
    // `driverThreshold` edges the peel runs as driver-side Kahn waves
    // (one collect, no per-wave job chains; the distributed loop costs
    // ~7 jobs PER WAVE and q306's 16-deep DAG paid ~112). Above the
    // threshold the distributed peel below takes over. Identical results:
    // wave index = level, same maxIters refusal, same cyclic -1 sentinel.
    val spark0 = edges.sparkSession
    val probe = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .limit((driverThreshold + 1).toInt).collect()
    if (probe.length <= driverThreshold) {
      val edgePairs = probe.map(r => (r.getLong(0), r.getLong(1))).distinct
      val adj = edgePairs.groupBy(_._1)
      val indeg = scala.collection.mutable.Map.empty[Long, Int]
      val nodes = scala.collection.mutable.LinkedHashSet.empty[Long]
      edgePairs.foreach { case (a, b) =>
        nodes += a; nodes += b
        indeg(b) = indeg.getOrElse(b, 0) + 1
        indeg.getOrElseUpdate(a, 0)
      }
      var frontier: Seq[Long] = nodes.toSeq.filter(n => indeg(n) == 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var level = 0
      while (frontier.nonEmpty && level < maxIters) {
        frontier.foreach(n => out += ((n, level)))
        val next = scala.collection.mutable.ArrayBuffer.empty[Long]
        frontier.foreach { n =>
          adj.getOrElse(n, Array.empty[(Long, Long)]).foreach { case (_, m) =>
            indeg(m) -= 1
            if (indeg(m) == 0) next += m
          }
        }
        frontier = next.toSeq
        level += 1
      }
      if (frontier.nonEmpty)
        throw new IllegalStateException(
          s"topoLayers: wave budget maxIters=$maxIters exhausted but the graph " +
            "still has peelable roots — the DAG is deeper than maxIters, not cyclic; " +
            "raise maxIters")
      val peeled = out.map(_._1).toSet
      val cyclic = nodes.toSeq.filterNot(peeled).map(n => (n, -1))
      import spark0.implicits._
      return (out.toSeq ++ cyclic).toDF("node", "level")
    }
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val allNodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var remainingNodes = allNodes
    var remainingEdges = e0
    var layers = List.empty[DataFrame]
    var level = 0
    var done = false
    while (level < maxIters && !done) {
      val roots = remainingNodes
        .join(remainingEdges.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_anti")
        .localCheckpoint()
      if (roots.isEmpty) { done = true } // only cycles remain
      else {
        layers ::= roots.withColumn("level", lit(level))
        remainingNodes = remainingNodes.join(roots, Seq("node"), "left_anti")
          .localCheckpoint()
        // an edge stays live only while its SOURCE is unpeeled — peeling a
        // root consumes its outgoing edges and may free its targets
        remainingEdges = e0
          .join(remainingNodes.select(col("node").as("src")), Seq("src"), "left_semi")
          .localCheckpoint()
        level += 1
        if (remainingNodes.isEmpty) done = true
      }
    }
    if (!done) {
      // budget exhausted with nodes unpeeled: roots still exist iff the
      // graph is acyclic-but-deeper-than-maxIters — refuse loudly rather
      // than stamping a valid DAG with the cycle sentinel
      val rootsLeft = !remainingNodes
        .join(remainingEdges.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_anti")
        .isEmpty
      if (rootsLeft)
        throw new IllegalStateException(
          s"topoLayers: wave budget maxIters=$maxIters exhausted but the graph " +
            "still has peelable roots — the DAG is deeper than maxIters, not cyclic; " +
            "raise maxIters")
    }
    val cyclic = remainingNodes.withColumn("level", lit(-1))
    (cyclic :: layers).reduce(_ unionByName _)
  }

  /** Synchronous label propagation — COMMUNITIES, not components: each
    * round every node adopts the most frequent label among its neighbors
    * (ties broken by MIN label), so a single bridge edge between two dense
    * blocks cannot relabel either side — the mode is robust where
    * connected components (any of the three CC walks here) would merge the
    * blocks outright. That robustness is exactly what near-dup cluster
    * hygiene wants: boilerplate families stay separate communities even
    * when one chain document touches both.
    *
    * Deterministic by construction: synchronous rounds (all updates read
    * the PREVIOUS round's labels), count-desc-then-min-label tie-break,
    * init label = node id. A fixed small `rounds` is the right contract —
    * LPA is known to oscillate under synchronous update on bipartite-ish
    * structures, so callers pin rounds (dense communities settle in 2–3)
    * rather than chase an unstable fixpoint.
    *
    * Scale shape per round: one keyed join (labels onto incidence), one
    * (node, label) aggregate, one per-node window pick — linear keyed
    * shuffles, no all-pairs term; `localCheckpoint` per round caps lineage
    * like every iterative walk in this module. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds out of range")
    import org.apache.spark.sql.expressions.Window
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val inc = und.select(col("a").as("node"), col("b").as("other"))
      .unionByName(und.select(col("b").as("node"), col("a").as("other")))
      .localCheckpoint()
    val nodes = inc.select("node").distinct().localCheckpoint()
    var labels = nodes.withColumn("lbl", col("node")).localCheckpoint()
    val w = Window.partitionBy("node").orderBy(col("__c").desc, col("lbl"))
    for (_ <- 1 to rounds) {
      val picked = inc
        .join(labels.select(col("node").as("other"), col("lbl")), Seq("other"))
        .groupBy("node", "lbl").agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("node", "lbl")
      labels = nodes
        .join(picked, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
        .localCheckpoint()
    }
    labels
  }
}
