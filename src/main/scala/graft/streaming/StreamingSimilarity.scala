package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** STREAMING graph-ANN serving (r18, the query-time half of the r17 #6
  * ask on the firehose): probe vectors arrive as a stream and each is
  * answered by the SAME md5-seeded beam walk as
  * [[graft.operators.Similarity.graphSearchNeighbors]] — row-for-row, the
  * StreamingSpec twin law.
  *
  * Architecture is the production ANN-serving shape, not the batch one: a
  * serving replica holds the INDEX (graph edges + vectors + entry points)
  * in memory and answers each query row-locally — no per-query joins, no
  * state store, no watermark; the gate is a stateless `mapPartitions`
  * over the stream with the index in a broadcast. That bounds the design:
  * the index must fit an executor (every in-memory graph-ANN deployment's
  * contract); at 100 TB of raw corpus the served index is the graph plus
  * a compressed vector tier — int8 (q370) or binary (q376) codes with
  * float rerank — not the raw floats. [[buildServeIndex]] collects what
  * the walk needs and REFUSES an index over `maxIndexRows` so a corpus
  * that outgrew its replica fails loudly at build, never as an executor
  * OOM mid-stream.
  *
  * Walk parity, pinned by the spec: cosine is the sequential
  * index-order fold of [[graft.functions.CosineSimilarity]] (bit-identical
  * doubles), frontier = top-`beam` of the visited pool by (cos DESC, id
  * ASC), hops expand graph neighbors excluding the probe and anything
  * visited, answer = top-`k` of the visited pool — exactly
  * [[Similarity.graphSearchNeighbors]]' DataFrame algebra, row-local. */
object StreamingSimilarity {

  /** The broadcastable serving index: entry ids (md5-seeded, in seed
    * order), adjacency, and vectors. */
  final case class GraphServeIndex(entries: Array[Long],
    neighbors: Map[Long, Array[Long]], vecs: Map[Long, Array[Float]])

  /** Collect the serving index from the static corpus + built graph —
    * the per-epoch step next to [[graft.operators.Dedup.simHashCorpusIndex]]:
    * build once, broadcast, serve all night. Fails loudly past
    * `maxIndexRows` (the replica-memory contract). */
  def buildServeIndex(df: DataFrame, idCol: String, vecCol: String,
      graph: DataFrame, nEntry: Int, maxIndexRows: Long = 10000000L): GraphServeIndex = {
    require(nEntry >= 1, "nEntry must be positive")
    val n = df.count()
    require(n <= maxIndexRows,
      s"serve index would hold $n vectors > maxIndexRows $maxIndexRows — " +
        "serve a compressed tier (int8/binary codes) or shard the replica")
    val vecs = df.select(col(idCol).cast("long"), col(vecCol))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val entries = df.select(col(idCol).cast("long").as("__id"))
      .orderBy(md5(col("__id").cast("string")), col("__id")).limit(nEntry)
      .collect().map(_.getLong(0))
    val adj = graph.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(1)).sorted }
    GraphServeIndex(entries, adj, vecs)
  }

  /** The sequential-fold cosine of [[graft.functions.CosineSimilarity]],
    * row-local: same accumulation order, same zero-norm → null contract.
    * Bit-identical doubles by construction (the spec pins it through the
    * twin law). */
  private[graft] def cosineLocal(a: Array[Float], b: Array[Float]): java.lang.Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** One probe's walk over the index — the row-local mirror of
    * [[Similarity.graphSearchNeighbors]]' per-probe algebra. Returns the
    * ranked (rank, neighbor_id) answer. */
  private[graft] def walkOne(idx: GraphServeIndex, pid: Long, pv: Array[Float],
      k: Int, beam: Int, maxHops: Int): Seq[(Long, Long)] = {
    // (cs DESC nulls last, cid ASC) — the batch window's exact order
    val ord = new Ordering[(Long, java.lang.Double)] {
      def compare(x: (Long, java.lang.Double), y: (Long, java.lang.Double)): Int = {
        (x._2, y._2) match {
          case (null, null) => java.lang.Long.compare(x._1, y._1)
          case (null, _) => 1
          case (_, null) => -1
          case (a, b) =>
            val c = java.lang.Double.compare(b.doubleValue(), a.doubleValue())
            if (c != 0) c else java.lang.Long.compare(x._1, y._1)
        }
      }
    }
    val visited = scala.collection.mutable.LinkedHashMap.empty[Long, java.lang.Double]
    idx.entries.foreach { e =>
      if (e != pid && !visited.contains(e))
        idx.vecs.get(e).foreach(ev => visited(e) = cosineLocal(pv, ev))
    }
    var hop = 0
    while (hop < maxHops) {
      val frontier = visited.toSeq.sorted(ord).take(beam).map(_._1)
      val cand = scala.collection.mutable.LinkedHashSet.empty[Long]
      frontier.foreach { f =>
        idx.neighbors.getOrElse(f, Array.empty[Long]).foreach { d =>
          if (d != pid && !visited.contains(d)) { cand += d; () }
        }
      }
      cand.foreach(c => idx.vecs.get(c).foreach(cv => visited(c) = cosineLocal(pv, cv)))
      hop += 1
    }
    visited.toSeq.sorted(ord).take(k).zipWithIndex
      .map { case ((cid, _), i) => ((i + 1).toLong, cid) }
  }

  /** The streaming gate: stateless `mapPartitions` over arriving probe
    * vectors, index from the broadcast — (probe_id, rank, neighbor_id)
    * per answer row, exactly [[Similarity.graphSearchNeighbors]]'
    * output. */
  def graphServeGate(probes: DataFrame, index: GraphServeIndex,
      k: Int, beam: Int, maxHops: Int = 3, idCol: String = "probe_id",
      vecCol: String = "vec"): DataFrame = {
    require(k >= 1 && beam >= 1 && maxHops >= 0, "k, beam >= 1; maxHops >= 0")
    require(probes.columns.contains(idCol) && probes.columns.contains(vecCol),
      s"graphServeGate needs '$idCol' and '$vecCol' columns " +
        s"(saw ${probes.columns.mkString(", ")})")
    val spark = probes.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    probes.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = bc.value
        it.flatMap { case (pid, pv) =>
          walkOne(idx, pid, pv, k, beam, maxHops)
            .map { case (rank, cid) => (pid, rank, cid) }
        }
      }
      .toDF("probe_id", "rank", "neighbor_id")
  }
}
