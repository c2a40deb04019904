package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Hand-computed golden tests for the LLM-pipeline extension operators. */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // exact dup of 1
    (3L, "the cat sat on a mat"),   // near dup of 1
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val r = Dedup.exactByContent(docs, "doc_id", "text").collect()
    assert(r.length == 3)
    val dupGroup = r.find(_.getAs[Long]("group_size") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", numHashes = 8, bandSize = 2, shingleK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide in every band
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }) // disjoint shingles can't collide
  }

  test("simhash: identical docs get identical hashes; near dups are close") {
    val hs = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(3L)) < hamming(hs(1L), hs(4L)))
  }

  test("jaccard pairs: exact integer intersection/union on blocked pairs") {
    val r = Dedup.jaccardPairs(docs, "doc_id", "text",
      blockExprs = Seq(lit(1)), minJaccardPct = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // docs 1,2 identical: words {the,cat,sat,on,mat} -> 5/5
    assert(r((1L, 2L)) == ((5L, 5L)))
    // docs 1,3: {the,cat,sat,on,mat} vs {the,cat,sat,on,a,mat} -> 5/6
    assert(r((1L, 3L)) == ((5L, 6L)))
    assert(!r.contains((1L, 4L)))
  }

  test("jaccard block cap and embedding bucket cap bound degenerate corpora") {
    // 100 docs in ONE jaccard block -> 4950 candidate pairs; cap drops the block
    val boiler = (1L to 100L).map(i => (i, s"shared tokens everywhere plus t$i")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(boiler, "doc_id", "text",
      blockExprs = Seq(lit(1)), minJaccardPct = 10, maxBlockSize = 50)
    assert(capped.count() == 0)
    // identical vectors all land in one bucket regardless of plane quality
    val same = (1L to 40L).map(i => (i, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cappedEmb = Dedup.embeddingNearDupPairs(same, "vec_id", "embedding",
      bits = 4, minCosineX100 = 10, maxBucketSize = 20)
    assert(cappedEmb.count() == 0)
    // under the cap the same corpus produces all pairs
    val uncapped = Dedup.embeddingNearDupPairs(same, "vec_id", "embedding",
      bits = 4, minCosineX100 = 10, maxBucketSize = 100)
    assert(uncapped.count() == 40L * 39 / 2)
  }

  test("hashed-token jaccard finds the same pairs as the string form") {
    val str = Dedup.jaccardPairs(docs, "doc_id", "text",
      blockExprs = Seq(lit(1)), minJaccardPct = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val hashed = Dedup.jaccardPairsHashed(docs, "doc_id", "text",
      blockExprs = Seq(lit(1)), minJaccardPct = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(str == hashed) // no 32-bit collisions on these token sets
  }

  test("levenshtein pairs verify within prefix blocks") {
    val r = Dedup.levenshteinPairs(docs, "doc_id", "text", prefixLen = 7, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(r((1L, 2L)) == 0L)
    assert(r((1L, 3L)) == 3L) // "the mat" vs "a mat": replace t->a? dist('the','a') edit = 3
  }

  test("levenshtein block cap bounds a pathological common-prefix corpus") {
    // 200 docs sharing a 20-char boilerplate prefix (ubiquitous in web
    // corpora) would otherwise produce 200*199/2 = 19900 candidate pairs.
    val boiler = (1L to 200L).map(i => (i, s"Terms of Service v2 $i unique tail ${i * 37}"))
    val organic = Seq((900L, "organic text one x"), (901L, "organic text one y"))
    val corpus = (boiler ++ organic).toDF("doc_id", "text")
    val capped = Dedup.levenshteinPairs(corpus, "doc_id", "text",
      prefixLen = 16, maxDist = 50, maxBlockSize = 100)
    // the over-common block is dropped entirely; the small organic block survives
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((900L, 901L)))
  }

  test("levenshtein length-difference prune never changes results") {
    // prune is a lower bound on edit distance: results with a huge maxBlockSize
    // equal the unpruned all-in-block pairs computed naively
    val r = Dedup.levenshteinPairs(docs, "doc_id", "text", prefixLen = 4, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 1,2,3 share "the " prefix; 1-3 dist 2 ("the"->"a" ... ) within 5, 1-2 = 0
    assert(r((1L, 2L)) == 0L)
    assert(r.contains((1L, 3L)) == (r((1L, 3L)) <= 5L))
  }

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),  // cos 1.0 with probe
    (2L, Array(0.0f, 1.0f, 0.0f)),  // cos 0.0
    (3L, Array(0.7071f, 0.7071f, 0.0f)) // cos ~0.7071
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity") {
    val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probeId = 0L, k = 3).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
    assert(r(0).getDecimal(1).doubleValue() == 1.0)
    assert(math.abs(r(1).getDecimal(1).doubleValue() - 0.7071) < 1e-4)
  }

  test("sign-bucket LSH only searches the probe's bucket") {
    val r = Similarity.lshTopK(vecs, "vec_id", "embedding", probeId = 0L, k = 5, bits = 2,
      axisAligned = true)
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(1L)) // only vec 1 shares bucket (x>0, y<=0)
  }

  test("hyperplane LSH finds identical vectors (same projections, same bucket)") {
    val r = Similarity.lshTopK(vecs, "vec_id", "embedding", probeId = 0L, k = 5, bits = 3)
      .collect().map(_.getLong(0)).toSet
    assert(r.contains(1L)) // identical vector always lands in the probe's bucket
  }

  test("hyperplane buckets are deterministic and balanced on biased embeddings") {
    graft.functions.GraftFunctions.register(spark)
    // biased corpus: EVERY dimension positive -> axis-sign bucketing collapses
    // all rows into one bucket (2^bits-1); hyperplanes must still spread them
    val n = 512
    val dims = 16
    val biased = (0 until n).map { r =>
      val rnd = new scala.util.Random(r * 7919L + 13L)
      (r.toLong, Array.fill(dims)(0.25f + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val bits = 6
    val axis = biased.select(Similarity.signBucket("embedding", bits).as("b"))
      .groupBy("b").count().collect()
    assert(axis.length == 1) // the failure mode: total collapse
    val hp1 = biased.select(col("vec_id"), Similarity.hyperplaneBucket("embedding", bits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hp2 = biased.select(col("vec_id"), Similarity.hyperplaneBucket("embedding", bits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hp1 == hp2) // fixed seed => reproducible across runs
    val occupancy = hp1.values.groupBy(identity).map(_._2.size)
    // balanced-ish: many buckets used and no bucket hoards the corpus
    assert(occupancy.size >= (1 << bits) / 4, s"only ${occupancy.size} buckets used")
    assert(occupancy.max <= n / 4, s"largest bucket ${occupancy.max} of $n")
  }

  test("IVF k-means refinement: deterministic and recall@10 over threshold on testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probeId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    def ivfIds(iters: Int): Seq[Long] =
      Similarity.ivfTopK(emb, "vec_id", "embedding", probeId = 0L, k = 10,
        nlist = 16, nprobe = 4, kmeansIters = iters)
        .collect().map(_.getLong(0)).toSeq
    val refined = ivfIds(2)
    assert(refined == ivfIds(2)) // deterministic seeding + Lloyd => identical runs
    val recall = refined.toSet.intersect(brute).size / 10.0
    assert(recall >= 0.5, s"refined IVF recall@10 = $recall")
    // refinement must not be a no-op: centroids actually move
    val seeds = Similarity.refineCentroids(emb, "vec_id", "embedding", nlist = 16, iters = 0)
    val moved = Similarity.refineCentroids(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    assert(seeds.map(_._1) == moved.map(_._1)) // stable list ids
    assert(seeds.zip(moved).exists { case ((_, a), (_, b)) => !a.sameElements(b) })
  }

  test("incremental IVF: frozen assignment matches base index, planted drift is quantified") {
    // base: two tight clusters around e0 (dims 0..3 hot) and e1 (dims 4..7
    // hot); batch: a NEW region (dims 8..11 hot) the frozen index has
    // never seen. Deterministic jitter, no RNG.
    val dims = 16
    def vec(hot: Range, seed: Int) = Array.tabulate(dims)(d =>
      (if (hot.contains(d)) 1.0f else 0.0f) + 0.01f * (((seed * 31 + d * 7) % 10) - 5))
    val base = ((0 until 20).map(i => (i.toLong, vec(0 until 4, i))) ++
      (20 until 40).map(i => (i.toLong, vec(4 until 8, i)))).toDF("vec_id", "embedding")
    val batch = (40 until 60).map(i => (i.toLong, vec(8 until 12, i)))
      .toDF("vec_id", "embedding")
    // frozen-ness: batch assignment equals assignToCentroids under the
    // base-only fit — the index did NOT move when the batch landed
    val frozenCents = Similarity.refineCentroids(base, "vec_id", "embedding",
      nlist = 4, iters = 2)
    val inc = Similarity.incrementalIvfAssign(base, batch, "vec_id", "embedding",
        nlist = 4, kmeansIters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Similarity.assignToCentroids(batch, "embedding", frozenCents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    assert(inc == direct && inc.keySet == (40L until 60L).toSet)
    // drift certificate on the planted shift: the refit must re-tile part
    // of the space (the new region pulls centroids), and for a BATCH
    // probe the refit index must serve at least the frozen recall
    val drift = Similarity.incrementalIvfDrift(base, batch, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2, probeId = 40L, k = 5, nprobe = 1).collect().head
    assert(drift.getAs[Long]("n_base") == 40L && drift.getAs[Long]("n_batch") == 20L)
    assert(drift.getAs[Long]("n_union") == 60L)
    assert(drift.getAs[Long]("n_moved") > 0L, "planted drift must move assignments")
    assert(drift.getAs[Long]("moved_pct_x100") ==
      drift.getAs[Long]("n_moved") * 10000L / 60L)
    val rf = drift.getAs[Long]("recall_frozen_x100")
    val rr = drift.getAs[Long]("recall_refit_x100")
    assert(rf >= 0L && rf <= 100L && rr >= 0L && rr <= 100L)
    assert(rr >= rf, s"refit recall $rr must not trail frozen $rf on the drifted probe")
    assert(rr == 100L, s"refit tiles the new region: its nprobe=1 list holds the cluster ($rr)")
    // no drift: identical distributions -> refit re-tiles little to
    // nothing and frozen recall holds at refit level
    val batch2 = (40 until 60).map(i => (i.toLong, vec(0 until 4, i)))
      .toDF("vec_id", "embedding")
    val same = Similarity.incrementalIvfDrift(base, batch2, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2, probeId = 40L, k = 5, nprobe = 2).collect().head
    assert(same.getAs[Long]("recall_frozen_x100") >= same.getAs[Long]("recall_refit_x100") - 20L)
  }

  test("partial refit: only drifted tiles re-center and re-assign, recall matches the full refit") {
    val dims = 16
    def vec(hot: Range, seed: Int) = Array.tabulate(dims)(d =>
      (if (hot.contains(d)) 1.0f else 0.0f) + 0.01f * (((seed * 31 + d * 7) % 10) - 5))
    val base = ((0 until 20).map(i => (i.toLong, vec(0 until 4, i))) ++
      (20 until 40).map(i => (i.toLong, vec(4 until 8, i)))).toDF("vec_id", "embedding")
    val batch = (40 until 60).map(i => (i.toLong, vec(8 until 12, i)))
      .toDF("vec_id", "embedding")
    val r = Similarity.incrementalIvfPartialRefit(base, batch, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2, driftX1m = 100000L,
      probeId = 40L, k = 5, nprobe = 1).head()
    // the new region lands in few tiles: those (and ONLY those) refit,
    // so the partial path touches a fraction of the corpus...
    val refitTiles = r.getAs[Long]("n_tiles_refit")
    assert(refitTiles >= 1L && refitTiles < 4L, s"refit tiles = $refitTiles")
    assert(r.getAs[Long]("n_touched") < r.getAs[Long]("n_union"),
      "partial refit must not touch the whole corpus")
    assert(r.getAs[Long]("touched_pct_x100") ==
      r.getAs[Long]("n_touched") * 10000L / r.getAs[Long]("n_union"))
    // ...while recovering most of the full refit's recall gain: golden
    // values on this deterministic fixture — frozen 20 (the new region is
    // untiled), partial 80 after re-centering ONE tile's 20 members,
    // full refit 100 after re-tiling all 60
    assert(r.getAs[Long]("recall_frozen_x100") == 20L)
    assert(r.getAs[Long]("recall_partial_x100") == 80L)
    assert(r.getAs[Long]("recall_refit_x100") == 100L)
    // quiet corpus: a batch from the SAME distribution drifts no tile —
    // the policy correctly does nothing and partial degenerates to frozen
    val batch2 = (40 until 60).map(i => (i.toLong, vec(0 until 4, i)))
      .toDF("vec_id", "embedding")
    val q = Similarity.incrementalIvfPartialRefit(base, batch2, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2, driftX1m = 100000L,
      probeId = 40L, k = 5, nprobe = 2).head()
    assert(q.getAs[Long]("n_tiles_refit") == 0L)
    assert(q.getAs[Long]("n_touched") == 0L)
    assert(q.getAs[Long]("recall_partial_x100") == q.getAs[Long]("recall_frozen_x100"))
  }

  test("multi-probe LSH improves recall@10 over single-probe at equal bits") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // probe buckets: element 0 is exactly the single-probe bucket; alternates
    // are distinct single-bit flips of it
    val pb = emb.limit(50)
      .select(Similarity.hyperplaneBucket("embedding", 8).as("b"),
        graft.functions.GraftFunctions
          .hyperplaneProbeBuckets(col("embedding"), 8, 3, Similarity.DefaultPlaneSeed).as("pbs"))
      .collect()
    pb.foreach { r =>
      val b = r.getLong(0)
      val alts = r.getSeq[Long](1)
      assert(alts.head == b && alts.distinct.size == 3)
      alts.tail.foreach(a => assert(java.lang.Long.bitCount(a ^ b) == 1))
    }
    // recall@10 vs brute force, averaged over probes: probing the 2 extra
    // lowest-margin buckets must recover strictly more true neighbors in
    // aggregate than single-bucket search at the same bits
    val probeIds = (0L until 15L)
    def recallSum(probes: Int): Double = probeIds.map { pid =>
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", pid, k = 10)
        .collect().map(_.getLong(0)).toSet
      val ann = Similarity.lshTopK(emb, "vec_id", "embedding", pid, k = 10,
        bits = 8, probes = probes)
        .collect().map(_.getLong(0)).toSet
      ann.intersect(brute).size / 10.0
    }.sum
    val (r1, r3) = (recallSum(1), recallSum(3))
    assert(r3 > r1, s"multi-probe recall sum $r3 not above single-probe $r1")
    // multi-probe candidates are a superset per probe: single-probe results
    // can only be re-ranked out by BETTER in-bucket candidates, and the knn
    // join form agrees with the top-k form under the same config
    val knn = Similarity.lshKnnJoin(emb, "vec_id", "embedding",
      probeFilter = col("vec_id") === 0L, k = 10, bits = 8, probes = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val topk = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, k = 10, bits = 8, probes = 3)
      .collect().map(_.getLong(0)).toSet
    assert(knn == topk)
  }

  test("lsh knn join only scores in-bucket candidates per probe") {
    // axis buckets with bits=2: vec 0/1 share bucket 1 (x>0), vec 2 is bucket 2
    val r = Similarity.lshKnnJoin(vecs, "vec_id", "embedding",
      probeFilter = col("vec_id") <= 2, k = 5, bits = 2, axisAligned = true)
      .collect().map(x => (x.getAs[Long]("probe_id"), x.getAs[Long]("neighbor_id"))).toSet
    assert(r.contains((0L, 1L)) && r.contains((1L, 0L)))
    assert(!r.exists { case (p, n) => p == 2L && (n == 0L || n == 1L) }) // cross-bucket never scored
  }

  test("canonical pick per cluster keeps highest quality, min id on ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 1L))
      .toDF("doc_id", "q")
    val r = Dedup.canonicalPerCluster(clusters, quality, "doc_id", "q")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((2L, 3L))) // q=9 tie between 2 and 3 -> min id 2; size 3
    assert(r(10L) == ((10L, 2L)))
  }

  test("knn join returns k ranked neighbors per probe") {
    val r = Similarity.knnJoin(vecs, "vec_id", "embedding", col("vec_id") <= 1, k = 2)
      .collect()
    assert(r.length == 4)
    val probe0 = r.filter(_.getAs[Long]("probe_id") == 0L).sortBy(_.getAs[Int]("rank"))
    assert(probe0.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L))
  }

  test("knn join via bounded top-k aggregator matches the window form") {
    val win = Similarity.knnJoin(vecs, "vec_id", "embedding", col("vec_id") <= 1, k = 2)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val agg = Similarity.knnJoinAgg(vecs, "vec_id", "embedding", col("vec_id") <= 1, k = 2)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(win.sameElements(agg))
  }

  test("connected components labels transitive near-dup clusters by min id") {
    val pairs = Seq( // chain 1-2-3, pair 10-11, triangle 20-21-22
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    val ccDriver = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDriver == expected)
    // distributed propagation path must agree with union-find
    val ccDist = Dedup.connectedComponentsDistributed(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDist == expected)
  }

  test("distributed components: high-diameter path converges with bounded plan depth") {
    // a 25-node path graph (diameter 24) forces ~24 propagation rounds —
    // without lineage truncation each round nests the previous round's plan
    val path = (0L until 24L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponentsDistributed(path, "a", "b",
      maxIters = 40, checkpointEvery = 5)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 24L).map(_ -> 0L).toMap) // converged: everything labels to min id 0
    // localCheckpoint every 5 rounds cuts the returned frame's lineage to a
    // materialized leaf — plan depth bounded by the checkpoint interval, not
    // the ~24 iterations run
    val planLines = labels.queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    assert(planLines < 60, s"plan depth grew with iterations: $planLines lines")
  }

  test("CDC join delta with retractions matches full recompute as a multiset") {
    // R: delete k=1, update k=2 (10->99), insert k=4
    val r0 = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("k", "rv")
    val dr = Seq((1L, 10L, -1L), (2L, 10L, -1L), (2L, 99L, 1L), (4L, 40L, 1L))
      .toDF("k", "rv", "m")
    // S is a multiset (duplicate (2,7) payload); delete ONE copy of (2,7),
    // insert (1,8) (lands on a deleted R key -> must not resurrect), (4,9)
    val s0 = Seq((2L, 7L), (2L, 7L), (2L, 5L), (3L, 6L)).toDF("k", "sv")
    val ds = Seq((2L, 7L, -1L), (1L, 8L, 1L), (4L, 9L, 1L)).toDF("k", "sv", "m")
    val j0 = r0.join(s0, "k")
    val delta = graft.operators.Ivm.joinDeltaCdc(r0, dr, s0, ds, "k")
    val maintained = graft.operators.Ivm.applyDelta(j0, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // final states: r1 = {(2,99),(3,30),(4,40)}, s1 = {(2,7),(2,5),(3,6),(1,8),(4,9)}
    val expected = Set(
      (2L, 99L, 7L, 1L), (2L, 99L, 5L, 1L), // k=2: new rv joins surviving copies
      (3L, 30L, 6L, 1L), (4L, 40L, 9L, 1L)) // deleted k=1 never resurrects
    assert(maintained == expected)
  }

  test("star contraction matches union-find labels on mixed graph shapes") {
    // chain + triangle + pair + two bridged stars, plus deterministic
    // pseudo-random edges — every shape must agree with driver union-find
    val fixed = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (20L, 22L), (30L, 31L), (30L, 32L), (40L, 41L), (40L, 42L), (32L, 42L))
    val rand = (0 until 300).map { i =>
      val a = (i.toLong * 2654435761L) % 97
      val b = (i.toLong * 40503L + 7) % 97
      (a + 100, b + 100)
    }.filter { case (a, b) => a != b }
    val pairs = (fixed ++ rand).toDF("a", "b")
    val expected = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.connectedComponentsStarContraction(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("star contraction: 10k-node chain converges in O(log n) rounds") {
    // diameter 9999 — min-label propagation would need ~10^4 shuffle
    // rounds; star contraction must close it in ~log2(10k) ≈ 14
    val chain = (0L until 9999L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.starContractionWithRounds(chain, "a", "b")
    assert(rounds <= 15, s"expected O(log n) rounds, took $rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 10000)
    assert(got.forall(_._2 == 0L), "all chain nodes must label to min id 0")
  }

  test("bounded intra pairs: degenerate component is sampled, not enumerated") {
    // one planted 1000-member chain component + one 4-member component:
    // the audit must NOT go quadratic on the big one (999*1000/2 pairs)
    val edges = ((0L until 999L).map(i => (i, i + 1)) ++
      Seq((5000L, 5001L), (5001L, 5002L), (5002L, 5003L))).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, "a", "b")
    val pairs = Dedup.boundedIntraPairs(cc, maxMembers = 64).collect()
    val big = pairs.filter(_.getAs[Long]("component") == 0L)
    val small = pairs.filter(_.getAs[Long]("component") == 5000L)
    // big component: exactly the 64 smallest ids' pairs, all flagged sampled
    assert(big.length == 64 * 63 / 2)
    assert(big.forall(_.getAs[Long]("exact") == 0L))
    assert(big.forall(r => r.getAs[Long]("a_id") < 64L && r.getAs[Long]("b_id") < 64L))
    // small component: full enumeration, flagged exact
    assert(small.length == 4 * 3 / 2)
    assert(small.forall(_.getAs[Long]("exact") == 1L))
    // deterministic: same input, same sample
    val again = Dedup.boundedIntraPairs(cc, maxMembers = 64).collect()
    assert(pairs.map(_.toSeq).sortBy(_.toString).sameElements(
      again.map(_.toSeq).sortBy(_.toString)))
  }

  test("bucketed range join equals the naive containment join") {
    val points = Seq((1L, 0.5), (2L, 10.0), (3L, -3.2), (4L, 99.9)).toDF("pid", "x")
    val intervals = Seq((10L, 0.0, 1.0), (11L, -5.0, 15.0), (12L, 9.9, 10.0), (13L, 50.0, 60.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.bucketedRangeJoin(points, "x", intervals, "lo", "hi", width = 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 11L))
    assert(got == expected)
  }

  test("as-of join picks the most recent right row at or before left time") {
    val quotes = Seq( // (key, time, quote_id)
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L)
    ).toDF("k", "qt", "quote_id")
    val trades = Seq( // (key, time, trade_id)
      (1L, 5L, 1L),   // before any quote -> null
      (1L, 20L, 2L),  // exactly at quote 101 -> inclusive match
      (1L, 25L, 3L),  // -> quote 101
      (1L, 99L, 4L),  // -> quote 102
      (2L, 16L, 5L),  // -> quote 200
      (3L, 50L, 6L)   // key with no quotes -> null
    ).toDF("k", "tt", "trade_id")
    val r = AsofJoin.asofJoin(trades, "k", "tt", quotes, "k", "qt", Seq("quote_id"))
      .orderBy("trade_id")
      .collect()
      .map(x => x.getAs[Long]("trade_id") -> Option(x.getAs[Any]("asof_quote_id")))
      .toMap
    assert(r(1L).isEmpty)
    assert(r(2L).contains(101L))
    assert(r(3L).contains(101L))
    assert(r(4L).contains(102L))
    assert(r(5L).contains(200L))
    assert(r(6L).isEmpty)
  }

  test("as-of join with STRING keys matches per key (no silent cast collapse)") {
    // Regression: keys used to be .cast("long"), so "AAPL" -> null on every
    // row, every key collapsed into one window partition, and trades silently
    // matched other tickers' quotes. Raw-key partitioning must keep them apart.
    val quotes = Seq(
      ("AAPL", 10L, 100L), ("AAPL", 30L, 101L),
      ("MSFT", 20L, 200L),
      ("GOOG", 5L, 300L)
    ).toDF("sym", "qt", "quote_id")
    val trades = Seq(
      ("AAPL", 25L, 1L), // -> AAPL@10 (NOT MSFT@20, which is nearer in time)
      ("MSFT", 25L, 2L), // -> MSFT@20
      ("GOOG", 25L, 3L), // -> GOOG@5
      ("TSLA", 25L, 4L)  // no quotes for key -> null, not someone else's
    ).toDF("sym", "tt", "trade_id")
    val r = AsofJoin.asofJoin(trades, "sym", "tt", quotes, "sym", "qt", Seq("quote_id"))
      .collect()
      .map(x => x.getAs[Long]("trade_id") -> Option(x.getAs[Any]("asof_quote_id")))
      .toMap
    assert(r(1L).contains(100L))
    assert(r(2L).contains(200L))
    assert(r(3L).contains(300L))
    assert(r(4L).isEmpty)
    // forward + nearest keep per-key isolation too
    val fwd = AsofJoin.asofJoin(trades, "sym", "tt", quotes, "sym", "qt", Seq("quote_id"),
      direction = "forward").collect()
      .map(x => x.getAs[Long]("trade_id") -> Option(x.getAs[Any]("asof_quote_id"))).toMap
    assert(fwd(1L).contains(101L) && fwd(2L).isEmpty && fwd(3L).isEmpty && fwd(4L).isEmpty)
    // non-time-like time column is rejected up front, not null-cast
    val bad = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(
        trades.withColumn("tstr", col("tt").cast("string")), "sym", "tstr",
        quotes, "sym", "qt", Seq("quote_id"))
    }
    assert(bad.getMessage.contains("time column"))
  }

  test("as-of join with timestamp time columns uses micro precision") {
    import java.sql.Timestamp
    val quotes = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00.000100"), 1L),
      ("A", Timestamp.valueOf("2024-01-01 00:00:00.000300"), 2L)
    ).toDF("k", "qt", "quote_id")
    val trades = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00.000250"), 10L)
    ).toDF("k", "tt", "trade_id")
    // sub-second resolution: backward must pick the 100us quote, not see
    // both at "the same second"; tolerance is in MICROS for temporal inputs
    val back = AsofJoin.asofJoin(trades, "k", "tt", quotes, "k", "qt", Seq("quote_id"))
      .head().getAs[Long]("asof_quote_id")
    assert(back == 1L)
    val tol = AsofJoin.asofJoin(trades, "k", "tt", quotes, "k", "qt", Seq("quote_id"),
      direction = "nearest", tolerance = Some(60L)) // 60us: back d=150 out, fwd d=50 in
      .head().getAs[Long]("asof_quote_id")
    assert(tol == 2L)
    // mixed integral/temporal time columns are rejected
    val mixed = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades.withColumn("ti", lit(5L)), "k", "ti",
        quotes, "k", "qt", Seq("quote_id"))
    }
    assert(mixed.getMessage.contains("disagree"))
  }

  test("as-of join directions: forward, nearest, and tolerance") {
    val quotes = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L)
    ).toDF("k", "qt", "quote_id")
    val trades = Seq(
      (1L, 5L, 1L),   // fwd -> 100 (t=10); nearest -> 100
      (1L, 20L, 2L),  // exact -> 101 in every direction
      (1L, 26L, 3L),  // back -> 101 (d=6), fwd -> 102 (d=4): nearest -> 102
      (1L, 24L, 4L),  // back -> 101 (d=4), fwd -> 102 (d=6): nearest -> 101
      (1L, 99L, 5L),  // fwd -> null; nearest -> 102
      (2L, 16L, 6L)   // fwd -> null (no later quote on k=2)
    ).toDF("k", "tt", "trade_id")
    def run(direction: String, tol: Option[Long] = None) =
      AsofJoin.asofJoin(trades, "k", "tt", quotes, "k", "qt", Seq("quote_id"),
        direction = direction, tolerance = tol)
        .collect()
        .map(x => x.getAs[Long]("trade_id") -> Option(x.getAs[Any]("asof_quote_id")))
        .toMap
    val fwd = run("forward")
    assert(fwd(1L).contains(100L) && fwd(2L).contains(101L) && fwd(3L).contains(102L))
    assert(fwd(5L).isEmpty && fwd(6L).isEmpty)
    val near = run("nearest")
    assert(near(1L).contains(100L) && near(2L).contains(101L))
    assert(near(3L).contains(102L) && near(4L).contains(101L) && near(5L).contains(102L))
    // tolerance: backward match farther than 10 nulls out...
    val backTol = run("backward", tol = Some(10L))
    assert(backTol(5L).isEmpty) // t=99, last quote t=30 -> too far
    assert(backTol(3L).contains(101L))
    // ...but nearest+tolerance falls through to the in-range direction
    val nearTol = AsofJoin.asofJoin(
      Seq((1L, 29L, 7L)).toDF("k", "tt", "trade_id"), "k", "tt",
      quotes, "k", "qt", Seq("quote_id"), direction = "nearest", tolerance = Some(1L))
      .head()
    assert(nearTol.getAs[Long]("asof_quote_id") == 102L) // back d=9 out, fwd d=1 in
  }

  test("indexed range join: custom strategy plans it, results equal the naive theta join") {
    val points = (1 to 500).map(i => (i.toLong, (i % 97).toDouble + 0.5)).toDF("pid", "p")
    val intervals = (1 to 60).map(i =>
      (i.toLong, (i % 13).toDouble * 7.0, (i % 13).toDouble * 7.0 + (i % 5) * 10.0))
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.indexedRangeJoin(points, "p", intervals, "lo", "hi")
    // the custom physical operator actually planned (not BNLJ)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("PointIntervalJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(key(fast) == key(naive))
    assert(key(fast).nonEmpty) // the fixture genuinely produces matches
    // inverted/null intervals are dropped, null points match nothing
    val weird = Seq((1L, Some(5.0), Some(1.0)), (2L, None, Some(9.0)))
      .toDF("iid", "lo", "hi")
    assert(RangeJoin.indexedRangeJoin(points, "p", weird, "lo", "hi").count() == 0)
  }

  test("deterministic sampling: stable membership, disjoint+complete split, stratified rates") {
    val df = (1L to 2000L).map(i => (i, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    val s1 = Sampling.deterministicSample(df, "id", 20).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(df, "id", 20).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // same sample every run
    assert(math.abs(s1.size - 400) < 80, s"20% of 2000 -> ${s1.size}")
    // monotone: raising the rate only ADDS members (bucket < pct nesting)
    val s30 = Sampling.deterministicSample(df, "id", 30).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s30))
    val (train, holdout) = Sampling.trainHoldoutSplit(df, "id", 10)
    val (tr, ho) = (train.collect().map(_.getLong(0)).toSet, holdout.collect().map(_.getLong(0)).toSet)
    assert(tr.intersect(ho).isEmpty && (tr ++ ho).size == 2000)
    val strat = Sampling.stratifiedSample(df, "lang", "id", Map("en" -> 50))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(strat.forall(_._2 == "en")) // unlisted strata dropped
  }

  test("top terms per doc rank by tf desc then rarity (df asc)") {
    val df = Seq(
      (1L, "apple apple banana cherry"), // tf: apple 2; banana/cherry 1
      (2L, "banana banana banana date"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.topTermsPerDoc(df, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> ((x.getString(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r((1L, 1)) == (("apple", 2L, 2L))) // highest tf wins
    // tf tie at 1: cherry (df=1, only doc 1) beats banana (df=3)
    assert(r((1L, 2)) == (("cherry", 1L, 1L)))
    assert(r((2L, 1)) == (("banana", 3L, 3L)))
    assert(r((2L, 2)) == (("date", 1L, 1L)))
    // doc 3: both tf=1; apple df=2 rarer than banana df=3
    assert(r((3L, 1)) == (("apple", 1L, 2L)))
  }

  test("mixture rebalance approaches target domain weights within budget") {
    val rows = (1L to 3000L).map(i =>
      (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "fr")) ++
      (3001L to 3050L).map(i => (i, "zh")) // unweighted domain, must drop
    val df = rows.toDF("id", "lang") // en:1800 de:900 fr:300 zh:50
    val out = Sampling.rebalanceToMixture(df, "lang", "id",
      weights = Map("en" -> 500, "de" -> 300, "fr" -> 200), totalBudget = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // targets: en 500, de 300, fr 200 — md5 buckets land within sampling noise
    assert(math.abs(byLang("en") - 500) < 100, s"en=${byLang("en")}")
    assert(math.abs(byLang("de") - 300) < 80, s"de=${byLang("de")}")
    assert(math.abs(byLang("fr") - 200) < 60, s"fr=${byLang("fr")}")
    // deterministic: same call, same sample
    val again = Sampling.rebalanceToMixture(df, "lang", "id",
      Map("en" -> 500, "de" -> 300, "fr" -> 200), 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet)
    // a domain smaller than its target keeps everything (no upsampling)
    val keepAll = Sampling.rebalanceToMixture(df, "lang", "id",
      Map("fr" -> 1000), totalBudget = 2000L)
    assert(keepAll.count() == 300) // all of fr, nothing else
    // unweighted domains drop entirely
    assert(!out.exists(_._2 == "zh"))
  }

  test("mixture rebalance accepts non-string domain columns") {
    // int-coded domains: weights keyed by the values' string form
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0L) 1 else 2)).toDF("id", "dom")
    val out = Sampling.rebalanceToMixture(df, "dom", "id",
      weights = Map("1" -> 1, "2" -> 1), totalBudget = 400L)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byDom(1) - 200) < 70, s"dom1=${byDom(1)}")
    assert(math.abs(byDom(2) - 200) < 70, s"dom2=${byDom(2)}")
  }

  test("mixture rebalance: null domains drop without deflating real domains") {
    // 300 nulls + 100 genuine empty-string rows; nulls must not fold into
    // ""'s count (which would shrink its keep-rate ~4x)
    val rows = (1L to 300L).map(i => (i, None: Option[String])) ++
      (301L to 400L).map(i => (i, Some("")))
    val out = Sampling.rebalanceToMixture(rows.toDF("id", "dom"), "dom", "id",
      weights = Map("" -> 1), totalBudget = 80L)
      .collect().map(_.getLong(0))
    assert(out.forall(_ >= 301L)) // no null-domain row survives
    // rate computed against the TRUE "" count of 100 -> ~80 kept, not ~20
    assert(math.abs(out.length - 80) < 25, s"kept=${out.length}")
  }

  test("mixture rebalance: high-cardinality domain column stays driver-safe") {
    // 5000 distinct URL-host-like domains, only 2 weighted — the count
    // collect must be bounded by |weights|, not by distinct(domain); the
    // plan's aggregate reads from an isin-filtered scan
    val rows = (1L to 5000L).map(i =>
      (i, if (i <= 400) "hub.example" else if (i <= 800) "lib.example"
          else s"host-$i.example"))
    val df = rows.toDF("id", "dom")
    val out = Sampling.rebalanceToMixture(df, "dom", "id",
      weights = Map("hub.example" -> 1, "lib.example" -> 1), totalBudget = 200L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.forall(r => r._2 == "hub.example" || r._2 == "lib.example"))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byDom("hub.example") - 100) < 45, s"hub=${byDom("hub.example")}")
    assert(math.abs(byDom("lib.example") - 100) < 45, s"lib=${byDom("lib.example")}")
  }

  test("int8 quantization: bounded range, truncation, cosine preserved") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "embedding")
    val rows = q.select($"vec_id", $"embedding", $"q", $"q_scale").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val qs = r.getSeq[Int](2)
      val sc = r.getDouble(3)
      assert(qs.forall(x => x >= -127 && x <= 127))
      // spot-check truncation semantics on the first element
      assert(qs.head == (v.head.toDouble * sc).toInt)
      // dequantized cosine stays close to 1 against the original
      val dq = qs.map(_ / sc)
      val dot = v.zip(dq).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(dq.map(x => x * x).sum)
      assert(dot / (na * nb) > 0.99, s"vec ${r.getLong(0)} cosine degraded")
    }
    // zero vector: all-zero q, scale 0 — no division blowup
    val z = Similarity.quantizeInt8(
      Seq((1L, Array(0f, 0f))).toDF("vec_id", "embedding"), "embedding").head()
    assert(z.getSeq[Int](z.fieldIndex("q")).toList == List(0, 0) &&
      z.getAs[Double]("q_scale") == 0.0)
  }

  test("text chunking covers every character with exact overlap arithmetic") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""), (4L, "abcdefghijk"))
      .toDF("doc_id", "text")
    // size 4, overlap 2 -> step 2: starts 0,2,4,6 — the would-be start 8
    // chunk ("ij") is fully inside "ghij" and must NOT re-emit
    val r = TextAnalysis.chunkText(df, "doc_id", "text", chunkSize = 4, overlap = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getString(2)).toMap
    assert(r((1L, 0)) == "abcd" && r((1L, 1)) == "cdef" && r((1L, 2)) == "efgh")
    assert(r((1L, 3)) == "ghij")
    assert(!r.contains((1L, 4))) // no redundant tail chunk
    assert(r((2L, 0)) == "xy") // doc shorter than chunkSize: one chunk
    assert(!r.keySet.exists(_._1 == 3L)) // empty doc -> no chunks
    // len 11: char 'k' is NOT covered by the start-6 chunk, so start 8 runs
    assert(r((4L, 4)) == "ijk" && !r.contains((4L, 5)))
    // no-overlap chunks reassemble the document exactly
    val whole = TextAnalysis.chunkText(df.filter($"doc_id" === 1L), "doc_id", "text", 3)
      .orderBy("chunk_idx").collect().map(_.getString(2)).mkString
    assert(whole == "abcdefghij")
    intercept[IllegalArgumentException](TextAnalysis.chunkText(df, "doc_id", "text", 4, 4))
  }

  test("distributed prefix sum equals the single-partition window on shuffled data") {
    val rnd = new scala.util.Random(4242)
    // unordered input with gaps and duplicate-free ids; values span sizes
    val rows = rnd.shuffle((1L to 1000L).map(i => (i * 3, rnd.nextInt(500).toLong)).toVector)
    val df = rows.toDF("id", "v").repartition(13)
    val got = Packing.withRunningTotal(df, "id", "v", "cum")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    // naive oracle: in-order scan
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, v) => acc += v; id -> acc }.toMap
    assert(got == want)
    // signed values: running totals are NOT monotone, so partition offsets
    // must come from sum(value), never max(running)
    val signed = rnd.shuffle((1L to 400L).map(i => (i, rnd.nextInt(201).toLong - 100L)).toVector)
    val gotS = Packing.withRunningTotal(signed.toDF("id", "v").repartition(7), "id", "v", "cum")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    var accS = 0L
    val wantS = signed.sortBy(_._1).map { case (id, v) => accS += v; id -> accS }.toMap
    assert(gotS == wantS)
  }

  test("prefix sum counts NULL values as 0 — even an all-null range slice") {
    // ids 1..40 all-null in the low range so at least one whole range slice
    // sums to NULL; the driver offset collect must read 0, not NPE
    val rows = (1L to 40L).map(i => (i, None: Option[Long])) ++
      (41L to 80L).map(i => (i, Some(i)))
    val df = rows.toDF("id", "v").repartition(8)
    val got = Packing.withRunningTotal(df, "id", "v", "cum")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, v) => acc += v.getOrElse(0L); id -> acc }.toMap
    assert(got == want)
    assert(got(40L) == 0L) // nulls contributed nothing
  }

  test("sequence packing assigns bins by start offset, straddlers included") {
    // budget 10: docs of 4,4,4 -> starts 0,4,8; third doc STRADDLES bins 0->1
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 10L), (5L, 1L)).toDF("doc_id", "toks")
    val r = Packing.packByTokenBudget(df, "doc_id", "toks", budget = 10)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("bin_id"), x.getAs[Long]("bin_offset")))).toMap
    assert(r(1L) == ((0L, 0L)))
    assert(r(2L) == ((0L, 4L)))
    assert(r(3L) == ((0L, 8L))) // starts in bin 0 at offset 8, spills into bin 1
    assert(r(4L) == ((1L, 2L))) // starts where doc 3 ended: 12 -> bin 1 offset 2
    assert(r(5L) == ((2L, 2L))) // cumulative 22
    intercept[IllegalArgumentException](Packing.packByTokenBudget(df, "doc_id", "toks", 0))
  }

  test("fixed-length sequence packing: hand-checked splits, full interiors, conservation, partition-invariant (r18)") {
    import spark.implicits._
    // L=4, docs of 3,5,4,0,2 -> starts 0,3,8,12,12; stream length 14
    //   seq 0 [0,4): doc1 (3) + doc2 head (1)       -> 2 docs, doc2 splits
    //   seq 1 [4,8): doc2 middle (4)                -> 1 doc, split member
    //   seq 2 [8,12): doc3 whole (4)                -> 1 doc, no split
    //   seq 3 [12,14): doc4 (0 tok, sits at 12) + doc5 (2) -> tail, 2 docs
    val df = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 0L), (5L, 2L))
      .toDF("doc_id", "toks")
    val got = Packing.packFixedSequences(df, "doc_id", "toks", seqLen = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      0L -> ((2L, 4L, 1L, 1L, 2L)),
      1L -> ((1L, 4L, 1L, 2L, 2L)),
      2L -> ((1L, 4L, 0L, 3L, 3L)),
      3L -> ((2L, 2L, 0L, 4L, 5L))), got.toString)
    // real-shape corpus: every interior sequence holds EXACTLY seqLen
    // tokens and the total is conserved — the packer's whole contract
    val docs = (1L to 200L).map(i => (i, (i * 7 % 13) + 1)).toDF("doc_id", "toks")
    val seqs = Packing.packFixedSequences(docs, "doc_id", "toks", seqLen = 32L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val total = (1L to 200L).map(i => (i * 7 % 13) + 1).sum
    assert(seqs.values.sum == total, "token conservation")
    val tail = seqs.keys.max
    seqs.foreach { case (s, t) =>
      if (s != tail) assert(t == 32L, s"interior seq $s held $t tokens") }
    // partition invariance: the two-phase distributed scan == total order
    val got7 = Packing.packFixedSequences(docs.repartition(7), "doc_id", "toks", 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val got1 = Packing.packFixedSequences(docs.coalesce(1), "doc_id", "toks", 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(got7 == got1)
    intercept[IllegalArgumentException](
      Packing.packFixedSequences(df, "doc_id", "toks", 0L))
  }

  test("cross-corpus contamination: shared-shingle pairs via inverted index, hot cap") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (12L, "one two three four five six")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (21L, "XX alpha beta gamma delta epsilon zeta YY"), // shares 4 3-shingles with 10
      (23L, "totally different words here now ok")
    ).toDF("doc_id", "text")
    val r = Dedup.crossOverlapPairs(train, "doc_id", "text", eval, "doc_id", "text",
      shingleK = 3, minShared = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r.keySet == Set((10L, 21L)))
    assert(r((10L, 21L)) == 4L) // windows of "alpha..zeta" (6 words -> 4 3-shingles)
    // hot-shingle cap: a shingle in every train doc gets dropped, pairs vanish
    val boiler = (1L to 5L).map(i => (i, "common boiler plate")).toDF("doc_id", "text")
    val evalB = Seq((100L, "common boiler plate")).toDF("doc_id", "text")
    val capped = Dedup.crossOverlapPairs(boiler, "doc_id", "text", evalB, "doc_id", "text",
      shingleK = 3, minShared = 1, maxPostingsPerShingle = 3)
    assert(capped.count() == 0)
    // the cap is TWO-sided: a shingle ubiquitous only in the EVAL corpus
    // (train side under the cap) must also be dropped, or one hot eval
    // shingle fans out |train|x|eval| pairs
    val trainOk = Seq((1L, "common boiler plate")).toDF("doc_id", "text")
    val evalHot = (100L to 104L).map(i => (i, "common boiler plate")).toDF("doc_id", "text")
    val cappedEval = Dedup.crossOverlapPairs(trainOk, "doc_id", "text", evalHot, "doc_id", "text",
      shingleK = 3, minShared = 1, maxPostingsPerShingle = 3)
    assert(cappedEval.count() == 0)
  }

  test("PII redaction replaces emails/phones and counts them first") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 555-123-4567 ok"),
      (2L, "no pii here just words")
    ).toDF("doc_id", "text")
    val (emails, phones) = TextAnalysis.piiCounts("text")
    val r = df.select($"doc_id", emails.as("e"), phones.as("p"),
      TextAnalysis.redactPii("text").as("red"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L)._1 == 1L && r(1L)._2 == 1L)
    assert(r(1L)._3 == "reach me at <EMAIL> or <PHONE> ok")
    assert(r(2L) == ((0L, 0L, "no pii here just words")))
  }

  test("repetition score: 0 for unique text, high for looped text, 0 for short") {
    val df = Seq(
      (1L, "all words here are completely unique tokens"),
      (2L, "spam ham spam ham spam ham spam ham spam ham"), // 2-period loop
      (3L, "too short")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionScore(df, "text", "s", 3)
      .select($"doc_id", $"s")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 0L)
    assert(r(2L) == 75L) // 8 3-grams, only 2 distinct -> 6*100/8
    assert(r(3L) == 0L)
  }

  test("normalizeText canonicalizes case/punctuation/whitespace") {
    val df = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO-world??")
    ).toDF("doc_id", "text")
    val norm = df.select($"doc_id", TextAnalysis.normalizeText("text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) == "hello world" && norm(2L) == "hello world" && norm(3L) == "hello world")
    // and the dedup interplay: all three collapse to one normalized group
    val groups = Dedup.exactByContent(
      df.select($"doc_id", TextAnalysis.normalizeText("text").as("text")), "doc_id", "text")
      .collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("group_size") == 3L)
  }

  test("text quality signals are exact integers") {
    val r = TextAnalysis.qualitySignals(docs, "doc_id", "text", Seq("the", "a", "on"))
      .filter($"doc_id" === 1L).head()
    assert(r.getAs[Long]("n_chars") == 22)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct_tokens") == 5)
    assert(r.getAs[Long]("n_stopwords") == 3) // the, on, the
    assert(r.getAs[Long]("avg_token_len_x100") == (17 * 100) / 6)
  }

  test("language id picks max marker score with declaration-order tie-break") {
    val r = TextAnalysis.languageId(docs, "doc_id", "text",
      Seq("en" -> Seq("the", "cat"), "xx" -> Seq("zzz")))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    assert(r(1L) == "en")
    assert(r(4L) == "en") // 0-0 tie -> first declared
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq((1L, "b a a c"), (2L, "c b a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.fingerprint("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("winnowing: shared substrings share fingerprints; disjoint texts don't") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "XXXX quick brown fox jumps over the lazy dog YYYYYY"), // shares long middle
      (3L, "completely unrelated content with different letters!")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.withWinnowingFingerprints(df, "text", "fp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("fp")).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)   // shared window minima from shared middle
    assert(fps(1L).intersect(fps(3L)).isEmpty)    // no shared 8-grams
    // native expression == portable HOF formulation, element for element
    val hof = TextAnalysis.withWinnowingFingerprintsHof(df, "text", "fp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("fp")).toSeq).toMap
    val native = TextAnalysis.withWinnowingFingerprints(df, "text", "fp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("fp")).toSeq).toMap
    assert(hof == native)
  }

  test("PPM decode: real P6 parser computes exact channel sums; rejects malformed payloads") {
    // hand-built 2x1 image: pixel0 = (10,20,30), pixel1 = (40,50,60)
    val img = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    assert(Multimodal.decodePpm(img).contains(
      Multimodal.ImageFeatures(2, 1, 2, 50L, 70L, 90L)))
    // comment lines in the header are part of the PPM spec
    val withComment = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    assert(Multimodal.decodePpm(withComment).exists(_.rSum == 50L))
    // high bytes must sum unsigned (0xFF = 255, not -1)
    val bright = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1)
    assert(Multimodal.decodePpm(bright).contains(
      Multimodal.ImageFeatures(1, 1, 1, 255L, 255L, 255L)))
    // malformed: wrong magic, truncated pixels, junk header
    assert(Multimodal.decodePpm("P5\n2 1\n255\n abcdef".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm("P6\n2 1\n255\nab".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm("P6\nx y\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm(null).isEmpty)
  }

  test("PPM decode end-to-end: encode from text on executors, decode back, nulls for corrupt") {
    val df = Seq((1L, "abcdef"), (2L, "zz")).toDF("doc_id", "text")
    val withPayload = Multimodal.withPpmPayload(df, "doc_id", "text", width = 2, height = 2)
    val feats = Multimodal.ppmFeatures(withPayload, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 12 pixel bytes cycle "abcdef" twice; r channel = bytes 0,3,6,9 = a,d,a,d
    val a = 'a'.toInt; val d = 'd'.toInt
    assert(feats(1L).getAs[Long]("r_sum") == 2L * (a + d))
    assert(feats(1L).getAs[Int]("width") == 2 && feats(1L).getAs[Long]("n_pixels") == 4L)
    // corrupt payloads decode to null features, not failures
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val corrupt = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(9L, "not an image".getBytes("US-ASCII"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
    val cf = Multimodal.ppmFeatures(corrupt, "doc_id", "payload").collect()
    assert(cf.length == 1 && cf(0).isNullAt(cf(0).fieldIndex("width")))
  }

  test("winnowing: non-ASCII text (code points, incl. surrogate pairs) matches the HOF spec") {
    // é (BMP multi-byte), 汉字, and 🦊🚀 (non-BMP surrogate pairs) — the SQL
    // form counts code points via length()/substring(); the native loop must too
    val df = Seq(
      (1L, "héllo wörld héllo wörld with accents andmore"),
      (2L, "汉字文本去重测试汉字文本去重测试汉字文本"),
      (3L, "emoji 🦊 fox and 🚀 rocket emoji 🦊 fox text")
    ).toDF("doc_id", "text")
    val hof = TextAnalysis.withWinnowingFingerprintsHof(df, "text", "fp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("fp")).toSeq).toMap
    val native = TextAnalysis.withWinnowingFingerprints(df, "text", "fp")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](r.fieldIndex("fp")).toSeq).toMap
    assert(hof == native)
  }

  test("multimodal: real nearest-neighbor resize samples the exact source pixels") {
    // 2×2 image with distinct per-pixel values: resize to 1×1 must sample
    // ONLY pixel (0,0) — sx = ⌊0·2/1⌋ = 0 — not average or sum anything else
    val px = Array[Byte](
      10, 11, 12,   20, 21, 22, // row 0: (0,0), (1,0)
      30, 31, 32,   40, 41, 42) // row 1
    val img = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val one = Multimodal.resizePpm(img, 1, 1).get
    assert((one.rSum, one.gSum, one.bSum) == (10L, 11L, 12L))
    // identity resize reproduces the full-decode channel sums
    val same = Multimodal.resizePpm(img, 2, 2).get
    val full = Multimodal.decodePpm(img).get
    assert((same.rSum, same.gSum, same.bSum) == (full.rSum, full.gSum, full.bSum))
    // 4×4 -> 2×2 keeps pixels (0,0),(2,0),(0,2),(2,2) of a known gradient
    val g16 = (0 until 48).map(_.toByte).toArray // pixel p channel c = 3p+c
    val img4 = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ g16
    val r4 = Multimodal.resizePpm(img4, 2, 2).get
    // sampled source pixels 0, 2, 8, 10 -> r bytes 0, 6, 24, 30
    assert(r4.rSum == 0L + 6L + 24L + 30L)
    assert(r4.gSum == r4.rSum + 4L && r4.bSum == r4.rSum + 8L)
    // malformed input -> None, never a throw
    assert(Multimodal.resizePpm("P6\n2 2\n255\n".getBytes("US-ASCII"), 1, 1).isEmpty)
    assert(Multimodal.resizePpm(img, 0, 1).isEmpty)
  }

  test("multimodal: decoded image stats track channel extrema and brightness") {
    val px = Array[Byte](
      10, 110, -56,   20, 121, 22, // -56 unsigned = 200
      30, 31, 32,     40, 41, 42)
    val img = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val s = Multimodal.decodePpmStats(img).get
    assert((s.rMin, s.rMax) == (10, 40))
    assert((s.gMin, s.gMax) == (31, 121))
    assert((s.bMin, s.bMax) == (22, 200))
    assert(s.brightSum == px.map(_ & 0xff).map(_.toLong).sum)
    assert(Multimodal.decodePpmStats(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("multimodal: chunking covers the payload exactly") {
    val r = Multimodal.chunkHashes(docs.filter($"doc_id" === 1L), "doc_id", "text", chunkSize = 10)
      .orderBy("chunk_idx").collect()
    assert(r.length == 3) // 22 chars -> 10+10+2
    assert(r.map(_.getAs[Long]("chunk_len")).toSeq == Seq(10L, 10L, 2L))
    assert(r.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
  }

  test("multimodal: asset wrapper carries byte length and checksum") {
    val r = Multimodal.toAssets(docs, "doc_id", "text", "text").orderBy("asset_id").head()
    assert(r.getAs[Long]("byte_len") == 22L)
    assert(r.getAs[String]("checksum").length == 32)
    assert(r.getAs[Array[Byte]]("payload").length == 22)
  }

  test("multimodal: ppmResize/ppmStats plumbing nulls out malformed payloads") {
    val withPayload = Multimodal.withPpmPayload(docs, "doc_id", "text", 4, 4)
      .union(Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"))
    val rs = Multimodal.ppmResize(withPayload, "doc_id", "payload", 2, 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rs(99L).isNullAt(rs(99L).fieldIndex("r_sum")))
    assert(rs.keySet.filter(_ != 99L).forall(id => !rs(id).isNullAt(rs(id).fieldIndex("r_sum"))))
    val st = Multimodal.ppmStats(withPayload, "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(st(99L).isNullAt(st(99L).fieldIndex("bright_sum")))
    assert(st.keySet.filter(_ != 99L).forall(id => !st(id).isNullAt(st(id).fieldIndex("bright_sum"))))
  }

  test("boilerplate span removal drops cross-doc spans, reassembles in order") {
    // span width 2: "cookie banner" is shared by 3 docs (> maxDocs=2) and
    // must vanish; "unique words" variants survive; doc 4 is ALL boilerplate
    val df = Seq(
      (1L, "cookie banner alpha beta gamma"),
      (2L, "cookie banner delta epsilon"),
      (3L, "cookie banner zeta"),
      (4L, "cookie banner"),
      (5L, "totally original content here")
    ).toDF("doc_id", "text")
    val r = Dedup.removeBoilerplateSpans(df, "doc_id", "text", spanWords = 2, maxDocs = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_spans"), x.getAs[Long]("kept_spans"), x.getAs[String]("clean_text")))).toMap
    // doc 1: spans "cookie banner"|"alpha beta"|"gamma" -> first removed
    assert(r(1L) == ((3L, 2L, "alpha beta gamma")))
    assert(r(2L) == ((2L, 1L, "delta epsilon")))
    assert(r(3L) == ((2L, 1L, "zeta"))) // tail span shorter than width survives
    assert(!r.contains(4L)) // all-boilerplate doc drops out entirely
    assert(r(5L) == ((2L, 2L, "totally original content here")))
  }

  test("gopher rules: each rule rejects independently, integer arithmetic") {
    val stop = Seq("the", "a", "of")
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") + " the a"
    val df = Seq(
      (1L, longDoc),                                        // passes all
      (2L, "the a short doc"),                              // fails word count
      (3L, (1 to 60).map(_ => "zz").mkString(" ") + " the a supercalifragilistic"), // mean len < 3
      (4L, (1 to 60).map(i => s"word$i").mkString(" "))     // no stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityRules(df, "doc_id", "text", stop, minWords = 50)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("passes_all"))
    assert(!r(2L).getAs[Boolean]("ok_word_count") && !r(2L).getAs[Boolean]("passes_all"))
    assert(!r(3L).getAs[Boolean]("ok_mean_len"))
    assert(r(3L).getAs[Long]("n_words") == 63L)
    assert(!r(4L).getAs[Boolean]("ok_stopwords"))
    // integer identity: sum_word_chars == n_chars - (n_words - 1) separators
    val d1 = r(1L)
    assert(d1.getAs[Long]("sum_word_chars") ==
      longDoc.length - (d1.getAs[Long]("n_words") - 1))
  }

  test("topKPerGroup cuts deterministically at k with explicit tie-break") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 7)).toDF("id", "g", "q")
    val r = Sampling.topKPerGroup(df, "g", k = 5, order = Seq(col("q").desc, col("id").asc))
      .collect().map(x => (x.getAs[String]("g"), x.getAs[Int]("rank_in_group"), x.getAs[Long]("id")))
    assert(r.length == 10)
    // group a (even ids): q=6 at ids 6,20,34,48,62,76,90 -> top5 = 5 smallest of those
    val aIds = r.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq
    assert(aIds == Seq(6L, 20L, 34L, 48L, 62L))
    intercept[IllegalArgumentException](Sampling.topKPerGroup(df, "g", 0, Seq(col("q"))))
  }

  test("oov stats: deterministic vocab cut, integer rate") {
    // corpus counts: x:6 y:4 z:3 w:1 -> vocab(2) = {x, y}
    val df = Seq(
      (1L, "x x x y y z"),
      (2L, "x x x y y z z w")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.oovStats(df, "doc_id", "text", vocabSize = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("in_vocab"), x.getAs[Long]("oov"),
          x.getAs[Long]("oov_pct_x100")))).toMap
    assert(r(1L) == ((6L, 5L, 1L, 1666L)))
    assert(r(2L) == ((8L, 5L, 3L, 3750L)))
    // tie at the boundary: u and v both count 1 — token ASC wins the slot
    val tied = Seq((1L, "u v")).toDF("doc_id", "text")
    val t = TextAnalysis.oovStats(tied, "doc_id", "text", vocabSize = 1).head()
    assert(t.getAs[Long]("in_vocab") == 1L) // exactly one of them made the cut: u
  }

  test("curation pipeline: scrub-then-dedup catches boilerplate-differing copies") {
    val stop = Seq("the", "a", "of")
    // unique 50-word bodies (stopwords inside, so they survive any scrub
    // alignment); 5-word banners aligned to the FIRST span
    def ubody(p: String) = "the a " + (1 to 48).map(i => s"${p}w$i").mkString(" ")
    val bannerA = "alpha beta gamma delta epsi" // docs 1, 5, 6 -> 3 docs, scrubbed
    val bannerB = "zeta eta theta iota kappa"   // docs 2, 7, 8 -> 3 docs, scrubbed
    val sharedX = ubody("x")                    // docs 1, 2 only -> survives
    val df = Seq(
      (1L, s"$bannerA $sharedX"),
      (2L, s"$bannerB $sharedX"), // differs from doc 1 ONLY in boilerplate
      (5L, s"$bannerA ${ubody("e")}"),
      (6L, s"$bannerA ${ubody("f")}"),
      (7L, s"$bannerB ${ubody("g")}"),
      (8L, s"$bannerB ${ubody("h")}")
    ).toDF("doc_id", "text")
    val r = Pipelines.curateAndPack(df, "doc_id", "text", stop,
      minWords = 50, spanWords = 5, maxSpanDocs = 2, budget = 64)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("kept_spans"), x.getAs[Long]("n_tokens"),
          x.getAs[Long]("bin_id"), x.getAs[Long]("bin_offset")))).toMap
    // raw docs 1 and 2 are NOT byte-identical, but after their banners are
    // scrubbed both reduce to sharedX -> dedup keeps only the min id
    assert(r.contains(1L) && !r.contains(2L), s"got ${r.keySet}")
    assert(r(1L)._1 == 10L && r(1L)._2 == 50L) // 10 surviving spans, 50 tokens
    assert(Set(5L, 6L, 7L, 8L).subsetOf(r.keySet)) // unique bodies survive
    // packing is contiguous over survivors in id order at budget 64:
    // starts 0, 50, 100, 150, 200 -> bins 0,0,1,2,3 offsets 0,50,36,22,8
    assert(r(1L)._3 == 0L && r(1L)._4 == 0L)
    assert(r(5L)._3 == 0L && r(5L)._4 == 50L)
    assert(r(6L)._3 == 1L && r(6L)._4 == 36L)
    assert(r(7L)._3 == 2L && r(7L)._4 == 22L)
    assert(r(8L)._3 == 3L && r(8L)._4 == 8L)
  }

  test("grouped quantiles: percentile_disc semantics, exact integer ranks") {
    // group a: 1..10 -> p25 at rank ceil(2.5)=3 -> 3; p50 rank 5 -> 5; p75 rank 8
    // group b: {7,7,7,9} -> p25 rank 1 -> 7; p50 rank 2 -> 7; p75 rank 3 -> 7; p100 rank 4 -> 9
    val df = ((1L to 10L).map(v => ("a", v)) ++ Seq(("b", 7L), ("b", 7L), ("b", 7L), ("b", 9L)))
      .toDF("g", "v")
    val r = Stats.groupedQuantiles(df, "g", "v", Seq(25, 50, 75, 100))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r(("a", 25L)) == 3L && r(("a", 50L)) == 5L && r(("a", 75L)) == 8L && r(("a", 100L)) == 10L)
    assert(r(("b", 25L)) == 7L && r(("b", 50L)) == 7L && r(("b", 75L)) == 7L && r(("b", 100L)) == 9L)
    // nulls excluded, single-row group: every quantile is that row
    val withNull = Seq(("c", Some(4L)), ("c", None)).toDF("g", "v")
    val rn = Stats.groupedQuantiles(withNull, "g", "v", Seq(50, 100))
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(rn == Map(50L -> 4L, 100L -> 4L))
    intercept[IllegalArgumentException](Stats.groupedQuantiles(df, "g", "v", Seq(0)))
  }

  test("wav decode: real RIFF parser — golden values, unknown chunks, corrupt payloads") {
    import Multimodal._
    // golden: text "AB" (cps 65,66), 4 samples at 8000 Hz
    // s_j = ((cp_j*131 + 7j) % 65536) - 32768; cps cycle A,B,A,B
    val want = Seq(0, 1, 2, 3).map { j =>
      val cp = if (j % 2 == 0) 65 else 66
      ((cp * 131 + 7 * j) % 65536) - 32768
    }
    val f = decodeWav(encodeWavFromText("AB", 4, 8000)).get
    assert(f.sampleRate == 8000 && f.nSamples == 4L)
    assert(f.sMin == want.min && f.sMax == want.max)
    assert(f.absSum == want.map(x => math.abs(x.toLong)).sum)
    // a LIST chunk (odd-size, exercising RIFF padding) before data must skip
    val base = encodeWavFromText("AB", 4, 8000)
    val extra = java.nio.ByteBuffer.allocate(base.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 12) // RIFF header
    extra.put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0)) // odd size + pad
    extra.put(base, 12, base.length - 12)
    val withList = extra.array()
    assert(decodeWav(withList).contains(f)) // identical features through the skip
    // corrupt payloads -> None, never a throw
    assert(decodeWav(Array[Byte]()).isEmpty)
    assert(decodeWav("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    assert(decodeWav(base.take(30).toArray).isEmpty) // truncated inside fmt
    val stereo = base.clone(); stereo(22) = 2 // channels=2 -> rejected (contract is mono)
    assert(decodeWav(stereo).isEmpty)
    // null rows flow through the frame path for malformed payloads
    import spark.implicits._
    val frames = Seq((1L, base), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val rows = wavFeatures(frames, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("png decode: real decoder — all five filters, golden values, corrupt payloads") {
    import Multimodal._
    // golden: "AB" cycles cps 65,66 over pixel bytes; height 6 makes the
    // encoder emit every filter type (y % 5) plus one repeat
    def expect(w: Int, h: Int, ch: Int): (Seq[Int], Seq[Int], Seq[Int], Seq[Int]) = {
      val n = w * h * ch
      val bytes = (0 until n).map(j => if (j % 2 == 0) 65 else 66)
      def channel(c: Int) = bytes.grouped(ch).map(_(c)).toSeq
      (channel(0), channel(1), channel(2), if (ch == 4) channel(3) else Nil)
    }
    for (ch <- Seq(3, 4)) {
      val payload = encodePngFromText("AB", 5, 6, ch)
      val s = decodePng(payload).get
      val (r, g, b, a) = expect(5, 6, ch)
      assert(s.width == 5 && s.height == 6 && s.nPixels == 30L && s.channels == ch)
      assert(s.rMin == r.min && s.rMax == r.max && s.gMin == g.min && s.gMax == g.max)
      assert(s.bMin == b.min && s.bMax == b.max)
      assert(s.brightSum == (r.sum + g.sum + b.sum).toLong)
      assert(s.aSum == (if (ch == 4) a.sum.toLong else 0L))
    }
    // high-entropy pixels stress Average/Paeth prediction harder than a
    // 2-char cycle; decode must still reconstruct exactly
    val noisy = "The quick brown fox jumps over the lazy dog! 0123456789"
    assert(decodePng(encodePngFromText(noisy, 9, 7, 3)).isDefined)
    // corrupt payloads -> None, never a throw
    val ok = encodePngFromText("AB", 5, 6, 3)
    assert(decodePng(null).isEmpty)
    assert(decodePng(Array[Byte]()).isEmpty)
    assert(decodePng("notapngfile!".getBytes("US-ASCII")).isEmpty)
    assert(decodePng(ok.take(40).toArray).isEmpty) // truncated mid-chunk
    val badCrc = ok.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 1).toByte
    assert(decodePng(badCrc).isEmpty) // IEND CRC flipped
    val flippedPixel = ok.clone()
    // flip a byte inside IDAT (after the 8-byte sig + 25-byte IHDR chunk + 8)
    flippedPixel(8 + 25 + 8 + 4) = (flippedPixel(8 + 25 + 8 + 4) ^ 0xff).toByte
    assert(decodePng(flippedPixel).isEmpty) // IDAT CRC catches it
    val deep = ok.clone(); deep(8 + 8 + 8) = 16 // bit depth 16 (IHDR data byte 8)
    assert(decodePng(deep).isEmpty) // (CRC rejects; 16-bit unsupported anyway)
    // a valid-CRC but non-truecolor header is rejected by the header check
    val pal = {
      val p = ok.clone(); p(8 + 8 + 9) = 3 // color type 3 = palette
      // recompute IHDR CRC so the rejection is the TYPE check, not CRC
      val crc = new java.util.zip.CRC32(); crc.update(p, 12, 4 + 13)
      val v = crc.getValue
      p(8 + 8 + 13) = (v >>> 24).toByte; p(8 + 8 + 14) = (v >>> 16).toByte
      p(8 + 8 + 15) = (v >>> 8).toByte; p(8 + 8 + 16) = v.toByte
      p
    }
    assert(decodePng(pal).isEmpty)
    // null rows flow through the frame path for malformed payloads
    import spark.implicits._
    val frames = Seq((1L, ok), (2L, Array[Byte](9, 9))).toDF("doc_id", "payload")
    val rows = pngStats(frames, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("gif decode: LZW round-trip exact, real-encoder streams, corrupt refused") {
    import Multimodal._
    // text-derived pixels over the gray palette: exact (GIF is lossless);
    // 285 pixels forces a mid-stream CLEAR in the literal-code encoder
    val text = "Spark engine!"
    val vs = (0 until 285).map(k => text.codePointAt(k % text.length) & 0xff)
    val payload = encodeGifFromText(text, 19, 15)
    val s = decodeGif(payload).get
    assert(s.width == 19 && s.height == 15 && s.nPixels == 285L && s.paletteSize == 256)
    assert(s.rMin == vs.min && s.rMax == vs.max && s.gMin == vs.min && s.bMax == vs.max)
    assert(s.brightSum == 3L * vs.sum)
    // independent-codec check: ImageIO decodes our stream to the same pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img.getWidth == 19 && img.getHeight == 15)
    for (y <- 0 until 15; x <- 0 until 5) {
      val want = vs(y * 19 + x)
      assert((img.getRGB(x, y) & 0xff) == want, s"ImageIO ($x,$y)")
    }
    // and OUR decoder handles a REAL compressed LZW stream (ImageIO's GIF
    // writer emits genuine multi-byte dictionary codes, not literals)
    val src = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 23; x <- 0 until 37)
      src.setRGB(x, y, if ((x / 4 + y / 3) % 2 == 0) 0x00202020 else 0x00e0e0e0)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val real = decodeGif(bos.toByteArray).get
    assert(real.width == 37 && real.height == 23)
    val refBright = (for (y <- 0 until 23; x <- 0 until 37) yield {
      val c = src.getRGB(x, y)
      ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
    }).sum.toLong
    assert(real.brightSum == refBright, "lossless: exact brightness match")
    // corrupt payloads: the malformed->None family contract; the decoder
    // returns after the FIRST image, so only the trailing 0x3b is advisory
    assert(decodeGif(null).isEmpty && decodeGif(Array[Byte]()).isEmpty)
    assert(decodeGif("GIF89a".getBytes("US-ASCII")).isEmpty) // header only
    (1 until payload.length - 1).foreach { n =>
      assert(decodeGif(payload.take(n).toArray).isEmpty, s"truncated at $n")
    }
    assert(decodeGif(payload.dropRight(1)).isDefined) // first frame complete
    // interlace permutes row order ONLY — every reported stat is
    // row-order-invariant, so the flagged variant decodes identically
    val inter = payload.clone()
    val desc = 6 + 7 + 768 + 9 // header + LSD + GCT + comment ext (3+5+1)
    assert((inter(desc) & 0xff) == 0x2c, "fixture layout: image descriptor")
    inter(desc + 9) = (inter(desc + 9) | 0x40).toByte
    assert(decodeGif(inter).get == s)
    // frame path: null rows for junk
    import spark.implicits._
    val frames = Seq((1L, payload), (2L, Array[Byte](0x47, 0x49))).toDF("doc_id", "payload")
    val got = gifStats(frames, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L) && got(2L))
  }

  test("jpeg decode: constant-tile payloads round-trip exactly, restart markers honored") {
    import Multimodal._
    // "Spark!" cycles v_k over the 2x3 block grid; all-ones quant makes the
    // DC-only blocks lossless, so every pixel of tile k must equal v_k
    val text = "Spark!"
    val vs = (0 until 6).map(k => text.codePointAt(k % text.length) & 0xff)
    for (rst <- Seq(0, 2)) { // without and with DRI/RSTn in the stream
      val payload = encodeJpegFromText(text, 2, 3, restartInterval = rst)
      val (w, h, nc, rgb) = decodeJpegPixels(payload).get
      assert(w == 16 && h == 24 && nc == 1)
      for (by <- 0 until 3; bx <- 0 until 2; y <- 0 until 8; x <- 0 until 8) {
        val px = rgb(((by * 8 + y) * 16 + bx * 8 + x) * 3) & 0xff
        assert(px == vs(by * 2 + bx), s"tile ($bx,$by) at ($x,$y) rst=$rst")
      }
      val s = decodeJpeg(payload).get
      assert(s.nPixels == 384L && s.rMin == vs.min && s.rMax == vs.max)
      assert(s.gMin == vs.min && s.bMax == vs.max) // grayscale: r=g=b
      assert(s.brightSum == 3L * 64 * vs.sum)
    }
    // frame path: malformed payloads become null rows, never task failures
    import spark.implicits._
    val ok = encodeJpegFromText(text, 2, 2)
    val frames = Seq((1L, ok), (2L, Array[Byte](0x12, 0x34))).toDF("doc_id", "payload")
    val got = jpegStats(frames, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L) && got(2L))
  }

  test("jpeg decode: corrupt, truncated, and non-baseline payloads are refused") {
    import Multimodal._
    val ok = encodeJpegFromText("corpus", 3, 2, restartInterval = 3)
    assert(decodeJpeg(null).isEmpty)
    assert(decodeJpeg(Array[Byte]()).isEmpty)
    assert(decodeJpeg("notajpeg".getBytes("US-ASCII")).isEmpty)
    // truncation at EVERY prefix length: header walk, entropy data, EOI
    (1 until ok.length).foreach(n => assert(decodeJpeg(ok.take(n).toArray).isEmpty, s"len $n"))
    // a baseline stream with its SOF marker flipped to SOF2 is corrupt, not
    // progressive: a DC-band progressive scan (Ss=0) cannot carry Se=63
    val sof = ok.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val prog = ok.clone(); prog(sof + 1) = 0xc2.toByte
    assert(decodeJpeg(prog).isEmpty)
    // a wrong restart-marker index is stream corruption, not data
    val rstAt = ok.indexOfSlice(Seq(0xff.toByte, 0xd0.toByte))
    assert(rstAt > 0, "expected an RST0 in the fixture")
    val badRst = ok.clone(); badRst(rstAt + 1) = 0xd5.toByte
    assert(decodeJpeg(badRst).isEmpty)
    // forged huge dimensions must be rejected before any allocation
    val dims = ok.clone()
    dims(sof + 5) = 0xff.toByte; dims(sof + 6) = 0xff.toByte // height 65535
    dims(sof + 7) = 0xff.toByte; dims(sof + 8) = 0xff.toByte // width 65535
    assert(decodeJpeg(dims).isEmpty)
  }

  test("jpeg decode matches ImageIO on real-world encoder output") {
    import Multimodal._
    import java.awt.image.BufferedImage
    // ImageIO's JPEG codec is an independent implementation of the same
    // public standard — cross-checking against it validates Huffman
    // decode, dequant, IDCT, and (for color) subsampled chroma plumbing
    // on streams this library did NOT author (JFIF APP0, Annex K tables).
    def encode(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    // grayscale: single component, no upsampling — only IDCT rounding
    // separates the two decoders (ImageIO uses fixed-point, ours float)
    val gw = 40; val gh = 25 // non-MCU-multiple: exercises partial MCUs
    val gray = new BufferedImage(gw, gh, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until gh; x <- 0 until gw)
      gray.getRaster.setSample(x, y, 0, (x * 6 + y * 4) % 256)
    val gBytes = encode(gray)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    val (w1, h1, nc1, px1) = decodeJpegPixels(gBytes).get
    assert(w1 == gw && h1 == gh && nc1 == 1)
    for (y <- 0 until gh; x <- 0 until gw) {
      val ours = px1((y * gw + x) * 3) & 0xff
      val theirs = ref.getRaster.getSample(x, y, 0)
      assert(math.abs(ours - theirs) <= 2, s"gray ($x,$y): $ours vs $theirs")
    }
    // color: ImageIO writes 3-component YCbCr with 4:2:0 subsampling by
    // default; smooth gradients keep the replication-vs-smooth upsampling
    // delta small while still covering the full color path
    val cw = 64; val ch = 48
    val color = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until ch; x <- 0 until cw)
      color.setRGB(x, y, (x * 255 / (cw - 1) << 16) | (y * 255 / (ch - 1) << 8) |
        ((x + y) * 255 / (cw + ch - 2)))
    val cBytes = encode(color)
    val cRef = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cBytes))
    val (w2, h2, nc2, px2) = decodeJpegPixels(cBytes).get
    assert(w2 == cw && h2 == ch && nc2 == 3)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until ch; x <- 0 until cw; c <- 0 until 3) {
      val ours = px2((y * cw + x) * 3 + c) & 0xff
      val theirs = (cRef.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(ours - theirs)
      sumDiff += d; if (d > maxDiff) maxDiff = d
    }
    val meanDiff = sumDiff.toDouble / (cw * ch * 3)
    assert(meanDiff <= 3.0, s"mean channel diff $meanDiff")
    assert(maxDiff <= 32, s"max channel diff $maxDiff")
  }

  test("jpeg quality estimate: IJG inverse within 1 above saturation, corrupt refused") {
    import Multimodal._
    // the estimator inverts the IJG table scaling by sum ratio: exact to
    // ±1 wherever the 255-clamp hasn't saturated the table (q >= 17 —
    // below that every tool's inverse is biased the same way)
    var prevSum = Long.MaxValue
    for (q <- 1 to 100) {
      val payload = encodeJpegFromText("quality", 2, 2, quality = q)
      val (est, sumT) = jpegQualityEstimate(payload).get
      if (q >= 17) assert(math.abs(est - q) <= 1, s"q=$q est=$est")
      assert(sumT <= prevSum, s"quant mass must not grow with quality (q=$q)")
      prevSum = sumT
      // the scaled-table stream still decodes (lossy but valid)
      assert(decodeJpeg(payload).isDefined, s"q=$q stream must stay decodable")
    }
    // legacy all-ones table reads as (near-)lossless: estimate 99+
    val ones = encodeJpegFromText("x", 1, 1)
    assert(jpegQualityEstimate(ones).get._1 >= 99)
    // progressive streams carry their DQT before SOS too
    val prog = encodeProgressiveJpegFromText("x", 2, 2)
    assert(jpegQualityEstimate(prog).get._1 >= 99)
    // corrupt / table-less: None, never a throw
    assert(jpegQualityEstimate(null).isEmpty)
    assert(jpegQualityEstimate("nope".getBytes("US-ASCII")).isEmpty)
    val noDqt = ones.clone()
    val dqt = noDqt.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    noDqt(dqt + 1) = 0xfe.toByte // DQT -> COM: no luma table before SOS
    assert(jpegQualityEstimate(noDqt).isEmpty)
    (1 until 20).foreach(n =>
      assert(jpegQualityEstimate(ones.take(n).toArray).isEmpty, s"len $n"))
  }

  test("progressive jpeg: four-scan constant tiles round-trip exactly, restarts honored") {
    import Multimodal._
    // same lossless constant-tile scheme as the baseline fixture, emitted as
    // a genuine SOF2 stream (DC Al=1 → AC EOB-runs → DC refine → AC refine)
    val text = "Spark!"
    val vs = (0 until 6).map(k => text.codePointAt(k % text.length) & 0xff)
    for (rst <- Seq(0, 3)) {
      val payload = encodeProgressiveJpegFromText(text, 2, 3, restartInterval = rst)
      // it really is progressive: SOF2 marker present, SOF0 absent
      assert(payload.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0)
      assert(payload.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte)) < 0)
      val (w, h, nc, rgb) = decodeJpegPixels(payload).get
      assert(w == 16 && h == 24 && nc == 1)
      for (by <- 0 until 3; bx <- 0 until 2; y <- 0 until 8; x <- 0 until 8) {
        val px = rgb(((by * 8 + y) * 16 + bx * 8 + x) * 3) & 0xff
        assert(px == vs(by * 2 + bx), s"tile ($bx,$by) at ($x,$y) rst=$rst")
      }
      val s = decodeJpeg(payload).get
      assert(s.nPixels == 384L && s.rMin == vs.min && s.rMax == vs.max)
      assert(s.brightSum == 3L * 64 * vs.sum)
      // truncation at EVERY prefix: scan accumulation must still demand EOI
      (1 until payload.length).foreach(n =>
        assert(decodeJpeg(payload.take(n).toArray).isEmpty, s"len $n rst=$rst"))
    }
    // a wide grid forces EOB-run chunking (>127 blocks per segment)
    val wide = encodeProgressiveJpegFromText("wide", 40, 4)
    val sw = decodeJpeg(wide).get
    val wvs = (0 until 160).map(k => "wide".codePointAt(k % 4) & 0xff)
    assert(sw.width == 320 && sw.height == 32)
    assert(sw.brightSum == 3L * 64 * wvs.sum)
    // byte-flip fuzz across the whole stream: corruption landing anywhere
    // in the multi-scan state machine must yield None or a decoded frame,
    // never an exception (the corpus-scale never-throw contract)
    val fz = encodeProgressiveJpegFromText(text, 2, 3, restartInterval = 2)
    for (i <- fz.indices; b <- Seq(0x00, 0xff, (fz(i) ^ 0x10) & 0xff)) {
      val mut = fz.clone(); mut(i) = b.toByte
      decodeJpeg(mut) // must not throw
    }
  }

  test("progressive jpeg matches ImageIO on real multi-scan encoder output") {
    import Multimodal._
    import java.awt.image.BufferedImage
    import javax.imageio.{ImageIO, ImageWriteParam}
    // ImageIO's progressive mode emits a real scan script (spectral
    // selection + successive approximation with AC correction bits) this
    // library did not author — the strongest cross-check of the Annex G
    // paths, exactly like the baseline ImageIO test above
    def encodeProgressive(img: BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val gw = 40; val gh = 25 // non-MCU-multiple partial blocks
    val gray = new BufferedImage(gw, gh, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until gh; x <- 0 until gw)
      gray.getRaster.setSample(x, y, 0, (x * 6 + y * 4) % 256)
    val gBytes = encodeProgressive(gray)
    assert(gBytes.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0, "SOF2 written")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    val (w1, h1, nc1, px1) = decodeJpegPixels(gBytes).get
    assert(w1 == gw && h1 == gh && nc1 == 1)
    for (y <- 0 until gh; x <- 0 until gw) {
      val ours = px1((y * gw + x) * 3) & 0xff
      val theirs = ref.getRaster.getSample(x, y, 0)
      assert(math.abs(ours - theirs) <= 2, s"gray ($x,$y): $ours vs $theirs")
    }
    val cw = 64; val ch = 48
    val color = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until ch; x <- 0 until cw)
      color.setRGB(x, y, (x * 255 / (cw - 1) << 16) | (y * 255 / (ch - 1) << 8) |
        ((x + y) * 255 / (cw + ch - 2)))
    val cBytes = encodeProgressive(color)
    val cRef = ImageIO.read(new java.io.ByteArrayInputStream(cBytes))
    val (w2, h2, nc2, px2) = decodeJpegPixels(cBytes).get
    assert(w2 == cw && h2 == ch && nc2 == 3)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until ch; x <- 0 until cw; c <- 0 until 3) {
      val ours = px2((y * cw + x) * 3 + c) & 0xff
      val theirs = (cRef.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(ours - theirs)
      sumDiff += d; if (d > maxDiff) maxDiff = d
    }
    assert(sumDiff.toDouble / (cw * ch * 3) <= 3.0, "mean channel diff")
    assert(maxDiff <= 32, s"max channel diff $maxDiff")
  }

  test("url canonicalization: ports, tracking params, sorting, fragments, malformed") {
    import spark.implicits._
    import graft.operators.UrlTools
    def canon(u: String): String = {
      val r = Seq(u).toDF("url").select(UrlTools.canonicalUrl(col("url"))).head()
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // default port stripped, host+scheme lowercased, fragment dropped
    assert(canon("HTTPS://Ex.COM:443/a#frag") == "https://ex.com/a")
    assert(canon("http://ex.com:80/a") == "http://ex.com/a")
    // NON-default port is semantic and survives (incl. cross-scheme 443)
    assert(canon("http://ex.com:443/a") == "http://ex.com:443/a")
    assert(canon("https://ex.com:8443/a") == "https://ex.com:8443/a")
    // tracking params dropped by name and by utm_ prefix; survivors sorted
    assert(canon("https://ex.com/p?z=9&utm_campaign=x&a=1&fbclid=F&b=2") ==
      "https://ex.com/p?a=1&b=2&z=9")
    // all params tracked -> no query at all; empty path -> /
    assert(canon("https://ex.com?utm_source=x") == "https://ex.com/")
    // malformed inputs canonicalize to NULL, not pass-through
    assert(canon("not a url") == null)
    assert(canon("ex.com/no-scheme") == null)
    // registered domain: last two labels, port ignored; bare host -> itself
    val doms = Seq("https://a.b.Example.com:8443/x", "https://example.com/", "nope")
      .toDF("url").select(UrlTools.registeredDomain(col("url"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(doms.sameElements(Array("example.com", "example.com", null)))
  }

  test("epochShuffle: exact partition, per-shard contiguous ranks, seed re-permutes") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 500L).toDF("id")
    val s1 = Sampling.epochShuffle(df, "id", seed = 7L, nShards = 8).collect()
    // every row exactly once, shard in range, pos contiguous 1..size
    assert(s1.length == 500 && s1.map(_.getLong(0)).toSet.size == 500)
    val byShard = s1.groupBy(_.getLong(1))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length.toLong))
    }
    // deterministic under repartitioning (the df.sample() failure mode)
    val s1b = Sampling.epochShuffle(df.repartition(13), "id", 7L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(s1b == s1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // a different seed re-permutes: same keys, different order assignment
    val s2 = Sampling.epochShuffle(df, "id", seed = 8L, nShards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m1 = s1.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert((1L to 500L).count(k => m1(k) != s2(k)) > 400, "seed change moves most keys")
  }

  test("vocabGrowth: golden buckets, first-occurrence attribution, empty docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (0L, "a b"),   // bucket 0: introduces a, b
      (1L, "a c"),   // bucket 1: re-sees a, introduces c
      (2L, "c d"),   // bucket 2: re-sees c, introduces d
      (3L, "")       // no tokens: contributes nothing anywhere
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(df, "doc_id", "text", nBuckets = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(0L -> ((2L, 1L, 2L)), 1L -> ((2L, 1L, 1L)), 2L -> ((2L, 1L, 1L))))
    // within-doc order decides first occurrence: "b a" attributes b (idx 0)
    // and a (idx 1) both to doc 0 regardless of later repeats
    val r2 = TextAnalysis.vocabGrowth(
      Seq((0L, "b a"), (1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r2 == Map(0L -> 2L, 1L -> 0L))
  }

  test("capPerGroup: unbiased hash-chosen cap, small groups intact, deterministic") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1 to 50) yield (g, s"$g$i", i)).toDF("g", "id", "payload")
      .union(Seq(("c", "c1", 1)).toDF("g", "id", "payload")) // group smaller than cap
    val capped = graft.operators.Sampling.capPerGroup(df, "g", "id", cap = 10)
    val byGroup = capped.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("a" -> 10L, "b" -> 10L, "c" -> 1L))
    // chosen by key hash, not payload order: the kept payloads are not
    // simply the 10 smallest
    val keptA = capped.filter(col("g") === "a").select("payload").collect().map(_.getInt(0)).sorted
    assert(!keptA.sameElements(1 to 10))
    // deterministic across evaluations
    val again = graft.operators.Sampling.capPerGroup(df, "g", "id", cap = 10)
      .select("id").collect().map(_.getString(0)).toSet
    assert(again == capped.select("id").collect().map(_.getString(0)).toSet)
  }

  test("quality buckets: exact thresholds, map-stage assignment, approx within rank bound") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "score")
    // percentile_disc quartiles of 1..100 are exactly 25/50/75
    val t = graft.operators.Stats.exactThresholds(df, "score", Seq(25, 50, 75))
    assert(t == Seq(25L, 50L, 75L))
    val buckets = graft.operators.Stats.bucketByThresholds(df, "score", t)
      .groupBy("bucket").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets == Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    // boundary semantics: score == threshold stays in the LOWER bucket
    val edge = graft.operators.Stats.bucketByThresholds(
      Seq((0L, 25L), (1L, 26L)).toDF("id", "score"), "score", t)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(edge(0L) == 1 && edge(1L) == 2)
    // approx thresholds: rank error <= n/accuracy (here n=100, acc=10000 -> exact)
    val ta = graft.operators.Stats.approxThresholds(df, "score", Seq(25, 50, 75))
    t.lazyZip(ta).foreach((e, a) => assert(math.abs(e - a) <= 1, s"approx $a vs exact $e"))
    intercept[IllegalArgumentException](
      graft.operators.Stats.bucketByThresholds(df, "score", Seq(50L, 25L)))
  }

  test("rarityScore: rank-based surprisal, OOV rank V+1, integer mean") {
    import spark.implicits._
    // corpus counts: x:3, y:2, z:1 -> ranks x=1, y=2; vocabSize=2 -> z OOV rank 3
    val docs = Seq((1L, "x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.rarityScore(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((3L, 1L + 1L + 2L, 4L * 100 / 3)))   // 1+1+2=4, mean 133
    assert(r(2L) == ((3L, 1L + 2L + 3L, 200L)))           // 1+2+3=6, mean 200
  }

  test("product quantization: L2 codebooks, code compression, ADC retrieval") {
    import spark.implicits._
    // two obvious clusters per subspace: first half of dims near e0 or e1,
    // second half near e2 or e3 — 4 combined "quadrants"
    def vec(a: Int, b: Int, j: Int): Array[Float] = {
      val v = Array.fill(8)(0f)
      v(a) = 1f; v(4 + b) = 1f
      v(2) = 0.01f * j // small within-cluster jitter
      v
    }
    // quadrant order (0,0),(1,1),(0,1),(1,0) puts BOTH clusters of each
    // subspace among the first two ids, so the deterministic first-k
    // seeding starts one centroid in each (id = j*4 + quadrant)
    val quads = Seq((0, 0), (1, 1), (0, 1), (1, 0))
    val pts = (for ((qd, q) <- quads.zipWithIndex; j <- 0 until 10)
      yield (j * 4 + q).toLong -> vec(qd._1, qd._2, j)).toSeq
    val df = pts.toDF("vec_id", "embedding")
    // L2 assignment: brute-force check on the fixture
    val cents = Seq(0L -> vec(0, 0, 0), 1L -> vec(1, 1, 0))
    val assigned = graft.operators.Similarity.assignToCentroidsL2(df, "embedding", cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    def sq(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; for (i <- x.indices) { val d = x(i).toDouble - y(i).toDouble; s += d * d }; s
    }
    pts.foreach { case (id, v) =>
      val want = cents.minBy { case (cid, cv) => (sq(v, cv), cid) }._1
      assert(assigned(id) == want, s"vec $id assigned ${assigned(id)}, brute force $want")
    }
    // codebooks: m=2 subspaces, k=2 centroids each, correct shapes
    val cbs = graft.operators.Similarity.pqCodebooks(df, "vec_id", "embedding",
      dim = 8, m = 2, k = 2, iters = 2)
    assert(cbs.length == 2 && cbs.forall(cb => cb.length == 2 && cb.forall(_._2.length == 4)))
    // codes: every vector's code is a codebook cid; same-quadrant vectors
    // share codes (the compression actually clusters)
    val enc = graft.operators.Similarity.pqEncode(df, "vec_id", "embedding", 8, cbs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(enc.values.toSet.size == 4, s"expected 4 distinct codes, got ${enc.values.toSet}")
    for (q <- 0 to 3) {
      val ids = (0 until 10).map(j => (j * 4 + q).toLong)
      assert(ids.map(enc).toSet.size == 1, s"quadrant $q should share one code")
    }
    // ADC top-k: neighbors of probe 0 are its own quadrant (ids 4,8,...,36)
    val top = graft.operators.Similarity.pqAdcTopK(df, "vec_id", "embedding",
      dim = 8, probeId = 0L, k = 9, m = 2, kcent = 2, iters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == (1 to 9).map(j => (j * 4).toLong).toSet, s"ADC top-9 was $top")
    // composed IVF+PQ: ids 0-3 are one per quadrant, so the first-nlist
    // coarse seeding puts one list per quadrant; nprobe=1 restricts the
    // candidates to the probe's own quadrant before ADC even runs
    val ivfpq = graft.operators.Similarity.ivfPqTopK(df, "vec_id", "embedding",
      dim = 8, probeId = 0L, k = 9, nlist = 4, nprobe = 1, m = 2, kcent = 2, pqIters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(ivfpq == (1 to 9).map(j => (j * 4).toLong).toSet, s"IVF+PQ top-9 was $ivfpq")
  }

  test("bpe: deterministic merges, lowest-rank-first encode, lossless concat") {
    import spark.implicits._
    import graft.operators.Bpe
    // low x3 + lower: (l,o) and (o,w) tie at 4 -> lexicographic picks (l,o);
    // then (lo,w)=4; then (e,r) vs (low,e) tie at 1 -> (e,r); then (low,er)
    val corpus = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    // train is deterministic across invocations
    assert(Bpe.train(corpus, "text", numMerges = 10) == merges)
    // encode: learned words collapse to single tokens; novel word "lowly"
    // gets the applicable prefix merges only
    val enc = Bpe.encodeTokens(
      Seq((1L, "low lower lowly"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(enc(1L)._2 == Seq("low", "lower", "low", "l", "y"))
    assert(enc(1L)._1 == 5L)
    assert(enc(2L) == ((0L, Seq())))
    // losslessness: tokens of each word concatenate back to the word
    val words = "lowering slowest wallflower".split(" ")
    words.foreach { w =>
      assert(Bpe.encodeWord(w, merges.zipWithIndex.toMap).mkString == w)
    }
    // rank order beats left-to-right greed: for "lower" the (e,r) merge
    // (rank 2) must not be pre-empted by scanning order once (low,er)
    // exists -- the final token is the single "lower"... which requires
    // (low, er), which requires BOTH (lo,w)-chain and (e,r) first
    assert(Bpe.encodeWord("lower", merges.zipWithIndex.toMap) == Vector("lower"))
  }

  test("bpe: distributed pair counting learns the exact driver merge table") {
    import spark.implicits._
    import graft.operators.Bpe
    // same toy corpus: the distributed path must reproduce the driver table
    val corpus = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    assert(Bpe.trainDistributed(corpus, "text", numMerges = 10) ==
      Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    // and on a messier corpus (ties, repeats, punctuation, partitioned
    // input) both trainers still agree merge-for-merge; deterministic
    // doc_id filter (not limit) so both paths see the same documents
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 60).repartition(7)
    val drv = Bpe.train(docs, "text", numMerges = 25, sampleDocs = 100)
    val dist = Bpe.trainDistributed(docs, "text", numMerges = 25)
    assert(dist == drv)
    // encode with the distributed table stays lossless
    val ranks = dist.zipWithIndex.toMap
    "lowering slowest".split(" ").foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString == w)
    }
  }

  test("bpe: supplementary-plane chars are single symbols (code points, not UTF-16 units)") {
    import spark.implicits._
    import graft.operators.Bpe
    val x = new String(Character.toChars(0x1D54F)) // one code point, two chars
    // no merges: the initial split IS the token stream — 3 tokens for
    // a+X+b, not 4 (a split by UTF-16 units would shear the surrogate pair
    // and break the q107 certificate's tokens <= code-point-length bound)
    val w = "a" + x + "b"
    val toks = Bpe.encodeWord(w, Map.empty)
    assert(toks == Vector("a", x, "b"))
    assert(toks.mkString == w) // lossless through the pair
    assert(toks.length == w.codePointCount(0, w.length))
    // training on supplementary-plane words merges whole code points
    val corpus = Seq((1L, s"$x$x $x$x $x${x}y")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 1)
    assert(merges == Seq((x, x)))
    assert(Bpe.encodeWord(x + x + "y", merges.zipWithIndex.toMap) == Vector(x + x, "y"))
  }

  test("bpe: q331 oracle replace semantics equal the greedy trainer on adjacent occurrences") {
    import spark.implicits._
    import graft.operators.Bpe
    // The q331 DuckDB oracle rewrites word states with replace() over
    // doubled-chr(1)-separated symbol strings and a single-guard pattern
    // (␁a␁␁b␁ → ␁ab␁). java.lang.String.replace has the same leftmost
    // non-overlapping scan as DuckDB's replace, so this spec replays the
    // oracle's EXACT string algebra on the JVM against Bpe itself, on a
    // corpus engineered for adjacent pair occurrences — the case where the
    // pre-r12 single-separator scheme diverged (ADVICE r11 high).
    val S = 1.toChar.toString; val SS = S + S // chr(1), as the oracle builds it
    def initState(w: String): String = SS + w.map(_.toString).mkString(SS) + SS
    def toSyms(st: String): Vector[String] =
      st.split(java.util.regex.Pattern.quote(SS), -1).toVector.filter(_.nonEmpty)
    def mergeReplace(st: String, a: String, b: String): String =
      st.replace(S + a + SS + b + S, S + a + b + S)
    val texts = Seq("banana bandana ananas", "ababab abab ab banana",
      "aaaa aaa aa a", "mississippi missing mission")
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val nMerges = 12
    val merges = Bpe.train(corpus, "text", numMerges = nMerges)
    // the first three learned pairs all have adjacent occurrences in-corpus
    assert(merges.take(3).toSet == Set(("a", "n"), ("a", "b"), ("a", "a")), s"merges=$merges")
    val allWords = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    // 1. TRAINING replay: the oracle's per-round pair-count + guarded
    //    replace reproduces Bpe.train's merge table pair-for-pair
    var states: Map[String, Long] = allWords.groupBy(initState).map { case (s, ws) => s -> ws.length.toLong }
    val replayed = Vector.newBuilder[(String, String)]
    (1 to nMerges).foreach { _ =>
      val pairCounts = states.toSeq.flatMap { case (st, n) =>
        val syms = toSyms(st)
        syms.zip(syms.drop(1)).map(p => p -> n)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
      replayed += best
      states = states.toSeq.map { case (st, n) => mergeReplace(st, best._1, best._2) -> n }
        .groupBy(_._1).map { case (st, xs) => st -> xs.map(_._2).sum }
    }
    assert(replayed.result() == merges)
    // 2. ENCODE replay: rank-order guarded replace == lowest-rank-first loop
    val ranks = merges.zipWithIndex.toMap
    allWords.distinct.foreach { w =>
      val st = merges.foldLeft(initState(w)) { case (s, (a, b)) => mergeReplace(s, a, b) }
      assert(toSyms(st) == Bpe.encodeWord(w, ranks), s"word '$w'")
    }
    // 3. the bug the doubled separator fixes: a SINGLE shared separator
    //    leaves the second of two adjacent (a,n) occurrences unmerged
    val single = (S + "banana".map(_.toString).mkString(S) + S)
      .replace(S + "a" + S + "n" + S, S + "an" + S)
    assert(single.split(java.util.regex.Pattern.quote(S), -1).toVector.filter(_.nonEmpty)
      == Vector("b", "an", "a", "n", "a")) // ≠ greedy [b, an, an, a]
    assert(Bpe.encodeWord("banana", Map(("a", "n") -> 0)) == Vector("b", "an", "an", "a"))
  }

  test("bpe bytes: full-text roundtrip on hostile unicode, no OOV by construction (r17)") {
    import spark.implicits._
    import graft.operators.Bpe
    // roundtrip property: whatever the merges, the concatenated token
    // bytes reproduce the document's UTF-8 bytes EXACTLY — including
    // whitespace runs, CJK (3-byte), emoji (4-byte, supplementary plane),
    // and bytes the trainer never saw (the byte-fallback alphabet)
    val hostile = Seq(
      "plain ascii text",
      "  leading and   multi space\t tabs\nnewlines  ",
      "数据库查询计划", "naïve — déjà vu!", "mixed 中文 and ascii",
      "emoji 😀🔥 pair", "punct!!!??? ((()))", "")
    val corpus = Seq((1L, "the the the a a b")).toDF("doc_id", "text")
    val merges = Bpe.trainBytes(corpus, "text", numMerges = 5)
    val ranks = merges.zipWithIndex.toMap
    hostile.foreach { t =>
      val toks = Bpe.encodeBytesText(t, ranks)
      val back = new String(
        toks.flatMap(_.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(back == t, s"roundtrip failed for '$t'")
      // no OOV: every token is at least one byte, count bounded by bytes
      assert(toks.forall(_.nonEmpty))
      assert(toks.length <= t.getBytes("UTF-8").length)
    }
    // GPT-2-style space attachment: the space travels WITH the following
    // word (one " the" piece), it does not vanish like a whitespace split
    val pieces = Bpe.bytePreTokens("the the")
    assert(pieces == Vector("the", " the"))
    // the distributed encoder's md5/mass columns certify the same thing:
    // md5(concatenated token bytes) == md5 of the document's UTF-8 bytes
    val doc = "mixed 中文 emoji 😀 !"
    val enc = Bpe.encodeBytes(Seq((7L, doc)).toDF("doc_id", "text"),
      "doc_id", "text", merges).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectHex = md.digest(doc.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(enc.getAs[String]("roundtrip_md5") == expectHex)
    assert(enc.getAs[Long]("token_mass_bytes") == doc.getBytes("UTF-8").length.toLong)
    assert(enc.getAs[Long]("n_bpe_tokens") > 0L)
  }

  test("bpe scalable trainer: delta loop == naive greedy on real text, cap priced, monotone counts (r18 #5)") {
    import spark.implicits._
    import graft.operators.Bpe
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 60).repartition(7)
    // merge-for-merge equality against the naive greedy driver trainer at
    // a merge count that exercises the delta structures hard
    val sc = Bpe.trainBytesScalable(docs, "text", numMerges = 200)
    val drv = Bpe.trainBytes(docs, "text", numMerges = 200, sampleDocs = 10000)
    assert(sc.merges == drv)
    // and against the per-round distributed trainer (its cost profile is
    // why the scalable form exists; its ANSWER must agree)
    assert(Bpe.trainBytesDistributed(docs, "text", 16) == sc.merges.take(16))
    // uncapped run prices itself as exact
    assert(sc.nDistinct == sc.nKept && sc.occTotal == sc.occKept)
    // this slice EXHAUSTS its merge space before 200 (every pre-token a
    // single symbol) — both trainers must stop at the same round
    assert(sc.merges.length == drv.length && sc.merges.length >= 100,
      s"merge space: scalable ${sc.merges.length} vs naive ${drv.length}")
    // cost-curve invariants: one stat per merge, every round touched >= 1
    // word, and best counts are NON-INCREASING (a merge-created pair's
    // count is bounded by the count of the merge that created it)
    assert(sc.rounds.length == sc.merges.length)
    assert(sc.rounds.forall(_.wordsTouched >= 1L))
    sc.rounds.sliding(2).foreach { case Seq(a, b) =>
      assert(b.bestCount <= a.bestCount,
        s"best count rose ${a.bestCount} -> ${b.bestCount} at round ${b.round}")
    }
    // a BINDING vocab cap is priced, never silent: top-10 pre-tokens kept,
    // foregone occurrence mass positive, training still deterministic
    val capped = Bpe.trainBytesScalable(docs, "text", numMerges = 20, maxVocab = 10)
    assert(capped.nKept == 10L && capped.nDistinct > 10L)
    assert(capped.occTotal > capped.occKept && capped.occKept > 0L)
    assert(capped.merges == Bpe.trainBytesScalable(docs, "text", 20, maxVocab = 10).merges)
  }

  test("bpe bytes: distributed trainer equals the driver trainer merge-for-merge (r17)") {
    import spark.implicits._
    import graft.operators.Bpe
    // messy real corpus slice, partitioned input — the q368 gate proves
    // this same parity on the pinned fixture; this spec proves it on real
    // text with punctuation/unicode and more merges
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 60).repartition(7)
    val drv = Bpe.trainBytes(docs, "text", numMerges = 25, sampleDocs = 100)
    val dist = Bpe.trainBytesDistributed(docs, "text", numMerges = 25)
    assert(dist == drv)
    assert(drv.length == 25)
    // byte trainer merges WITHIN pre-token pieces: every learned symbol
    // is a contiguous byte run of some piece, so re-encoding training
    // text stays lossless
    val ranks = drv.zipWithIndex.toMap
    val sample = docs.limit(5).collect().map(_.getString(1))
    sample.foreach { t =>
      val back = new String(
        Bpe.encodeBytesText(t, ranks)
          .flatMap(_.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(back == t)
    }
  }

  test("simhash incremental: batch-vs-corpus candidates equal the one-shot join's cross pairs (r17)") {
    import graft.operators.Dedup
    // planted fixture: real corpus slice, batch = fresh docs + one exact
    // twin and near-twins of corpus docs — ids disjoint by construction
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") < 120)
    val batch = docs.filter(col("doc_id") >= 120 && col("doc_id") < 160)
      .unionByName(corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 900000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text")))
      .unionByName(corpus.filter(col("doc_id") === 3)
        .select(lit(990003L).as("doc_id"), col("text"))) // exact dup: Hamming 0
    val inc = Dedup.simHashAgainstCorpus(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the exact-dup twin must surface at Hamming 0
    assert(inc.exists { case (b, c, h) => b == 990003L && c == 3L && h == 0L })
    // parity: the one-shot self-join over batch ∪ corpus, restricted to
    // cross (batch, corpus) pairs, is EXACTLY the incremental result —
    // the frozen-epoch path loses nothing and invents nothing (caps
    // non-binding on this fixture, so both sides are exact)
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.simHashPairs(corpus.unionByName(batch), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .collect { // orient each a<b pair as (batch, corpus); drop same-side pairs
        case (a, b, h) if corpusIds.contains(a) && !corpusIds.contains(b) => (b, a, h)
        case (a, b, h) if !corpusIds.contains(a) && corpusIds.contains(b) => (a, b, h)
      }.toSet
    assert(inc == oneShot,
      s"incremental ${inc.size} pairs vs one-shot cross ${oneShot.size}")
    assert(inc.nonEmpty) // the fixture planted real matches
  }

  test("int8 per-dim quantization: codes in range, reconstruction within one step, degenerate dims exact (r17)") {
    import spark.implicits._
    import graft.operators.Similarity
    // fixture: dims with wildly different ranges (the case per-vector
    // symmetric scaling wastes codes on) + a constant dim + negatives
    val vecs = Seq(
      (1L, Array(0.0f, -100f, 0.001f, 7f)),
      (2L, Array(0.0f, 50f, 0.004f, 7f)),
      (3L, Array(0.0f, 300f, -0.002f, 7f)),
      (4L, Array(0.0f, 0f, 0.006f, 7f))).toDF("vec_id", "v")
    val params = Similarity.int8DimParams(vecs, "v")
    // mins/maxes are float32 values widened to double — compare in that space
    assert(params == Seq((0.0, 0.0), (-100.0, 300.0),
      ((-0.002f).toDouble, 0.006f.toDouble), (7.0, 7.0)))
    val q = Similarity.quantizeInt8PerDim(vecs, "v", params)
    val dq = Similarity.dequantizeInt8PerDim(q, "q8", "vhat", params)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2), r.getSeq[Float](3))).toList
    dq.foreach { case (_, codes, _) =>
      assert(codes.forall(c => c >= 0 && c <= 255), s"codes out of range: $codes")
    }
    val byId = dq.map(t => t._1 -> t).toMap
    // extremes land on the code-range ends
    assert(byId(1L)._2(1) == 0)    // min of dim 1 (-100)
    assert(byId(3L)._2(1) == 255)  // max of dim 1 (300)
    // zero-range dims (dim 0 all-zero, dim 3 constant 7) reconstruct EXACTLY
    dq.foreach { case (_, codes, vhat) =>
      assert(codes(0) == 0 && vhat(0) == 0.0f)
      assert(codes(3) == 0 && vhat(3) == 7.0f)
    }
    // reconstruction error bounded by one quantization step per dim
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    dq.foreach { case (id, _, vhat) =>
      orig(id).zip(vhat).zip(params).foreach { case ((x, xh), (mn, mx)) =>
        val step = (mx - mn) / 255.0
        assert(math.abs(x - xh) <= step + 1e-9,
          s"vec $id: |$x - $xh| > step $step")
      }
    }
  }

  test("binary sign codes: u32 halves match a driver-side sign-table fold (r17b)") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter("vec_id < 20")
    val got = Similarity.binarySignCodes(e, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def codeOf(v: Array[Float], seed: Int): Long = {
      val tab = graft.functions.HyperplaneBucket.table(32, v.length, seed)
      (0 until 32).map { p =>
        var acc = 0.0
        var i = 0
        while (i < v.length) { // the expression's exact accumulation order
          if (tab(p)(i)) acc += v(i).toDouble else acc -= v(i).toDouble
          i += 1
        }
        if (acc > 0.0) 1L << p else 0L
      }.sum
    }
    vecs.foreach { case (id, v) =>
      assert(got(id) == (codeOf(v, Similarity.DefaultPlaneSeed), codeOf(v, 1337)),
        s"code mismatch for vec $id")
      assert(got(id)._1 >= 0L && got(id)._1 < (1L << 32))
      assert(got(id)._2 >= 0L && got(id)._2 < (1L << 32))
    }
  }

  test("binary quant recall: exhaustive shortlist degenerates to exact brute force (r17b)") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probeF = org.apache.spark.sql.functions.col("vec_id") % 100 === 0
    // shortlist >= corpus-1: the rerank stage sees every candidate, so the
    // two-stage chain IS brute force — rerank recall must be 100 everywhere
    val exhaustive = Similarity.binaryQuantRecall(e, "vec_id", "embedding",
        probeF, k = 10, shortlist = 499)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(exhaustive.length == 5)
    exhaustive.foreach { case (pid, raw, rr, rrPct) =>
      assert(rr == 10L && rrPct == 100L, s"probe $pid rerank $rr/$rrPct")
      assert(raw <= 10L)
    }
    // production shortlist: recall can only drop vs exhaustive, raw recall
    // can never exceed the reranked form's candidate pool
    val short = Similarity.binaryQuantRecall(e, "vec_id", "embedding",
        probeF, k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    short.foreach { case (pid, raw, rr) =>
      assert(raw >= 0L && raw <= 10L && rr >= raw,
        s"probe $pid: raw $raw rerank $rr — rerank of a superset pool can't lose to its own top-k prefix")
    }
    // deterministic across partitionings
    val again = Similarity.binaryQuantRecall(e.repartition(7), "vec_id",
        "embedding", probeF, k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    assert(again.sortBy(_._1) == short.sortBy(_._1))
  }

  test("random projection: values match the driver fold, census bands nest, partition-invariant (r17b)") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rp = Similarity.randomProject(e, "embedding", "rp", dims = 64, outDims = 16)
      .select("vec_id", "rp", "embedding")
    val got = rp.filter("vec_id < 10").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray))
    val tab = graft.functions.HyperplaneBucket.table(16, 64, Similarity.DefaultPlaneSeed)
    got.foreach { case (id, y, x) =>
      assert(y.length == 16)
      (0 until 16).foreach { p =>
        var acc = 0.0
        var i = 0
        while (i < 64) { // zip_with multiplies by ±1.0, then the left fold adds
          acc += x(i).toDouble * (if (tab(p)(i)) 1.0 else -1.0); i += 1
        }
        assert(y(p) == acc.toFloat, s"vec $id plane $p: ${y(p)} vs ${acc.toFloat}")
      }
    }
    val cert = Similarity.rpDistortionCertificate(e, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") % 100 === 0,
        k = 10, dims = 64, outDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(cert.length == 5)
    cert.foreach { case (pid, ov, pct, pairs, w10, w25) =>
      assert(ov >= 0L && ov <= 10L && pct == ov * 10)
      assert(pairs == 499L, s"probe $pid: fixture has no identical vectors, pairs $pairs")
      assert(w10 <= w25 && w25 <= pairs, s"probe $pid bands must nest: $w10/$w25/$pairs")
      // chi-square_16 concentration: the ±25% band holds a meaningful mass
      assert(w25 * 100 / pairs >= 30L, s"probe $pid: JL concentration broke, $w25/$pairs")
    }
    // deterministic across partitionings
    val again = Similarity.rpDistortionCertificate(e.repartition(7), "vec_id",
        "embedding", org.apache.spark.sql.functions.col("vec_id") % 100 === 0,
        k = 10, dims = 64, outDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sortBy(_._1).toList
    assert(again == cert.map(c => (c._1, c._2, c._5)).sortBy(_._1).toList)
  }

  test("materialize mixture: exact per-domain counts, bucketed cut == global rank, absent domains shortfall (r17b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import graft.operators.Sampling
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (10L, "b"), (11L, "b"), (12L, "b"),
      (20L, "c"), (21L, "c")).toDF("doc_id", "lang")
    val targets = Map("a" -> 10L, "b" -> 3L, "c" -> 1L, "ghost" -> 5L)
    val out = Sampling.materializeMixture(docs, "lang", "doc_id", targets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exact counts: 10 + 3 + 1; ghost is a silent shortfall (no rows)
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("a" -> 10, "b" -> 3, "c" -> 1))
    // domain a: copies=2 (every doc twice at copy_idx 0,1), rem=2 docs get idx 2
    val aIdx = out.filter(_._2 == "a").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toList).toMap
    assert(aIdx.values.forall(l => l.startsWith(List(0L, 1L))))
    assert(aIdx.values.count(_ == List(0L, 1L, 2L)) == 2)
    // domain b: copies=1 rem=0 — every doc exactly once at idx 0
    assert(out.filter(_._2 == "b").map(_._3).toList == List(0L, 0L, 0L))
    // domain c: pure downsample — ONE doc, at copy_idx 0, and it must be
    // the md5-rank-smallest (the global-window reference form)
    val cPick = out.filter(_._2 == "c").map(_._1).toList
    val cExpected = docs.filter(col("lang") === "c")
      .withColumn("__h", Sampling.hash32Of("doc_id"))
      .orderBy(col("__h"), col("doc_id")).limit(1)
      .collect().map(_.getLong(0)).toList
    assert(cPick == cExpected)
    // bucketed boundary cut == global rank at ANY bucket count
    val out2 = Sampling.materializeMixture(docs, "lang", "doc_id", targets, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toList
    val out4096 = Sampling.materializeMixture(docs.repartition(5), "lang", "doc_id",
        targets, buckets = 4096)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toList
    assert(out2 == out.sorted.toList && out4096 == out2)
    // remainder selection equals the simple global per-domain window form
    val ref = docs.withColumn("__h", Sampling.hash32Of("doc_id"))
      .withColumn("__rk", expr(
        "row_number() over (partition by lang order by __h, doc_id)"))
      .filter((col("lang") === "a" && col("__rk") <= 2) ||
        (col("lang") === "c" && col("__rk") <= 1))
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val gotRem = out.filter { case (_, l, i) =>
      (l == "a" && i == 2L) || (l == "c" && i == 0L) }
      .map(t => (t._1, t._2)).toSet
    assert(gotRem == ref)
  }

  test("pca power iteration: planted component found, shift-invariant, monotone Rayleigh (r17b)") {
    import spark.implicits._
    import graft.operators.Similarity
    // planted: dim 3 carries ~16x the variance of the noise dims; all
    // values are multiples of 2^-8 so the +0.5 shift below is float-exact
    def noise(i: Int, j: Int): Float = (((i * (j + 2)) % 3) - 1) * 0.0078125f
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(8)(j => noise(i, j))
      v(3) = ((i % 7) - 3) * 0.25f
      (i.toLong, v)
    }
    val df = vecs.toDF("id", "v")
    val cert = Similarity.pcaPowerCertificate(df, "v", dims = 8, iters = 6)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(cert.length == 6)
    assert(cert.last._3 == 3L, s"planted dim 3, got ${cert.last._3}")
    assert(cert.last._2 > 9000L, s"dominant component should explain >90%, got ${cert.last._2} bp")
    // Rayleigh quotient is monotone under power iteration (±1 bp for the
    // truncating renormalization at the plateau)
    cert.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 - 1, s"Rayleigh regressed: ${a._2} -> ${b._2}")
    }
    assert(((cert.last._4 >> 3) & 1L) == 1L, "component sign on the planted dim")
    assert(cert.last._5 == 0L, "dims 32..63 do not exist at dims=8")
    // the scatter matrix is translation-invariant: shifting every vector by
    // +0.5 (exact in float and in the 2^16 fixed point) changes nothing
    val shifted = vecs.map { case (id, v) => (id, v.map(_ + 0.5f)) }.toDF("id", "v")
    val cert2 = Similarity.pcaPowerCertificate(shifted, "v", dims = 8, iters = 6)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(cert2.toSeq == cert.toSeq, "centering must not change the scatter certificate")
    // deterministic across partitionings (the BigInt combine is exact —
    // no float-order dependence to hide)
    val cert3 = Similarity.pcaPowerCertificate(df.repartition(7), "v", dims = 8, iters = 6)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(cert3.toSeq == cert.toSeq)
  }

  test("pca gram combine: executor-side 128-bit merge law + dims>=256 driver-receipt bound (r18 #1)") {
    import spark.implicits._
    import graft.operators.Similarity
    // 128-bit add law vs BigInt: random 126-bit values (so sums fit 127
    // bits) plus the Long extremes promoted to (sign-extension, value)
    val rnd = new scala.util.Random(42)
    def decomp(v: BigInt): (Long, Long) =
      ((v >> 64).toLong, (v & ((BigInt(1) << 64) - 1)).toLong)
    val cases = (1 to 200).map { _ =>
      (BigInt(126, rnd) - (BigInt(1) << 125), BigInt(126, rnd) - (BigInt(1) << 125))
    } ++ Seq(
      (BigInt(Long.MaxValue), BigInt(Long.MaxValue)),
      (BigInt(Long.MinValue), BigInt(Long.MinValue)),
      (BigInt(-1), BigInt(1)), (BigInt(0), BigInt(Long.MinValue)))
    cases.foreach { case (x, y) =>
      val (h1, l1) = decomp(x); val (h2, l2) = decomp(y)
      assert(Similarity.big128(h1, l1) == x && Similarity.big128(h2, l2) == y)
      val (hs, ls) = Similarity.add128(h1, l1, h2, l2)
      assert(Similarity.big128(hs, ls) == x + y, s"add128 broke on $x + $y")
    }
    // dims=256, many partitions: the driver receives ONE combined partial
    // of 2*(dims^2+dims)+1 longs — the r17 verdict's receipt bound — and
    // its 128-bit sums equal the driver-computed reference exactly
    val dims = 256
    val rows = (0 until 48).map { i =>
      (i.toLong, Array.tabulate(dims)(j => ((i * 31 + j * 7) % 2003).toLong - 1001L))
    }
    val q = rows.toDF("id", "q").repartition(16)
    val g = Similarity.gramPass(q, "q", dims, scaleBits = 16)
    assert(g.n == 48L)
    assert(g.sHi.length == dims && g.sLo.length == dims)
    assert(g.gHi.length == dims * dims && g.gLo.length == dims * dims)
    val driverLongs = 1 + 2 * g.sLo.length + 2 * g.gLo.length
    assert(driverLongs <= 2 * (dims * dims + dims + 1),
      s"driver received $driverLongs longs > bound ${2 * (dims * dims + dims + 1)}")
    val expS = Array.tabulate(dims)(j => rows.map(r => BigInt(r._2(j))).sum)
    val expG = Array.tabulate(4)(k => { // spot-check 4 scattered cells
      val (i, j) = (k * 67 % dims, (k * 131 + 5) % dims)
      (i * dims + j, rows.map(r => BigInt(r._2(i)) * BigInt(r._2(j))).sum)
    })
    (0 until dims).foreach(j =>
      assert(Similarity.big128(g.sHi(j), g.sLo(j)) == expS(j)))
    expG.foreach { case (k, exp) =>
      assert(Similarity.big128(g.gHi(k), g.gLo(k)) == exp) }
    // overflow on unnormalized input fails LOUDLY, naming the knob (r17
    // ADVICE 2): magnitudes ~2^40 at scaleBits=16 quantize to ~2^56, whose
    // squares overflow 2^63 — must throw, never certify garbage
    val huge = (0 until 8).map(i => (i.toLong,
      Array.fill(4)((1L << 40).toFloat))).toDF("id", "v")
    val ex = intercept[org.apache.spark.SparkException] {
      Similarity.pcaPowerCertificate(huge, "v", dims = 4, iters = 1).collect()
    }
    assert(ex.getMessage.contains("scaleBits") ||
      Option(ex.getCause).exists(_.getMessage.contains("scaleBits")),
      s"overflow error must name the fix, got: ${ex.getMessage}")
  }

  test("pca epoch drift: identical epochs score exactly 10000, a planted rotation collapses cos2 (r17b)") {
    import spark.implicits._
    import graft.operators.Similarity
    def noise(i: Int, j: Int): Float = (((i * (j + 2)) % 3) - 1) * 0.0078125f
    def corpus(axis: Int) = (0 until 40).map { i =>
      val v = Array.tabulate(8)(j => noise(i, j))
      v(axis) = ((i % 7) - 3) * 0.25f
      (i.toLong, v)
    }.toDF("id", "v")
    val a = corpus(3)
    // identical epochs: dot^2 * 10^4 / (|v|^2)^2 == 10^4 EXACTLY
    val same = Similarity.pcaEpochDrift(a, corpus(3), "v", dims = 8, iters = 6)
      .collect().head
    assert(same.getLong(4) == 10000L, s"identical epochs must score 10000, got ${same.getLong(4)}")
    assert(same.getLong(0) == same.getLong(1) && same.getLong(2) == same.getLong(3))
    // the dominant axis rotates 3 -> 6: components near-orthogonal
    val rot = Similarity.pcaEpochDrift(a, corpus(6), "v", dims = 8, iters = 6)
      .collect().head
    assert(rot.getLong(2) == 3L && rot.getLong(3) == 6L)
    assert(rot.getLong(4) < 2500L,
      s"orthogonal rotation must collapse cos2, got ${rot.getLong(4)}")
  }

  test("best F1 threshold: hand-checked optimum, degenerate no-positives tie-break (r17b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Stats
    // t=7 is the optimum: TP3 FP1 FN0 -> F1 = 6/7
    val df = Seq((10L, true), (9L, true), (8L, false), (7L, true),
      (6L, false), (5L, false)).toDF("score", "label")
    val row = Stats.bestF1Threshold(df, "score", col("label")).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6)) ==
      ((7L, 3L, 1L, 0L, 7500L, 10000L, 857142L)))
    // exactly one row comes back
    assert(Stats.bestF1Threshold(df, "score", col("label")).count() == 1L)
    // no positives: every F1 is 0; the tie-break pins the smallest score
    val neg = Seq((5L, false), (3L, false)).toDF("score", "label")
    val r0 = Stats.bestF1Threshold(neg, "score", col("label")).collect().head
    assert(r0.getLong(0) == 3L && r0.getLong(1) == 0L && r0.getLong(5) == 0L
      && r0.getLong(6) == 0L)
    // null labels count as negatives, not errors
    val withNull = Seq((4L, Some(true)), (2L, None)).toDF("score", "label")
    val rn = Stats.bestF1Threshold(withNull, "score", col("label")).collect().head
    assert(rn.getLong(0) == 4L && rn.getLong(6) == 1000000L)
  }

  test("epoch shuffle audit: counts reconcile with the shuffle, empty shards surface (r17b)") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 200L).toDF("k")
    val audit = Sampling.epochShuffleAudit(df, "k", seed = 42L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.length == 8 && audit.map(_._2).sum == 200L)
    // the audit's counts are EXACTLY the shuffle's shard sizes
    val fromShuffle = Sampling.epochShuffle(df, "k", 42L, 8)
      .groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    audit.foreach { case (s, n, shareBp, devBp) =>
      assert(fromShuffle.getOrElse(s, 0L) == n)
      assert(devBp == shareBp - 10000L)
    }
    // multinomial balance at 25 keys/shard: every shard within ±50% of ideal
    assert(audit.forall(a => a._4.abs <= 5000L), s"wildly unbalanced: $audit")
    // more shards than keys: empty shards get (0, 0, -10000) rows
    val tiny = Seq(1L, 2L).toDF("k")
    val sparse = Sampling.epochShuffleAudit(tiny, "k", seed = 1L, nShards = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sparse.length == 64)
    assert(sparse.count(_._1 == 0L) == 62)
    assert(sparse.filter(_._1 == 0L).forall(t => t._2 == 0L && t._3 == -10000L))
    // EMPTY corpus (r18, r17 ADVICE 1): div-by-zero previously emitted NULL
    // shares (an opaque NPE at the first getLong) — now the honest
    // all-empty audit: every spine shard present at (0, 0, -10000)
    val empty = Sampling.epochShuffleAudit(
        spark.range(0).select(col("id").as("k")), "k", seed = 7L, nShards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(empty.length == 5)
    assert(empty.forall(t => t._2 == 0L && t._3 == 0L && t._4 == -10000L))
  }

  test("token budget mixture: bucketed prefix == global prefix, degenerate targets (r17b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import graft.operators.Sampling
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "a" else "b", 5L + (i % 7))
    }.toDF("doc_id", "lang", "n_tok")
    val targets = Map("a" -> 50L, "b" -> 37L)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = keyset(Sampling.tokenBudgetMixture(docs, "lang", "doc_id", "n_tok", targets))
    // reference: the global per-domain running-sum prefix
    val ref = keyset(docs
      .withColumn("__h", Sampling.hash32Of("doc_id"))
      .withColumn("__ct", expr(
        """sum(n_tok) over (partition by lang order by __h, doc_id
          |rows between unbounded preceding and current row)""".stripMargin))
      .filter((col("lang") === "a" && col("__ct") <= 50L) ||
        (col("lang") === "b" && col("__ct") <= 37L)))
    assert(got == ref && got.nonEmpty)
    // any bucket count picks the same prefix; partitioning is irrelevant
    val got4 = keyset(Sampling.tokenBudgetMixture(docs.repartition(7), "lang",
      "doc_id", "n_tok", targets, buckets = 4))
    assert(got4 == ref)
    // the kept token sums never exceed the targets
    val sums = Sampling.tokenBudgetMixture(docs, "lang", "doc_id", "n_tok", targets)
      .groupBy("lang").sum("n_tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums("a") <= 50L && sums("b") <= 37L)
    // zero target drops the domain; an over-sized target keeps all of it
    val degenerate = Sampling.tokenBudgetMixture(docs, "lang", "doc_id", "n_tok",
      Map("a" -> 0L, "b" -> 1000000L))
    assert(degenerate.filter(col("lang") === "a").count() == 0L)
    assert(degenerate.filter(col("lang") === "b").count() ==
      docs.filter(col("lang") === "b").count())
  }

  test("stale quantization drift: identical epochs tie, planted shift clamps and costs recall (r17b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    def noise(i: Int, j: Int): Float = (((i * (j + 3)) % 5) - 2) * 0.125f
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(j => if (j == 0) i / 20.0f else noise(i, j)))
    }.toDF("vec_id", "v")
    val probeF = col("vec_id") % 5 === 0
    // identical epochs: stale params ARE fresh params — columns must tie
    val same = Similarity.staleQuantRecall(base, base, "vec_id", "v", probeF, k = 3)
      .collect()
    assert(same.length == 4)
    same.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4))
      assert(r.getLong(5) == 0L, "nothing clamps against its own params")
    }
    // planted drift: dim 0 of rows 0..9 shifts far beyond the stale range
    val head = (0 until 20).map { i =>
      val v = Array.tabulate(4)(j => if (j == 0) i / 20.0f else noise(i, j))
      if (i < 10) v(0) += 5.0f
      (i.toLong, v)
    }.toDF("vec_id", "v")
    val drift = Similarity.staleQuantRecall(base, head, "vec_id", "v", probeF, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5)))
    // exactly the 10 shifted dim-0 values clamp against the stale range
    assert(drift.forall(_._4 == 10L), s"clamp census wrong: ${drift.toList}")
    // clamping can only lose ground: fresh params never trail stale in total
    assert(drift.map(_._3).sum >= drift.map(_._2).sum,
      s"fresh must not trail stale overall: ${drift.toList}")
  }

  test("script census: hand-checked mixed-script counts, empty doc, labeling-bug surfacing (r17b)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Привет мир 123 abc 数据"),
      (2L, ""),
      (3L, "¡señor! — naïve×café")).toDF("doc_id", "text")
    val got = TextAnalysis.scriptCensus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // Приветмир=9 cyr, 123=3 digit, abc=3 latin, 数据=2 cjk, other=0
    assert(got(1L) == ((17L, 3L, 3L, 2L, 9L, 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    // señor/naïve/café letters are Latin-1 letters; ¡ ! — × are other
    // (× U+00D7 is deliberately outside the letter ranges)
    assert(got(3L)._2 == 14L && got(3L)._6 == 4L, s"got ${got(3L)}")
    // the audit this op exists for: the synthetic docs table is all-ASCII,
    // so its 'zh' label carries ZERO CJK characters — a labeling bug the
    // census surfaces in one pass
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val zh = TextAnalysis.scriptCensus(real.filter($"lang" === "zh"), "doc_id", "text")
    assert(zh.agg(org.apache.spark.sql.functions.sum("cjk")).head().getLong(0) == 0L)
  }

  test("incremental clusters: bridge merges, chain joins, singletons, == from-scratch (r17b)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    // prior epoch: corpus pairs (1,2),(2,3),(5,6) -> clusters {1,2,3}=1,
    // {5,6}=5, 4/7..10 singletons
    val corpusPairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_doc_id", "b_doc_id")
    val cc0 = Dedup.connectedComponents(corpusPairs, "a_doc_id", "b_doc_id")
    val corpusIds = (1L to 10L).toDF("doc_id")
    val prior = corpusIds
      .join(cc0.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.coalesce(col("component"), col("doc_id"))
          .as("cluster"))
    // batch: 101 bridges prior clusters 1 and 5 (via corpus docs 2 and 6);
    // 103-104 chain to 102, which touches corpus 9; 105 arrives unpaired
    val bc = Seq((101L, 2L), (101L, 6L), (102L, 9L)).toDF("batch_id", "corpus_id")
    val bb = Seq((103L, 104L), (104L, 102L)).toDF("a_doc_id", "b_doc_id")
    val batchIds = Seq(101L, 102L, 103L, 104L, 105L).toDF("doc_id")
    val gotDf = Dedup.incrementalClusters(prior, "doc_id", bc, bb, batchIds,
      "a_doc_id", "b_doc_id")
    val got = gotDf
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // closure law (r18 #2): the maintained table is itself a valid min-id
    // prior — the nightly loop feeds tonight's output back as tomorrow's
    // --prior, and the runtime audit must accept its own producer
    assert(Dedup.auditPriorLabeling(
      gotDf.select(col("doc_id"), col("cluster")), "doc_id").count() == 0L)
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L, // bridge merged {1,5}
      4L -> 4L, 7L -> 7L, 8L -> 8L, 10L -> 10L,
      9L -> 9L, 102L -> 9L, 103L -> 9L, 104L -> 9L,     // chain into 9
      101L -> 1L, 105L -> 105L)
    assert(got.view.mapValues(_._1).toMap == expected, s"got $got")
    got.foreach { case (id, (_, isNew)) =>
      assert(isNew == (if (id > 100L) 1L else 0L), s"is_new wrong for $id")
    }
    // the central claim: incremental == from-scratch over the union graph
    val allPairs = corpusPairs
      .unionByName(bc.toDF("a_doc_id", "b_doc_id"))
      .unionByName(bb)
    val scratch = Dedup.connectedComponents(allPairs, "a_doc_id", "b_doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (corpusIds.collect().map(_.getLong(0)) ++ Seq(101L, 102L, 103L, 104L, 105L))
      .foreach { id =>
        assert(got(id)._1 == scratch.getOrElse(id, id),
          s"incremental diverged from from-scratch at $id")
      }
  }

  test("prior labeling audit: clean CC output audits empty, every corruption mode surfaces (r18 #2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col}
    import graft.operators.Dedup
    // a REAL completed clustering (connectedComponents + singleton
    // self-labels — exactly incrementalClusters' documented contract)
    // must audit EMPTY
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs, "a", "b")
    val prior = (1L to 10L).toDF("doc_id")
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster"))
    assert(Dedup.auditPriorLabeling(prior, "doc_id").count() == 0L)
    // corruption modes: (a) label above min (cluster {1,2,3} labeled 2);
    // (b) label not a member at all (7 labeled 999); (c) null label
    val corrupt = Seq(
      (1L, Some(2L)), (2L, Some(2L)), (3L, Some(2L)),
      (5L, Some(5L)), (6L, Some(5L)),
      (7L, Some(999L)), (8L, Option.empty[Long]))
      .toDF("doc_id", "cluster")
    val bad = Dedup.auditPriorLabeling(corrupt, "doc_id")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(4))).toMap
    assert(bad == Map(2L -> "label_not_min", 999L -> "label_not_member",
      -1L -> "label_not_member"), bad.toString)
  }

  test("graph search top-k: beam >= greedy aggregate recall, bounded cost, partition-invariant (r18 #6)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
      bits = 3, kGraph = 4, seed2 = 1337)
    val rows = Similarity.graphSearchTopK(e, "vec_id", "embedding", g,
        col("vec_id") % 20 === 0, k = 4, beams = Seq(1, 3), nEntry = 3, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val nProbes = e.filter(col("vec_id") % 20 === 0).count()
    assert(rows.length == 2 * nProbes)
    // bounded hops and bounded per-query cost: visited <= entries + hops*b*degree
    rows.foreach { case (_, b, hops, nv, hits, rec) =>
      assert(hops == 3L)
      assert(nv <= 3 + 3 * b * 4, s"visited $nv exceeds the frontier-degree bound")
      assert(hits >= 0L && hits <= 4L && rec == hits * 100 / 4)
    }
    // the beam >= greedy law, in AGGREGATE over probes (per probe a wider
    // frontier can wander differently; summed over the probe set the
    // wider beam must not lose recall on this fixture)
    val byBeam = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(byBeam(3L) >= byBeam(1L),
      s"beam recall ${byBeam(3L)} under greedy ${byBeam(1L)}")
    // and the walk actually finds things on this graph
    assert(byBeam(3L) > 0L)
    // partition invariance: md5 entries, windowed ranks and keyed joins
    // carry no partition dependence
    val g2 = Similarity.bucketMateGraph(e.repartition(7), "vec_id", "embedding",
      bits = 3, kGraph = 4, seed2 = 1337)
    val rows2 = Similarity.graphSearchTopK(e.repartition(5), "vec_id", "embedding",
        g2, col("vec_id") % 20 === 0, k = 4, beams = Seq(1, 3), nEntry = 3, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows2.sortBy(t => (t._1, t._2)).toSeq == rows.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("graph quant-rerank walk: rerank recovers recall in aggregate, bounded pool, partition-invariant (r18)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
      bits = 3, kGraph = 4, seed2 = 1337).localCheckpoint()
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.graphSearchQuantRerank(df, "vec_id", "embedding", g,
          col("vec_id") % 20 === 0, k = 4, beam = 3, nEntry = 3, maxHops = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
    val rows = run(e)
    val nProbes = e.filter(col("vec_id") % 20 === 0).count()
    assert(rows.length == nProbes)
    rows.foreach { case (_, nv, hq, hr, rq, rr) =>
      assert(nv <= 3 + 3 * 3 * 4, s"visited $nv exceeds the frontier-degree bound")
      assert(hq >= 0L && hq <= 4L && hr >= 0L && hr <= 4L)
      assert(rq == hq * 100 / 4 && rr == hr * 100 / 4)
    }
    // the retrieve-rerank claim, in AGGREGATE: the float rerank of the
    // SAME visited pool never loses recall to the quantized ranking on
    // this fixture (per probe the quantized order can luck into a truth
    // row the float order ranks k+1th, so the law is aggregate)
    val sq = rows.map(_._3).sum
    val sr = rows.map(_._4).sum
    assert(sr >= sq, s"rerank $sr under quant $sq")
    assert(sr > 0L)
    // partition invariance
    assert(run(e.repartition(7)).sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("nn-descent build: monotone per-round hits, fixpoint early exit (r17)") {
    import graft.operators.Similarity
    // real embedding slice: hits must be monotone nondecreasing round to
    // round (old edges always re-enter the candidate set) and the loop
    // must stop within maxRounds+1 rows, last row gaining 0 unless cut
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.nnDescentBuildCertificate(e, "vec_id", "embedding",
      probeMod = 20L, bits = 3, kGraph = 4, maxRounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.head._1 == 0L && rows.head._2 == rows.head._3) // round 0 gains itself
    rows.sliding(2).foreach {
      case Array((_, h0, _), (r, h1, g)) =>
        assert(h1 >= h0, s"hits regressed at round $r: $h0 -> $h1")
        assert(g == h1 - h0)
      case _ => ()
    }
    // fixpoint exit: if the loop stopped before maxRounds, the last round
    // gained nothing (that IS the exit condition)
    if (rows.length < 6) assert(rows.last._3 == 0L)
    // zero-round form: just the baseline census
    val base = Similarity.nnDescentBuildCertificate(e, "vec_id", "embedding",
      probeMod = 20L, bits = 3, kGraph = 4, maxRounds = 0).collect()
    assert(base.length == 1 && base.head.getLong(0) == 0L)
  }

  test("pagerank: uniform on rings, concentrates on hubs, deterministic") {
    import spark.implicits._
    import graft.operators.Graphs
    // ring 0->1->...->5->0: perfect symmetry, every rank identical forever
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val ringRanks = Graphs.pageRank(ring, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ringRanks.size == 6 && ringRanks.values.toSet.size == 1)
    // the fixed-point trickle: mass never exceeds the scale
    assert(ringRanks.values.sum <= 1000000L)
    // star: every leaf points at the hub; hub rank dwarfs leaf rank
    val star = (1L to 9L).map(i => (i, 0L)) :+ ((0L, 1L))
    val starRanks = Graphs.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starRanks(0L) > 5 * starRanks(2L), s"hub ${starRanks(0L)} vs leaf ${starRanks(2L)}")
    // node 1 receives the hub's whole mass, so it beats the other leaves
    assert(starRanks(1L) > starRanks(2L))
    // deterministic across invocations and partitionings
    val again = Graphs.pageRank(star.toDF("src", "dst").repartition(5), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == starRanks)
    // iters = 0 is the uniform prior
    val r0 = Graphs.pageRank(ring, "src", "dst", 0)
      .collect().map(_.getLong(1)).toSet
    assert(r0 == Set(1000000L / 6))
  }

  test("markov transitions: exact row-normalized counts, first events emit nothing") {
    import spark.implicits._
    import graft.operators.Stats
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L), // a→b, b→a, a→b
      (2L, "a", 1L), (2L, "c", 2L),                               // a→c
      (3L, "b", 1L)                                               // lone event: no pair
    ).toDF("u", "state", "seq")
    val out = Stats.markovTransitions(ev, "u", "state", "seq")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 666666L)), // 2 of 3 transitions out of a
      ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("cdc latest: highest version wins, tombstones erase, helpers dropped") {
    import spark.implicits._
    import graft.engine.DiffEngine
    val log = Seq(
      (1L, "v1", 1L, 0), (1L, "v2", 2L, 0),   // update chain: v2 current
      (2L, "v1", 1L, 0), (2L, "xx", 2L, 1),   // tombstoned: gone
      (3L, "v1", 1L, 0),                      // untouched
      (4L, "xx", 1L, 1), (4L, "back", 2L, 0)  // deleted then re-inserted: back
    ).toDF("k", "s", "ver", "__del")
    val out = DiffEngine.cdcLatest(log, Seq("k"), "ver", Some("__del"))
    assert(out.columns.toSeq == Seq("k", "s")) // version + tombstone dropped
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "v2", 3L -> "v1", 4L -> "back"))
  }

  test("bfs distances: layer-exact, capped, early exit on saturation") {
    import spark.implicits._
    import graft.operators.Graphs
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("doc_id")
    def run(cap: Int) = Graphs.bfsDistances(path, "src", "dst", seeds, "doc_id", cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // cap binds
    // cap far beyond the diameter: the empty-frontier exit stops the loop
    assert(run(50) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("hits: star graph concentrates authority, spokes share hub mass") {
    import spark.implicits._
    import graft.operators.Graphs
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val out = Graphs.hits(star, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // n=4, h0=250000: a1(9)=10^6, h1(spokes)=333333 each, a2(9)=10^6 again
    assert(out(9L) == ((0L, 1000000L)))
    Seq(1L, 2L, 3L).foreach(v => assert(out(v) == ((333333L, 0L))))
  }

  test("dq audit: null predicate violates, ref and unique rules count exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.DataQuality
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (2L, None)).toDF("k", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val rows = DataQuality.audit(child, Seq(
      "a_fk_present" -> col("fk").isNotNull,     // 1 violation
      "b_fk_small" -> (col("fk") < 50)))         // 99 fails, NULL fails too → 2
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      "a_fk_present" -> ((3L, 1L, 0L)),
      "b_fk_small" -> ((3L, 2L, 0L))))
    val ref = DataQuality.refIntegrityRow("r", child, "fk", parent, "pk").collect().head
    assert((ref.getLong(1), ref.getLong(2), ref.getLong(3)) == ((3L, 2L, 0L))) // 99 + NULL orphan
    val uq = DataQuality.uniqueRow("u", child, "k").collect().head
    assert((uq.getLong(1), uq.getLong(2), uq.getLong(3)) == ((3L, 1L, 0L))) // k=2 twice
  }

  test("ab test certificate: textbook z2 lands significant, degenerate never") {
    import spark.implicits._
    import graft.operators.Stats
    val exp = (Seq.fill(50)(("A", 1L)) ++ Seq.fill(50)(("A", 0L)) ++
      Seq.fill(20)(("B", 1L)) ++ Seq.fill(80)(("B", 0L))).toDF("v", "ok")
    val r = Stats.abTestStats(exp, "v", "ok", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((100L, 50L, 100L, 20L)))
    // dd = 50·100 − 20·100 = 3000 → num = 9·10⁶·200, den = 100·100·70·130
    assert(r.getDecimal(4).longValueExact() == 1800000000L)
    assert(r.getDecimal(5).longValueExact() == 91000000L)
    assert(r.getLong(6) == 1L) // z² ≈ 19.8 ≫ 3.8415
    // every exposure succeeds → pooled failure count 0 → den = 0 → not significant
    val degen = Seq(("A", 1L), ("B", 1L)).toDF("v", "ok")
    assert(Stats.abTestStats(degen, "v", "ok", "A", "B").collect().head.getLong(6) == 0L)
  }

  test("skyline: strict dominance, twins survive, staircase pruning is lossless") {
    import spark.implicits._
    import graft.operators.Pareto
    // frontier: (1,5) (3,7); dominated: (2,5) by (1,5), (3,6) by (3,7),
    // (9,7) by (3,7) cross-bucket with width 2; twins (4,9)x2 both stay
    val rows = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 7L), (4L, 3L, 6L),
      (5L, 9L, 7L), (6L, 4L, 9L), (7L, 4L, 9L)).toDF("id", "cost", "good")
    def run(width: Long) =
      Pareto.skyline2D(rows, "cost", "good", width)
        .select("id").as[Long].collect().sorted.toSeq
    val expected = Seq(1L, 3L, 6L, 7L)
    // every bucketing must give the same frontier (pruning is only a plan
    // optimization): width 1 (fine buckets), 2, and 100 (single bucket =
    // no pruning at all)
    Seq(1L, 2L, 100L).foreach(w => assert(run(w) == expected, s"width $w"))
  }

  test("access log parse: typed fields recovered, malformed counted not thrown") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val lines = Seq(
      """10.0.0.1 - alice [01/Jan/2026:00:00:00 +0000] "GET /index.html HTTP/1.1" 200 1234""",
      """10.0.0.2 - bob [02/Jan/2026:10:30:00 +0000] "POST /api/v1 HTTP/1.1" 503 -""",
      "not a log line at all",
      "").toDF("line")
    val out = TextAnalysis.parseAccessLog(lines, "line")
      .select("ip", "http_method", "url_path", "status", "resp_bytes", "parsed")
      .collect()
    assert(out(0).toSeq == Seq("10.0.0.1", "GET", "/index.html", 200L, 1234L, 1L))
    assert(out(1).toSeq == Seq("10.0.0.2", "POST", "/api/v1", 503L, 0L, 1L))
    assert(out(2).toSeq == Seq(null, null, null, null, null, 0L))
    assert(out(3).toSeq == Seq(null, null, null, null, null, 0L))
  }

  test("sparse cosine: df cap drops stopword, integer algebra exact") {
    import spark.implicits._
    import graft.operators.Similarity
    // "s" appears in all 3 docs → dropped at dfCap=2; remaining vectors
    // d1 = {a:2, b:1}, d2 = {a:1, b:1, c:1}, d3 = {z:2}
    val tf = Seq(
      (1L, "a", 2L), (1L, "b", 1L), (1L, "s", 1L),
      (2L, "a", 1L), (2L, "b", 1L), (2L, "c", 1L), (2L, "s", 3L),
      (3L, "z", 2L), (3L, "s", 1L)).toDF("id", "term", "tf")
    val out = Similarity.sparseCosinePairs(tf, "id", "term", "tf", 2500L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // only (1,2) share terms: dot = 2+1 = 3, norms 5 and 3,
    // cos² = 9/15 = 0.6 ≥ 0.25 → cos2_e4 = 6000
    assert(out.toSeq == Seq((1L, 2L, 3L, 5L, 3L, 6000L)))
    // raising the bar above 0.6 kills the pair
    assert(Similarity.sparseCosinePairs(tf, "id", "term", "tf", 6001L, 2L).count() == 0)
  }

  test("grouped top-k: bounded heap matches the window definition across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    import graft.operators.TopK
    // 400 rows, 4 groups, ties on value (id breaks them), spread over 7
    // partitions so map-side heaps must merge correctly at the rank stage
    val rows = (0L until 400L).map(i => (s"g${i % 4}", i, (i * 37) % 50))
    val df = rows.toDF("g", "id", "v").repartition(7)
    val got = TopK.topKPerGroup(df, "g", "id", "v", 6)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 6).orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.size == 24)
  }

  test("iban: mod-97 HOF matches BigInt arithmetic, redaction conservative") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    def bigIntValid(iban: String): Boolean = {
      val expanded = (iban.drop(4) + iban.take(4)).flatMap { c =>
        if (c.isDigit) c.toString else (c - 'A' + 10).toString
      }
      BigInt(expanded) % 97 == 1
    }
    // the canonical published example + a generated one + corruptions
    val real = "GB82WEST12345698765432"
    val bban = "000123456789012345"
    val gen = f"DE${TextAnalysis.ibanCheckDigits("DE", bban)}%02d$bban"
    assert(bigIntValid(real) && bigIntValid(gen))
    val rows = Seq(
      s"pay to $real now",      // valid
      s"ref $gen end",          // valid generated
      s"bad ${real.dropRight(1)}9 x", // corrupted tail digit
      "no candidates here",
      s"two $real and $gen").toDF("text")
    val (nc, nv) = TextAnalysis.ibanCounts("text")
    val out = rows.select(nc.as("c"), nv.as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 0L), (2L, 2L)))
    val red = rows.select(TextAnalysis.redactIbans("text").as("t"))
      .collect().map(_.getString(0))
    assert(red(0) == "pay to <IBAN> now" && red(4) == "two <IBAN> and <IBAN>")
  }

  test("inter-arrival stats: exact gap moments, short entities dropped") {
    import spark.implicits._
    import graft.operators.Stats
    // u1 times 0,10,30,60 → gaps 10,20,30: n=3 sum=60 max=30,
    // var_num = 3·(100+400+900) − 60² = 600; u2 has one gap (dropped at
    // minEvents=3); u3 a single event (no gap at all)
    val df = Seq((1L, 0L), (1L, 10L), (1L, 30L), (1L, 60L),
      (2L, 5L), (2L, 9L), (3L, 7L)).toDF("u", "t")
    val out = Stats.interArrivalStats(df, "u", "t", minEvents = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDecimal(4).longValueExact()) == ((3L, 60L, 30L, 600L)))
  }

  test("proximity pairs: cell-straddling pair found once, far pair dropped") {
    import spark.implicits._
    import graft.operators.Spatial
    // (1,2) straddle a cell boundary at x=100 with dist 6; (1,3) distance
    // 200 (out of radius 10); (4,5) same cell dist 5; (6) isolated
    val pts = Seq((1L, 98L, 50L), (2L, 104L, 50L), (3L, 298L, 50L),
      (4L, 250L, 250L), (5L, 253L, 254L), (6L, 900L, 900L))
      .toDF("id", "x", "y")
    val out = Spatial.proximityPairs(pts, "id", "x", "y", 10L, 100L)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 36L), (4L, 5L, 25L)))
    // shrinking the cell below the radius must be refused, not wrong
    intercept[IllegalArgumentException] {
      Spatial.proximityPairs(pts, "id", "x", "y", 10L, 5L)
    }
  }

  test("weighted median: ties share cumulative weight, heavy tail wins") {
    import spark.implicits._
    import graft.operators.Stats
    // g1: values 1(w1) 2(w1) 9(w10) → W=12, half=6 → wmedian 9;
    // g2: 5(w2) 5(w2) 7(w1) → cum at 5 is 4, 2·4 ≥ 5 → wmedian 5
    val df = Seq(("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 9L, 10L),
      ("g2", 5L, 2L), ("g2", 5L, 2L), ("g2", 7L, 1L)).toDF("g", "v", "w")
    val out = Stats.weightedMedian(df, "g", "v", "w").orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("g1", 12L, 9L), ("g2", 5L, 5L)))
  }

  test("slot residuals: outliers counted against their own slot mean") {
    import spark.implicits._
    import graft.operators.Stats
    // slot 0: values 10,10,40 → mean 20, |v-20|>15 flags only 40 (|10-20|=10);
    // slot 1: 100,100 → no outliers
    val df = Seq((0L, 10L), (0L, 10L), (0L, 40L), (1L, 100L), (1L, 100L))
      .toDF("slot", "v")
    val out = Stats.slotResidualOutliers(df, "slot", "v", 15L)
      .orderBy("slot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 3L, 60L, 1L), (1L, 2L, 200L, 0L)))
  }

  test("fd audit: null RHS is a value, violations counted per LHS") {
    import spark.implicits._
    import graft.operators.DataQuality
    // a=1 → {x, null} violates (null counts); a=2 → {y, y} holds;
    // a=null → {z} holds (null LHS is a group)
    val df = Seq((Some(1L), Some("x")), (Some(1L), None),
      (Some(2L), Some("y")), (Some(2L), Some("y")),
      (None, Some("z"))).toDF("a", "b")
    val r = DataQuality.fdViolations("t", df, "a", "b").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 0L)))
    val clean = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    assert(DataQuality.fdViolations("t", clean, "a", "b")
      .collect().head.getLong(3) == 1L)
  }

  test("rapid repeats: strict gap, first always kept, keys independent") {
    import spark.implicits._
    import graft.operators.Dedup
    val df = Seq(("u1", "c", 0L), ("u1", "c", 99L), ("u1", "c", 100L),
      ("u1", "v", 50L), ("u2", "c", 10L)).toDF("u", "k", "t")
    val out = Dedup.flagRapidRepeats(df, Seq("u", "k"), "t", 100L)
      .orderBy("u", "k", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // 99-0=99 < 100 repeat; 100-99=1 repeat (vs previous RAW event);
    // different key/user never repeats
    assert(out == Seq(("u1", "c", 0L, 0L), ("u1", "c", 99L, 1L),
      ("u1", "c", 100L, 1L), ("u1", "v", 50L, 0L), ("u2", "c", 10L, 0L)))
  }

  test("tree roots: pointer doubling converges and overshoot is idempotent") {
    import spark.implicits._
    import graft.operators.Graphs
    // chain 8→4→2→1(root) plus root 9 with child 18: depths 3,2,1,0,0,1
    val nodes = Seq((1L, None), (2L, Some(1L)), (4L, Some(2L)), (8L, Some(4L)),
      (9L, None), (18L, Some(9L))).toDF("node", "parent")
    def run(iters: Int) = Graphs.treeRootsByDoubling(nodes, "node", "parent", iters)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq((1L, 1L, 0L), (2L, 1L, 1L), (4L, 1L, 2L), (8L, 1L, 3L),
      (9L, 9L, 0L), (18L, 9L, 1L))
    assert(run(2) == want)  // 2^2 = 4 ≥ max depth 3
    assert(run(6) == want)  // overshooting changes nothing
  }

  test("funnel window: hop outside the bound breaks the chain, inside counts") {
    import spark.implicits._
    import graft.operators.Stats
    // u1 converts within gaps of 5; u2's second hop takes 100 (> 10);
    // u3 has steps out of order
    val df = Seq(("u1", "a", 0L), ("u1", "b", 5L), ("u1", "c", 9L),
      ("u2", "a", 0L), ("u2", "b", 5L), ("u2", "c", 105L),
      ("u3", "b", 0L), ("u3", "a", 5L), ("u3", "c", 10L)).toDF("u", "s", "t")
    val out = Stats.funnelWithin(df, "u", "s", "t", Seq("a", "b", "c"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // unbounded funnel still counts u2's slow conversion
    val unb = Stats.funnel(df, "u", "s", "t", Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(unb == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }

  test("url params: map parse, empty on no query, last duplicate wins") {
    import spark.implicits._
    import graft.operators.UrlTools
    import org.apache.spark.sql.functions.{col, map_keys, size}
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val df = Seq("https://a.com/x?p=1&q=2", "https://a.com/plain",
      "https://a.com/x?p=1&p=9").toDF("url")
    val maps = df.select(UrlTools.queryParams("url").as("m"))
      .select(col("m"), size(map_keys(col("m"))).cast("long").as("n")).collect()
    assert(maps(0).getLong(1) == 2L &&
      maps(0).getMap[String, String](0).get("q").contains("2"))
    assert(maps(1).getLong(1) == 0L)
    assert(maps(2).getMap[String, String](0).get("p").contains("9"))
  }

  test("cidr lookup: longest prefix wins, malformed ips null, sloppy nets normalize") {
    import spark.implicits._
    import graft.operators.NetTools
    val conv = Seq("10.0.0.1", "256.1.1.1", "1.2.3", "a.b.c.d", "0.0.0.0")
      .toDF("ip").select(NetTools.ipv4ToLong($"ip").as("n")).collect()
    assert(conv(0).getLong(0) == 10L * 16777216 + 1)
    assert(conv(1).isNullAt(0) && conv(2).isNullAt(0) && conv(3).isNullAt(0))
    assert(conv(4).getLong(0) == 0L)
    // 10.0.0.0/8 contains 10.64.0.0/10; address 10.64.0.5 takes the /10;
    // the /10 net address is given sloppily (10.64.0.99) and must normalize
    val rows = Seq((1L, 10L * 16777216 + 5), (2L, 10L * 16777216 + 64 * 65536 + 5),
      (3L, 11L * 16777216)).toDF("id", "ip")
    val nets = Seq(("wide", 10L * 16777216, 8), ("deep", 10L * 16777216 + 64L * 65536 + 99, 10))
    val out = NetTools.cidrLookup(rows, "ip", "id", nets)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(out == Seq((1L, Some("wide")), (2L, Some("deep")), (3L, None)))
  }

  test("fused self-trained langid is bit-identical to the two-pass composition") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "en", "the dog sleeps while the fox runs through the brown field"),
      (3L, "xx", "zzzt bzzzt krrrk zzzt vrrrm bzzzt zzzt krrrk vrrrm zzzt"),
      (4L, "xx", "krrrk vrrrm zzzt bzzzt krrrk zzzt vrrrm krrrk bzzzt"))
      .toDF("doc_id", "lang", "text")
    val twoPass = TextAnalysis.trigramLanguageId(docs, "doc_id", "text",
      TextAnalysis.trigramProfiles(docs, "lang", "text", 20), 20)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fused = TextAnalysis.trigramLanguageIdSelf(docs, "doc_id", "lang", "text", 20)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fused == twoPass && fused.size == 4)
    assert(fused.forall(r => r(1) == (if (r(0).asInstanceOf[Long] <= 2) "en" else "xx")))
    // plan shape (r11 doc-local re-plan): the returned classification
    // frame must be Exchange-FREE — every per-document step (normalize,
    // count, top-k, distance argmin) fuses into the scan stage; the
    // vocabulary aggregate already ran eagerly into the broadcast model
    val plan = TextAnalysis.trigramLanguageIdSelf(docs, "doc_id", "lang", "text", 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classify stage must not shuffle, plan:\n$plan")
  }

  test("langid: string doc ids pass through untouched; NULL langs train no class") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // ADVICE r11: the r11 doc-local re-plan cast idCol to long, silently
    // NULLing string ids (every doc collapsed onto one id). The id column
    // must come back in its ORIGINAL type and values.
    val docs = Seq(
      ("doc-a", "en", "the quick brown fox jumps over the lazy dog again and again"),
      ("doc-b", "en", "the dog sleeps while the fox runs through the brown field"),
      ("doc-c", "xx", "zzzt bzzzt krrrk zzzt vrrrm bzzzt zzzt krrrk vrrrm zzzt"),
      ("doc-d", null, "krrrk vrrrm zzzt bzzzt krrrk zzzt vrrrm krrrk bzzzt"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.trigramLanguageIdSelf(docs, "doc_id", "lang", "text", 20)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("doc-a", "doc-b", "doc-c", "doc-d"))
    // NULL lang trains NO class: doc-d's trigrams never become a "null"
    // language, but doc-d itself is still classified — its gibberish
    // matches the xx profile
    assert(out.map(_.getString(1)).toSeq == Seq("en", "en", "xx", "xx"))
    // same through the explicit two-pass form: a NULL-lang profile row is
    // dropped rather than scored (DuckDB's lang = NULL join arm never
    // matches — a NULL class cannot be replayed by any SQL oracle)
    val profiles = TextAnalysis.trigramProfiles(docs, "lang", "text", 20)
    assert(profiles.filter(col("lang").isNull).count() == 0)
    val twoPass = TextAnalysis.trigramLanguageId(docs, "doc_id", "text", profiles, 20)
      .orderBy("doc_id").collect()
    assert(twoPass.map(r => (r.getString(0), r.getString(1))).toSeq ==
      out.map(r => (r.getString(0), r.getString(1))).toSeq)
    // output schema carries the original id type (string), not long
    assert(TextAnalysis.trigramLanguageIdSelf(docs, "doc_id", "lang", "text", 20)
      .schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
  }

  test("plan shape: top-k shuffles once, proximity join hashes on cell only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.{Spatial, TopK}
    // top-k: the only hash exchange is the survivors' window — the corpus
    // reaches it already reduced to ≤ k rows per group per task
    val df = (0L until 1000L).map(i => (s"g${i % 4}", i, i * 7 % 100))
      .toDF("g", "id", "v").repartition(8)
    val topkPlan = TopK.topKPerGroup(df, "g", "id", "v", 3)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(topkPlan).size
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$topkPlan")
    // proximity: both sides hash on the cell key; the staircase-free cell
    // join must NOT plan a cartesian/broadcast-nested-loop
    val pts = (0L until 500L).map(i => (i, i * 37 % 10000, i * 91 % 10000))
      .toDF("id", "x", "y")
    val proxPlan = Spatial.proximityPairs(pts, "id", "x", "y", 50L, 50L)
      .queryExecution.executedPlan.toString
    assert(!proxPlan.contains("CartesianProduct") &&
      !proxPlan.contains("BroadcastNestedLoopJoin"),
      s"cell join degenerated:\n$proxPlan")
    // epoch shuffle: the ONLY hash exchange is the per-shard rank window —
    // no global sort, no second shuffle at any scale
    val shufPlan = graft.operators.Sampling.epochShuffle(df, "id", 7L, 8)
      .queryExecution.executedPlan.toString
    val shufEx = "Exchange hashpartitioning".r.findAllIn(shufPlan).size
    assert(shufEx == 1 && !shufPlan.contains("Exchange rangepartitioning"),
      s"epochShuffle must shuffle once, by shard:\n$shufPlan")
    // vocab growth: the 1-row bounds frames ride broadcasts; the corpus
    // must never plan a cartesian product
    val vgPlan = graft.operators.TextAnalysis.vocabGrowth(
      Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!vgPlan.contains("CartesianProduct"), s"vocabGrowth cartesian:\n$vgPlan")
    // compaction plan: ONE hash exchange (the per-partition prefix window)
    // and no range partitioning — the inventory never globally sorts
    val inv = (0L until 200L).map(i => (s"p${i % 4}", i, i % 60))
      .toDF("part", "file_id", "sz").repartition(8)
    val cpPlan = graft.operators.Layout.compactionPlan(inv, "part", "file_id", "sz", 40L, 100L)
      .queryExecution.executedPlan.toString
    val cpEx = "Exchange hashpartitioning".r.findAllIn(cpPlan).size
    assert(cpEx == 1 && !cpPlan.contains("Exchange rangepartitioning"),
      s"compactionPlan must shuffle once, by partition:\n$cpPlan")
    // phrase postings: the only joins are the (doc,pos) adjacency equi-join
    // and the broadcast phrase-list join — never a cartesian blast
    val docs2 = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val phPlan = graft.operators.TextAnalysis.phraseOccurrences(
        docs2, "doc_id", "text", Seq("a" -> "b"))
      .queryExecution.executedPlan.toString
    assert(!phPlan.contains("CartesianProduct") &&
      !phPlan.contains("BroadcastNestedLoopJoin"),
      s"phrase join degenerated:\n$phPlan")
  }

  test("sssp: cheaper long path beats direct edge, negatives rejected") {
    import spark.implicits._
    import graft.operators.Graphs
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L), (2L, 4L, 1L))
      .toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("k")
    val out = Graphs.ssspBellmanFord(edges, "s", "d", "w", seeds, "k", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 4L))
    intercept[IllegalArgumentException] {
      Graphs.ssspBellmanFord(edges.withColumn("w", lit(-1L)), "s", "d", "w", seeds, "k", 2)
    }
  }

  test("k-core peeling: cascade is multi-round, cycle survives as 2-core, q210 is past fixpoint") {
    import spark.implicits._
    import graft.operators.Graphs
    // Path 1-2-3-4-5-6-7 at k=2: leaves peel one layer per round — the
    // operator's round parameter must gate the cascade, not a single pass.
    val path = (1L to 6L).map(i => (i, i + 1)).toDF("s", "d")
    def run(edges: org.apache.spark.sql.DataFrame, k: Int, rounds: Int) =
      Graphs.kCoreSurvivors(edges, "s", "d", k, rounds).collect()
        .map(r => r.getLong(0)).sorted.toSeq
    assert(run(path, 2, 1) == Seq(2L, 3L, 4L, 5L, 6L)) // leaves gone
    assert(run(path, 2, 2) == Seq(3L, 4L, 5L))         // next layer
    assert(run(path, 2, 4).isEmpty)                    // path has no 2-core
    // Cycle + tail: the cycle IS the 2-core; the tail peels away.
    val cycle = Seq((10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L), (13L, 14L))
      .toDF("s", "d")
    assert(run(cycle, 2, 3) == Seq(10L, 11L, 12L))
    // Duplicate + reversed + self-loop edges collapse to the simple graph.
    val messy = cycle.unionByName(Seq((11L, 10L), (10L, 10L), (12L, 10L)).toDF("s", "d"))
    assert(run(messy, 2, 3) == Seq(10L, 11L, 12L))
    // q210's production call reaches fixpoint well inside its round budget:
    // one extra round changes nothing on the sf0.001 graph.
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.ExtensionQueries.defs.find(_.name == "q210_kcore").get
    val atBudget = q.fn(spark, dir).collect().map(_.toSeq).toSeq
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select((col("c_custkey") - 1).cast("long").as("u"))
    val withN = c.crossJoin(broadcast(c.agg(count(lit(1)).as("n"))))
    val hubs = withN.filter(col("u") % 10 === 0)
    val edges = (
      withN.select(col("u").as("src"), expr("(3*u + 7) % n").as("dst")) +:
        Seq(10, 20, 30, 40, 50).map(j =>
          hubs.select(col("u").as("src"), expr(s"(u + $j) % n").as("dst")))
      ).reduce(_ unionByName _)
    val onePast = Graphs.kCoreSurvivors(edges, "src", "dst",
        graft.queries.ExtensionQueries.KcoreK, graft.queries.ExtensionQueries.KcoreRounds + 1)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(atBudget == onePast && atBudget.nonEmpty)
  }

  test("padding waste: length-sorted batching strictly beats a shuffled natural order") {
    import spark.implicits._
    import graft.operators.Packing
    // Batches of 2: natural order pairs (9,1),(9,1) — each pads 8; sorted
    // order pairs (1,1),(9,9) — zero padding.
    val d = Seq((1L, 9L), (2L, 1L), (3L, 9L), (4L, 1L)).toDF("id", "tk")
    val out = Packing.paddingWaste(d, "tk", 2, Seq(
        "nat" -> col("id"), "srt" -> (col("tk") * 1000 + col("id"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("nat") == ((2L, 20L, 16L, 5555L))) // 20 real, 16 padded
    assert(out("srt") == ((2L, 20L, 0L, 10000L))) // perfect utilization
  }

  test("covered length: overlaps merge, touching merges, gaps split islands") {
    import spark.implicits._
    import graft.operators.Stats
    val iv = Seq(
      ("g", 1L, 5L), ("g", 4L, 6L), ("g", 8L, 9L), // [1,6) + [8,9)
      ("h", 1L, 3L), ("h", 3L, 5L),                // touching: one island [1,5)
      ("h", 9L, 9L)                                // empty interval: dropped
    ).toDF("grp", "s", "e")
    val out = Stats.coveredLength(iv, "grp", "s", "e").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("g") == ((3L, 2L, 6L, 8L, 7500L)))
    assert(out("h") == ((2L, 1L, 4L, 4L, 10000L)))
  }

  test("containment pairs: excerpt found at 100%, jaccard-invisible; tiny probes dropped") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, (1 to 100).map(i => s"w$i")),          // long article
      (2L, Seq("w5", "w6", "w7", "x1", "x2")),    // partial overlap
      (3L, Seq("z1", "z2", "z3"))                 // disjoint
    ).map { case (id, ws) => (id, ws.distinct.sorted) }.toDF("doc_id", "ws")
    val probes = Seq(
      (10L, Seq("w3", "w5", "w6", "w7", "w9").sorted), // 5-token excerpt of doc 1
      (11L, Seq("w1", "w2"))                           // too small: dropped
    ).toDF("probe_id", "pws")
    val out = Dedup.containmentPairs(corpus, "doc_id", "ws", probes,
        "probe_id", "pws", minContainPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Only (probe 10, doc 1): containment 5/5; doc 2 has 3/5 = 60% < 80.
    // Jaccard for the hit is 5/100 — the symmetric metric would never flag it.
    assert(out.toSeq == Seq((10L, 1L, 5L, 5L)))
  }

  test("sqrt-temperature shares: tail boosted, head damped, exact basis points") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (Seq.fill(100)("big") ++ Seq("small")).map(Tuple1(_)).toDF("src")
    val out = Sampling.sqrtTemperatureShares(df, "src").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("big") == ((100L, 9900L, 10L, 9090L, -810L)))
    assert(out("small") == ((1L, 99L, 1L, 909L, 810L)))
  }

  test("wav silence runs: islands counted on handcrafted samples, malformed is null") {
    import spark.implicits._
    import graft.operators.Multimodal
    val samples = Array[Short](0, 5000, 100, -50, 8000, 3, 2, 1)
    val buf = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(buf.putShort)
    val df = Seq((1L, buf.array()), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Multimodal.wavSilenceRuns(df, "doc_id", "payload", threshold = 4096)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // quiet flags: T F T T F T T T -> runs of 1, 2, 3
    assert(out(1L) == ((Some(3L), Some(3L), Some(6L))))
    assert(out(2L) == ((None, None, None)))
  }

  test("rendezvous sharding: in-range, balanced, and stable under fleet growth") {
    import spark.implicits._
    import graft.operators.Layout
    val keys = (0L until 1000L).toDF("k")
    val sharded = keys
      .withColumn("s4", Layout.rendezvousShard("k", 4))
      .withColumn("s5", Layout.rendezvousShard("k", 5))
    val rows = sharded.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.forall { case (_, s4, s5) => s4 >= 0 && s4 < 4 && s5 >= 0 && s5 < 5 })
    val byShard = rows.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.size == 4 && byShard.values.min > 150) // balanced-ish
    val hrwMoved = rows.count { case (_, s4, s5) => s4 != s5 }
    val modMoved = rows.count { case (k, _, _) => k % 4 != k % 5 }
    assert(hrwMoved < 350)        // ~1/5 expected; far under mod's ~4/5
    assert(modMoved > 700 && hrwMoved * 2 < modMoved)
  }

  test("zone-map scan: clustered layout prunes, natural layout over-fetches") {
    import spark.implicits._
    import graft.operators.Layout
    val df = Seq((1L, 1L), (2L, 10L), (3L, 2L), (4L, 11L), (5L, 3L), (6L, 12L))
      .toDF("k", "v")
    def run(key: org.apache.spark.sql.Column, label: String) =
      Layout.zoneMapScan(df, key, col("v"), 2, 10L, 12L, label).collect().head
    val nat = run(col("k"), "nat")
    // natural buckets (1,10)(2,11)(3,12): every zone overlaps [10,12]
    assert((nat.getLong(1), nat.getLong(2), nat.getLong(4), nat.getLong(5), nat.getLong(6)) ==
      ((3L, 3L, 6L, 3L, 20000L)))
    val clu = run(col("v") * 100 + col("k"), "clu")
    // clustered buckets (1,2)(3,10)(11,12): first zone is skipped
    assert((clu.getLong(2), clu.getLong(4), clu.getLong(6)) == ((2L, 4L, 13333L)))
  }

  test("largest-remainder allocation: sums exactly to budget, remainders ranked") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .map(Tuple1(_)).toDF("src")
    val out = Sampling.largestRemainderAllocation(df, "src", budget = 7L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // quotas: a 3.5, b 2.1, c 1.4 -> bases 3/2/1, leftover 1 goes to a (rem 5)
    assert(out("a") == ((3L, 5L, 4L)))
    assert(out("b") == ((2L, 1L, 2L)))
    assert(out("c") == ((1L, 4L, 1L)))
    assert(out.values.map(_._3).sum == 7L)
  }

  test("exclusive running max: distributed two-phase scan matches the sequential fold") {
    import spark.implicits._
    import graft.operators.Packing
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 2L), (5L, 9L))
      .toDF("ord", "v").repartition(4) // force multi-partition
    val out = Packing.withRunningMaxExclusive(df, "ord", "v", "pm")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(5L), 3L -> Some(5L),
      4L -> Some(9L), 5L -> Some(9L)))
  }

  test("bloom join prune: no false negatives, pass count bounded below by truth") {
    import spark.implicits._
    import graft.operators.Dedup
    val build = (0L until 200L).map(i => i * 3).toDF("k")
    val probe = (0L until 600L).toDF("k") // includes every build key
    val r = Dedup.bloomJoinPruneStats(probe, "k", build, "k",
      mBits = 4096, kHashes = 3).collect().head
    val (n, pass, truth, falsePos) =
      (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n == 600L && truth == 200L)
    assert(pass >= truth && falsePos == pass - truth && falsePos >= 0)
    // 4096 bits for 200 keys is ~20 bits/key: false positives must be rare
    assert(falsePos < 20)
  }

  test("ppm patch grid: tile sums on handcrafted pixels; malformed and non-divisible drop") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 4x4 P6, pixel bytes 0..47: patch=2 -> four 2x2 tiles with known sums
    val header = "P6\n4 4\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate(48)(_.toByte)
    val df = Seq(
      (1L, header ++ pixels),
      (2L, Array[Byte](1, 2, 3)),                       // malformed
      (3L, "P6\n3 4\n255\n".getBytes("US-ASCII") ++ pixels) // 3 % 2 != 0
    ).toDF("doc_id", "payload")
    val out = Multimodal.ppmPatchGrid(df, "doc_id", "payload", patch = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.forall(_._1 == 1L) && out.length == 4)
    // tile (0,0): pixels 0,1,4,5 -> bytes 0..5 and 12..17 sum = 102
    val m = out.map(t => (t._2, t._3) -> t._4).toMap
    def tileSum(pr: Int, pc: Int): Long = (for {
      dy <- 0 until 2; dx <- 0 until 2; c <- 0 until 3
    } yield 3 * ((pr * 2 + dy) * 4 + pc * 2 + dx) + c).map(_.toLong).sum
    assert(m == Map((0, 0) -> tileSum(0, 0), (0, 1) -> tileSum(0, 1),
      (1, 0) -> tileSum(1, 0), (1, 1) -> tileSum(1, 1)))
  }

  test("distributed lead: partition boundaries stitched, global last row null") {
    import spark.implicits._
    import graft.operators.Packing
    // sparse, shuffled values across many partitions: every row's next
    // must be the true successor, crossing range-slice boundaries
    val vals = (1L to 97L).map(_ * 3).reverse
    val df = vals.toDF("v").repartition(8)
    val out = Packing.withNextValue(df, "v", "nxt")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    vals.foreach { v =>
      val expected = if (v == 291L) None else Some(v + 3)
      assert(out(v) == expected, s"v=$v")
    }
  }

  test("covariance certificate: exact numerators, perfect correlation closes") {
    import spark.implicits._
    import graft.operators.Stats
    val df = Seq(("g", 2L, 1L), ("g", 4L, 2L), ("g", 6L, 3L)).toDF("grp", "y", "x")
    val r = Stats.covarianceStats(df, "grp", "x", "y").collect().head
    def d(i: Int) = r.getDecimal(i).longValueExact()
    // n=3 Σx=6 Σy=12 Σxx=14 Σyy=56 Σxy=28
    assert((r.getLong(1), d(2), d(3), d(4), d(5), d(6)) == ((3L, 6L, 12L, 14L, 56L, 28L)))
    val (cov, vx, vy) = (d(7), d(8), d(9))
    assert((cov, vx, vy) == ((12L, 6L, 24L)))
    assert(cov * cov == vx * vy) // y = 2x exactly: corr² = 1 from the integers alone
  }

  test("scd2 history: intervals chain, tombstones close but add no row") {
    import spark.implicits._
    import graft.engine.DiffEngine
    val log = Seq(
      (1L, "v1", 1L, 0), (1L, "v2", 3L, 0),   // two intervals: [1,3), [3,open)
      (2L, "v1", 1L, 0), (2L, "xx", 2L, 1),   // tombstone closes [1,2); no current
      (3L, "v1", 1L, 0)                       // single open interval
    ).toDF("k", "s", "ver", "__del")
    val out = DiffEngine.scd2FromLog(log, Seq("k"), "ver", Some("__del"))
    assert(out.columns.toSeq == Seq("k", "s", "valid_from", "valid_to", "is_current"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rows == Set(
      (1L, "v1", 1L, 3L, 0L), (1L, "v2", 3L, -1L, 1L),
      (2L, "v1", 1L, 2L, 0L), // closed by the tombstone, not current
      (3L, "v1", 1L, -1L, 1L)))
  }

  test("max concurrency: half-open touch never overlaps, earliest peak wins") {
    import spark.implicits._
    import graft.operators.Stats
    val iv = Seq(
      // g1: [0,10) [5,15) overlap → 2; [15,20) touches 15 → still 2
      ("g1", 0L, 10L), ("g1", 5L, 15L), ("g1", 15L, 20L),
      // g2: peak 2 reached at t=3 and again at t=8; earliest (3) reported
      ("g2", 1L, 5L), ("g2", 3L, 4L), ("g2", 8L, 9L), ("g2", 8L, 9L),
      // g3: zero-length interval drops entirely
      ("g3", 7L, 7L), ("g3", 1L, 2L)
    ).toDF("g", "s", "e")
    val out = Stats.maxConcurrency(iv, "g", "s", "e")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "g1" -> ((3L, 2L, 5L)),
      "g2" -> ((4L, 2L, 3L)),
      "g3" -> ((1L, 1L, 1L))))
  }

  test("ppm sharpness: flat is zero, a point edge scores exactly, malformed drops") {
    import spark.implicits._
    import graft.operators.Multimodal
    def ppm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] =
      (s"P6\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++ rgb.map(_.toByte)).toArray
    val flat = ppm(3, 3, Array.fill(27)(77))
    // white center on black: the single interior pixel sees |4·765| = 3060
    val point = ppm(3, 3, Array.tabulate(27)(i => if (i / 3 == 4) 255 else 0))
    val rows = Seq((1L, flat), (2L, point), (3L, "junk".getBytes("US-ASCII")))
      .toDF("id", "payload")
    val out = Multimodal.ppmSharpness(rows, "id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(1L -> ((0L, 0L)), 2L -> ((3060L, 306000L))))
  }

  test("mad outliers: single wild value flagged, tight spread clean") {
    import spark.implicits._
    import graft.operators.Stats
    val df = (Seq.fill(4)(10L) :+ 100L).map(("spiky", _)) ++
      (1L to 7L).map(("calm", _))
    val out = Stats.madOutliers(df.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // spiky: median 10, MAD 0 → any nonzero deviation is an outlier
    assert(out("spiky") == ((5L, 10L, 0L, 1L)))
    // calm: median 4, MAD 2, 3·1.4826·2 ≈ 8.9 > every deviation
    assert(out("calm") == ((7L, 4L, 2L, 0L)))
  }

  test("wav autocorr: planted period recovered exactly, malformed payloads drop") {
    import spark.implicits._
    import graft.operators.Multimodal
    def wav(samples: Array[Int], rate: Int = 8000): Array[Byte] = {
      val n = samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    // ±8000 square wave, period 25: R(k) aligns perfectly at multiples of
    // 25, and R(25) has the most terms — best_lag must be the fundamental
    val periodic = Array.tabulate(250)(i => if (i % 25 < 12) 8000 else -8000)
    val rows = Seq((1L, wav(periodic)), (2L, "not a wav".getBytes("US-ASCII")))
      .toDF("id", "payload")
    val out = Multimodal.wavAutocorr(rows, "id", "payload").collect()
    assert(out.length == 1) // malformed dropped, never a task failure
    val r = out.head
    assert(r.getLong(1) == 250L && r.getLong(3) == 25L)
    // R(25)/R(0) = 225·8000² / 250·8000² exactly
    assert(r.getLong(5) == 900000L)
  }

  test("infer keys: true key certified, nullable and repeating columns are not") {
    import spark.implicits._
    import graft.engine.DiffEngine
    val df = Seq(
      (1L, Option("a"), 10), (2L, Option("b"), 10), (3L, Option.empty[String], 20)
    ).toDF("id", "maybe", "grp")
    val out = DiffEngine.inferKeys(df, Seq("id", "maybe", "grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ordered most-selective first, names break ties
    assert(out.toSeq == Seq(
      ("id", 3L, 3L, 3L, 1L),
      ("grp", 3L, 2L, 3L, 0L),
      ("maybe", 3L, 2L, 2L, 0L))) // distinct among non-nulls but NULLABLE: not a key
    // approx mode shortlists but never certifies
    val ap = DiffEngine.inferKeys(df, Seq("id"), approx = true).head()
    assert(ap.getLong(4) == 0L)
  }

  test("retention cohorts: first-day cohorts, exact k offsets, duplicate days collapse") {
    import spark.implicits._
    import graft.operators.Stats
    val activity = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 12L), // dup (u,day) must not double-count
      (2L, 10L), (2L, 12L),
      (3L, 11L)
    ).toDF("u", "day")
    val out = Stats.retentionCohorts(activity, "u", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      (10L, 0L) -> ((2L, 2L, 10000L)),
      (10L, 1L) -> ((1L, 2L, 5000L)),
      (10L, 2L) -> ((2L, 2L, 10000L)),
      (11L, 0L) -> ((1L, 1L, 10000L))))
  }

  test("changepoint: CUSUM lands on the planted step, ties break earliest") {
    import spark.implicits._
    import graft.operators.Stats
    val step = (0L to 7L).map(x => ("step", x, if (x < 4) 1L else 9L))
    val sym = Seq(("sym", 0L, 5L), ("sym", 1L, 0L), ("sym", 2L, 0L), ("sym", 3L, 5L))
    val out = Stats.changePoints((step ++ sym).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // step series: max |n·cum − i·Σy| = |8·32 − 4·40| = 128 at the 4th point (x=3)
    assert(out("step") == ((8L, 3L, 128L)))
    // symmetric series ties at positions 1 and 3 → earliest (x=0) wins
    assert(out("sym") == ((4L, 0L, 10L)))
  }

  test("funnel: strict step ordering, missing and out-of-order steps drop out") {
    import spark.implicits._
    import graft.operators.Stats
    val events = Seq(
      // u1 converts fully in order
      (1L, "signup", 1L), (1L, "view", 2L), (1L, "click", 3L), (1L, "purchase", 4L),
      // u2 viewed BEFORE signing up: stops at step 1
      (2L, "view", 10L), (2L, "signup", 11L), (2L, "click", 12L),
      // u3 in order through view, never clicked (purchase without click ≠ step 3)
      (3L, "signup", 20L), (3L, "view", 21L), (3L, "purchase", 22L),
      // u4 never signed up: contributes nothing
      (4L, "click", 30L)
    ).toDF("user_id", "event_type", "event_id")
    val out = Stats.funnel(events, "user_id", "event_type", "event_id",
      Seq("signup", "view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "signup", 3L), (2L, "view", 2L), (3L, "click", 1L), (4L, "purchase", 1L)))
  }

  test("token diversity: uniform text maxes, repetition sinks, edge docs handled") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c d"),      // all distinct: rep=0 → 10^6
      (2L, "x x x x"),      // one token 4×: rep=12, N(N−1)=12 → 0
      (3L, "a a b b"),      // rep=2+2=4, denom=12 → 10^6 − 333333
      (4L, "solo"),         // single token: defined as 0
      (5L, "   ")           // no tokens: dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((4L, 4L, 1000000L)),
      2L -> ((4L, 1L, 0L)),
      3L -> ((4L, 2L, 666667L)),
      4L -> ((1L, 1L, 0L))))
    assert(!out.contains(5L))
  }

  test("cooccurrence: doc-range pairs survive the df cut, lift algebra exact") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // "ham eggs" co-occur in 3 of 6 docs; "rare pair" in only 1 (cut by
    // minPairDf); "zz" appears in 1 doc (cut by minDf before pairing)
    val docs = Seq(
      (1L, "ham eggs toast"), (2L, "ham eggs beans"), (3L, "eggs ham"),
      (4L, "ham toast"), (5L, "eggs beans zz"), (6L, "toast beans rare pair")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrencePairs(docs, "doc_id", "text",
      minDf = 2, minPairDf = 2, maxTermsPerDoc = 10, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // ham df=4, eggs df=4, co=3, D=6 → lift = 3·6·10^6/16 = 1125000
    assert(out(("eggs", "ham")) == ((3L, 4L, 4L, 1125000L)))
    assert(!out.keySet.exists(p => p._1 == "rare" || p._2 == "rare" || p._1 == "zz" || p._2 == "zz"))
    // pairs are canonical (x < y lexicographically)
    assert(out.keySet.forall(p => p._1 < p._2))
  }

  test("grouped trend: exact slopes on planted lines, degenerate groups dropped") {
    import spark.implicits._
    import graft.operators.Stats
    val pts = Seq(
      // g="up": y = 2x + 1 exactly
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L), ("up", 3L, 7L),
      // g="down": y = -3x + 10 — negative slope exercises div truncation
      ("down", 0L, 10L), ("down", 1L, 7L), ("down", 2L, 4L),
      // g="third": slope 1/2 → 500000 in fixed point
      ("third", 0L, 0L), ("third", 2L, 1L), ("third", 4L, 2L),
      // g="flat-x": no x variance — must be dropped, not divide by zero
      ("flat-x", 5L, 1L), ("flat-x", 5L, 9L)
    ).toDF("g", "x", "y")
    val out = Stats.groupedTrend(pts, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "up" -> ((4L, 2000000L, 400L)),    // mean y = 4.00
      "down" -> ((3L, -3000000L, 700L)),
      "third" -> ((3L, 500000L, 100L))))
    assert(!out.contains("flat-x"))
  }

  test("triangle count: known graph, orientation invariants, input normalization") {
    import spark.implicits._
    import graft.operators.Graphs
    // path-plus-triangle: edges {1-2, 1-3, 2-3, 3-4}; the only triangle is
    // {1,2,3}. Input is deliberately messy — reversed duplicates and a
    // self-loop must normalize away.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val out = Graphs.triangleStats(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 1000000L)), // cc = 2·1/(2·1)
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)),  // cc = 2·1·10^6 div (3·2)
      4L -> ((1L, 0L, 0L))))      // degree 1: cc defined as 0
    // K4: every node in C(3,2)=3 triangles, cc exactly 1
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)).toDF("src", "dst")
    val k4out = Graphs.triangleStats(k4, "src", "dst").collect()
    assert(k4out.forall(r => r.getLong(2) == 3L && r.getLong(3) == 1000000L))
    // deterministic under repartitioning (the orientation is a total order)
    val again = Graphs.triangleStats(edges.repartition(5), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out.map { case (k, v) => k -> v._2 })
  }

  test("collocations: lift ranks planted bigram first, min-count cuts noise") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      "new york new york is big",
      "new york city is far",
      "the big city").toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    // "new york" appears 3×: c(new)=3, c(york)=3, N=14 → lift = 3·14·10^6/9
    assert(out.head == (("new", "york", 3L, 3L * 14L * 1000000L / 9L)))
    // every surviving pair met the cut and carries a positive lift
    assert(out.forall(p => p._3 >= 2 && p._4 > 0))
    // singleton bigrams ("york city") fell below minCount
    assert(!out.exists(p => p._1 == "york" && p._2 == "city"))
  }

  test("minhash certificate: exact dups certify at 10^6, flag algebra holds") {
    import spark.implicits._
    import graft.operators.Dedup
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, body), (2L, body),                       // exact duplicate pair
      (3L, body + " lambda mu"), (4L, "unrelated words entirely different here now")
    ).toDF("doc_id", "text")
    val rows = Dedup.minHashCertificate(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty)
    val dup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    // identical docs: estimate and exact both 10^6, inside the (zero-width) band
    assert(dup.getLong(2) == 1000000L && dup.getLong(5) == 1000000L && dup.getLong(6) == 1L)
    rows.foreach { r =>
      val (est, inter, union, exact, within) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(est % 125000 == 0 && est >= 0 && est <= 1000000)
      assert(exact == inter * 1000000L / union)
      val lhs = (est - exact) * (est - exact) * 8
      val rhs = 9L * exact * (1000000L - exact)
      assert(within == (if (lhs <= rhs) 1L else 0L))
    }
  }

  test("luhn card detection: checksum separates real PANs from digit noise") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = Seq(
      (1L, "pay 4111111111111111 now"),           // canonical valid test PAN
      (2L, "pay 4111111111111112 now"),           // one digit off: candidate, invalid
      (3L, "spaced 4111 1111 1111 1111 form"),    // grouped digits still validate
      (4L, "dashed 5500-0000-0000-0004 form"),    // 16-digit mastercard test number
      (5L, "short 123456789012 run"),             // 12 digits: not a candidate
      (6L, "amex 378282246310005 ok"),            // 15-digit valid
      (7L, "no digits at all here")
    ).toDF("doc_id", "text")
    val (nc, nv) = TextAnalysis.cardCounts("text")
    val got = rows.select($"doc_id", nc.as("c"), nv.as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 1L)) && got(2L) == ((1L, 0L)))
    assert(got(3L) == ((1L, 1L)) && got(4L) == ((1L, 1L)))
    assert(got(5L) == ((0L, 0L)) && got(6L) == ((1L, 1L)) && got(7L) == ((0L, 0L)))
    // conservative redaction removes candidates whether or not they validate
    val red = rows.select($"doc_id", TextAnalysis.redactCards("text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "pay <CARD> now" && red(2L) == "pay <CARD> now")
    assert(red(3L) == "spaced <CARD> form" && red(7L) == "no digits at all here")
    // the check-digit helper closes the loop: helper-built numbers validate
    val base = "123456789012345"
    val full = base + TextAnalysis.luhnCheckDigit(base)
    val probe = Seq((9L, s"x $full y")).toDF("doc_id", "text")
    val (_, pv) = TextAnalysis.cardCounts("text")
    assert(probe.select(pv).head().getLong(0) == 1L)
  }

  test("trained trigram langid: classifies real multilingual held-out text") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // genuinely distinct languages (the driver corpus's lang labels sit on
    // language-uniform synthetic text, so accuracy is provable only here)
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and then it runs through the green fields with the other animals"),
      ("en", "she was reading the book while the children were playing in the garden behind the old house near the river"),
      ("en", "this is another example of an english sentence that should share many of the most common english trigrams"),
      ("de", "der schnelle braune fuchs springt ueber den faulen hund und laeuft dann durch die gruenen felder mit den anderen tieren"),
      ("de", "sie las das buch waehrend die kinder im garten hinter dem alten haus in der naehe des flusses spielten"),
      ("de", "dies ist ein weiteres beispiel fuer einen deutschen satz der viele der haeufigsten deutschen trigramme enthalten sollte"),
      ("fr", "le rapide renard brun saute par dessus le chien paresseux et court ensuite dans les champs verts avec les autres animaux"),
      ("fr", "elle lisait le livre pendant que les enfants jouaient dans le jardin derriere la vieille maison pres de la riviere"),
      ("fr", "ceci est un autre exemple de phrase francaise qui devrait partager beaucoup des trigrammes francais les plus frequents")
    ).toDF("lang", "text")
    val profiles = TextAnalysis.trigramProfiles(train, "lang", "text", k = 80)
    // the model is broadcast-sized: at most langs x k rows
    assert(profiles.count() <= 3 * 80)
    // ranks are 1..k, dense, deterministic
    val enRanks = profiles.filter($"lang" === "en").select("lang_rank")
      .collect().map(_.getInt(0)).sorted
    assert(enRanks.head == 1 && enRanks.distinct.length == enRanks.length)
    val heldOut = Seq(
      (1L, "the dog was running through the house with the children"),
      (2L, "a young woman walks into the garden to read her favourite book"),
      (3L, "der hund lief durch das haus waehrend die frau das buch las"),
      (4L, "die kinder spielen gerne mit dem fuchs im garten des hauses"),
      (5L, "le chien court dans la maison pendant que la femme lit le livre"),
      (6L, "les enfants aiment jouer avec le renard dans le jardin de la maison")
    ).toDF("doc_id", "text")
    val pred = TextAnalysis.trigramLanguageId(heldOut, "doc_id", "text", profiles, k = 80)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "de", 5L -> "fr", 6L -> "fr")
    want.foreach { case (id, lang) => assert(pred(id) == lang, s"doc $id: got ${pred(id)}") }
    // sub-trigram docs emit no row rather than a garbage prediction
    val tiny = TextAnalysis.trigramLanguageId(
      Seq((9L, "ab")).toDF("doc_id", "text"), "doc_id", "text", profiles, k = 80)
    assert(tiny.count() == 0)
  }

  test("ngram model: prefix-ranked next tokens; short docs skipped") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "x")).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.ngramModel(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // bigrams: (a,b) x2, (b,a), (b,c); doc 2 has no bigram
    assert(m.toSet == Set(("a", 1L, "b", 2L), ("b", 1L, "a", 1L), ("b", 2L, "c", 1L)))
    // trigram form: prefix is the joined (n-1)-gram; k=1 keeps the
    // tie-broken winner ("a" < "c") per prefix
    val t3 = graft.operators.TextAnalysis.ngramModel(docs, "text", n = 3, k = 1)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSet
    assert(t3 == Set(("a b", "a", 1L), ("b a", "b", 1L)), s"got $t3")
  }

  test("compression ratio orders repetitive < prose < incompressible") {
    import spark.implicits._
    val rep = "spam spam spam spam " * 100
    val prose = "The engine compares two relations and reports added, removed and " +
      "changed rows with per-column profiles and drift summaries for analysts. " * 5
    val md = java.security.MessageDigest.getInstance("MD5")
    val rand = (1 to 60).map { i =>
      md.digest(s"seed$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.mkString(" ")
    val df = Seq((1L, rep), (2L, prose), (3L, rand), (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    assert(r(1L).get < r(2L).get && r(2L).get < r(3L).get,
      s"expected rep < prose < random, got $r")
    assert(r(1L).get < 10) // template spam compresses to almost nothing
    assert(r(4L).isEmpty && r(5L).isEmpty)
  }

  test("compression ratio: exact pinned values freeze the signal's contract") {
    import spark.implicits._
    // q109 has no DuckDB oracle (Deflater bytes aren't portable SQL), but
    // zlib level 6 on a fixed input is deterministic for a given zlib —
    // pinning exact ratios on frozen fixtures gives the signal a contract
    // a dependency bump or a Deflater-parameter drift would break loudly
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexes = (0 until 4).map(i =>
      md.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString).mkString
    val df = Seq(
      (1L, "ab" * 200), // 400 raw -> 15 deflated
      (2L, "the quick brown fox jumps over the lazy dog while the analyst " +
        "reviews every changed row in the report"), // 101 -> 84
      (3L, hexes) // 128 high-entropy chars -> 93
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((400L, 3L)), s"repetitive: ${r(1L)}")
    assert(r(2L) == ((101L, 83L)), s"prose: ${r(2L)}")
    assert(r(3L) == ((128L, 72L)), s"incompressible: ${r(3L)}")
  }

  test("embedding norm audit flags degenerate and exploding vectors") {
    val df = Seq(
      (1L, Array(0.6f, 0.8f)),   // norm 1.0 -> in band
      (2L, Array(0f, 0f)),       // zero vector -> degenerate
      (3L, Array(3f, 4f)),       // norm 5.0 -> exploding
      (4L, Array(0.3f, 0.4f))    // norm 0.5 -> exactly the min bound, in band
    ).toDF("vec_id", "embedding")
    val r = Similarity.withNormAudit(df, "embedding", minNormX100 = 50, maxNormX100 = 200)
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[Double]("norm_sq"), x.getAs[Int]("is_outlier")))).toMap
    assert(math.abs(r(1L)._1 - 1.0) < 1e-6 && r(1L)._2 == 0)
    assert(r(2L) == ((0.0, 1)))
    assert(r(3L)._1 == 25.0 && r(3L)._2 == 1)
    assert(r(4L)._2 == 0) // boundary is inclusive (strict < / > comparisons)
    intercept[IllegalArgumentException](Similarity.withNormAudit(df, "embedding", 100, 100))
  }

  test("incremental dedup and weighted sampling edge cases") {
    // dedupAgainstCorpus: replayed content drops, new content survives with
    // min-id winner among within-batch copies
    val corpus = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),  // replay -> drop
      (11L, "brand new"), (12L, "brand new"), // batch dup -> keep 11 only
      (13L, "another new")
    ).toDF("doc_id", "text")
    val fresh = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fresh == Seq(11L, 13L))
    // weightedSample: weight 0 keeps nothing, maxWeight keeps everything,
    // out-of-range weights clamp instead of misbehaving
    val rows = (1L to 500L).map(i => (i, (i % 150).toInt)).toDF("id", "w") // some w > 100
    val kept = Sampling.weightedSample(rows, "id", "w", maxWeight = 100)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(kept.forall(_._2 != 0)) // zero weight never kept
    val full = (1L to 100L).map(i => (i, 100)).toDF("id", "w")
    assert(Sampling.weightedSample(full, "id", "w").count() == 100) // w = max -> all kept
    val over = (1L to 100L).map(i => (i, 1000)).toDF("id", "w")
    assert(Sampling.weightedSample(over, "id", "w").count() == 100) // clamps to max
    val neg = (1L to 100L).map(i => (i, -5)).toDF("id", "w")
    assert(Sampling.weightedSample(neg, "id", "w").count() == 0) // clamps to 0
  }

  test("semdedup: cluster-blocked pairs are exact-cosine verified, cells capped") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // kmeansIters = 0: this spec verifies the blocking/verify semantics
    // against a hand-rolled first-nlist assignment; the Lloyd-refined
    // production config has its own balance spec below
    val pairs = Dedup.semDedupPairs(emb, "vec_id", "embedding", nlist = 4, minCosineX100 = 30,
      kmeansIters = 0)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        r.getDecimal(3).doubleValue()))
    assert(pairs.nonEmpty)
    // every reported pair really clears the threshold, and a < b ordering holds
    pairs.foreach { case (a, b, cs) => assert(a < b && cs * 100 >= 30) }
    // verify against brute force inside one cell: every brute-force pair
    // above threshold whose BOTH ends landed in the same cell is reported
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i) }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val cents = vecs.keys.toSeq.sorted.take(4).map(c => c -> vecs(c))
    def cell(v: Array[Float]): Long =
      cents.map { case (cid, cv) => (cid, cos(v, cv)) }.maxBy { case (cid, sc) => (sc, -cid) }._1
    val reported = pairs.map(p => (p._1, p._2)).toSet
    for (a <- vecs.keys; b <- vecs.keys if a < b) {
      val shouldReport = cell(vecs(a)) == cell(vecs(b)) && cos(vecs(a), vecs(b)) * 100 >= 30.0001
      if (shouldReport) assert(reported((a, b)), s"missed in-cell pair ($a,$b)")
    }
    // degenerate cap: identical vectors all land in one cell; cap drops it
    import spark.implicits._
    val degen = (1L to 50L).map(i => (i, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Dedup.semDedupPairs(degen, "vec_id", "embedding", 2, 30, maxCellSize = 10).count() == 0)
  }

  test("semdedup production config: Lloyd rounds rebalance crawl-ordered seeding") {
    import spark.implicits._
    // crawl-ordered corpus: the first nlist ids ALL come from one source
    // (cluster at angle 0), so first-nlist seeding plants every centroid in
    // that cluster; clusters at 20/40/60 degrees follow in id order
    def vec(angle: Double): Array[Float] = {
      val v = Array.fill(8)(0f)
      v(0) = math.cos(math.toRadians(angle)).toFloat
      v(1) = math.sin(math.toRadians(angle)).toFloat
      v
    }
    val pts = for (c <- 0 until 4; j <- 0 until 25)
      yield ((c * 25 + j).toLong, vec(c * 20.0 + (j % 5 - 2) * 2.0))
    val df = pts.toDF("vec_id", "embedding")
    val raw = df.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .collect().toSeq
    def maxCell(cents: Seq[(Long, Array[Float])]): Long =
      Similarity.assignToCentroids(df, "embedding", cents)
        .groupBy("cid").count().agg(max("count")).head().getLong(0)
    // raw seeding: three of four clusters collapse into one 85-vector cell
    assert(maxCell(raw) >= 80)
    // two Lloyd rounds tile the space: every cell under the 60 cap
    val refined = Similarity.refineCentroids(df, "vec_id", "embedding", 4, 2)
    assert(maxCell(refined) <= 60 && maxCell(refined) < maxCell(raw))
    // the cap consequence VERDICT flagged: with maxCellSize = 60 the raw
    // config silently DROPS the giant cell (only the 3 tiny seed-slice
    // cells survive -> a handful of pairs), while the refined default
    // keeps every cell and reports the real in-cluster near-dups
    val rawPairs = Dedup.semDedupPairs(df, "vec_id", "embedding", 4, 90,
      maxCellSize = 60, kmeansIters = 0).count()
    val refinedPairs = Dedup.semDedupPairs(df, "vec_id", "embedding", 4, 90,
      maxCellSize = 60).count() // kmeansIters defaults to 2 (production)
    assert(rawPairs < 100, s"raw seeding reported $rawPairs pairs")
    assert(refinedPairs > 1000, s"refined seeding reported $refinedPairs pairs")
  }

  test("jsonl corpus io: schema-explicit read, corrupt quarantine, ranged shards") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_")
    val in = dir.resolve("in.jsonl")
    java.nio.file.Files.writeString(in,
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}
        |not json at all
        |{"doc_id": 3, "text": "gamma"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val raw = graft.engine.CorpusIO.readJsonl(spark, in.toString, schema)
    val (clean, corrupt) = graft.engine.CorpusIO.partitionCorrupt(raw)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(!clean.columns.contains("_corrupt_record"))
    assert(corrupt.collect().map(_.getString(0)).toSeq == Seq("not json at all"))
    // ranged shard export: contiguous id intervals per output file
    val out = dir.resolve("out").toString
    graft.engine.CorpusIO.writeJsonl(clean, out, "doc_id", shards = 2)
    val files = new java.io.File(out).listFiles.filter(_.getName.startsWith("part-")).sorted
    assert(files.length == 2)
    def ids(f: java.io.File) = scala.io.Source.fromFile(f).getLines()
      .map(l => "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong).toVector
    val (a, b) = (ids(files(0)), ids(files(1)))
    // each shard sorted internally, and the shard ranges don't interleave
    assert(a == a.sorted && b == b.sorted)
    assert(a.nonEmpty && b.nonEmpty && (a.max < b.min || b.max < a.min))
    // roundtrip: re-read what we wrote
    val back = graft.engine.CorpusIO.readJsonl(spark, out, schema)
    assert(graft.engine.CorpusIO.partitionCorrupt(back)._1.count() == 3)
  }

  test("misra-gries heavy hitters: guaranteed presence and certified lower bounds") {
    import graft.functions.HeavyHitters
    // skewed corpus: "hot" 400x, "warm" 150x, "cool" 60x, 390 singletons
    // n = 1000; capacity 9 -> error bound n/(cap+1) = 100
    val words = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++ Seq.fill(60)("cool") ++
      (1 to 390).map(i => s"rare$i")
    val docs = new scala.util.Random(7).shuffle(words).grouped(25)
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    val df = docs.toDF("doc_id", "text").repartition(8)
    val got = TextAnalysis.topTokensApprox(df, "text", capacity = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 1000L; val bound = n / 10
    // every token above the bound is present
    assert(got.contains("hot") && got.contains("warm"))
    // counts are certified lower bounds within the error bound
    for ((tok, true_) <- Seq("hot" -> 400L, "warm" -> 150L) ) {
      assert(got(tok) <= true_, s"$tok overcounted: ${got(tok)}")
      assert(got(tok) >= true_ - bound, s"$tok bound violated: ${got(tok)}")
    }
    // no counter can exceed its true frequency (spot-check the tail too)
    got.foreach { case (tok, c) =>
      val truth = words.count(_ == tok).toLong
      assert(c <= truth, s"$tok: sketch $c > true $truth")
    }
    // the pure merge preserves the invariant on adversarial splits
    val a = Seq("x", "x", "x", "y").foldLeft(Map.empty[String, Long])(HeavyHitters.offer(_, _, 2))
    val b = Seq("z", "z", "y", "w").foldLeft(Map.empty[String, Long])(HeavyHitters.offer(_, _, 2))
    val m = HeavyHitters.combine(a, b, 2)
    assert(m.size <= 2)
    m.foreach { case (k, c) =>
      val truth = Seq("x", "x", "x", "y", "z", "z", "y", "w").count(_ == k).toLong
      assert(c <= truth)
    }
    // classic-MG eviction pays ONE decrement per arrival: the token-sorted
    // stream a,a,a,b,b,b,c at capacity 2 must NOT wipe the buffer (n=7,
    // bound n/3 ≈ 2.33 — both a and b with true count 3 must survive)
    val sorted = Seq("a", "a", "a", "b", "b", "b", "c")
      .foldLeft(Map.empty[String, Long])(HeavyHitters.offer(_, _, 2))
    assert(sorted.keySet == Set("a", "b"), s"buffer wiped: $sorted")
    assert(sorted("a") >= 3L - 7L / 3 && sorted("b") >= 3L - 7L / 3)
  }

  test("bloom incremental dedup: equals the exact anti-join, survives fp-heavy sketches") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // replay of corpus content — must drop
      (11L, "fresh one"),    // novel
      (12L, "fresh one"),    // within-batch dup of 11 — min id wins
      (13L, "fresh two")     // novel
    ).toDF("doc_id", "text")
    val exact = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(exact == Seq(11L, 13L))
    val bloom = Dedup.dedupAgainstCorpusBloom(batch, corpus, "doc_id", "text",
      expectedCorpusItems = 100L, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(bloom == exact)
    // a deliberately tiny/saturated sketch (1 item budget at the max fpp
    // -> ~1 bit) pushes everything through the confirm join — the answer
    // must not change
    val saturated = Dedup.dedupAgainstCorpusBloom(batch, corpus, "doc_id", "text",
      expectedCorpusItems = 1L, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(saturated == exact)
    // NULL content must follow the exact path's semantics (kept — a null
    // key never equi-joins), not silently vanish between the UDF branches
    val withNull = batch.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val exactN = Dedup.dedupAgainstCorpus(withNull, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val bloomN = Dedup.dedupAgainstCorpusBloom(withNull, corpus, "doc_id", "text", 100L, 0.01)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(bloomN == exactN && bloomN.contains(99L))
  }

  test("bm25: term-bearing docs only, rarity beats frequency, tf monotone") {
    val df = Seq(
      (1L, "cat cat cat dog"),        // tf(cat)=3
      (2L, "cat dog dog dog"),        // tf(cat)=1
      (3L, "rare dog bird fish"),     // the only 'rare' doc
      (4L, "bird fish bird fish")     // no query term
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("cat", "rare"), k = 10)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1).doubleValue()).toMap
    assert(!r.contains(4L), "doc without any query term must not be scored")
    // 'rare' (df=1) outscores 'cat' (df=2) at equal tf and dl
    assert(r(3L) > r(2L))
    // higher tf of the same term at equal dl scores higher
    assert(r(1L) > r(2L))
  }

  test("lm cross-entropy halfbits: hand-exact add-one terms, fluent under garbled, short docs absent") {
    // corpus bigram counts: c(a,b)=3 c(b,a)=2 (doc 1), c(x,y)=1 (doc 2);
    // contexts a.=3 b.=2 x.=1; V = |{b,a,y}| = 3. Terms:
    //   (a,b): hb(6)-hb(4) = 5-4 = 1;  (b,a): hb(5)-hb(3) = 4-3 = 1;
    //   (x,y): hb(4)-hb(2) = 4-2 = 2
    // doc 1: 5 bigrams, sum 3*1+2*1 = 5 -> mean 1; doc 2: 1 bigram, 2.
    val d = Seq((1L, "a b a b a b"), (2L, "x y"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmCrossEntropyHalfBits(d, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 5L, 5L, 1L), (2L, 1L, 2L, 2L))) // docs 3/4: no bigrams, absent
    // the CCNet ordering on one corpus: text built from the corpus's own
    // common phrasing scores BELOW word salad over the same vocabulary
    val phrase = "the model reads the data and the model writes the result"
    val fluent = (1L to 8L).map(i => (i, phrase))
    val salad = Seq((9L, "result the and writes data model the reads the the model"))
    val scored = TextAnalysis.lmCrossEntropyHalfBits(
        (fluent ++ salad).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(scored(1L) < scored(9L),
      s"fluent ${scored(1L)} must undercut garbled ${scored(9L)}")
  }

  test("lm fluency: in-model text scores low, beyond-top-k continuations score k+1") {
    // prefix 'a' fans out to 5 continuations; k=3 keeps b (cnt 8) then the
    // count-1 ties c, d (token asc) — e and z fall OFF the model even
    // though they occur in the corpus, which is the unseen path a
    // self-trained LM can actually exercise
    val df = ((1L to 8L).map(i => (i, "a b")) ++
      Seq((9L, "a c"), (10L, "a d"), (11L, "a e"), (12L, "a z")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmFluencyScore(df, "doc_id", "text", n = 2, k = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == ((1L, 1L, 1L, 100L)))   // rank-1 continuation
    assert(r(9L) == ((1L, 1L, 2L, 200L)))   // rank-2 (tie broken token asc)
    assert(r(10L) == ((1L, 1L, 3L, 300L)))  // rank-3
    assert(r(11L) == ((1L, 0L, 4L, 400L)))  // beyond top-k -> k+1
    assert(r(12L) == ((1L, 0L, 4L, 400L)))
    // docs shorter than n produce no output row
    val short = TextAnalysis.lmFluencyScore(
      Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() == 0L)
  }

  test("duplicated spans: shared windows counted, short docs surface with zero grams") {
    val df = Seq(
      (1L, "one two three four five"),      // shares its only 5-gram with 2
      (2L, "one two three four five"),
      (3L, "six seven eight nine ten"),     // unique 5-gram
      (4L, "tiny")                          // shorter than n
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpanStats(df, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), Option(x.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(r(1L) == ((1L, 1L, Some(10000L))))
    assert(r(2L) == ((1L, 1L, Some(10000L))))
    assert(r(3L) == ((1L, 0L, Some(0L))))
    assert(r(4L) == ((0L, 0L, None)))
  }

  test("phash: DCT reference match, brightness-shift invariance, corrupt payloads") {
    import Multimodal._
    def ppm8(gray: Int => Int): Array[Byte] =
      ("P6\n8 8\n255\n".getBytes("US-ASCII") ++
        (0 until 64).flatMap(i => Seq(gray(i), gray(i), gray(i))).map(_.toByte))
    // reference check: recompute bits with a double-precision DCT — the
    // fixed-point Q14 basis must agree on every bit for this fixture
    val img = ppm8(i => (i * 37 + (i % 8) * 11) % 256)
    val (hi, lo) = pHashPpm(img).get
    val g = (0 until 64).map(i => 3.0 * ((i * 37 + (i % 8) * 11) % 256))
    def cos(u: Int, x: Int) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    val f = for (u <- 0 until 8; v <- 0 until 8) yield
      (for (y <- 0 until 8; x <- 0 until 8) yield cos(u, y) * cos(v, x) * g(y * 8 + x)).sum
    val med = f.drop(1).sorted.apply(31)
    val (ehi, elo) = (1 until 64).foldLeft((0L, 0L)) { case ((h, l), j) =>
      if (f(j) > med) { if (j <= 32) (h, l | (1L << (j - 1))) else (h | (1L << (j - 33)), l) }
      else (h, l)
    }
    assert((hi, lo) == ((ehi, elo)), "fixed-point DCT bits match the float reference")
    // a constant brightness shift moves only the DC coefficient: pHash
    // is invariant where aHash flips (its mean moves with the shift)
    val shifted = ppm8(i => ((i * 37 + (i % 8) * 11) % 256 + 40).min(255))
    val base = ppm8(i => ((i * 37 + (i % 8) * 11) % 256).min(215)) // no clipping
    val shift2 = ppm8(i => ((i * 37 + (i % 8) * 11) % 256).min(215) + 40)
    assert(pHashPpm(base).get == pHashPpm(shift2).get, "AC spectrum unchanged")
    assert(pHashPpm(img).isDefined && pHashPpm(shifted).isDefined)
    // identical payloads agree; corrupt/truncated decode to None
    assert(pHashPpm(img).get == pHashPpm(img.clone()).get)
    assert(pHashPpm("P6\n8 8\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(pHashPpm(null).isEmpty && pHashPpm(Array[Byte]()).isEmpty)
    import spark.implicits._
    val frames = Seq((1L, img), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val got = ppmPHash(frames, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L) && got(2L))
  }

  test("ahash: golden bits, non-square NN mapping, corrupt payloads, hamming pairs") {
    // hand-computed golden: 2x2 image, grid 2 (identity map). Pixels'
    // gray values 3, 6, 9, 300 -> sum 318, mean 79 -> only cell 3 above
    def ppm(px: Array[Int]): Array[Byte] =
      ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ px.map(_.toByte))
    val g = Multimodal.aHashPpm(ppm(Array(1, 1, 1, 2, 2, 2, 3, 3, 3, 100, 100, 100)), grid = 2)
    assert(g.contains(8L)) // bit 3 only
    // non-square source through a 2x2 grid: 4x2 image, NN samples columns 0
    // and 2 of each row — bright pixels placed at sampled vs skipped
    // positions must flip the hash
    val sampled = Multimodal.aHashPpm(ppm2(4, 2, bright = Set(0, 2)), grid = 2)
    val skipped = Multimodal.aHashPpm(ppm2(4, 2, bright = Set(1, 3)), grid = 2)
    assert(sampled.get != skipped.get)
    // corrupt: truncated pixel data and bad magic decode to None -> null row
    assert(Multimodal.aHashPpm("P6\n8 8\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.aHashPpm("P5\n1 1\n255\n abc".getBytes("US-ASCII")).isEmpty)
    val hashed = Multimodal.ppmAHash(
      Seq((1L, ppm(Array.fill(12)(7))), (2L, null.asInstanceOf[Array[Byte]]))
        .toDF("doc_id", "payload"), "doc_id", "payload", grid = 2)
    assert(hashed.filter(col("ahash_lo").isNull).count() == 1L)
    // hamming pairs: identical hashes pair at distance 0; 1-bit-off pairs
    // at distance 1; far hashes don't pair
    val hs = Seq(
      (1L, 0L, 255L), (2L, 0L, 255L),        // identical
      (3L, 0L, 254L),                        // hamming 1 from 1/2
      (4L, 0xffffffffL, 0L)                  // far from all
    ).toDF("doc_id", "ahash_hi", "ahash_lo")
    val pairs = Multimodal.ahashNearDupPairs(hs, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  private def ppm2(w: Int, h: Int, bright: Set[Int]): Array[Byte] =
    (s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      (0 until w * h).flatMap(i => { val v = if (bright(i)) 200 else 0; Seq(v, v, v) })
        .map(_.toByte).toArray)

  test("three-way split: exhaustive, disjoint, deterministic, matches holdout hash") {
    val df = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val r = Sampling.threeWaySplit(df, "doc_id", valPct = 10, testPct = 10)
    assert(r.count() == 500L)
    val byS = r.groupBy("split").count().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS.values.sum == 500L)
    // same hash => stable across reruns and consistent with bucketOf
    val again = Sampling.threeWaySplit(df, "doc_id", 10, 10)
    assert(r.select("doc_id", "split").except(again.select("doc_id", "split")).count() == 0L)
    // every key's bucket decides its split: spot-check the boundary algebra
    val joined = r.withColumn("b", Sampling.bucketOf("doc_id")).collect()
    joined.foreach { row =>
      val b = row.getAs[Long]("b"); val s = row.getAs[String]("split")
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want, s"bucket $b -> $s, want $want")
    }
  }

  test("scrub duplicated spans: covered tokens cut, short docs pass whole, full scrub keeps row") {
    val df = Seq(
      (1L, "a b c d e tail1"),   // 5-gram "a b c d e" shared with 2
      (2L, "a b c d e tail2"),
      (3L, "u v w x y z"),       // no shared window
      (4L, "tiny doc"),          // shorter than n -> passes whole
      (5L, "a b c d e"),         // nothing but the shared window -> fully scrubbed
      (6L, "")                   // no tokens at all
    ).toDF("doc_id", "text")
    val r = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((6L, 1L, "tail1")))
    assert(r(2L) == ((6L, 1L, "tail2")))
    assert(r(3L) == ((6L, 6L, "u v w x y z")))
    assert(r(4L) == ((2L, 2L, "tiny doc")))
    assert(r(5L) == ((5L, 0L, "")))
    assert(r(6L) == ((0L, 0L, "")))
    // overlapping windows collapse: doc 1's positions 0..4 are covered by
    // ONE flagged start, not five — kept_tokens already proves no
    // double-cutting, and stats/scrub agree on what counts as duplicated
    val stats = Dedup.duplicatedSpanStats(df, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(stats(1L) == 1L && stats(3L) == 0L)
  }

  test("eval overlap: replayed docs fully contaminated, novel docs zero, partial counted") {
    val train = Seq(
      (1L, "one two three four five six"),
      (2L, "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "one two three four five six"),        // verbatim replay: 2 grams, both hit
      (11L, "totally novel words appear here now"),// clean
      (12L, "one two three four five NEW TOKENS"), // first window hits, rest don't
      (13L, "too short")                           // < n tokens
    ).toDF("doc_id", "text")
    val r = Dedup.evalOverlapStats(eval_, train, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(10L) == ((2L, 2L, 10000L)))
    assert(r(11L) == ((2L, 0L, 0L)))
    assert(r(12L) == ((3L, 1L, 3333L)))
    assert(r(13L) == ((0L, 0L, 0L)))
  }

  test("bmp decode: golden channel sums, bottom-up top row, padding, corrupt payloads") {
    // 2x2 image: rows padded 6 -> 8 bytes. Image rows top-down:
    //   top:    (r=1,g=2,b=3) (r=4,g=5,b=6)
    //   bottom: (r=7,g=8,b=9) (r=10,g=11,b=12)
    // stored bottom-up BGR: row0 = bottom = 9,8,7, 12,11,10, pad,pad
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val pixels = Array[Int](9, 8, 7, 12, 11, 10, 0, 0, /* bottom row + pad */
      3, 2, 1, 6, 5, 4, 0, 0 /* top row + pad */ )
    val bmp = (header ++ pixels).map(_.toByte)
    val s = Multimodal.decodeBmp(bmp).get
    assert((s.width, s.height, s.nPixels) == ((2, 2, 4L)))
    assert((s.rSum, s.gSum, s.bSum) == ((22L, 26L, 30L)))
    assert(s.topRowBright == 1L + 2 + 3 + 4 + 5 + 6) // the LAST stored row
    // encodeBmpFromText roundtrip hits the same decoder on a padded width
    val enc = Multimodal.encodeBmpFromText("abcdef", width = 3, height = 2)
    val es = Multimodal.decodeBmp(enc).get
    assert((es.width, es.height) == ((3, 2)))
    // pixel bytes cycle 'a'..'f' repeatedly; padding must NOT be summed:
    // 18 pixel bytes over cps a..f -> each letter appears 3x
    assert(es.rSum + es.gSum + es.bSum == 3L * ('a' + 'b' + 'c' + 'd' + 'e' + 'f').toLong)
    // corrupt: truncated pixels, palette bit depth, compressed, top-down
    assert(Multimodal.decodeBmp(bmp.dropRight(3)).isEmpty)
    val bad8 = bmp.clone; bad8(28) = 8; assert(Multimodal.decodeBmp(bad8).isEmpty)
    val rle = bmp.clone; rle(30) = 1; assert(Multimodal.decodeBmp(rle).isEmpty)
    val topDown = bmp.clone
    // height = -2 little-endian
    topDown(22) = 0xfe.toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    assert(Multimodal.decodeBmp(topDown).isEmpty)
    assert(Multimodal.decodeBmp(null).isEmpty)
  }

  test("wav signal: zero crossings strict, energy exact, malformed null") {
    // hand-built samples: +5, -3, 0, 2, -2 -> crossings at (+5,-3) and
    // (2,-2); the 0 sample breaks the (-3 -> 2) pair into products 0,0
    val samples = Seq(5, -3, 0, 2, -2)
    val data = samples.flatMap(s => Seq(s & 0xff, (s >> 8) & 0xff))
    val wav = (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ Seq(36 + 10, 0, 0, 0) ++
      Seq('W', 'A', 'V', 'E', 'f', 'm', 't', ' ').map(_.toInt) ++
      Seq(16, 0, 0, 0, 1, 0, 1, 0, 0x40, 0x1f, 0, 0, 0x80, 0x3e, 0, 0, 2, 0, 16, 0) ++
      Seq('d', 'a', 't', 'a').map(_.toInt) ++ Seq(10, 0, 0, 0) ++ data)
      .map(_.toByte).toArray
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val r = Multimodal.wavSignalFeatures(df, "doc_id", "payload")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(3) == 2L) // zero_crossings
    assert(r(1L).getLong(4) == samples.map(s => s.toLong * s).sum)
    assert(r(2L).isNullAt(3) && r(2L).isNullAt(4))
  }

  test("incremental near-dup: replays always hit, disjoint never, postings cap binds") {
    val corpus = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "the cat sat on the mat today"), // identical twin of 1
      (3L, "entirely unrelated corpus content here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on the mat today"),   // verbatim replay: every band matches 1 and 2
      (11L, "zz qq ww ee rr tt yy")            // disjoint shingles: no candidate
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupAgainstCorpus(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (10L, 2L)))
    // maxPostings = 1: only the smallest corpus id survives per bucket,
    // deterministically
    val capped = Dedup.nearDupAgainstCorpus(batch, corpus, "doc_id", "text", maxPostings = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 1L)))
    // the shared banding stage keeps q32 semantics: within-corpus pairs
    // from minHashLshPairs still find the twin
    val within = Dedup.minHashLshPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(within.contains((1L, 2L)))
  }

  test("token budget cut: contiguous best-first prefix, no backfill, boundary inclusive") {
    val df = Seq(
      (1L, 1L, 40L),  // quality rank 1, 40 tokens -> cum 40
      (2L, 2L, 30L),  // cum 70
      (3L, 3L, 40L),  // cum 110 -> over budget 100, dropped
      (4L, 4L, 20L),  // cum 130 -> dropped even though 20 would HAVE fit (no backfill)
      (5L, 5L, 10L)   // cum 140 -> dropped
    ).toDF("doc_id", "ord", "toks")
    val r = Sampling.selectByTokenBudget(df.repartition(4), "ord", "toks", budget = 100L)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cum_tokens")).toMap
    assert(r == Map(1L -> 40L, 2L -> 70L))
    // boundary: a doc landing exactly ON the budget is kept
    val exact = Sampling.selectByTokenBudget(df.repartition(3), "ord", "toks", budget = 110L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(exact == Seq(1L, 2L, 3L))
  }

  test("warc parse: framing golden, unknown headers tolerated, malformed tail drops cleanly") {
    val blob = Warc.encodeWarcFromText("hello world", docId = 7L, nRecords = 3)
    val recs = Warc.parseWarc(blob)
    assert(recs.length == 3)
    assert(recs.map(_.contentLength) == Seq(16L, 23L, 30L))
    assert(recs(1).targetUri == "http://corpus.invalid/doc/7/1")
    assert(recs.forall(_.warcType == "response"))
    // byte sums match the generator math
    val cps = "hello world".codePoints().toArray
    def sum(i: Int, len: Int) = (0 until len).map(k => cps((i + k) % cps.length) & 0xff).sum.toLong
    assert(recs(0).byteSum == sum(0, 16) && recs(2).byteSum == sum(2, 30))
    // an extra unknown header must be tolerated
    val extra = ("WARC/1.0\r\nWARC-Type: request\r\nX-Custom: zz\r\n" +
      "WARC-Target-URI: http://x/\r\nContent-Length: 2\r\n\r\nab\r\n\r\n").getBytes("US-ASCII")
    val er = Warc.parseWarc(extra)
    assert(er.length == 1 && er.head.warcType == "request" && er.head.byteSum == 'a' + 'b')
    // truncated payload: earlier records survive, the torn one doesn't
    val torn = Warc.parseWarc(blob.dropRight(10))
    assert(torn.length == 2)
    // bad magic yields nothing; null yields nothing
    assert(Warc.parseWarc("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")).isEmpty)
    assert(Warc.parseWarc(null).isEmpty)
    // DataFrame path explodes per record without shuffling payloads
    val df = Seq((1L, blob), (2L, blob.dropRight(10))).toDF("doc_id", "payload")
    val rows = Warc.warcRecords(df, "doc_id", "payload")
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L, 2L -> 2L))
    // text-ingestion form: bodies round-trip byte-for-byte (record 0's
    // payload is the first 16 chars of the cycled text)
    val bodies = Warc.parseWarcBodies(blob)
    assert(bodies.length == 3)
    assert(bodies.head._4 == ("hello world" * 2).take(16))
    assert(Warc.warcTextRecords(df, "doc_id", "payload")
      .where(col("doc_id") === 1L && col("rec_idx") === 0).head().getString(4) == bodies.head._4)
  }

  test("mime sniff: every real encoder routed by content, junk to octet-stream") {
    val cases = Seq(
      (1L, Multimodal.encodePngFromText("abc", 2, 2, 3), "image/png"),
      (2L, Multimodal.encodeBmpFromText("abc", 2, 2), "image/bmp"),
      (3L, Multimodal.encodeWavFromText("abc", 8, 8000), "audio/wav"),
      (4L, Multimodal.encodePpmFromText("abc", 2, 2), "image/x-portable-pixmap"),
      (8L, Multimodal.encodeJpegFromText("abc", 2, 2), "image/jpeg"),
      (9L, Multimodal.encodeGifFromText("abc", 3, 2), "image/gif"),
      (5L, "plain text".getBytes("UTF-8"), "application/octet-stream"),
      (6L, Array[Byte](0x42), "application/octet-stream"), // 'B' alone isn't BMP
      (7L, null.asInstanceOf[Array[Byte]], "application/octet-stream")
    )
    val got = cases.map { case (id, p, _) => (id, p) }.toDF("id", "payload")
      .select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) => assert(got(id) == want, s"id $id") }
  }

  test("datasheet: hand-computed metrics, dup mass counted, percentile_disc median") {
    val df = Seq(
      (1L, "en", "a b c"),        // 3 toks, 5 chars
      (2L, "en", "a b c"),        // exact dup of 1
      (3L, "de", "x y"),          // 2 toks
      (4L, "fr", "p q r s t u v") // 7 toks
    ).toDF("doc_id", "lang", "text")
    val m = Pipelines.datasheet(df, "doc_id", "lang", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("docs_total") == 4L)
    assert(m("tokens_total") == 15L)
    assert(m("chars_total") == 5L + 5L + 3L + 13L)
    assert(m("distinct_langs") == 3L)
    assert(m("exact_dup_docs") == 1L)
    // percentile_disc(0.5) over [2,3,3,7]: rank ceil(4*0.5)=2 -> 3
    assert(m("median_tokens") == 3L)
    // empty corpus: a datasheet of zeros, not an NPE in a report job
    val e = Pipelines.datasheet(df.filter(col("doc_id") < 0), "doc_id", "lang", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e.values.forall(_ == 0L) && e.size == 6)
  }

  test("hybrid retrieval: rank-sum fusion, absent rank penalty, pool bound") {
    val docs = Seq(
      (0L, "query probe row itself"),
      (1L, "cat cat cat"),        // strong keyword match
      (2L, "cat dog"),            // weaker keyword match
      (3L, "no match here"),      // vector-only candidate
      (4L, "nothing again")       // in neither pool (no term, weak vector)
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),      // orthogonal to probe
      (2L, Array(0.9f, 0.1f)),      // close to probe
      (3L, Array(1.0f, 0.01f)),     // closest
      (4L, Array(-1.0f, 0.0f))      // opposite
    ).toDF("vec_id", "embedding")
    val r = Similarity.hybridTopK(docs, emb, "doc_id", "text", "vec_id", "embedding",
      Seq("cat"), probeId = 0L, k = 4, pool = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // text pool (2): doc1 rank1, doc2 rank2. vector pool (2): doc3 rank1, doc2 rank2.
    assert(r(2L) == ((2L, 2L, 4L)))  // present in both: 2+2
    assert(r(1L) == ((1L, 3L, 4L)))  // text-1, absent from vector pool -> 1+3
    assert(r(3L) == ((3L, 1L, 4L)))  // vector-1, absent from text pool -> 3+1
    assert(!r.contains(0L) && !r.contains(4L)) // probe excluded; absent-from-both never ranks
  }

  test("strip html: blocks dropped whole, entities decoded, fake tags in JS survive") {
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextAnalysis.stripHtml(col("h"))).head().getString(0)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // a </p> inside a JS string must not end the script block early
    assert(strip("""<script>var a = "<p>no</p>";</script>real""") == "real")
    assert(strip("<style>p{}</style>text<!-- note -->here") == "text here")
    // entities, ampersand decoded last so &amp;lt; -> &lt; not <
    assert(strip("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "a & b <tag> \"q\" 's'")
    assert(strip("x&amp;lt;y") == "x&lt;y")
    assert(strip("a&nbsp;b") == "a b")
    // whitespace collapse + trim; case-insensitive block tags
    assert(strip("  <DIV>\n a \n\n b </DIV>  ") == "a b")
    assert(strip("<SCRIPT>x</SCRIPT>ok") == "ok")
    // unclosed script: non-greedy needs a terminator - content survives as
    // tag-stripped text rather than vanishing (documented regex-tier limit)
    assert(strip("<script>var x;").nonEmpty)
  }

  test("robots: group selection, longest match, allow-wins-tie, malformed tolerated") {
    val robots =
      """# policy
        |User-agent: evil-bot
        |Disallow: /
        |
        |User-agent: good-bot
        |User-agent: graft-bot
        |Disallow: /private
        |Allow: /private/pub
        |Crawl-delay: 10
        |broken line without colon
        |Disallow:
        |
        |User-agent: *
        |Disallow: /all
        |""".stripMargin
    val rules = Robots.parse(robots, "graft-bot")
    // exact-match group applies (both its rules; empty Disallow kept but inert)
    assert(rules.count(_.path.nonEmpty) == 2)
    assert(Robots.isAllowed(rules, "/public/x"))            // no match -> allowed
    assert(!Robots.isAllowed(rules, "/private/secret"))     // Disallow prefix
    assert(Robots.isAllowed(rules, "/private/pub/doc"))     // longer Allow wins
    // allow-wins on a length tie
    val tie = Seq(Robots.Rule(false, "/a"), Robots.Rule(true, "/a"))
    assert(Robots.isAllowed(tie, "/a/x"))
    // unknown agent falls to the * group
    val star = Robots.parse(robots, "stranger")
    assert(!Robots.isAllowed(star, "/all/x") && Robots.isAllowed(star, "/private/x"))
    // exact group shields from *: graft-bot may fetch /all
    assert(Robots.isAllowed(rules, "/all/x"))
    // null/garbage content -> no rules -> allowed (never a task failure)
    assert(Robots.parse(null, "x").isEmpty)
    assert(Robots.isAllowed(Robots.parse("%%% not robots %%%", "x"), "/anything"))
    // agent line after rules starts a NEW group (missing blank line)
    val squeezed = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert(Robots.parse(squeezed, "b").map(_.path) == Seq("/y"))
  }

  test("robots: crawl-delay — group-scoped, strictest wins, malformed ignored") {
    val robots =
      """User-agent: other-bot
        |Crawl-delay: 99
        |
        |User-agent: graft-bot
        |Disallow: /x
        |Crawl-delay: 7
        |
        |User-agent: graft-bot
        |Crawl-delay: 3.9
        |
        |User-agent: *
        |Crawl-delay: 1
        |""".stripMargin
    // both graft-bot groups apply; strictest (min) wins; 3.9 floors to 3
    assert(Robots.crawlDelay(robots, "graft-bot") == Some(3L))
    // the decoy group's 99 never leaks; unknown agents fall to *
    assert(Robots.crawlDelay(robots, "stranger") == Some(1L))
    // no delay published -> None (caller picks its own default)
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /a\n", "bot").isEmpty)
    // malformed / absurd values ignored, first valid value per group wins
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: soon\nCrawl-delay: 4\nCrawl-delay: 2\n", "bot")
      == Some(4L))
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 900000\n", "bot").isEmpty)
    assert(Robots.crawlDelay(null, "bot").isEmpty)
  }

  test("robots: RFC 9309 wildcard '*', end-anchor '$', percent normalization") {
    def allowed(rules: String, path: String): Boolean =
      Robots.isAllowed(Robots.parse("User-agent: *\n" + rules, "bot"), path)
    // '*' matches any character run — the classic 'Disallow: /*?' rule
    assert(!allowed("Disallow: /*?", "/search?q=x"))
    assert(allowed("Disallow: /*?", "/search/q/x"))
    assert(!allowed("Disallow: /private*/data", "/private-2024/data/f"))
    assert(allowed("Disallow: /private*/data", "/private-2024/info"))
    // consecutive / leading stars, and '*' needing backtracking
    assert(!allowed("Disallow: /a**b", "/axxb"))
    assert(!allowed("Disallow: /*.pdf", "/x/report.pdf.pdf"))
    // '$' anchors to end-of-path only when TRAILING; literal elsewhere
    assert(!allowed("Disallow: /*.json$", "/api/v1.json"))
    assert(allowed("Disallow: /*.json$", "/api/v1.json/extra"))
    assert(!allowed("Disallow: /a$b", "/a$b/c")) // midway '$' is literal
    // anchored empty-suffix: 'Disallow: /dir$' blocks exactly /dir
    assert(!allowed("Disallow: /dir$", "/dir") && allowed("Disallow: /dir$", "/dir/x"))
    // longest PATTERN wins: a longer wildcard Disallow beats a shorter Allow
    assert(!allowed("Allow: /p\nDisallow: /p/*/secret", "/p/a/secret"))
    // percent normalization: %7E ~ compare equal both directions; %2F stays
    assert(!allowed("Disallow: /~joe", "/%7Ejoe/f"))
    assert(!allowed("Disallow: /%7Ejoe", "/~joe/f"))
    assert(allowed("Disallow: /a/b", "/a%2Fb")) // escaped slash != delimiter
    // prefix semantics unchanged for literal rules
    assert(!allowed("Disallow: /lit", "/literal") && allowed("Disallow: /lit", "/x/lit"))
  }

  test("frontier waves: one URL per domain per wave, priority within domain") {
    val df = Seq(
      (1L, "a.com", 90L), (2L, "a.com", 50L), (3L, "a.com", 70L),
      (4L, "b.com", 10L), (5L, "b.com", 99L)
    ).toDF("id", "domain", "prio")
    val r = UrlTools.frontierWaves(df, "domain", Seq(col("prio").desc, col("id")))
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("wave")).toMap
    // a.com priority order: 1 (90), 3 (70), 2 (50); b.com: 5 (99), 4 (10)
    assert(r == Map(1L -> 1L, 3L -> 2L, 2L -> 3L, 5L -> 1L, 4L -> 2L))
    // the (wave, domain) schedule alternates domains before repeats
    val sched = UrlTools.frontierWaves(df, "domain", Seq(col("prio").desc, col("id")))
      .orderBy("wave", "domain").collect().map(_.getLong(0)).toSeq
    assert(sched == Seq(1L, 5L, 3L, 4L, 2L))
  }

  test("skew report: exact basis-point shares, null keys counted") {
    val df = (Seq.fill(60)(Some("hot")) ++ Seq.fill(30)(Some("warm")) ++
      Seq.fill(9)(Some("cold")) ++ Seq.fill(1)(None: Option[String]))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = graft.engine.SkewTools.skewReport(df, "k", k = 3)
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      (Some("hot"), 60L, 6000L), (Some("warm"), 30L, 3000L), (Some("cold"), 9L, 900L)))
    // a null-heavy key surfaces in the report rather than vanishing
    val r2 = graft.engine.SkewTools.skewReport(df.filter(col("k").isNull || col("k") === "cold"), "k", 2)
      .collect().map(x => (Option(x.getString(0)), x.getLong(1)))
    assert(r2.contains((None, 1L)))
  }

  test("compaction plan: small files pack contiguously per partition, big files untouched") {
    // partition p: files 10,20,30,90,35 in file order; threshold 40, target 50
    val files = Seq(
      ("p", 1L, 10L), ("p", 2L, 20L), ("p", 3L, 30L), ("p", 4L, 90L), ("p", 5L, 35L),
      ("q", 1L, 39L), ("q", 2L, 40L)
    ).toDF("part", "file_id", "sz")
    val plan = Layout.compactionPlan(files, "part", "file_id", "sz",
      smallThreshold = 40L, targetSize = 50L)
      .orderBy("part", "file_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // p smalls: 10,20,30,35 -> cum-before 0,10,30,60 -> bins 0,0,0,1
    // q smalls: 39 -> bin 0; q/2 at exactly the threshold is NOT small
    assert(plan.toSeq == Seq(
      ("p", 1L, 10L, 0L), ("p", 2L, 20L, 0L), ("p", 3L, 30L, 0L), ("p", 5L, 35L, 1L),
      ("q", 1L, 39L, 0L)))
  }

  test("encoding artifacts: mojibake pair counting, replacement and control chars, clean zero") {
    val df = Seq(
      (1L, "clean text here"),
      (2L, "bad Ã© double â€œ decode"), // 2 moji marks
      (3L, "lossy �� read"), // 2 replacement chars
      (4L, "bell\u0007 and tab\t ok") // 1 control (tab NOT counted)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.encodingArtifacts(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0), (2L, 2L, 0L, 0L, 1), (3L, 0L, 2L, 0L, 1), (4L, 0L, 0L, 1L, 1)))
  }

  test("parquet footer stats: typed min/max across files equals data truth") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_footer_").toString + "/t"
    // 4 files: some file's local max is a 3-digit 9xx while the global max
    // is 1000 — a string-compared merge would pick "999" over "1000"
    val df = (1 to 1000).map(i => (i.toLong, s"v${i % 7}")).toDF("k", "s")
    df.repartition(4).write.parquet(dir)
    val r = Layout.parquetFooterStats(spark, dir, Seq("k", "s"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getString(3)))
    assert(r.toSeq == Seq(("k", 1000L, "1", "1000"), ("s", 1000L, "v0", "v6")))
    // absent column: no row, no throw
    assert(Layout.parquetFooterStats(spark, dir, Seq("nope")).collect().isEmpty)
  }

  test("prefix filter join: complete vs brute force at the threshold, caps visible") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), // J = 3/5 = 60%
      (3L, "a b x y"), // vs 1: J = 2/6 = 33% -> out
      (4L, "p q r s"), (5L, "p q r s"), // J = 100%
      (6L, "z")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, "doc_id", "text", 50, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(6))).toSet
    // brute-force truth at J >= 50%: exactly (1,2) and (4,5)
    assert(got == Set((1L, 2L, 3L, 60L), (4L, 5L, 4L, 100L)))
    // threshold raised to 70%: the 60% pair drops, the exact dup survives
    val hi = Dedup.prefixFilterPairs(docs, "doc_id", "text", 70, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi == Set((4L, 5L)))
    // shingle mode: 3-gram sets {one two three, two three four, three four X}
    // intersect in 2 of 4 -> exactly 50%; sub-3-word docs drop out
    val shDocs = Seq(
      (1L, "one two three four five"), (2L, "one two three four six"),
      (3L, "totally different words here now"), (4L, "ab")
    ).toDF("doc_id", "text")
    val sh = Dedup.prefixFilterPairs(shDocs, "doc_id", "text", 50, 500, shingleWords = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(6))).toSet
    assert(sh == Set((1L, 2L, 2L, 50L)))
    // cap accounting: the report must count every posting the cap drops.
    // Five identical docs, maxBucket=2: both prefix tokens bucket to 5
    // docs, the cap keeps ids {1,2} per token, so of the 10 qualifying
    // pairs only (1,2) survives — and the report books exactly that loss
    val hot = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a b"), (5L, "a b"))
      .toDF("doc_id", "text")
    val capPairs = Dedup.prefixFilterPairs(hot, "doc_id", "text", 50, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capPairs == Set((1L, 2L)), s"cap should keep only the smallest ids: $capPairs")
    val rep = Dedup.prefixFilterCapReport(hot, "doc_id", "text", 50, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    // 2 prefix tokens ("a","b"; J=50% keeps the full 2-token prefix),
    // 10 postings, both tokens truncated, 3 postings foregone per token
    assert(rep == ((2L, 10L, 2L, 6L)), s"cap report must count the misses: $rep")
    // same input, cap that fits: complete pair set, zeroed accounting
    val okPairs = Dedup.prefixFilterPairs(hot, "doc_id", "text", 50, maxBucket = 5)
      .collect().length
    assert(okPairs == 10, s"uncapped run must emit all C(5,2) pairs: $okPairs")
    val repOk = Dedup.prefixFilterCapReport(hot, "doc_id", "text", 50, maxBucket = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(repOk == ((0L, 0L)), s"fitting cap must report zero truncation: $repOk")
  }

  test("verified LSH pairs: exact precision at the threshold, subset of candidates, same contract as prefix join") {
    import graft.operators.Dedup
    // docs 1/2: 3-gram Jaccard 78% (17-word shared body, 2-word tails);
    // docs 3/4 share a short phrase — band-collision-possible but FAR
    // below 50%; doc 5 standalone
    val body = "the quick brown fox and the lazy dog of the north went to the market in town"
    val d = Seq(
      (1L, s"$body uniqoneaa uniqonebb"),
      (2L, s"$body uniqtwoaa uniqtwobb"),
      (3L, "shared phrase here then totally different continuation words apple banana"),
      (4L, "shared phrase here but another ending entirely carrot dill edamame fig"),
      (5L, "nothing in common with anybody else at all whatsoever")
    ).toDF("doc_id", "text")
    val verified = Dedup.minHashLshVerifiedPairs(d, "doc_id", "text", minJaccardPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("jaccard_pct")))
    // precision is exact: ONLY the genuine >= 50% pair survives the verify
    assert(verified.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(verified.head._3 >= 50L)
    // verified pairs are a subset of the raw candidates at every threshold
    val cands = Dedup.minHashLshPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.map(t => (t._1, t._2)).toSet.subsetOf(cands))
    // threshold raised past the pair's jaccard: nothing survives
    assert(Dedup.minHashLshVerifiedPairs(d, "doc_id", "text", 90).count() == 0L)
    // column contract matches prefixFilterPairs (the CLI treats them uniformly)
    assert(Dedup.minHashLshVerifiedPairs(d, "doc_id", "text", 50).columns.toSeq ==
      Dedup.prefixFilterPairs(d, "doc_id", "text", 50).columns.toSeq)
  }

  test("lsh candidate mass: hand-exact bucket algebra, cap skips are counted never silent") {
    import graft.operators.Dedup
    // five identical docs: every band's bucket holds all 5 -> 4 buckets,
    // C(5,2)=10 per band = 40 emitted under a fitting cap
    val five = (1L to 5L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_pair_buckets"),
        r.getAs[Long]("n_capped_buckets"), r.getAs[String]("pred_pairs_emitted").toLong,
        r.getAs[String]("pairs_skipped_capped").toLong)
    }
    assert(row(Dedup.lshCandidateMass(five, "doc_id", "text")) == ((4L, 4L, 0L, 40L, 0L)))
    // binding cap: every bucket overflows -> all mass moves to the skipped
    // column, and the pair join itself emits nothing (the cap contract)
    assert(row(Dedup.lshCandidateMass(five, "doc_id", "text", maxBucketSize = 2)) ==
      ((4L, 0L, 4L, 0L, 40L)))
    assert(Dedup.minHashLshPairs(five, "doc_id", "text", maxBucketSize = 2).count() == 0L)
    // emitted mass bounds the DISTINCT pair output (multi-band collapse)
    val pairs = Dedup.minHashLshPairs(five, "doc_id", "text").count()
    assert(pairs == 10L && 40L >= pairs)
    // fully diverse corpus: singleton buckets only — zero pair mass
    val solo = (1L to 6L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text")
    val (nb, npb, ncb, em, sk) = row(Dedup.lshCandidateMass(solo, "doc_id", "text"))
    assert(npb == 0L && ncb == 0L && em == 0L && sk == 0L && nb == 24L)
    assertThrows[IllegalArgumentException](
      Dedup.lshCandidateMass(five, "doc_id", "text", maxBucketSize = 1))
  }

  test("similarity-join advisor: degraded corpus routes to LSH, diverse to prefix filter, mass exact") {
    import graft.operators.Dedup
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getAs[Long]("n_docs"), r.getAs[String]("pred_pairs_prefix").toLong,
        r.getAs[Long]("pair_budget"), r.getAs[String]("verdict"))
    }
    // the r13 regime: tag-degraded low-diversity corpus — every doc drawn
    // from a 4-word vocabulary, so ~every pair is a genuine candidate and
    // the TRUE pair count is quadratic. 80 docs, budget 10/doc = 800:
    // predicted mass must overflow the budget and route to LSH.
    val degraded = (1L to 80L).map(i =>
      (i, s"alpha beta gamma delta tag${i % 2}")).toDF("doc_id", "text")
    val (nd, ppd, bud, vd) = row(Dedup.similarityJoinAdvisor(
      degraded, "doc_id", "text", minJaccardPct = 50, maxPairsPerDoc = 10))
    assert(nd == 80L && bud == 800L)
    assert(ppd > bud && vd == "minhash_lsh",
      s"quadratic corpus must route to LSH: pred=$ppd budget=$bud")
    // diverse corpus: per-doc unique vocabulary — prefix postings are all
    // singletons, predicted mass 0, the exact join is safe
    val diverse = (1L to 80L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
    val (nd2, ppd2, _, vd2) = row(Dedup.similarityJoinAdvisor(
      diverse, "doc_id", "text", minJaccardPct = 50, maxPairsPerDoc = 10))
    assert(nd2 == 80L && ppd2 == 0L && vd2 == "prefix_filter")
    // hand-exact mass: 5 identical 2-token docs, t=50 keeps the full
    // 2-token prefix -> two tokens with 5 postings each: 2 * C(5,2) = 20;
    // budget boundary is INCLUSIVE (pred == budget stays on the exact path)
    val five = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a b"), (5L, "a b"))
      .toDF("doc_id", "text")
    val (_, pp5, bud5, v5) = row(Dedup.similarityJoinAdvisor(
      five, "doc_id", "text", minJaccardPct = 50, maxPairsPerDoc = 4))
    assert(pp5 == 20L && bud5 == 20L && v5 == "prefix_filter",
      s"boundary must be inclusive: pred=$pp5 budget=$bud5 verdict=$v5")
    val (_, _, _, v5over) = row(Dedup.similarityJoinAdvisor(
      five, "doc_id", "text", minJaccardPct = 50, maxPairsPerDoc = 3))
    assert(v5over == "minhash_lsh")
    // the advisor predicts the work the join then actually does: the
    // degraded corpus's REAL qualifying pair count is itself quadratic
    // (the prediction is a candidate superset, never an undercount)
    val real = Dedup.prefixFilterPairs(degraded, "doc_id", "text", 50, maxBucket = 500)
      .count()
    assert(real.toDouble >= 0.4 * (80.0 * 79 / 2) && ppd >= real,
      s"degraded corpus: real=$real predicted=$ppd")
    // empty corpus degenerates cleanly: zero row, prefix_filter verdict
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (nd0, pp0, _, v0) = row(Dedup.similarityJoinAdvisor(
      empty, "doc_id", "text", minJaccardPct = 50))
    assert(nd0 == 0L && pp0 == 0L && v0 == "prefix_filter")
    assertThrows[IllegalArgumentException](Dedup.similarityJoinAdvisor(
      five, "doc_id", "text", minJaccardPct = 50, maxPairsPerDoc = 0))
  }

  test("consistent hash: ring matches reference impl, growth moves keys only to the new shard") {
    import graft.operators.Layout
    // ring positions are collision-free for the query's parameters
    val r5 = Layout.consistentHashRing(5, 16)
    assert(r5.map(_._1).distinct.size == r5.size)
    // expression assignment == plain-Scala reference binary search
    def ref(key: Long, ring: Seq[(Long, Int)]): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val kh = java.lang.Long.parseLong(
        md.digest(s"key:$key".getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
      ring.find(_._1 >= kh).getOrElse(ring.head)._2
    }
    val keys = (0L until 200L).toDF("k")
    val got = keys.withColumn("s", Layout.consistentShard("k", 5, 16))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 200L).foreach(k => assert(got(k) == ref(k, r5), s"key $k"))
    // minimal movement: growing 4 -> 5 shards never moves a key between old shards
    val r4 = Layout.consistentHashRing(4, 16)
    var moved = 0
    (0L until 200L).foreach { k =>
      val (a, b) = (ref(k, r4), ref(k, r5))
      if (a != b) { moved += 1; assert(b == 4, s"key $k moved $a->$b, not to the new shard") }
    }
    assert(moved > 0 && moved < 200 / 2) // some movement, far less than re-mod-ing
  }

  test("mp4 meta: box-walk goldens, oversized moov nulls, truncation never throws, frame cap binds") {
    import graft.operators.Multimodal
    // id 1: brand mp41, ts 1001, dur 1001*6+1=6007, 2 tracks
    assert(Multimodal.parseMp4Meta(Multimodal.buildMp4(1L, corrupt = false))
      .contains(("mp41", 1001L, 6007L, 2)))
    // id 4: brand isom (4%4=0), ts 1004, dur 1004*9+4, 2 tracks
    assert(Multimodal.parseMp4Meta(Multimodal.buildMp4(4L, corrupt = false))
      .contains(("isom", 1004L, 1004L * 9 + 4, 2)))
    // oversized moov (truncated download) -> clean None
    assert(Multimodal.parseMp4Meta(Multimodal.buildMp4(1L, corrupt = true)).isEmpty)
    // every truncation prefix parses to None or Some, never throws
    val full = Multimodal.buildMp4(7L, corrupt = false)
    (0 until full.length).foreach(k => Multimodal.parseMp4Meta(full.take(k)))
    assert(Multimodal.parseMp4Meta(Array[Byte](1, 2, 3)).isEmpty)
    // frame plan: 5500ms at 1fps -> 6 frames; 100000ms caps at 32
    val meta = Seq((1L, Some(5500L)), (2L, Some(100000L)), (3L, None: Option[Long]))
      .toDF("id", "duration_ms")
    val plan = Multimodal.frameSamplePlan(meta, "id", "duration_ms", 1000L, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val by = plan.groupBy(_._1)
    assert(by(1L).length == 6 && by(1L).map(_._3).max == 5000L)
    assert(by(2L).length == 32 && by(2L).map(_._3).max == 31000L)
    assert(!by.contains(3L)) // corrupt video emits no work
  }

  test("ppm resize: exact block means, real P6 round-trip, non-divisible and corrupt null") {
    import graft.operators.Multimodal
    // 2x2 -> 1x1: channel means of the four pixels, truncating
    val src = ("P6\n2 2\n255\n").getBytes("US-ASCII") ++
      Array(10, 20, 30, 11, 21, 31, 12, 22, 32, 14, 25, 37).map(_.toByte)
    val out = Multimodal.ppmResize(src, 2).get
    val hdr = "P6\n1 1\n255\n".getBytes("US-ASCII")
    assert(out.take(hdr.length).sameElements(hdr))
    assert(out.drop(hdr.length).toSeq == Seq[Byte](11, 22, 32)) // (10+11+12+14)/4=11 ...
    // the resized payload is a decodable image again
    val feats = Multimodal.decodePpm(out).get
    assert(feats.width == 1 && feats.height == 1 &&
      feats.rSum == 11L && feats.gSum == 22L && feats.bSum == 32L)
    // non-divisible factor, junk, truncation: clean None
    assert(Multimodal.ppmResize(src, 3).isEmpty)
    assert(Multimodal.ppmResize(src.take(12), 2).isEmpty)
    assert(Multimodal.ppmResize(Array[Byte](1, 2), 2).isEmpty)
    assert(Multimodal.ppmResize(src, 0).isEmpty)
  }

  test("twap: holding-duration weights, truncating division, degenerate keys drop") {
    val df = Seq(
      // u1: v=10 held 10us, v=20 held 30us -> (100+600)/40 = 17 (trunc)
      ("u1", 0L, 10L, 1L), ("u1", 10L, 20L, 2L), ("u1", 40L, 99L, 3L),
      ("u2", 5L, 7L, 4L), // single observation: no gap -> dropped
      ("u3", 9L, 1L, 5L), ("u3", 9L, 2L, 6L) // zero span -> dropped
    ).toDF("u", "ts", "v", "id")
    val r = Stats.timeWeightedMean(df, "u", "ts", "v", "id")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("u1", 2L, 40L, 17L)))
    // the naive AVG over the same observations is (10+20+99)/3 = 43 —
    // the irregular-sampling bias TWAP removes
  }

  test("jpeg exif: both byte orders, offset values, sub-IFD, corrupt magic nulls, never throws") {
    val df = Seq((2L, "ab"), (3L, "cd"), (17L, "ef")).toDF("doc_id", "text")
    val payloads = Multimodal.withExifJpegPayload(df, "doc_id", "text", 2, 2)
    val r = Multimodal.jpegExif(payloads, "doc_id", "payload").orderBy("doc_id").collect()
    // id 2: little-endian, orientation 1+2%8=3, 72/1 dpi, second 02, 16px wide
    assert(r(0).getString(1) == "II" && r(0).getInt(2) == 3 &&
      r(0).getLong(3) == 72L && r(0).getLong(4) == 1L &&
      r(0).getString(5) == "2026:01:01 00:00:02" && r(0).getLong(6) == 16L)
    // id 3: big-endian path reads the same values
    assert(r(1).getString(1) == "MM" && r(1).getInt(2) == 4 &&
      r(1).getString(5) == "2026:01:01 00:00:03")
    // id 17: corrupt TIFF magic -> metadata nulls out, nothing thrown
    assert(r(2).isNullAt(1) && r(2).isNullAt(2) && r(2).isNullAt(6))
    // the APP1 splice must not break pixel decoding
    val px = Multimodal.jpegStats(payloads, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(px.forall(!_.isNullAt(1)) && px(0).getInt(1) == 16)
    // junk in, None out — same contract as every decoder
    assert(Multimodal.parseExif(null).isEmpty)
    assert(Multimodal.parseExif(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseExif(
      Array(0xff, 0xd8, 0xff, 0xe1, 0x00, 0x03).map(_.toByte)).isEmpty)
    // plain JPEG without APP1: no Exif, cleanly absent
    val plain = Multimodal.encodeJpegFromText("xy", 1, 1)
    assert(Multimodal.parseExif(plain).isEmpty)
  }

  test("phrase postings: adjacency join counts, repeats, absent phrase zero, case folded") {
    val df = Seq(
      (1L, "The quick fox and the quick fox again"),
      (2L, "quick fox"),
      (3L, "fox quick") // reversed order must NOT match
    ).toDF("doc_id", "text")
    val r = TextAnalysis.phraseOccurrences(df, "doc_id", "text",
        Seq("quick" -> "fox", "missing" -> "phrase"))
      .orderBy("phrase").collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("missing phrase", 0L, 0L), ("quick fox", 2L, 3L)))
  }

  test("agg ivm cdc: updates fold, new groups appear, zeroed groups vanish") {
    val view = Seq(("a", 2L, 30L), ("b", 1L, 5L), ("c", 3L, 9L))
      .toDF("k", "n", "total")
    val delta = Seq(
      ("a", 10L, -1L), ("a", 12L, 1L), // update one a-row 10 -> 12
      ("b", 5L, -1L),                  // b's only row deleted -> group vanishes
      ("d", 7L, 1L), ("d", 8L, 1L)     // brand-new group
    ).toDF("k", "qty", "m")
    val r = Ivm.maintainSumCount(view, delta, Seq("k"), "qty")
      .orderBy("k").collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("a", 2L, 32L), ("c", 3L, 9L), ("d", 2L, 15L)))
  }

  test("bloom-filtered join: exact inner-join equality, probe filter below the shuffle") {
    // fact must be a non-local relation: ConvertToLocalRelation would
    // evaluate the probe filter at optimization time and erase the node
    // the plan assertion below looks for
    val fact = spark.range(1, 401)
      .select((col("id") % 50).as("k"), col("id").as("v"))
    val dim = Seq(3L, 7L, 11L).map(k => (k, s"d$k")).toDF("k", "name")
    val got = JoinOpt.bloomFilteredEquiJoin(fact, dim, "k", 100L, 0.01)
    val want = fact.join(dim, Seq("k"))
    assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet)
    // plan shape: the Bloom probe is a Filter on the fact side BELOW the
    // join — its subtree holds no Join, so fact rows are dropped before
    // the join's shuffle (AQE wraps the physical tree, so assert on the
    // optimized logical plan)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
    val probes = got.queryExecution.optimizedPlan.collect {
      case f: LFilter if f.condition.toString.contains("UDF") =>
        f.collect { case j: LJoin => j }.isEmpty
    }
    assert(probes.contains(true), "bloom probe filter must sit below the join")
  }

  test("cdc chunks: reconstruction, re-synchronization after prefix edit, short docs") {
    val base = {
      var s = 12345L // deterministic LCG: aperiodic content so boundaries spread
      (1 to 400).map { _ =>
        s = (s * 1103515245L + 12345L) & 0x7fffffffL
        ('a' + (s % 26).toInt).toChar
      }.mkString
    }
    val df = Seq((1L, base), (2L, "QQ" + base), (3L, "tiny")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(df, "doc_id", "text", k = 8, divisor = 32)
      .orderBy("doc_id", "chunk_idx").collect()
    // chunks of each doc tile the doc exactly (no gaps, no overlap)
    for (id <- Seq(1L, 2L, 3L)) {
      val c = chunks.filter(_.getLong(0) == id)
      val text = if (id == 1) base else if (id == 2) "QQ" + base else "tiny"
      assert(c.head.getLong(2) == 0L)
      assert(c.map(_.getLong(3)).sum == text.length.toLong)
      c.sliding(2).foreach {
        case Array(p, n) => assert(p.getLong(2) + p.getLong(3) == n.getLong(2))
        case _ => ()
      }
    }
    // content-defined property: after a 2-char prefix insertion the
    // boundary stream re-synchronizes, so most chunk HASHES are shared —
    // a fixed-size chunker would share none
    val h1 = chunks.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val h2 = chunks.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    assert(h1.size >= 5, s"fixture should chunk into several pieces, got ${h1.size}")
    assert((h1 & h2).size >= h1.size - 2,
      s"suffix chunks must dedup across the edit: shared ${(h1 & h2).size} of ${h1.size}")
    // short doc: one whole-text chunk
    val tiny = chunks.filter(_.getLong(0) == 3L)
    assert(tiny.length == 1 && tiny(0).getLong(3) == 4L)
  }

  test("href extraction: quote styles, fragment-only excluded, sitemap kinds") {
    val html = """<html><A HREF="http://a.example.com/x">1</A>
      |<a href='http://b.example.com/y?q=1'>2</a>
      |<a href="#top">skip</a><a data-href="zz">no</a>
      |<use xlink:href="uu"/>
      |<link href = "http://c.example.com/s.css"></html>""".stripMargin
    val r = Seq((1L, html)).toDF("id", "h")
      .select(UrlTools.extractHrefs("h").as("u")).collect()(0).getSeq[String](0)
    assert(r == Seq("http://a.example.com/x", "http://b.example.com/y?q=1",
      "http://c.example.com/s.css"))
    val sm = Seq(
      (1L, "<urlset><url><loc>\n https://a/1 \n</loc></url><url><loc>https://a/2</loc></url></urlset>"),
      (2L, "<sitemapindex><sitemap><loc> https://a/s.xml </loc></sitemap></sitemapindex>"),
      (3L, "<html>junk</html>")
    ).toDF("id", "x").select(col("id"), UrlTools.sitemapEntries("x").as("s"))
      .orderBy("id").collect()
    assert(sm(0).getStruct(1).getString(0) == "urlset" &&
      sm(0).getStruct(1).getSeq[String](1) == Seq("https://a/1", "https://a/2"))
    assert(sm(1).getStruct(1).getString(0) == "sitemapindex" &&
      sm(1).getStruct(1).getSeq[String](1) == Seq("https://a/s.xml"))
    assert(sm(2).getStruct(1).isNullAt(0) && sm(2).getStruct(1).getSeq[String](1).isEmpty)
  }

  test("anchor extraction: nested markup stripped, multi-line collapsed, fragment excluded, empty kept") {
    val html = """<html><A HREF="http://a.example.com/x" class=y>read
      | <b>more</b>  here</A><a href="#top">skip</a>
      |<a class='z' data-href='http://decoy.example.net/d' xlink:href='http://decoy2.example.net/e' href='http://b.example.com/y'></a>
      |<a href="http://c.example.com/z">c <i>1</i></a
      |></html>""".stripMargin
    val r = Seq((1L, html)).toDF("id", "h")
      .select(explode(UrlTools.extractAnchors("h")).as("a"))
      .select(col("a.href"), col("a.anchor")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r == Seq(
      ("http://a.example.com/x", "read more here"), // case-insensitive tag, \n + tags normalized
      ("http://b.example.com/y", ""),               // empty body kept as ''
      ("http://c.example.com/z", "c 1")))           // whitespace inside </a > close tolerated
  }

  test("semantic boundaries: hand-computed jaccard depths, single-block and empty docs degenerate cleanly") {
    val d = Seq(
      (1L, "a b c d a b x y p q r s"), // blocks {a,b,c,d},{a,b,x,y},{p,q,r,s}
      (2L, "a b"),                     // one block: no gaps
      (3L, "")                         // empty: all zeros
    ).toDF("doc_id", "text")
    val r = TextAnalysis.semanticBoundaries(d, "doc_id", "text", blockTokens = 4)
      .orderBy("doc_id")
      .select("n_tokens", "n_blocks", "n_gaps", "max_depth", "n_boundaries", "first_boundary")
      .collect().map(x => (0 to 5).map(x.getLong).toList)
    // doc 1: score1 = |{a,b}| * 1e6 div |{a,b,c,d,x,y}| = 333333, score2 = 0;
    // depth1 = 0 (next is lower), depth2 = 333333 (drop from the left) =>
    // the topic shift lands at gap 2, exactly where {p,q,r,s} begins
    assert(r(0) == List(12L, 3L, 2L, 333333L, 1L, 2L))
    assert(r(1) == List(2L, 1L, 0L, 0L, 0L, -1L))
    assert(r(2) == List(0L, 0L, 0L, 0L, 0L, -1L))
  }

  test("flac streaminfo: bit unpack golden, padding block tolerated, corrupt/truncated None") {
    // id 1: sr 16000, ch 2, bps 16, total 16000*4+1
    assert(Multimodal.parseFlacMeta(Multimodal.buildFlac(1L, corrupt = false))
      .contains((16000L, 2, 16, 64001L)))
    // id 5 carries a trailing PADDING block — STREAMINFO-first still reads
    val m5 = Multimodal.parseFlacMeta(Multimodal.buildFlac(5L, corrupt = false))
    assert(m5.contains((48000L, 2, 16, 48000L * 8 + 5)))
    assert(Multimodal.parseFlacMeta(Multimodal.buildFlac(17L, corrupt = true)).isEmpty)
    val ok = Multimodal.buildFlac(1L, corrupt = false)
    (0 until ok.length).foreach(n => Multimodal.parseFlacMeta(ok.take(n))) // never throws
    assert(Multimodal.parseFlacMeta(ok.take(20)).isEmpty)
  }

  test("mp3: syncsafe tag skip, bitrate/samplerate tables, tagless stream, corrupt sync None") {
    // id 1: tag 101, brIdx 2 -> 40 kbps, srIdx 1 -> 48000, mode 1, audio 422 bytes
    assert(Multimodal.parseMp3Meta(Multimodal.buildMp3(1L, corrupt = false))
      .contains((101L, 40, 48000, "joint_stereo", 422L * 8 / 40)))
    // valid ID3 but broken frame sync: the tag must not be trusted
    assert(Multimodal.parseMp3Meta(Multimodal.buildMp3(23L, corrupt = true)).isEmpty)
    // tagless: frame header at byte 0, 128 kbps idx 9, 44100 idx 0, mono
    val raw = Array(0xff.toByte, 0xfb.toByte, ((9 << 4) | (0 << 2)).toByte,
      (3 << 6).toByte) ++ Array.fill(1000)(0x55.toByte)
    assert(Multimodal.parseMp3Meta(raw).contains((0L, 128, 44100, "mono", 1004L * 8 / 128)))
    // syncsafe high-bit violation rejected
    val bad = Multimodal.buildMp3(2L, corrupt = false)
    bad(6) = 0x80.toByte
    assert(Multimodal.parseMp3Meta(bad).isEmpty)
  }

  test("delete cascade: fk fan-out counts, checksum covers exact keys, bad edge order throws") {
    val cust = Seq(1L, 2L, 3L).toDF("c")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o", "oc")
    val li = Seq((100L, 10L), (101L, 10L), (102L, 12L)).toDF("l", "lo")
    val seeds = Seq(1L).toDF("c")
    val m = Governance.cascadeManifest("customer", cust, "c", seeds, "c",
        Seq(Governance.FkEdge("orders", ord, "oc", "o", "customer"),
          Governance.FkEdge("lineitem", li, "lo", "l", "orders")))
      .orderBy("table_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def hashOf(ks: Seq[Long]): Long =
      if (ks.isEmpty) 0L
      else ks.toDF("__k").agg(sum(expr(
        "CAST(conv(substring(md5(CAST(__k AS STRING)), 1, 8), 16, 10) AS BIGINT)")))
        .head().getLong(0)
    // c1 -> orders 10,11 -> lineitems 100,101 (order 12 / lineitem 102 untouched)
    assert(m.toSeq == Seq(
      ("customer", 1L, hashOf(Seq(1L))),
      ("lineitem", 2L, hashOf(Seq(100L, 101L))),
      ("orders", 2L, hashOf(Seq(10L, 11L)))))
    assertThrows[IllegalArgumentException] {
      Governance.cascadeManifest("customer", cust, "c", seeds, "c",
        Seq(Governance.FkEdge("lineitem", li, "lo", "l", "orders")))
    }
  }

  test("ks drift: hand-computed sup gap, identical sides read zero") {
    val df = Seq(
      ("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L), ("g", 1L, 3L), ("g", 1L, 4L),
      ("h", 0L, 5L), ("h", 0L, 6L), ("h", 1L, 5L), ("h", 1L, 6L)
    ).toDF("grp", "side", "v")
    val r = Stats.ksDrift(df, "grp", "side", "v").orderBy("grp").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // g: cumA=[1,2,3,3], cumB=[0,0,1,2], nA=3, nB=2 -> max|cumA*2-cumB*3| = 4 at v=2
    assert(r.toSeq == Seq(("g", 3L, 2L, 4L, 6666L), ("h", 2L, 2L, 0L, 0L)))
  }

  test("hilbert index: reference match, bijective, unit-step curve, beats morton locality") {
    val grid = for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)
    val rows = grid.toDF("x", "y")
      .withColumn("h", Layout.hilbertIndex("x", "y", 3))
      .withColumn("z", Layout.zOrderKey(Seq(col("x"), col("y")), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent imperative xy2d (Hamilton's loop, full-grid flips)
    def xy2d(order: Int, x0: Long, y0: Long): Long = {
      val n = 1L << order
      var (x, y, d) = (x0, y0, 0L)
      var s = n >> 1
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    rows.foreach { case (x, y, h, _) => assert(h == xy2d(3, x, y), s"($x,$y)") }
    assert(rows.map(_._3).toSet == (0L until 64L).toSet) // bijection over the grid
    // THE Hilbert property: consecutive curve positions are grid neighbors
    rows.sortBy(_._3).sliding(2).foreach {
      case Array(a, b) =>
        assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
          s"curve jump ${a} -> ${b}")
      case _ => ()
    }
    // locality (the zone-map argument, quantified the way Moon et al.
    // quantify it): a box predicate maps to contiguous runs of the sort
    // key; fewer runs = fewer windows touched. Over every 4x4 box of a
    // 16x16 grid, hilbert must need strictly fewer runs than morton
    // (computed off-plan: 628 vs 1000)
    val big = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("h", Layout.hilbertIndex("x", "y", 4))
      .withColumn("z", Layout.zOrderKey(Seq(col("x"), col("y")), 4))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    def runsTotal(key: ((Long, Long)) => Long): Long =
      (for { x0 <- 0 to 12; y0 <- 0 to 12 } yield {
        val ks = (for { x <- x0 until x0 + 4; y <- y0 until y0 + 4 }
          yield key(big((x.toLong, y.toLong)))).sorted
        1L + ks.zip(ks.tail).count { case (a, b) => b - a > 1 }
      }).sum
    val (hr, zr) = (runsTotal(_._1), runsTotal(_._2))
    assert(hr < zr, s"hilbert $hr runs should beat morton $zr")
  }

  test("resample ffill: holes carry last value, bucket-last tie-break, n_obs marks fills") {
    val df = Seq(
      (1L, 0L, 5L, 1L),   // bucket 0
      (1L, 5L, 9L, 2L),   // bucket 0, same-ts tie decided by id below
      (1L, 5L, 1L, 1L),   // bucket 0 (ts tie: id 2 wins -> 9)
      (1L, 25L, 7L, 3L),  // bucket 2; bucket 1 is a hole -> filled with 9
      (2L, 40L, 3L, 4L)   // separate key, single bucket
    ).toDF("user_id", "ts_us", "cents", "event_id")
    val r = Stats.resampleFfill(df, "user_id", "ts_us", "cents", 10L, "event_id")
      .orderBy("user_id", "bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 9L, 3L),
      (1L, 1L, 10L, 9L, 0L),
      (1L, 2L, 20L, 7L, 1L),
      (2L, 4L, 40L, 3L, 1L)))
  }

  test("ols2: exact-fit plane recovered, collinear group nulls, negative slope") {
    // y = 7 + 3*x1 - 2*x2 exactly: integer coefficients survive the ×1000
    // fixed point untouched, including the NEGATIVE b2 (truncation toward
    // zero on a signed numerator).
    val exact = Seq((1L, 0L, 10L), (2L, 1L, 11L), (3L, 0L, 16L), (4L, 2L, 15L),
      (1L, 3L, 4L), (5L, 1L, 20L)).map { case (x1, x2, y) => ("g", x1, x2, y) }
    // x2 = 2*x1 everywhere: det = 0, coefficients must be NULL, not a throw
    val collinear = Seq(("c", 1L, 2L, 5L), ("c", 2L, 4L, 7L), ("c", 3L, 6L, 9L))
    val r = Stats.ols2((exact ++ collinear).toDF("grp", "x1", "x2", "y"),
      "grp", "x1", "x2", "y", scale = 1000)
      .orderBy("grp").collect()
    val c = r(0)
    assert(c.getString(0) == "c" && c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4))
    val g = r(1)
    assert((g.getLong(2), g.getLong(3), g.getLong(4)) == (3000L, -2000L, 7000L))
  }

  test("distinct-count ivm: partial delete keeps value, full delete drops it, insert adds") {
    val state0 = Seq((1L, 10L, 2L), (1L, 11L, 1L), (2L, 20L, 1L))
      .toDF("k", "v", "m")
    val delta = Seq(
      (1L, 10L, -1L), // one of two copies: value 10 must SURVIVE
      (1L, 11L, -1L), // last copy: value 11 vanishes
      (2L, 21L, 1L),  // new value for existing group
      (3L, 30L, 1L)   // brand-new group
    ).toDF("k", "v", "m")
    val merged = Ivm.maintainDistinct(state0, delta, Seq("k"), "v")
    val counts = Ivm.distinctCounts(merged, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
    val m10 = merged.filter(col("k") === 1L && col("v") === 10L)
      .collect().map(_.getAs[Long]("m"))
    assert(m10.toSeq == Seq(1L)) // surviving multiplicity decremented, not dropped
  }

  test("stratified k-fold: per-stratum counts differ by at most one, deterministic") {
    val df = (1L to 23L).map(i => (i, if (i % 5 == 0) "rare" else "common"))
      .toDF("id", "label")
    val folded = Sampling.stratifiedKFold(df, "id", "label", k = 3)
    val byFold = folded.groupBy("label", "fold").count()
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    // common: 19 rows over 3 folds -> 7/6/6; rare: 4 rows -> 2/1/1
    assert(Seq(0, 1, 2).map(f => byFold(("common", f))).sorted == Seq(6L, 6L, 7L))
    assert(Seq(0, 1, 2).map(f => byFold(("rare", f))).sorted == Seq(1L, 1L, 2L))
    // determinism: recomputation yields the identical assignment
    val a1 = folded.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val a2 = Sampling.stratifiedKFold(df, "id", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(a1 == a2)
  }

  test("ewma anomaly: spike over flat history flags exactly, drift and cold keys don't") {
    val flat = (1L to 16L).map(i => (1L, i, 100L))          // constant history
    val spike = Seq((1L, 17L, 100100L))                     // jump: must flag
    val calm = Seq((1L, 18L, 100L))                         // post-spike: ewma dragged but within $200? no — spike in history
    val drift = (1L to 40L).map(i => (2L, i, 100L + i * 50)) // +50c/step: never > $200 off
    val cold = (1L to 10L).map(i => (3L, i, 100L)) :+ (3L, 11L, 999999L) // <16 history
    val df = (flat ++ spike ++ calm ++ drift ++ cold).toDF("k", "o", "cents")
    val r = Stats.ewmaAnomalies(df, "k", Seq("o"), "cents",
      window = 16, threshold = 20000L)
      .orderBy("k", "o").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // flat→spike: ewma = 100 exactly, deviation = 100000
    assert(r.contains((1L, 17L, 100100L, 100L, 100000L)))
    // the row after the spike: ewma jumped to ~50150, |100−50150| > 20000 → also flagged
    assert(r.exists(t => t._1 == 1L && t._2 == 18L))
    // drift key and cold key: no flags at all
    assert(!r.exists(t => t._1 == 2L || t._1 == 3L))
  }

  test("kendall tau-a: perfect order, reversal, ties neither, textbook mixed case") {
    def tau(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row =
      Stats.kendallTauA(rows.toDF("x", "y"), "x", "y").collect().head
    // perfectly concordant: C = 3 pairs, denom = 3 -> tau = +1
    val up = tau(Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(up.getAs[Long]("n_concordant") == 3 && up.getAs[Long]("sign") == 1L)
    assert(up.getAs[Long]("tau_abs_fp") == 1000000L)
    // perfectly reversed -> sign -1, |tau| = 1
    val down = tau(Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(down.getAs[Long]("sign") == -1L && down.getAs[Long]("tau_abs_fp") == 1000000L)
    // textbook mixed case with ties on both axes:
    // points (1,1),(1,2),(2,1),(2,2): pairs with x strictly increasing = 4,
    // of which concordant (1,1)-(2,2) = 1, discordant (1,2)-(2,1) = 1,
    // y-ties 2 -> C=D=1, denom = 6 -> tau = 0
    val mixed = tau(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(mixed.getAs[Long]("n_concordant") == 1 && mixed.getAs[Long]("n_discordant") == 1)
    assert(mixed.getAs[Long]("sign") == 0L && mixed.getAs[Long]("tau_abs_fp") == 0L)
    // weighted cells: duplicate points multiply pair counts (n_a*n_b)
    val dup = tau(Seq((1L, 1L), (1L, 1L), (2L, 2L)))
    assert(dup.getAs[Long]("n_concordant") == 2) // 2x1 cross-cell pairs
    assert(dup.getAs[Long]("tau_abs_fp") == (2L * 1000000L) / 3L)
    // single row: undefined -> NULL
    assert(tau(Seq((1L, 1L))).isNullAt(4))
  }

  test("mann-whitney auc: perfect separation, ties, reversal, empty group null") {
    def auc(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row =
      Stats.mannWhitneyAuc(rows.toDF("g", "v"), "g", "v").collect().head
    // group1 strictly above group0 -> AUC = 1
    val sep = auc(Seq((1L, 3L), (1L, 4L), (0L, 1L), (0L, 2L)))
    assert(sep.getAs[Long]("u1_x2") == 8L && sep.getAs[Long]("auc_fp") == 1000000L)
    // identical distributions -> AUC = 1/2 exactly (tie half-credit)
    val tie = auc(Seq((1L, 1L), (1L, 2L), (0L, 1L), (0L, 2L)))
    assert(tie.getAs[Long]("u1_x2") == 4L && tie.getAs[Long]("auc_fp") == 500000L)
    // group1 strictly below -> AUC = 0
    assert(auc(Seq((1L, 1L), (1L, 2L), (0L, 3L), (0L, 4L))).getAs[Long]("auc_fp") == 0L)
    // one-sided data: AUC undefined -> NULL, not a fake 0 or 1
    assert(auc(Seq((1L, 1L), (1L, 2L))).isNullAt(3))
    // cross-check vs the textbook global-rank formula on a mixed case:
    // g1 = [2,5,5], g0 = [1,2,7]: pairs won = (2>1) + (5>1,5>2) + (5>1,5>2)
    // = 5, ties = (2,2) -> 0.5 -> U1 = 5.5, AUC = 5.5/9
    val mixed = auc(Seq((1L, 2L), (1L, 5L), (1L, 5L), (0L, 1L), (0L, 2L), (0L, 7L)))
    assert(mixed.getAs[Long]("u1_x2") == 11L)
    assert(mixed.getAs[Long]("auc_fp") == (11L * 1000000L) / 18L)
    // unbounded level cardinality refused
    val big = (1 to 2000).map(i => (i.toLong % 2, i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      Stats.mannWhitneyAuc(big, "g", "v").collect())
    assert(e.getMessage.contains("bucket the score"))
  }

  test("krippendorff alpha: hand-computed goldens, m=2 cross-check, degenerate marginals null") {
    // m=3, per-item ones [3,0,2,1]: S=4, n1=6, n_tot=12
    // alpha = 1 - 4*11/(2*6*6) = 1 - 44/72 -> 1e6 - floor(44e6/72) = 388889
    val df3 = Seq((1L, 1L, 1L), (0L, 0L, 0L), (1L, 1L, 0L), (1L, 0L, 0L))
      .toDF("r1", "r2", "r3")
    val r3 = Stats.krippendorffAlphaBinary(df3, Seq("r1", "r2", "r3")).collect().head
    assert(r3.getAs[Long]("n_items") == 4 && r3.getAs[Long]("m") == 3)
    assert(r3.getAs[Long]("n1") == 6 && r3.getAs[Long]("disagree_sum") == 4)
    assert(r3.getAs[Long]("alpha_fp") == 388889L)
    // m=2 cross-check vs the textbook pair computation: items {(1,1),(0,0),(1,0)}
    // -> Do=1/3, De=3/5... alpha = 4/9 -> floor form 1e6 - floor(5e6/9) = 444445
    val df2 = Seq((1L, 1L), (0L, 0L), (1L, 0L)).toDF("a", "b")
    val r2 = Stats.krippendorffAlphaBinary(df2, Seq("a", "b")).collect().head
    assert(r2.getAs[Long]("alpha_fp") == 444445L)
    // perfect agreement with mixed marginals: S=0 -> alpha exactly 1
    val perfect = Seq((1L, 1L), (0L, 0L)).toDF("a", "b")
    assert(Stats.krippendorffAlphaBinary(perfect, Seq("a", "b"))
      .collect().head.getAs[Long]("alpha_fp") == 1000000L)
    // degenerate marginals (every rating 1): alpha indeterminate -> NULL
    val allOnes = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(Stats.krippendorffAlphaBinary(allOnes, Seq("a", "b"))
      .collect().head.isNullAt(4))
    // 2.1M items, m=3: the numerator S*(ntot-1)*1e6 ~ 2.6e19 would wrap a
    // plain Long — the DECIMAL(38,0) path must stay exact and non-null
    val big = spark.range(2100000L).selectExpr(
      "CAST(id % 2 AS BIGINT) AS r1", "CAST(id % 3 = 0 AS BIGINT) AS r2",
      "CAST(id % 5 = 0 AS BIGINT) AS r3")
    val rb = Stats.krippendorffAlphaBinary(big, Seq("r1", "r2", "r3")).collect().head
    val alpha = rb.getAs[Long]("alpha_fp")
    assert(alpha > -1000000L && alpha < 1000000L, s"implausible alpha $alpha")
  }

  test("isotonic calibration: PAV golden, monotone certificate, level-cap guard") {
    // rates per level [0.8, 0.2, 0.5, 0.9] (10 obs each): PAV pools the
    // 0.8→0.2 violation (and the resulting 0.5,0.5 tie) into a flat 0.5
    // prefix and leaves 0.9 alone
    val rows = Seq(8, 2, 5, 9).zipWithIndex.flatMap { case (p, l) =>
      (1 to 10).map(i => (l.toLong, if (i <= p) 1L else 0L))
    }
    val r = Stats.isotonicCalibration(rows.toDF("score", "pos"), "score", "pos")
      .orderBy("level").collect()
    assert(r.map(_.getAs[Long]("calibrated_fp")).toSeq ==
      Seq(500000L, 500000L, 500000L, 900000L))
    assert(r.map(_.getAs[Long]("emp_rate_fp")).toSeq ==
      Seq(800000L, 200000L, 500000L, 900000L))
    assert(r.forall(_.getAs[Long]("is_monotone") == 1L))
    // already-monotone input passes through unchanged
    val mono = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L)).toDF("score", "pos")
    val rm = Stats.isotonicCalibration(mono, "score", "pos").orderBy("level").collect()
    assert(rm.map(_.getAs[Long]("calibrated_fp")).toSeq == Seq(500000L, 1000000L))
    // unbounded score cardinality is refused, not silently ground through
    val big = (1 to 300).map(i => (i.toLong, 0L)).toDF("score", "pos")
    val e = intercept[IllegalArgumentException](
      Stats.isotonicCalibration(big, "score", "pos"))
    assert(e.getMessage.contains("bucket the score"))
  }

  test("ewma anomaly: window=50 at 1e7 magnitudes is exact (no Long wrap in the weighted sum)") {
    // 2^49 * 1e7 ≈ 5.6e21 overflows a plain LONG term; the DECIMAL(38,0)
    // fold must still produce ewma == the flat level and flag the spike
    val flat = (1L to 50L).map(i => (1L, i, 10000000L))
    val spike = Seq((1L, 51L, 20000000L))
    val df = (flat ++ spike).toDF("k", "o", "cents")
    val r = Stats.ewmaAnomalies(df, "k", Seq("o"), "cents",
      window = 50, threshold = 1000000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq((1L, 51L, 10000000L, 10000000L)))
  }

  test("randomized response: md5-replayed reports exact, debias formula pinned") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = (1L to 40L).map(i => (i, "g", (i % 2).toInt))
    val expectedReported = rows.map { case (i, _, bit) =>
      val h = md5hex(s"s1:$i")
      val c1 = Integer.parseInt(h.substring(0, 1), 16)
      if (c1 < 8) bit else Integer.parseInt(h.substring(1, 2), 16) % 2
    }.sum.toLong
    val r = Governance.randomizedResponseCounts(
      rows.toDF("id", "grp", "bit"), "grp", "id", "bit", seed = "s1")
      .collect().head
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("yes_true") == 20L)
    assert(r.getAs[Long]("yes_reported") == expectedReported)
    assert(r.getAs[Long]("est_fp") == (4 * expectedReported - 40L) * 1000L / 2L)
    // a seed containing SQL metacharacters is plain data, not SQL
    val rq = Governance.randomizedResponseCounts(
      rows.toDF("id", "grp", "bit"), "grp", "id", "bit", seed = "it's; a' seed")
      .collect().head
    assert(rq.getAs[Long]("n") == 40L)
  }

  test("label propagation: dense blocks keep their labels, one bridge can't merge them") {
    // two 4-cliques bridged by a single edge — one connected COMPONENT,
    // but two COMMUNITIES: the neighbor-label mode outvotes the bridge.
    val cliqueA = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val cliqueB = for { a <- 5 to 8; b <- (a + 1) to 8 } yield (a.toLong, b.toLong)
    val edges = (cliqueA ++ cliqueB :+ (4L, 5L)).toDF("a", "b")
    val labels = Graphs.labelPropagation(edges, "a", "b", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 4L).forall(labels(_) == 1L))
    assert((5L to 8L).forall(labels(_) == 5L))
    // sanity: the same edge list is ONE connected component
    val cc = Dedup.connectedComponentsStarContraction(edges, "a", "b")
      .select("component").distinct().count()
    assert(cc == 1L)
  }

  test("graph-expanded ann: superset candidates never lose hits; one table expands nothing") {
    // fixed-seed random vectors — enough spread that buckets split real
    // neighborhoods (a lattice-structured fixture made buckets A and B
    // coincide and hid the expansion)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val r = Similarity.graphExpandedRecall(vecs, "vec_id", "embedding",
      probeMod = 20L, bits = 3, kGraph = 4, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.length == 6)
    // C0 ⊆ C1 and truth is the global top-k, so expansion can only add hits
    assert(r.forall { case (_, nb, ne, bh, eh) => ne >= nb && eh >= bh })
    // the second table must actually widen at least one probe's frontier
    assert(r.exists { case (_, nb, ne, _, _) => ne > nb })
    // NEGATIVE CONTROL: same seed for both tables = a one-table graph, and
    // a one-table graph's two-hop neighbourhood IS the bucket — expansion
    // must add exactly nothing (the failure mode an earlier cut had)
    val same = Similarity.graphExpandedRecall(vecs, "vec_id", "embedding",
      probeMod = 20L, bits = 3, kGraph = 4, k = 5,
      seed2 = Similarity.DefaultPlaneSeed)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(same.forall { case (nb, ne) => ne == nb })
  }

  test("acf: alternating series gives exact ±(n-k)/n ladder, constant series nulls") {
    val alt = (1L to 10L).map(i => ("alt", i, if (i % 2 == 0) 7L else -7L))
    val const = (1L to 10L).map(i => ("const", i, 5L))
    val r = Stats.acf((alt ++ const).toDF("g", "o", "x"), "g", Seq("o"), "x", maxLag = 3)
      .collect().map(x => ((x.getString(0), x.getInt(1)),
        if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    // S = 0: acf_k = ±(n−k)·10⁴ div n, sign (−1)^k
    assert(r(("alt", 1)) == Some(-9000L))
    assert(r(("alt", 2)) == Some(8000L))
    assert(r(("alt", 3)) == Some(-7000L))
    // zero variance → c0 = 0 → NULL, not a division blowup
    assert(Seq(1, 2, 3).forall(k => r(("const", k)).isEmpty))
  }

  test("trimmed mean: rank cuts drop exactly the wild rows, kept count in output") {
    val df = ((1L to 10L).map(v => ("g", v * 100L, v)) ++
      Seq(("g", 100000L, 11L), ("g", -100000L, 12L))).toDF("g", "cents", "id")
    val r = Stats.trimmedMean(df, "g", "cents", "id", trimPct = 10).collect().head
    // n=12, cut = floor(12·10/100) = 1 each side → both outliers gone
    assert(r.getAs[Long]("n_kept") == 10L)
    assert(r.getAs[Long]("trimmed_mean_fp") == 550000L) // mean 550 cents ×1000
  }

  test("rank normalize: bijection to basis points with tie-break, singleton maps to 0") {
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 20L, 3L), ("a", 30L, 4L),
      ("b", 99L, 5L)).toDF("g", "v", "id")
    val r = Stats.rankNormalize(df, "g", "v", "id")
      .collect().map(x => (x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(1L -> 0L, 2L -> 3333L, 3L -> 6666L, 4L -> 10000L, 5L -> 0L))
  }

  test("plan shape: partitioned snapshots get dynamic partition pruning on dim-filtered joins") {
    // the payoff partitioned snapshots buy at 100 TB: a join against a
    // selectively-filtered dim plans a runtime partition-pruning subquery
    // on the fact scan, so only the matching partition DIRECTORIES are
    // read — the fact side never lists, let alone scans, the rest
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    (0L until 20000L).map(i => (i, i % 20, i * 3 % 1000))
      .toDF("id", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // two disqualifiers found the hard way, both silent: (1) partition
    // directories read back as INT, so a BIGINT dim key inserts a cast on
    // the join key and the scan no longer qualifies; (2) an in-memory dim
    // gets its Filter constant-folded into the LocalRelation before the
    // PartitionPruning rule runs, leaving no "selective predicate" — the
    // dim must be a file source for the filter to survive to that batch
    val dimPath = java.nio.file.Files.createTempDirectory("dppdim").toString
    (0 until 20).map(i => (i, if (i < 2) "keep" else "drop"))
      .toDF("p", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("tag") === "keep"), Seq("p"))
      .groupBy("p").agg(sum("v").as("sv"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-partition-pruning subquery on the fact scan:\n$plan")
    assert(joined.collect().length == 2) // 2 of 20 partitions survive
  }

  test("readability: hand-counted flesch fixed point, degenerate docs null") {
    val df = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, ""),            // no words, no sentences -> NULL score
      (3L, "word word")    // words but no sentence marks -> NULL score
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text").orderBy("doc_id").collect()
    // 5 words, 2 sentence runs, 5 vowel groups:
    // 206835 - (1015*5) div 2 - (84600*5) div 5 = 206835 - 2537 - 84600
    assert(r(0).getAs[Long]("n_words") == 5L &&
      r(0).getAs[Long]("n_sentences") == 2L &&
      r(0).getAs[Long]("n_syllables") == 5L &&
      r(0).getAs[Long]("flesch_fp") == 119698L)
    assert(r(1).isNullAt(4) && r(2).isNullAt(4))
  }

  test("k-anonymity ladder: full-detail, generalized, and suppressed levels assigned exactly") {
    val rows =
      (1 to 6).map(i => ("en", "s1", i)) ++   // combo >= 5   -> level 0
      (1 to 3).map(i => ("en", "s2", i)) ++   // fails alone...
      (1 to 2).map(i => ("en", "s3", i)) ++   // ...but en-failing rows = 5 -> level 1
      (1 to 4).map(i => ("de", "s4", i))      // de-failing rows = 4 < 5    -> level 2
    val r = Governance.kAnonymityLevels(rows.toDF("lang", "source", "x"),
      "lang", "source", k = 5)
      .collect().map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getInt(3)))).toMap
    assert(r(("en", "s1")) == (6L, 0))
    assert(r(("en", "s2")) == (3L, 1))
    assert(r(("en", "s3")) == (2L, 1))
    assert(r(("de", "s4")) == (4L, 2))
  }

  test("column lineage: union merges positionally, window and explode trace their inputs") {
    import graft.tools.Lineage
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq((2L, "y")).toDF("id", "tag")
    // the true leaves of an in-memory tuple relation are _1/_2 — the
    // toDF renames are Projects ABOVE the LocalRelation, and the walker
    // reports leaves, not aliases
    val unioned = a.unionByName(b).select(col("id").as("uid"))
    assert(Lineage.columnLineage(unioned).toSet ==
      Set(("uid", "(inline)", "_1")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("tag").orderBy("id")
    val windowed = a.withColumn("rk", row_number().over(w))
      .select("rk")
    // row_number reads no value column, but its window references tag+id
    assert(Lineage.columnLineage(windowed).toSet ==
      Set(("rk", "(inline)", "_1"), ("rk", "(inline)", "_2")))
    val exploded = Seq((1L, "p q")).toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("tok"))
    assert(Lineage.columnLineage(exploded).toSet ==
      Set(("id", "(inline)", "_1"), ("tok", "(inline)", "_2")))
  }

  test("chapman-kolmogorov: deterministic cycle matches its square, period-2 chain exposed") {
    // perfect 3-cycle: first-order Markov, so model == empirical on every cell
    val cyc = (0 until 9).map(i => ("u", i.toLong, Seq("A", "B", "C")(i % 3)))
      .toDF("ent", "o", "s")
    val rc = Stats.markovChapmanKolmogorov(cyc, "ent", "s", Seq("o"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4)))
    assert(rc.nonEmpty && rc.forall(_._2 == 0L))
    // AABB-repeating chain: lag-1 says 50/50, lag-2 is deterministic —
    // the certificate must expose the hidden second-order memory
    val per2 = (0 until 9).map(i => ("u", i.toLong, Seq("A", "A", "B", "B")(i % 4)))
      .toDF("ent", "o", "s")
    val r2 = Stats.markovChapmanKolmogorov(per2, "ent", "s", Seq("o"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(r2(("A", "B")) == (500000L, 1000000L)) // model 1/2, reality always
    assert(r2(("A", "A")) == (500000L, 0L))
  }

  test("sliding windows: one event lands in exactly len/slide windows") {
    val df = Seq((java.sql.Timestamp.valueOf("2026-01-01 10:07:00"), 1L))
      .toDF("ts", "user_id")
    val r = df.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .count().collect()
    assert(r.length == 4 && r.forall(_.getLong(1) == 1L))
  }

  test("topo layers: longest-chain levels, diamond converges, cycle surfaces as -1") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L), // diamond: 5 waits for BOTH
      (10L, 11L), (11L, 10L), (11L, 12L)                // cycle + its hostage
    ).toDF("a", "b")
    val r = Graphs.topoLayers(edges, "a", "b", maxIters = 10)
      .collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(r(1L) == 0 && r(2L) == 1 && r(3L) == 2 && r(4L) == 2)
    assert(r(5L) == 3) // longest chain 1-2-3-5, not the short arm
    assert(r(10L) == -1 && r(11L) == -1 && r(12L) == -1) // cycle + downstream
  }

  test("topo layers: driver-hybrid Kahn path == distributed peel (r18 optimization)") {
    // same fixture shapes as the semantic tests: diamond + cycle + hostage,
    // plus an isolated 2-chain — the hybrid (driverThreshold default) and
    // the distributed loop (forced via driverThreshold = 0) must emit the
    // identical (node, level) set, including the cyclic -1 sentinel
    val edges = Seq(
      (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L),
      (10L, 11L), (11L, 10L), (11L, 12L),
      (20L, 21L)
    ).toDF("a", "b")
    def rows(threshold: Long) =
      Graphs.topoLayers(edges, "a", "b", maxIters = 10, driverThreshold = threshold)
        .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(rows(1000000L) == rows(0L))
    // the maxIters refusal fires identically on both paths
    val chain = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    Seq(1000000L, 0L).foreach { th =>
      val e = intercept[IllegalStateException] {
        Graphs.topoLayers(chain, "a", "b", maxIters = 3, driverThreshold = th).collect()
      }
      assert(e.getMessage.contains("deeper than maxIters"))
    }
  }

  test("topo layers: deep-but-acyclic chain past maxIters throws, never fakes a cycle") {
    val chain = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b") // depth 8 > budget 3
    val e = intercept[IllegalStateException] {
      Graphs.topoLayers(chain, "a", "b", maxIters = 3).collect()
    }
    assert(e.getMessage.contains("deeper than maxIters"))
    // a genuine cycle under the same budget still reports -1, no throw
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val r = Graphs.topoLayers(cyc, "a", "b", maxIters = 3)
      .collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(r(1L) == -1 && r(2L) == -1)
  }

  test("ndcg discount table matches floor(1e6/log2(i+1)) and its prefix sum") {
    val expected = (1 to 10).map(i => (1e6 / (math.log(i + 1) / math.log(2))).toLong)
    assert(graft.queries.ExtensionQueries.NdcgDisc == expected)
    assert(graft.queries.ExtensionQueries.NdcgPre == expected.scanLeft(0L)(_ + _).tail)
  }

  test("krippendorff alpha: NULL or out-of-domain rating fails loudly, not silently") {
    // a NULL rating NULLs the whole item's ones-count (the row would
    // silently vanish from every sum); a 2 would corrupt the binary
    // algebra without failing — both must raise, naming the domain
    val withNull = Seq((Some(1L), Some(1L)), (None, Some(0L))).toDF("a", "b")
    val e1 = intercept[Exception](
      Stats.krippendorffAlphaBinary(withNull, Seq("a", "b")).collect())
    assert(e1.getMessage.contains("non-null binary"), e1.getMessage)
    val outOfDomain = Seq((1L, 1L), (2L, 0L)).toDF("a", "b")
    val e2 = intercept[Exception](
      Stats.krippendorffAlphaBinary(outOfDomain, Seq("a", "b")).collect())
    assert(e2.getMessage.contains("non-null binary"), e2.getMessage)
    // in-domain data is untouched by the guard (golden from the main spec)
    val df2 = Seq((1L, 1L), (0L, 0L), (1L, 0L)).toDF("a", "b")
    assert(Stats.krippendorffAlphaBinary(df2, Seq("a", "b"))
      .collect().head.getAs[Long]("alpha_fp") == 444445L)
  }

  test("skyline: all-skyline anti-chain trips the survivor guard with the escape hint") {
    import graft.operators.Pareto
    // (i, i): every row strictly better on one axis, worse on the other —
    // nothing dominates anything, the staircase prunes zero rows, and the
    // single-task exact sweep would eat the whole input: the guard must
    // fire BEFORE the window executes
    val anti = (1L to 100L).map(i => (i, i)).toDF("cost", "good")
    val e = intercept[IllegalArgumentException](
      Pareto.skyline2D(anti, "cost", "good", bucketWidth = 1L, maxSurvivors = 10L).collect())
    assert(e.getMessage.contains("maxSurvivors") && e.getMessage.contains("bucketWidth"))
    // same data under the default cap: all 100 rows ARE the frontier
    assert(Pareto.skyline2D(anti, "cost", "good", bucketWidth = 1L).count() == 100L)
  }

  test("cdc chunks: supplementary-plane input stays code-point aligned end to end") {
    // plain-Scala reference of the boundary rule over CODE POINTS: base-31
    // polynomial of the k code points ending at 1-based position p,
    // boundary iff (poly % 1e9+7) % divisor == 0 — pins that Spark's
    // split('')+ascii+length+substring all speak code points (ADVICE r9
    // suspected a UTF-16 code-unit mismatch here; Spark 4 has none)
    val k = 8; val divisor = 8 // denser boundaries than the default 32
    def refChunks(text: String): Seq[(Long, Long, String)] = {
      val codes = text.codePoints().toArray
      val len = codes.length
      val bounds =
        if (len - 1 < k) Seq.empty[Int]
        else (k to len - 1).filter { p =>
          var h = 0L
          (p - k until p).foreach(j => h = h * 31L + codes(j))
          (h % 1000000007L) % divisor == 0
        }
      val bs = 0 +: bounds :+ len
      val md = java.security.MessageDigest.getInstance("MD5")
      bs.sliding(2).collect { case Seq(a, b) =>
        val s0 = text.offsetByCodePoints(0, a)
        val e0 = text.offsetByCodePoints(s0, b - a)
        md.reset()
        val h = md.digest(text.substring(s0, e0).getBytes("UTF-8"))
          .map(x => f"${x & 0xff}%02x").mkString
        (a.toLong, (b - a).toLong, h)
      }.toSeq
    }
    val supp = Array(0x1D54F, 0x1F600, 0x10348, 0x1D11E) // 4 supplementary-plane cps
    var s = 98765L
    val text = (1 to 300).map { i =>
      s = (s * 1103515245L + 12345L) & 0x7fffffffL
      if (i % 5 == 0) new String(Character.toChars(supp((s % 4).toInt)))
      else ('a' + (s % 26).toInt).toChar.toString
    }.mkString
    assert(text.length > text.codePointCount(0, text.length), "fixture must contain surrogate pairs")
    val got = Dedup.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = k, divisor = divisor)
      .orderBy("chunk_idx")
      .select("start_pos", "chunk_len", "chunk_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = refChunks(text)
    assert(want.size >= 4, s"fixture should produce several chunks, got ${want.size}")
    assert(got == want)
  }

  test("blocklist: unigram/bigram hits, case-insensitive, trailing pair inert, 3-token phrase refused") {
    val d = Seq(
      (1L, "Fast BADGER runs fast"),      // 'fast' twice (case-folded), no bigram
      (2L, "a red fox and a red herring"), // bigram 'red fox' once; 'red herring' also listed
      (3L, "clean text only"),
      (4L, ""),                            // empty: zero everything
      (5L, "fox")                          // single token: bigram list must not NPE on the padded pair
    ).toDF("doc_id", "text")
    val r = TextAnalysis.blocklistHits(d, "doc_id", "text",
        Seq("fast", "red fox", "red herring"))
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r(0) == ((1L, 2L, 0L, 1L)))
    assert(r(1) == ((2L, 0L, 2L, 1L)))
    assert(r(2) == ((3L, 0L, 0L, 0L)))
    assert(r(3) == ((4L, 0L, 0L, 0L)))
    assert(r(4) == ((5L, 0L, 0L, 0L)))
    assertThrows[IllegalArgumentException](
      TextAnalysis.blocklistHits(d, "doc_id", "text", Seq("one two three")))
    assertThrows[IllegalArgumentException](
      TextAnalysis.blocklistHits(d, "doc_id", "text", Seq("   ")))
    // review findings (r14): stray whitespace normalizes instead of going
    // silently inert ("fast " is a unigram, "red\tfox" a bigram), and a
    // phrase with a quote/backslash survives the SQL literal boundary
    val d2 = Seq((1L, "don't stop fast"), (2L, "a red fox")).toDF("doc_id", "text")
    val r2 = TextAnalysis.blocklistHits(d2, "doc_id", "text",
        Seq(" fast ", "red\tfox", "don't"))
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r2(0) == ((1L, 2L, 0L, 1L))) // 'fast' + escaped "don't"
    assert(r2(1) == ((2L, 0L, 1L, 1L))) // tab-separated pair matched as bigram
    // r14 advice: non-ASCII phrases fold through the ENGINE's lower(), so
    // phrase-side and document-side case mappings agree by construction
    // ('İ'/'ẞ' were silently inert when the JVM folded the phrase side).
    val turkishI = new String(Character.toChars(0x130)) // 'İ'
    val capSharpS = new String(Character.toChars(0x1E9E)) // 'ẞ'
    val d3 = Seq((1L, s"ein ${capSharpS}trase text"), (2L, s"word $turkishI here"))
      .toDF("doc_id", "text")
    val r3 = TextAnalysis.blocklistHits(d3, "doc_id", "text",
        Seq(s"${capSharpS}trase", turkishI))
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
    assert(r3(0) == ((1L, 1L, 1L)))
    assert(r3(1) == ((2L, 1L, 1L)))
  }

  test("char entropy halfbits: run-length HOF fold equals the histogram definition, constant text scores zero") {
    val d = Seq(
      (1L, "zzzz"),       // constant: entropy exactly 0
      (2L, "aab ba x"),   // runs (sorted): ' 'x2, a x3, b x2, x x1
      (3L, ""),           // empty: all zeros, no div-by-zero
      (4L, "ab")          // two singletons: numer = 2*hb(2) = 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropyHalfBits(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_cp", "sum_chb", "ent_numer_hb", "ent_halfbits")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // hb(n) = floor(2*log2 n): hb(2)=2, hb(3)=3, hb(4)=4, hb(8)=6
    assert(r(0) == ((4L, 16L, 0L, 0L)))          // 4*hb(4) - 4*hb(4)
    assert(r(1) == ((8L, 17L, 31L, 3L)))         // 8*6 - (2*2 + 3*3 + 2*2 + 0)
    assert(r(2) == ((0L, 0L, 0L, 0L)))
    assert(r(3) == ((2L, 0L, 4L, 2L)))
    // the half-bit floor approximation stays within 1 bit of true Shannon
    // entropy on the mixed fixture: true H("aab ba x") = 1.906 bits/char,
    // halfbit score 3 => 1.5 bits/char
    val trueH = {
      val cs = "aab ba x".groupBy(identity).map(_._2.length.toDouble)
      val n = cs.sum
      cs.map(c => -c / n * math.log(c / n) / math.log(2)).sum
    }
    assert(math.abs(trueH - r(1)._4 / 2.0) <= 1.0)
  }

  test("canary leakage: cross-split canaries flag, single-split stay clean, canary-free docs vanish") {
    val d = Seq(
      (1L, "plain text CANARY-7 more", "train"),
      (2L, "CANARY-7 appears again", "test"),     // leaks train+test
      (3L, "only CANARY-9 here", "train"),
      (4L, "CANARY-9 again same split", "train"), // two docs, ONE split: clean
      (5L, "no markers at all", "val"),
      (6L, "two CANARY-7 CANARY-7 in one doc", "train") // distinct doc counted once
    ).toDF("doc_id", "text", "split")
    val r = TextAnalysis.canaryLeakage(d, "doc_id", "text", "split", "CANARY-[0-9]+")
      .orderBy("canary").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getString(3), x.getLong(4)))
    assert(r.length == 2) // doc 5 contributes nothing
    assert(r(0) == (("CANARY-7", 3L, 2L, "test,train", 1L)))
    assert(r(1) == (("CANARY-9", 2L, 1L, "train", 0L)))
  }

  test("cross-source dup matrix: shared texts count per source pair, multiplicity multiplies") {
    val d = Seq(
      (1L, "shared alpha", "A"), (2L, "shared alpha", "B"), (3L, "shared alpha", "B"),
      (4L, "shared beta", "A"), (5L, "shared beta", "C"),
      (6L, "only in a", "A"), (7L, "only in c", "C")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.crossSourceDupMatrix(d, "text", "source")
      .orderBy("src_a", "src_b").collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // alpha: A has 1 copy, B has 2 -> 1 shared text, 1*2 cross pairs
    assert(r(("A", "B")) == ((1L, 2L, 1L, 2L)))
    assert(r(("A", "C")) == ((1L, 1L, 1L, 1L)))
    assert(!r.contains(("B", "C"))) // no text shared between B and C
  }

  test("vocab coverage: boundary-frequency remainder is the minimal vocab, exact masses") {
    // freqs: 'x' 6, 'y' 3, 'z' 3, 'w' 2, 'v' 1  -> total 15
    val d = Seq((1L, "x x x y y z w v"), (2L, "x x x y z z w")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(d, "text", targetsBp = Seq(4000, 8000, 10000))
      .orderBy("target_bp").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // 40%: need 6 -> 'x' alone (freq 6) covers exactly
    assert(r(0) == ((4000L, 1L, 6L, 15L, 6L)))
    // 80%: need 12 -> x(6) + BOTH freq-3 types (y,z) = 12 exactly
    assert(r(1) == ((8000L, 3L, 12L, 15L, 3L)))
    // 100%: need 15 -> all five types, boundary frequency 1
    assert(r(2) == ((10000L, 5L, 15L, 15L, 1L)))
  }

  test("lsh recall certificate: planted near-dups are found by both paths, counts reconcile") {
    // 3-gram-overlapping pairs (i, i+1) for even i; odd-even distant docs disjoint
    val d = (0L until 20L).map { i =>
      val base = i - i % 2
      (i, s"block$base token$base alpha$base beta$base gamma$base " +
        (if (i % 2 == 0) "even tail here" else "even tail here too"))
    }.toDF("doc_id", "text")
    val r = Dedup.lshRecallCertificate(d, "doc_id", "text", minJaccardPct = 50).head()
    val (ex, lsh, common, lshOnly, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(ex == 10L)              // the ten planted (even, odd) pairs
    assert(common <= math.min(ex, lsh))
    assert(lshOnly == lsh - common)
    assert(recall == common * 1000 / ex)
    assert(recall >= 500)          // 8 hashes x 4 bands on ~0.6-Jaccard pairs
  }

  test("margin mining: the hub loses to the true pair, threshold matches the unshifted criterion") {
    // a0's true partner is b0 (identical direction); b9 is a HUB equidistant
    // from everything — raw cosine ties/ranks it high, margin demotes it.
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    val a = Seq(
      (0L, v(1, 0, 0)), (1L, v(0, 1, 0)), (2L, v(0, 0, 1))
    ).toDF("vec_id", "embedding")
    val b = Seq(
      (10L, v(0.9, 0.1, 0)),   // near-parallel to a0
      (11L, v(0.1, 0.9, 0)),   // near-parallel to a1
      (19L, v(0.58, 0.58, 0.58)) // hub: cos ~0.577 to every axis
    ).toDF("vec_id", "embedding")
    val r = Similarity.marginBitextPairs(a, b, "vec_id", "embedding", k = 2,
        minMarginX1k = 0L)
      .orderBy("a_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(r(0)._2 == 10L) // not the hub
    assert(r(1)._2 == 11L)
    assert(r(2)._2 == 19L) // a2 has no axis partner; hub is genuinely best
    // threshold semantics: margin >= 1000 iff 2*s >= ceil-free avg sums —
    // verify against a JVM recomputation from the quantized cosines
    val pairs = for {
      (aid, av) <- Seq((0L, v(1, 0, 0)), (1L, v(0, 1, 0)), (2L, v(0, 0, 1)))
      (bid, bv) <- Seq((10L, v(0.9, 0.1, 0)), (11L, v(0.1, 0.9, 0)), (19L, v(0.58, 0.58, 0.58)))
    } yield {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 3) {
        dot += av(i).toDouble * bv(i).toDouble
        na += av(i).toDouble * av(i).toDouble; nb += bv(i).toDouble * bv(i).toDouble
      }
      (aid, bid,
        math.max(math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong + 1000000L, 0L))
    }
    def topk(xs: Seq[Long]) = xs.sorted(Ordering[Long].reverse).take(2)
    for ((aid, bid, s) <- pairs) {
      val sa = topk(pairs.filter(_._1 == aid).map(_._3)).sum
      val ka = math.min(2, pairs.count(_._1 == aid)).toLong
      val sb = topk(pairs.filter(_._2 == bid).map(_._3)).sum
      val kb = math.min(2, pairs.count(_._2 == bid)).toLong
      val expect = 2000L * s * ka * kb / (sa * kb + sb * ka)
      val got = r.find(p => p._1 == aid && p._2 == bid)
      got.foreach(g => assert(g._4 == expect, s"margin mismatch for ($aid,$bid)"))
    }
  }

  test("canary leakage: regex metacharacters survive — backslash classes and quotes reach the matcher verbatim") {
    // r15b self-review finding: the pattern used to be spliced into SQL
    // text, where '\\d' unescaped to a literal 'd' and a quote broke the
    // parse — the release gate then reported zero leaks and PASSED falsely
    val d = Seq((1L, raw"id GUID-42 here", "train"), (2L, raw"GUID-42 again", "test"),
      (3L, "don't match 'quoted'", "val")).toDF("doc_id", "text", "split")
    val r = TextAnalysis.canaryLeakage(d, "doc_id", "text", "split", raw"GUID-\d+")
      .collect().map(x => (x.getString(0), x.getLong(4)))
    assert(r.toSeq == Seq(("GUID-42", 1L))) // \d matched digits, leak flagged
    val q = TextAnalysis.canaryLeakage(d, "doc_id", "text", "split", "'[a-z]+'")
      .collect().map(_.getString(0))
    assert(q.toSeq == Seq("'quoted'")) // quotes don't break anything
  }

  test("vocab coverage: token-free corpus yields zero rows without throwing (documented contract)") {
    val d = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(TextAnalysis.vocabCoverage(d, "text").count() == 0L)
  }

  test("margin mining: exact antiparallel float pairs clamp at shifted zero instead of breaking div parity") {
    // cos computes to -1 - epsilon through sqrt rounding on this pair; the
    // unclamped floor would land at shifted -1 (r15b self-review finding)
    val a = Seq((0L, Array(1f, 2f, 0f))).toDF("vec_id", "embedding")
    val b = Seq((10L, Array(-2f, -4f, 0f)), (11L, Array(1f, 2f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.marginBitextPairs(a, b, "vec_id", "embedding", k = 2,
        minMarginX1k = 0L)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length == 1)
    assert(r(0)._1 == 11L)            // the parallel twin wins
    // the antiparallel cosine clamps to shifted 0, so a0's neighborhood
    // sum is s11 + 0 with ka=2 and b11's is s11 with kb=1: margin =
    // 2000·s11·2·1 / (s11·1 + s11·2) = 4000/3 = 1333 for ANY s11 > 0 —
    // the clamp, not the parallel pair's exact rounding, fixes the value
    assert(r(0)._3 == 1333L)
    assert(r(0)._2 >= 999999L)        // cos of the identical-direction pair
  }

  test("blocked bitext mining: block-local margins, certificate prices recall and scored mass") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // two orthogonal clusters; a_ids 0 and 1 sit in different clusters so
    // the deterministic smallest-id seeding starts one centroid in each
    val a = Seq(
      (0L, v(1, 0.05, 0)), (1L, v(0, 0.05, 1)),
      (2L, v(1, 0.10, 0)), (3L, v(0, 0.10, 1)),
      (4L, v(1, 0.15, 0)), (5L, v(0, 0.15, 1))).toDF("vec_id", "embedding")
    val b = Seq(
      (20L, v(1, 0.08, 0)), (21L, v(0, 0.08, 1)),
      (22L, v(1, 0.12, 0)), (23L, v(0, 0.12, 1))).toDF("vec_id", "embedding")
    val full = Similarity.marginBitextPairs(a, b, "vec_id", "embedding",
        k = 3, minMarginX1k = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.marginBitextPairsBlocked(a, b, "vec_id", "embedding",
        k = 3, minMarginX1k = 0L, nlist = 2, kmeansIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // orthogonal clusters: every mined partner is within-cluster, so
    // blocking loses nothing here — and the certificate must SAY so
    assert(blocked == full)
    val cert = Similarity.marginBitextBlockedCertificate(a, b, "vec_id", "embedding",
      k = 3, minMarginX1k = 0L, nlist = 2, kmeansIters = 1).head()
    assert(cert.getAs[Long]("n_full") == full.size.toLong)
    assert(cert.getAs[Long]("n_blocked") == blocked.size.toLong)
    assert(cert.getAs[Long]("n_common") == full.size.toLong)
    assert(cert.getAs[Long]("recall_x1000") == 1000L)
    // the mass saving that paid for it: 6*4 = 24 full vs 3*2 + 3*2 = 12
    assert(cert.getAs[Long]("scored_full") == 24L)
    assert(cert.getAs[Long]("scored_blocked") == 12L)
  }

  test("native blocklist: equals the array-scan path on unicode folds, quotes, duplicates and adjacency") {
    val turkishI = new String(Character.toChars(0x130))   // 'İ'
    val capSharpS = new String(Character.toChars(0x1E9E)) // 'ẞ'
    val d = Seq(
      (1L, s"ein ${capSharpS}trase text don't stop"),
      (2L, s"word $turkishI here don't don't"),           // duplicate phrase counts twice
      (3L, "  leading space table hash pair"),            // empty token must not break adjacency
      (4L, raw"a back\slash token")
    ).toDF("doc_id", "text")
    val phrases = Seq(s"${capSharpS}trase", turkishI, "don't", raw"back\slash",
      "table hash", "space table")
    val small = TextAnalysis.blocklistHits(d, "doc_id", "text", phrases)
      .orderBy("doc_id").collect().map(_.toSeq)
    val large = TextAnalysis.blocklistHitsLarge(d, "doc_id", "text", phrases)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(small.toSeq == large.toSeq)
    // and the values are the expected ones, not just mutually wrong
    assert(large(1) == Seq(2L, 3L, 0L, 1L)) // 'İ' folded + don't twice
    assert(large(2) == Seq(3L, 0L, 2L, 1L)) // both bigrams straddle the space
  }

  test("lsh params derived from the threshold: q308 pick, and recall holds at two thresholds") {
    // hand-checked S-curve picks over the 8-hash signature
    assert(Dedup.lshParamsForThreshold(50) == (4, 2)) // reproduces today's default at the old midpoint
    assert(Dedup.lshParamsForThreshold(20) == (8, 1)) // low threshold -> wide-recall banding
    assert(Dedup.lshParamsForThreshold(85) == (1, 8)) // high threshold -> the precise single band
    // bands never increase as the threshold rises (the S-curve midpoint
    // (1/b)^(1/r) is monotone in the split)
    val bandPicks = (1 to 100).map(p => Dedup.lshParamsForThreshold(p)._1)
    assert(bandPicks.zip(bandPicks.tail).forall { case (hi, lo) => hi >= lo })

    // planted fixture: 30 bases (16 LCG words), an A-twin at J=0.4 (last 6
    // words replaced; 8 of 20 distinct trigrams shared) and a B-twin at
    // J=0.75 (last 2 words replaced; 12 of 16 shared)
    val docs = (0 until 30).flatMap { i =>
      def w(j: Int) = s"v${(i * 37 + j * 13) % 997}"
      val base = (0 until 16).map(w)
      val twinA = base.take(10) ++ (0 until 6).map(j => s"ua${i}x$j")
      val twinB = base.take(14) ++ (0 until 2).map(j => s"ub${i}x$j")
      Seq((i.toLong, base.mkString(" ")),
        (i + 1000L, twinA.mkString(" ")),
        (i + 2000L, twinB.mkString(" ")))
    }.toDF("doc_id", "text")
    def recall(pct: Int, bands: Int, rows: Int): Long =
      Dedup.lshRecallCertificate(docs, "doc_id", "text", pct,
        numHashes = bands * rows, bandSize = rows).head().getAs[Long]("recall_x1000")
    for (pct <- Seq(20, 50)) {
      val (b, r) = Dedup.lshParamsForThreshold(pct)
      // measured 980 (pct 20) / 941 (pct 50) on this fixture — the bound
      // is the contract ("recall holds"), the measurements are golden
      assert(recall(pct, b, r) >= 900L, s"derived banding at pct=$pct")
    }
    // and at the low threshold the derivation is load-bearing: the old
    // fixed 4x2 misses a large share of genuine J=0.4 pairs that no
    // verify-before-drop could restore
    val fixedAt20 = recall(20, 4, 2)
    val derivedAt20 = recall(20, 8, 1)
    assert(derivedAt20 >= fixedAt20 + 100L,
      s"derived $derivedAt20 vs fixed $fixedAt20 at pct=20")

    // the gated q360 curve and the driver-side function the CLI calls are
    // the same algebra: every picked split matches the pure function
    val picked = SparkEntry.queries("q360_lsh_params")(spark, "unused")
      .filter(col("pick") === 1L).collect()
      .map(r => r.getAs[Long]("pct") -> ((r.getAs[Int]("b"), r.getAs[Int]("r")))).toMap
    assert(picked == Map(30L -> ((4, 2)), 50L -> ((4, 2)), 70L -> ((2, 4)), 85L -> ((1, 8))))
    picked.foreach { case (pct, br) =>
      assert(Dedup.lshParamsForThreshold(pct.toInt) == br, s"pct=$pct")
    }
  }

  test("corpus epoch diff: per-source added/removed/changed/token-delta, hand-checked") {
    val base = Seq((1L, "a b c", "A"), (2L, "d e", "A"), (3L, "f g h i", "B"))
      .toDF("doc_id", "text", "source")
    val head = Seq((1L, "a b c", "A"), (2L, "d e x", "A"), (4L, "new words", "B"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.corpusEpochDiff(base, head, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    // A: doc 1 unchanged, doc 2 changed (+1 token); B: doc 3 removed
    // (-4 tokens), doc 4 added (+2 tokens)
    assert(r.toSeq == Seq(
      ("A", 2L, 2L, 0L, 0L, 1L, 1L, 1L),
      ("B", 1L, 1L, 1L, 1L, 0L, 0L, -2L)), r.toSeq.toString)
  }

  test("source divergence: a template feed stands out, a corpus-mix feed sits near zero") {
    import graft.operators.Dsir
    // source A and B share the corpus's mixed vocabulary; source C is a
    // single-template feed (one token repeated)
    val d = Seq(
      (1L, "alpha beta gamma delta", "A"), (2L, "beta gamma delta alpha", "A"),
      (3L, "alpha beta gamma delta", "B"), (4L, "delta gamma beta alpha", "B"),
      (5L, "spam spam spam spam", "C"), (6L, "spam spam spam spam", "C")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceDivergence(d, "text", "source")
      .collect().map(x => x.getString(0) ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("distinct_tokens"), x.getAs[Long]("kl_x1000")))).toMap
    assert(r("A")._1 == 8L && r("A")._2 == 4L)
    assert(r("C")._1 == 8L && r("C")._2 == 1L)
    // the template feed diverges far beyond the mixed feeds
    assert(r("C")._3 > r("A")._3 + 1000L, s"$r")
    assert(r("A")._3 == r("B")._3) // identical distributions score identically
    // JVM replay of the integer formula for source C: c=8 spam tokens,
    // corpus spam count 8, Ns=8, N=24
    def ql(n: Long) = (BigInt(n) * BigInt(n)).bitLength - 1L
    val numerC = 8L * (ql(8) + ql(24) - ql(8) - ql(8))
    assert(r("C")._3 == (numerC + 4 * 8) * 1000 / 8 - 4000)
  }

  test("score calibration: equal-count buckets, exact rates, monotone for a separating score") {
    // 10 docs, score = doc id, label = top half — a perfectly separating
    // scorer must show 0 bp in the bottom bucket and 10000 in the top
    val d = (1L to 10L).map(i => (i, i * 100L, i > 5L)).toDF("id", "score", "y")
    val r = TextAnalysis.scoreCalibration(d, "id", "score", col("y"), nBuckets = 2)
      .orderBy("bucket").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_docs") == 5L && r(1).getAs[Long]("n_docs") == 5L)
    assert(r(0).getAs[Long]("min_score") == 100L && r(0).getAs[Long]("max_score") == 500L)
    assert(r(0).getAs[Long]("pos_bp") == 0L && r(1).getAs[Long]("pos_bp") == 10000L)
    // uneven split: 10 docs into 3 buckets -> sizes 4/3/3 (rank algebra)
    val r3 = TextAnalysis.scoreCalibration(d, "id", "score", col("y"), nBuckets = 3)
      .orderBy("bucket").collect().map(_.getAs[Long]("n_docs")).toSeq
    assert(r3 == Seq(4L, 3L, 3L), s"$r3")
  }

  test("token_set_hits expressions built from the same phrase lists canonicalize together") {
    import graft.functions.TokenSetHits
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    // structural equality over the phrase seqs (not the matcher object) is
    // what keeps CSE / plan caching / exchange reuse alive when the same
    // screen appears twice in a plan (r16, per advice)
    val ref = BoundReference(0, StringType, nullable = true)
    val e1 = TokenSetHits(ref, Seq("a", "b"), Seq("a b"))
    val e2 = TokenSetHits(ref, Seq("a", "b"), Seq("a b"))
    assert(e1 == e2)
    assert(e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    assert(e1.canonicalized == e2.canonicalized)
    val e3 = TokenSetHits(ref, Seq("a", "c"), Seq("a b"))
    assert(e1 != e3 && !e1.semanticEquals(e3))
    // and the deduplicated expression still evaluates correctly
    // tokens a,b,a: three unigram hits (a twice + b), one bigram ("a b")
    val r = e1.eval(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b a")))
    assert(r == ((3L << 32) | 1L))
  }

  test("simhash pairs: banded join finds every pair a brute-force hamming scan finds (pigeonhole recall)") {
    val d = (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++
      Seq((10L, "the cat sat on the mat today"), (11L, "words entirely different here")))
      .toDF("doc_id", "text")
    val hs = Dedup.simHash64(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    val banded = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute) // complete AND nothing extra (cap non-binding)
    assert(brute.contains((1L, 2L, 0L))) // the exact dups are in there
    // the operator refuses bounds the banding cannot guarantee
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 4)
    }
  }

  test("simhash64 widens simhash: top 32 bits replay the 32-bit fingerprint bit-for-bit") {
    // the first 8 md5 hex digits drive BOTH simHash and simHash64's bits
    // 0..31, so the wide hash's top word must equal the narrow hash — the
    // two fingerprints are one family, not two algorithms
    val h32 = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h64 = Dedup.simHash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h32.keySet == h64.keySet)
    h32.foreach { case (id, h) => assert((h64(id) >>> 32) == h, s"doc $id") }
  }

  test("simhash cap report prices exactly the postings a binding cap drops from the pair join") {
    val free = Dedup.simHashCapReport(docs, "doc_id", "text", maxBucketSize = 500).head()
    assert(free.getAs[Long]("n_postings") == 4L * docs.count())
    assert(free.getAs[Long]("n_capped_buckets") == 0L)
    assert(free.getAs[Long]("n_foregone_postings") == 0L)
    // force the cap to bind: every doc identical text → all 4 buckets hold
    // all 30 postings; cap 2 keeps 2 per bucket
    val same = (0L until 30L).map(i => (i, "same words every doc")).toDF("doc_id", "text")
    val bound = Dedup.simHashCapReport(same, "doc_id", "text", maxBucketSize = 2).head()
    assert(bound.getAs[Long]("n_buckets") == 4L)
    assert(bound.getAs[Long]("n_capped_buckets") == 4L)
    assert(bound.getAs[Long]("n_foregone_postings") == 4L * (30L - 2L))
    // and the capped join keeps only the survivors' pair (ids 0 and 1)
    val pairs = Dedup.simHashPairs(same, "doc_id", "text", maxBucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("mutual margin mining is the forward-backward intersection of the one-directional output") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // b20 is the best match of BOTH a0 and a1; mutuality keeps it only for
    // the one whose margin wins the backward direction
    val a = Seq((0L, v(1, 0.1, 0)), (1L, v(1, 0.3, 0)), (2L, v(0, 0, 1)))
      .toDF("vec_id", "embedding")
    val b = Seq((20L, v(1, 0.2, 0)), (21L, v(0, 0.1, 1))).toDF("vec_id", "embedding")
    val fwd = Similarity.marginBitextPairs(a, b, "vec_id", "embedding", k = 2, minMarginX1k = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val mut = Similarity.marginBitextPairs(a, b, "vec_id", "embedding", k = 2, minMarginX1k = 0L,
        mutual = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(mut.subsetOf(fwd))
    // every a had a forward best; contested b20 must appear at most once
    assert(fwd.size == 3)
    assert(mut.count(_._2 == 20L) <= 1)
    // necessary condition for mutuality: no other forward winner beats a
    // mutual pair on its own b (the operator ranks over ALL scored pairs)
    mut.foreach { case (aid, bid, m) =>
      assert(!fwd.exists(p => p._2 == bid && p._1 != aid && p._3 > m))
    }
  }

  test("filter order advisor: greedy rejected-per-cost ranking, exact basis points, contract checks") {
    val d = Seq((1L, "en", 10L), (2L, "en", 100L), (3L, "de", 100L), (4L, "fr", 100L))
      .toDF("id", "lang", "n")
    val r = TextAnalysis.filterOrderAdvisor(d, Seq(
        ("cheap_half", col("lang") === "en", 1L),     // passes 2/4 -> drop 5000/1
        ("pricey_most", col("n") >= 100L, 100L),      // passes 3/4 -> drop 2500/100
        ("mid", col("n") >= 1000L, 10L)               // passes 0/4 -> drop 10000/10
      )).orderBy("position").collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("cheap_half", 5000L, 5000000L, 1L),
      ("mid", 0L, 1000000L, 2L),
      ("pricey_most", 7500L, 25000L, 3L)))
    // empty corpus: pass_bp 10000 by convention, no division error
    val e = TextAnalysis.filterOrderAdvisor(d.filter(col("n") < 0),
        Seq(("any", col("n") > 0, 1L))).collect()
    assert(e.length == 1 && e(0).getLong(2) == 10000L)
    intercept[IllegalArgumentException] {
      TextAnalysis.filterOrderAdvisor(d, Seq(("a", col("n") > 0, 0L)))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.filterOrderAdvisor(d, Seq(("a", col("n") > 0, 1L), ("a", col("n") > 1, 2L)))
    }
  }

  test("vocab coverage from maintained histograms equals the direct computation") {
    val d = Seq((1L, "x x x y y z w v"), (2L, "x x x y z z w")).toDF("doc_id", "text")
    def hist(side: org.apache.spark.sql.DataFrame) =
      side.select(explode(TextAnalysis.tokens("text")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
    val merged = hist(d.filter(col("doc_id") === 1L))
      .unionByName(hist(d.filter(col("doc_id") === 2L)))
      .groupBy("t").agg(sum(col("c")).as("c"))
    val m = TextAnalysis.vocabCoverageFromCounts(merged, "t", "c", Seq(4000, 8000, 10000))
      .orderBy("target_bp").collect().map(_.toSeq)
    val full = TextAnalysis.vocabCoverage(d, "text", Seq(4000, 8000, 10000))
      .orderBy("target_bp").collect().map(_.toSeq)
    assert(m.toSeq == full.toSeq)
  }

  test("boundary overlap: recovers planted pagination, caps boilerplate, never pairs a doc with itself") {
    val d = Seq(
      (1L, "a b c d e X1 X2 X3 X4 X5"),     // tail = X1..X5
      (2L, "X1 X2 X3 X4 X5 f g h"),         // head = X1..X5 -> (1, 2)
      (3L, "short doc"),                    // < k tokens: dropped
      (4L, "p q r s t u v w y z")           // no overlap with anything
    ).toDF("doc_id", "text")
    val r = Dedup.boundaryOverlapPairs(d, "doc_id", "text", k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSeq == Seq((1L, 2L, "X1 X2 X3 X4 X5")))
    // boilerplate cap: 30 docs ending AND starting with one shared header
    // would be 30x30 pairs; cap 3 bounds each side
    val boiler = (1L to 30L).map(i =>
      (i, s"H1 H2 H3 H4 H5 body$i tail$i H1 H2 H3 H4 H5")).toDF("doc_id", "text")
    val capped = Dedup.boundaryOverlapPairs(boiler, "doc_id", "text", k = 5, maxBucket = 3)
    assert(capped.count() == 6L) // 3 tails x 3 heads minus the 3 self-pairs
  }

  test("token set hits is callable from SQL (foldable CreateArray children), rejects null phrases") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("tsh_docs")
    val r = spark.sql(
      "SELECT doc_id, graft_token_set_hits(text, array('cat', 'mat'), array('the mat')) AS p " +
        "FROM tsh_docs ORDER BY doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1) >> 32, x.getLong(1) & 0xFFFFFFFFL))
    assert(r(0) == ((1L, 2L, 1L))) // cat + mat, 'the mat' once
    intercept[Exception] {
      spark.sql("SELECT graft_token_set_hits(text, array('a', CAST(NULL AS STRING)), array()) FROM tsh_docs")
        .collect()
    }
  }

  test("vocab coverage from counts: zero-count tombstones are outside the vocabulary") {
    val withTombstones = Seq(("x", 6L), ("y", 3L), ("gone", 0L), ("neg", -2L))
      .toDF("t", "c")
    val clean = Seq(("x", 6L), ("y", 3L)).toDF("t", "c")
    val a = TextAnalysis.vocabCoverageFromCounts(withTombstones, "t", "c", Seq(9000))
      .collect().map(_.toSeq)
    val b = TextAnalysis.vocabCoverageFromCounts(clean, "t", "c", Seq(9000))
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("dedup savings: min-id keeper accounting per source, token-exact basis points") {
    val d = Seq(
      (1L, "A", "one two three"),       // keeper of the 3-copy group (3 tokens)
      (2L, "A", "one two three"),
      (3L, "B", "one two three"),
      (4L, "B", "unique four tokens here"), // keeper, 4 tokens
      (5L, "C", "")                     // zero tokens: saved_bp guard
    ).toDF("doc_id", "source", "text")
    val r = Dedup.dedupSavings(d, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
    // A: 2 docs, 1 kept, 6 tokens -> 3 kept -> 5000 bp saved
    assert(r(0) == (("A", 2L, 1L, 6L, 3L, 5000L)))
    // B: doc 3 is a dup of A's keeper (cross-source), doc 4 unique
    assert(r(1) == (("B", 2L, 1L, 7L, 4L, 4285L)))
    // C: empty doc, no division error
    assert(r(2) == (("C", 1L, 1L, 0L, 0L, 0L)))
  }
}
