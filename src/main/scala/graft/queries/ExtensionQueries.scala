package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators._

/** LLM-data-pipeline extension operators (BASELINE.json north star, SURVEY
  * §2.9) as driver-checkable queries: dedup (exact / MinHash-LSH / SimHash /
  * Jaccard / levenshtein), similarity search (brute-force + LSH ANN + kNN
  * join), text analysis (tokens / quality / lang-ID / fingerprint), and
  * multimodal binary plumbing. Oracles replicate the exact algorithm in
  * DuckDB SQL (md5-based hashing is engine-portable; integer/decimal outputs
  * pin renderings). */
object ExtensionQueries {

  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "key", "row"),
    "de" -> Seq("table", "value", "fast"),
    "fr" -> Seq("data", "query", "scan"),
    "es" -> Seq("batch", "window", "join"),
    "zh" -> Seq("spark", "merge", "stream")
  )

  private val stopwords = TextAnalysis.DefaultStopwords

  /** nDCG@10 discount table, ×10⁶ fixed point: floor(10⁶ / log₂(i+1)) for
    * rank i = 1..10 — pinned as integer literals so BOTH engines share the
    * exact values and no transcendental evaluates at query time (the spec
    * re-derives them from math.log). `NdcgPre` is its prefix sum (the
    * binary-relevance ideal DCG at min(R, 10)). */
  private[graft] val NdcgDisc = Seq(1000000L, 630929L, 500000L, 430676L,
    386852L, 356207L, 333333L, 315464L, 301029L, 289064L)
  private[graft] val NdcgPre = NdcgDisc.scanLeft(0L)(_ + _).tail

  // ---- shared DuckDB SQL fragments -------------------------------------

  private val duckToks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  private def duckMarkerScore(ws: Seq[String]): String =
    s"len(list_filter($duckToks, x -> list_contains(${ws.map(w => s"'$w'").mkString("[", ", ", "]")}, x)))"

  /** DuckDB CTE producing the MinHash-LSH candidate pairs (shared by q32 and
    * the clusters oracle). q236 rebinds it over a planted-bridge corpus via
    * [[duckMinhashPairsSqlOver]]. */
  private def duckMinhashPairsSqlOver(table: String): String =
    duckMinhashPairsSql.replace("FROM documents)", s"FROM $table)")

  /** The signature/band CTE prefix of [[duckMinhashPairsSql]] — reused by
    * q345's bucket-mass accounting so both oracles derive the SAME bands. */
  private lazy val duckMinhashBandsCtes: String = {
    val p = Dedup.MinHashP
    val sigs = Dedup.minHashCoeffs(8).zipWithIndex
      .map { case ((a, b), s) => s"min((h * $a + $b) % $p) AS s$s" }
      .mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_idx, md5(s${2 * b}::VARCHAR || ',' || s${2 * b + 1}::VARCHAR) AS band_hash FROM sig")
      .mkString("\n  UNION ALL ")
    s"""shing AS ($duckShingles),
       |hashed AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM shing),
       |sig AS (SELECT doc_id, $sigs FROM hashed GROUP BY doc_id),
       |bands AS ($bands)""".stripMargin
  }

  private lazy val duckMinhashPairsSql: String =
    s"""WITH $duckMinhashBandsCtes,
       |ok AS (SELECT band_idx, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500)
       |SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id
       |FROM bands a JOIN ok USING (band_idx, band_hash) JOIN bands b USING (band_idx, band_hash)
       |WHERE a.doc_id < b.doc_id""".stripMargin

  /** DuckDB subquery computing each doc's 32-bit SimHash — the same bit
    * algebra q33's oracle builds inline, reusable as a CTE body (q231). */
  private lazy val duckSimhashSub: String = {
    val bitSums = (0 until 32).map { b =>
      val j = b / 4; val k = 3 - (b % 4)
      s"SUM(((strpos('0123456789abcdef', substr(md5(w), ${j + 1}, 1)) - 1) // ${1 << k}) % 2) AS b$b"
    }.mkString(", ")
    val recombine = (0 until 32)
      .map(b => s"CASE WHEN 2 * b$b >= n THEN CAST(${1L << (31 - b)} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($recombine AS BIGINT) AS simhash FROM (
       |  SELECT doc_id, count(*) AS n, $bitSums
       |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB subquery computing each doc's 64-bit [[graft.operators.Dedup.simHash64]]
    * — the same digit algebra as [[duckSimhashSub]] across all 16 leading
    * md5 hex digits; bit 0 is the BIGINT sign bit, so its contribution is
    * the (negative) Long.MinValue literal and recombination by addition is
    * exact two's complement. */
  private lazy val duckSimhash64Sub: String = {
    val bitSums = (0 until 64).map { b =>
      val j = b / 4; val k = 3 - (b % 4)
      s"SUM(((strpos('0123456789abcdef', substr(md5(w), ${j + 1}, 1)) - 1) // ${1 << k}) % 2) AS b$b"
    }.mkString(", ")
    val recombine = (0 until 64)
      .map(b => s"CASE WHEN 2 * b$b >= n THEN CAST(${1L << (63 - b)} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($recombine AS BIGINT) AS simhash64 FROM (
       |  SELECT doc_id, count(*) AS n, $bitSums
       |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** q210 peeling parameters, shared with KcoreSpec's fixpoint assertion. */
  val KcoreK = 5
  val KcoreRounds = 8

  /** DuckDB oracle for q210: the identical k-core peeling recurrence,
    * unrolled — round r keeps nodes with ≥ k neighbors inside round r-1's
    * survivor set. Generated so rounds/k stay in lockstep with the Spark
    * side's [[graft.operators.Graphs.kCoreSurvivors]] call. */
  private lazy val duckKcoreSql: String = {
    val rounds = (1 to KcoreRounds).map { r =>
      s"""d$r AS (SELECT i.node, count(*) AS deg FROM inc i
         |  JOIN a${r - 1} x ON i.node = x.node JOIN a${r - 1} y ON i.other = y.node
         |  GROUP BY 1 HAVING count(*) >= $KcoreK),
         |a$r AS (SELECT node FROM d$r)""".stripMargin
    }.mkString(",\n")
    val hubEdges = Seq(10, 20, 30, 40, 50)
      .map(j => s"  UNION ALL SELECT u, (u + $j) % n FROM hubs, nn")
      .mkString("\n")
    s"""WITH c AS (SELECT c_custkey - 1 AS u FROM customer),
       |nn AS (SELECT count(*) AS n FROM c),
       |hubs AS (SELECT u FROM c WHERE u % 10 = 0),
       |e0 AS (SELECT u AS src, (3*u + 7) % n AS dst FROM c, nn
       |$hubEdges),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM e0 WHERE src <> dst),
       |inc AS (SELECT a AS node, b AS other FROM und UNION ALL SELECT b, a FROM und),
       |a0 AS (SELECT DISTINCT node FROM inc),
       |$rounds
       |SELECT node, CAST(deg AS BIGINT) AS deg FROM d$KcoreRounds ORDER BY node""".stripMargin
  }

  private val duckShingles =
    """SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 3, 0) + 1),
      |         i -> array_to_string(w[i+1:i+3], ' '))) AS sh
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- dedup ---------------------------------------------------------

    QueryDef(
      "q30_dedup_exact",
      (s, dir) =>
        Dedup.exactByContent(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
             |       CAST(count(*) AS BIGINT) AS group_size
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)
    ),

    QueryDef(
      "q31_dedup_exact_keys",
      (s, dir) =>
        Dedup.exactByKeys(t(s, dir, "documents"), "doc_id", Seq("lang", "source"))
          .orderBy("lang", "source"),
      Some("""SELECT lang, source, CAST(min(doc_id) AS BIGINT) AS keep_id,
             |       CAST(count(*) AS BIGINT) AS group_size
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)
    ),

    QueryDef(
      "q32_dedup_minhash_lsh",
      (s, dir) =>
        Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, bandSize = 2, shingleK = 3)
          .orderBy("a_doc_id", "b_doc_id"),
      Some(s"$duckMinhashPairsSql\nORDER BY a_doc_id, b_doc_id")
    ),

    QueryDef(
      "q33_dedup_simhash",
      (s, dir) =>
        orderedOut(Dedup.simHash(t(s, dir, "documents"), "doc_id", "text"), "doc_id"),
      Some {
        val bitSums = (0 until 32).map { b =>
          val j = b / 4; val k = 3 - (b % 4)
          s"SUM(((strpos('0123456789abcdef', substr(md5(w), ${j + 1}, 1)) - 1) // ${1 << k}) % 2) AS b$b"
        }.mkString(", ")
        val recombine = (0 until 32)
          .map(b => s"CASE WHEN 2 * b$b >= n THEN CAST(${1L << (31 - b)} AS BIGINT) ELSE 0 END")
          .mkString(" + ")
        s"""WITH words AS (
           |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents),
           |agg AS (SELECT doc_id, count(*) AS n, $bitSums FROM words GROUP BY doc_id)
           |SELECT doc_id, CAST($recombine AS BIGINT) AS simhash FROM agg ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q34_dedup_jaccard",
      (s, dir) =>
        orderedOut(Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          blockExprs = Seq(col("lang"), (col("n_chars") / 50).cast("int")),
          minJaccardPct = 40), "a_doc_id", "b_doc_id"),
      Some("""WITH d AS (SELECT doc_id, lang, n_chars // 50 AS lb,
             |  list_sort(list_distinct(string_split(text, ' '))) AS ws FROM documents),
             |d2 AS (SELECT *, CAST(len(ws) AS BIGINT) AS n FROM d),
             |pairs AS (
             |  SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, a.n AS a_n, b.n AS b_n,
             |         CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter_n
             |  FROM d2 a JOIN d2 b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
             |   AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 40)
             |SELECT a_doc_id, b_doc_id, inter_n, (a_n + b_n - inter_n) AS union_n
             |FROM pairs WHERE inter_n * 140 >= (a_n + b_n) * 40
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    // Hashed-token jaccard: same blocking/threshold algebra as q34 but over
    // md5-folded integer token sets — the scale path (8-byte int merges).
    // Oracle computes the identical hash fold, so results are exact.
    QueryDef(
      "q58_dedup_jaccard_hashed",
      (s, dir) =>
        orderedOut(Dedup.jaccardPairsHashed(t(s, dir, "documents"), "doc_id", "text",
          blockExprs = Seq(col("lang"), (col("n_chars") / 50).cast("int")),
          minJaccardPct = 40), "a_doc_id", "b_doc_id"),
      Some("""WITH d AS (SELECT doc_id, lang, n_chars // 50 AS lb,
             |  list_sort(list_distinct(list_transform(string_split(text, ' '),
             |    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT))) AS ws FROM documents),
             |d2 AS (SELECT *, CAST(len(ws) AS BIGINT) AS n FROM d),
             |pairs AS (
             |  SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, a.n AS a_n, b.n AS b_n,
             |         CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter_n
             |  FROM d2 a JOIN d2 b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
             |   AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 40)
             |SELECT a_doc_id, b_doc_id, inter_n, (a_n + b_n - inter_n) AS union_n
             |FROM pairs WHERE inter_n * 140 >= (a_n + b_n) * 40
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    QueryDef(
      "q35_dedup_levenshtein",
      (s, dir) =>
        orderedOut(Dedup.levenshteinPairs(t(s, dir, "documents"), "doc_id", "text",
          prefixLen = 20, maxDist = 120, maxBlockSize = 500), "a_doc_id", "b_doc_id"),
      Some("""WITH ok AS (SELECT substr(text, 1, 20) AS pfx FROM documents
             |            GROUP BY 1 HAVING count(*) <= 500)
             |SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id,
             |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
             |FROM documents a JOIN documents b
             |  ON substr(a.text, 1, 20) = substr(b.text, 1, 20) AND a.doc_id < b.doc_id
             |  AND abs(length(a.text) - length(b.text)) <= 120
             |JOIN ok ON ok.pfx = substr(a.text, 1, 20)
             |WHERE levenshtein(a.text, b.text) <= 120
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    // Embedding-cosine near-dup pairs: sign-bucket block + exact cosine
    // threshold — the embedding member of the dedup family.
    QueryDef(
      "q54_dedup_embed",
      (s, dir) =>
        canonOut(Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          bits = 4, minCosineX100 = 35, axisAligned = true)
          .orderBy("a_vec_id", "b_vec_id")),
      Some {
        val bucket = (0 until 4)
          .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
          .mkString(" + ")
        def cos(x: String, y: String) =
          s"""(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q)
             | / (sqrt(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $x[i+1]::DOUBLE), (p,q) -> p + q))
             |  * sqrt(list_reduce(list_transform(range(len($y)), i -> $y[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q))))""".stripMargin
        s"""WITH e0 AS (SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS b FROM embeddings),
           |ok AS (SELECT b FROM e0 GROUP BY b HAVING count(*) <= 10000),
           |e AS (SELECT e0.* FROM e0 JOIN ok USING (b)),
           |p AS (SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id,
           |  CAST(${cos("a.embedding", "b.embedding")} AS DECIMAL(16,12)) AS cs
           |  FROM e a JOIN e b ON a.b = b.b AND a.vec_id < b.vec_id)
           |SELECT a_vec_id, b_vec_id, CAST(cs AS VARCHAR) AS cos_sim FROM p
           |WHERE cs * 100 >= 35
           |ORDER BY a_vec_id, b_vec_id""".stripMargin
      }
    ),

    // SemDedup: cluster-blocked semantic dedup — nearest-of-nlist-centroid
    // cells, exact cosine verify inside each cell. Oracle recomputes the
    // assignment (sequential-fold cosine, same tie-break) and the verify.
    // kmeansIters = 0 pins the raw first-nlist seeding this oracle models;
    // q97 gates the production Lloyd-refined config.
    QueryDef(
      "q89_semdedup",
      (s, dir) =>
        canonOut(Dedup.semDedupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          nlist = 8, minCosineX100 = 35, kmeansIters = 0)
          .orderBy("a_vec_id", "b_vec_id")),
      Some {
        def cos(x: String, y: String) =
          s"""(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q)
             | / (sqrt(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $x[i+1]::DOUBLE), (p,q) -> p + q))
             |  * sqrt(list_reduce(list_transform(range(len($y)), i -> $y[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q))))""".stripMargin
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 8),
           |s AS (SELECT e.vec_id, e.embedding, c.cid,
           |        ${cos("e.embedding", "c.cv")} AS sc
           |      FROM embeddings e CROSS JOIN c),
           |a AS (SELECT vec_id, embedding, cid FROM (
           |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid) AS rn FROM s)
           |      WHERE rn = 1),
           |ok AS (SELECT cid FROM a GROUP BY cid HAVING count(*) <= 10000),
           |e AS (SELECT a.* FROM a JOIN ok USING (cid)),
           |p AS (SELECT x.cid, x.vec_id AS a_vec_id, y.vec_id AS b_vec_id,
           |        CAST(${cos("x.embedding", "y.embedding")} AS DECIMAL(16,12)) AS cs
           |      FROM e x JOIN e y ON x.cid = y.cid AND x.vec_id < y.vec_id)
           |SELECT cid, a_vec_id, b_vec_id, CAST(cs AS VARCHAR) AS cos_sim FROM p
           |WHERE cs * 100 >= 35
           |ORDER BY a_vec_id, b_vec_id""".stripMargin
      }
    ),

    // Pairs -> clusters: transitive closure of near-dup pairs (min-label
    // propagation in Spark vs a recursive-CTE reachability oracle).
    QueryDef(
      "q26_dedup_clusters",
      (s, dir) =>
        // NOT orderedOut: the hybrid CC path materializes via a driver
        // union-find already, so the checkpoint is pure overhead (measured)
        Dedup.connectedComponents(
          Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
            numHashes = 8, bandSize = 2, shingleK = 3),
          "a_doc_id", "b_doc_id")
          .orderBy("id"),
      Some(s"""WITH RECURSIVE pairs AS ($duckMinhashPairsSql),
              |edges AS (SELECT a_doc_id AS u, b_doc_id AS v FROM pairs
              |          UNION SELECT b_doc_id, a_doc_id FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT u, u FROM edges
              |  UNION
              |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v)
              |SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin)
    ),

    // The dedup pipeline end to end: LSH candidate pairs → transitive
    // clusters → one canonical doc per cluster (longest text, min-id tie).
    QueryDef(
      "q69_dedup_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = Dedup.connectedComponents(
          Dedup.minHashLshPairs(docs, "doc_id", "text",
            numHashes = 8, bandSize = 2, shingleK = 3),
          "a_doc_id", "b_doc_id")
        orderedOut(Dedup.canonicalPerCluster(clusters,
          docs.select(col("doc_id"), length(col("text")).cast("long").as("q")),
          "doc_id", "q"), "component")
      },
      Some(s"""WITH RECURSIVE pairs AS ($duckMinhashPairsSql),
              |edges AS (SELECT a_doc_id AS u, b_doc_id AS v FROM pairs
              |          UNION SELECT b_doc_id, a_doc_id FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT u, u FROM edges
              |  UNION
              |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
              |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |j AS (SELECT c.id, c.component, CAST(length(d.text) AS BIGINT) AS q
              |      FROM comp c JOIN documents d ON d.doc_id = c.id),
              |w AS (SELECT id, component, row_number() OVER
              |        (PARTITION BY component ORDER BY q DESC, id) AS rn FROM j)
              |SELECT component, min(CASE WHEN rn = 1 THEN id END) AS keep_id,
              |       CAST(count(*) AS BIGINT) AS cluster_size
              |FROM w GROUP BY component ORDER BY component""".stripMargin)
    ),

    // Range join (interval containment) via bucketing — one equi-join
    // shuffle instead of Spark's nested-loop plan for BETWEEN theta joins.
    // Oracle runs the naive theta join (fine at oracle scale).
    QueryDef(
      "q29_range_join",
      (s, dir) => {
        val points = t(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))
        val intervals = t(s, dir, "part").select(col("p_partkey"),
          (col("p_retailprice") - 2.0).as("lo"), (col("p_retailprice") + 2.0).as("hi"))
        RangeJoin.bucketedRangeJoin(points, "s_acctbal", intervals, "lo", "hi", width = 4.0)
          .select(col("s_suppkey"), col("p_partkey"))
          .orderBy("s_suppkey", "p_partkey")
      },
      Some("""SELECT s_suppkey, p_partkey
             |FROM supplier JOIN part
             |  ON s_acctbal >= p_retailprice - 2.0 AND s_acctbal <= p_retailprice + 2.0
             |ORDER BY s_suppkey, p_partkey""".stripMargin)
    ),

    // Same range-join semantics through the engine's custom Catalyst stack:
    // logical node + planner strategy + stabbing-index physical operator
    // (O(log n + k) per point vs BroadcastNestedLoopJoin's O(n)).
    QueryDef(
      "q67_range_join_indexed",
      (s, dir) => {
        val points = t(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))
        val intervals = t(s, dir, "part").select(col("p_partkey"),
          (col("p_retailprice") - 2.0).as("lo"), (col("p_retailprice") + 2.0).as("hi"))
        RangeJoin.indexedRangeJoin(points, "s_acctbal", intervals, "lo", "hi")
          .select(col("s_suppkey"), col("p_partkey"))
          .orderBy("s_suppkey", "p_partkey")
      },
      Some("""SELECT s_suppkey, p_partkey
             |FROM supplier JOIN part
             |  ON s_acctbal >= p_retailprice - 2.0 AND s_acctbal <= p_retailprice + 2.0
             |ORDER BY s_suppkey, p_partkey""".stripMargin)
    ),

    // ---- similarity search --------------------------------------------

    QueryDef(
      "q36_embed_cosine_topk",
      (s, dir) =>
        canonOut(Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = 20)),
      Some("""WITH p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
             |s AS (SELECT vec_id,
             |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS dot,
             |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y) AS na,
             |  list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS np
             |  FROM embeddings, p WHERE vec_id <> 0),
             |r AS (SELECT vec_id, CAST(dot / (sqrt(na) * sqrt(np)) AS DECIMAL(16,12)) AS cs FROM s)
             |SELECT vec_id, CAST(cs AS VARCHAR) AS cos_sim
             |FROM r ORDER BY cs DESC, vec_id LIMIT 20""".stripMargin)
    ),

    QueryDef(
      "q37_embed_ann_lsh",
      (s, dir) =>
        canonOut(Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = 10, bits = 4, axisAligned = true)),
      Some {
        val bucket = (0 until 4)
          .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
          .mkString(" + ")
        s"""WITH e AS (SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket FROM embeddings),
           |p AS (SELECT embedding AS pv, bucket FROM e WHERE vec_id = 0),
           |s AS (SELECT vec_id,
           |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS dot,
           |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y) AS na,
           |  list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS np
           |  FROM e JOIN p USING (bucket) WHERE vec_id <> 0),
           |r AS (SELECT vec_id, CAST(dot / (sqrt(na) * sqrt(np)) AS DECIMAL(16,12)) AS cs FROM s)
           |SELECT vec_id, CAST(cs AS VARCHAR) AS cos_sim
           |FROM r ORDER BY cs DESC, vec_id LIMIT 10""".stripMargin
      }
    ),

    QueryDef(
      "q38_embed_knn_join",
      (s, dir) =>
        canonOut(Similarity.knnJoin(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeFilter = col("vec_id") < 10, k = 3)
          .orderBy("probe_id", "rank")),
      Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
             |s AS (SELECT probe_id, vec_id AS neighbor_id,
             |  CAST(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y)
             |   / (sqrt(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y))
             |    * sqrt(list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y))) AS DECIMAL(16,12)) AS cs
             |  FROM embeddings, p WHERE vec_id <> probe_id),
             |r AS (SELECT probe_id, neighbor_id, cs,
             |  row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rank FROM s)
             |SELECT probe_id, neighbor_id, CAST(cs AS VARCHAR) AS cos_sim, CAST(rank AS INT) AS rank
             |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin)
    ),

    // Bucketed kNN JOIN: per-probe top-k restricted to the probe's LSH
    // bucket — the many-probe ANN form (probe count scales to the corpus).
    QueryDef(
      "q68_embed_lsh_knn_join",
      (s, dir) =>
        canonOut(Similarity.lshKnnJoin(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeFilter = col("vec_id") < 10, k = 3, bits = 4, axisAligned = true)
          .select(col("probe_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
          .orderBy("probe_id", "rank")),
      Some {
        val bucket = (0 until 4)
          .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
          .mkString(" + ")
        s"""WITH e AS (SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket FROM embeddings),
           |p AS (SELECT vec_id AS probe_id, embedding AS pv, bucket FROM e WHERE vec_id < 10),
           |s AS (SELECT probe_id, e.vec_id AS neighbor_id,
           |  CAST(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y)
           |   / (sqrt(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y))
           |    * sqrt(list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y))) AS DECIMAL(16,12)) AS cs
           |  FROM e JOIN p USING (bucket) WHERE e.vec_id <> probe_id),
           |r AS (SELECT probe_id, neighbor_id, cs,
           |  row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rank FROM s)
           |SELECT probe_id, neighbor_id, CAST(cs AS VARCHAR) AS cos_sim, CAST(rank AS INT) AS rank
           |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin
      }
    ),

    QueryDef(
      "q39_embed_ivf",
      (s, dir) =>
        canonOut(Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = 10, nlist = 16, nprobe = 4)),
      Some {
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 16),
           |sc AS (SELECT e.vec_id, e.embedding, c.cid, ${cos("e.embedding", "c.cv")} AS csc
           |       FROM embeddings e CROSS JOIN cent c),
           |asg AS (SELECT vec_id, embedding, cid FROM
           |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc)
           |  WHERE rn = 1),
           |p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
           |pl AS (SELECT cid FROM (SELECT c.cid, ${cos("c.cv", "pv")} AS pc FROM cent c CROSS JOIN p)
           |       ORDER BY pc DESC, cid LIMIT 4),
           |cand AS (SELECT a.vec_id, a.embedding FROM asg a JOIN pl USING (cid) WHERE a.vec_id <> 0),
           |r AS (SELECT vec_id, CAST(${cos("embedding", "pv")} AS DECIMAL(16,12)) AS cs
           |      FROM cand CROSS JOIN p)
           |SELECT vec_id, CAST(cs AS VARCHAR) AS cos_sim
           |FROM r ORDER BY cs DESC, vec_id LIMIT 10""".stripMargin
      }
    ),

    // As-of (point-in-time) join: each event matched to the user's most
    // recent order — union+window composition (one shuffle, no range
    // explosion). Oracle: DuckDB's NATIVE ASOF JOIN validates the
    // composition against an independent implementation of the operator.
    QueryDef(
      "q25_asof_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("osec"))
          .agg(max(col("o_orderkey")).as("o_orderkey")) // well-defined winner per (key, time)
        val e = events(s, dir)
          .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("esec"))
        AsofJoin.asofJoin(
          e, "user_id", "esec",
          o, "o_custkey", "osec",
          payload = Seq("o_orderkey"))
          .select(col("event_id"), col("user_id"),
            col("asof_o_orderkey").as("asof_orderkey"), col("asof_osec").as("asof_sec"))
          .orderBy("event_id")
      },
      Some("""WITH o2 AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec,
             |              max(o_orderkey) AS o_orderkey
             |            FROM orders GROUP BY 1, 2),
             |e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS esec FROM events)
             |SELECT e.event_id, e.user_id, o2.o_orderkey AS asof_orderkey, o2.osec AS asof_sec
             |FROM e ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.esec >= o2.osec
             |ORDER BY event_id""".stripMargin)
    ),

    // Forward as-of: each event matched to the user's EARLIEST order at or
    // after it. Oracle: DuckDB ASOF with the inequality flipped (<= picks
    // the smallest right time satisfying it).
    QueryDef(
      "q59_asof_forward",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("osec"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
        val e = events(s, dir)
          .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("esec"))
        AsofJoin.asofJoin(
          e, "user_id", "esec",
          o, "o_custkey", "osec",
          payload = Seq("o_orderkey"), direction = "forward")
          .select(col("event_id"), col("user_id"),
            col("asof_o_orderkey").as("asof_orderkey"), col("asof_osec").as("asof_sec"))
          .orderBy("event_id")
      },
      Some("""WITH o2 AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec,
             |              max(o_orderkey) AS o_orderkey
             |            FROM orders GROUP BY 1, 2),
             |e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS esec FROM events)
             |SELECT e.event_id, e.user_id, o2.o_orderkey AS asof_orderkey, o2.osec AS asof_sec
             |FROM e ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.esec <= o2.osec
             |ORDER BY event_id""".stripMargin)
    ),

    // Nearest as-of with a tolerance: per event, the closer of the two
    // directional matches, each direction bounded to 7 days first (pandas
    // merge_asof semantics). Oracle composes DuckDB's two directional ASOF
    // joins with the identical in-range/choose-closer CASE.
    QueryDef(
      "q60_asof_nearest_tol",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("osec"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
        val e = events(s, dir)
          .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("esec"))
        AsofJoin.asofJoin(
          e, "user_id", "esec",
          o, "o_custkey", "osec",
          payload = Seq("o_orderkey"), direction = "nearest",
          tolerance = Some(7L * 86400L))
          .select(col("event_id"), col("user_id"),
            col("asof_o_orderkey").as("asof_orderkey"), col("asof_osec").as("asof_sec"))
          .orderBy("event_id")
      },
      Some("""WITH o2 AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec,
             |              max(o_orderkey) AS o_orderkey
             |            FROM orders GROUP BY 1, 2),
             |e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS esec FROM events),
             |b AS (SELECT e.event_id, o2.o_orderkey AS bk, o2.osec AS bs
             |      FROM e ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.esec >= o2.osec),
             |f AS (SELECT e.event_id, o2.o_orderkey AS fk, o2.osec AS fs
             |      FROM e ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.esec <= o2.osec),
             |j AS (SELECT e.event_id, e.user_id, e.esec,
             |        CASE WHEN b.bs IS NOT NULL AND e.esec - b.bs <= 604800 THEN b.bk END AS bk,
             |        CASE WHEN b.bs IS NOT NULL AND e.esec - b.bs <= 604800 THEN b.bs END AS bs,
             |        CASE WHEN f.fs IS NOT NULL AND f.fs - e.esec <= 604800 THEN f.fk END AS fk,
             |        CASE WHEN f.fs IS NOT NULL AND f.fs - e.esec <= 604800 THEN f.fs END AS fs
             |      FROM e JOIN b USING (event_id) JOIN f USING (event_id))
             |SELECT event_id, user_id,
             |  CASE WHEN bs IS NULL THEN fk WHEN fs IS NULL THEN bk
             |       WHEN esec - bs <= fs - esec THEN bk ELSE fk END AS asof_orderkey,
             |  CASE WHEN bs IS NULL THEN fs WHEN fs IS NULL THEN bs
             |       WHEN esec - bs <= fs - esec THEN bs ELSE fs END AS asof_sec
             |FROM j ORDER BY event_id""".stripMargin)
    ),

    // Batch twin of streaming sessionization (EventStreams.sessionize):
    // gap-based session assignment via lag + running sum — second-granularity
    // timestamps keep both engines integer-exact.
    QueryDef(
      "q24_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("sec"))
          .withColumn("prev", lag(col("sec"), 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
          .withColumn("session_idx", sum(col("brk")).over(wRun))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
          .transform(orderedOut(_, "user_id", "session_idx"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |y AS (SELECT *, CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
             |        OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY event_id) > 1800
             |      THEN 1 ELSE 0 END AS brk FROM x),
             |z AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM y)
             |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       min(sec) AS start_sec, max(sec) AS end_sec
             |FROM z GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin)
    ),

    // ---- text analysis -------------------------------------------------

    QueryDef(
      "q40_text_tokens",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount("text").as("n_tokens"),
          size(array_distinct(TextAnalysis.tokens("text"))).cast("long").as("n_distinct_tokens"),
          TextAnalysis.bpeishTokenCount("text").as("n_bpeish"),
          length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct($duckToks)) AS BIGINT) AS n_distinct_tokens,
              |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpeish,
              |  CAST(length(text) AS BIGINT) AS n_chars
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q41_text_quality",
      (s, dir) =>
        TextAnalysis.qualitySignals(t(s, dir, "documents"), "doc_id", "text", stopwords)
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(length(text) AS BIGINT) AS n_chars,
              |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct($duckToks)) AS BIGINT) AS n_distinct_tokens,
              |  CAST(${duckMarkerScore(stopwords)} AS BIGINT) AS n_stopwords,
              |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
              |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
              |  CAST(CASE WHEN len($duckToks) = 0 THEN 0
              |       ELSE list_sum(list_transform($duckToks, t -> length(t))) * 100 // len($duckToks)
              |  END AS BIGINT) AS avg_token_len_x100
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q42_text_langid",
      (s, dir) =>
        orderedOut(
          TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text", langMarkers),
          "doc_id"),
      Some {
        val scores = langMarkers
          .map { case (l, ws) => s"CAST(${duckMarkerScore(ws)} AS BIGINT) AS score_$l" }
          .mkString(",\n  ")
        val g = langMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
        val pred = langMarkers
          .map { case (l, _) => s"WHEN score_$l = $g THEN '$l'" }
          .mkString("CASE ", " ", " ELSE 'unknown' END")
        s"""WITH s AS (SELECT doc_id, $scores FROM documents)
           |SELECT doc_id, ${langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")},
           |       $pred AS pred_lang
           |FROM s ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q43_text_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.fingerprint("text").as("fingerprint"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  md5(array_to_string(list_sort(list_distinct($duckToks)), ' ')) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Winnowing (rolling-hash) fingerprints: polynomial k-gram hashes,
    // per-window minima, distinct set — surfaced as (count, set-md5) scalars.
    QueryDef(
      "q55_text_winnowing",
      (s, dir) =>
        TextAnalysis.withWinnowingFingerprints(
          t(s, dir, "documents"), "text", "__fp", k = 8, w = 4)
          .select(
            col("doc_id"),
            size(col("__fp")).cast("long").as("n_fingerprints"),
            md5(array_join(expr("transform(__fp, v -> cast(v as string))"), ",")).as("fp_md5"))
          .orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, text,
             |  list_transform(range(greatest(length(text) - 7, 1)),
             |    i -> list_reduce(list_transform(range(8), j -> CAST(ascii(substr(text, CAST(i + 1 + j AS INT), 1)) AS BIGINT)),
             |           (acc, c) -> (acc * 257 + c) % 1000000007)) AS gh FROM documents),
             |wsel AS (SELECT doc_id,
             |  list_sort(list_distinct(list_transform(range(greatest(len(gh) - 3, 1)),
             |    i -> list_min(gh[i+1:i+4])))) AS fp FROM g)
             |SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fingerprints,
             |       md5(array_to_string(list_transform(fp, v -> v::VARCHAR), ',')) AS fp_md5
             |FROM wsel ORDER BY doc_id""".stripMargin)
    ),

    // Deterministic (hash-bucket) sampling: membership decided per key by an
    // engine-portable md5 fold — identical sample on any engine/partitioning,
    // stable under corpus growth. Stratified rates per language + the
    // train/holdout split law are spec-checked; here the driver verifies the
    // exact member set cross-engine.
    QueryDef(
      "q61_sample_deterministic",
      (s, dir) =>
        Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 30, "de" -> 10, "fr" -> 10, "es" -> 10, "zh" -> 10))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             |      < CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 10 WHEN 'fr' THEN 10
             |                  WHEN 'es' THEN 10 WHEN 'zh' THEN 10 ELSE 0 END
             |ORDER BY doc_id""".stripMargin)
    ),

    // Normalization-aware exact dedup: lowercase/punct-strip/whitespace-
    // collapse, then group by the normalized content hash — catches the
    // formatting-only duplicates raw md5 misses.
    QueryDef(
      "q62_dedup_normalized",
      (s, dir) => {
        val norm = t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.normalizeText("text").as("text"))
        Dedup.exactByContent(norm, "doc_id", "text").orderBy("content_hash")
      },
      Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
             |                 '\s+', ' ', 'g'))) AS content_hash,
             |       CAST(min(doc_id) AS BIGINT) AS keep_id,
             |       CAST(count(*) AS BIGINT) AS group_size
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)
    ),

    // Corpus-wide token frequency top-k: explode + two-phase count (map-side
    // partial agg collapses to |vocab| per task) + deterministic top-k.
    QueryDef(
      "q63_token_topk",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens("text")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some(s"""SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
              |FROM (SELECT unnest($duckToks) AS tok FROM documents)
              |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin)
    ),

    // Benchmark-contamination check: inverted-index join on 8-word shingle
    // hashes between a "train" and an "eval" corpus (documents split by id
    // parity) — pairs sharing >= 2 shingles, hot shingles capped out.
    QueryDef(
      "q64_contamination",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        orderedOut(Dedup.crossOverlapPairs(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          shingleK = 8, minShared = 2, maxPostingsPerShingle = 1000),
          "train_doc_id", "eval_doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 8, 0) + 1),
             |         i -> array_to_string(w[i+1:i+8], ' '))) AS sh FROM w),
             |post AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
             |tp AS (SELECT doc_id AS train_doc_id, h FROM post WHERE doc_id % 2 = 0),
             |ep AS (SELECT doc_id AS eval_doc_id, h FROM post WHERE doc_id % 2 = 1),
             |hot AS (SELECT h FROM tp GROUP BY h HAVING count(*) > 1000
             |        UNION SELECT h FROM ep GROUP BY h HAVING count(*) > 1000),
             |tpc AS (SELECT * FROM tp ANTI JOIN hot USING (h)),
             |epc AS (SELECT * FROM ep ANTI JOIN hot USING (h))
             |SELECT train_doc_id, eval_doc_id, CAST(count(*) AS BIGINT) AS shared_shingles
             |FROM tpc JOIN epc USING (h)
             |GROUP BY 1, 2 HAVING count(*) >= 2
             |ORDER BY train_doc_id, eval_doc_id""".stripMargin)
    ),

    // PII scrubbing: deterministic email+phone injected per doc (so the
    // patterns demonstrably fire), counted before redaction, redacted text
    // verified by md5 — regex semantics proven identical cross-engine.
    QueryDef(
      "q65_pii_redaction",
      (s, dir) => {
        val aug = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-867-5309 now")).as("aug"))
        val (emails, phones) = TextAnalysis.piiCounts("aug")
        aug.select(col("doc_id"), emails.as("n_emails"), phones.as("n_phones"),
          md5(TextAnalysis.redactPii("aug")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH a AS (SELECT doc_id,
             |  text || ' contact user' || doc_id || '@example.com or 555-867-5309 now' AS aug
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(aug, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(aug, '\b[0-9]{3}[-.]?[0-9]{3}[-.]?[0-9]{4}\b')) AS BIGINT) AS n_phones,
             |  md5(regexp_replace(regexp_replace(aug,
             |        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             |        '\b[0-9]{3}[-.]?[0-9]{3}[-.]?[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
             |FROM a ORDER BY doc_id""".stripMargin)
    ),

    // Gopher/C4-style repetition signal: % of word 3-grams that repeat an
    // earlier one, as an exact integer per document.
    QueryDef(
      "q66_repetition_score",
      (s, dir) =>
        TextAnalysis.withRepetitionScore(t(s, dir, "documents"), "text", "rep_pct", n = 3)
          .select(col("doc_id"), col("rep_pct"))
          .orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |r AS (SELECT doc_id, w, list_transform(range(greatest(len(w) - 3, 0) + 1),
             |        i -> array_to_string(w[i+1:i+3], ' ')) AS grams FROM g)
             |SELECT doc_id,
             |  CAST(CASE WHEN len(w) < 3 THEN 0
             |       ELSE (len(grams) - len(list_distinct(grams))) * 100 // len(grams) END AS BIGINT) AS rep_pct
             |FROM r ORDER BY doc_id""".stripMargin)
    ),

    // ---- multimodal plumbing ------------------------------------------

    // STUB resize (nearest-neighbor-style subsampling of the payload) with
    // typed size metadata — deterministic, oracle-checked plumbing.
    QueryDef(
      "q56_mm_resize",
      // REAL resize: synthesize an 8×8 P6 payload per document (as q57),
      // then nearest-neighbor downsample to 4×4 over the DECODED pixels on
      // executors. Oracle replicates the exact NN source-pixel mapping
      // sx=⌊x·W/newW⌋, sy=⌊y·H/newH⌋ straight from the text-derived bytes.
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 8)
        Multimodal.ppmResize(withPayload, "doc_id", "payload", newW = 4, newH = 4)
          .orderBy("doc_id")
      },
      Some {
        // resized pixel k: x=k%4, y=k//4 -> source pixel ((y*8)//4)*8 + (x*8)//4
        def channel(c: Int) =
          s"CAST(list_sum(list_transform(range(16), " +
            s"k -> p[3*(((k//4)*8//4)*8 + ((k%4)*8//4)) + ${c + 1}])) AS BIGINT)"
        """WITH px AS (SELECT doc_id,
          |  list_transform(range(192),
          |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
          |  FROM documents)
          |SELECT doc_id, CAST(4 AS INT) AS new_w, CAST(4 AS INT) AS new_h,
          |       CAST(16 AS BIGINT) AS n_pixels,
          |""".stripMargin +
          s"       ${channel(0)} AS r_sum, ${channel(1)} AS g_sum, ${channel(2)} AS b_sum\n" +
          "FROM px ORDER BY doc_id"
      }
    ),

    QueryDef(
      "q45_mm_assets",
      (s, dir) =>
        Multimodal.toAssets(t(s, dir, "documents"), "doc_id", "text", "text")
          .drop("payload")
          .orderBy("asset_id"),
      Some("""SELECT CAST(doc_id AS BIGINT) AS asset_id, 'text' AS media_type,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |       md5(text) AS checksum
             |FROM documents ORDER BY asset_id""".stripMargin)
    ),

    QueryDef(
      "q46_mm_chunks",
      (s, dir) =>
        Multimodal.chunkHashes(t(s, dir, "documents"), "doc_id", "text", chunkSize = 100)
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH c AS (SELECT doc_id,
             |  list_transform(range(CAST(ceil(length(text) / 100.0) AS BIGINT)),
             |    i -> substr(text, CAST(i * 100 + 1 AS INT), 100)) AS chunks FROM documents),
             |u AS (SELECT doc_id, unnest(chunks) AS chunk, generate_subscripts(chunks, 1) - 1 AS ci FROM c)
             |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
             |       CAST(length(chunk) AS BIGINT) AS chunk_len, md5(chunk) AS chunk_md5
             |FROM u ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    // REAL binary decode: synthesize a P6 PPM payload per document (pixel
    // bytes = text code points mod 256, cycled), run the actual byte-level
    // header parser + channel sums on executors, and verify the integer
    // stats against DuckDB computing the same sums straight from the text.
    QueryDef(
      "q57_mm_ppm_decode",
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 8)
        Multimodal.ppmFeatures(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some {
        def channel(c: Int) =
          s"CAST(list_sum(list_transform(range(64), i -> p[3*i + ${c + 1}])) AS BIGINT)"
        """WITH px AS (SELECT doc_id,
          |  list_transform(range(192),
          |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
          |  FROM documents)
          |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
          |       CAST(64 AS BIGINT) AS n_pixels,
          |""".stripMargin +
          s"       ${channel(0)} AS r_sum, ${channel(1)} AS g_sum, ${channel(2)} AS b_sum\n" +
          "FROM px ORDER BY doc_id"
      }
    ),

    QueryDef(
      "q90_mm_wav_decode",
      // REAL audio decode: RIFF/WAVE chunk-walking parser over PCM16-mono
      // payloads synthesized deterministically from text (audio twin of
      // q57) — sample stats the oracle re-derives from the generator math.
      (s, dir) => {
        val withPayload = Multimodal.withWavPayload(
          t(s, dir, "documents"), "doc_id", "text", nSamples = 256, sampleRate = 8000)
        Multimodal.wavFeatures(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH smp AS (SELECT doc_id,
             |  list_transform(range(256),
             |    j -> ((ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) * 131 + 7*j) % 65536 - 32768) AS s
             |  FROM documents)
             |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(256 AS BIGINT) AS n_samples,
             |       CAST(list_min(s) AS INT) AS s_min, CAST(list_max(s) AS INT) AS s_max,
             |       CAST(list_sum(list_transform(s, x -> abs(x))) AS BIGINT) AS abs_sum
             |FROM smp ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q47_mm_image_stats",
      // REAL per-image feature extraction over decoded pixels: channel
      // min/max + total brightness on a 12×4 payload (different dims than
      // q56/q57 so the header parse is exercised on non-square inputs).
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 12, height = 4)
        Multimodal.ppmStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some {
        def mm(c: Int, f: String) =
          s"CAST(list_$f(list_transform(range(48), i -> p[3*i + ${c + 1}])) AS INT)"
        """WITH px AS (SELECT doc_id,
          |  list_transform(range(144),
          |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
          |  FROM documents)
          |SELECT doc_id, CAST(12 AS INT) AS width, CAST(4 AS INT) AS height,
          |       CAST(48 AS BIGINT) AS n_pixels,
          |""".stripMargin +
          s"       ${mm(0, "min")} AS r_min, ${mm(0, "max")} AS r_max,\n" +
          s"       ${mm(1, "min")} AS g_min, ${mm(1, "max")} AS g_max,\n" +
          s"       ${mm(2, "min")} AS b_min, ${mm(2, "max")} AS b_max,\n" +
          "       CAST(list_sum(p) AS BIGINT) AS bright_sum\n" +
          "FROM px ORDER BY doc_id"
      }
    ),

    // Distinctive terms per document: TF-IDF's ranking via exact integer
    // (tf DESC, df ASC, token) ordering — the float log is monotone in df,
    // so top-k is identical and hash parity survives.
    QueryDef(
      "q81_top_terms_per_doc",
      (s, dir) =>
        TextAnalysis.topTermsPerDoc(t(s, dir, "documents"), "doc_id", "text", k = 3)
          .orderBy("doc_id", "rank"),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
              |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
              |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              |          FROM (SELECT DISTINCT doc_id, token FROM toks) d GROUP BY token),
              |r AS (SELECT doc_id, token, tf, df,
              |        row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, token ASC) AS rank
              |      FROM tf JOIN dfreq USING (token))
              |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df
              |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
    ),

    // Domain-mixture rebalancing: sample documents toward lang weights
    // within a row budget — integer rate arithmetic the oracle re-derives
    // from the same counts.
    QueryDef(
      "q79_mixture_rebalance",
      (s, dir) =>
        Sampling.rebalanceToMixture(t(s, dir, "documents"), "lang", "doc_id",
          weights = Map("en" -> 500, "de" -> 300, "fr" -> 200), totalBudget = 300L)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some("""WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY lang),
             |r AS (SELECT lang, CAST(least(4294967296::HUGEINT,
             |         (300::HUGEINT * CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 300 WHEN 'fr' THEN 200 ELSE 0 END
             |          * 4294967296::HUGEINT) // (1000::HUGEINT * nd)) AS BIGINT) AS thr
             |      FROM n WHERE lang IN ('en', 'de', 'fr'))
             |SELECT doc_id, lang FROM documents JOIN r USING (lang)
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
             |ORDER BY doc_id""".stripMargin)
    ),

    // Int8 embedding quantization: per-vector symmetric scale + truncated
    // ints; oracle replicates the exact double fold and truncation (DuckDB
    // int casts ROUND, so the oracle must trunc explicitly).
    QueryDef(
      "q80_embed_quantize",
      (s, dir) =>
        Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
          .select(col("vec_id"),
            md5(expr("array_join(transform(q, x -> cast(x as string)), ',')")).as("q_md5"),
            floor(col("q_scale") * 1e9).cast("long").as("scale_1e9"))
          .orderBy("vec_id"),
      Some("""WITH m AS (SELECT vec_id, embedding,
             |    CASE WHEN len(embedding) = 0 THEN 0.0 ELSE
             |      list_reduce(list_transform(embedding, x -> abs(x::DOUBLE)), (a, b) -> greatest(a, b))
             |    END AS maxabs
             |  FROM embeddings),
             |s AS (SELECT vec_id, embedding,
             |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS sc FROM m)
             |SELECT vec_id,
             |  md5(array_to_string(list_transform(embedding,
             |    x -> CAST(CAST(trunc(x::DOUBLE * sc) AS INT) AS VARCHAR)), ',')) AS q_md5,
             |  CAST(floor(sc * 1000000000) AS BIGINT) AS scale_1e9
             |FROM s ORDER BY vec_id""".stripMargin)
    ),

    // Context chunking: 200-char chunks with 50-char overlap per document —
    // the pre-embedding / pre-packing splitter. Exact start arithmetic
    // (i·step) replicated in DuckDB via correlated range unnest.
    QueryDef(
      "q78_text_chunks",
      (s, dir) =>
        TextAnalysis.chunkText(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 200, overlap = 50)
          .select(col("doc_id"), col("chunk_idx"), md5(col("chunk_text")).as("chunk_md5"),
            col("chunk_len"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH c AS (SELECT doc_id, text,
             |    unnest(range((greatest(length(text) - 50 - 1, 0) // 150) + 1)) AS k
             |  FROM documents WHERE length(text) > 0)
             |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
             |       md5(substr(text, CAST(k * 150 + 1 AS INT), 200)) AS chunk_md5,
             |       CAST(length(substr(text, CAST(k * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    // Sequence packing: documents in doc_id order fill 2048-token bins via
    // the distributed prefix sum (range slices + broadcast offsets — never
    // the single-task global window). Oracle is a plain running sum: the
    // two-phase scan must agree with it exactly, partition count and all.
    QueryDef(
      "q76_pack_sequences",
      (s, dir) =>
        Packing.packByTokenBudget(t(s, dir, "documents"), "doc_id", "n_chars", budget = 2048)
          .select(col("doc_id"), col("bin_id"), col("bin_offset"))
          .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id, n_chars,
             |  sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM documents)
             |SELECT doc_id, CAST((cum - n_chars) // 2048 AS BIGINT) AS bin_id,
             |       CAST((cum - n_chars) % 2048 AS BIGINT) AS bin_offset
             |FROM c ORDER BY doc_id""".stripMargin)
    ),

    // ---- production ANN configs through the gate ------------------------
    // q37/q68 run the axis-aligned oracle stand-in; these two run the REAL
    // production paths — balanced-hyperplane multi-probe LSH and Lloyd-
    // refined IVF. Both are deterministic pure functions of (data, seed),
    // and the DuckDB oracle recomputes them INDEPENDENTLY: the only shared
    // constant is the ±1 plane table (a pure function of (bits, dims, seed),
    // embedded as literals the way a seed would be); projections, buckets,
    // margin flips, Lloyd means, and top-k all re-derive in SQL.
    // bits=6 keeps in-bucket candidate sets non-degenerate at the gate's
    // sf0.01 (500 vectors / 2^6 buckets ≈ 8 each × 3 probes); q75 covers
    // the production bits=12 bucketing on the same plane table.
    QueryDef(
      "q73_embed_ann_multiprobe",
      (s, dir) =>
        canonOut(Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = 10, bits = 6, probes = 3)),
      Some {
        val tab = graft.functions.HyperplaneBucket.table(6, 64, Similarity.DefaultPlaneSeed)
        val planes = tab.zipWithIndex.map { case (row, p) =>
          s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
        }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        // ±1·x then left-fold-add reproduces the Spark expression's
        // add/subtract accumulation bit-for-bit (multiplication by ±1 and
        // a+(−x) are IEEE-exact), so signs and margins agree exactly
        s"""WITH planes(idx, w) AS (VALUES
           |  $planes),
           |pr AS (SELECT e.vec_id, p.idx,
           |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
           |  FROM embeddings e CROSS JOIN planes p),
           |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS b
           |  FROM pr GROUP BY vec_id),
           |flips AS (SELECT idx FROM pr WHERE vec_id = 0 ORDER BY abs(proj), idx LIMIT 2),
           |pb AS (SELECT b FROM bkt WHERE vec_id = 0
           |  UNION ALL SELECT xor(m.b, (1::BIGINT << f.idx)) FROM (SELECT b FROM bkt WHERE vec_id = 0) m, flips f),
           |p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
           |cand AS (SELECT e.vec_id, e.embedding
           |  FROM embeddings e JOIN bkt ON e.vec_id = bkt.vec_id JOIN pb ON bkt.b = pb.b
           |  WHERE e.vec_id <> 0),
           |r AS (SELECT vec_id, CAST(${cos("embedding", "pv")} AS DECIMAL(16,12)) AS cs
           |  FROM cand CROSS JOIN p)
           |SELECT vec_id, CAST(cs AS VARCHAR) AS cos_sim
           |FROM r ORDER BY cs DESC, vec_id LIMIT 10""".stripMargin
      }
    ),

    QueryDef(
      "q74_embed_ivf_refined",
      (s, dir) =>
        canonOut(Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = 10, nlist = 16, nprobe = 4, kmeansIters = 2)),
      Some {
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        // one Lloyd round: argmax-cosine assignment (deterministic cid
        // tie-break), then per-dim member mean CAST TO REAL — the float
        // rounding absorbs double-summation-order differences between the
        // engines, exactly like the Spark side's .toFloat; empty clusters
        // keep their previous centroid
        def assign(cent: String, out: String) =
          s"""$out AS (SELECT vec_id, embedding, cid FROM (
             |    SELECT e.vec_id, e.embedding, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN $cent c)
             |  WHERE rn = 1)""".stripMargin
        def lloyd(asg: String, prev: String, out: String, m: String, n: String) =
          s"""$m AS (SELECT cid, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM $asg, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
             |$n AS (SELECT cid, list(mv ORDER BY i) AS cv FROM $m GROUP BY cid),
             |$out AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM $prev c LEFT JOIN $n n USING (cid))""".stripMargin
        s"""WITH cent0 AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 16),
           |${assign("cent0", "asg0")},
           |${lloyd("asg0", "cent0", "cent1", "m1", "n1")},
           |${assign("cent1", "asg1")},
           |${lloyd("asg1", "cent1", "cent2", "m2", "n2")},
           |${assign("cent2", "asgf")},
           |p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
           |pl AS (SELECT cid FROM (SELECT c.cid, ${cos("c.cv", "pv")} AS pc FROM cent2 c CROSS JOIN p)
           |  ORDER BY pc DESC, cid LIMIT 4),
           |cand AS (SELECT a.vec_id, a.embedding FROM asgf a JOIN pl USING (cid) WHERE a.vec_id <> 0),
           |r AS (SELECT vec_id, CAST(${cos("embedding", "pv")} AS DECIMAL(16,12)) AS cs
           |  FROM cand CROSS JOIN p)
           |SELECT vec_id, CAST(cs AS VARCHAR) AS cos_sim
           |FROM r ORDER BY cs DESC, vec_id LIMIT 10""".stripMargin
      }
    ),

    // Production-config bucketing itself: bits=12 balanced-hyperplane bucket
    // per vector, checked as the occupancy histogram (top-20 buckets). The
    // oracle recomputes every projection and sign from the ±1 plane literals.
    QueryDef(
      "q75_hyperplane_bucket_hist",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.functions.GraftFunctions.register(s)
        emb.select(Similarity.hyperplaneBucket("embedding", 12).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bucket"))
          .limit(20)
      },
      Some {
        val tab = graft.functions.HyperplaneBucket.table(12, 64, Similarity.DefaultPlaneSeed)
        val planes = tab.zipWithIndex.map { case (row, p) =>
          s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
        }.mkString(",\n  ")
        s"""WITH planes(idx, w) AS (VALUES
           |  $planes),
           |pr AS (SELECT e.vec_id, p.idx,
           |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
           |  FROM embeddings e CROSS JOIN planes p),
           |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pr GROUP BY vec_id)
           |SELECT bucket, CAST(count(*) AS BIGINT) AS n
           |FROM bkt GROUP BY bucket ORDER BY n DESC, bucket LIMIT 20""".stripMargin
      }
    ),

    // Sub-document boilerplate scrub (C4-style line dedup): spans repeated
    // across >2 documents are removed, documents reassembled from the
    // surviving spans in order.
    QueryDef(
      "q82_boilerplate_spans",
      (s, dir) =>
        orderedOut(Dedup.removeBoilerplateSpans(t(s, dir, "documents"),
          "doc_id", "text", spanWords = 5, maxDocs = 2), "doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sp AS (SELECT doc_id, (len(w)+4)//5 AS n_spans, unnest(range((len(w)+4)//5)) AS pos, w FROM d),
             |fl AS (SELECT doc_id, n_spans, pos, array_to_string(w[pos*5+1:pos*5+5], ' ') AS span FROM sp),
             |ok AS (SELECT span FROM fl GROUP BY span HAVING count(DISTINCT doc_id) <= 2)
             |SELECT doc_id, CAST(any_value(n_spans) AS BIGINT) AS n_spans,
             |       CAST(count(*) AS BIGINT) AS kept_spans,
             |       string_agg(span, ' ' ORDER BY pos) AS clean_text
             |FROM fl JOIN ok USING (span)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // Gopher-style quality rules: integer-arithmetic verdicts (flags emitted
    // as 0/1 BIGINT — engine-portable hashing).
    QueryDef(
      "q83_gopher_rules",
      (s, dir) => {
        val r = TextAnalysis.gopherQualityRules(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50)
        r.select(col("doc_id") +:
          Seq("n_words", "sum_word_chars", "n_symbol_words", "n_alpha_words",
            "n_stopword_hits").map(c => col(c)) ++:
          Seq("ok_word_count", "ok_mean_len", "ok_symbols", "ok_alpha",
            "ok_stopwords", "passes_all").map(c => col(c).cast("long").as(c)): _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS n_words,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS sum_word_chars,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS n_symbol_words,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS n_stopword_hits
              |FROM t)
              |SELECT doc_id, n_words, sum_word_chars, n_symbol_words, n_alpha_words, n_stopword_hits,
              |  CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS ok_word_count,
              |  CAST(sum_word_chars BETWEEN n_words * 3 AND n_words * 10 AS BIGINT) AS ok_mean_len,
              |  CAST(n_symbol_words * 100 <= n_words * 10 AS BIGINT) AS ok_symbols,
              |  CAST(n_alpha_words * 100 >= n_words * 80 AS BIGINT) AS ok_alpha,
              |  CAST(n_stopword_hits >= 2 AS BIGINT) AS ok_stopwords,
              |  CAST(n_words BETWEEN 50 AND 100000 AND sum_word_chars BETWEEN n_words * 3 AND n_words * 10
              |       AND n_symbol_words * 100 <= n_words * 10 AND n_alpha_words * 100 >= n_words * 80
              |       AND n_stopword_hits >= 2 AS BIGINT) AS passes_all
              |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // Curation: top-10 documents per language by token count (deterministic
    // doc_id tie-break) — the "best k per group" dataset-selection step.
    QueryDef(
      "q84_curation_topk",
      (s, dir) =>
        Sampling.topKPerGroup(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"), TextAnalysis.tokenCount("text").as("n_tokens")),
          "lang", k = 10, order = Seq(col("n_tokens").desc, col("doc_id").asc))
          .select(col("lang"), col("rank_in_group").cast("long").as("rank_in_group"),
            col("doc_id"), col("n_tokens"))
          .orderBy("lang", "rank_in_group"),
      Some(s"""WITH t AS (SELECT doc_id, lang, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
              |r AS (SELECT lang, doc_id, n_tokens,
              |        row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id ASC) AS rk
              |      FROM t)
              |SELECT lang, CAST(rk AS BIGINT) AS rank_in_group, doc_id, n_tokens
              |FROM r WHERE rk <= 10 ORDER BY lang, rank_in_group""".stripMargin)
    ),

    // Flagship curation pipeline: Gopher gate -> boilerplate scrub -> exact
    // dedup on cleaned text -> sequence packing. The oracle chains the
    // stage CTEs (q83 rules, q82 scrub, q30-style dedup, q76 packing).
    QueryDef(
      "q88_curate_pipeline",
      (s, dir) =>
        orderedOut(Pipelines.curateAndPack(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50,
          spanWords = 5, maxSpanDocs = 2, budget = 256), "doc_id"),
      Some(s"""WITH t0 AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id, text,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS sy,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS al,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t0),
              |gated AS (SELECT doc_id, text FROM m
              |  WHERE nw BETWEEN 50 AND 100000 AND swc BETWEEN nw * 3 AND nw * 10
              |    AND sy * 100 <= nw * 10 AND al * 100 >= nw * 80 AND st >= 2),
              |d AS (SELECT doc_id, string_split(text, ' ') AS w FROM gated),
              |sp AS (SELECT doc_id, unnest(range((len(w)+4)//5)) AS pos, w FROM d),
              |fl AS (SELECT doc_id, pos, array_to_string(w[pos*5+1:pos*5+5], ' ') AS span FROM sp),
              |ok AS (SELECT span FROM fl GROUP BY span HAVING count(DISTINCT doc_id) <= 2),
              |clean AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_spans,
              |            string_agg(span, ' ' ORDER BY pos) AS clean_text
              |          FROM fl JOIN ok USING (span) GROUP BY doc_id),
              |uniq AS (SELECT doc_id, kept_spans, clean_text FROM (
              |    SELECT *, row_number() OVER (PARTITION BY clean_text ORDER BY doc_id) AS rn FROM clean)
              |  WHERE rn = 1),
              |tok AS (SELECT doc_id, kept_spans,
              |          CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS n_tokens FROM uniq),
              |c AS (SELECT doc_id, kept_spans, n_tokens,
              |  sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM tok)
              |SELECT doc_id, kept_spans, n_tokens,
              |       CAST((cum - n_tokens) // 256 AS BIGINT) AS bin_id,
              |       CAST((cum - n_tokens) % 256 AS BIGINT) AS bin_offset
              |FROM c ORDER BY doc_id""".stripMargin)
    ),

    // Embedding-norm QA audit: exact sequential-fold L2 norm-squared plus a
    // bounds flag — testdata embeddings are normalized, so the audit
    // reports all-clear (the outlier logic is spec-covered on crafted
    // vectors; thresholds here are the robust production band).
    QueryDef(
      "q96_embedding_norm_audit",
      (s, dir) =>
        canonOut(Similarity.withNormAudit(t(s, dir, "embeddings"), "embedding",
          minNormX100 = 50, maxNormX100 = 200)
          .select(col("vec_id"), col("norm_sq").cast("decimal(18,10)").as("norm_sq"),
            col("is_outlier").cast("long").as("is_outlier"))
          .orderBy("vec_id")),
      Some("""WITH n AS (SELECT vec_id,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a,b) -> a + b) AS ns
             |FROM embeddings)
             |SELECT vec_id, CAST(CAST(ns AS DECIMAL(18,10)) AS VARCHAR) AS norm_sq,
             |       CAST(CASE WHEN ns * 10000 < 2500 OR ns * 10000 > 40000 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
             |FROM n ORDER BY vec_id""".stripMargin)
    ),

    // Incremental ingest dedup: a synthetic arriving batch (replayed
    // corpus content under new ids + genuinely new docs + a within-batch
    // dup) deduped against the corpus — replays and batch dups drop.
    QueryDef(
      "q94_dedup_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val replay = docs.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val novel = docs.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text"))
        // same text as novel, shifted ids — the within-batch duplicate
        val novelDup = novel.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val batch = replay.unionByName(novel).unionByName(novelDup)
        Dedup.dedupAgainstCorpus(batch, docs, "doc_id", "text")
          .select(col("doc_id"), md5(col("text")).as("content_hash"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (SELECT md5(text) AS h FROM documents GROUP BY 1),
             |replay AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 3),
             |novel AS (SELECT doc_id + 2000000 AS doc_id, text || ' fresh' AS text FROM documents WHERE doc_id % 10 = 4),
             |novel2 AS (SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text FROM documents WHERE doc_id % 10 = 4),
             |batch AS (SELECT * FROM replay UNION ALL SELECT * FROM novel UNION ALL SELECT * FROM novel2),
             |fresh AS (SELECT b.doc_id, md5(b.text) AS h FROM batch b
             |          LEFT JOIN corpus c ON md5(b.text) = c.h WHERE c.h IS NULL),
             |win AS (SELECT doc_id, h, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM fresh)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, h AS content_hash
             |FROM win WHERE rn = 1 ORDER BY doc_id""".stripMargin)
    ),

    // Quality-weighted deterministic sampling: keep-probability proportional
    // to an integer quality score, decided by the key hash — soft filtering.
    QueryDef(
      "q95_weighted_sample",
      (s, dir) =>
        Sampling.weightedSample(
          t(s, dir, "documents").withColumn("q", (col("n_chars") % 101).cast("int")),
          "doc_id", "q", maxWeight = 100)
          .select(col("doc_id"), col("q"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(n_chars % 101 AS INT) AS q FROM documents
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT * 100
             |      < (n_chars % 101) * 4294967296
             |ORDER BY doc_id""".stripMargin)
    ),

    // Frequency-of-frequencies vocabulary audit: how many distinct tokens
    // occur exactly k times — the double aggregation that surfaces
    // tokenizer anomalies and boilerplate mass (a heavy tail at high k).
    QueryDef(
      "q92_token_freq_of_freqs",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens("text")).as("token"))
        toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
          .groupBy(col("freq")).agg(count(lit(1)).as("n_tokens"))
          .orderBy(col("freq"))
      },
      Some(s"""WITH toks AS (SELECT unnest($duckToks) AS token FROM documents),
              |f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY token)
              |SELECT freq, CAST(count(*) AS BIGINT) AS n_tokens
              |FROM f GROUP BY freq ORDER BY freq""".stripMargin)
    ),

    // Dedup survivorship curve: near-dup cluster-size histogram — how much
    // of the corpus sits in duplicate groups of each size (the "what did
    // dedup buy us" diagnostic).
    QueryDef(
      "q93_cluster_size_hist",
      (s, dir) => {
        val clusters = Dedup.connectedComponents(
          Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
            numHashes = 8, bandSize = 2, shingleK = 3),
          "a_doc_id", "b_doc_id")
        clusters.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
          .orderBy(col("cluster_size"))
      },
      Some(s"""WITH RECURSIVE pairs AS ($duckMinhashPairsSql),
              |edges AS (SELECT a_doc_id AS u, b_doc_id AS v FROM pairs
              |          UNION SELECT b_doc_id, a_doc_id FROM pairs),
              |reach(id, r) AS (
              |  SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges) n(u)
              |  UNION
              |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
              |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
              |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY cluster)
              |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
              |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)
    ),

    // Per-source ingest quality report: doc/token mass + Gopher pass rate
    // in basis points — the batch-monitoring aggregate.
    QueryDef(
      "q91_source_quality",
      (s, dir) =>
        TextAnalysis.sourceQualityReport(t(s, dir, "documents"), "source", "text",
          stopwords, minWords = 50)
          .orderBy("source"),
      Some(s"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
              |m AS (SELECT source,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS sy,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS al,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t),
              |v AS (SELECT source, nw, st,
              |  CAST(nw BETWEEN 50 AND 100000 AND swc BETWEEN nw * 3 AND nw * 10
              |       AND sy * 100 <= nw * 10 AND al * 100 >= nw * 80 AND st >= 2 AS BIGINT) AS ok
              |FROM m)
              |SELECT source, CAST(count(*) AS BIGINT) AS docs,
              |       CAST(sum(nw) AS BIGINT) AS total_words,
              |       CAST(sum(st) AS BIGINT) AS total_stopword_hits,
              |       CAST(sum(ok) AS BIGINT) AS passing_docs,
              |       CAST(sum(ok) * 10000 // count(*) AS BIGINT) AS pass_x10000,
              |       CAST(sum(nw) * 100 // count(*) AS BIGINT) AS mean_words_x100
              |FROM v GROUP BY source ORDER BY source""".stripMargin)
    ),

    // Exact per-language quantiles of document length — integer rank
    // arithmetic (percentile_disc semantics), engine-exact where
    // interpolated/approx percentiles are not.
    QueryDef(
      "q86_grouped_quantiles",
      (s, dir) =>
        Stats.groupedQuantiles(t(s, dir, "documents"), "lang", "n_chars",
          percents = Seq(25, 50, 75))
          .orderBy("lang", "p"),
      Some("""WITH r AS (SELECT lang, n_chars,
             |         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             |         count(*) OVER (PARTITION BY lang) AS n
             |       FROM documents)
             |SELECT lang, CAST(p AS BIGINT) AS p, n_chars
             |FROM r CROSS JOIN (VALUES (25), (50), (75)) pv(p)
             |WHERE rn = (n * p + 99) // 100 ORDER BY lang, p""".stripMargin)
    ),

    // Join-key skew diagnostic: heaviest key values with exact basis-point
    // shares — the pre-shuffle audit for salting decisions.
    QueryDef(
      "q87_skew_report",
      (s, dir) =>
        graft.engine.SkewTools.skewReport(t(s, dir, "orders"), "o_custkey", k = 20),
      Some("""WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
             |t AS (SELECT sum(n) AS tot FROM c)
             |SELECT o_custkey, n, CAST(n * 10000 // tot AS BIGINT) AS share_x10000
             |FROM c, t ORDER BY n DESC, o_custkey LIMIT 20""".stripMargin)
    ),

    // Vocabulary coverage: corpus top-50 vocab (count DESC, token ASC cut),
    // per-document in-vocab vs OOV occurrence counts.
    QueryDef(
      "q85_oov_rate",
      (s, dir) =>
        TextAnalysis.oovStats(t(s, dir, "documents"), "doc_id", "text", vocabSize = 50)
          .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
              |vc AS (SELECT token FROM toks GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 50),
              |j AS (SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS iv
              |      FROM toks t LEFT JOIN vc v USING (token))
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(iv) AS BIGINT) AS in_vocab,
              |       CAST(count(*) - sum(iv) AS BIGINT) AS oov,
              |       CAST((count(*) - sum(iv)) * 10000 // count(*) AS BIGINT) AS oov_pct_x100
              |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // SemDedup PRODUCTION config: Lloyd-refined centroids (kmeansIters = 2,
    // the default) instead of q89's raw first-nlist seeding. The oracle
    // replays both Lloyd rounds exactly — argmax-cosine assignment with the
    // deterministic cid tie-break, per-dim member mean CAST TO REAL (float
    // rounding absorbs double sum-order drift, same scheme as q74) — then
    // the in-cell pair verify.
    QueryDef(
      "q97_semdedup_refined",
      (s, dir) =>
        canonOut(Dedup.semDedupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          nlist = 8, minCosineX100 = 35, kmeansIters = 2)
          .orderBy("a_vec_id", "b_vec_id")),
      Some {
        def cos(x: String, y: String) =
          s"""(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q)
             | / (sqrt(list_reduce(list_transform(range(len($x)), i -> $x[i+1]::DOUBLE * $x[i+1]::DOUBLE), (p,q) -> p + q))
             |  * sqrt(list_reduce(list_transform(range(len($y)), i -> $y[i+1]::DOUBLE * $y[i+1]::DOUBLE), (p,q) -> p + q))))""".stripMargin
        def assign(cent: String, out: String) =
          s"""$out AS (SELECT vec_id, embedding, cid FROM (
             |    SELECT e.vec_id, e.embedding, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN $cent c)
             |  WHERE rn = 1)""".stripMargin
        def lloyd(asg: String, prev: String, out: String, m: String, n: String) =
          s"""$m AS (SELECT cid, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM $asg, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
             |$n AS (SELECT cid, list(mv ORDER BY i) AS cv FROM $m GROUP BY cid),
             |$out AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM $prev c LEFT JOIN $n n USING (cid))""".stripMargin
        s"""WITH cent0 AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 8),
           |${assign("cent0", "asg0")},
           |${lloyd("asg0", "cent0", "cent1", "m1", "n1")},
           |${assign("cent1", "asg1")},
           |${lloyd("asg1", "cent1", "cent2", "m2", "n2")},
           |${assign("cent2", "a")},
           |ok AS (SELECT cid FROM a GROUP BY cid HAVING count(*) <= 10000),
           |e AS (SELECT a.* FROM a JOIN ok USING (cid)),
           |p AS (SELECT x.cid, x.vec_id AS a_vec_id, y.vec_id AS b_vec_id,
           |        CAST(${cos("x.embedding", "y.embedding")} AS DECIMAL(16,12)) AS cs
           |      FROM e x JOIN e y ON x.cid = y.cid AND x.vec_id < y.vec_id)
           |SELECT cid, a_vec_id, b_vec_id, CAST(cs AS VARCHAR) AS cos_sim FROM p
           |WHERE cs * 100 >= 35
           |ORDER BY a_vec_id, b_vec_id""".stripMargin
      }
    ),

    // REAL real-world image format: PNG (signature, CRC-checked chunk walk,
    // zlib inflate, all five scanline filters) on a 7×3 RGBA payload. The
    // container round-trips through genuine deflate+filter encoding, but
    // the reconstructed pixels are text-derived (q47's scheme) so the
    // oracle re-derives every feature from the text alone.
    QueryDef(
      "q98_mm_png_decode",
      (s, dir) => {
        val withPayload = Multimodal.withPngPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 7, height = 3, channels = 4)
        Multimodal.pngStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some {
        def mm(c: Int, f: String) =
          s"CAST(list_$f(list_transform(range(21), i -> p[4*i + ${c + 1}])) AS INT)"
        """WITH px AS (SELECT doc_id,
          |  list_transform(range(84),
          |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
          |  FROM documents)
          |SELECT doc_id, CAST(7 AS INT) AS width, CAST(3 AS INT) AS height,
          |       CAST(21 AS BIGINT) AS n_pixels, CAST(4 AS INT) AS channels,
          |""".stripMargin +
          s"       ${mm(0, "min")} AS r_min, ${mm(0, "max")} AS r_max,\n" +
          s"       ${mm(1, "min")} AS g_min, ${mm(1, "max")} AS g_max,\n" +
          s"       ${mm(2, "min")} AS b_min, ${mm(2, "max")} AS b_max,\n" +
          "       CAST(list_sum(list_transform(range(21), i -> p[4*i+1] + p[4*i+2] + p[4*i+3])) AS BIGINT) AS bright_sum,\n" +
          "       CAST(list_sum(list_transform(range(21), i -> p[4*i+4])) AS BIGINT) AS a_sum\n" +
          "FROM px ORDER BY doc_id"
      }
    ),

    // Misra–Gries CERTIFICATE: the sketch's counter values are arrival-
    // order-dependent (never hashable), but its mathematical guarantee is
    // not — every token with true frequency > n/(capacity+1) MUST be
    // present with a count in [exact − ⌊n/(cap+1)⌋, exact]. The query
    // outputs exactly that guaranteed-frequent set with a `certified` bit
    // computed FROM the live sketch; the oracle derives the same set from
    // exact counts with certified pinned to 1. A broken MG implementation
    // (over-decrement, bad merge) flips bits and fails the hash.
    QueryDef(
      "q99_mg_certificate",
      (s, dir) => {
        val capacity = 40
        val docs = t(s, dir, "documents")
        val sketch = TextAnalysis.topTokensApprox(docs, "text", capacity)
        val exact = docs.select(explode(TextAnalysis.tokens("text")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("exact_n"))
        val n = exact.agg(sum("exact_n")).head().getLong(0)
        val slack = n / (capacity + 1) // integer deficit can never exceed the floor
        exact.filter(col("exact_n") * (capacity + 1) > n)
          .join(sketch, Seq("token"), "left")
          .select(col("token"), col("exact_n"),
            (col("min_count").isNotNull && col("min_count") <= col("exact_n") &&
              col("min_count") + slack >= col("exact_n")).cast("long").as("certified"))
          .orderBy("token")
      },
      Some(s"""WITH toks AS (SELECT unnest($duckToks) AS token FROM documents),
           |c AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY token),
           |t AS (SELECT sum(exact_n) AS n FROM c)
           |SELECT token, exact_n, CAST(1 AS BIGINT) AS certified
           |FROM c, t WHERE exact_n * 41 > n ORDER BY token""".stripMargin)
    ),

    // Batch twin of the streaming drift monitor: fixed-edge bin histograms
    // (EventStreams.binHistogram's exact integer bin arithmetic, clamped
    // edges) on two slices, cross-multiplied TV contributions per bin.
    QueryDef(
      "q100_hist_drift",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val baseH = graft.streaming.EventStreams.binHistogram(
          li.filter(col("l_returnflag") === "R"), "l_quantity", lo = 1, width = 50, nBuckets = 10)
        val headH = graft.streaming.EventStreams.binHistogram(
          li.filter(col("l_returnflag") =!= "R"), "l_quantity", lo = 1, width = 50, nBuckets = 10)
        graft.streaming.EventStreams.driftVsBase(baseH, headH).orderBy("bin")
      },
      Some("""WITH b AS (SELECT (least(greatest(CAST(l_quantity AS BIGINT), 1), 50) - 1) * 10 // 50 AS bin,
           |         CAST(count(*) AS BIGINT) AS n
           |       FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
           |h AS (SELECT (least(greatest(CAST(l_quantity AS BIGINT), 1), 50) - 1) * 10 // 50 AS bin,
           |         CAST(count(*) AS BIGINT) AS n
           |       FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1),
           |j AS (SELECT COALESCE(b.bin, h.bin) AS bin, COALESCE(b.n, 0) AS base_n, COALESCE(h.n, 0) AS head_n
           |      FROM b FULL OUTER JOIN h ON b.bin = h.bin),
           |t AS (SELECT sum(base_n) AS tb, sum(head_n) AS th FROM j)
           |SELECT bin, CAST(base_n AS BIGINT) AS base_n, CAST(head_n AS BIGINT) AS head_n,
           |       CAST(abs(base_n * th - head_n * tb) AS BIGINT) AS tv_contrib
           |FROM j, t ORDER BY bin""".stripMargin)
    ),

    // Domain cap (C4/RefinedWeb rule: no source contributes more than N
    // docs): unbiased per-group uniform subsample by the engine-portable
    // key hash, not a payload top-k.
    QueryDef(
      "q101_domain_cap",
      (s, dir) =>
        Sampling.capPerGroup(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", cap = 15)
          .orderBy("doc_id"),
      Some("""WITH r AS (SELECT doc_id, source,
           |  row_number() OVER (PARTITION BY source
           |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id)
           |    AS rank_in_group
           |  FROM documents)
           |SELECT doc_id, source, CAST(rank_in_group AS INT) AS rank_in_group
           |FROM r WHERE rank_in_group <= 15 ORDER BY doc_id""".stripMargin)
    ),

    // URL canonicalization: the crawl-ingest map stage producing dedup/
    // domain-cap keys. The synthetic URL fires every rule (mixed-case host,
    // explicit :443, unsorted params, utm_ tracking param, fragment); the
    // oracle states the expected canonical form directly — the Spark side
    // genuinely parses and rebuilds.
    QueryDef(
      "q102_url_canonical",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val withUrl = docs.select(col("doc_id"),
          UrlTools.syntheticUrl(col("source"), col("doc_id"), col("lang")).as("url"))
        UrlTools.withCanonicalUrl(withUrl, "url").orderBy("doc_id")
      },
      Some("""SELECT doc_id,
           |  'https://WWW.' || upper(source) || '.Example.COM:443/docs/' || CAST(doc_id AS VARCHAR)
           |    || '?utm_source=feed&b=' || lang || '&a=1#sec' || CAST(doc_id % 2 AS VARCHAR) AS url,
           |  'https://www.' || lower(source) || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           |    || '?a=1&b=' || lang AS canon_url,
           |  'example.com' AS domain
           |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Token-rarity quality score: rank-based surprisal stand-in (mean rank
    // of each doc's tokens in the corpus top-50 vocabulary, OOV = rank 51)
    // — integer-exact where an LM log-prob never would be.
    QueryDef(
      "q103_rarity_score",
      (s, dir) =>
        TextAnalysis.rarityScore(t(s, dir, "documents"), "doc_id", "text", vocabSize = 50)
          .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
           |vc AS (SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rank
           |       FROM toks GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 50),
           |j AS (SELECT t.doc_id, COALESCE(v.rank, 51) AS rank FROM toks t LEFT JOIN vc v USING (token))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(rank) AS BIGINT) AS sum_rank,
           |       CAST(sum(rank) * 100 // count(*) AS BIGINT) AS mean_rank_x100
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // Curriculum / quality tiers: exact quartile thresholds of the rarity
    // score (percentile_disc rank arithmetic, 3 longs to the driver), then
    // a pure map-stage bucket assignment — no global sort over the corpus.
    QueryDef(
      "q104_quality_buckets",
      (s, dir) => {
        val scored = TextAnalysis.rarityScore(t(s, dir, "documents"), "doc_id", "text", vocabSize = 50)
        val thresholds = Stats.exactThresholds(scored, "mean_rank_x100", Seq(25, 50, 75))
        Stats.bucketByThresholds(scored, "mean_rank_x100", thresholds)
          .select("doc_id", "mean_rank_x100", "bucket")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
           |vc AS (SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rank
           |       FROM toks GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 50),
           |j AS (SELECT t.doc_id, COALESCE(v.rank, 51) AS rank FROM toks t LEFT JOIN vc v USING (token)),
           |s AS (SELECT doc_id, CAST(sum(rank) * 100 // count(*) AS BIGINT) AS mean_rank_x100
           |      FROM j GROUP BY doc_id),
           |r AS (SELECT mean_rank_x100 AS v, row_number() OVER (ORDER BY mean_rank_x100) AS rn,
           |             count(*) OVER () AS n FROM s),
           |t AS (SELECT max(CASE WHEN rn = (n * 25 + 99) // 100 THEN v END) AS t25,
           |             max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS t50,
           |             max(CASE WHEN rn = (n * 75 + 99) // 100 THEN v END) AS t75 FROM r)
           |SELECT doc_id, mean_rank_x100,
           |  CAST(1 + (mean_rank_x100 > t25)::INT + (mean_rank_x100 > t50)::INT
           |         + (mean_rank_x100 > t75)::INT AS INT) AS bucket
           |FROM s, t ORDER BY doc_id""".stripMargin)
    ),

    // Product quantization ADC top-k: m=2 subspace codebooks (L2 Lloyd,
    // deterministic seeding), code assignment by squared-L2 argmin, probe
    // scored by additive distance-table lookups. The oracle replays BOTH
    // subspace Lloyd rounds and the fold arithmetic exactly — squared L2
    // decomposes additively across subspaces, which is the whole trick.
    QueryDef(
      "q105_pq_adc_topk",
      (s, dir) =>
        canonOut(Similarity.pqAdcTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, probeId = 0L, k = 10, m = 2, kcent = 4, iters = 1)),
      Some {
        def sq(x: String, y: String) =
          s"""list_reduce(list_transform(range(32),
             |  i -> ($x[i+1]::DOUBLE - $y[i+1]::DOUBLE) * ($x[i+1]::DOUBLE - $y[i+1]::DOUBLE)),
             |  (p,q) -> p + q)""".stripMargin
        // one L2-Lloyd round for subspace j over slice [lo:hi] (1-based)
        def subspace(j: Int, lo: Int, hi: Int) =
          s"""cb${j}0 AS (SELECT vec_id AS cid, embedding[$lo:$hi] AS cv
             |  FROM embeddings ORDER BY vec_id LIMIT 4),
             |asg${j}0 AS (SELECT vec_id, sub, cid FROM (
             |    SELECT e.vec_id, e.embedding[$lo:$hi] AS sub, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${sq(s"e.embedding[$lo:$hi]", "c.cv")} ASC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN cb${j}0 c)
             |  WHERE rn = 1),
             |m${j} AS (SELECT cid, i, CAST(avg(sub[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM asg${j}0, (SELECT unnest(range(32)) AS i) ix GROUP BY cid, i),
             |n${j} AS (SELECT cid, list(mv ORDER BY i) AS cv FROM m${j} GROUP BY cid),
             |cb${j}1 AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM cb${j}0 c LEFT JOIN n${j} n USING (cid)),
             |code${j} AS (SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${sq(s"e.embedding[$lo:$hi]", "c.cv")} ASC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN cb${j}1 c)
             |  WHERE rn = 1),
             |dt${j} AS (SELECT c.cid, ${sq(s"p.pv[$lo:$hi]", "c.cv")} AS d
             |  FROM cb${j}1 c, (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0) p)""".stripMargin
        s"""WITH ${subspace(0, 1, 32)},
           |${subspace(1, 33, 64)},
           |r AS (SELECT c0.vec_id, CAST(d0.d + d1.d AS DECIMAL(16,12)) AS dist
           |  FROM code0 c0
           |  JOIN code1 c1 USING (vec_id)
           |  JOIN dt0 d0 ON c0.cid = d0.cid
           |  JOIN dt1 d1 ON c1.cid = d1.cid
           |  WHERE c0.vec_id <> 0)
           |SELECT vec_id, CAST(dist AS VARCHAR) AS adc_dist
           |FROM r ORDER BY dist, vec_id LIMIT 10""".stripMargin
      }
    ),

    // The composed IVF+PQ search: L2 coarse quantizer prunes to nprobe
    // inverted lists, PQ ADC scores the survivors. Oracle replays the
    // coarse assignment, probe-list selection, both subspace Lloyds, and
    // the additive lookup arithmetic.
    QueryDef(
      "q106_ivfpq_topk",
      (s, dir) =>
        canonOut(Similarity.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, probeId = 0L, k = 10, nlist = 4, nprobe = 2,
          m = 2, kcent = 4, pqIters = 1, coarseIters = 0)),
      Some {
        def sq(n: Int, x: String, y: String) =
          s"""list_reduce(list_transform(range($n),
             |  i -> ($x[i+1]::DOUBLE - $y[i+1]::DOUBLE) * ($x[i+1]::DOUBLE - $y[i+1]::DOUBLE)),
             |  (p,q) -> p + q)""".stripMargin
        def subspace(j: Int, lo: Int, hi: Int) =
          s"""cb${j}0 AS (SELECT vec_id AS cid, embedding[$lo:$hi] AS cv
             |  FROM embeddings ORDER BY vec_id LIMIT 4),
             |asg${j}0 AS (SELECT vec_id, sub, cid FROM (
             |    SELECT e.vec_id, e.embedding[$lo:$hi] AS sub, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${sq(32, s"e.embedding[$lo:$hi]", "c.cv")} ASC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN cb${j}0 c)
             |  WHERE rn = 1),
             |m${j} AS (SELECT cid, i, CAST(avg(sub[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM asg${j}0, (SELECT unnest(range(32)) AS i) ix GROUP BY cid, i),
             |n${j} AS (SELECT cid, list(mv ORDER BY i) AS cv FROM m${j} GROUP BY cid),
             |cb${j}1 AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM cb${j}0 c LEFT JOIN n${j} n USING (cid)),
             |code${j} AS (SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${sq(32, s"e.embedding[$lo:$hi]", "c.cv")} ASC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN cb${j}1 c)
             |  WHERE rn = 1),
             |dt${j} AS (SELECT c.cid, ${sq(32, s"p.pv[$lo:$hi]", "c.cv")} AS d
             |  FROM cb${j}1 c, probe p)""".stripMargin
        s"""WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
           |coarse AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 4),
           |pl AS (SELECT cid FROM (
           |    SELECT c.cid, ${sq(64, "p.pv", "c.cv")} AS d FROM coarse c, probe p)
           |  ORDER BY d, cid LIMIT 2),
           |casg AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${sq(64, "e.embedding", "c.cv")} ASC, c.cid) AS rn
           |    FROM embeddings e CROSS JOIN coarse c)
           |  WHERE rn = 1),
           |cand AS (SELECT vec_id FROM casg JOIN pl USING (cid)),
           |${subspace(0, 1, 32)},
           |${subspace(1, 33, 64)},
           |r AS (SELECT c0.vec_id, CAST(d0.d + d1.d AS DECIMAL(16,12)) AS dist
           |  FROM code0 c0
           |  JOIN cand USING (vec_id)
           |  JOIN code1 c1 USING (vec_id)
           |  JOIN dt0 d0 ON c0.cid = d0.cid
           |  JOIN dt1 d1 ON c1.cid = d1.cid
           |  WHERE c0.vec_id <> 0)
           |SELECT vec_id, CAST(dist AS VARCHAR) AS adc_dist
           |FROM r ORDER BY dist, vec_id LIMIT 10""".stripMargin
      }
    ),

    // Real BPE token counting, CERTIFICATE form (retires the r9 no_oracle
    // the way q324 retired q05's): no SQL engine replays the iterative
    // merge loop, but two claims about the REAL encoder's output are
    // oracle-checkable per document. (a) Round trip: the token stream
    // concatenated back equals the whitespace-stripped text — Spark emits
    // md5 of the concatenated BPE tokens, DuckDB computes md5 of the
    // regexp-stripped text directly; equal hashes prove the distributed
    // encode lost nothing, doc by doc. (b) Count sandwich: every word is
    // at least one token and merges only ever shrink, so
    // n_words <= n_bpe_tokens <= stripped code-point length — emitted as
    // certified bits the oracle pins at 1 (q324 pattern: Spark COMPUTES
    // the inequality from live encoder output, the oracle states it must
    // hold). Exact merge algebra stays spec-gated (OperatorsSpec:
    // hand-computed corpus, rank-first order, determinism).
    QueryDef(
      "q107_bpe_tokens",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Bpe.train(docs, "text", numMerges = 30)
        Bpe.encodeTokens(docs, "doc_id", "text", merges)
          .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("text")),
            Seq("doc_id"))
          .select(col("doc_id"),
            md5(concat_ws("", col("bpe_tokens"))).as("roundtrip_md5"),
            (col("n_bpe_tokens") >=
              size(expr("filter(split(coalesce(text, ''), '\\\\s+'), x -> x <> '')")))
              .cast("long").as("ge_words"),
            (col("n_bpe_tokens") <=
              length(regexp_replace(coalesce(col("text"), lit("")), "\\s+", "")))
              .cast("long").as("le_wordchars"))
          .orderBy("doc_id")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  md5(coalesce(regexp_replace(text, '\s+', '', 'g'), '')) AS roundtrip_md5,
             |  CAST(1 AS BIGINT) AS ge_words,
             |  CAST(1 AS BIGINT) AS le_wordchars
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Count-based bigram LM table: top-3 next tokens per prefix with
    // counts — the autocomplete / contamination-probe artifact. Pure
    // relational: generate, count, rank (map-side WindowGroupLimit prune).
    QueryDef(
      "q108_bigram_model",
      (s, dir) =>
        TextAnalysis.ngramModel(t(s, dir, "documents"), "text", n = 2, k = 3)
          .orderBy("prefix", "rank"),
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
           |pairs AS (SELECT unnest(list_transform(range(greatest(len(t) - 1, 0)),
           |    i -> struct_pack(prefix := t[i+1], nxt := t[i+2]))) AS g FROM toks),
           |c AS (SELECT g.prefix AS prefix, g.nxt AS "next", CAST(count(*) AS BIGINT) AS cnt
           |      FROM pairs GROUP BY 1, 2),
           |r AS (SELECT *, row_number() OVER (PARTITION BY prefix ORDER BY cnt DESC, "next" ASC) AS rank
           |      FROM c)
           |SELECT prefix, CAST(rank AS BIGINT) AS rank, "next", cnt
           |FROM r WHERE rank <= 3 ORDER BY prefix, rank""".stripMargin)
    ),

    // Compression-ratio quality signal (RedPajama/CCNet-style repetition
    // detector), now oracle-gated (retires the r9 no_oracle): the exact
    // Deflater stream is engine-specific, but three claims are checkable.
    // Per real document: raw_bytes (UTF-8 length — DuckDB strlen replays
    // it exactly) and comp_ok = compression_pct within the zlib worst-case
    // bound floor((raw + raw/3276 + 13)·100 / raw) (deflateBound algebra:
    // deflate can only inflate by ~raw/4096 + raw/16384 + 13 bytes of
    // framing), pinned at 1. Plus three in-query literal fixtures — a
    // repeated-bigram run, LCG-drawn common-word prose, LCG printable
    // noise — whose EXACT Deflater percentages are pinned as a VALUES
    // oracle (0 < 35 < 83): the repetitive << prose << incompressible
    // ordering the operator exists to detect, now hash-gated instead of
    // spec-only. Per-doc compression_pct itself is not SQL-replayable and
    // is emitted NULL on document rows; the fixture rows carry it.
    QueryDef(
      "q109_compression_ratio",
      (s, dir) => {
        val real = TextAnalysis.compressionRatio(t(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id").cast("long").as("doc_id"), col("raw_bytes"),
            lit(null).cast("long").as("compression_pct"),
            when(col("compression_pct").isNull, 1L)
              .otherwise((col("compression_pct") <=
                expr("(raw_bytes * 100 + (raw_bytes div 3276) * 100 + 1300) div raw_bytes"))
                .cast("long")).as("comp_ok"))
        val sp = real.sparkSession
        import sp.implicits._
        val fixt = TextAnalysis.compressionRatio(
          q109Fixtures.toDF("doc_id", "text"), "doc_id", "text")
          .select(col("doc_id"), col("raw_bytes"), col("compression_pct"),
            lit(1L).as("comp_ok"))
        real.unionByName(fixt).orderBy("doc_id")
      },
      Some {
        // The fixture rows' expected Deflater(6) percentages are COMPUTED
        // HERE, at oracle-generation time, with the same java.util.zip the
        // Spark side runs — deflate byte counts are an implementation
        // detail of the JDK's bundled zlib, not a stable contract, so
        // hard-coded literals would break on a JDK update with no code
        // change (ADVICE r11). The repetitive << prose << incompressible
        // ordering — the discrimination the operator exists to provide —
        // stays a hard assertion, so a zlib that stopped separating the
        // classes fails loudly at generation instead of silently passing.
        val vals = q109Fixtures.map { case (id, text) =>
          (id, text.getBytes("UTF-8").length.toLong, deflatePct(text))
        }
        val byId = vals.map(v => v._1 -> v._3).toMap
        require(byId(-1L) < byId(-2L) && byId(-2L) < byId(-3L),
          s"q109 fixtures must order repetitive < prose < incompressible, got $byId")
        val rows = vals.map { case (id, raw, pct) =>
          s"(CAST($id AS BIGINT), CAST($raw AS BIGINT), CAST($pct AS BIGINT), CAST(1 AS BIGINT))"
        }.mkString(",\n             |  ")
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CASE WHEN text IS NULL OR text = '' THEN NULL
           |       ELSE CAST(strlen(text) AS BIGINT) END AS raw_bytes,
           |  CAST(NULL AS BIGINT) AS compression_pct,
           |  CAST(1 AS BIGINT) AS comp_ok
           |FROM documents
           |UNION ALL
           |SELECT * FROM (VALUES
           |  $rows)
           |  AS fixt(doc_id, raw_bytes, compression_pct, comp_ok)
           |ORDER BY doc_id""".stripMargin
      }
    ),

    // Bloom-prefiltered incremental dedup: identical semantics (and
    // oracle) to q94's exact anti-join — the sketch changes the COST
    // shape (bloom-negative batch rows never reach the join), never the
    // answer, which is exactly what this gate proves.
    QueryDef(
      "q110_dedup_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val replay = docs.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val novel = docs.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text"))
        val novelDup = novel.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val batch = replay.unionByName(novel).unionByName(novelDup)
        Dedup.dedupAgainstCorpusBloom(batch, docs, "doc_id", "text",
          expectedCorpusItems = 20000L, fpp = 0.01)
          .select(col("doc_id"), md5(col("text")).as("content_hash"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (SELECT md5(text) AS h FROM documents GROUP BY 1),
             |replay AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 3),
             |novel AS (SELECT doc_id + 2000000 AS doc_id, text || ' fresh' AS text FROM documents WHERE doc_id % 10 = 4),
             |novel2 AS (SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text FROM documents WHERE doc_id % 10 = 4),
             |batch AS (SELECT * FROM replay UNION ALL SELECT * FROM novel UNION ALL SELECT * FROM novel2),
             |fresh AS (SELECT b.doc_id, md5(b.text) AS h FROM batch b
             |          LEFT JOIN corpus c ON md5(b.text) = c.h WHERE c.h IS NULL),
             |win AS (SELECT doc_id, h, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM fresh)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, h AS content_hash
             |FROM win WHERE rn = 1 ORDER BY doc_id""".stripMargin)
    ),

    // BM25 keyword retrieval: one corpus-stats reduction broadcast back,
    // per-doc scoring as a pure map stage, TakeOrdered top-k. Score
    // rendered at 4 decimals — ln() is the one libm call whose last ulp
    // can differ across engines (measured: 12 of 15000 df values), and a
    // 1-ulp input flips a 4-decimal rounding with probability ~1e-12.
    QueryDef(
      "q111_bm25_topk",
      (s, dir) =>
        canonOut(TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("spark", "vector", "merge"), k = 25)),
      Some {
        val terms = Seq("spark", "vector", "merge")
        val dfs = terms.indices.map(i =>
          s"CAST(sum(CASE WHEN list_contains(t, '${terms(i)}') THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS df$i").mkString(", ")
        val tfs = terms.indices.map(i =>
          s"CAST(len(list_filter(t, x -> x = '${terms(i)}')) AS DOUBLE) AS tf$i").mkString(", ")
        val score = terms.indices.map(i =>
          s"(ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
            s"(tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (sumdl / n)))))").mkString(" + ")
        val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
        s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
           |base AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM toks),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl, $dfs FROM base),
           |tf AS (SELECT doc_id, dl, $tfs FROM base),
           |scored AS (SELECT doc_id, CAST($score AS DECIMAL(16,4)) AS sc
           |           FROM tf, stats WHERE ($anyTf) > 0)
           |SELECT doc_id, CAST(sc AS VARCHAR) AS score
           |FROM scored ORDER BY sc DESC, doc_id LIMIT 25""".stripMargin
      }
    ),

    // Count-LM fluency: q103's rarity signal lifted to bigrams through
    // the q108 LM table — mean model-rank of each observed continuation,
    // unseen = k+1. Integer-exact (no float log-prob).
    QueryDef(
      "q112_lm_fluency",
      (s, dir) =>
        TextAnalysis.lmFluencyScore(t(s, dir, "documents"), "doc_id", "text", n = 2, k = 5)
          .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
           |pairs AS (SELECT doc_id, unnest(list_transform(range(greatest(len(t) - 1, 0)),
           |    i -> struct_pack(prefix := t[i+1], nxt := t[i+2]))) AS g FROM toks WHERE len(t) >= 2),
           |c AS (SELECT g.prefix AS prefix, g.nxt AS nxt, count(*) AS cnt FROM pairs GROUP BY 1, 2),
           |model AS (SELECT prefix, nxt, rank FROM (
           |    SELECT prefix, nxt, row_number() OVER (PARTITION BY prefix ORDER BY cnt DESC, nxt ASC) AS rank
           |    FROM c) WHERE rank <= 5),
           |j AS (SELECT p.doc_id, m.rank FROM pairs p
           |      LEFT JOIN model m ON p.g.prefix = m.prefix AND p.g.nxt = m.nxt)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           |       CAST(sum(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_model,
           |       CAST(sum(COALESCE(rank, 6)) AS BIGINT) AS sum_rank,
           |       CAST(sum(COALESCE(rank, 6)) * 100 // count(*) AS BIGINT) AS mean_rank_x100
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // Duplicated-span coverage (exact-substring-dedup signal): per-doc
    // fraction of sliding 5-token windows that occur verbatim in >= 2
    // docs. Grams shuffle as md5 hashes; the dup-gram table is filtered
    // to freq >= 2 BEFORE the join back.
    QueryDef(
      "q113_dup_spans",
      (s, dir) =>
        Dedup.duplicatedSpanStats(t(s, dir, "documents"), "doc_id", "text", n = 5)
          .filter(col("n_grams") > 0)
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
             |g AS (SELECT doc_id, unnest(list_transform(range(len(t) - 4),
             |    i -> md5(array_to_string(t[i+1:i+5], ' ')))) AS gh FROM toks WHERE len(t) >= 5),
             |d AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
             |j AS (SELECT g.doc_id, CASE WHEN d.gh IS NULL THEN 0 ELSE 1 END AS dup
             |      FROM g LEFT JOIN d ON g.gh = d.gh)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |       CAST(sum(dup) AS BIGINT) AS dup_grams,
             |       CAST(sum(dup) * 10000 // count(*) AS BIGINT) AS dup_pct_x100
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // Image perceptual hash (aHash) over REAL decoded P6 pixels — 8x8
    // NN-sampled grid, integer brightness, strictly-above-floor-mean bits.
    // 8x8 source dims make the NN map the identity here so the oracle
    // stays readable; the non-square mapping is spec-exercised. The 64-bit
    // hash surfaces as two unsigned 32-bit halves (BIGINT-safe bit 63).
    QueryDef(
      "q114_mm_ahash",
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 8)
        Multimodal.ppmAHash(withPayload, "doc_id", "payload", grid = 8).orderBy("doc_id")
      },
      Some("""WITH px AS (SELECT doc_id,
             |    list_transform(range(192), b -> ascii(substr(text, CAST(b % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents),
             |cg AS (SELECT doc_id, list_transform(range(64), j -> p[3*j+1] + p[3*j+2] + p[3*j+3]) AS gray FROM px),
             |m AS (SELECT doc_id, gray, list_sum(gray) // 64 AS mean FROM cg)
             |SELECT doc_id,
             |  CAST(list_sum(list_transform(range(32), j -> CASE WHEN gray[j+33] > mean THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS ahash_hi,
             |  CAST(list_sum(list_transform(range(32), j -> CASE WHEN gray[j+1] > mean THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS ahash_lo
             |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // Cross-doc duplicated-span scrub: the ACTION q113 signals — cut
    // every token covered by a 5-token window occurring in >= 2 docs,
    // rejoin survivors in order. Fully-scrubbed docs surface with zero
    // kept tokens rather than vanishing.
    QueryDef(
      "q116_scrub_dup_spans",
      (s, dir) =>
        orderedOut(Dedup.scrubDuplicatedSpans(t(s, dir, "documents"),
          "doc_id", "text", n = 5, minDocs = 2), "doc_id"),
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents),
             |g AS (SELECT doc_id, unnest(range(len(w) - 4)) AS i, w FROM d WHERE len(w) >= 5),
             |gh AS (SELECT doc_id, i, md5(array_to_string(w[i+1:i+5], ' ')) AS h FROM g),
             |dup AS (SELECT h FROM gh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT gh.doc_id, gh.i + u.u AS j
             |        FROM gh JOIN dup USING (h), (SELECT unnest(range(5)) AS u) u),
             |tok AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS j FROM d),
             |keep AS (SELECT t.doc_id, t.tok, t.j FROM tok t
             |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.j = c.j WHERE c.doc_id IS NULL),
             |agg AS (SELECT doc_id, count(*) AS kept, string_agg(tok, ' ' ORDER BY j) AS ct
             |        FROM keep GROUP BY doc_id)
             |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
             |       CAST(COALESCE(a.kept, 0) AS BIGINT) AS kept_tokens,
             |       COALESCE(a.ct, '') AS clean_text
             |FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin)
    ),

    // Benchmark decontamination report: per-eval-doc share of 5-token
    // windows found verbatim in the train split. Eval = the held-out
    // tenth plus verbatim replays of train docs (known-contaminated
    // positives); train grams collapse to a DISTINCT hash set pre-join.
    QueryDef(
      "q117_eval_overlap",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val train = docs.filter(col("doc_id") % 10 =!= 7)
        val evalDf = docs.filter(col("doc_id") % 10 === 7)
          .select(col("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 2)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Dedup.evalOverlapStats(evalDf, train, "doc_id", "text", n = 5)
          .orderBy("doc_id")
      },
      Some("""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7
             |            UNION ALL
             |            SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 2),
             |trw AS (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
             |        FROM documents WHERE doc_id % 10 <> 7),
             |tg0 AS (SELECT unnest(range(len(w) - 4)) AS i, w FROM trw WHERE len(w) >= 5),
             |tg AS (SELECT DISTINCT md5(array_to_string(w[i+1:i+5], ' ')) AS h FROM tg0),
             |evw AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM ev),
             |eg0 AS (SELECT doc_id, unnest(range(len(w) - 4)) AS i, w FROM evw WHERE len(w) >= 5),
             |eg AS (SELECT doc_id, md5(array_to_string(w[i+1:i+5], ' ')) AS h FROM eg0),
             |sc AS (SELECT e.doc_id, count(*) AS n_grams,
             |              sum(CASE WHEN t.h IS NULL THEN 0 ELSE 1 END) AS hits
             |       FROM eg e LEFT JOIN tg t USING (h) GROUP BY e.doc_id)
             |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(hits AS BIGINT) AS hit_grams,
             |       CAST(hits * 10000 // n_grams AS BIGINT) AS contaminated_pct_x100
             |FROM sc
             |UNION ALL
             |SELECT doc_id, 0, 0, 0 FROM evw WHERE len(w) < 5
             |ORDER BY doc_id""".stripMargin)
    ),

    // REAL 24-bit BMP decode: bottom-up rows, BGR order, 4-byte row
    // padding. 8-wide payloads make rowSize = 24 (no padding) so the
    // oracle's byte indexing stays linear; the padded + corrupt cases are
    // spec-exercised. top_row_bright proves the bottom-up flip: the top
    // image row lives in the LAST stored row.
    QueryDef(
      "q118_mm_bmp_decode",
      (s, dir) => {
        val withPayload = Multimodal.withBmpPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 5)
        Multimodal.bmpStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH px AS (SELECT doc_id,
             |    list_transform(range(120), b -> ascii(substr(text, CAST(b % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents)
             |SELECT doc_id, CAST(8 AS INT) AS width, CAST(5 AS INT) AS height,
             |       CAST(40 AS BIGINT) AS n_pixels,
             |       CAST(list_sum(list_transform(range(40), k -> p[3*k+3])) AS BIGINT) AS r_sum,
             |       CAST(list_sum(list_transform(range(40), k -> p[3*k+2])) AS BIGINT) AS g_sum,
             |       CAST(list_sum(list_transform(range(40), k -> p[3*k+1])) AS BIGINT) AS b_sum,
             |       CAST(list_sum(list_transform(range(24), o -> p[97+o])) AS BIGINT) AS top_row_bright
             |FROM px ORDER BY doc_id""".stripMargin)
    ),

    // Signal-level audio features on the REAL RIFF/WAVE parse: strict
    // sign-change zero crossings + total energy, both integer-exact; the
    // oracle replays the q90 generator math.
    QueryDef(
      "q119_wav_signal",
      (s, dir) => {
        val withPayload = Multimodal.withWavPayload(
          t(s, dir, "documents"), "doc_id", "text", nSamples = 256, sampleRate = 8000)
        Multimodal.wavSignalFeatures(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH smp AS (SELECT doc_id,
             |  list_transform(range(256),
             |    j -> ((ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) * 131 + 7*j) % 65536 - 32768) AS s
             |  FROM documents)
             |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(256 AS BIGINT) AS n_samples,
             |       CAST(list_sum(list_transform(range(255), i -> CASE WHEN s[i+1] * s[i+2] < 0 THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
             |       CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy_sum
             |FROM smp ORDER BY doc_id""".stripMargin)
    ),

    // HLL CERTIFICATE — q99's scheme applied to approx_count_distinct:
    // the sketch value itself is engine-specific (never hashable), but
    // HLL++ at rsd=0.05 stays within 3σ = 15% of truth with overwhelming
    // probability; the `certified` bit (|approx − exact|·20 ≤ 3·exact,
    // integer algebra) is computed FROM the live sketch and the oracle
    // pins 1 alongside the engine-portable exact counts.
    QueryDef(
      "q120_hll_certificate",
      (s, dir) => {
        def cert(df: DataFrame, dim: String, c: Column): DataFrame =
          df.agg(
            approx_count_distinct(c, 0.05).as("__a"),
            countDistinct(c).as("exact_n"))
            .select(lit(dim).as("dim"), col("exact_n").cast("long").as("exact_n"),
              (abs(col("__a") - col("exact_n")) * 20 <= col("exact_n") * 3)
                .cast("long").as("certified"))
        val toks = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens("text")).as("token"))
        cert(toks, "doc_tokens", col("token"))
          .unionByName(cert(t(s, dir, "lineitem"), "l_partkey", col("l_partkey")))
          .unionByName(cert(t(s, dir, "orders"), "o_custkey", col("o_custkey")))
          .orderBy("dim")
      },
      Some(s"""WITH a AS (SELECT 'doc_tokens' AS dim, CAST(count(DISTINCT token) AS BIGINT) AS exact_n
             |           FROM (SELECT unnest($duckToks) AS token FROM documents)),
             |b AS (SELECT 'l_partkey' AS dim, CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem),
             |c AS (SELECT 'o_custkey' AS dim, CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
             |SELECT dim, exact_n, CAST(1 AS BIGINT) AS certified FROM (
             |  SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c)
             |ORDER BY dim""".stripMargin)
    ),

    // Image exact-dup grouping on the q114 perceptual hash: replayed docs
    // produce byte-identical images under different ids; grouping on
    // (hi, lo) finds them with min-id winners — the multimodal twin of
    // q30's content dedup, one hash-key shuffle.
    QueryDef(
      "q121_image_dup_groups",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val wide = docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val hashed = Multimodal.ppmAHash(
          Multimodal.withPpmPayload(wide, "doc_id", "text", width = 8, height = 8),
          "doc_id", "payload", grid = 8)
        hashed.groupBy("ahash_hi", "ahash_lo")
          .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("keep_id"))
          .filter(col("group_size") > 1)
          .orderBy("keep_id")
      },
      Some("""WITH wide AS (SELECT doc_id, text FROM documents
             |              UNION ALL
             |              SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
             |px AS (SELECT doc_id,
             |    list_transform(range(192), b -> ascii(substr(text, CAST(b % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM wide),
             |cg AS (SELECT doc_id, list_transform(range(64), j -> p[3*j+1] + p[3*j+2] + p[3*j+3]) AS gray FROM px),
             |m AS (SELECT doc_id, gray, list_sum(gray) // 64 AS mean FROM cg),
             |h AS (SELECT doc_id,
             |  CAST(list_sum(list_transform(range(32), j -> CASE WHEN gray[j+33] > mean THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS ahash_hi,
             |  CAST(list_sum(list_transform(range(32), j -> CASE WHEN gray[j+1] > mean THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS ahash_lo
             |  FROM m)
             |SELECT ahash_hi, ahash_lo, CAST(count(*) AS BIGINT) AS group_size,
             |       CAST(min(doc_id) AS BIGINT) AS keep_id
             |FROM h GROUP BY ahash_hi, ahash_lo HAVING count(*) > 1
             |ORDER BY keep_id""".stripMargin)
    ),

    // Incremental NEAR-dup against the frozen corpus: batch bands join
    // pre-banded (cap-bounded) corpus bands — the nightly-crawl twin of
    // q32, asymmetric by design. Batch = verbatim replays (guaranteed
    // band hits) + one-token-appended perturbations (partial hits).
    QueryDef(
      "q122_near_dup_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = docs.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 6)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" zz")).as("text")))
        Dedup.nearDupAgainstCorpus(batch, docs, "doc_id", "text",
          numHashes = 8, bandSize = 2, shingleK = 3, maxPostings = 500)
          .orderBy("batch_id", "corpus_id")
      },
      Some {
        val p = Dedup.MinHashP
        val sigs = Dedup.minHashCoeffs(8).zipWithIndex
          .map { case ((a, b), s) => s"min((h * $a + $b) % $p) AS s$s" }.mkString(", ")
        def bands(sig: String) = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band_idx, md5(s${2 * b}::VARCHAR || ',' || s${2 * b + 1}::VARCHAR) AS band_hash FROM $sig")
          .mkString("\n  UNION ALL ")
        def shing(src: String) =
          s"""SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 3, 0) + 1),
             |         i -> array_to_string(w[i+1:i+3], ' '))) AS sh
             |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $src)""".stripMargin
        s"""WITH batch_src AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 5
           |                   UNION ALL
           |                   SELECT doc_id + 2000000 AS doc_id, text || ' zz' AS text FROM documents WHERE doc_id % 10 = 6),
           |cshing AS (${shing("documents")}),
           |bshing AS (${shing("batch_src")}),
           |ch AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM cshing),
           |bh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM bshing),
           |csig AS (SELECT doc_id, $sigs FROM ch GROUP BY doc_id),
           |bsig AS (SELECT doc_id, $sigs FROM bh GROUP BY doc_id),
           |cband AS (${bands("csig")}),
           |bband AS (${bands("bsig")}),
           |ccap AS (SELECT band_idx, band_hash, doc_id AS corpus_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY band_idx, band_hash ORDER BY doc_id) AS rn
           |    FROM cband) WHERE rn <= 500)
           |SELECT DISTINCT b.doc_id AS batch_id, c.corpus_id
           |FROM bband b JOIN ccap c USING (band_idx, band_hash)
           |ORDER BY batch_id, corpus_id""".stripMargin
      }
    ),

    // Token-budget curation cut: best-quality-first prefix under a 10k
    // token budget, running total via the q76 two-phase distributed scan
    // (never a single-task global window). Quality = q103 rarity rank;
    // the composite order key keeps the prefix sum's total order unique.
    QueryDef(
      "q123_token_budget_cut",
      (s, dir) => {
        val scored = TextAnalysis.rarityScore(t(s, dir, "documents"), "doc_id", "text", vocabSize = 50)
          .withColumn("__ord", col("mean_rank_x100") * 10000000L + col("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("mean_rank_x100"), col("__ord"))
        Sampling.selectByTokenBudget(scored, "__ord", "n_tokens", budget = 10000L)
          .drop("__ord")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
           |vc AS (SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rank
           |       FROM toks GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 50),
           |j AS (SELECT t.doc_id, COALESCE(v.rank, 51) AS rank FROM toks t LEFT JOIN vc v USING (token)),
           |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |             CAST(sum(rank) * 100 // count(*) AS BIGINT) AS mean_rank_x100
           |      FROM j GROUP BY doc_id),
           |c AS (SELECT doc_id, n_tokens, mean_rank_x100,
           |             CAST(sum(n_tokens) OVER (ORDER BY mean_rank_x100, doc_id
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM r)
           |SELECT doc_id, n_tokens, mean_rank_x100, cum_tokens
           |FROM c WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin)
    ),

    // REAL WARC container parse (ISO 28500 — the CommonCrawl distribution
    // format): length-framed records walked byte-by-byte, headers parsed,
    // every payload byte visited (byte_sum). Three records per blob with
    // varying lengths; the oracle re-derives all fields from the text.
    QueryDef(
      "q124_warc_records",
      (s, dir) => {
        val withPayload = Warc.withWarcPayload(
          t(s, dir, "documents"), "doc_id", "text", nRecords = 3)
        Warc.warcRecords(withPayload, "doc_id", "payload")
          .orderBy("doc_id", "rec_idx")
      },
      Some("""WITH r AS (SELECT doc_id, text, unnest([0, 1, 2]) AS rec_idx FROM documents)
             |SELECT doc_id, CAST(rec_idx AS INT) AS rec_idx, 'response' AS warc_type,
             |       'http://corpus.invalid/doc/' || doc_id || '/' || rec_idx AS target_uri,
             |       CAST(16 + 7 * rec_idx % 32 AS BIGINT) AS content_length,
             |       CAST(list_sum(list_transform(range(16 + 7 * rec_idx % 32),
             |         k -> ascii(substr(text, CAST((rec_idx + k) % length(text) + 1 AS INT), 1)) % 256)) AS BIGINT) AS byte_sum
             |FROM r ORDER BY doc_id, rec_idx""".stripMargin)
    ),

    // Magic-byte MIME sniffing over a MIXED-media corpus: each payload is
    // a REAL encoded asset (PNG/BMP/WAV/PPM/JPEG by doc_id mod 6, raw text
    // otherwise) and the codegen'd prefix expression must route it by
    // CONTENT; the oracle knows the planted truth.
    QueryDef(
      "q125_mime_sniff",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        val mixed = docs.map { case (id, text) =>
          val payload = (id % 7) match {
            case 0 => Multimodal.encodePngFromText(text, 4, 3, 3)
            case 1 => Multimodal.encodeBmpFromText(text, 3, 2)
            case 2 => Multimodal.encodeWavFromText(text, 32, 8000)
            case 3 => Multimodal.encodePpmFromText(text, 4, 4)
            case 4 => Multimodal.encodeJpegFromText(text, 2, 2)
            case 5 => Multimodal.encodeGifFromText(text, 4, 3)
            case _ => text.getBytes("UTF-8")
          }
          (id, payload)
        }.toDF("doc_id", "payload")
        mixed.select(col("doc_id"), Multimodal.sniffMime(col("payload")).as("mime"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 7 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
             |       WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'image/x-portable-pixmap'
             |       WHEN 4 THEN 'image/jpeg' WHEN 5 THEN 'image/gif'
             |       ELSE 'application/octet-stream' END AS mime
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Corpus datasheet: the release-artifact summary (volume, language
    // spread, duplicate mass, token median) — six integer metrics from
    // one materialized derived-columns pass + one multi-aggregate.
    QueryDef(
      "q126_corpus_datasheet",
      (s, dir) =>
        Pipelines.datasheet(t(s, dir, "documents"), "doc_id", "lang", "text")
          .orderBy("metric"),
      Some(s"""WITH base AS (SELECT doc_id, lang,
             |    CAST(len($duckToks) AS BIGINT) AS n_toks,
             |    CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS h FROM documents),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_toks) AS BIGINT) AS toks,
             |             CAST(sum(n_chars) AS BIGINT) AS chars,
             |             CAST(count(DISTINCT lang) AS BIGINT) AS langs,
             |             CAST(count(DISTINCT h) AS BIGINT) AS dh FROM base),
             |r AS (SELECT n_toks AS v, row_number() OVER (ORDER BY n_toks) AS rn,
             |             count(*) OVER () AS n FROM base),
             |m AS (SELECT CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS BIGINT) AS med FROM r)
             |SELECT metric, value FROM (
             |  SELECT 'chars_total' AS metric, chars AS value FROM a
             |  UNION ALL SELECT 'distinct_langs', langs FROM a
             |  UNION ALL SELECT 'docs_total', docs FROM a
             |  UNION ALL SELECT 'exact_dup_docs', docs - dh FROM a
             |  UNION ALL SELECT 'median_tokens', med FROM m
             |  UNION ALL SELECT 'tokens_total', toks FROM a)
             |ORDER BY metric""".stripMargin)
    ),

    // Hybrid retrieval: BM25 keyword ranking fused with the cosine vector
    // ranking by integer rank-sum (Borda) — the lexical+semantic search
    // combination, engine-exact because only RANKS cross the fusion. Both
    // generators bound to a 50-candidate pool before the tiny fuse join.
    QueryDef(
      "q127_hybrid_retrieval",
      (s, dir) =>
        Similarity.hybridTopK(t(s, dir, "documents"), t(s, dir, "embeddings"),
          "doc_id", "text", "vec_id", "embedding",
          queryTerms = Seq("spark", "vector", "merge"), probeId = 0L, k = 15, pool = 50),
      Some {
        val terms = Seq("spark", "vector", "merge")
        val dfs = terms.indices.map(i =>
          s"CAST(sum(CASE WHEN list_contains(t, '${terms(i)}') THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS df$i").mkString(", ")
        val tfs = terms.indices.map(i =>
          s"CAST(len(list_filter(t, x -> x = '${terms(i)}')) AS DOUBLE) AS tf$i").mkString(", ")
        val score = terms.indices.map(i =>
          s"(ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
            s"(tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (sumdl / n)))))").mkString(" + ")
        val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
        s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents WHERE doc_id <> 0),
           |base AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM toks),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl, $dfs FROM base),
           |tf AS (SELECT doc_id, dl, $tfs FROM base),
           |scored AS (SELECT doc_id, CAST($score AS DECIMAL(16,4)) AS sc
           |           FROM tf, stats WHERE ($anyTf) > 0),
           |tr AS (SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS rank_text
           |       FROM scored ORDER BY sc DESC, doc_id LIMIT 50),
           |p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
           |sv AS (SELECT vec_id,
           |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS dot,
           |  list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y) AS na,
           |  list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y) AS np
           |  FROM embeddings, p WHERE vec_id <> 0),
           |cr AS (SELECT vec_id, CAST(dot / (sqrt(na) * sqrt(np)) AS DECIMAL(16,12)) AS cs FROM sv),
           |vr AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cs DESC, vec_id) AS rank_vec
           |       FROM cr ORDER BY cs DESC, vec_id LIMIT 50),
           |f AS (SELECT doc_id, CAST(COALESCE(rank_text, 51) AS BIGINT) AS rank_text,
           |             CAST(COALESCE(rank_vec, 51) AS BIGINT) AS rank_vec
           |      FROM tr FULL OUTER JOIN vr USING (doc_id))
           |SELECT doc_id, rank_text, rank_vec, rank_text + rank_vec AS fused
           |FROM f ORDER BY fused, doc_id LIMIT 15""".stripMargin
      }
    ),

    // HTML -> text extraction: wrap each doc's text in a realistic page
    // (head/title/script-with-fake-tags-in-a-string-literal/body) and
    // prove the strip chain inverts it EXACTLY — the oracle is the
    // original text, no oracle-side regex at all.
    QueryDef(
      "q128_html_extract",
      (s, dir) => {
        val page = concat(
          lit("<html><head><title></title>" +
            "<script type=\"text/javascript\">var a = \"<p>not text</p>\";</script>" +
            "<style>p { color: red; }</style></head>\n<body><!-- nav --><p>"),
          col("text"),
          lit("</p>\n</body></html>"))
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.stripHtml(page).as("clean"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text AS clean FROM documents ORDER BY doc_id")
    ),

    // robots.txt politeness gate: per-doc synthesized policy (a decoy
    // group for another bot, a Disallow on the first token's path, an
    // Allow on the deeper path only when the first token has odd length)
    // evaluated by the REAL parser for agent graft-bot; the oracle knows
    // the planted decision algebra. Exercises group selection, comment
    // skip, longest-prefix match, and allow-wins-ties.
    QueryDef(
      "q129_robots_check",
      (s, dir) => {
        val tok1 = expr("element_at(filter(split(text, '\\\\s+'), x -> x != ''), 1)")
        val tok2 = expr("element_at(filter(split(text, '\\\\s+'), x -> x != ''), 2)")
        val robots = concat(
          lit("# crawl policy\nUser-agent: other-bot\nDisallow: /\n\n" +
            "User-agent: graft-bot\nDisallow: /"), tok1, lit("\n"),
          when(length(tok1) % 2 === 1,
            concat(lit("Allow: /"), tok1, lit("/"), tok2, lit("\n"))).otherwise(lit("")),
          lit("Crawl-delay: 5\n"))
        val path = concat(lit("/"), tok1, lit("/"), tok2, lit("/page"))
        Robots.robotsCheck(
          t(s, dir, "documents").select(col("doc_id"),
            robots.as("robots"), path.as("path")),
          "doc_id", "robots", "path", agent = "graft-bot")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             |  CAST(CASE WHEN length(t1) % 2 = 1 THEN 2 ELSE 1 END AS INT) AS n_rules,
             |  CAST(CASE WHEN length(t1) % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS allowed
             |FROM (SELECT doc_id, ($duckToks)[1] AS t1 FROM documents)
             |ORDER BY doc_id""".stripMargin)
    ),

    // Polite fetch-frontier schedule: wave = per-domain rank under a
    // quality priority (longest docs first, doc_id ties); emitting in
    // (wave, domain) order interleaves one URL per domain per wave. No
    // global sequence column by design (the sort order IS the schedule).
    QueryDef(
      "q130_frontier_waves",
      (s, dir) =>
        UrlTools.frontierWaves(
          t(s, dir, "documents").select(col("doc_id"), col("source"), length(col("text")).as("__len")),
          "source", Seq(col("__len").desc, col("doc_id")))
          .select(col("doc_id"), col("source"), col("wave"))
          .orderBy("wave", "source", "doc_id"),
      Some("""SELECT doc_id, source,
             |  CAST(row_number() OVER (PARTITION BY source ORDER BY length(text) DESC, doc_id) AS BIGINT) AS wave
             |FROM documents ORDER BY wave, source, doc_id""".stripMargin)
    ),

    // Per-source dedup-rate telemetry: the curation dashboard row that
    // decides which ingest feeds are rotting — docs vs distinct content
    // per source, integer basis-point dup rate. One aggregate.
    QueryDef(
      "q131_source_dup_rate",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            countDistinct(md5(col("text"))).as("distinct_docs"))
          .withColumn("dup_bp", expr("(docs - distinct_docs) * 10000 div docs").cast("long"))
          .orderBy("source"),
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS docs,
             |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_docs,
             |       CAST((count(*) - count(DISTINCT md5(text))) * 10000 // count(*) AS BIGINT) AS dup_bp
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // URL-frontier dedup: canonicalize (q102's codegen'd rules) then keep
    // the smallest doc_id per canonical URL — the crawl-side exact dedup
    // that runs BEFORE any fetch. Ids 2k and 2k+1 get messy URLs that
    // differ in case/port/tracking-params/fragment but canonicalize
    // IDENTICALLY, so every group has exactly two members.
    QueryDef(
      "q132_frontier_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val urls = docs.select(col("doc_id"),
          UrlTools.syntheticUrl(lit("crawl"), (col("doc_id") / 2).cast("long"), lit("en"))
            .as("url"))
        val canon = urls.withColumn("canon_url", UrlTools.canonicalUrl(col("url")))
        Dedup.exactByKeys(canon, "doc_id", Seq("canon_url"))
          .orderBy("keep_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |    'https://www.crawl.example.com/docs/' || CAST(doc_id // 2 AS VARCHAR)
             |      || '?a=1&b=en' AS canon_url
             |  FROM documents)
             |SELECT canon_url, CAST(min(doc_id) AS BIGINT) AS keep_id,
             |       CAST(count(*) AS BIGINT) AS group_size
             |FROM u GROUP BY canon_url ORDER BY keep_id""".stripMargin)
    ),

    // Vocabulary drift between corpus slices (en vs rest): the
    // distribution-shift monitor a corpus refresh runs — q71's exact
    // integer cross-multiplied TV algebra applied to exploded tokens,
    // output bounded to the global top-40 vocabulary (q103's cut) so the
    // report stays dashboard-sized while totals cover the full slices.
    QueryDef(
      "q133_vocab_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def toks(side: DataFrame) =
          side.select(explode(TextAnalysis.tokens("text")).as("token"))
        val drift = graft.engine.DiffEngine.categoricalDrift(
          toks(docs.filter(col("lang") === "en")),
          toks(docs.filter(col("lang") =!= "en")), "token")
        val vocab = toks(docs).groupBy(col("token")).agg(count(lit(1)).as("__n"))
          .orderBy(col("__n").desc, col("token").asc).limit(40).select(col("token").as("value"))
        drift.join(broadcast(vocab), Seq("value")).orderBy("value")
      },
      Some(s"""WITH tk AS (SELECT lang, unnest($duckToks) AS token FROM documents),
             |b AS (SELECT token, CAST(count(*) AS BIGINT) AS base_n FROM tk WHERE lang = 'en' GROUP BY 1),
             |h AS (SELECT token, CAST(count(*) AS BIGINT) AS head_n FROM tk WHERE lang <> 'en' GROUP BY 1),
             |j AS (SELECT COALESCE(b.token, h.token) AS value,
             |             COALESCE(base_n, 0) AS base_n, COALESCE(head_n, 0) AS head_n
             |      FROM b FULL OUTER JOIN h ON b.token = h.token),
             |t AS (SELECT CAST(sum(base_n) AS BIGINT) AS nb, CAST(sum(head_n) AS BIGINT) AS nh FROM j),
             |v AS (SELECT token AS value FROM tk GROUP BY 1 ORDER BY count(*) DESC, token ASC LIMIT 40)
             |SELECT value, base_n, head_n,
             |       CAST(abs(base_n * nh - head_n * nb) AS BIGINT) AS tv_contrib
             |FROM j CROSS JOIN t JOIN v USING (value) ORDER BY value""".stripMargin)
    ),

    // Crawl ingestion head end-to-end: WARC container -> decoded record
    // bodies -> content hash + token count, the columns the text pipeline
    // (gates, dedup) consumes next. The oracle rebuilds each body
    // character-for-character from the generator math (corpus is ASCII,
    // so ISO-8859-1 byte decode == the original characters) and md5s it.
    QueryDef(
      "q134_warc_ingest",
      (s, dir) => {
        val withPayload = Warc.withWarcPayload(
          t(s, dir, "documents"), "doc_id", "text", nRecords = 2)
        Warc.warcTextRecords(withPayload, "doc_id", "payload")
          .select(col("doc_id"), col("rec_idx"), col("target_uri"),
            md5(col("body")).as("body_md5"),
            length(col("body")).cast("long").as("n_chars"),
            TextAnalysis.tokenCount("body").as("n_tokens"))
          .orderBy("doc_id", "rec_idx")
      },
      Some("""WITH r AS (SELECT doc_id, text, unnest([0, 1]) AS rec_idx FROM documents),
             |b AS (SELECT doc_id, rec_idx,
             |        array_to_string(list_transform(range(16 + 7 * rec_idx % 32),
             |          k -> substr(text, CAST((rec_idx + k) % length(text) + 1 AS INT), 1)), '') AS body
             |      FROM r)
             |SELECT doc_id, CAST(rec_idx AS INT) AS rec_idx,
             |       'http://corpus.invalid/doc/' || doc_id || '/' || rec_idx AS target_uri,
             |       md5(body) AS body_md5,
             |       CAST(length(body) AS BIGINT) AS n_chars,
             |       CAST(len(list_filter(string_split_regex(body, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
             |FROM b ORDER BY doc_id, rec_idx""".stripMargin)
    ),

    // Count-Min Sketch CERTIFICATE — completing the mergeable-sketch
    // family (q99 Misra–Gries heavy hitters, q120 HLL distincts, q110
    // Bloom membership): CMS never undercounts, and overcounts by more
    // than eps·N with probability < delta. The certified bit checks BOTH
    // bounds against the LIVE sketch (seeded — deterministic) for the
    // exact top-20 tokens; the oracle pins 1 plus engine-exact counts.
    QueryDef(
      "q135_cms_certificate",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens("text")).as("token"))
        val eps = 0.005
        val sketch = toks.stat.countMinSketch(col("token"), eps, 0.999, 42)
        val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
        val n = toks.count()
        val slack = math.ceil(eps * n).toLong
        val top = exact.orderBy(col("exact_n").desc, col("token").asc).limit(20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        top.map { case (tok, ex) =>
          val est = sketch.estimateCount(tok)
          (tok, ex, if (est >= ex && est <= ex + slack) 1L else 0L)
        }.toSeq.toDF("token", "exact_n", "certified").orderBy("token")
      },
      Some(s"""WITH toks AS (SELECT unnest($duckToks) AS token FROM documents),
             |c AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY token),
             |top AS (SELECT token, exact_n FROM c ORDER BY exact_n DESC, token ASC LIMIT 20)
             |SELECT token, exact_n, CAST(1 AS BIGINT) AS certified
             |FROM top ORDER BY token""".stripMargin)
    ),

    // Tokenizer fertility per language: chars-per-subword ×100 on the
    // BPE-ish pre-tokenization — the multilingual cost signal (a language
    // with high fertility pays more tokens per character of text). One
    // aggregate, integer-exact ratios.
    QueryDef(
      "q136_tokenizer_fertility",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("docs"),
            sum(length(col("text")).cast("long")).as("chars"),
            sum(TextAnalysis.bpeishTokenCount("text")).as("subwords"))
          .withColumn("fertility_x100", expr("chars * 100 div subwords").cast("long"))
          .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS docs,
             |       CAST(sum(length(text)) AS BIGINT) AS chars,
             |       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS subwords,
             |       CAST(sum(length(text)) * 100 // sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS fertility_x100
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    // REAL real-world image format #2: baseline JPEG (marker walk, canonical
    // Huffman, dequant, 8×8 IDCT, restart markers every 2 MCUs) — the
    // dominant payload of any web-crawled multimodal corpus. The container
    // is a genuine entropy-coded stream, but each 8×8 tile is the constant
    // v_k = codepoint k of the cycled text mod 256 over an all-ones quant
    // table, making the lossy codec's DC-only subset LOSSLESS — so the
    // oracle re-derives every decoded pixel from the text alone while the
    // Spark side runs the full Huffman+IDCT decode (q98's PNG scheme).
    QueryDef(
      "q137_mm_jpeg_decode",
      (s, dir) => {
        val withPayload = Multimodal.withJpegPayload(
          t(s, dir, "documents"), "doc_id", "text",
          widthBlocks = 2, heightBlocks = 3, restartInterval = 2)
        Multimodal.jpegStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH px AS (SELECT doc_id,
             |  list_transform(range(6),
             |    k -> ascii(substr(text, CAST(k % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents)
             |SELECT doc_id, CAST(16 AS INT) AS width, CAST(24 AS INT) AS height,
             |       CAST(384 AS BIGINT) AS n_pixels, CAST(1 AS INT) AS n_components,
             |       CAST(list_min(p) AS INT) AS r_min, CAST(list_max(p) AS INT) AS r_max,
             |       CAST(list_min(p) AS INT) AS g_min, CAST(list_max(p) AS INT) AS g_max,
             |       CAST(list_min(p) AS INT) AS b_min, CAST(list_max(p) AS INT) AS b_max,
             |       CAST(192 * list_sum(p) AS BIGINT) AS bright_sum
             |FROM px ORDER BY doc_id""".stripMargin)
    ),

    // TRAINED language ID (Cavnar–Trenkle trigram profiles): per-language
    // top-40 trigram rank tables induced from the labeled corpus, each doc
    // classified by integer out-of-place rank distance — the upgrade from
    // q42's fixed marker heuristic to the trained classifier class real
    // pipelines use. The oracle replays training AND scoring: identical
    // normalization, ranking tie-breaks, and penalty algebra, all integer.
    QueryDef(
      "q138_trained_langid",
      (s, dir) => {
        TextAnalysis.trigramLanguageIdSelf(
          t(s, dir, "documents"), "doc_id", "lang", "text", k = 40)
          .orderBy("doc_id")
      },
      Some("""WITH norm AS (SELECT doc_id, lang,
             |    replace(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' '), '\s+', ' ')), ' ', '_') AS s
             |  FROM documents),
             |tri AS (SELECT doc_id, lang,
             |    unnest(list_transform(range(1, length(s) - 1), i -> substr(s, CAST(i AS INT), 3))) AS tri
             |  FROM norm WHERE length(s) >= 3),
             |lp AS (SELECT lang, tri,
             |    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tri) AS lang_rank
             |  FROM tri WHERE lang IS NOT NULL GROUP BY lang, tri QUALIFY lang_rank <= 40),
             |dp AS (SELECT doc_id, tri,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, tri) AS doc_rank
             |  FROM tri GROUP BY doc_id, tri QUALIFY doc_rank <= 40),
             |langs AS (SELECT DISTINCT lang FROM lp),
             |d AS (SELECT dp.doc_id, l.lang,
             |    sum(coalesce(abs(dp.doc_rank - lp.lang_rank), 40)) AS dist
             |  FROM dp CROSS JOIN langs l
             |  LEFT JOIN lp ON lp.lang = l.lang AND lp.tri = dp.tri
             |  GROUP BY dp.doc_id, l.lang)
             |SELECT doc_id, lang AS pred_lang, CAST(dist AS BIGINT) AS best_dist
             |FROM d
             |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY dist, lang) = 1
             |ORDER BY doc_id""".stripMargin)
    ),

    // Z-order (Morton) clustering key: the multi-dimensional layout tool —
    // each lineitem's (l_partkey, l_suppkey) is range-mapped to a 256×256
    // grid with exact integer division and bit-interleaved into one curve
    // key. Aggregating per curve tile (z >> 8) hashes the FULL bit algebra
    // of every row through count/min/max; the oracle replays the identical
    // shift/and arithmetic.
    QueryDef(
      "q139_zorder_key",
      (s, dir) => {
        val keyed = Layout.zOrderBucketized(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
          Seq("l_partkey", "l_suppkey"), bitsPerDim = 8)
        keyed.groupBy(shiftright(col("z_key"), 8).as("z_tile"))
          .agg(count(lit(1)).as("n"),
            min(col("z_key")).as("z_min"), max(col("z_key")).as("z_max"))
          .orderBy("z_tile")
      },
      Some("""WITH s AS (SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
             |               min(l_suppkey) AS mns, max(l_suppkey) AS mxs FROM lineitem),
             |c AS (SELECT (l_partkey - mnp) * 256 // (mxp - mnp + 1) AS cp,
             |             (l_suppkey - mns) * 256 // (mxs - mns + 1) AS cs
             |      FROM lineitem, s),
             |z AS (SELECT CAST(list_sum(list_transform(range(8), b -> ((cp >> CAST(b AS INT)) & 1) << CAST(2 * b AS INT)))
             |           + list_sum(list_transform(range(8), b -> ((cs >> CAST(b AS INT)) & 1) << CAST(2 * b + 1 AS INT))) AS BIGINT) AS z_key
             |      FROM c)
             |SELECT z_key >> 8 AS z_tile, CAST(count(*) AS BIGINT) AS n,
             |       CAST(min(z_key) AS BIGINT) AS z_min, CAST(max(z_key) AS BIGINT) AS z_max
             |FROM z GROUP BY z_tile ORDER BY z_tile""".stripMargin)
    ),

    // Quantile-sketch CERTIFICATE (the q99/q120/q135 pattern, completing
    // the sketch family): approx_percentile's GK sketch promises every
    // returned value sits within rank error n/accuracy of the target rank.
    // The query certifies the LIVE sketch against exact ranks — lt/le
    // bracket the returned value's true rank set, and the target rank
    // ⌈φ·n⌉ must land in [lt+1−n/acc, le+n/acc] (checked in exact integer
    // algebra, multiplied through by acc). `member` certifies the sketch
    // returned an actual data element, not an interpolation. A broken
    // sketch flips bits and fails the hash; the oracle derives the same
    // frame from exact counts with both bits pinned to 1.
    QueryDef(
      "q140_quantile_certificate",
      (s, dir) => {
        val acc = 100
        val phis = Seq(10, 25, 50, 75, 90)
        val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
        val approx = li.agg(
          percentile_approx(col("x"),
            array(phis.map(p => lit(p / 100.0)): _*), lit(acc)).as("vals"),
          count(lit(1)).as("n"))
          .select(col("n"), posexplode(col("vals")).as(Seq("i", "v")))
          .withColumn("phi_x100",
            element_at(array(phis.map(lit): _*), col("i") + 1).cast("long"))
        li.crossJoin(broadcast(approx)) // bounded fan-out: 5 broadcast rows
          .groupBy(col("phi_x100"), col("n"))
          .agg(
            sum(when(col("x") < col("v"), 1L).otherwise(0L)).as("lt"),
            sum(when(col("x") <= col("v"), 1L).otherwise(0L)).as("le"),
            max(when(col("x") === col("v"), 1L).otherwise(0L)).as("member"))
          // target = ⌈φn⌉ in exact integer division (never a double `/`)
          .withColumn("__target", expr("(phi_x100 * n + 99) div 100"))
          .select(col("phi_x100"), col("n"),
            col("member"),
            // certified ⇔ acc·(lt+1) − n ≤ acc·target ≤ acc·le + n
            ((lit(acc.toLong) * (col("lt") + 1) - col("n") <= lit(acc.toLong) * col("__target")) &&
              (lit(acc.toLong) * col("__target") <= lit(acc.toLong) * col("le") + col("n")))
              .cast("long").as("certified"))
          .orderBy("phi_x100")
      },
      Some("""SELECT phi_x100, (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n,
             |       CAST(1 AS BIGINT) AS member, CAST(1 AS BIGINT) AS certified
             |FROM (VALUES (CAST(10 AS BIGINT)), (25), (50), (75), (90)) t(phi_x100)
             |ORDER BY phi_x100""".stripMargin)
    ),

    // Checksum-validated PII: card-number-shaped digit runs are only REAL
    // payment numbers when the ISO 7812 Luhn checksum holds — the planted
    // 16-digit number per doc gets a correct check digit exactly when
    // doc_id is even, so the detector's (candidates, valid) split must
    // reproduce the parity truth the oracle knows. The Luhn fold runs as a
    // codegen'd HOF lambda over each candidate, scan-fused, no UDF.
    QueryDef(
      "q141_card_pii",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        val planted = docs.map { case (id, text) =>
          val base = f"${id % 1000000000000000L}%015d"
          val check = TextAnalysis.luhnCheckDigit(base)
          val digit = if (id % 2 == 0) check else (check + 5) % 10
          (id, s"$text card $base$digit due")
        }.toDF("doc_id", "text")
        val (nCand, nValid) = TextAnalysis.cardCounts("text")
        planted
          .select(col("doc_id"), nCand.as("n_candidates"), nValid.as("n_valid"),
            length(TextAnalysis.redactCards("text")).cast("long").as("redacted_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(1 AS BIGINT) AS n_candidates,
             |       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_valid,
             |       CAST(length(text) + length(' card <CARD> due') AS BIGINT) AS redacted_len
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Polite fetch schedule v2: q130's per-domain waves throttled by each
    // domain's OWN published rate — Crawl-delay parsed from a synthesized
    // per-domain robots.txt by the REAL group-aware parser, broadcast back
    // onto the frontier, fetch_offset = (wave−1)·delay. The oracle knows
    // the planted delay algebra (length(source) % 5 + 1 seconds).
    QueryDef(
      "q142_crawl_schedule",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), length(col("text")).as("__len"))
        val delays = docs.select(col("source")).distinct().as[String].map { src =>
          val robots = "User-agent: other-bot\nCrawl-delay: 99\n\n" +
            s"User-agent: graft-bot\nDisallow: /private\nCrawl-delay: ${src.length % 5 + 1}\n"
          (src, Robots.crawlDelay(robots, "graft-bot").getOrElse(0L))
        }.toDF("source", "crawl_delay")
        UrlTools.frontierWaves(docs, "source", Seq(col("__len").desc, col("doc_id")))
          .join(broadcast(delays), Seq("source"))
          .select(col("doc_id"), col("source"), col("wave"), col("crawl_delay"),
            ((col("wave") - 1) * col("crawl_delay")).as("fetch_offset_s"))
          .orderBy("source", "wave")
      },
      Some("""SELECT doc_id, source, wave,
             |       CAST(length(source) % 5 + 1 AS BIGINT) AS crawl_delay,
             |       CAST((wave - 1) * (length(source) % 5 + 1) AS BIGINT) AS fetch_offset_s
             |FROM (SELECT doc_id, source,
             |        CAST(row_number() OVER (PARTITION BY source ORDER BY length(text) DESC, doc_id) AS BIGINT) AS wave
             |      FROM documents)
             |ORDER BY source, wave""".stripMargin)
    ),

    // REAL real-world image format #3: GIF (LZW!) — header, global color
    // table, extension skip, sub-block reassembly, and a full variable-
    // width LZW decode with CLEAR/END and dictionary rebuild. Pixels are
    // text-derived indices over a gray palette (entry i = (i,i,i)), so the
    // oracle re-derives every feature from the text while the Spark side
    // runs the real decompressor (GIF is lossless: exact round-trip).
    QueryDef(
      "q143_mm_gif_decode",
      (s, dir) => {
        val withPayload = Multimodal.withGifPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 19, height = 15)
        Multimodal.gifStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH px AS (SELECT doc_id,
             |  list_transform(range(285),
             |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents)
             |SELECT doc_id, CAST(19 AS INT) AS width, CAST(15 AS INT) AS height,
             |       CAST(285 AS BIGINT) AS n_pixels, CAST(256 AS INT) AS palette_size,
             |       CAST(list_min(p) AS INT) AS r_min, CAST(list_max(p) AS INT) AS r_max,
             |       CAST(list_min(p) AS INT) AS g_min, CAST(list_max(p) AS INT) AS g_max,
             |       CAST(list_min(p) AS INT) AS b_min, CAST(list_max(p) AS INT) AS b_max,
             |       CAST(3 * list_sum(p) AS BIGINT) AS bright_sum
             |FROM px ORDER BY doc_id""".stripMargin)
    ),

    // PageRank authority prior: 3 synchronous iterations over a planted
    // 3-out-regular link graph (dst = (src·{7,13,31}+{1,3,5}) mod n), all
    // fixed-point ×10^6 integer arithmetic with per-edge flooring BEFORE
    // the sum — the oracle replays the identical three iterations CTE by
    // CTE and must land on bit-identical ranks.
    QueryDef(
      "q144_pagerank",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 1) % n,
            (col("doc_id") * 13 + 3) % n,
            (col("doc_id") * 31 + 5) % n)).as("dst"))
        Graphs.pageRank(edges, "src", "dst", iters = 3)
          .orderBy("node")
      },
      Some {
        def iter(prev: String, c: String, out: String) =
          s"""$c AS (SELECT e.dst AS node, sum($prev.r * 85 // (e.outdeg * 100)) AS m
             |  FROM e JOIN $prev ON e.src = $prev.node GROUP BY e.dst),
             |$out AS (SELECT $prev.node,
             |    (SELECT (1000000 // n) * 15 // 100 FROM nn) + coalesce($c.m, 0) AS r
             |  FROM $prev LEFT JOIN $c USING (node))""".stripMargin
        s"""WITH nn AS (SELECT count(*) AS n FROM documents),
           |e0 AS (SELECT doc_id AS src,
           |    unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n, (doc_id * 31 + 5) % n]) AS dst
           |  FROM documents, nn),
           |e AS (SELECT src, dst, (SELECT count(*) FROM e0 x WHERE x.src = e0.src) AS outdeg FROM e0),
           |r0 AS (SELECT doc_id AS node, 1000000 // n AS r FROM documents, nn),
           |${iter("r0", "c1", "r1")},
           |${iter("r1", "c2", "r2")},
           |${iter("r2", "c3", "r3")}
           |SELECT node, CAST(r AS BIGINT) AS rank_x1m FROM r3 ORDER BY node""".stripMargin
      }
    ),

    // MERGE (SCD-1 upsert), the diff identity's inverse: a planted
    // changeset (key%10: 0 deletes, 1–2 update custkey+status, 3 inserts
    // under an offset key) applied to the orders snapshot — one anti join
    // + union, and the oracle replays the same set algebra.
    QueryDef(
      "q145_merge_upsert",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val m = col("o_orderkey") % 10
        val dels = base.filter(m === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            lit(1).as("__del"))
        val upds = base.filter(m.isin(1, 2))
          .select(col("o_orderkey"), (col("o_custkey") + 100000).as("o_custkey"),
            lit("U").as("o_orderstatus"), lit(0).as("__del"))
        val news = base.filter(m === 3)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"), lit(0).as("__del"))
        graft.engine.DiffEngine.mergeUpsert(
          base, dels.unionByName(upds).unionByName(news),
          Seq("o_orderkey"), deleteCol = Some("__del"))
          .orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
             |ch AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, 1 AS del
             |  FROM b WHERE o_orderkey % 10 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey + 100000, 'U', 0
             |  FROM b WHERE o_orderkey % 10 IN (1, 2)
             |  UNION ALL
             |  SELECT o_orderkey + 1000000000, o_custkey, 'N', 0
             |  FROM b WHERE o_orderkey % 10 = 3)
             |SELECT o_orderkey, o_custkey, o_orderstatus FROM (
             |  SELECT b.* FROM b LEFT JOIN ch USING (o_orderkey) WHERE ch.del IS NULL
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderstatus FROM ch WHERE del = 0)
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // Triangle counting + clustering coefficient, degree-ordered
    // orientation. Planted graph: ring successors u→u+1, u→u+2 (every
    // consecutive triple closes a triangle) + one modular generator for
    // irregular degree; the oracle replays the same orient + wedge +
    // closure joins, and the fixed-point coefficient is integral div —
    // bit-identical. (e0 is MATERIALIZED: DuckDB's binder hits an
    // internal error filtering an unnest-aliased column otherwise.)
    QueryDef(
      "q146_triangle_count",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") + 1) % n,
            (col("doc_id") + 2) % n,
            (col("doc_id") * 13 + 3) % n)).as("dst"))
        Graphs.triangleStats(edges, "src", "dst").orderBy("node")
      },
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e0 AS MATERIALIZED (SELECT doc_id AS u,
             |    unnest([(doc_id + 1) % n, (doc_id + 2) % n, (doc_id * 13 + 3) % n]) AS v
             |  FROM documents, nn),
             |und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0 WHERE u <> v),
             |deg AS (SELECT node, count(*) AS degree FROM (
             |    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) GROUP BY node),
             |o AS (SELECT CASE WHEN da.degree <= db.degree THEN und.a ELSE und.b END AS lo,
             |             CASE WHEN da.degree <= db.degree THEN und.b ELSE und.a END AS hi
             |      FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b),
             |tri AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
             |        FROM o e1 JOIN o e2 ON e1.hi = e2.lo
             |        JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
             |pn AS (SELECT node, count(*) AS triangles FROM (
             |    SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
             |    UNION ALL SELECT z AS node FROM tri) GROUP BY node)
             |SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
             |       CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
             |       CAST(CASE WHEN deg.degree >= 2
             |            THEN coalesce(pn.triangles, 0) * 2000000 // (deg.degree * (deg.degree - 1))
             |            ELSE 0 END AS BIGINT) AS clustering_x1m
             |FROM deg LEFT JOIN pn USING (node) ORDER BY node""".stripMargin)
    ),

    // Collocations: adjacent-pair lift (integer PMI ordering) with a
    // min-count cut — top 50, total (lift DESC, x, y) order both sides.
    QueryDef(
      "q147_collocations",
      (s, dir) =>
        TextAnalysis.collocations(t(s, dir, "documents"), "text", minCount = 3, topK = 50),
      Some(s"""WITH toks AS (SELECT $duckToks AS w FROM documents),
              |uni AS (SELECT unnest(w) AS t FROM toks),
              |uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY t),
              |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
              |big AS (SELECT w[i + 1] AS x, w[i + 2] AS y
              |        FROM toks, unnest(range(greatest(len(w) - 1, 0))) AS u(i)),
              |bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
              |       FROM big GROUP BY x, y HAVING count(*) >= 3)
              |SELECT x, y, c_xy, a.c AS c_x, b.c AS c_y,
              |       CAST(c_xy * n * 1000000 // (a.c * b.c) AS BIGINT) AS lift_x1m
              |FROM bc JOIN uc a ON a.t = bc.x JOIN uc b ON b.t = bc.y, nn
              |ORDER BY lift_x1m DESC, x, y LIMIT 50""".stripMargin)
    ),

    // MinHash certificate: signature Jaccard estimate vs EXACT set
    // Jaccard for every LSH candidate pair + an integer 3σ Bernoulli
    // audit — completes the sketch-certificate family (MG/HLL/CMS/GK).
    QueryDef(
      "q148_minhash_certificate",
      (s, dir) =>
        Dedup.minHashCertificate(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("a_doc_id", "b_doc_id"),
      Some {
        val p = Dedup.MinHashP
        val sigs = Dedup.minHashCoeffs(8).zipWithIndex
          .map { case ((a, b), s) => s"min((h * $a + $b) % $p) AS s$s" }
          .mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band_idx, md5(s${2 * b}::VARCHAR || ',' || s${2 * b + 1}::VARCHAR) AS band_hash FROM sig")
          .mkString("\n  UNION ALL ")
        val estMatches = (0 until 8)
          .map(s => s"CASE WHEN sa.s$s = sb.s$s THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH shing AS ($duckShingles),
           |hashed AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM shing),
           |sig AS (SELECT doc_id, $sigs FROM hashed GROUP BY doc_id),
           |sets AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS hs FROM hashed GROUP BY doc_id),
           |bands AS ($bands),
           |ok AS (SELECT band_idx, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500),
           |pairs AS (SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id
           |  FROM bands a JOIN ok USING (band_idx, band_hash) JOIN bands b USING (band_idx, band_hash)
           |  WHERE a.doc_id < b.doc_id),
           |scored AS (SELECT a_doc_id, b_doc_id,
           |    CAST(($estMatches) * 125000 AS BIGINT) AS est_x1m,
           |    CAST(len(list_intersect(xa.hs, xb.hs)) AS BIGINT) AS inter_n,
           |    CAST(len(xa.hs) + len(xb.hs) - len(list_intersect(xa.hs, xb.hs)) AS BIGINT) AS union_n
           |  FROM pairs JOIN sig sa ON sa.doc_id = a_doc_id JOIN sig sb ON sb.doc_id = b_doc_id
           |  JOIN sets xa ON xa.doc_id = a_doc_id JOIN sets xb ON xb.doc_id = b_doc_id),
           |ex AS (SELECT *, CAST(inter_n * 1000000 // union_n AS BIGINT) AS exact_x1m FROM scored)
           |SELECT a_doc_id, b_doc_id, est_x1m, inter_n, union_n, exact_x1m,
           |       CAST(CASE WHEN (est_x1m - exact_x1m) * (est_x1m - exact_x1m) * 8
           |                      <= 9 * exact_x1m * (1000000 - exact_x1m)
           |            THEN 1 ELSE 0 END AS BIGINT) AS within_3sigma
           |FROM ex ORDER BY a_doc_id, b_doc_id""".stripMargin
      }
    ),

    // Per-type OLS trend of hourly event volume — integer-exact slope
    // (×10^6, truncating div in BOTH engines) over origin-normalized hour
    // indices; the rate-drift detector.
    QueryDef(
      "q149_grouped_trend",
      (s, dir) => {
        val hrs = events(s, dir).select(col("event_type"),
          expr("unix_timestamp(ts) div 3600").as("hr"))
        val minHr = hrs.agg(min("hr")).head().getLong(0)
        val pts = hrs.select(col("event_type"), (col("hr") - minHr).as("x"))
          .groupBy("event_type", "x").agg(count(lit(1)).as("y"))
        Stats.groupedTrend(pts, Seq("event_type"), "x", "y").orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr FROM events),
             |mn AS (SELECT min(hr) AS m FROM h),
             |pts AS (SELECT event_type, hr - m AS x, CAST(count(*) AS BIGINT) AS y
             |        FROM h, mn GROUP BY event_type, hr - m),
             |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
             |               sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
             |        FROM pts GROUP BY event_type)
             |SELECT event_type, n_points,
             |       CAST((n_points * sxy - sx * sy) * 1000000 // (n_points * sxx - sx * sx) AS BIGINT) AS slope_x1m,
             |       CAST(sy * 100 // n_points AS BIGINT) AS mean_y_x100
             |FROM agg WHERE n_points * sxx - sx * sx <> 0 ORDER BY event_type""".stripMargin)
    ),

    // Per-user rolling features (row-frame windows): previous-event value
    // delta and a 3-row rolling sum, DECIMAL-exact, ordered by the unique
    // event_id so the frame is identical cross-engine. The per-entity
    // feature-engineering primitive: one hash shuffle on the key, one
    // in-partition sort, no self-join.
    QueryDef(
      "q150_rolling_features",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        val wf = w.rowsBetween(-2, 0)
        canonOut(events(s, dir)
          .select(col("user_id"), col("event_id"),
            col("value").cast("decimal(18,4)").as("v"))
          .select(col("user_id"), col("event_id"),
            row_number().over(w).cast("long").as("rn"),
            coalesce(col("v") - lag(col("v"), 1).over(w), lit(0).cast("decimal(18,4)"))
              .cast("decimal(18,4)").as("delta"),
            sum(col("v")).over(wf).cast("decimal(18,4)").as("roll3_sum"))
          .orderBy("user_id", "event_id"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, CAST(value AS DECIMAL(18,4)) AS v FROM events)
             |SELECT user_id, event_id,
             |       CAST(row_number() OVER w AS BIGINT) AS rn,
             |       CAST(CAST(coalesce(v - lag(v, 1) OVER w, 0) AS DECIMAL(18,4)) AS VARCHAR) AS delta,
             |       CAST(CAST(sum(v) OVER (PARTITION BY user_id ORDER BY event_id
             |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS VARCHAR) AS roll3_sum
             |FROM x WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY user_id, event_id""".stripMargin)
    ),

    // Gini–Simpson token diversity: the log-free entropy sibling, fully
    // integer fixed-point — boilerplate scores low, prose high.
    QueryDef(
      "q151_token_diversity",
      (s, dir) =>
        TextAnalysis.tokenDiversity(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id"),
      Some(s"""WITH dt AS (SELECT doc_id, unnest($duckToks) AS t FROM documents),
              |c AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY doc_id, t),
              |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
              |             CAST(count(*) AS BIGINT) AS n_distinct,
              |             CAST(sum(n * (n - 1)) AS BIGINT) AS rep FROM c GROUP BY doc_id)
              |SELECT doc_id, n_tokens, n_distinct,
              |       CAST(CASE WHEN n_tokens >= 2
              |            THEN 1000000 - rep * 1000000 // (n_tokens * (n_tokens - 1))
              |            ELSE 0 END AS BIGINT) AS simpson_x1m
              |FROM a ORDER BY doc_id""".stripMargin)
    ),

    // Document-range co-occurrence lift (A-Priori df cut): topical term
    // association, the complement of q147's adjacency collocations. The
    // oracle replays the same capped sorted-array pair generation.
    QueryDef(
      "q152_cooccurrence",
      (s, dir) =>
        TextAnalysis.cooccurrencePairs(t(s, dir, "documents"), "doc_id", "text",
          minDf = 5, minPairDf = 3, maxTermsPerDoc = 200, topK = 50),
      Some(s"""WITH dt AS (SELECT doc_id, unnest(list_distinct($duckToks)) AS t FROM documents),
              |dfc AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY t
              |        HAVING count(*) >= 5),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
              |fd AS (SELECT doc_id, list_sort(list(t))[1:200] AS ts
              |       FROM dt JOIN dfc USING (t) GROUP BY doc_id),
              |prs AS (SELECT ts[i + 1] AS x, ts[j + 1] AS y
              |        FROM fd, unnest(range(len(ts))) AS u(i), unnest(range(len(ts))) AS w(j)
              |        WHERE j > i),
              |pc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS co_df FROM prs GROUP BY x, y
              |       HAVING count(*) >= 3)
              |SELECT x, y, co_df, a.df AS df_x, b.df AS df_y,
              |       CAST(co_df * d * 1000000 // (a.df * b.df) AS BIGINT) AS lift_x1m
              |FROM pc JOIN dfc a ON a.t = pc.x JOIN dfc b ON b.t = pc.y, nn
              |ORDER BY lift_x1m DESC, x, y LIMIT 50""".stripMargin)
    ),

    // Incremental aggregate maintenance over the q145 changeset: the
    // oracle recomputes the merged table from scratch; the Spark side
    // folds the delta into the base aggregate — the identity that proves
    // stateful aggregation correct.
    QueryDef(
      "q153_incremental_agg",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val m = col("o_orderkey") % 10
        val dels = base.filter(m === 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            lit(1).as("__del"))
        val upds = base.filter(m.isin(1, 2))
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"), col("o_totalprice"),
            lit(0).as("__del"))
        val news = base.filter(m === 3)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"), lit(0).as("__del"))
        val baseAgg = base.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_value"))
        canonOut(graft.engine.DiffEngine.incrementalAgg(
          base, baseAgg, dels.unionByName(upds).unionByName(news),
          Seq("o_orderkey"), Seq("o_orderstatus"), "o_totalprice", Some("__del"))
          .orderBy("o_orderstatus"))
      },
      Some("""WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
             |ch AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS del
             |  FROM b WHERE o_orderkey % 10 = 0
             |  UNION ALL
             |  SELECT o_orderkey, 'U', o_totalprice, 0 FROM b WHERE o_orderkey % 10 IN (1, 2)
             |  UNION ALL
             |  SELECT o_orderkey + 1000000000, 'N', o_totalprice, 0 FROM b WHERE o_orderkey % 10 = 3),
             |merged AS (SELECT o_orderstatus, o_totalprice FROM (
             |  SELECT b.* FROM b LEFT JOIN ch USING (o_orderkey) WHERE ch.del IS NULL
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM ch WHERE del = 0))
             |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_value
             |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)
    ),

    // Ordered-step funnel over the unique event_id (NOT the timestamp —
    // ids are tie-free and precision-free cross-engine): signup → view →
    // click → purchase, each step's first occurrence strictly after the
    // previous step's.
    QueryDef(
      "q154_funnel",
      (s, dir) =>
        Stats.funnel(events(s, dir), "user_id", "event_type", "event_id",
          Seq("signup", "view", "click", "purchase")).orderBy("step_idx"),
      Some("""WITH pe AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'signup' THEN event_id END) AS m0,
             |    min(CASE WHEN event_type = 'view' THEN event_id END) AS m1,
             |    min(CASE WHEN event_type = 'click' THEN event_id END) AS m2,
             |    min(CASE WHEN event_type = 'purchase' THEN event_id END) AS m3
             |  FROM events GROUP BY user_id),
             |c AS (SELECT
             |    sum(CASE WHEN m0 IS NOT NULL THEN 1 ELSE 0 END) AS c0,
             |    sum(CASE WHEN m0 < m1 THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN m0 < m1 AND m1 < m2 THEN 1 ELSE 0 END) AS c2,
             |    sum(CASE WHEN m0 < m1 AND m1 < m2 AND m2 < m3 THEN 1 ELSE 0 END) AS c3
             |  FROM pe)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step, CAST(c0 AS BIGINT) AS n_entities FROM c
             |  UNION ALL SELECT 2, 'view', CAST(c1 AS BIGINT) FROM c
             |  UNION ALL SELECT 3, 'click', CAST(c2 AS BIGINT) FROM c
             |  UNION ALL SELECT 4, 'purchase', CAST(c3 AS BIGINT) FROM c)
             |ORDER BY step_idx""".stripMargin)
    ),

    // Cohort retention on epoch days — first-active-day cohorts, per-k
    // re-activity counts, integral-pct; every step is exact counts.
    QueryDef(
      "q155_retention_cohorts",
      (s, dir) =>
        Stats.retentionCohorts(
          events(s, dir).select(col("user_id"),
            expr("unix_timestamp(ts) div 86400").as("day")),
          "user_id", "day").orderBy("cohort_day", "k"),
      Some("""WITH d AS (SELECT DISTINCT user_id AS e, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
             |c AS (SELECT e, min(day) AS cohort_day FROM d GROUP BY e),
             |a AS (SELECT cohort_day, day - cohort_day AS k, CAST(count(*) AS BIGINT) AS n_active
             |      FROM d JOIN c USING (e) GROUP BY cohort_day, day - cohort_day),
             |s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size FROM c GROUP BY cohort_day)
             |SELECT a.cohort_day, k, n_active, cohort_size,
             |       CAST(n_active * 10000 // cohort_size AS BIGINT) AS retained_pct_x100
             |FROM a JOIN s USING (cohort_day) ORDER BY a.cohort_day, k""".stripMargin)
    ),

    // CUSUM change-point per event type over hourly volume — the centered
    // cumulative sum tracked ×n so every deviation is an exact integer;
    // argmax with earliest-position tie-break in both engines.
    QueryDef(
      "q156_changepoint",
      (s, dir) =>
        Stats.changePoints(
          events(s, dir)
            .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hr"))
            .groupBy("event_type", "hr").agg(count(lit(1)).as("y")),
          "event_type", "hr", "y").orderBy("event_type"),
      Some("""WITH h AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr FROM events),
             |p AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS y FROM h GROUP BY event_type, hr),
             |w AS (SELECT event_type, hr, y,
             |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS i,
             |        sum(y) OVER (PARTITION BY event_type ORDER BY hr) AS cum,
             |        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             |        sum(y) OVER (PARTITION BY event_type) AS sy
             |      FROM p),
             |dv AS (SELECT event_type, hr, n, abs(n * cum - i * sy) AS dev, i FROM w),
             |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev DESC, i ASC) AS rnk FROM dv)
             |SELECT event_type, n AS n_points, hr AS cp_x, CAST(dev AS BIGINT) AS max_abs_dev_xn
             |FROM r WHERE rnk = 1 ORDER BY event_type""".stripMargin)
    ),

    // Autocorrelation pitch probe on the REAL WAV parse: exact integer
    // MACs; the oracle replays the q90 generator math and the same
    // earliest-lag argmax (list_position finds the FIRST max).
    QueryDef(
      "q157_wav_autocorr",
      (s, dir) => {
        val withPayload = Multimodal.withWavPayload(
          t(s, dir, "documents"), "doc_id", "text", nSamples = 256, sampleRate = 8000)
        Multimodal.wavAutocorr(withPayload, "doc_id", "payload", minLag = 20, maxLag = 100)
          .orderBy("doc_id")
      },
      Some("""WITH smp AS (SELECT doc_id,
             |  list_transform(range(256),
             |    j -> ((ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) * 131 + 7*j) % 65536 - 32768) AS s
             |  FROM documents),
             |ac AS (SELECT doc_id,
             |  CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS r0,
             |  list_transform(range(20, 101),
             |    k -> CAST(list_sum(list_transform(range(256 - k), i -> s[CAST(i+1 AS INT)] * s[CAST(i+k+1 AS INT)])) AS BIGINT)) AS rs
             |  FROM smp),
             |b AS (SELECT doc_id, r0, rs, list_position(rs, list_max(rs)) AS bi FROM ac)
             |SELECT doc_id, CAST(256 AS BIGINT) AS n_samples, r0,
             |       CAST(19 + bi AS BIGINT) AS best_lag,
             |       rs[bi] AS r_best,
             |       CAST(CASE WHEN r0 > 0 THEN rs[bi] * 1000000 // r0 ELSE 0 END AS BIGINT) AS periodicity_x1m
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Key-candidate inference on orders: ONE exact aggregate pass ranks
    // candidates by distinctness and certifies the true key.
    QueryDef(
      "q158_infer_keys",
      (s, dir) =>
        canonOut(graft.engine.DiffEngine.inferKeys(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"))),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
        val parts = cols.map { c =>
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(count($c) AS BIGINT) AS n_nonnull,
             |  CAST(CASE WHEN count(DISTINCT $c) = count(*) AND count($c) = count(*)
             |       THEN 1 ELSE 0 END AS BIGINT) AS unique_flag
             |FROM orders""".stripMargin
        }
        parts.mkString("", "\nUNION ALL\n", "\nORDER BY n_distinct DESC, column_name")
      }
    ),

    // Laplacian sharpness over the REAL P6 decode: the oracle re-derives
    // every luma from the text generator and replays the interior
    // 4-neighbor |Laplacian| sum index-for-index.
    QueryDef(
      "q159_image_sharpness",
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 12, height = 10)
        Multimodal.ppmSharpness(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some {
        val w = 12; val h = 10; val iw = w - 2; val interior = iw * (h - 2)
        def lum(dx: Int, dy: Int) =
          s"lum[CAST((1 + t // $iw + ($dy)) * $w + (1 + t % $iw + ($dx)) + 1 AS INT)]"
        val term = s"abs(4 * ${lum(0, 0)} - ${lum(-1, 0)} - ${lum(1, 0)} - ${lum(0, -1)} - ${lum(0, 1)})"
        s"""WITH px AS (SELECT doc_id,
           |  list_transform(range(${3 * w * h}),
           |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
           |  FROM documents),
           |lm AS (SELECT doc_id,
           |  list_transform(range(${w * h}), i -> p[CAST(3*i + 1 AS INT)] + p[CAST(3*i + 2 AS INT)] + p[CAST(3*i + 3 AS INT)]) AS lum
           |  FROM px),
           |lp AS (SELECT doc_id,
           |  CAST(list_sum(list_transform(range($interior), t -> $term)) AS BIGINT) AS lap_sum
           |  FROM lm)
           |SELECT doc_id, CAST($w AS INT) AS width, CAST($h AS INT) AS height, lap_sum,
           |       CAST(lap_sum * 100 // $interior AS BIGINT) AS lap_mean_x100
           |FROM lp ORDER BY doc_id""".stripMargin
      }
    ),

    // Median/MAD robust outlier census per event type on cent-scaled
    // values (through DECIMAL — a float×100 truncation would diverge);
    // both medians are q86's rank arithmetic, the threshold test is a
    // cross-multiplied integer comparison.
    QueryDef(
      "q160_mad_outliers",
      (s, dir) =>
        Stats.madOutliers(
          events(s, dir).select(col("event_type"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")),
          "event_type", "cents").orderBy("event_type"),
      Some("""WITH b AS (SELECT event_type AS g, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
             |          FROM events WHERE value IS NOT NULL),
             |r1 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             |              count(*) OVER (PARTITION BY g) AS n FROM b),
             |med AS (SELECT g, v AS medv FROM r1 WHERE rn = (n * 50 + 99) // 100),
             |d AS (SELECT b.g, b.v, medv, abs(b.v - medv) AS dev FROM b JOIN med USING (g)),
             |r2 AS (SELECT g, dev, row_number() OVER (PARTITION BY g ORDER BY dev) AS rn,
             |              count(*) OVER (PARTITION BY g) AS n FROM d),
             |mad AS (SELECT g, dev AS madv FROM r2 WHERE rn = (n * 50 + 99) // 100)
             |SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(max(medv) AS BIGINT) AS median, CAST(max(madv) AS BIGINT) AS mad,
             |       CAST(sum(CASE WHEN dev * 10000 > 44478 * madv THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN mad USING (g) GROUP BY d.g ORDER BY event_type""".stripMargin)
    ),

    // First-order Markov transition matrix over per-user event streams,
    // row-normalized ×10^6 — the behavioral complement of q154's funnel.
    QueryDef(
      "q161_markov_transitions",
      (s, dir) =>
        Stats.markovTransitions(events(s, dir), "user_id", "event_type", "event_id")
          .orderBy("from_state", "to_state"),
      Some("""WITH s AS (SELECT user_id, event_type AS to_state,
             |       lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS from_state
             |     FROM events),
             |p AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE from_state IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_state, sum(n) AS tot FROM p GROUP BY 1)
             |SELECT p.from_state, to_state, n, CAST(n * 1000000 // tot AS BIGINT) AS p_x1m
             |FROM p JOIN t USING (from_state) ORDER BY from_state, to_state""".stripMargin)
    ),

    // CDC log compaction: three planted versions per key (base, %3
    // update, %5 tombstone); highest version wins, tombstoned keys have
    // no current row — the oracle replays the same ranked cut.
    QueryDef(
      "q162_cdc_latest",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val v1 = base.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          lit(1L).as("v"), lit(0).as("__del"))
        val v2 = base.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"), lit("U2").as("o_orderstatus"),
            lit(2L).as("v"), lit(0).as("__del"))
        val v3 = base.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_custkey"), lit("X").as("o_orderstatus"),
            lit(3L).as("v"), lit(1).as("__del"))
        graft.engine.DiffEngine.cdcLatest(v1.unionByName(v2).unionByName(v3),
          Seq("o_orderkey"), "v", Some("__del")).orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
             |log AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, 1 AS v, 0 AS del FROM b
             |  UNION ALL SELECT o_orderkey, o_custkey, 'U2', 2, 0 FROM b WHERE o_orderkey % 3 = 0
             |  UNION ALL SELECT o_orderkey, o_custkey, 'X', 3, 1 FROM b WHERE o_orderkey % 5 = 0),
             |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn FROM log)
             |SELECT o_orderkey, o_custkey, o_orderstatus FROM r WHERE rn = 1 AND del = 0
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // SCD-2 history reconstruction over the same planted CDC log as q162:
    // every surviving version becomes a validity interval [v, next_v);
    // tombstones close the prior interval but add no row. The oracle
    // replays the identical lead() pass.
    QueryDef(
      "q163_scd2_history",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val v1 = base.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          lit(1L).as("v"), lit(0).as("__del"))
        val v2 = base.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"), lit("U2").as("o_orderstatus"),
            lit(2L).as("v"), lit(0).as("__del"))
        val v3 = base.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_custkey"), lit("X").as("o_orderstatus"),
            lit(3L).as("v"), lit(1).as("__del"))
        graft.engine.DiffEngine.scd2FromLog(v1.unionByName(v2).unionByName(v3),
          Seq("o_orderkey"), "v", Some("__del"))
          .orderBy("o_orderkey", "valid_from")
      },
      Some("""WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
             |log AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, 1 AS v, 0 AS del FROM b
             |  UNION ALL SELECT o_orderkey, o_custkey, 'U2', 2, 0 FROM b WHERE o_orderkey % 3 = 0
             |  UNION ALL SELECT o_orderkey, o_custkey, 'X', 3, 1 FROM b WHERE o_orderkey % 5 = 0),
             |l AS (SELECT *, lead(v) OVER (PARTITION BY o_orderkey ORDER BY v) AS nv FROM log)
             |SELECT o_orderkey, o_custkey, o_orderstatus,
             |       CAST(v AS BIGINT) AS valid_from,
             |       CAST(coalesce(nv, -1) AS BIGINT) AS valid_to,
             |       CAST(CASE WHEN nv IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM l WHERE del = 0
             |ORDER BY o_orderkey, valid_from""".stripMargin)
    ),

    // Peak-concurrency sweep line per event_type: synthetic half-open
    // intervals (start = event second, duration = value-cents mod 3600
    // + 60 s), ends processed before starts at the same instant. Exact
    // integer sweep both sides; peak_at is the earliest peak instant.
    QueryDef(
      "q164_max_concurrency",
      (s, dir) => {
        val iv = events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            unix_timestamp(col("ts")).as("start_s"),
            (unix_timestamp(col("ts")) +
              (col("value").cast("decimal(18,2)") * 100).cast("long") % 3600 + 60)
              .as("end_s"))
        Stats.maxConcurrency(iv, "event_type", "start_s", "end_s")
          .orderBy("event_type")
      },
      Some("""WITH iv AS (
             |  SELECT event_type AS g, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             |         CAST(floor(epoch(ts)) AS BIGINT)
             |           + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 3600 + 60 AS e
             |  FROM events WHERE value IS NOT NULL),
             |iv2 AS (SELECT g, s, e FROM iv WHERE s < e),
             |ev AS (
             |  SELECT g, s AS t, 1 AS delta FROM iv2
             |  UNION ALL SELECT g, e, -1 FROM iv2),
             |sw AS (SELECT g, t, delta,
             |         sum(delta) OVER (PARTITION BY g ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS running
             |       FROM ev),
             |sw2 AS (SELECT *, max(running) OVER (PARTITION BY g) AS gmax FROM sw)
             |SELECT g AS event_type, CAST(count(*) // 2 AS BIGINT) AS n_intervals,
             |       CAST(max(running) AS BIGINT) AS max_concurrent,
             |       CAST(min(CASE WHEN running = gmax THEN t END) AS BIGINT) AS peak_at
             |FROM sw2 GROUP BY g ORDER BY event_type""".stripMargin)
    ),

    // Multi-source BFS over the q144 link graph: hop distance from the
    // %100 seed set, capped at 4. The oracle is a genuine recursive CTE —
    // UNION-deduped (node, dist) pairs whose min replays the BFS layers.
    QueryDef(
      "q165_bfs_distance",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 1) % n,
            (col("doc_id") * 13 + 3) % n,
            (col("doc_id") * 31 + 5) % n)).as("dst"))
        Graphs.bfsDistances(edges, "src", "dst",
          docs.filter(col("doc_id") % 100 === 0), "doc_id", maxHops = 4)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
             |e0 AS (SELECT doc_id AS src,
             |    unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n, (doc_id * 31 + 5) % n]) AS dst
             |  FROM documents, nn),
             |e AS (SELECT DISTINCT src, dst FROM e0),
             |r AS (
             |  SELECT doc_id AS node, 0 AS dist FROM documents WHERE doc_id % 100 = 0
             |  UNION
             |  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node WHERE r.dist < 4)
             |SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |FROM r GROUP BY node ORDER BY node""".stripMargin)
    ),

    // HITS on the same graph, two rounds, each side L1-normalized ×10^6
    // with integral division — the oracle unrolls the mutual recursion
    // CTE by CTE and must land on bit-identical scores.
    QueryDef(
      "q166_hits",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 1) % n,
            (col("doc_id") * 13 + 3) % n,
            (col("doc_id") * 31 + 5) % n)).as("dst"))
        Graphs.hits(edges, "src", "dst", iters = 2).orderBy("node")
      },
      Some {
        // One normalized propagation: raw sums over one edge endpoint,
        // then an L1 renormalization to ×10^6 — mirrors Graphs.propagate.
        def step(prev: String, rawCte: String, outCte: String,
            joinOn: String, groupOn: String) =
          s"""$rawCte AS (SELECT e0.$groupOn AS node, sum($prev.sc) AS raw
             |  FROM e0 JOIN $prev ON e0.$joinOn = $prev.node GROUP BY e0.$groupOn),
             |$outCte AS (SELECT d.doc_id AS node,
             |    coalesce($rawCte.raw, 0) * 1000000 // greatest((SELECT sum(raw) FROM $rawCte), 1) AS sc
             |  FROM documents d LEFT JOIN $rawCte ON $rawCte.node = d.doc_id)""".stripMargin
        s"""WITH nn AS (SELECT count(*) AS n FROM documents),
           |e0 AS (SELECT doc_id AS src,
           |    unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n, (doc_id * 31 + 5) % n]) AS dst
           |  FROM documents, nn),
           |h0 AS (SELECT doc_id AS node, (SELECT 1000000 // n FROM nn) AS sc FROM documents),
           |${step("h0", "a1r", "a1", "src", "dst")},
           |${step("a1", "h1r", "h1", "dst", "src")},
           |${step("h1", "a2r", "a2", "src", "dst")},
           |${step("a2", "h2r", "h2", "dst", "src")}
           |SELECT h2.node, CAST(h2.sc AS BIGINT) AS hub_x1m, CAST(a2.sc AS BIGINT) AS auth_x1m
           |FROM h2 JOIN a2 USING (node) ORDER BY node""".stripMargin
      }
    ),

    // Split-leakage audit: q58's hashed-Jaccard near-dup pairs crossed
    // with q115's deterministic split labels — every surviving pair whose
    // docs landed in DIFFERENT splits is evaluation leakage. Pure
    // composition: candidate pairs stay bounded by the q58 block algebra,
    // the label join is one linear key-hash per side.
    QueryDef(
      "q167_split_leakage",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val split = Sampling.threeWaySplit(docs, "doc_id", valPct = 10, testPct = 10)
          .select(col("doc_id"), col("split"))
        val pairs = Dedup.jaccardPairsHashed(docs, "doc_id", "text",
          blockExprs = Seq(col("lang"), (col("n_chars") / 50).cast("int")),
          minJaccardPct = 40)
        pairs
          .join(split.select(col("doc_id").as("a_doc_id"), col("split").as("a_split")), "a_doc_id")
          .join(split.select(col("doc_id").as("b_doc_id"), col("split").as("b_split")), "b_doc_id")
          .filter(col("a_split") =!= col("b_split"))
          .select(col("a_doc_id"), col("b_doc_id"), col("a_split"), col("b_split"),
            col("inter_n"), col("union_n"))
          .orderBy("a_doc_id", "b_doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, lang, n_chars // 50 AS lb,
             |  list_sort(list_distinct(list_transform(string_split(text, ' '),
             |    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT))) AS ws FROM documents),
             |d2 AS (SELECT *, CAST(len(ws) AS BIGINT) AS n FROM d),
             |pairs AS (
             |  SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, a.n AS a_n, b.n AS b_n,
             |         CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter_n
             |  FROM d2 a JOIN d2 b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
             |   AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 40),
             |sel AS (SELECT a_doc_id, b_doc_id, inter_n, (a_n + b_n - inter_n) AS union_n
             |        FROM pairs WHERE inter_n * 140 >= (a_n + b_n) * 40),
             |sp AS (SELECT doc_id,
             |         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM (SELECT doc_id,
             |               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
             |             FROM documents))
             |SELECT s.a_doc_id, s.b_doc_id, sa.split AS a_split, sb.split AS b_split,
             |       s.inter_n, s.union_n
             |FROM sel s JOIN sp sa ON sa.doc_id = s.a_doc_id
             |           JOIN sp sb ON sb.doc_id = s.b_doc_id
             |WHERE sa.split <> sb.split
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    // Exact covariance certificate on cent-scaled lineitem quantity vs
    // price per return flag: decimal(38,0) sufficient statistics and the
    // integer covariance/variance numerators — Σy² alone overflows int64
    // at ~10^5 rows/group, so the whole chain runs in decimal and renders
    // as text at the boundary (q36 recipe).
    QueryDef(
      "q168_cov_stats",
      (s, dir) =>
        canonOut(Stats.covarianceStats(
          t(s, dir, "lineitem").select(col("l_returnflag"),
            (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q_cents"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("p_cents")),
          "l_returnflag", "q_cents", "p_cents")
          .orderBy("l_returnflag")),
      Some("""WITH b AS (SELECT l_returnflag,
             |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
             |  FROM lineitem),
             |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sum_x, sum(CAST(y AS HUGEINT)) AS sum_y,
             |    sum(CAST(x AS HUGEINT) * x) AS sum_xx, sum(CAST(y AS HUGEINT) * y) AS sum_yy,
             |    sum(CAST(x AS HUGEINT) * y) AS sum_xy
             |  FROM b GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |       CAST(sum_x AS VARCHAR) AS sum_x, CAST(sum_y AS VARCHAR) AS sum_y,
             |       CAST(sum_xx AS VARCHAR) AS sum_xx, CAST(sum_yy AS VARCHAR) AS sum_yy,
             |       CAST(sum_xy AS VARCHAR) AS sum_xy,
             |       CAST(n * sum_xy - sum_x * sum_y AS VARCHAR) AS cov_num_xnn,
             |       CAST(n * sum_xx - sum_x * sum_x AS VARCHAR) AS var_x_xnn,
             |       CAST(n * sum_yy - sum_y * sum_y AS VARCHAR) AS var_y_xnn
             |FROM a ORDER BY l_returnflag""".stripMargin)
    ),

    // Data-contract audit over orders: four row-level expectations in one
    // scan (domain, positivity, a cap that really fails, a format regex),
    // plus a referential rule against customer and a key-uniqueness rule —
    // the great-expectations-style promote gate as one report.
    QueryDef(
      "q169_dq_audit",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val rowRules = DataQuality.audit(orders, Seq(
          "r1_status_domain" -> col("o_orderstatus").isin("O", "F", "P"),
          "r2_price_positive" -> (col("o_totalprice") > 0),
          "r3_price_cap" -> (col("o_totalprice") <= 250000),
          "r4_priority_format" -> col("o_orderpriority").rlike("^[1-5]-")))
        val refRule = DataQuality.refIntegrityRow("r5_custkey_ref",
          orders, "o_custkey", t(s, dir, "customer"), "c_custkey")
        val uniqRule = DataQuality.uniqueRow("r6_key_unique", orders, "o_orderkey")
        rowRules.unionByName(refRule).unionByName(uniqRule).orderBy("rule_id")
      },
      Some("""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS v1,
             |    CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v2,
             |    CAST(sum(CASE WHEN o_totalprice <= 250000 THEN 0 ELSE 1 END) AS BIGINT) AS v3,
             |    CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT) AS v4
             |  FROM orders),
             |ref AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
             |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |    ON o.o_custkey = c.c_custkey),
             |u AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v FROM orders),
             |rep AS (
             |  SELECT 'r1_status_domain' AS rule_id, n AS n_rows, v1 AS n_violations FROM a
             |  UNION ALL SELECT 'r2_price_positive', n, v2 FROM a
             |  UNION ALL SELECT 'r3_price_cap', n, v3 FROM a
             |  UNION ALL SELECT 'r4_priority_format', n, v4 FROM a
             |  UNION ALL SELECT 'r5_custkey_ref', n, v FROM ref
             |  UNION ALL SELECT 'r6_key_unique', n, v FROM u)
             |SELECT rule_id, n_rows, n_violations,
             |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
             |FROM rep ORDER BY rule_id""".stripMargin)
    ),

    // Exact two-proportion A/B certificate: event-level exposures split
    // by event_id parity, success = purchase. z² kept as an integer
    // rational (num, den) and the 95% verdict is the division-free
    // compare num·10⁴ ≥ den·38415 — replayed in HUGEINT by the oracle.
    QueryDef(
      "q170_ab_test",
      (s, dir) =>
        canonOut(Stats.abTestStats(
          events(s, dir).select(
            when(col("event_id") % 2 === 0, "A").otherwise("B").as("variant"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("ok")),
          "variant", "ok", "A", "B")),
      Some("""WITH s AS (SELECT CASE WHEN event_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ok FROM events),
             |a AS (SELECT
             |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN variant = 'A' THEN ok ELSE 0 END) AS BIGINT) AS x_a,
             |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN variant = 'B' THEN ok ELSE 0 END) AS BIGINT) AS x_b
             |  FROM s),
             |c AS (SELECT *, (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a) AS dd,
             |    CAST(n_a AS HUGEINT) * n_b * (x_a + x_b) * (CAST(n_a AS HUGEINT) + n_b - x_a - x_b) AS den
             |  FROM a)
             |SELECT n_a, x_a, n_b, x_b,
             |       CAST(dd * dd * (n_a + n_b) AS VARCHAR) AS z2_num,
             |       CAST(den AS VARCHAR) AS z2_den,
             |       CAST(CASE WHEN den > 0 AND dd * dd * (n_a + n_b) * 10000 >= den * 38415
             |            THEN 1 ELSE 0 END AS BIGINT) AS significant_95
             |FROM c""".stripMargin)
    ),

    // 2-D Pareto skyline over part (cheapest price, biggest size): the
    // bucket-staircase pruned plan against DuckDB's brute NOT EXISTS
    // dominance — an O(n) pruned sweep checked by the O(n²) definition.
    QueryDef(
      "q171_skyline",
      (s, dir) => {
        val p = t(s, dir, "part").select(
          col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("price_cents"),
          col("p_size").cast("long").as("psize"))
        orderedOut(Pareto.skyline2D(p, "price_cents", "psize", 1000L),
          "price_cents", "psize", "p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey,
             |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             |    CAST(p_size AS BIGINT) AS psize FROM part)
             |SELECT p_partkey, price_cents, psize FROM p s
             |WHERE NOT EXISTS (SELECT 1 FROM p q
             |  WHERE q.price_cents <= s.price_cents AND q.psize >= s.psize
             |    AND (q.price_cents < s.price_cents OR q.psize > s.psize))
             |ORDER BY price_cents, psize, p_partkey""".stripMargin)
    ),

    // Structured log extraction: events are rendered as Common-Log-Format
    // lines (every 17th corrupted), the REAL regex parser recovers the
    // typed fields, and the oracle aggregates the planted values directly
    // — the parse is verified against the generator, not against itself.
    QueryDef(
      "q172_access_log",
      (s, dir) => {
        val e = events(s, dir)
        val ip = concat_ws(".", lit("10"),
          (col("user_id") % 256).cast("string"),
          (col("user_id") % 17).cast("string"),
          (col("event_id") % 256).cast("string"))
        val method = when(col("event_type") === "purchase", "POST").otherwise("GET")
        val status = ((col("event_id") % 4) * 100 + 200).cast("string")
        val bytes = when(col("event_id") % 13 === 0, lit("-"))
          .otherwise((col("event_id") % 10000).cast("string"))
        val good = concat(ip, lit(" - u"), col("user_id").cast("string"),
          lit(" [01/Jan/2026:00:00:00 +0000] \""), method, lit(" /"),
          col("event_type"), lit(" HTTP/1.1\" "), status, lit(" "), bytes)
        val line = when(col("event_id") % 17 === 0,
          concat(lit("corrupt "), col("event_type"))).otherwise(good)
        TextAnalysis.parseAccessLog(e.select(line.as("line")), "line")
          .filter(col("parsed") === 1)
          .groupBy("http_method", "status")
          .agg(count(lit(1)).as("n"), sum("resp_bytes").as("bytes"))
          .orderBy("http_method", "status")
      },
      Some("""WITH e AS (SELECT event_id, event_type FROM events WHERE event_id % 17 <> 0),
             |s AS (SELECT CASE WHEN event_type = 'purchase' THEN 'POST' ELSE 'GET' END AS http_method,
             |    CAST((event_id % 4) * 100 + 200 AS BIGINT) AS status,
             |    CASE WHEN event_id % 13 = 0 THEN 0 ELSE event_id % 10000 END AS resp_bytes
             |  FROM e)
             |SELECT http_method, status, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(resp_bytes) AS BIGINT) AS bytes
             |FROM s GROUP BY http_method, status
             |ORDER BY http_method, status""".stripMargin)
    ),

    // All-pairs sparse cosine over tf vectors via inverted index: the
    // A-Priori df cap bounds the per-term pair blast, the threshold is the
    // division-free cross-multiplied cos², and DuckDB replays the exact
    // integer algebra on the same tokenization.
    QueryDef(
      "q173_sparse_cosine",
      (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens("text")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        orderedOut(
          Similarity.sparseCosinePairs(tf, "doc_id", "term", "tf",
            thresholdE4 = 2500L, dfCap = 25L),
          "id1", "id2")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
             |keep AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= 25),
             |f AS (SELECT tf.* FROM tf JOIN keep USING (term)),
             |n AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nsq FROM f GROUP BY 1),
             |d AS (SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
             |  FROM f a JOIN f b ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT id1, id2, dot, n1.nsq AS norm1_sq, n2.nsq AS norm2_sq,
             |       CAST(dot * dot * 10000 // (n1.nsq * n2.nsq) AS BIGINT) AS cos2_e4
             |FROM d JOIN n n1 ON d.id1 = n1.doc_id JOIN n n2 ON d.id2 = n2.doc_id
             |WHERE dot * dot * 10000 >= 2500 * n1.nsq * n2.nsq
             |ORDER BY id1, id2""".stripMargin)
    ),

    // Per-group top-k WITHOUT sorting the corpus: bounded-heap partial
    // selection per map task, exact window rank over the k·groups·tasks
    // survivors — vs DuckDB's full row_number definition.
    QueryDef(
      "q174_grouped_topk",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_returnflag"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("line_id"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
        orderedOut(
          TopK.topKPerGroup(li, "l_returnflag", "line_id", "price_cents", 5),
          "grp", "rank")
      },
      Some("""WITH x AS (SELECT l_returnflag AS grp,
             |    CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS value FROM lineitem),
             |r AS (SELECT grp, id, value,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY value DESC, id) AS BIGINT) AS rank
             |  FROM x)
             |SELECT grp, id, value, rank FROM r WHERE rank <= 5
             |ORDER BY grp, rank""".stripMargin)
    ),

    // Last-touch attribution: each purchase credits the user's most recent
    // click/view before it — the as-of composition (one shuffle, no range
    // blow-up) aggregated to channel revenue; event_id is the tie-free
    // time axis. Oracle: DuckDB's native ASOF JOIN.
    QueryDef(
      "q175_attribution",
      (s, dir) => {
        val e = events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            round(col("value") * 100).cast("long").as("cents"))
        val touches = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id").as("t_user"), col("event_id").as("tid"),
            col("event_type").as("channel"))
        AsofJoin.asofJoin(
          purchases, "user_id", "pid",
          touches, "t_user", "tid",
          payload = Seq("channel"))
          .groupBy(coalesce(col("asof_channel"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
          .orderBy("channel")
      },
      Some("""WITH p AS (SELECT user_id, event_id AS pid, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (SELECT user_id, event_id AS tid, event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view'))
             |SELECT coalesce(t.channel, 'none') AS channel,
             |       CAST(count(*) AS BIGINT) AS n_purchases,
             |       CAST(sum(p.cents) AS BIGINT) AS revenue_cents
             |FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.pid >= t.tid
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // IBAN PII census: mod-97 checksum as a pure HOF fold separates real
    // account numbers from uppercase noise; validity is planted per doc_id
    // parity at generation (the q141 pattern), so the oracle checks the
    // REAL ISO 13616 arithmetic against ground truth.
    QueryDef(
      "q176_iban_pii",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        val planted = docs.map { case (id, text) =>
          val bban = f"${id % 1000000000L}%018d"
          val check = TextAnalysis.ibanCheckDigits("DE", bban)
          val cc = if (id % 2 == 0) check else (if (check == 98) 2 else check + 1)
          (id, f"$text iban DE$cc%02d$bban ok")
        }.toDF("doc_id", "text")
        val (nCand, nValid) = TextAnalysis.ibanCounts("text")
        planted
          .select(col("doc_id"), nCand.as("n_candidates"), nValid.as("n_valid"),
            length(TextAnalysis.redactIbans("text")).cast("long").as("redacted_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(1 AS BIGINT) AS n_candidates,
             |       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_valid,
             |       CAST(length(text) + length(' iban <IBAN> ok') AS BIGINT) AS redacted_len
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Semi-structured extraction: the REAL JSON path parser
    // (get_json_object, codegen'd) against DuckDB's independent JSON
    // engine — two different parsers must agree on the same payloads.
    QueryDef(
      "q177_json_props",
      (s, dir) => {
        events(s, dir)
          .select((col("user_id") % 10).as("cohort"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k").isNotNull)
          .groupBy("cohort")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
          .orderBy("cohort")
      },
      Some("""SELECT user_id % 10 AS cohort, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // PIVOT (long→wide crosstab): explicit value list keeps it one pass —
    // Spark's pivot without values runs a distinct job first, and an
    // unbounded value domain would explode the schema at corpus scale.
    QueryDef(
      "q178_pivot",
      (s, dir) => {
        val wide = events(s, dir)
          .groupBy((col("user_id") % 10).as("cohort"))
          .pivot("event_type", Seq("click", "view", "purchase", "error"))
          .count()
        wide.select(col("cohort") +:
          Seq("click", "view", "purchase", "error").map(c =>
            coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("cohort")
      },
      Some("""SELECT user_id % 10 AS cohort,
             |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view",
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // CUBE with explicit grouping flags: all four aggregation lattices in
    // one pass (Spark expands the grouping sets before the shuffle — one
    // exchange, not four scans); labels coalesce to 'ALL' and the flag
    // pair is computed explicitly so engines' grouping_id bit orders
    // can't disagree.
    QueryDef(
      "q179_cube",
      (s, dir) => {
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
            (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
              .cast("long").as("gid"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
            col("gid"), col("n"), col("sum_qty"))
          .orderBy("gid", "rflag", "lstatus")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rflag,
             |       coalesce(l_linestatus, 'ALL') AS lstatus,
             |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, rflag, lstatus""".stripMargin)
    ),

    // Inter-arrival burstiness census: per-user gap moments with the
    // variance numerator kept as an exact cross-multiplied integer — the
    // bot-vs-human cadence signal over the event stream.
    QueryDef(
      "q180_burstiness",
      (s, dir) => {
        // integer-exact micros axis (eventsUs), NOT the events() timestamp
        // reconstruction: the low digits are exactly what gap moments
        // aggregate
        val e = eventsUs(s, dir)
          .select(col("user_id"), col("ts_us").as("eus"))
        canonOut(Stats.interArrivalStats(e, "user_id", "eus", minEvents = 3))
          .orderBy("entity")
      },
      // micros axis is tie-free in this corpus, so the lag order is total
      // on both engines; DuckDB's ns reader already truncates to micros
      Some("""WITH g AS (SELECT user_id AS entity,
             |    epoch_us(ts) - lag(epoch_us(ts))
             |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
             |  FROM events),
             |a AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(gap) AS BIGINT) AS sum_gap, CAST(max(gap) AS BIGINT) AS max_gap,
             |    CAST(count(*) AS HUGEINT) * sum(CAST(gap AS HUGEINT) * gap)
             |      - CAST(sum(gap) AS HUGEINT) * sum(gap) AS var_num
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT entity, n_gaps, sum_gap, max_gap, CAST(var_num AS VARCHAR) AS var_num
             |FROM a WHERE n_gaps >= 2 ORDER BY entity""".stripMargin)
    ),

    // Spatial proximity pairs: grid-cell neighborhood join (each point
    // meets only its 3×3 cells — ONE shuffle, never O(n²)) against
    // DuckDB's brute-force all-pairs definition; coordinates are
    // deterministic integer pseudo-positions on a 10⁶ grid.
    QueryDef(
      "q181_proximity_pairs",
      (s, dir) => {
        // md5-derived coordinates, not a multiplicative lattice: k·a mod m
        // scatters sequential keys onto a sparse lattice whose minimum
        // pair distance exceeds any useful radius (zero matches)
        val h = md5(col("c_custkey").cast("string"))
        val pts = t(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (conv(substring(h, 1, 5), 16, 10).cast("long") % 1000000).as("x"),
          (conv(substring(h, 6, 5), 16, 10).cast("long") % 1000000).as("y"))
        orderedOut(
          Spatial.proximityPairs(pts, "id", "x", "y", radius = 20000L, cellSize = 20000L),
          "id1", "id2")
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
             |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 5))::BIGINT % 1000000 AS x,
             |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 6, 5))::BIGINT % 1000000 AS y
             |  FROM customer)
             |SELECT a.id AS id1, b.id AS id2,
             |       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
             |FROM p a JOIN p b ON a.id < b.id
             |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 400000000
             |ORDER BY id1, id2""".stripMargin)
    ),

    // Exact weighted median per order priority: 2·cumw ≥ W rank algebra
    // with a range frame so value ties share one cumulative weight.
    QueryDef(
      "q182_weighted_median",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          (col("o_custkey") % 5 + 1).as("w"))
        Stats.weightedMedian(o, "o_orderpriority", "price_cents", "w")
          .orderBy("grp")
      },
      Some("""WITH b AS (SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             |    CAST(o_custkey % 5 + 1 AS BIGINT) AS w FROM orders),
             |c AS (SELECT grp, v, w,
             |    sum(w) OVER (PARTITION BY grp ORDER BY v
             |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(w) OVER (PARTITION BY grp) AS tot FROM b)
             |SELECT grp, CAST(max(tot) AS BIGINT) AS total_weight,
             |       CAST(min(v) AS BIGINT) AS wmedian
             |FROM c WHERE cum * 2 >= tot GROUP BY grp ORDER BY grp""".stripMargin)
    ),

    // Calendar-aware anomaly screen: per hour-of-day slot, rows farther
    // than a fixed bound from their OWN slot mean — the residual algebra
    // cross-multiplied so no float mean ever exists.
    QueryDef(
      "q183_seasonal_residuals",
      (s, dir) => {
        val e = events(s, dir).select(hour(col("ts")).as("h"),
          round(col("value") * 100).cast("long").as("cents"))
        Stats.slotResidualOutliers(e, "h", "cents", threshold = 600L)
          .orderBy("slot")
      },
      Some("""WITH b AS (SELECT CAST(hour(ts) AS BIGINT) AS slot,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |s AS (SELECT slot, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(v) AS BIGINT) AS sum_value FROM b GROUP BY 1)
             |SELECT b.slot, max(s.n) AS n, max(s.sum_value) AS sum_value,
             |       CAST(sum(CASE WHEN abs(CAST(b.v AS HUGEINT) * s.n - s.sum_value)
             |                          > CAST(600 AS HUGEINT) * s.n
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM b JOIN s USING (slot) GROUP BY b.slot ORDER BY b.slot""".stripMargin)
    ),

    // Functional-dependency discovery probes: which columns determine
    // which — the schema-inference sibling of q158's key inference. Three
    // FDs of known truth: orderkey→custkey holds, custkey→priority and
    // partkey→suppkey don't.
    QueryDef(
      "q184_fd_audit",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        DataQuality.fdViolations("fd1_orderkey_custkey",
            li.join(o, col("l_orderkey") === col("o_orderkey")), "l_orderkey", "o_custkey")
          .unionByName(DataQuality.fdViolations("fd2_custkey_priority",
            o, "o_custkey", "o_orderpriority"))
          .unionByName(DataQuality.fdViolations("fd3_partkey_suppkey",
            li, "l_partkey", "l_suppkey"))
          .orderBy("rule_id")
      },
      Some("""WITH j AS (SELECT l_orderkey, o_custkey FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey),
             |f1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(nb - 1) AS BIGINT) AS v FROM (
             |    SELECT count(DISTINCT coalesce(CAST(o_custkey AS VARCHAR), '<NULL>')) AS nb
             |    FROM j GROUP BY l_orderkey)),
             |f2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(nb - 1) AS BIGINT) AS v FROM (
             |    SELECT count(DISTINCT coalesce(CAST(o_orderpriority AS VARCHAR), '<NULL>')) AS nb
             |    FROM orders GROUP BY o_custkey)),
             |f3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(nb - 1) AS BIGINT) AS v FROM (
             |    SELECT count(DISTINCT coalesce(CAST(l_suppkey AS VARCHAR), '<NULL>')) AS nb
             |    FROM lineitem GROUP BY l_partkey)),
             |rep AS (
             |  SELECT 'fd1_orderkey_custkey' AS rule_id, n AS n_lhs, v AS n_violations FROM f1
             |  UNION ALL SELECT 'fd2_custkey_priority', n, v FROM f2
             |  UNION ALL SELECT 'fd3_partkey_suppkey', n, v FROM f3)
             |SELECT rule_id, n_lhs, n_violations,
             |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
             |FROM rep ORDER BY rule_id""".stripMargin)
    ),

    // Benford first-digit census over order totals: leading-digit counts
    // joined to the fixed ×10⁶ Benford expectation (log10(1+1/d) is a
    // public constant table, not computed) — the books-cooked screen as
    // pure integer comparison: flag digits where |obs·10⁶ − exp_e6·n|
    // exceeds n·tolerance_e6.
    QueryDef(
      "q185_benford",
      (s, dir) => {
        import s.implicits._
        val expDf = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L).zipWithIndex
          .map { case (e, i) => (i + 1L, e) }.toDF("digit", "exp_e6")
        val d = t(s, dir, "orders")
          .select(substring(round(col("o_totalprice") * 100).cast("long")
            .cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = d.agg(sum("n_obs").as("n")).select(col("n"))
        d.join(broadcast(expDf), "digit")
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"), col("exp_e6"),
            when(abs(col("n_obs").cast("decimal(38,0)") * 1000000 -
              col("exp_e6").cast("decimal(38,0)") * col("n")) >
              col("n").cast("decimal(38,0)") * 50000, 1L).otherwise(0L)
              .as("flagged"))
          .orderBy("digit")
      },
      Some("""WITH e(digit, exp_e6) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
             |    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
             |d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    CAST(count(*) AS BIGINT) AS n_obs FROM orders GROUP BY 1),
             |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM d)
             |SELECT d.digit, d.n_obs, CAST(e.exp_e6 AS BIGINT) AS exp_e6,
             |       CAST(CASE WHEN abs(CAST(d.n_obs AS HUGEINT) * 1000000
             |                          - CAST(e.exp_e6 AS HUGEINT) * t.n)
             |                      > CAST(t.n AS HUGEINT) * 50000
             |                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
             |FROM d JOIN e ON d.digit = e.digit CROSS JOIN t
             |ORDER BY d.digit""".stripMargin)
    ),

    // Per-document keyword extraction: tf·(N−df) integer TF-IDF surrogate
    // (rarer term → bigger factor, no logarithm), deterministic top-3 by
    // (score DESC, term ASC) — the tf/df frames are the q173 machinery.
    QueryDef(
      "q186_keywords",
      (s, dir) => {
        val tf = tParallel(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens("text")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = t(s, dir, "documents").count() // tiny action: one scalar
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(dfreq, "term")
          .withColumn("score", col("tf") * (lit(n) - col("df")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("term"), col("score"), col("rank"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
             |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |sc AS (SELECT tf.doc_id, tf.term, tf.tf * (n.n - df.df) AS score,
             |    CAST(row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf * (n.n - df.df) DESC, tf.term) AS BIGINT) AS rank
             |  FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, term, CAST(score AS BIGINT) AS score, rank
             |FROM sc WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
    ),

    // Nested-type surface: per-customer sorted order-total array,
    // canonicalized with a ','-join — collect_list is made deterministic
    // by sorting INSIDE the row, never relying on aggregation order.
    QueryDef(
      "q187_nested_rollup",
      (s, dir) => {
        t(s, dir, "orders")
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            array_join(sort_array(collect_list("cents")), ",").as("totals"))
          .filter(col("n_orders") >= 8)
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             |       array_to_string(list_sort(list(CAST(round(o_totalprice * 100) AS BIGINT))), ',') AS totals
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 8
             |ORDER BY o_custkey""".stripMargin)
    ),

    // Temporal-locality dedup: rapid repeats of the same (user, type)
    // within 5 minutes flagged by one lag window — the telemetry debounce
    // exact content-dedup can't express.
    QueryDef(
      "q188_rapid_repeats",
      (s, dir) => {
        val e = eventsUs(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_us").as("eus"))
        Dedup.flagRapidRepeats(e, Seq("user_id", "event_type"), "eus", 300000000L)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_total"), sum("is_repeat").as("n_repeats"))
          .orderBy("event_type")
      },
      Some("""WITH l AS (SELECT event_type,
             |    epoch_us(ts) - lag(epoch_us(ts))
             |      OVER (PARTITION BY user_id, event_type ORDER BY epoch_us(ts)) AS gap
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
             |       CAST(sum(CASE WHEN gap IS NOT NULL AND gap < 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats
             |FROM l GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Forest root+depth by pointer doubling (⌈log₂ depth⌉ self-joins, not
    // depth-many level walks) on a synthetic 10-ary supplier hierarchy;
    // the oracle walks the SAME forest with a recursive CTE.
    QueryDef(
      "q189_tree_roots",
      (s, dir) => {
        val nodes = t(s, dir, "supplier").select(
          col("s_suppkey").as("node"),
          when(col("s_suppkey") < 10, lit(null))
            .otherwise(expr("s_suppkey div 10")).as("parent"))
        Graphs.treeRootsByDoubling(nodes, "node", "parent", iters = 4)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE w(node, cur, d) AS (
             |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
             |  UNION ALL SELECT node, cur // 10, d + 1 FROM w WHERE cur >= 10),
             |m AS (SELECT node, max(d) AS md FROM w GROUP BY 1)
             |SELECT w.node, CAST(w.cur AS BIGINT) AS root, CAST(w.d AS BIGINT) AS depth
             |FROM w JOIN m ON w.node = m.node AND w.d = m.md
             |ORDER BY w.node""".stripMargin)
    ),

    // Token-bucket admission control (capacity 3, 1 token/min, milli-token
    // precision): per-user ordered fold as a Spark `aggregate` HOF over
    // the bounded per-entity event array; the oracle replays the SAME
    // recurrence with a recursive CTE (DuckDB 1.0's list_reduce
    // mis-evaluates repeated lambda applications — found while building
    // this query — so the fold is cross-checked by recursion instead).
    QueryDef(
      "q190_token_bucket",
      (s, dir) => {
        eventsUs(s, dir)
          .select(col("user_id"), col("ts_us").as("eus"))
          .groupBy("user_id")
          .agg(sort_array(collect_list("eus")).as("ts"))
          .withColumn("st", expr(
            """aggregate(ts,
              |  named_struct('tok', CAST(3000 AS BIGINT), 'prev', CAST(-1 AS BIGINT), 'n', CAST(0 AS BIGINT)),
              |  (s, t) -> CASE WHEN s.prev < 0
              |    THEN named_struct('tok', CAST(2000 AS BIGINT), 'prev', t, 'n', CAST(1 AS BIGINT))
              |    ELSE named_struct(
              |      'tok', least(3000L, s.tok + (t - s.prev) div 60000)
              |        - CASE WHEN least(3000L, s.tok + (t - s.prev) div 60000) >= 1000 THEN 1000L ELSE 0L END,
              |      'prev', t,
              |      'n', s.n + CASE WHEN least(3000L, s.tok + (t - s.prev) div 60000) >= 1000 THEN 1L ELSE 0L END)
              |    END)""".stripMargin))
          .select(col("user_id"), size(col("ts")).cast("long").as("n_events"),
            col("st.n").as("n_admitted"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE seq AS (SELECT user_id, epoch_us(ts) AS t,
             |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS i FROM events),
             |st(user_id, i, tok, t, n) AS (
             |  SELECT user_id, i, CAST(2000 AS BIGINT), t, CAST(1 AS BIGINT) FROM seq WHERE i = 1
             |  UNION ALL
             |  SELECT s.user_id, s.i,
             |    least(3000, st.tok + (s.t - st.t) // 60000)
             |      - CASE WHEN least(3000, st.tok + (s.t - st.t) // 60000) >= 1000 THEN 1000 ELSE 0 END,
             |    s.t,
             |    st.n + CASE WHEN least(3000, st.tok + (s.t - st.t) // 60000) >= 1000 THEN 1 ELSE 0 END
             |  FROM st JOIN seq s ON s.user_id = st.user_id AND s.i = st.i + 1),
             |m AS (SELECT user_id, max(i) AS mi FROM st GROUP BY 1)
             |SELECT st.user_id, CAST(m.mi AS BIGINT) AS n_events, st.n AS n_admitted
             |FROM st JOIN m ON st.user_id = m.user_id AND st.i = m.mi
             |ORDER BY st.user_id""".stripMargin)
    ),

    // Mergeable-sketch set operations: DataSketches HLL per slice, union
    // by sketch merge, intersection by inclusion–exclusion — with the
    // exact answers computed in the SAME pass and the estimates gated by
    // an integer error band (the q99/q120 certificate discipline; the
    // sketch bytes themselves are engine-private, the certificate isn't).
    QueryDef(
      "q191_sketch_setops",
      (s, dir) => {
        val e = events(s, dir).filter(col("event_type").isin("click", "view"))
        e.agg(
            expr("hll_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)").as("ska"),
            expr("hll_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)").as("skb"),
            countDistinct(when(col("event_type") === "click", col("user_id"))).as("exact_a"),
            countDistinct(when(col("event_type") === "view", col("user_id"))).as("exact_b"),
            countDistinct(col("user_id")).as("exact_union"))
          .withColumn("est_a", expr("hll_sketch_estimate(ska)"))
          .withColumn("est_b", expr("hll_sketch_estimate(skb)"))
          .withColumn("est_u", expr("hll_sketch_estimate(hll_union(ska, skb))"))
          .withColumn("exact_inter", col("exact_a") + col("exact_b") - col("exact_union"))
          .withColumn("est_inter", col("est_a") + col("est_b") - col("est_u"))
          .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_inter"),
            when(abs(col("est_a") - col("exact_a")) * 100 <= col("exact_a") * 5, 1L)
              .otherwise(0L).as("a_ok"),
            when(abs(col("est_b") - col("exact_b")) * 100 <= col("exact_b") * 5, 1L)
              .otherwise(0L).as("b_ok"),
            when(abs(col("est_u") - col("exact_union")) * 100 <= col("exact_union") * 5, 1L)
              .otherwise(0L).as("union_ok"),
            when(abs(col("est_inter") - col("exact_inter")) * 100 <=
              col("exact_union") * 5 + 500, 1L).otherwise(0L).as("inter_ok"))
      },
      Some("""SELECT
             |  CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS exact_a,
             |  CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS exact_b,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union,
             |  CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
             |     + count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
             |     - count(DISTINCT user_id) AS BIGINT) AS exact_inter,
             |  CAST(1 AS BIGINT) AS a_ok, CAST(1 AS BIGINT) AS b_ok,
             |  CAST(1 AS BIGINT) AS union_ok, CAST(1 AS BIGINT) AS inter_ok
             |FROM events WHERE event_type IN ('click', 'view')""".stripMargin)
    ),

    // Query-string parameter census over synthesized campaign URLs: the
    // REAL str_to_map parse exploded to (param, value) — sparse params
    // (ref only on every 3rd event) prove absent-key semantics.
    QueryDef(
      "q192_url_params",
      (s, dir) => {
        val url = concat(lit("https://ex.com/p?uid="), col("user_id").cast("string"),
          lit("&t="), col("event_type"),
          when(col("event_id") % 3 === 0, lit("&ref=mail")).otherwise(lit("")))
        events(s, dir).select(url.as("url"))
          .select(explode(UrlTools.queryParams("url")).as(Seq("param", "value")))
          .groupBy("param")
          .agg(count(lit(1)).as("n"), countDistinct("value").as("n_values"))
          .orderBy("param")
      },
      Some("""WITH u AS (SELECT 'https://ex.com/p?uid=' || user_id || '&t=' || event_type ||
             |    CASE WHEN event_id % 3 = 0 THEN '&ref=mail' ELSE '' END AS url FROM events),
             |kv AS (SELECT unnest(string_split(string_split(url, '?')[2], '&')) AS pair FROM u)
             |SELECT string_split(pair, '=')[1] AS param, CAST(count(*) AS BIGINT) AS n,
             |       CAST(count(DISTINCT string_split(pair, '=')[2]) AS BIGINT) AS n_values
             |FROM kv GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Conversion-window funnel: view → click → purchase where each hop
    // must land within 24 h of the previous first occurrence — q154's
    // single-pass skeleton with the bound folded into the predicate.
    QueryDef(
      "q193_funnel_window",
      (s, dir) => {
        val e = eventsUs(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_us").as("eus"))
        Stats.funnelWithin(e, "user_id", "event_type", "eus",
          Seq("view", "click", "purchase"), maxGap = 86400000000L)
      },
      Some("""WITH m AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS m0,
             |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS m1,
             |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS m2
             |  FROM events GROUP BY 1)
             |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
             |       CAST(sum(CASE WHEN m0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_entities FROM m
             |UNION ALL SELECT 2, 'click',
             |       CAST(sum(CASE WHEN m0 IS NOT NULL AND m0 < m1 AND m1 - m0 <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) FROM m
             |UNION ALL SELECT 3, 'purchase',
             |       CAST(sum(CASE WHEN m0 IS NOT NULL AND m0 < m1 AND m1 - m0 <= 86400000000
             |                      AND m1 < m2 AND m2 - m1 <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) FROM m
             |ORDER BY step_idx""".stripMargin)
    ),

    // Search-index export: per-term posting lists (sorted doc ids, df,
    // max delta gap) — the inverted-index build step, df-banded to keep
    // the export a shortlist; delta gaps are what a real index
    // compresses, so their exactness is the certificate.
    QueryDef(
      "q194_posting_lists",
      (s, dir) => {
        // bigram terms: the unigram vocabulary of this corpus is ~31 words
        // all with df ≈ |corpus| — bigrams give a real zipfian df spread
        val post = t(s, dir, "documents")
          .withColumn("__w", TextAnalysis.tokens("text"))
          .filter(size(col("__w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(__w) - 1), i -> concat(element_at(__w, i), '_', element_at(__w, i + 1)))"))
            .as("term"))
          .distinct()
          .groupBy("term")
          .agg(sort_array(collect_list("doc_id")).as("__p"))
          .withColumn("df", size(col("__p")).cast("long"))
          .filter(col("df").between(2, 50))
        post.select(col("term"), col("df"),
            array_join(col("__p"), ",").as("postings"),
            expr("""CASE WHEN size(__p) < 2 THEN CAST(0 AS BIGINT)
                   |ELSE array_max(transform(sequence(2, size(__p)),
                   |       i -> element_at(__p, i) - element_at(__p, i - 1))) END""".stripMargin)
              .as("max_gap"))
          .orderBy("term")
      },
      Some("""WITH w AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws FROM documents),
             |tok AS (SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i + 1])) AS term
             |  FROM w WHERE len(ws) >= 2),
             |p AS (SELECT term, list(doc_id ORDER BY doc_id) AS pl,
             |    CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
             |b AS (SELECT * FROM p WHERE df BETWEEN 2 AND 50)
             |SELECT term, df, array_to_string(pl, ',') AS postings,
             |       CAST(coalesce(list_max(list_transform(range(2, CAST(len(pl) AS BIGINT) + 1),
             |                i -> pl[i] - pl[i - 1])), 0) AS BIGINT) AS max_gap
             |FROM b ORDER BY term""".stripMargin)
    ),

    // Surrogate-key width audit: collision counts of 16-bit vs 60-bit
    // md5-derived ids over the customer key space — the birthday-paradox
    // certificate behind "how wide must a hash id be at 10^10 keys";
    // md5 prefixes are the engine-portable hash primitive.
    QueryDef(
      "q195_surrogate_collisions",
      (s, dir) => {
        val h = md5(col("c_custkey").cast("string"))
        t(s, dir, "customer")
          .select(conv(substring(h, 1, 4), 16, 10).cast("long").as("h16"),
            conv(substring(h, 1, 15), 16, 10).cast("long").as("h60"))
          .agg(count(lit(1)).as("n_keys"),
            (count(lit(1)) - countDistinct(col("h16"))).as("collisions_16"),
            (count(lit(1)) - countDistinct(col("h60"))).as("collisions_60"))
      },
      Some("""WITH h AS (SELECT
             |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4))::BIGINT AS h16,
             |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h60
             |  FROM customer)
             |SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(count(*) - count(DISTINCT h16) AS BIGINT) AS collisions_16,
             |       CAST(count(*) - count(DISTINCT h60) AS BIGINT) AS collisions_60
             |FROM h""".stripMargin)
    ),

    // Bollinger-band breakout census: per-user rolling 5-event mean/var
    // over the tie-free micros axis, breakout iff (v·n − Σ)² > k²(nΣx²−Σ²)
    // — rolling variance as two running sums, k=2, zero divisions.
    QueryDef(
      "q196_bollinger",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("eus"))
          .rowsBetween(-4, Window.currentRow)
        def d(c: Column) = c.cast("decimal(38,0)")
        eventsUs(s, dir)
          .select(col("user_id"), col("ts_us").as("eus"),
            round(col("value") * 100).cast("long").as("v"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum("v").over(w))
          .withColumn("s2", sum(d(col("v")) * d(col("v"))).over(w))
          .withColumn("dev", d(col("v")) * d(col("n")) - d(col("s1")))
          .withColumn("varn", d(col("n")) * col("s2") - d(col("s1")) * d(col("s1")))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("n") >= 5 && col("dev") * col("dev") > col("varn") * 4, 1L)
              .otherwise(0L)).as("n_breakouts"))
          .orderBy("user_id")
      },
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) AS eus,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |r AS (SELECT user_id, v,
             |    count(*) OVER w AS n,
             |    sum(v) OVER w AS s1,
             |    sum(CAST(v AS HUGEINT) * v) OVER w AS s2
             |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY eus
             |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CASE WHEN n >= 5 AND
             |                 (CAST(v AS HUGEINT) * n - s1) * (CAST(v AS HUGEINT) * n - s1)
             |                   > (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) * 4
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_breakouts
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Independence-deviation census over the (hour × event_type)
    // contingency table: signed exact deviation obs·N − row·col per cell
    // (the chi-square numerator without the division), top-10 by
    // magnitude — which calendar cells break the independence assumption.
    QueryDef(
      "q197_contingency",
      (s, dir) => {
        val e = events(s, dir).select(hour(col("ts")).as("h"), col("event_type"))
        val cells = e.groupBy("h", "event_type").agg(count(lit(1)).as("obs"))
        val rows = e.groupBy("h").agg(count(lit(1)).as("row_tot"))
        val cols = e.groupBy("event_type").agg(count(lit(1)).as("col_tot"))
        val tot = e.agg(count(lit(1)).as("n"))
        cells.join(broadcast(rows), "h").join(broadcast(cols), "event_type")
          .crossJoin(broadcast(tot))
          .withColumn("dev", col("obs") * col("n") - col("row_tot") * col("col_tot"))
          .select(col("h"), col("event_type"), col("obs"), col("row_tot"),
            col("col_tot"), col("dev"))
          .orderBy(abs(col("dev")).desc, col("h"), col("event_type"))
          .limit(10)
      },
      Some("""WITH e AS (SELECT CAST(hour(ts) AS BIGINT) AS h, event_type FROM events),
             |c AS (SELECT h, event_type, CAST(count(*) AS BIGINT) AS obs FROM e GROUP BY 1, 2),
             |r AS (SELECT h, CAST(count(*) AS BIGINT) AS row_tot FROM e GROUP BY 1),
             |k AS (SELECT event_type, CAST(count(*) AS BIGINT) AS col_tot FROM e GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
             |SELECT c.h, c.event_type, c.obs, r.row_tot, k.col_tot,
             |       CAST(c.obs * t.n - r.row_tot * k.col_tot AS BIGINT) AS dev
             |FROM c JOIN r USING (h) JOIN k USING (event_type) CROSS JOIN t
             |ORDER BY abs(c.obs * t.n - r.row_tot * k.col_tot) DESC, c.h, c.event_type
             |LIMIT 10""".stripMargin)
    ),

    // Anti-entropy segment digests: both snapshots reduce to 64
    // order-independent (count, Σ md5-prefix) summaries keyed by the
    // key's own hash bucket — the 100 TB diff shortcut (full row diff
    // only inside segments whose digests differ). Mutations are planted
    // (price bump on key%97, delete on key%101) so `differs` has ground
    // truth.
    QueryDef(
      "q198_segment_digests",
      (s, dir) => {
        val base = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val head = base.filter(col("k") % 101 =!= 0)
          .withColumn("cents",
            when(col("k") % 97 === 0, col("cents") + 1).otherwise(col("cents")))
        val db = graft.engine.DiffEngine.segmentDigests(base, "k", Seq("st", "cents"), 64)
          .select(col("seg"), col("n_rows").as("n_base"), col("digest").as("d_base"))
        val dh = graft.engine.DiffEngine.segmentDigests(head, "k", Seq("st", "cents"), 64)
          .select(col("seg"), col("n_rows").as("n_head"), col("digest").as("d_head"))
        db.join(dh, Seq("seg"), "full_outer")
          .select(col("seg"),
            coalesce(col("n_base"), lit(0L)).as("n_base"),
            coalesce(col("n_head"), lit(0L)).as("n_head"),
            when(coalesce(col("n_base"), lit(-1L)) === coalesce(col("n_head"), lit(-1L)) &&
              coalesce(col("d_base"), lit(-1L)) === coalesce(col("d_head"), lit(-1L)), 0L)
              .otherwise(1L).as("differs"))
          .orderBy("seg")
      },
      Some("""WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |head AS (SELECT k, st,
             |    CASE WHEN k % 97 = 0 THEN cents + 1 ELSE cents END AS cents
             |  FROM base WHERE k % 101 <> 0),
             |db AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4))::BIGINT % 64 AS seg,
             |    CAST(count(*) AS BIGINT) AS n_base,
             |    CAST(sum(('0x' || substr(md5(k || '|' || st || '|' || cents), 1, 8))::BIGINT) AS BIGINT) AS d_base
             |  FROM base GROUP BY 1),
             |dh AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4))::BIGINT % 64 AS seg,
             |    CAST(count(*) AS BIGINT) AS n_head,
             |    CAST(sum(('0x' || substr(md5(k || '|' || st || '|' || cents), 1, 8))::BIGINT) AS BIGINT) AS d_head
             |  FROM head GROUP BY 1)
             |SELECT coalesce(db.seg, dh.seg) AS seg,
             |       coalesce(n_base, 0) AS n_base, coalesce(n_head, 0) AS n_head,
             |       CAST(CASE WHEN coalesce(n_base, -1) = coalesce(n_head, -1)
             |                  AND coalesce(d_base, -1) = coalesce(d_head, -1)
             |                 THEN 0 ELSE 1 END AS BIGINT) AS differs
             |FROM db FULL OUTER JOIN dh ON db.seg = dh.seg ORDER BY seg""".stripMargin)
    ),

    // Bitemporal lookup: what we believed at transaction T about valid
    // time V — a retroactive correction (tx2 rewrites vt=10), a new
    // period (tx3 at vt=20), and a retroactive delete (tx4 tombstones
    // vt=10) each visible or not depending on BOTH clocks.
    QueryDef(
      "q199_bitemporal",
      (s, dir) => {
        val base = t(s, dir, "orders").select(col("o_orderkey").as("k"))
        def asserts(cond: Column, st: String, v: Long, vt: Long, del: Int) =
          base.filter(cond).select(col("k"), lit(st).as("st"), lit(v).as("v"),
            lit(vt).as("vt"), lit(del).as("del"))
        val log = asserts(lit(true), "A", 1L, 10L, 0)
          .unionByName(asserts(col("k") % 3 === 0, "B", 2L, 10L, 0))
          .unionByName(asserts(col("k") % 4 === 0, "C", 3L, 20L, 0))
          .unionByName(asserts(col("k") % 5 === 0, "D", 4L, 10L, 1))
        def look(lbl: String, ka: Long, va: Long) =
          graft.engine.DiffEngine.asOfBitemporal(log, Seq("k"), "v", "vt", "del", ka, va)
            .agg(count(lit(1)).as("n_keys"),
              sum(when(col("st") === "A", 1L).otherwise(0L)).as("n_a"),
              sum(when(col("st") === "B", 1L).otherwise(0L)).as("n_b"),
              sum(when(col("st") === "C", 1L).otherwise(0L)).as("n_c"))
            .select(lit(lbl).as("lookup"), col("n_keys"), col("n_a"), col("n_b"), col("n_c"))
        look("t1_v15", 1L, 15L)
          .unionByName(look("t4_v15", 4L, 15L))
          .unionByName(look("t4_v25", 4L, 25L))
          .orderBy("lookup")
      },
      Some("""WITH ks AS (SELECT o_orderkey AS k FROM orders),
             |log AS (
             |  SELECT k, 'A' AS st, 1 AS v, 10 AS vt, 0 AS del FROM ks
             |  UNION ALL SELECT k, 'B', 2, 10, 0 FROM ks WHERE k % 3 = 0
             |  UNION ALL SELECT k, 'C', 3, 20, 0 FROM ks WHERE k % 4 = 0
             |  UNION ALL SELECT k, 'D', 4, 10, 1 FROM ks WHERE k % 5 = 0),
             |p(lbl, ka, va) AS (VALUES ('t1_v15', 1, 15), ('t4_v15', 4, 15), ('t4_v25', 4, 25)),
             |known AS (SELECT p.lbl, p.va, l.* FROM log l JOIN p ON l.v <= p.ka),
             |la AS (SELECT *, row_number() OVER (PARTITION BY lbl, k, vt ORDER BY v DESC) AS rn
             |  FROM known),
             |a1 AS (SELECT * FROM la WHERE rn = 1 AND vt <= va),
             |a2 AS (SELECT *, row_number() OVER (PARTITION BY lbl, k ORDER BY vt DESC) AS rn2
             |  FROM a1),
             |fin AS (SELECT * FROM a2 WHERE rn2 = 1 AND del = 0)
             |SELECT lbl AS lookup, CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(sum(CASE WHEN st = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |       CAST(sum(CASE WHEN st = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |       CAST(sum(CASE WHEN st = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS n_c
             |FROM fin GROUP BY lbl ORDER BY lbl""".stripMargin)
    ),

    // Curation ledger: the stage-by-stage row accounting every audited
    // pipeline publishes — DQ gate → exact-dedup winners → token-budget
    // cut, each stage's surviving count in one report.
    QueryDef(
      "q200_curation_ledger",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextAnalysis.tokenCount("text").as("tok"))
        val gated = docs.filter(col("tok") >= 5 && length(col("text")) <= 10000)
        val winners = gated.join(
          Dedup.exactByContent(gated, "doc_id", "text")
            .select(col("keep_id").as("doc_id")), Seq("doc_id"))
        val packed = Sampling.selectByTokenBudget(winners, "doc_id", "tok", 20000L)
        def stage(i: Long, name: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n_rows"))
        stage(1L, "raw", docs)
          .unionByName(stage(2L, "dq_gate", gated))
          .unionByName(stage(3L, "dedup_winners", winners))
          .unionByName(stage(4L, "token_budget", packed))
          .orderBy("stage_idx")
      },
      Some("""WITH d AS (SELECT doc_id, text,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS tok
             |  FROM documents),
             |g AS (SELECT * FROM d WHERE tok >= 5 AND length(text) <= 10000),
             |w AS (SELECT g.* FROM g JOIN (
             |    SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)) m USING (doc_id)),
             |p AS (SELECT * FROM (SELECT doc_id, tok,
             |    sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM w) WHERE cum <= 20000)
             |SELECT CAST(1 AS BIGINT) AS stage_idx, 'raw' AS stage, CAST((SELECT count(*) FROM d) AS BIGINT) AS n_rows
             |UNION ALL SELECT 2, 'dq_gate', (SELECT count(*) FROM g)
             |UNION ALL SELECT 3, 'dedup_winners', (SELECT count(*) FROM w)
             |UNION ALL SELECT 4, 'token_budget', (SELECT count(*) FROM p)
             |ORDER BY stage_idx""".stripMargin)
    ),

    // Longest-prefix CIDR classification of event source IPs (the q172
    // generator's addresses): nested networks resolve to the most
    // specific containing range — broadcast routing table, skinny
    // regroup, fact stream never shuffled wide.
    QueryDef(
      "q201_cidr_lookup",
      (s, dir) => {
        val ips = events(s, dir).select(col("event_id"),
          (lit(10L * 256 * 256 * 256) + (col("user_id") % 256) * 65536 +
            (col("user_id") % 17) * 256 + col("event_id") % 256).as("ip"))
        // 10.0.0.0/9 and 10.128.0.0/9 split the space; 10.64.0.0/10 and
        // 10.64.0.0/12 nest inside the first for longest-prefix proof
        val nets = Seq(
          ("lower_half", 10L * 16777216, 9),
          ("upper_half", 10L * 16777216 + 128L * 65536, 9),
          ("quarter", 10L * 16777216 + 64L * 65536, 10),
          ("narrow", 10L * 16777216 + 64L * 65536, 12))
        NetTools.cidrLookup(ips, "ip", "event_id", nets)
          .groupBy(coalesce(col("net"), lit("unrouted")).as("net"))
          .agg(count(lit(1)).as("n"), max("prefix_len").as("plen"))
          .orderBy("net")
      },
      Some("""WITH ip AS (SELECT event_id,
             |    10 * 16777216 + (user_id % 256) * 65536 + (user_id % 17) * 256 + event_id % 256 AS ip
             |  FROM events),
             |nets(net, plen, lo, hi) AS (VALUES
             |  ('lower_half', 9,  167772160, 167772160 + 8388608 - 1),
             |  ('upper_half', 9,  167772160 + 8388608, 167772160 + 16777216 - 1),
             |  ('quarter',   10,  167772160 + 4194304, 167772160 + 8388608 - 1),
             |  ('narrow',    12,  167772160 + 4194304, 167772160 + 4194304 + 1048576 - 1)),
             |m AS (SELECT ip.event_id, max(struct_pack(plen := n.plen, net := n.net)) AS best
             |  FROM ip LEFT JOIN nets n ON ip.ip BETWEEN n.lo AND n.hi
             |  GROUP BY ip.event_id)
             |SELECT coalesce(best.net, 'unrouted') AS net, CAST(count(*) AS BIGINT) AS n,
             |       CAST(max(best.plen) AS BIGINT) AS plen
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Linear multi-touch attribution: each purchase splits 10000 basis
    // points equally across the user's touches in the prior 24 h (the
    // remainder goes to the LATEST touch — integer credits that always
    // sum to exactly 10000·|attributed purchases|). The range join is
    // time-banded: touches replicate to 2 bands, candidates meet on
    // (user, band) — bounded blast, no interval explosion.
    QueryDef(
      "q202_multitouch",
      (s, dir) => {
        val L = 86400000000L // 24 h in micros
        val e = eventsUs(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_us").as("eus"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("eus").as("pt"), expr("eus div 86400000000").as("band"))
        val touch = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_type").as("channel"), col("eus").as("tt"))
          .select(col("*"), explode(expr(
            "array(tt div 86400000000, tt div 86400000000 + 1)")).as("band"))
        val pairs = purch.join(touch, Seq("user_id", "band"))
          .filter(col("tt") <= col("pt") && col("tt") > col("pt") - L)
          .select(col("user_id"), col("pt"), col("channel"), col("tt"))
        import org.apache.spark.sql.expressions.Window
        val wp = Window.partitionBy(col("user_id"), col("pt"))
        val credits = pairs
          .withColumn("n_t", count(lit(1)).over(wp))
          .withColumn("last_tt", max("tt").over(wp))
          .withColumn("credit_bp",
            expr("10000 div n_t") +
              when(col("tt") === col("last_tt"),
                lit(10000L) - expr("10000 div n_t") * col("n_t"))
                .otherwise(0L))
        credits.groupBy("channel")
          .agg(count(lit(1)).as("n_touches"), sum("credit_bp").as("credit_bp"))
          .orderBy("channel")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS eus FROM events),
             |p AS (SELECT user_id, eus AS pt FROM e WHERE event_type = 'purchase'),
             |t AS (SELECT user_id, event_type AS channel, eus AS tt FROM e
             |  WHERE event_type IN ('click', 'view')),
             |pairs AS (SELECT p.user_id, p.pt, t.channel, t.tt
             |  FROM p JOIN t ON p.user_id = t.user_id
             |  AND t.tt <= p.pt AND t.tt > p.pt - 86400000000),
             |c AS (SELECT *, count(*) OVER w AS n_t, max(tt) OVER w AS last_tt
             |  FROM pairs WINDOW w AS (PARTITION BY user_id, pt)),
             |cr AS (SELECT channel,
             |    10000 // n_t + CASE WHEN tt = last_tt
             |      THEN 10000 - (10000 // n_t) * n_t ELSE 0 END AS credit_bp
             |  FROM c)
             |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
             |       CAST(sum(credit_bp) AS BIGINT) AS credit_bp
             |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Weighted shortest paths (bounded Bellman–Ford) over a synthetic
    // doubling/tripling graph on supplier keys — min-cost distances where
    // q165's BFS counts hops; the oracle enumerates every ≤10-hop path
    // recursively and takes the min.
    QueryDef(
      "q203_sssp",
      (s, dir) => {
        val ks = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
        val edges = ks.select(col("k").as("src"), (col("k") * 2).as("dst"),
            (col("k") % 7 + 1).as("w"))
          .unionByName(ks.select(col("k").as("src"), (col("k") * 3).as("dst"),
            (col("k") % 5 + 1).as("w")))
        val seeds = ks.filter(col("k") === 1)
        Graphs.ssspBellmanFord(edges, "src", "dst", "w", seeds, "k", maxIters = 10)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE ks AS (SELECT s_suppkey AS k FROM supplier),
             |e AS (SELECT k AS src, k * 2 AS dst, k % 7 + 1 AS w FROM ks
             |  UNION ALL SELECT k, k * 3, k % 5 + 1 FROM ks),
             |p(node, d, hops) AS (
             |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
             |  UNION ALL SELECT e.dst, p.d + e.w, p.hops + 1
             |  FROM p JOIN e ON e.src = p.node WHERE p.hops < 10)
             |SELECT node, CAST(min(d) AS BIGINT) AS dist FROM p
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Clustering-layout advisor: RLE run counts per column within
    // row-group-sized buckets, natural vs status-clustered layout — the
    // integer measurement of WHY sorted/Z-ordered layouts compress and
    // prune (runs ≈ parquet RLE segments; fewer runs = tighter encoding
    // + better min/max pruning). Per-bucket windows parallelize; buckets
    // model row groups, so cross-bucket boundaries rightly don't count.
    QueryDef(
      "q204_layout_advisor",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"))
        import org.apache.spark.sql.expressions.Window
        def runs(df: DataFrame, layout: String, ordCol: Column) = {
          val w = Window.partitionBy(col("grp")).orderBy(ordCol, col("k"))
          val flagged = df.withColumn("grp", expr("k div 1000"))
            .withColumn("st_chg",
              when(lag("st", 1).over(w).isNull || col("st") =!= lag("st", 1).over(w), 1L)
                .otherwise(0L))
            .withColumn("pri_chg",
              when(lag("pri", 1).over(w).isNull || col("pri") =!= lag("pri", 1).over(w), 1L)
                .otherwise(0L))
          flagged.agg(sum("st_chg").as("status_runs"), sum("pri_chg").as("priority_runs"))
            .select(lit(layout).as("layout"), col("status_runs"), col("priority_runs"))
        }
        runs(o, "a_natural", col("k"))
          .unionByName(runs(o, "b_status_clustered", col("st")))
          .orderBy("layout")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS pri,
             |    o_orderkey // 1000 AS grp FROM orders),
             |n AS (SELECT st, pri,
             |    lag(st) OVER wn AS pst, lag(pri) OVER wn AS ppri FROM o
             |  WINDOW wn AS (PARTITION BY grp ORDER BY k)),
             |c AS (SELECT st, pri,
             |    lag(st) OVER wc AS pst, lag(pri) OVER wc AS ppri FROM o
             |  WINDOW wc AS (PARTITION BY grp ORDER BY st, k))
             |SELECT 'a_natural' AS layout,
             |  CAST(sum(CASE WHEN pst IS NULL OR st <> pst THEN 1 ELSE 0 END) AS BIGINT) AS status_runs,
             |  CAST(sum(CASE WHEN ppri IS NULL OR pri <> ppri THEN 1 ELSE 0 END) AS BIGINT) AS priority_runs
             |FROM n
             |UNION ALL SELECT 'b_status_clustered',
             |  CAST(sum(CASE WHEN pst IS NULL OR st <> pst THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(sum(CASE WHEN ppri IS NULL OR pri <> ppri THEN 1 ELSE 0 END) AS BIGINT)
             |FROM c
             |ORDER BY layout""".stripMargin)
    ),

    // Join-cardinality estimation certificate: the textbook CBO formula
    // |L|·|O| div max(ndv_L, ndv_O) against the true join count — the
    // planner-statistics literacy check, all-integer both sides.
    QueryDef(
      "q205_join_card",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"))
        val stats = li.agg(count(lit(1)).as("n_l"),
            countDistinct("l_orderkey").as("ndv_l"))
          .crossJoin(o.agg(count(lit(1)).as("n_o"),
            countDistinct("o_orderkey").as("ndv_o")))
        val exact = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("exact"))
        stats.crossJoin(exact)
          .withColumn("est", expr("n_l * n_o div greatest(ndv_l, ndv_o)"))
          .withColumn("err_pct",
            expr("abs(est - exact) * 100 div greatest(exact, 1)"))
          .select("n_l", "ndv_l", "n_o", "ndv_o", "exact", "est", "err_pct")
      },
      Some("""WITH s AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_l,
             |    (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS ndv_l,
             |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_o,
             |    (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv_o,
             |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem JOIN orders
             |       ON l_orderkey = o_orderkey) AS exact)
             |SELECT n_l, ndv_l, n_o, ndv_o, exact,
             |       CAST(n_l * n_o // greatest(ndv_l, ndv_o) AS BIGINT) AS est,
             |       CAST(abs(n_l * n_o // greatest(ndv_l, ndv_o) - exact) * 100
             |            // greatest(exact, 1) AS BIGINT) AS err_pct
             |FROM s""".stripMargin)
    ),

    // Digest-narrowed diff end-to-end: q198's segment digests completed
    // into the working mechanism — adds/deletes/changes planted in the
    // head snapshot, row joins run only inside differing segments, and
    // the oracle states the planted truth directly (the narrowing must
    // be invisible in the counts).
    QueryDef(
      "q206_diff_by_segments",
      (s, dir) => {
        val base = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val head = base.filter(col("k") % 101 =!= 0)
          .withColumn("cents",
            when(col("k") % 97 === 0, col("cents") + 1).otherwise(col("cents")))
          .unionByName(base.filter(col("k") % 103 === 0)
            .select((col("k") + 1000000).as("k"), col("st"), col("cents")))
        graft.engine.DiffEngine.diffBySegments(base, head, "k", Seq("st", "cents"), 64)
      },
      Some("""WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |head AS (SELECT k, st, CASE WHEN k % 97 = 0 THEN cents + 1 ELSE cents END AS cents
             |    FROM base WHERE k % 101 <> 0
             |  UNION ALL SELECT k + 1000000, st, cents FROM base WHERE k % 103 = 0),
             |db AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4))::BIGINT % 64 AS seg,
             |    count(*) AS n, sum(('0x' || substr(md5(k || '|' || st || '|' || cents), 1, 8))::BIGINT) AS g
             |  FROM base GROUP BY 1),
             |dh AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4))::BIGINT % 64 AS seg,
             |    count(*) AS n, sum(('0x' || substr(md5(k || '|' || st || '|' || cents), 1, 8))::BIGINT) AS g
             |  FROM head GROUP BY 1),
             |d AS (SELECT count(*) AS n_differing FROM db FULL OUTER JOIN dh USING (seg)
             |  WHERE NOT (coalesce(db.n, -1) = coalesce(dh.n, -1)
             |         AND coalesce(db.g, -1) = coalesce(dh.g, -1)))
             |SELECT CAST(64 AS BIGINT) AS n_segments,
             |       CAST(d.n_differing AS BIGINT) AS n_differing,
             |       (SELECT CAST(count(*) AS BIGINT) FROM base WHERE k % 103 = 0) AS added,
             |       (SELECT CAST(count(*) AS BIGINT) FROM base WHERE k % 101 = 0) AS removed,
             |       (SELECT CAST(count(*) AS BIGINT) FROM base WHERE k % 97 = 0 AND k % 101 <> 0) AS changed
             |FROM d""".stripMargin)
    ),

    // Quantile-vector drift: exact deciles of the value distribution per
    // event slice, joined into per-percentile shifts — the
    // distribution-drift report that mean/variance monitors miss (a
    // median shift with a stable mean), all rank-exact.
    QueryDef(
      "q207_quantile_drift",
      (s, dir) => {
        val e = events(s, dir).filter(col("event_type").isin("click", "view"))
          .select(col("event_type").as("slice"),
            round(col("value") * 100).cast("long").as("cents"))
        val q = Stats.groupedQuantiles(e, "slice", "cents",
          percents = Seq(10, 25, 50, 75, 90))
        val a = q.filter(col("slice") === "click")
          .select(col("p"), col("cents").as("q_click"))
        val b = q.filter(col("slice") === "view")
          .select(col("p"), col("cents").as("q_view"))
        a.join(b, "p")
          .withColumn("shift_cents", col("q_view") - col("q_click"))
          .orderBy("p")
      },
      Some("""WITH e AS (SELECT event_type AS slice, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type IN ('click', 'view')),
             |r AS (SELECT slice, cents,
             |    row_number() OVER (PARTITION BY slice ORDER BY cents) AS rn,
             |    count(*) OVER (PARTITION BY slice) AS n FROM e),
             |q AS (SELECT slice, CAST(p AS BIGINT) AS p, cents
             |  FROM r CROSS JOIN (VALUES (10), (25), (50), (75), (90)) pv(p)
             |  WHERE rn = (n * p + 99) // 100)
             |SELECT a.p, a.cents AS q_click, b.cents AS q_view,
             |       b.cents - a.cents AS shift_cents
             |FROM q a JOIN q b ON a.p = b.p AND a.slice = 'click' AND b.slice = 'view'
             |ORDER BY a.p""".stripMargin)
    ),

    // Degree assortativity certificate: over every edge of the q203
    // doubling graph, exact covariance numerators of (out-degree(src),
    // in-degree(dst)) — do hubs link to hubs? — via the q168 sufficient-
    // statistics algebra on graph-structural quantities.
    QueryDef(
      "q208_assortativity",
      (s, dir) => {
        val ks = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
        val edges = ks.select(col("k").as("src"), (col("k") * 2).as("dst"))
          .unionByName(ks.select(col("k").as("src"), (col("k") * 3).as("dst")))
        val outd = edges.groupBy("src").agg(count(lit(1)).as("od"))
        val ind = edges.groupBy("dst").agg(count(lit(1)).as("id_"))
        val joined = edges.join(outd, "src").join(ind, "dst")
          .select(lit("all").as("g"), col("od"), col("id_"))
        canonOut(Stats.covarianceStats(joined, "g", "od", "id_"))
      },
      Some("""WITH ks AS (SELECT s_suppkey AS k FROM supplier),
             |e AS (SELECT k AS src, k * 2 AS dst FROM ks
             |  UNION ALL SELECT k, k * 3 FROM ks),
             |od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
             |ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS id_ FROM e GROUP BY 1),
             |j AS (SELECT od.od, ind.id_ FROM e JOIN od USING (src) JOIN ind USING (dst)),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(od) AS HUGEINT) AS sum_x, CAST(sum(id_) AS HUGEINT) AS sum_y,
             |    CAST(sum(CAST(od AS HUGEINT) * od) AS HUGEINT) AS sum_xx,
             |    CAST(sum(CAST(id_ AS HUGEINT) * id_) AS HUGEINT) AS sum_yy,
             |    CAST(sum(CAST(od AS HUGEINT) * id_) AS HUGEINT) AS sum_xy
             |  FROM j)
             |SELECT 'all' AS g, n,
             |       CAST(sum_x AS VARCHAR) AS sum_x, CAST(sum_y AS VARCHAR) AS sum_y,
             |       CAST(sum_xx AS VARCHAR) AS sum_xx, CAST(sum_yy AS VARCHAR) AS sum_yy,
             |       CAST(sum_xy AS VARCHAR) AS sum_xy,
             |       CAST(n * sum_xy - sum_x * sum_y AS VARCHAR) AS cov_num_xnn,
             |       CAST(n * sum_xx - sum_x * sum_x AS VARCHAR) AS var_x_xnn,
             |       CAST(n * sum_yy - sum_y * sum_y AS VARCHAR) AS var_y_xnn
             |FROM s""".stripMargin)
    ),

    // Padding-waste certificate: fixed-size batches padded to their longest
    // member, natural ingest order vs length-sorted — the integer
    // measurement of why training loaders length-bucket. Ranks via the
    // Packing distributed prefix sum (no single-task global window).
    QueryDef(
      "q209_padding_waste",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
            .cast("long").as("tk"))
        Packing.paddingWaste(d, "tk", batchSize = 32, strategies = Seq(
          "a_natural" -> col("doc_id"),
          "b_length_sorted" -> (col("tk") * 10000000L + col("doc_id"))))
          .orderBy("strategy")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS tk
             |  FROM documents),
             |nat AS (SELECT tk, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS b FROM d),
             |srt AS (SELECT tk, (row_number() OVER (ORDER BY tk, doc_id) - 1) // 32 AS b FROM d),
             |gn AS (SELECT b, max(tk) AS mx, sum(tk) AS tot, count(*) AS n FROM nat GROUP BY 1),
             |gs AS (SELECT b, max(tk) AS mx, sum(tk) AS tot, count(*) AS n FROM srt GROUP BY 1),
             |rep AS (
             |  SELECT 'a_natural' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
             |         CAST(sum(tot) AS BIGINT) AS total_tokens,
             |         CAST(sum(mx * n) - sum(tot) AS BIGINT) AS waste_tokens,
             |         CAST(sum(tot) * 10000 // sum(mx * n) AS BIGINT) AS util_bp
             |  FROM gn
             |  UNION ALL
             |  SELECT 'b_length_sorted', CAST(count(*) AS BIGINT),
             |         CAST(sum(tot) AS BIGINT),
             |         CAST(sum(mx * n) - sum(tot) AS BIGINT),
             |         CAST(sum(tot) * 10000 // sum(mx * n) AS BIGINT)
             |  FROM gs)
             |SELECT * FROM rep ORDER BY strategy""".stripMargin)
    ),

    // k-core decomposition (bounded peeling) over a deterministic sparse
    // graph on customer keys: survivors of 8 peel rounds at k=5 with their
    // within-core degree. The oracle replays the identical peeling unrolled
    // round by round; KCORE_ROUNDS is asserted past fixpoint by spec.
    QueryDef(
      "q210_kcore",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select((col("c_custkey") - 1).cast("long").as("u"))
        val withN = c.crossJoin(broadcast(c.agg(count(lit(1)).as("n"))))
        val hubs = withN.filter(col("u") % 10 === 0)
        val edges = (
          withN.select(col("u").as("src"), expr("(3*u + 7) % n").as("dst")) +:
            Seq(10, 20, 30, 40, 50).map(j =>
              hubs.select(col("u").as("src"), expr(s"(u + $j) % n").as("dst")))
          ).reduce(_ unionByName _)
        Graphs.kCoreSurvivors(edges, "src", "dst", k = KcoreK, rounds = KcoreRounds)
          .orderBy("node")
      },
      Some(duckKcoreSql)
    ),

    // Asymmetric containment vs a broadcast probe set: excerpt/quote
    // detection that symmetric Jaccard (q34) misses by construction. The
    // corpus never shuffles — probes broadcast, pairs are scanned map-side.
    QueryDef(
      "q211_excerpt_containment",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          sort_array(array_distinct(
            expr("filter(split(text, '\\\\s+'), x -> x != '')"))).as("ws"))
        val probes = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("probe_id"), expr("slice(ws, 3, 10)").as("pws"))
        orderedOut(
          Dedup.containmentPairs(docs, "doc_id", "ws", probes,
            "probe_id", "pws", minContainPct = 80),
          "probe_id", "doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_sort(list_distinct(list_filter(string_split_regex(text, '\s+'),
             |      x -> x <> ''))) AS ws
             |  FROM documents),
             |p AS (SELECT doc_id AS probe_id, ws[3:12] AS pws FROM d WHERE doc_id % 97 = 0),
             |p2 AS (SELECT probe_id, pws, CAST(len(pws) AS BIGINT) AS probe_n FROM p
             |  WHERE len(pws) >= 5)
             |SELECT p2.probe_id, d.doc_id,
             |       CAST(len(list_intersect(p2.pws, d.ws)) AS BIGINT) AS inter_n,
             |       probe_n
             |FROM d, p2
             |WHERE len(list_intersect(p2.pws, d.ws)) * 100 >= probe_n * 80
             |ORDER BY probe_id, doc_id""".stripMargin)
    ),

    // Interval union coverage per group (sweep-line islands): how many of
    // each supplier-slice's calendar days were actually covered by an open
    // shipment — the complement of q164's "how deep do intervals stack".
    QueryDef(
      "q212_interval_coverage",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          (col("l_suppkey") % 25).as("slice"),
          datediff(col("l_shipdate"), lit("1992-01-01")).as("s"),
          (datediff(col("l_shipdate"), lit("1992-01-01")) +
            col("l_quantity").cast("int") % 30 + 1).as("e"))
        Stats.coveredLength(li, "slice", "s", "e").orderBy("slice")
      },
      Some("""WITH iv AS (SELECT l_suppkey % 25 AS slice,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS s,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT)
             |      + CAST(l_quantity AS INT) % 30 + 1 AS e
             |  FROM lineitem),
             |m AS (SELECT slice, s, e,
             |    max(e) OVER (PARTITION BY slice ORDER BY s, e
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |  FROM iv WHERE s < e),
             |f AS (SELECT slice, s, e,
             |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM m),
             |isl AS (SELECT slice, s, e,
             |    sum(nw) OVER (PARTITION BY slice ORDER BY s, e
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i
             |  FROM f),
             |g AS (SELECT slice, i, count(*) AS n, min(s) AS is_, max(e) AS ie
             |  FROM isl GROUP BY 1, 2)
             |SELECT slice, CAST(sum(n) AS BIGINT) AS n_intervals,
             |       CAST(count(*) AS BIGINT) AS n_islands,
             |       CAST(sum(ie - is_) AS BIGINT) AS covered,
             |       CAST(max(ie) - min(is_) AS BIGINT) AS span,
             |       CAST(sum(ie - is_) * 10000 // (max(ie) - min(is_)) AS BIGINT) AS coverage_bp
             |FROM g GROUP BY slice ORDER BY slice""".stripMargin)
    ),

    // Temperature-scaled (T=2, √count) mixture shares per source: the
    // upsample-the-tail weighting multilingual corpora use, certified in
    // exact basis points next to the proportional share.
    QueryDef(
      "q213_mixture_temperature",
      (s, dir) =>
        Sampling.sqrtTemperatureShares(t(s, dir, "documents"), "source")
          .orderBy("source"),
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w_sqrt
             |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
             |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
             |    CAST(sum(w_sqrt) AS BIGINT) AS wtot FROM c)
             |SELECT source, cnt,
             |       CAST(cnt * 10000 // tot AS BIGINT) AS share_bp,
             |       w_sqrt,
             |       CAST(w_sqrt * 10000 // wtot AS BIGINT) AS temp_share_bp,
             |       CAST(w_sqrt * 10000 // wtot - cnt * 10000 // tot AS BIGINT) AS boost_bp
             |FROM c, tt ORDER BY source""".stripMargin)
    ),

    // Silence-run segmentation over the REAL WAV parse (q90's payloads):
    // longest quiet run / run count / quiet total at |s| < 4096 — the
    // voice-activity gate before transcription compute. Oracle re-derives
    // runs from the generator math with the window island trick.
    QueryDef(
      "q214_wav_silence",
      (s, dir) => {
        val withPayload = Multimodal.withWavPayload(
          t(s, dir, "documents"), "doc_id", "text", nSamples = 256, sampleRate = 8000)
        Multimodal.wavSilenceRuns(withPayload, "doc_id", "payload", threshold = 4096)
          .orderBy("doc_id")
      },
      Some("""WITH smp AS (SELECT doc_id,
             |  list_transform(range(256),
             |    j -> ((ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) * 131 + 7*j) % 65536 - 32768) AS s
             |  FROM documents),
             |u AS (SELECT doc_id, unnest(s) AS v, unnest(range(256)) AS j FROM smp),
             |q AS (SELECT doc_id, j, CASE WHEN abs(v) < 4096 THEN 1 ELSE 0 END AS quiet FROM u),
             |g AS (SELECT doc_id, j, quiet,
             |    j - row_number() OVER (PARTITION BY doc_id, quiet ORDER BY j) AS grp FROM q),
             |runs AS (SELECT doc_id, count(*) AS rl FROM g WHERE quiet = 1 GROUP BY doc_id, grp),
             |agg AS (SELECT doc_id, max(rl) AS longest, count(*) AS n_runs, sum(rl) AS total
             |  FROM runs GROUP BY doc_id)
             |SELECT d.doc_id,
             |       CAST(coalesce(a.longest, 0) AS BIGINT) AS longest_quiet_run,
             |       CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_quiet_runs,
             |       CAST(coalesce(a.total, 0) AS BIGINT) AS quiet_samples
             |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin)
    ),

    // Rendezvous-hashing resharding certificate: fraction of keys that
    // move when a 10-shard fleet grows to 11, highest-random-weight vs
    // `mod n` — HRW moves ~1/11 of keys, mod moves ~10/11. Pure scan-fused
    // codegen'd projection; the measurement any storage relayout plans on.
    QueryDef(
      "q215_rendezvous_resharding",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
          .withColumn("h10", Layout.rendezvousShard("doc_id", 10))
          .withColumn("h11", Layout.rendezvousShard("doc_id", 11))
        val agg = d.agg(count(lit(1)).as("n"),
          sum(when(col("h10") =!= col("h11"), 1L).otherwise(0L)).as("hrw_moved"),
          sum(when(col("doc_id") % 10 =!= col("doc_id") % 11, 1L).otherwise(0L))
            .as("mod_moved"))
        agg.select(lit("a_rendezvous").as("strategy"), col("n").as("n_docs"),
            col("hrw_moved").as("moved"),
            expr("hrw_moved * 10000 div n").as("moved_bp"))
          .unionByName(agg.select(lit("b_mod").as("strategy"),
            col("n").as("n_docs"), col("mod_moved").as("moved"),
            expr("mod_moved * 10000 div n").as("moved_bp")))
          .orderBy("strategy")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_max(list_transform(range(10),
             |      t -> [('0x' || substr(md5(doc_id || ':' || t), 1, 8))::BIGINT, t]))[2] AS h10,
             |    list_max(list_transform(range(11),
             |      t -> [('0x' || substr(md5(doc_id || ':' || t), 1, 8))::BIGINT, t]))[2] AS h11
             |  FROM documents),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN h10 <> h11 THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved,
             |    CAST(sum(CASE WHEN doc_id % 10 <> doc_id % 11 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
             |  FROM d)
             |SELECT 'a_rendezvous' AS strategy, n AS n_docs, hrw_moved AS moved,
             |       CAST(hrw_moved * 10000 // n AS BIGINT) AS moved_bp FROM a
             |UNION ALL SELECT 'b_mod', n, mod_moved,
             |       CAST(mod_moved * 10000 // n AS BIGINT) FROM a
             |ORDER BY strategy""".stripMargin)
    ),

    // Zone-map pruning certificate: 1000-row "row groups" under natural vs
    // value-clustered layout, min/max overlap vs a fixed price-range scan —
    // the skipping measurement that completes q204's encoding story
    // (clustered layout should prune to ~the matching buckets; natural
    // reads nearly everything).
    QueryDef(
      "q216_zonemap_pruning",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val lo = 5000000L; val hi = 10000000L
        Layout.zoneMapScan(o, col("k"), col("cents"), 1000, lo, hi, "a_natural")
          .unionByName(Layout.zoneMapScan(o,
            col("cents") * 1000000000L + col("k"), col("cents"),
            1000, lo, hi, "b_clustered"))
          .orderBy("layout")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |nat AS (SELECT cents, (row_number() OVER (ORDER BY k) - 1) // 1000 AS b FROM o),
             |clu AS (SELECT cents, (row_number() OVER (ORDER BY cents, k) - 1) // 1000 AS b FROM o),
             |gn AS (SELECT b, min(cents) AS mn, max(cents) AS mx, count(*) AS n,
             |    sum(CASE WHEN cents BETWEEN 5000000 AND 10000000 THEN 1 ELSE 0 END) AS match_n
             |  FROM nat GROUP BY 1),
             |gc AS (SELECT b, min(cents) AS mn, max(cents) AS mx, count(*) AS n,
             |    sum(CASE WHEN cents BETWEEN 5000000 AND 10000000 THEN 1 ELSE 0 END) AS match_n
             |  FROM clu GROUP BY 1),
             |rep AS (
             |  SELECT 'a_natural' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
             |    CAST(sum(CASE WHEN mx >= 5000000 AND mn <= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned,
             |    CAST(sum(n) AS BIGINT) AS rows_total,
             |    CAST(sum(CASE WHEN mx >= 5000000 AND mn <= 10000000 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
             |    CAST(sum(match_n) AS BIGINT) AS rows_matching
             |  FROM gn
             |  UNION ALL
             |  SELECT 'b_clustered', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN mx >= 5000000 AND mn <= 10000000 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(n) AS BIGINT),
             |    CAST(sum(CASE WHEN mx >= 5000000 AND mn <= 10000000 THEN n ELSE 0 END) AS BIGINT),
             |    CAST(sum(match_n) AS BIGINT)
             |  FROM gc)
             |SELECT layout, n_buckets, buckets_scanned, rows_total, rows_scanned,
             |       rows_matching,
             |       CAST(rows_scanned * 10000 // greatest(rows_matching, 1) AS BIGINT) AS amplification_bp
             |FROM rep ORDER BY layout""".stripMargin)
    ),

    // Largest-remainder (Hamilton) apportionment of a 10k sample budget
    // across sources: base quotas + one slot per largest remainder, so the
    // allocations sum to the budget EXACTLY — what float quota rounding
    // can't promise a downstream sampler.
    QueryDef(
      "q217_budget_allocation",
      (s, dir) =>
        Sampling.largestRemainderAllocation(t(s, dir, "documents"), "source",
          budget = 10000L).orderBy("source"),
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
             |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS N FROM c),
             |b AS (SELECT source, cnt, CAST(10000 * cnt // N AS BIGINT) AS base,
             |    CAST(10000 * cnt % N AS BIGINT) AS rem FROM c, t),
             |l AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS L FROM b),
             |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
             |SELECT source, cnt, base, rem,
             |       CAST(base + CASE WHEN rk <= L THEN 1 ELSE 0 END AS BIGINT) AS alloc
             |FROM r, l ORDER BY source""".stripMargin)
    ),

    // Explicit GROUPING SETS (the general form behind q19's ROLLUP / q178's
    // CUBE): four hand-picked sets in ONE aggregation pass with an explicit
    // 2·grouping(a)+grouping(b) id — Spark's Expand feeds all sets from a
    // single scan, which is the point at 100 TB (4 group-bys would be 4).
    QueryDef(
      "q218_grouping_sets",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
          col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        o.groupingSets(
            Seq(Seq(col("st"), col("pri")), Seq(col("st")), Seq(col("pri")), Seq()),
            col("st"), col("pri"))
          .agg((grouping(col("st")) * 2 + grouping(col("pri"))).cast("long").as("gid"),
            count(lit(1)).as("n"), sum("cents").as("cents_sum"))
          .select(coalesce(col("st"), lit("ALL")).as("st"),
            coalesce(col("pri"), lit("ALL")).as("pri"),
            col("gid"), col("n"), col("cents_sum"))
          .orderBy("gid", "st", "pri")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
             |       coalesce(o_orderpriority, 'ALL') AS pri,
             |       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS gid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |                        (o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, st, pri""".stripMargin)
    ),

    // Value-RANGE window frame: 7-day trailing spend per user over EVENT
    // TIME (peers at the same day aggregate together whatever their row
    // order — the determinism ROWS frames can't give on ties). One
    // exchange on user_id.
    QueryDef(
      "q219_trailing_window",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = events(s, dir).select(col("event_id"), col("user_id"),
          datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rangeBetween(-6, 0)
        e.withColumn("trail7_cents", sum("cents").over(w))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events)
             |SELECT event_id, user_id, day, cents,
             |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day
             |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail7_cents
             |FROM e ORDER BY event_id""".stripMargin)
    ),

    // Matryoshka-truncation recall: top-10 by full 64-dim cosine vs top-10
    // by the first 8 dims, overlap per probe — the exact measurement behind
    // "can we ANN on a prefix and re-rank on the full vector".
    QueryDef(
      "q220_matryoshka_recall",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val probeF = col("vec_id") % 50 === 0
        val full = Similarity.knnJoin(e, "vec_id", "embedding", probeF, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        val e8 = e.select(col("vec_id"), expr("slice(embedding, 1, 8)").as("emb8"))
        val trunc = Similarity.knnJoin(e8, "vec_id", "emb8", probeF, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        val overlap = full.join(trunc, Seq("probe_id", "neighbor_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("overlap10"))
        e.filter(probeF).select(col("vec_id").as("probe_id"))
          .join(overlap, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("overlap10"), lit(0L)).as("overlap10"),
            (coalesce(col("overlap10"), lit(0L)) * 10).as("recall_pct"))
          .orderBy("probe_id")
      },
      Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
             |  WHERE vec_id % 50 = 0),
             |sf AS (SELECT probe_id, vec_id AS neighbor_id,
             |  CAST(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y)
             |   / (sqrt(list_reduce(list_transform(range(len(embedding)), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y))
             |    * sqrt(list_reduce(list_transform(range(len(pv)), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y))) AS DECIMAL(16,12)) AS cs
             |  FROM embeddings, p WHERE vec_id <> probe_id),
             |rf AS (SELECT probe_id, neighbor_id,
             |  row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk FROM sf),
             |st AS (SELECT probe_id, vec_id AS neighbor_id,
             |  CAST(list_reduce(list_transform(range(8), i -> embedding[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y)
             |   / (sqrt(list_reduce(list_transform(range(8), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE), (x,y) -> x + y))
             |    * sqrt(list_reduce(list_transform(range(8), i -> pv[i+1]::DOUBLE * pv[i+1]::DOUBLE), (x,y) -> x + y))) AS DECIMAL(16,12)) AS cs
             |  FROM embeddings, p WHERE vec_id <> probe_id),
             |rt AS (SELECT probe_id, neighbor_id,
             |  row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk FROM st),
             |ov AS (SELECT rf.probe_id, CAST(count(*) AS BIGINT) AS overlap10
             |  FROM rf JOIN rt ON rf.probe_id = rt.probe_id AND rf.neighbor_id = rt.neighbor_id
             |  WHERE rf.rk <= 10 AND rt.rk <= 10 GROUP BY 1)
             |SELECT p.probe_id, CAST(coalesce(ov.overlap10, 0) AS BIGINT) AS overlap10,
             |       CAST(coalesce(ov.overlap10, 0) * 10 AS BIGINT) AS recall_pct
             |FROM p LEFT JOIN ov ON p.probe_id = ov.probe_id
             |ORDER BY p.probe_id""".stripMargin)
    ),

    // Entity resolution, Fellegi–Sunter style: a deterministically dirtied
    // copy of customer (case noise, segment corruption, ±1-cent balance
    // drift) re-linked to the original by INTEGER field-agreement weights
    // inside hash blocks — blocking on (nation, casefolded-name md5 bucket)
    // bounds candidates; no all-pairs compare ever runs.
    QueryDef(
      "q221_entity_resolution",
      (s, dir) => {
        val base = t(s, dir, "customer").select(col("c_custkey").as("id"),
          col("c_name").as("name"), col("c_nationkey").as("nat"),
          round(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment").as("seg"))
        val dirty = base.select((col("id") + 1000000L).as("b_id"),
          when(col("id") % 3 === 0, upper(col("name"))).otherwise(col("name")).as("b_name"),
          col("nat").as("b_nat"),
          when(col("id") % 5 === 0, col("cents") + 1).otherwise(col("cents")).as("b_cents"),
          when(col("id") % 7 === 0, lit("UNKNOWN")).otherwise(col("seg")).as("b_seg"))
        def blk(c: String) =
          expr(s"CAST(conv(substring(md5(lower(`$c`)), 1, 4), 16, 10) AS BIGINT) % 64")
        val a = base.withColumn("blk", blk("name"))
        val b = dirty.withColumn("blk", blk("b_name"))
        val scored = a.join(b, Seq("blk"))
          .filter(col("nat") === col("b_nat"))
          .withColumn("w_name",
            when(lower(col("name")) === lower(col("b_name")), 40L).otherwise(-10L))
          .withColumn("w_seg", when(col("seg") === col("b_seg"), 15L).otherwise(-5L))
          .withColumn("w_bal",
            when(abs(col("cents") - col("b_cents")) <= 1, 20L).otherwise(-10L))
          .withColumn("score", col("w_name") + col("w_seg") + col("w_bal"))
        orderedOut(scored.filter(col("score") >= 50)
          .select(col("id"), col("b_id"), col("w_name"), col("w_seg"),
            col("w_bal"), col("score")),
          "id", "b_id")
      },
      Some("""WITH base AS (SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS seg
             |  FROM customer),
             |dirty AS (SELECT id + 1000000 AS b_id,
             |    CASE WHEN id % 3 = 0 THEN upper(name) ELSE name END AS b_name,
             |    nat AS b_nat,
             |    CASE WHEN id % 5 = 0 THEN cents + 1 ELSE cents END AS b_cents,
             |    CASE WHEN id % 7 = 0 THEN 'UNKNOWN' ELSE seg END AS b_seg
             |  FROM base),
             |a AS (SELECT *, ('0x' || substr(md5(lower(name)), 1, 4))::BIGINT % 64 AS blk FROM base),
             |b AS (SELECT *, ('0x' || substr(md5(lower(b_name)), 1, 4))::BIGINT % 64 AS blk FROM dirty),
             |sc AS (SELECT a.id, b.b_id,
             |    CASE WHEN lower(a.name) = lower(b.b_name) THEN 40 ELSE -10 END AS w_name,
             |    CASE WHEN a.seg = b.b_seg THEN 15 ELSE -5 END AS w_seg,
             |    CASE WHEN abs(a.cents - b.b_cents) <= 1 THEN 20 ELSE -10 END AS w_bal
             |  FROM a JOIN b ON a.blk = b.blk AND a.nat = b.b_nat)
             |SELECT id, b_id, CAST(w_name AS BIGINT) AS w_name,
             |       CAST(w_seg AS BIGINT) AS w_seg, CAST(w_bal AS BIGINT) AS w_bal,
             |       CAST(w_name + w_seg + w_bal AS BIGINT) AS score
             |FROM sc WHERE w_name + w_seg + w_bal >= 50
             |ORDER BY id, b_id""".stripMargin)
    ),

    // URL path-hierarchy rollup: every ancestor prefix of a 3-level path
    // aggregated in one explode pass — the crawl-planning view ("how much
    // of the corpus lives under /a1/b3") a flat GROUP BY path can't give.
    QueryDef(
      "q222_path_rollup",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          concat(lit("/a"), (col("doc_id") % 3).cast("string")).as("p1"),
          concat(lit("/a"), (col("doc_id") % 3).cast("string"),
            lit("/b"), (col("doc_id") % 5).cast("string")).as("p2"),
          concat(lit("/a"), (col("doc_id") % 3).cast("string"),
            lit("/b"), (col("doc_id") % 5).cast("string"),
            lit("/c"), (col("doc_id") % 7).cast("string")).as("p3"))
        d.select(col("doc_id"), col("source"),
            explode(array(col("p1"), col("p2"), col("p3"))).as("prefix"))
          .groupBy("prefix")
          .agg(count(lit(1)).as("n_docs"), countDistinct("source").as("n_sources"))
          .withColumn("depth",
            (length(col("prefix")) - length(regexp_replace(col("prefix"), "/", "")))
              .cast("long"))
          .select("prefix", "depth", "n_docs", "n_sources")
          .orderBy("prefix")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    '/a' || (doc_id % 3) AS p1,
             |    '/a' || (doc_id % 3) || '/b' || (doc_id % 5) AS p2,
             |    '/a' || (doc_id % 3) || '/b' || (doc_id % 5) || '/c' || (doc_id % 7) AS p3
             |  FROM documents),
             |x AS (SELECT doc_id, source, unnest([p1, p2, p3]) AS prefix FROM d)
             |SELECT prefix,
             |       CAST(length(prefix) - length(replace(prefix, '/', '')) AS BIGINT) AS depth,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
             |FROM x GROUP BY prefix ORDER BY prefix""".stripMargin)
    ),

    // Out-of-order-depth audit (watermark sizing): per event, how far
    // behind the furthest-seen event time it arrived (arrival order =
    // event_id), bucketed into the watermark budgets a streaming deploy
    // would choose between. Running max via the DISTRIBUTED two-phase scan
    // — the naive global window would collapse to one task.
    QueryDef(
      "q223_lateness_audit",
      (s, dir) => {
        // the fixture stream is perfectly ordered, so PLANT bounded
        // disorder (the q206 planted-truth pattern): arrival position =
        // event_id jittered by a deterministic ±100-slot hash — the audit
        // must then report exactly the disorder the jitter introduces
        val e = events(s, dir).select(col("event_id"),
          col("ts").cast("long").as("sec"))
          .withColumn("arrival",
            (col("event_id") +
              expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 200 - 100"))
              * 10000000L + col("event_id"))
        val lm = Packing.withRunningMaxExclusive(e, "arrival", "sec", "prior_max")
        lm.withColumn("late",
            greatest(coalesce(col("prior_max") - col("sec"), lit(0L)), lit(0L)))
          .withColumn("bucket",
            when(col("late") === 0, "a_on_time")
              .when(col("late") <= 3600, "b_within_1h")
              .when(col("late") <= 21600, "c_within_6h")
              .when(col("late") <= 86400, "d_within_24h")
              .otherwise("e_over_24h"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), max("late").as("max_late_sec"))
          .orderBy("bucket")
      },
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) // 1000000 AS sec,
             |    (event_id + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 6))::BIGINT % 200 - 100)
             |      * 10000000 + event_id AS arrival
             |  FROM events),
             |m AS (SELECT event_id, sec,
             |    max(sec) OVER (ORDER BY arrival
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM e),
             |l AS (SELECT greatest(coalesce(pm - sec, 0), 0) AS late FROM m),
             |b AS (SELECT late, CASE WHEN late = 0 THEN 'a_on_time'
             |    WHEN late <= 3600 THEN 'b_within_1h'
             |    WHEN late <= 21600 THEN 'c_within_6h'
             |    WHEN late <= 86400 THEN 'd_within_24h'
             |    ELSE 'e_over_24h' END AS bucket FROM l)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |       CAST(max(late) AS BIGINT) AS max_late_sec
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),

    // Bloom-join pruning certificate with an engine-exact Bloom (bit array
    // = distinct lit-position set): how many lineitem rows a runtime
    // filter built from the 'P'-status orders would admit vs the exact
    // semi-join truth — the false-positive math behind runtime filters.
    QueryDef(
      "q224_bloom_join_prune",
      (s, dir) => {
        val probe = t(s, dir, "lineitem").select(col("l_orderkey"))
        val build = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_orderkey"))
        // undersized (m ≈ 3 bits/key at sf0.01) vs sized-for-1% (≈13
        // bits/key): the same math, certified at both operating points
        Dedup.bloomJoinPruneStats(probe, "l_orderkey", build, "o_orderkey",
            mBits = 16384, kHashes = 4)
          .unionByName(Dedup.bloomJoinPruneStats(probe, "l_orderkey",
            build, "o_orderkey", mBits = 65536, kHashes = 4))
          .orderBy("m_bits")
      },
      Some {
        def one(m: Int) =
          s"""SELECT CAST(count(*) AS BIGINT) AS n_probe_rows,
             |       CAST($m AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,
             |       CAST(sum(pass) AS BIGINT) AS bloom_pass,
             |       CAST(sum(truth) AS BIGINT) AS true_matches,
             |       CAST(sum(pass) - sum(truth) AS BIGINT) AS false_pos,
             |       CAST((sum(pass) - sum(truth)) * 10000
             |            // greatest(count(*) - sum(truth), 1) AS BIGINT) AS fpr_bp
             |FROM (SELECT r.k, v.pass, CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS truth
             |  FROM rows_ r
             |  JOIN (SELECT pp.k, CASE WHEN count(pos.p) = count(*) THEN 1 ELSE 0 END AS pass
             |        FROM (SELECT k, ('0x' || substr(md5(k || ':' || i), 1, 8))::BIGINT % $m AS p
             |              FROM dk, ii) pp
             |        LEFT JOIN (SELECT DISTINCT ('0x' || substr(md5(k || ':' || i), 1, 8))::BIGINT % $m AS p
             |                   FROM bk, ii) pos ON pp.p = pos.p
             |        GROUP BY pp.k) v ON r.k = v.k
             |  LEFT JOIN bk b ON r.k = b.k)""".stripMargin
        s"""WITH bk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k
           |  FROM orders WHERE o_orderstatus = 'P'),
           |ii AS (SELECT unnest(range(4)) AS i),
           |dk AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
           |rows_ AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem)
           |${one(16384)}
           |UNION ALL
           |${one(65536)}
           |ORDER BY m_bits""".stripMargin
      }
    ),

    // Mixed-script (confusable) token audit: Cyrillic \u0430/\u0435/\u043e planted into
    // every 11th doc via translate, detected as tokens carrying BOTH Latin
    // letters and Cyrillic vowels — the homoglyph-spoof gate a security-
    // aware text pipeline runs. Scan-fused projections, one aggregate.
    QueryDef(
      "q225_confusable_audit",
      (s, dir) => {
        val base = t(s, dir, "documents")
        val d = base.select(col("doc_id"),
          when(col("doc_id") % 11 === 0, translate(col("text"), "aeo", "\u0430\u0435\u043e"))
            .otherwise(col("text")).as("t2"))
        val toks = d.select(col("doc_id"),
          explode(expr("filter(split(t2, '\\\\s+'), x -> x != '')")).as("tok"))
        // containment via translate-delete + length compare — no regex
        // engine in the per-token hot path (two codegen'd translates vs
        // two rlike evaluations per token; same result, ~2x the scan)
        val latin = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        val hasLatin = length(translate(col("tok"), latin, "")) < length(col("tok"))
        val hasCyr = length(translate(col("tok"), "\u0430\u0435\u043e", "")) < length(col("tok"))
        val agg = toks.groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          sum(when(hasLatin && hasCyr, 1L).otherwise(0L)).as("n_mixed"))
        base.select(col("doc_id"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_mixed"), lit(0L)).as("n_mixed"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN translate(text, 'aeo', 'аео')
             |         ELSE text END AS t2
             |  FROM documents),
             |toks AS (SELECT doc_id,
             |    unnest(list_filter(string_split_regex(t2, '\s+'), x -> x <> '')) AS tok
             |  FROM d),
             |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(sum(CASE WHEN regexp_matches(tok, '[A-Za-z]')
             |                   AND regexp_matches(tok, '[аео]') THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed
             |  FROM toks GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
             |       CAST(coalesce(a.n_mixed, 0) AS BIGINT) AS n_mixed
             |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin)
    ),

    // Join IVM certificate (insert-only delta rule): a materialized
    // orders⋈lineitem advanced by the three delta terms must be
    // row-checksum-identical to a full recompute — q153's aggregate IVM
    // completed for joins. At 100 TB only delta-sided joins run.
    QueryDef(
      "q226_join_ivm",
      (s, dir) => {
        val r = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("r_cents"))
        val sS = t(s, dir, "lineitem").select(col("l_orderkey").as("k"),
          col("l_quantity").cast("int").cast("long").as("qty"),
          col("l_partkey"))
        val r0 = r.filter(col("k") % 10 =!= 7)
        val dr = r.filter(col("k") % 10 === 7)
        val s0 = sS.filter(col("l_partkey") % 10 =!= 3).drop("l_partkey")
        val ds = sS.filter(col("l_partkey") % 10 === 3).drop("l_partkey")
        val sum32 = expr(
          "sum(CAST(conv(substring(md5(concat(CAST(k AS STRING), ',', CAST(r_cents AS STRING), ',', CAST(qty AS STRING))), 1, 8), 16, 10) AS BIGINT))")
        val j0 = r0.join(s0, "k")
        val delta = Ivm.joinDelta(r0, dr, s0, ds, "k")
        val maintained = j0.unionByName(delta)
          .agg(count(lit(1)).as("maintained_rows"), sum32.as("maintained_sum"))
        val recomputed = r0.unionByName(dr).join(s0.unionByName(ds), "k")
          .agg(count(lit(1)).as("recomputed_rows"), sum32.as("recomputed_sum"))
        val deltaN = delta.agg(count(lit(1)).as("delta_rows"))
        maintained.crossJoin(recomputed).crossJoin(deltaN)
          .select(col("maintained_rows"), col("recomputed_rows"), col("delta_rows"),
            col("maintained_sum"), col("recomputed_sum"),
            when(col("maintained_rows") === col("recomputed_rows") &&
              col("maintained_sum") === col("recomputed_sum"), 1L).otherwise(0L)
              .as("ivm_exact"))
      },
      Some("""WITH r AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS r_cents FROM orders),
             |li AS (SELECT l_orderkey AS k, CAST(l_quantity AS INT) AS qty, l_partkey FROM lineitem),
             |r0 AS (SELECT * FROM r WHERE k % 10 <> 7),
             |dr AS (SELECT * FROM r WHERE k % 10 = 7),
             |s0 AS (SELECT k, qty FROM li WHERE l_partkey % 10 <> 3),
             |ds AS (SELECT k, qty FROM li WHERE l_partkey % 10 = 3),
             |j0 AS (SELECT r0.k, r_cents, qty FROM r0 JOIN s0 ON r0.k = s0.k),
             |dj AS (SELECT dr.k, r_cents, qty FROM dr JOIN s0 ON dr.k = s0.k
             |  UNION ALL SELECT r0.k, r_cents, qty FROM r0 JOIN ds ON r0.k = ds.k
             |  UNION ALL SELECT dr.k, r_cents, qty FROM dr JOIN ds ON dr.k = ds.k),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS maintained_rows,
             |    CAST(sum(('0x' || substr(md5(k || ',' || r_cents || ',' || qty), 1, 8))::BIGINT) AS BIGINT) AS maintained_sum
             |  FROM (SELECT * FROM j0 UNION ALL SELECT * FROM dj)),
             |f AS (SELECT CAST(count(*) AS BIGINT) AS recomputed_rows,
             |    CAST(sum(('0x' || substr(md5(k || ',' || r_cents || ',' || qty), 1, 8))::BIGINT) AS BIGINT) AS recomputed_sum
             |  FROM (SELECT ru.k, r_cents, qty
             |        FROM (SELECT * FROM r0 UNION ALL SELECT * FROM dr) ru
             |        JOIN (SELECT * FROM s0 UNION ALL SELECT * FROM ds) su ON ru.k = su.k)),
             |dn AS (SELECT CAST(count(*) AS BIGINT) AS delta_rows FROM dj)
             |SELECT maintained_rows, recomputed_rows, delta_rows,
             |       maintained_sum, recomputed_sum,
             |       CAST(CASE WHEN maintained_rows = recomputed_rows
             |                  AND maintained_sum = recomputed_sum THEN 1 ELSE 0 END AS BIGINT) AS ivm_exact
             |FROM m, f, dn""".stripMargin)
    ),

    // KMV (bottom-k minimum values) distinct-count certificate: the k-th
    // smallest 32-bit key hash per group estimates distincts as
    // (k−1)·2³² div h_k — sketch vs exact, all-integer, the third
    // cardinality sketch certified here (HLL q120, CMS q135, KMV).
    QueryDef(
      "q227_kmv_certificate",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = events(s, dir)
          .select(col("event_type").as("g"), col("user_id").as("u")).distinct()
        val dh = d.withColumn("h",
            expr("CAST(conv(substring(md5(CAST(u AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
          .select("g", "h").distinct()
        val ranked = dh.withColumn("rn",
          row_number().over(Window.partitionBy("g").orderBy("h")))
        val kth = ranked.filter(col("rn") === 64)
          .select(col("g"), col("h").as("hk"))
        val exact = d.groupBy("g").agg(countDistinct("u").as("exact"))
        exact.join(kth, Seq("g"), "left")
          .select(col("g"), col("exact"),
            when(col("hk").isNotNull, expr("63 * 4294967296 div hk"))
              .otherwise(col("exact")).as("kmv_est"))
          .withColumn("err_pct",
            expr("abs(kmv_est - exact) * 100 div greatest(exact, 1)"))
          .orderBy("g")
      },
      Some("""WITH d AS (SELECT DISTINCT event_type AS g, user_id AS u FROM events),
             |dh AS (SELECT DISTINCT g,
             |    ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 8))::BIGINT AS h FROM d),
             |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh),
             |kth AS (SELECT g, h AS hk FROM r WHERE rn = 64),
             |e AS (SELECT g, CAST(count(DISTINCT u) AS BIGINT) AS exact FROM d GROUP BY 1),
             |j AS (SELECT e.g, e.exact,
             |    CASE WHEN kth.hk IS NOT NULL THEN 63 * 4294967296 // kth.hk
             |         ELSE e.exact END AS kmv_est
             |  FROM e LEFT JOIN kth ON e.g = kth.g)
             |SELECT g, exact, CAST(kmv_est AS BIGINT) AS kmv_est,
             |       CAST(abs(kmv_est - exact) * 100 // greatest(exact, 1) AS BIGINT) AS err_pct
             |FROM j ORDER BY g""".stripMargin)
    ),

    // Audience-overlap matrix: for every event-type pair, how many users
    // did both — the segment-intersection report. Per-user type sets are
    // tiny (≤ #types), so the per-user pair blast is constant-bounded;
    // one shuffle on user, one on the pair.
    QueryDef(
      "q228_audience_overlap",
      (s, dir) => {
        val d = events(s, dir)
          .select(col("user_id").as("u"), col("event_type").as("t")).distinct()
        d.select(col("u"), col("t").as("ta"))
          .join(d.select(col("u"), col("t").as("tb")), Seq("u"))
          .filter(col("ta") <= col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_users"))
          .orderBy("ta", "tb")
      },
      Some("""WITH d AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events)
             |SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS n_users
             |FROM d a JOIN d b ON a.u = b.u AND a.t <= b.t
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Calendar gap-fill with LOCF: each user's daily series regularized to
    // a dense day grid, missing days carried forward from the last
    // observation — feature-store regularization. Carry = running max of
    // observed-day (aggregate max skips nulls on both engines) joined back
    // to its value; every window partitions by user.
    QueryDef(
      "q229_locf_gapfill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir).select(col("user_id").as("u"),
          datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("cents"),
          col("ts"), col("event_id"))
        val wLast = Window.partitionBy("u", "day")
          .orderBy(col("ts").desc, col("event_id").desc)
        val obs = ev.withColumn("__rn", row_number().over(wLast))
          .filter(col("__rn") === 1).select("u", "day", "cents")
        val grid = obs.groupBy("u").agg(min("day").as("mn"), max("day").as("mx"))
          .select(col("u"), explode(expr("sequence(mn, mx)")).as("day"))
        val wCarry = Window.partitionBy("u").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(obs, Seq("u", "day"), "left")
          .withColumn("carry",
            max(when(col("cents").isNotNull, col("day"))).over(wCarry))
          .withColumn("is_filled", when(col("cents").isNull, 1L).otherwise(0L))
          .drop("cents")
          .join(obs.select(col("u"), col("day").as("carry"),
            col("cents").as("cents_locf")), Seq("u", "carry"))
          .select("u", "day", "cents_locf", "is_filled")
          .orderBy("u", "day")
      },
      Some("""WITH ev AS (SELECT user_id AS u,
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    epoch_us(ts) AS tus, event_id
             |  FROM events),
             |obs AS (SELECT u, day, cents FROM (
             |    SELECT *, row_number() OVER (PARTITION BY u, day
             |      ORDER BY tus DESC, event_id DESC) AS rn FROM ev) WHERE rn = 1),
             |grid AS (SELECT u, unnest(generate_series(mn, mx)) AS day
             |  FROM (SELECT u, min(day) AS mn, max(day) AS mx FROM obs GROUP BY 1)),
             |g2 AS (SELECT g.u, g.day, o.cents,
             |    max(CASE WHEN o.cents IS NOT NULL THEN g.day END)
             |      OVER (PARTITION BY g.u ORDER BY g.day
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
             |  FROM grid g LEFT JOIN obs o ON g.u = o.u AND g.day = o.day)
             |SELECT g2.u, g2.day, o2.cents AS cents_locf,
             |       CAST(CASE WHEN g2.cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_filled
             |FROM g2 JOIN obs o2 ON g2.u = o2.u AND g2.carry = o2.day
             |ORDER BY g2.u, g2.day""".stripMargin)
    ),

    // ViT-style patch grid over REAL decoded P6 pixels: 16×16 images in
    // 4×4 tiles, per-tile integer luma sum — the patch-embedding
    // front-end's reduction, oracle-checked from the generator math.
    QueryDef(
      "q230_mm_patch_grid",
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 16, height = 16)
        Multimodal.ppmPatchGrid(withPayload, "doc_id", "payload", patch = 4)
          .orderBy("doc_id", "patch_row", "patch_col")
      },
      Some("""WITH px AS (SELECT doc_id,
             |    list_transform(range(768),
             |      j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents),
             |grid AS (SELECT pr, pc FROM (SELECT unnest(range(4)) AS pr),
             |                              (SELECT unnest(range(4)) AS pc))
             |SELECT doc_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
             |       CAST(list_sum(list_transform(range(48), k ->
             |         p[3 * ((pr*4 + (k//3)//4) * 16 + pc*4 + (k//3)%4) + (k%3) + 1]))
             |         AS BIGINT) AS luma_sum
             |FROM px, grid
             |ORDER BY doc_id, patch_row, patch_col""".stripMargin)
    ),

    // SimHash quality certificate: precision/recall of hamming-threshold
    // near-dup prediction against exact-Jaccard ground truth over the q34
    // blocked pairs, at three thresholds — the measured answer to "is a
    // 32-bit SimHash good enough for this corpus".
    QueryDef(
      "q231_simhash_quality",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = Dedup.simHash(docs, "doc_id", "text")
        val d = docs.select(col("doc_id"), col("lang"),
            (col("n_chars") / 50).cast("int").as("lb"),
            sort_array(array_distinct(split(col("text"), " "))).as("ws"))
          .withColumn("n", size(col("ws")).cast("long"))
          .join(sh, "doc_id")
        graft.functions.GraftFunctions.register(s)
        val a = d.select(col("doc_id").as("a_id"), col("lang"), col("lb"),
          col("ws").as("a_ws"), col("n").as("a_n"), col("simhash").as("a_sh"))
        val b = d.select(col("doc_id").as("b_id"), col("lang"), col("lb"),
          col("ws").as("b_ws"), col("n").as("b_n"), col("simhash").as("b_sh"))
        val pairs = a.join(b, Seq("lang", "lb"))
          .filter(col("a_id") < col("b_id"))
          .select(
            graft.functions.GraftFunctions.sortedIntersectCount(col("a_ws"), col("b_ws"))
              .as("inter"),
            (col("a_n") + col("b_n")).as("nn"),
            expr("bit_count(a_sh ^ b_sh)").cast("long").as("ham"))
          .withColumn("truth", (col("inter") * 140 >= col("nn") * 40).cast("long"))
        pairs.select(col("truth"), col("ham"),
            explode(array(lit(3L), lit(6L), lit(10L))).as("ham_thresh"))
          .withColumn("pred", (col("ham") <= col("ham_thresh")).cast("long"))
          .groupBy("ham_thresh")
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("truth * pred")).as("tp"),
            sum(expr("(1 - truth) * pred")).as("fp"),
            sum(expr("truth * (1 - pred)")).as("fn"))
          .select(col("ham_thresh"), col("n_pairs"), col("tp"), col("fp"), col("fn"),
            expr("tp * 10000 div greatest(tp + fp, 1)").as("precision_bp"),
            expr("tp * 10000 div greatest(tp + fn, 1)").as("recall_bp"))
          .orderBy("ham_thresh")
      },
      Some(s"""WITH sh AS ($duckSimhashSub),
              |d AS (SELECT doc_id, lang, n_chars // 50 AS lb,
              |    list_sort(list_distinct(string_split(text, ' '))) AS ws FROM documents),
              |d2 AS (SELECT d.*, CAST(len(ws) AS BIGINT) AS n, sh.simhash
              |  FROM d JOIN sh USING (doc_id)),
              |pairs AS (SELECT
              |    CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter,
              |    a.n + b.n AS nn,
              |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
              |  FROM d2 a JOIN d2 b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id),
              |f AS (SELECT CASE WHEN inter * 140 >= nn * 40 THEN 1 ELSE 0 END AS truth,
              |    ham, unnest([3, 6, 10]) AS ham_thresh FROM pairs),
              |g AS (SELECT ham_thresh, CAST(count(*) AS BIGINT) AS n_pairs,
              |    CAST(sum(truth * (CASE WHEN ham <= ham_thresh THEN 1 ELSE 0 END)) AS BIGINT) AS tp,
              |    CAST(sum((1 - truth) * (CASE WHEN ham <= ham_thresh THEN 1 ELSE 0 END)) AS BIGINT) AS fp,
              |    CAST(sum(truth * (CASE WHEN ham > ham_thresh THEN 1 ELSE 0 END)) AS BIGINT) AS fn
              |  FROM f GROUP BY 1)
              |SELECT CAST(ham_thresh AS BIGINT) AS ham_thresh, n_pairs, tp, fp, fn,
              |       CAST(tp * 10000 // greatest(tp + fp, 1) AS BIGINT) AS precision_bp,
              |       CAST(tp * 10000 // greatest(tp + fn, 1) AS BIGINT) AS recall_bp
              |FROM g ORDER BY ham_thresh""".stripMargin)
    ),

    // Dictionary-encoding advisor: per column, exact NDV against row count
    // decides dict-vs-plain — the parquet encoding choice q204 (runs) and
    // q216 (zone maps) complete into a layout-advice trio. ONE aggregate
    // pass over the table for all columns.
    QueryDef(
      "q232_encoding_advisor",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
        val aggs = count(lit(1)).as("n") +:
          cols.map(c => countDistinct(col(c)).as(s"ndv_$c"))
        val one = o.agg(aggs.head, aggs.tail: _*)
        cols.map { c =>
          one.select(lit(c).as("column_name"), col("n"),
            col(s"ndv_$c").as("ndv"),
            expr(s"ndv_$c * 10000 div n").as("ndv_bp"),
            when(expr(s"ndv_$c * 10000 div n") < 500, "dictionary")
              .otherwise("plain").as("verdict"))
        }.reduce(_ unionByName _).orderBy("column_name")
      },
      Some("""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_st,
             |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_pri,
             |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_ck
             |  FROM orders),
             |rep AS (
             |  SELECT 'o_custkey' AS column_name, n, nd_ck AS ndv FROM a
             |  UNION ALL SELECT 'o_orderpriority', n, nd_pri FROM a
             |  UNION ALL SELECT 'o_orderstatus', n, nd_st FROM a)
             |SELECT column_name, n, ndv,
             |       CAST(ndv * 10000 // n AS BIGINT) AS ndv_bp,
             |       CASE WHEN ndv * 10000 // n < 500 THEN 'dictionary' ELSE 'plain' END AS verdict
             |FROM rep ORDER BY column_name""".stripMargin)
    ),

    // Star-join cardinality chain: q205's CBO formula applied per STEP of
    // lineitem⋈orders⋈customer⋈nation — estimated vs exact intermediate
    // cardinalities, the numbers a join-order optimizer actually compares.
    QueryDef(
      "q233_starjoin_card",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        val j1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        val j2 = j1.join(c, col("o_custkey") === col("c_custkey"))
        val n = t(s, dir, "nation").select(col("n_nationkey"))
        val j3 = j2.join(n, col("c_nationkey") === col("n_nationkey"))
        def stats(df: DataFrame, keyCol: String, label: String) =
          df.agg(count(lit(1)).as("n_rows"), countDistinct(keyCol).as("ndv"))
            .select(lit(label).as("step"), col("n_rows"), col("ndv"))
        val s0 = stats(li, "l_orderkey", "0_lineitem")
          .unionByName(stats(o, "o_orderkey", "1_orders"))
          .unionByName(stats(j1, "o_custkey", "2_join_orders"))
          .unionByName(stats(c, "c_custkey", "3_customer"))
          .unionByName(stats(j2, "c_nationkey", "4_join_customer"))
          .unionByName(stats(n, "n_nationkey", "5_nation"))
          .unionByName(stats(j3, "c_nationkey", "6_join_nation"))
        s0.orderBy("step")
      },
      Some("""WITH li AS (SELECT l_orderkey FROM lineitem),
             |o AS (SELECT o_orderkey, o_custkey FROM orders),
             |c AS (SELECT c_custkey, c_nationkey FROM customer),
             |n AS (SELECT n_nationkey FROM nation),
             |j1 AS (SELECT o_custkey, o_orderkey FROM li JOIN o ON l_orderkey = o_orderkey),
             |j2 AS (SELECT c_nationkey, c_custkey, o_custkey FROM j1 JOIN c ON o_custkey = c_custkey),
             |j3 AS (SELECT j2.c_nationkey FROM j2 JOIN n ON j2.c_nationkey = n.n_nationkey),
             |rep AS (
             |  SELECT '0_lineitem' AS step, CAST(count(*) AS BIGINT) AS rows_,
             |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv FROM li
             |  UNION ALL SELECT '1_orders', count(*), count(DISTINCT o_orderkey) FROM o
             |  UNION ALL SELECT '2_join_orders', count(*), count(DISTINCT o_custkey) FROM j1
             |  UNION ALL SELECT '3_customer', count(*), count(DISTINCT c_custkey) FROM c
             |  UNION ALL SELECT '4_join_customer', count(*), count(DISTINCT c_nationkey) FROM j2
             |  UNION ALL SELECT '5_nation', count(*), count(DISTINCT n_nationkey) FROM n
             |  UNION ALL SELECT '6_join_nation', count(*), count(DISTINCT c_nationkey) FROM j3)
             |SELECT step, rows_ AS n_rows, ndv FROM rep ORDER BY step""".stripMargin)
    ),

    // Join-fanout audit: per-key multiplicity census of a self-join BEFORE
    // running it — Σn² predicts the output size and the top keys name the
    // explosion. The 100 TB early-warning that turns "join OOMed" into a
    // number read off one aggregate.
    QueryDef(
      "q234_join_fanout",
      (s, dir) => {
        val m = t(s, dir, "lineitem").groupBy(col("l_partkey").as("k"))
          .agg(count(lit(1)).as("n"))
        val totals = m.agg(sum("n").as("left_rows"),
          sum(col("n") * col("n")).as("fanout_rows"),
          max("n").as("max_mult"), count(lit(1)).as("n_keys"))
        val top = m.orderBy(col("n").desc, col("k")).limit(5)
          .agg(sum(col("n") * col("n")).as("top5_fanout"))
        totals.crossJoin(top)
          .select(col("n_keys"), col("left_rows"), col("fanout_rows"),
            col("max_mult"), col("top5_fanout"),
            expr("fanout_rows * 100 div greatest(left_rows, 1)").as("amplification_x100"))
      },
      Some("""WITH m AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |    CAST(sum(n) AS BIGINT) AS left_rows,
             |    CAST(sum(n * n) AS BIGINT) AS fanout_rows,
             |    CAST(max(n) AS BIGINT) AS max_mult FROM m),
             |tp AS (SELECT CAST(sum(n * n) AS BIGINT) AS top5_fanout FROM
             |  (SELECT n FROM m ORDER BY n DESC, k LIMIT 5))
             |SELECT n_keys, left_rows, fanout_rows, max_mult, top5_fanout,
             |       CAST(fanout_rows * 100 // greatest(left_rows, 1) AS BIGINT) AS amplification_x100
             |FROM t, tp""".stripMargin)
    ),

    // Max-min fair (water-filling) capacity allocation: the largest level
    // L with Σ min(demand, L) ≤ capacity, found by a prefix scan over
    // demand-sorted tenants — the fair-scheduler math, all-integer. Small
    // tenants keep their demand; big ones cap at L; the remainder column
    // is what a second-pass distributor would hand out.
    QueryDef(
      "q235_maxmin_fair",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // demand = docs × (1 + source index): heterogeneous by construction
        // (the uniform fixture would otherwise cap every tenant equally and
        // never exercise the served/capped split)
        val d = t(s, dir, "documents").groupBy(col("source"))
          .agg(expr("count(*) * (1 + cast(substring(source, 4) as int))")
            .as("demand"))
        val cap = d.agg(expr("sum(demand) * 6 div 10").as("__cap"))
        // tenant count is mixture-label bounded: the unpartitioned windows
        // run over tens of rows, never data rows
        val w = Window.orderBy(col("demand"), col("source"))
        val wAll = Window.orderBy(col("demand"), col("source"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val ranked = d.crossJoin(broadcast(cap))
          .withColumn("__pfx", sum("demand").over(w))
          .withColumn("__rk", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(wAll))
        // level candidate if every smaller tenant is fully served: the
        // remaining capacity split among the __n - __rk larger tenants
        // rank-k candidate: serve ranks ≤ k fully, split the remainder among
        // the n−k larger tenants; valid iff affordable AND the level covers
        // d_k (so "fully served" is consistent). rank-n with pfx ≤ cap means
        // every demand fits: unbounded level. The water level is the MAX
        // valid candidate, floored by the all-capped k=0 level cap div n.
        val leveled = ranked.withColumn("__lvl",
          when(col("__n") > col("__rk"),
            expr("(__cap - __pfx) div (__n - __rk)")).otherwise(lit(Long.MaxValue)))
        val vmax = leveled
          .filter(col("__pfx") <= col("__cap") && col("__lvl") >= col("demand"))
          .agg(max(col("__lvl")).as("__vmax"))
        val k0 = d.agg(expr("sum(demand) * 6 div 10 div count(*)").as("__k0"))
        val level = vmax.crossJoin(k0)
          .select(greatest(coalesce(col("__vmax"), lit(0L)), col("__k0")).as("__level"))
        d.crossJoin(broadcast(cap)).crossJoin(broadcast(level))
          .select(col("source"), col("demand"),
            least(col("demand"), col("__level")).as("alloc"),
            when(col("demand") > col("__level"), 1L).otherwise(0L).as("capped"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
             |    CAST(count(*) * (1 + CAST(substr(source, 4) AS INT)) AS BIGINT) AS demand
             |  FROM documents GROUP BY 1),
             |cap AS (SELECT CAST(sum(demand) * 6 // 10 AS BIGINT) AS c FROM d),
             |r AS (SELECT source, demand, c,
             |    sum(demand) OVER (ORDER BY demand, source) AS pfx,
             |    row_number() OVER (ORDER BY demand, source) AS rk,
             |    count(*) OVER () AS n
             |  FROM d, cap),
             |lv AS (SELECT *, CASE WHEN n > rk THEN (c - pfx) // (n - rk)
             |    ELSE 9223372036854775807 END AS lvl FROM r),
             |vmax AS (SELECT max(lvl) AS vm FROM lv WHERE pfx <= c AND lvl >= demand),
             |k0 AS (SELECT sum(demand) * 6 // 10 // count(*) AS k FROM d),
             |level AS (SELECT CAST(greatest(coalesce(vm, 0), k) AS BIGINT) AS l FROM vmax, k0)
             |SELECT source, demand,
             |       CAST(least(demand, level.l) AS BIGINT) AS alloc,
             |       CAST(CASE WHEN demand > level.l THEN 1 ELSE 0 END AS BIGINT) AS capped
             |FROM d, level ORDER BY source""".stripMargin)
    ),

    // Transitive-contamination audit of the LSH dedup clusters: connected
    // components chain A~B~C into one cluster even when A and C share
    // nothing — this measures exactly how much of each cluster is held
    // together only by chaining (intra-pairs failing the exact-Jaccard
    // verify). The dedup-quality number union-find alone hides.
    QueryDef(
      "q236_transitive_contamination",
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        // PLANT bridges: 70% of parent A + 70% of parent B (37 ids apart,
        // unrelated) — near-dup of each parent, so LSH chains A–bridge–B
        // into one cluster whose A–B pair must fail the exact verify
        val bridges = base.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("ia"), col("text").as("ta"))
          .join(base.select(col("doc_id").as("ib"), col("text").as("tb")),
            col("ib") === col("ia") + 37)
          .select((col("ia") + 5000000L).as("doc_id"),
            concat(expr("substring(ta, 1, length(ta) * 7 div 10)"), lit(" "),
              expr("substring(tb, length(tb) * 3 div 10 + 1)")).as("text"))
        val docs = base.unionByName(bridges)
        // materialize the band-capped pair list ONCE: it feeds three
        // consumers (component computation, the bounded enumeration's
        // membership, and the direct-edge flag join) and would otherwise
        // re-run the whole shingle->minhash->band pipeline per consumer
        val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          numHashes = 8, bandSize = 2, shingleK = 3).localCheckpoint()
        val cc = Dedup.connectedComponents(pairs, "a_doc_id", "b_doc_id")
        // bounded enumeration: a degenerate cluster (boilerplate family)
        // can't turn this audit quadratic — oversize components are
        // deterministically sampled and flagged exact=0 in the output
        val intra = Dedup.boundedIntraPairs(cc, maxMembers = 64)
          .localCheckpoint() // small (capped) — reused by ids + both joins
        // verify on SHINGLE jaccard — the granularity the LSH hashes;
        // token-set jaccard is too loose (fixture docs share vocabulary).
        // Shingle ONLY cluster members that survived the bound: the
        // expensive per-doc transform+sort never runs for the (vast at
        // corpus scale) majority of docs outside any near-dup cluster
        val memberIds = intra.select(col("a_id").as("doc_id"))
          .unionByName(intra.select(col("b_id").as("doc_id"))).distinct()
        val ws = docs.join(memberIds, Seq("doc_id"), "leftsemi")
          .select(col("doc_id"),
            sort_array(array_distinct(expr(
              """transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)),
                |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))""".stripMargin)))
              .as("ws"))
          .withColumn("n", size(col("ws")).cast("long"))
        graft.functions.GraftFunctions.register(s)
        val scored = intra
          .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws"),
            col("n").as("a_n")), Seq("a_id"))
          .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws"),
            col("n").as("b_n")), Seq("b_id"))
          .withColumn("inter", graft.functions.GraftFunctions
            .sortedIntersectCount(col("a_ws"), col("b_ws")))
          .withColumn("verified",
            (col("inter") * 140 >= (col("a_n") + col("b_n")) * 40).cast("long"))
          .join(pairs.select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"))
            .withColumn("direct", lit(1L)), Seq("a_id", "b_id"), "left")
        scored.agg(
            countDistinct("component").as("n_clusters"),
            count(lit(1)).as("intra_pairs"),
            sum(coalesce(col("direct"), lit(0L))).as("direct_pairs"),
            sum("verified").as("verified_pairs"),
            sum(lit(1L) - col("verified")).as("contaminated_pairs"),
            sum(lit(1L) - col("exact")).as("sampled_pairs"))
          .withColumn("contamination_bp",
            expr("contaminated_pairs * 10000 div greatest(intra_pairs, 1)"))
      },
      Some(s"""WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents
              |  UNION ALL
              |  SELECT a.doc_id + 5000000,
              |         substr(a.text, 1, length(a.text) * 7 // 10) || ' ' ||
              |         substr(b.text, length(b.text) * 3 // 10 + 1)
              |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 37
              |  WHERE a.doc_id % 50 = 0),
              |pairs AS (${duckMinhashPairsSqlOver("corpus")}),
              |edges AS (SELECT a_doc_id AS u, b_doc_id AS v FROM pairs
              |          UNION SELECT b_doc_id, a_doc_id FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT u, u FROM edges
              |  UNION
              |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
              |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |ranked AS (SELECT id, component,
              |    row_number() OVER (PARTITION BY component ORDER BY id) AS rk,
              |    count(*) OVER (PARTITION BY component) AS csize
              |  FROM cc),
              |kept AS (SELECT * FROM ranked WHERE rk <= 64),
              |intra AS (SELECT a.component, a.id AS a_id, b.id AS b_id,
              |    CASE WHEN a.csize <= 64 THEN 1 ELSE 0 END AS ex
              |  FROM kept a JOIN kept b ON a.component = b.component AND a.id < b.id),
              |ws AS (SELECT doc_id,
              |    list_sort(list_distinct(list_transform(range(greatest(len(w0) - 3, 0) + 1),
              |      i -> array_to_string(w0[i+1:i+3], ' ')))) AS w,
              |    CAST(len(list_distinct(list_transform(range(greatest(len(w0) - 3, 0) + 1),
              |      i -> array_to_string(w0[i+1:i+3], ' ')))) AS BIGINT) AS n
              |  FROM (SELECT doc_id, string_split(text, ' ') AS w0 FROM corpus)),
              |sc AS (SELECT i.component, i.a_id, i.b_id, i.ex,
              |    CAST(len(list_intersect(wa.w, wb.w)) AS BIGINT) AS inter,
              |    wa.n + wb.n AS nn,
              |    CASE WHEN p.a_doc_id IS NOT NULL THEN 1 ELSE 0 END AS direct
              |  FROM intra i
              |  JOIN ws wa ON i.a_id = wa.doc_id
              |  JOIN ws wb ON i.b_id = wb.doc_id
              |  LEFT JOIN pairs p ON i.a_id = p.a_doc_id AND i.b_id = p.b_doc_id)
              |SELECT CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
              |       CAST(count(*) AS BIGINT) AS intra_pairs,
              |       CAST(sum(direct) AS BIGINT) AS direct_pairs,
              |       CAST(sum(CASE WHEN inter * 140 >= nn * 40 THEN 1 ELSE 0 END) AS BIGINT) AS verified_pairs,
              |       CAST(sum(CASE WHEN inter * 140 >= nn * 40 THEN 0 ELSE 1 END) AS BIGINT) AS contaminated_pairs,
              |       CAST(sum(1 - ex) AS BIGINT) AS sampled_pairs,
              |       CAST(sum(CASE WHEN inter * 140 >= nn * 40 THEN 0 ELSE 1 END) * 10000
              |            // greatest(count(*), 1) AS BIGINT) AS contamination_bp
              |FROM sc""".stripMargin)
    ),

    // Cross-modality coverage audit: both directions of the docs ↔
    // embeddings correspondence (planted gaps), the join-completeness
    // check a multimodal pipeline runs before training on pairs.
    QueryDef(
      "q237_modality_coverage",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
          .filter(col("doc_id") % 89 =!= 1)
        val e = t(s, dir, "embeddings").select(col("vec_id"))
          .filter(col("vec_id") % 83 =!= 2)
        val docsOnly = d.join(e, col("doc_id") === col("vec_id"), "left_anti")
          .agg(count(lit(1)).as("docs_without_vec"))
        val vecsOnly = e.join(d, col("vec_id") === col("doc_id"), "left_anti")
          .agg(count(lit(1)).as("vecs_without_doc"))
        val paired = d.join(e, col("doc_id") === col("vec_id"))
          .agg(count(lit(1)).as("paired"))
        d.agg(count(lit(1)).as("docs_total"))
          .crossJoin(e.agg(count(lit(1)).as("vecs_total")))
          .crossJoin(paired).crossJoin(docsOnly).crossJoin(vecsOnly)
          .withColumn("coverage_bp", expr("paired * 10000 div docs_total"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 89 <> 1),
             |e AS (SELECT vec_id FROM embeddings WHERE vec_id % 83 <> 2),
             |x AS (SELECT
             |    (SELECT CAST(count(*) AS BIGINT) FROM d) AS docs_total,
             |    (SELECT CAST(count(*) AS BIGINT) FROM e) AS vecs_total,
             |    (SELECT CAST(count(*) AS BIGINT) FROM d JOIN e ON doc_id = vec_id) AS paired,
             |    (SELECT CAST(count(*) AS BIGINT) FROM d LEFT JOIN e ON doc_id = vec_id
             |       WHERE vec_id IS NULL) AS docs_without_vec,
             |    (SELECT CAST(count(*) AS BIGINT) FROM e LEFT JOIN d ON vec_id = doc_id
             |       WHERE doc_id IS NULL) AS vecs_without_doc)
             |SELECT docs_total, vecs_total, paired, docs_without_vec, vecs_without_doc,
             |       CAST(paired * 10000 // docs_total AS BIGINT) AS coverage_bp
             |FROM x""".stripMargin)
    ),

    // Snapshot-chain change attribution: base→mid→head with planted
    // updates/deletes/adds/REVERTS per hop — every net base→head change is
    // attributed to the hop that introduced it, and reverted keys (changed
    // twice, net zero) are surfaced instead of silently vanishing. The
    // "which deploy broke it" query a two-hop diff can't answer alone.
    QueryDef(
      "q238_diff_chain",
      (s, dir) => {
        val base = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("v"))
        val mid = base.filter(col("k") % 101 =!= 0)
          .withColumn("v", when(col("k") % 97 === 0, col("v") + 1).otherwise(col("v")))
          .unionByName(base.filter(col("k") % 103 === 0)
            .select((col("k") + 1000000L).as("k"), col("v")))
        val head = mid.filter(col("k") % 107 =!= 0)
          .withColumn("v",
            when(col("k") % 97 === 0 && col("k") % 5 === 0, col("v") - 1) // revert hop 1
              .when(col("k") % 89 === 0, col("v") + 1)
              .otherwise(col("v")))
          .unionByName(base.filter(col("k") % 109 === 0)
            .select((col("k") + 2000000L).as("k"), col("v")))
        val j = base.select(col("k"), col("v").as("vb"))
          .join(mid.select(col("k"), col("v").as("vm")), Seq("k"), "full")
          .join(head.select(col("k"), col("v").as("vh")), Seq("k"), "full")
        j.agg(
            sum(when(col("vb").isNotNull && col("vm").isNull, 1L).otherwise(0L))
              .as("removed_hop1"),
            sum(when(col("vb").isNull && col("vm").isNotNull, 1L).otherwise(0L))
              .as("added_hop1"),
            sum(when(col("vm").isNotNull && col("vh").isNull, 1L).otherwise(0L))
              .as("removed_hop2"),
            sum(when(col("vm").isNull && col("vh").isNotNull, 1L).otherwise(0L))
              .as("added_hop2"),
            sum(when(col("vb").isNotNull && col("vm").isNotNull && col("vh").isNotNull &&
              col("vb") =!= col("vm") && col("vm") === col("vh"), 1L).otherwise(0L))
              .as("hop1_only"),
            sum(when(col("vb").isNotNull && col("vm").isNotNull && col("vh").isNotNull &&
              col("vb") === col("vm") && col("vm") =!= col("vh"), 1L).otherwise(0L))
              .as("hop2_only"),
            sum(when(col("vb").isNotNull && col("vm").isNotNull && col("vh").isNotNull &&
              col("vb") =!= col("vm") && col("vm") =!= col("vh") &&
              col("vb") =!= col("vh"), 1L).otherwise(0L)).as("both_hops"),
            sum(when(col("vb").isNotNull && col("vm").isNotNull && col("vh").isNotNull &&
              col("vb") =!= col("vm") && col("vm") =!= col("vh") &&
              col("vb") === col("vh"), 1L).otherwise(0L)).as("reverted"),
            sum(when(col("vb").isNotNull && col("vh").isNotNull &&
              col("vb") =!= col("vh") && col("vm").isNotNull, 1L).otherwise(0L))
              .as("net_changed"))
          .withColumn("attribution_exact",
            when(col("net_changed") ===
              col("hop1_only") + col("hop2_only") + col("both_hops"), 1L)
              .otherwise(0L))
      },
      Some("""WITH base AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
             |mid AS (SELECT k, CASE WHEN k % 97 = 0 THEN v + 1 ELSE v END AS v
             |    FROM base WHERE k % 101 <> 0
             |  UNION ALL SELECT k + 1000000, v FROM base WHERE k % 103 = 0),
             |head AS (SELECT k, CASE WHEN k % 97 = 0 AND k % 5 = 0 THEN v - 1
             |      WHEN k % 89 = 0 THEN v + 1 ELSE v END AS v
             |    FROM mid WHERE k % 107 <> 0
             |  UNION ALL SELECT k + 2000000, v FROM base WHERE k % 109 = 0),
             |j1 AS (SELECT coalesce(b.k, m.k) AS k, b.v AS vb, m.v AS vm
             |  FROM base b FULL JOIN mid m ON b.k = m.k),
             |j AS (SELECT coalesce(j1.k, h.k) AS k, vb, vm, h.v AS vh
             |  FROM j1 FULL JOIN head h ON j1.k = h.k),
             |a AS (SELECT
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed_hop1,
             |  CAST(sum(CASE WHEN vb IS NULL AND vm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS added_hop1,
             |  CAST(sum(CASE WHEN vm IS NOT NULL AND vh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed_hop2,
             |  CAST(sum(CASE WHEN vm IS NULL AND vh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS added_hop2,
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vm IS NOT NULL AND vh IS NOT NULL
             |    AND vb <> vm AND vm = vh THEN 1 ELSE 0 END) AS BIGINT) AS hop1_only,
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vm IS NOT NULL AND vh IS NOT NULL
             |    AND vb = vm AND vm <> vh THEN 1 ELSE 0 END) AS BIGINT) AS hop2_only,
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vm IS NOT NULL AND vh IS NOT NULL
             |    AND vb <> vm AND vm <> vh AND vb <> vh THEN 1 ELSE 0 END) AS BIGINT) AS both_hops,
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vm IS NOT NULL AND vh IS NOT NULL
             |    AND vb <> vm AND vm <> vh AND vb = vh THEN 1 ELSE 0 END) AS BIGINT) AS reverted,
             |  CAST(sum(CASE WHEN vb IS NOT NULL AND vh IS NOT NULL AND vb <> vh
             |    AND vm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS net_changed
             |  FROM j)
             |SELECT *, CAST(CASE WHEN net_changed = hop1_only + hop2_only + both_hops
             |    THEN 1 ELSE 0 END AS BIGINT) AS attribution_exact
             |FROM a""".stripMargin)
    ),

    // Exact Wasserstein-1 (earth-mover) drift between two price
    // distributions: ∫|CDFa − CDFb| dv as the integer
    // Σ|cumulative(ca·nb − cb·na)|·gap over distinct values — the drift
    // metric that sees a shifted median where TV (q71) saturates. The
    // cumulative uses the distributed prefix sum and the gap uses the
    // distributed lead — no single-task window anywhere.
    QueryDef(
      "q239_wasserstein_drift",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val ca = o.filter(col("st") === "O").groupBy("cents")
          .agg(count(lit(1)).as("ca"))
        val cb = o.filter(col("st") === "F").groupBy("cents")
          .agg(count(lit(1)).as("cb"))
        val vals = ca.join(cb, Seq("cents"), "full")
          .select(col("cents"), coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"))
        val tot = vals.agg(sum("ca").as("na"), sum("cb").as("nb"))
        val contrib = vals.crossJoin(broadcast(tot))
          .withColumn("contrib", col("ca") * col("nb") - col("cb") * col("na"))
        val cum = Packing.withRunningTotal(contrib, "cents", "contrib", "cum")
        val withNext = Packing.withNextValue(cum, "cents", "next_cents")
        withNext.agg(
            max("na").as("na"), max("nb").as("nb"),
            sum(when(col("next_cents").isNotNull,
              abs(col("cum")) * (col("next_cents") - col("cents")))
              .otherwise(0L)).as("w1_scaled"))
          .withColumn("w1_cents_x100",
            expr("w1_scaled * 100 div (na * nb)"))
      },
      Some("""WITH o AS (SELECT o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |ca AS (SELECT cents, CAST(count(*) AS BIGINT) AS ca FROM o WHERE st = 'O' GROUP BY 1),
             |cb AS (SELECT cents, CAST(count(*) AS BIGINT) AS cb FROM o WHERE st = 'F' GROUP BY 1),
             |vals AS (SELECT coalesce(ca.cents, cb.cents) AS cents,
             |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
             |  FROM ca FULL JOIN cb ON ca.cents = cb.cents),
             |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM vals),
             |c AS (SELECT cents, ca * nb - cb * na AS contrib, na, nb FROM vals, tt),
             |w AS (SELECT cents, na, nb,
             |    sum(contrib) OVER (ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    lead(cents) OVER (ORDER BY cents) AS next_cents
             |  FROM c)
             |SELECT max(na) AS na, max(nb) AS nb,
             |       CAST(sum(CASE WHEN next_cents IS NOT NULL
             |         THEN abs(cum) * (next_cents - cents) ELSE 0 END) AS BIGINT) AS w1_scaled,
             |       CAST(sum(CASE WHEN next_cents IS NOT NULL
             |         THEN abs(cum) * (next_cents - cents) ELSE 0 END) * 100
             |         // (max(na) * max(nb)) AS BIGINT) AS w1_cents_x100
             |FROM w""".stripMargin)
    ),

    // Exact GLOBAL quantiles by distributed rank: the prefix-sum scan
    // assigns every row its global rank (no single-task sort anywhere),
    // then the p10/25/50/75/90 rows are a filter — order statistics over
    // the whole table at 100 TB, where q86's per-group windows don't apply
    // and approx_percentile would be inexact. Rank convention matches
    // q207: value at rank ⌈n·p/100⌉.
    QueryDef(
      "q240_global_quantiles",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
        // unique total-order key, cents-major: ranks = value order. A
        // STRUCT (lexicographic range-partition + window order), not the
        // old cents*1e9 + orderkey*10 + linenumber arithmetic — that
        // stride silently wrapped once l_orderkey*10 + linenumber passed
        // 1e9 (any corpus beyond ~1e8 orders; the r15 sf1 spot-gate
        // caught it on the replica-offset keys), re-ordering rows OUT of
        // cents-major order. The struct has no bound to outgrow.
        val keyed = li.withColumn("__ord",
            struct(col("cents"), col("l_orderkey"), col("l_linenumber")))
          .withColumn("__one", lit(1L))
        val ranked = Packing.withRunningTotal(keyed, "__ord", "__one", "rn")
        val n1 = ranked.agg(count(lit(1)).as("n"))
        val targets = n1.select(explode(expr(
          "transform(array(10, 25, 50, 75, 90), p -> struct(CAST(p AS BIGINT) AS p, CAST((n * p + 99) div 100 AS BIGINT) AS target))"))
          .as("t")).select(col("t.p"), col("t.target"))
        ranked.join(broadcast(targets), col("rn") === col("target"))
          .select(col("p"), col("cents")).orderBy("p")
      },
      Some("""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    l_orderkey, l_linenumber FROM lineitem),
             |r AS (SELECT cents,
             |    row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) AS rn,
             |    count(*) OVER () AS n FROM li)
             |SELECT CAST(p AS BIGINT) AS p, cents
             |FROM r CROSS JOIN (VALUES (10), (25), (50), (75), (90)) pv(p)
             |WHERE rn = (n * p + 99) // 100
             |ORDER BY p""".stripMargin)
    ),

    // Retraction-capable join IVM certificate: a materialized
    // orders⋈lineitem advanced by the SIGNED delta rule (inserts +1,
    // tombstones −1, updates as −1/+1 pairs; multiplicities multiply
    // through the join) must be multiplicity-checksum-identical to a full
    // recompute of the final state — q226's insert-only certificate
    // completed for real CDC feeds. At 100 TB only delta-sided joins run.
    QueryDef(
      "q241_join_ivm_cdc",
      (s, dir) => {
        val r = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("r_cents"))
        val sl = t(s, dir, "lineitem").select(col("l_orderkey").as("k"),
          col("l_quantity").cast("int").cast("long").as("qty"),
          col("l_partkey").as("pk"))
        // base snapshots + a mixed changeset carved deterministically:
        // R: k%10==7 inserted, k%10==4 deleted, k%10==2 updated (cents*2)
        // S: pk%10==3 inserted, pk%10==6 deleted, pk%10==1 updated (qty+5)
        val r0 = r.filter(col("k") % 10 =!= 7)
        val dr = r.filter(col("k") % 10 === 7).withColumn("m", lit(1L))
          .unionByName(r0.filter(col("k") % 10 === 4).withColumn("m", lit(-1L)))
          .unionByName(r0.filter(col("k") % 10 === 2).withColumn("m", lit(-1L)))
          .unionByName(r0.filter(col("k") % 10 === 2)
            .withColumn("r_cents", col("r_cents") * 2).withColumn("m", lit(1L)))
        val s0 = sl.filter(col("pk") % 10 =!= 3).drop("pk")
        val ds = sl.filter(col("pk") % 10 === 3).drop("pk").withColumn("m", lit(1L))
          .unionByName(sl.filter(col("pk") % 10 === 6).drop("pk")
            .withColumn("m", lit(-1L)))
          .unionByName(sl.filter(col("pk") % 10 === 1).drop("pk")
            .withColumn("m", lit(-1L)))
          .unionByName(sl.filter(col("pk") % 10 === 1)
            .withColumn("qty", col("qty") + 5).drop("pk").withColumn("m", lit(1L)))
        val h = expr("CAST(conv(substring(md5(concat(CAST(k AS STRING), ',', " +
          "CAST(r_cents AS STRING), ',', CAST(qty AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        val j0 = r0.join(s0, "k")
        val delta = Ivm.joinDeltaCdc(r0, dr, s0, ds, "k")
        val maintained = j0.withColumn("m", lit(1L)).unionByName(delta)
          .agg(sum(col("m")).as("maintained_rows"),
            sum(col("m") * h).as("maintained_sum"))
        // ground truth: full join of the final table states
        val r1 = r.filter(col("k") % 10 =!= 4).withColumn("r_cents",
          when(col("k") % 10 === 2, col("r_cents") * 2).otherwise(col("r_cents")))
        val s1 = sl.filter(col("pk") % 10 =!= 6).withColumn("qty",
          when(col("pk") % 10 === 1, col("qty") + 5).otherwise(col("qty"))).drop("pk")
        val recomputed = r1.join(s1, "k")
          .agg(count(lit(1)).as("recomputed_rows"), sum(h).as("recomputed_sum"))
        j0.agg(count(lit(1)).as("base_rows"))
          .crossJoin(maintained).crossJoin(recomputed)
          .select(col("base_rows"), col("maintained_rows"), col("recomputed_rows"),
            col("maintained_sum"), col("recomputed_sum"),
            when(col("maintained_rows") === col("recomputed_rows") &&
              col("maintained_sum") === col("recomputed_sum"), 1L).otherwise(0L)
              .as("match_ok"))
      },
      Some("""WITH r0 AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS r_cents
             |  FROM orders WHERE o_orderkey % 10 <> 7),
             |s0 AS (SELECT l_orderkey AS k,
             |    CAST(CAST(l_quantity AS INT) AS BIGINT) AS qty
             |  FROM lineitem WHERE l_partkey % 10 <> 3),
             |r1 AS (SELECT o_orderkey AS k,
             |    CAST(CASE WHEN o_orderkey % 10 = 2 THEN round(o_totalprice * 100) * 2
             |         ELSE round(o_totalprice * 100) END AS BIGINT) AS r_cents
             |  FROM orders WHERE o_orderkey % 10 <> 4),
             |s1 AS (SELECT l_orderkey AS k,
             |    CAST(CAST(l_quantity AS INT) +
             |         CASE WHEN l_partkey % 10 = 1 THEN 5 ELSE 0 END AS BIGINT) AS qty
             |  FROM lineitem WHERE l_partkey % 10 <> 6),
             |j1 AS (SELECT r1.k AS k, r_cents, qty FROM r1 JOIN s1 ON r1.k = s1.k),
             |hh AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(('0x' || substr(md5(k || ',' || r_cents || ',' || qty),
             |      1, 8))::BIGINT) AS BIGINT) AS hsum FROM j1),
             |b AS (SELECT CAST(count(*) AS BIGINT) AS base_rows
             |  FROM r0 JOIN s0 ON r0.k = s0.k)
             |SELECT b.base_rows, hh.n AS maintained_rows, hh.n AS recomputed_rows,
             |       hh.hsum AS maintained_sum, hh.hsum AS recomputed_sum,
             |       CAST(1 AS BIGINT) AS match_ok
             |FROM b, hh""".stripMargin)
    ),

    // Deterministic three-way train/val/test split: pure map expression
    // on the q61 key-hash — a key lands in one split forever.
    QueryDef(
      "q115_three_way_split",
      (s, dir) =>
        Sampling.threeWaySplit(t(s, dir, "documents"), "doc_id", valPct = 10, testPct = 10)
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)
    ),

    // Progressive (SOF2) JPEG decode — the dominant real-world web JPEG
    // shape q137's baseline path couldn't reach. Payloads are genuine
    // four-scan progressive streams (DC successive approximation Al=1→0,
    // AC spectral band as EOB runs, restart markers every 2 blocks), and
    // the constant-tile/all-ones-quant scheme keeps the lossy codec
    // lossless — so the oracle re-derives every decoded pixel from the
    // text alone while the Spark side runs the full multi-scan
    // coefficient-accumulation decode.
    QueryDef(
      "q242_mm_jpeg_progressive",
      (s, dir) => {
        val withPayload = Multimodal.withProgressiveJpegPayload(
          t(s, dir, "documents"), "doc_id", "text",
          widthBlocks = 2, heightBlocks = 3, restartInterval = 2)
        Multimodal.jpegStats(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH px AS (SELECT doc_id,
             |  list_transform(range(6),
             |    k -> ascii(substr(text, CAST(k % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents)
             |SELECT doc_id, CAST(16 AS INT) AS width, CAST(24 AS INT) AS height,
             |       CAST(384 AS BIGINT) AS n_pixels, CAST(1 AS INT) AS n_components,
             |       CAST(list_min(p) AS INT) AS r_min, CAST(list_max(p) AS INT) AS r_max,
             |       CAST(list_min(p) AS INT) AS g_min, CAST(list_max(p) AS INT) AS g_max,
             |       CAST(list_min(p) AS INT) AS b_min, CAST(list_max(p) AS INT) AS b_max,
             |       CAST(192 * list_sum(p) AS BIGINT) AS bright_sum
             |FROM px ORDER BY doc_id""".stripMargin)
    ),

    // DCT perceptual hash (pHash) over real decoded P6 pixels — the
    // spectrum-shape near-dup signal run beside q114's brightness aHash
    // (a constant exposure shift moves only the DC term, so pHash holds
    // where aHash flips). The DCT is fixed-point Q14 integer, so every
    // coefficient, the 63-AC median, and all 63 hash bits are bit-exact
    // across engines; the oracle replays the identical integer transform.
    QueryDef(
      "q243_mm_phash",
      (s, dir) => {
        val withPayload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 8)
        Multimodal.ppmPHash(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH ct AS (SELECT [16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
             |  16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069,
             |  15137, 6270, -6270, -15137, -15137, -6270, 6270, 15137,
             |  13623, -3196, -16069, -9102, 9102, 16069, 3196, -13623,
             |  11585, -11585, -11585, 11585, 11585, -11585, -11585, 11585,
             |  9102, -16069, 3196, 13623, -13623, -3196, 16069, -9102,
             |  6270, -15137, 15137, -6270, -6270, 15137, -15137, 6270,
             |  3196, -9102, 13623, -16069, 16069, -13623, 9102, -3196]::BIGINT[] AS c),
             |px AS (SELECT doc_id,
             |    list_transform(range(192), b -> ascii(substr(text, CAST(b % length(text) + 1 AS INT), 1)) % 256) AS p
             |  FROM documents),
             |cg AS (SELECT doc_id, list_transform(range(64),
             |    j -> CAST(p[3*j+1] + p[3*j+2] + p[3*j+3] AS BIGINT)) AS g FROM px),
             |f AS (SELECT doc_id, list_transform(range(64), j ->
             |    list_sum(list_transform(range(64), xy ->
             |      c[(j//8)*8 + (xy//8) + 1] * c[(j%8)*8 + (xy%8) + 1] * g[xy+1]))) AS fc
             |  FROM cg, ct),
             |m AS (SELECT doc_id, fc, list_sort(fc[2:64])[32] AS med FROM f)
             |SELECT doc_id,
             |  CAST(list_sum(list_transform(range(33, 64),
             |    j -> CASE WHEN fc[j+1] > med THEN CAST(1 AS BIGINT) << (j-33) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash_hi,
             |  CAST(list_sum(list_transform(range(1, 33),
             |    j -> CASE WHEN fc[j+1] > med THEN CAST(1 AS BIGINT) << (j-1) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash_lo
             |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // Deterministic per-epoch training-order shuffle: shard and in-shard
    // position decided only by md5(seed:key) — any engine, partitioning,
    // or cluster size reproduces the identical order, and a new seed
    // re-permutes globally without ever materializing a permutation
    // driver-side. The sort is per shard (no global single-task sort);
    // loaders consume shards independently in (shard, pos) order.
    QueryDef(
      "q244_epoch_shuffle",
      (s, dir) =>
        Sampling.epochShuffle(t(s, dir, "documents"), "doc_id", seed = 7L,
            nShards = 8)
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id,
             |    ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
             |  FROM documents)
             |SELECT doc_id, hv % 8 AS shard,
             |       CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS BIGINT) AS pos
             |FROM h ORDER BY doc_id""".stripMargin)
    ),

    // Vocabulary growth curve (Heaps-law datasheet row): corpus split into
    // 10 id-range buckets; per bucket, the token occurrences contributed
    // and the tokens seen for the FIRST time there. Flattening new_tokens
    // = more data mostly re-sees known vocabulary; linear = the corpus
    // keeps introducing novelty (or OCR/boilerplate rot). First occurrence
    // is one token-keyed min over packed (id, idx) positions — exact,
    // integer, two linear shuffles.
    QueryDef(
      "q245_vocab_growth",
      (s, dir) =>
        TextAnalysis.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
            nBuckets = 10)
          .orderBy("bucket"),
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents),
             |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS ti FROM d),
             |b AS (SELECT max(doc_id) AS mid FROM toks),
             |pos AS (SELECT doc_id, tok, doc_id * 1048576 + ti AS p,
             |    least(doc_id * 10 // (mid + 1), 9) AS bucket FROM toks, b),
             |f AS (SELECT tok, min(p) AS fp FROM pos GROUP BY tok),
             |fb AS (SELECT least((fp // 1048576) * 10 // (mid + 1), 9) AS bucket,
             |    CAST(count(*) AS BIGINT) AS new_tokens FROM f, b GROUP BY 1),
             |occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS token_occurrences,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS docs FROM pos GROUP BY 1)
             |SELECT occ.bucket, token_occurrences, docs,
             |       CAST(coalesce(new_tokens, 0) AS BIGINT) AS new_tokens
             |FROM occ LEFT JOIN fb ON occ.bucket = fb.bucket
             |ORDER BY occ.bucket""".stripMargin)
    ),

    // JPEG encode-quality audit: estimate the IJG quality factor from each
    // payload's luminance quantization table (scale% = round 100·ΣT/ΣK
    // against the Annex K reference, then the inverse IJG mapping — all
    // integer). The corpus-datasheet signal for dropping heavily
    // re-encoded images. Payloads carry a per-doc quality 35 + doc_id%61
    // (covers both the <50 reciprocal and >=50 linear branches), and the
    // oracle replays scaling + inversion from doc_id alone.
    QueryDef(
      "q246_jpeg_quality",
      (s, dir) => {
        val withPayload = Multimodal.withJpegPayloadAtQuality(
          t(s, dir, "documents"), "doc_id", "text",
          widthBlocks = 2, heightBlocks = 2)(id => (35 + id % 61).toInt)
        Multimodal.jpegQuality(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""WITH kt AS (SELECT [16, 11, 12, 14, 12, 10, 16, 14,
             |  13, 14, 18, 17, 16, 19, 24, 40, 26, 24, 22, 22, 24, 49, 35, 37,
             |  29, 40, 58, 51, 61, 60, 57, 51, 56, 55, 64, 72, 92, 78, 64, 68,
             |  87, 69, 55, 56, 80, 109, 81, 87, 95, 98, 103, 104, 103, 62, 77, 113,
             |  121, 112, 100, 120, 92, 101, 103, 99]::BIGINT[] AS kk),
             |q AS (SELECT doc_id, 35 + doc_id % 61 AS qf FROM documents),
             |sc AS (SELECT doc_id, qf,
             |    CASE WHEN qf < 50 THEN 5000 // qf ELSE 200 - 2 * qf END AS s FROM q),
             |st AS (SELECT doc_id, s,
             |    list_sum(list_transform(kk, k ->
             |      greatest(1, least(255, (k * s + 50) // 100)))) AS sum_t
             |  FROM sc, kt),
             |est AS (SELECT doc_id, sum_t,
             |    (100 * sum_t + 1844) // 3688 AS se FROM st)
             |SELECT doc_id,
             |       CAST(greatest(1, least(100, CASE WHEN se <= 0 THEN 100
             |         WHEN se <= 100 THEN (200 - se) // 2
             |         ELSE (5000 + se // 2) // se END)) AS INT) AS est_quality,
             |       CAST(sum_t AS BIGINT) AS quant_sum
             |FROM est ORDER BY doc_id""".stripMargin)
    ),

    // Compaction planner: the small-files problem as a metadata query.
    // File inventory simulated from orders (50-key files per priority
    // partition); files under 40 rows pack contiguously into 100-row
    // bins (bin = rows-before div target — Layout.compactionPlan);
    // report per partition: inventory before, small-file mass, bins
    // planned, and the file count after the rewrite. The plan is pure
    // metadata algebra — the 100 TB of data below it is never read.
    QueryDef(
      "q247_compaction_plan",
      (s, dir) => {
        val files = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("part"),
            expr("o_orderkey div 50").as("file_id"))
          .agg(count(lit(1)).as("sz"))
        val plan = Layout.compactionPlan(files, "part", "file_id", "sz",
          smallThreshold = 40L, targetSize = 100L)
        val smallAgg = plan.groupBy("part").agg(
          count(lit(1)).as("files_small"), sum("sz").as("rows_small"),
          countDistinct("bin_id").as("bins_planned"))
        val tot = files.groupBy("part")
          .agg(count(lit(1)).as("files_total"), sum("sz").as("rows_total"))
        tot.join(smallAgg, Seq("part"), "left")
          .select(col("part"), col("files_total"), col("rows_total"),
            coalesce(col("files_small"), lit(0L)).as("files_small"),
            coalesce(col("rows_small"), lit(0L)).as("rows_small"),
            coalesce(col("bins_planned"), lit(0L)).as("bins_planned"),
            (col("files_total") - coalesce(col("files_small"), lit(0L))
              + coalesce(col("bins_planned"), lit(0L))).as("files_after"))
          .orderBy("part")
      },
      Some("""WITH f AS (SELECT o_orderpriority AS part, o_orderkey // 50 AS file_id,
             |    CAST(count(*) AS BIGINT) AS sz FROM orders GROUP BY 1, 2),
             |sm AS (SELECT part, file_id, sz,
             |    sum(sz) OVER (PARTITION BY part ORDER BY file_id) AS cum
             |  FROM f WHERE sz < 40),
             |b AS (SELECT part, CAST(count(*) AS BIGINT) AS files_small,
             |    CAST(sum(sz) AS BIGINT) AS rows_small,
             |    CAST(count(DISTINCT (cum - sz) // 100) AS BIGINT) AS bins_planned
             |  FROM sm GROUP BY 1),
             |tot AS (SELECT part, CAST(count(*) AS BIGINT) AS files_total,
             |    CAST(sum(sz) AS BIGINT) AS rows_total FROM f GROUP BY 1)
             |SELECT tot.part, files_total, rows_total,
             |       CAST(coalesce(files_small, 0) AS BIGINT) AS files_small,
             |       CAST(coalesce(rows_small, 0) AS BIGINT) AS rows_small,
             |       CAST(coalesce(bins_planned, 0) AS BIGINT) AS bins_planned,
             |       CAST(files_total - coalesce(files_small, 0)
             |            + coalesce(bins_planned, 0) AS BIGINT) AS files_after
             |FROM tot LEFT JOIN b ON tot.part = b.part
             |ORDER BY tot.part""".stripMargin)
    ),

    // Encoding-artifact (mojibake) audit: per-source counts of double-
    // decoded UTF-8 markers ('Ã', 'â€'), U+FFFD replacement characters,
    // and C0 control bleed-through — planted deterministically (doc_id
    // mod 7/11/13) so both engines measure a corpus with known rot. Pure
    // map-side length arithmetic + one keyed aggregate.
    QueryDef(
      "q248_encoding_artifacts",
      (s, dir) => {
        val planted = t(s, dir, "documents").withColumn("text2",
          concat(col("text"),
            when(col("doc_id") % 7 === 0,
              lit("\u00c3\u00a9\u00e2\u20ac")).otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit("\ufffd")).otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit("\u0007")).otherwise(lit(""))))
        val art = TextAnalysis.encodingArtifacts(planted, "doc_id", "text2")
        art.join(t(s, dir, "documents").select(col("doc_id"), col("source")), "doc_id")
          .groupBy("source").agg(
            count(lit(1)).as("docs"),
            sum("artifact").as("flagged_docs"),
            sum("moji_marks").as("moji_marks"),
            sum("repl_chars").as("repl_chars"),
            sum("ctrl_chars").as("ctrl_chars"))
          .orderBy("source")
      },
      Some("""WITH p AS (SELECT doc_id, source,
             |    text || CASE WHEN doc_id % 7 = 0
             |              THEN chr(195)||chr(169)||chr(226)||chr(8364) ELSE '' END
             |         || CASE WHEN doc_id % 11 = 0 THEN chr(65533) ELSE '' END
             |         || CASE WHEN doc_id % 13 = 0 THEN chr(7) ELSE '' END AS t2
             |  FROM documents),
             |m AS (SELECT doc_id, source,
             |    (length(t2) - length(replace(t2, chr(195), '')))
             |      + (length(t2) - length(replace(t2, chr(226)||chr(8364), ''))) // 2 AS moji,
             |    length(t2) - length(replace(t2, chr(65533), '')) AS repl,
             |    length(t2) - length(regexp_replace(t2,
             |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS ctrl
             |  FROM p)
             |SELECT source, CAST(count(*) AS BIGINT) AS docs,
             |       CAST(sum(CASE WHEN moji + repl + ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
             |       CAST(sum(moji) AS BIGINT) AS moji_marks,
             |       CAST(sum(repl) AS BIGINT) AS repl_chars,
             |       CAST(sum(ctrl) AS BIGINT) AS ctrl_chars
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Exact phrase search via positional postings: "w1 w2" occurrences
    // from the adjacency equi-join of the two terms' postings — both
    // sides vocabulary-filtered BEFORE the shuffle, so only the queried
    // terms' postings move. One absent phrase exercises the zero path.
    // The oracle recomputes each phrase directly over the token lists.
    QueryDef(
      "q249_phrase_postings",
      (s, dir) =>
        TextAnalysis.phraseOccurrences(t(s, dir, "documents"), "doc_id", "text",
            Seq("data" -> "stream", "graft" -> "engine",
              "slow" -> "scan", "the" -> "table"))
          .orderBy("phrase"),
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents),
             |p AS (
             |  SELECT 'data stream' AS phrase, doc_id,
             |    len(list_filter(range(1, len(ts)), i -> ts[i] = 'data' AND ts[i+1] = 'stream')) AS c FROM d
             |  UNION ALL SELECT 'graft engine', doc_id,
             |    len(list_filter(range(1, len(ts)), i -> ts[i] = 'graft' AND ts[i+1] = 'engine')) FROM d
             |  UNION ALL SELECT 'slow scan', doc_id,
             |    len(list_filter(range(1, len(ts)), i -> ts[i] = 'slow' AND ts[i+1] = 'scan')) FROM d
             |  UNION ALL SELECT 'the table', doc_id,
             |    len(list_filter(range(1, len(ts)), i -> ts[i] = 'the' AND ts[i+1] = 'table')) FROM d)
             |SELECT phrase,
             |       CAST(count(DISTINCT CASE WHEN c > 0 THEN doc_id END) AS BIGINT) AS n_docs,
             |       CAST(sum(c) AS BIGINT) AS n_occ
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Split-leakage audit: train/val/test assignment keyed per document
    // vs per duplicate-cluster (md5 of the text), over a corpus with
    // planted exact duplicates (doc_id mod 5 re-appears under a new id).
    // Per-doc hashing scatters a duplicate pair across splits —
    // train/test contamination; keying the SAME split hash by the
    // cluster fingerprint drives leakage to zero by construction. The
    // audit certifies both counts.
    QueryDef(
      "q250_cluster_split",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val corpus = d.unionByName(
            d.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000L).as("doc_id"), col("text")))
          .withColumn("grp", md5(col("text")))
        def report(scheme: String, keyCol: String) = {
          val sp = Sampling.threeWaySplit(corpus, keyCol, valPct = 10, testPct = 10)
          val sizes = sp.agg(
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
          val leaked = sp.groupBy("grp")
            .agg(countDistinct("split").as("ns"))
            .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("groups_leaked"))
          sizes.crossJoin(leaked).select(lit(scheme).as("scheme"),
            col("n_train"), col("n_val"), col("n_test"), col("groups_leaked"))
        }
        report("a_per_doc", "doc_id")
          .unionByName(report("b_per_group", "grp"))
          .orderBy("scheme")
      },
      Some("""WITH d0 AS (SELECT doc_id, text FROM documents),
             |c AS (SELECT doc_id, text FROM d0
             |      UNION ALL SELECT doc_id + 10000, text FROM d0 WHERE doc_id % 5 = 0),
             |g AS (SELECT doc_id, md5(text) AS grp FROM c),
             |b AS (SELECT doc_id, grp,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bd,
             |    ('0x' || substr(md5(grp), 1, 8))::BIGINT % 100 AS bg
             |  FROM g),
             |s AS (SELECT grp,
             |    CASE WHEN bd < 80 THEN 'train' WHEN bd < 90 THEN 'val' ELSE 'test' END AS sd,
             |    CASE WHEN bg < 80 THEN 'train' WHEN bg < 90 THEN 'val' ELSE 'test' END AS sg
             |  FROM b),
             |rep AS (
             |  SELECT 'a_per_doc' AS scheme,
             |    CAST(sum(CASE WHEN sd = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             |    CAST(sum(CASE WHEN sd = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             |    CAST(sum(CASE WHEN sd = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
             |    (SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |     FROM (SELECT grp, count(DISTINCT sd) AS ns FROM s GROUP BY 1)) AS groups_leaked
             |  FROM s
             |  UNION ALL
             |  SELECT 'b_per_group',
             |    CAST(sum(CASE WHEN sg = 'train' THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN sg = 'val' THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN sg = 'test' THEN 1 ELSE 0 END) AS BIGINT),
             |    (SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |     FROM (SELECT grp, count(DISTINCT sg) AS ns FROM s GROUP BY 1))
             |  FROM s)
             |SELECT scheme, n_train, n_val, n_test, groups_leaked
             |FROM rep ORDER BY scheme""".stripMargin)
    ),

    // EXIF metadata scan: APP1/TIFF IFD walk — byte-order handshake in
    // BOTH endiannesses (doc parity picks II vs MM), inline SHORT
    // (orientation), offset RATIONAL (resolution), offset ASCII
    // (datetime), and a sub-IFD LONG (pixel dimension); doc_id mod 17
    // plants a corrupt TIFF magic that must null out cleanly. The
    // header-only catalog path: at 100 TB this reads a few hundred bytes
    // per image and never touches entropy-coded data.
    QueryDef(
      "q251_jpeg_exif",
      (s, dir) => {
        val withPayload = Multimodal.withExifJpegPayload(
          t(s, dir, "documents"), "doc_id", "text",
          widthBlocks = 2, heightBlocks = 2)
        Multimodal.jpegExif(withPayload, "doc_id", "payload").orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 17 = 0 THEN NULL
             |       WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
             |  CASE WHEN doc_id % 17 = 0 THEN NULL
             |       ELSE CAST(1 + doc_id % 8 AS INT) END AS orientation,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 72 END AS BIGINT) AS xres_num,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 1 END AS BIGINT) AS xres_den,
             |  CASE WHEN doc_id % 17 = 0 THEN NULL
             |       ELSE '2026:01:01 00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             |       END AS exif_datetime,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 16 END AS BIGINT) AS pixel_x
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Time-weighted mean (TWAP) per user: each observation holds its
    // value until the next, so irregular sampling can't bias the mean —
    // Σ(v·gap) div Σ(gap) with the product sum in DECIMAL(38,0) (a
    // cents value × a multi-day micros gap overflows int64; Spark's
    // long sum would wrap SILENTLY). The evenly-spaced-AVG-vs-TWAP
    // delta is the whole point of the operator.
    QueryDef(
      "q252_twap",
      (s, dir) =>
        Stats.timeWeightedMean(
          eventsUs(s, dir).select(col("user_id"), col("ts_us"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
            col("event_id")),
          "user_id", "ts_us", "cents", "event_id").orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, event_id
             |  FROM events),
             |g AS (SELECT user_id, cents,
             |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS gap
             |  FROM e),
             |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(gap) AS BIGINT) AS span_us,
             |    sum(CAST(gap AS HUGEINT) * cents) AS wsum
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT user_id, n_gaps, span_us,
             |       CAST(wsum // span_us AS BIGINT) AS twap
             |FROM a WHERE span_us > 0 ORDER BY user_id""".stripMargin)
    ),

    // Video container metadata (ISO BMFF / MP4 box walk): ftyp major
    // brand, mvhd timescale/duration, trak count — header-only (the walk
    // skips mdat without reading it), so cataloging 100 TB of video costs
    // bytes per file. doc_id mod 19 plants an oversized moov (truncated-
    // download shape) that must null out cleanly; the oracle replays
    // every field from doc_id.
    QueryDef(
      "q253_mp4_meta",
      (s, dir) =>
        Multimodal.mp4Meta(
          Multimodal.withMp4Payload(t(s, dir, "documents"), "doc_id"),
          "doc_id", "payload").orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    1000 + doc_id % 9000 AS ts,
             |    (1000 + doc_id % 9000) * (5 + doc_id % 120)
             |      + doc_id % (1000 + doc_id % 9000) AS dur,
             |    CAST(1 + doc_id % 3 AS INT) AS nt,
             |    ['isom', 'mp41', 'mp42', 'avc1'][CAST(doc_id % 4 AS INT) + 1] AS br
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE br END AS brand,
             |  CAST(CASE WHEN doc_id % 19 = 0 THEN NULL ELSE ts END AS BIGINT) AS timescale,
             |  CAST(CASE WHEN doc_id % 19 = 0 THEN NULL ELSE dur END AS BIGINT) AS duration_units,
             |  CAST(CASE WHEN doc_id % 19 = 0 THEN NULL ELSE dur * 1000 // ts END AS BIGINT) AS duration_ms,
             |  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE nt END AS n_tracks
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Frame-sampling work queue from parsed video durations: one row per
    // frame to extract (1 fps, capped at 32 frames per video INSIDE the
    // row expression, before the explode — a 10-hour outlier can't blast
    // rows). The decode step is out of scope by mandate (no codec libs
    // here); this is the Spark-side fan-out an extraction fleet consumes.
    // Corrupt containers (null duration) emit no work items.
    QueryDef(
      "q254_frame_plan",
      (s, dir) => {
        val meta = Multimodal.mp4Meta(
          Multimodal.withMp4Payload(
            t(s, dir, "documents").filter(col("doc_id") % 25 === 0), "doc_id"),
          "doc_id", "payload")
        Multimodal.frameSamplePlan(meta, "doc_id", "duration_ms",
            everyMs = 1000L, maxFrames = 32)
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH b AS (SELECT doc_id,
             |    1000 + doc_id % 9000 AS ts,
             |    (1000 + doc_id % 9000) * (5 + doc_id % 120)
             |      + doc_id % (1000 + doc_id % 9000) AS dur
             |  FROM documents WHERE doc_id % 25 = 0 AND doc_id % 19 <> 0),
             |d AS (SELECT doc_id, dur * 1000 // ts AS dms FROM b),
             |n AS (SELECT doc_id, least(dms // 1000 + 1, 32) AS nf FROM d),
             |f AS (SELECT doc_id, unnest(range(0, nf)) AS frame_idx FROM n)
             |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |       CAST(frame_idx * 1000 AS BIGINT) AS ts_ms
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
    ),

    // Image resize (mandate's resize step): 8×8 P6 payloads downscaled
    // 2× by integer area averaging into REAL 4×4 P6 payloads, then
    // decoded by the ordinary feature operator — the resize output
    // round-trips through the same decode path as any ingested image.
    // The oracle replays source pixels from text and re-derives every
    // averaged byte (truncating mean of each 2×2 block, per channel).
    QueryDef(
      "q255_ppm_resize",
      (s, dir) => {
        val payload = Multimodal.withPpmPayload(
          t(s, dir, "documents"), "doc_id", "text", width = 8, height = 8)
        val resized = Multimodal.withResizedPpm(payload, "doc_id", "payload", factor = 2)
        Multimodal.ppmFeatures(resized, "doc_id", "payload").orderBy("doc_id")
      },
      Some {
        // resized byte k (0..47): pixel k/3 at (y=pix/4, x=pix%4), channel
        // k%3; source block rows 2y/2y+1, cols 2x/2x+1 of the 8-wide image
        def src(dy: Int, dx: Int) =
          s"p[3*((k//3//4*2 + $dy)*8 + (k//3%4)*2 + $dx) + k%3 + 1]"
        def channel(c: Int) =
          s"CAST(list_sum(list_transform(range(16), i -> q[3*i + ${c + 1}])) AS BIGINT)"
        s"""WITH px AS (SELECT doc_id,
           |  list_transform(range(192),
           |    j -> ascii(substr(text, CAST(j % length(text) + 1 AS INT), 1)) % 256) AS p
           |  FROM documents),
           |rz AS (SELECT doc_id, list_transform(range(48),
           |    k -> (${src(0, 0)} + ${src(0, 1)} + ${src(1, 0)} + ${src(1, 1)}) // 4) AS q
           |  FROM px)
           |SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           |       CAST(16 AS BIGINT) AS n_pixels,
           |       ${channel(0)} AS r_sum, ${channel(1)} AS g_sum, ${channel(2)} AS b_sum
           |FROM rz ORDER BY doc_id""".stripMargin
      }
    ),

    // Consistent-hash ring (the OTHER minimal-movement sharding scheme,
    // next to q215's rendezvous): 16 vnodes per shard, key -> first
    // vnode clockwise. The certificate grows the fleet 4 -> 5 and
    // tabulates per-shard movement: keys may only ARRIVE at the new
    // shard — arrivals at shards 0-3 and departures from shard 4 must
    // both read 0, and that's visible in the output, not asserted on
    // faith. Assignment is a scan-fused expression over a plan-time
    // ring literal; the one shuffle is the tiny (s4, s5) pair count.
    QueryDef(
      "q256_consistent_hash",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
          .withColumn("s4", Layout.consistentShard("doc_id", 4, 16))
          .withColumn("s5", Layout.consistentShard("doc_id", 5, 16))
        val pairs = d.groupBy("s4", "s5").agg(count(lit(1)).as("n")).localCheckpoint()
        val moved = pairs.filter(col("s4") =!= col("s5"))
        val shards = s.range(5).select(col("id").cast("int").as("shard"))
        shards
          .join(pairs.groupBy(col("s4").as("shard")).agg(sum("n").as("n_before")), Seq("shard"), "left")
          .join(pairs.groupBy(col("s5").as("shard")).agg(sum("n").as("n_after")), Seq("shard"), "left")
          .join(moved.groupBy(col("s5").as("shard")).agg(sum("n").as("arrivals")), Seq("shard"), "left")
          .join(moved.groupBy(col("s4").as("shard")).agg(sum("n").as("departures")), Seq("shard"), "left")
          .select(col("shard"),
            coalesce(col("n_before"), lit(0L)).as("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"),
            coalesce(col("arrivals"), lit(0L)).as("arrivals"),
            coalesce(col("departures"), lit(0L)).as("departures"))
          .orderBy("shard")
      },
      Some("""WITH r4 AS (SELECT s, ('0x' || substr(md5('ring:' || s || ':' || vn), 1, 8))::BIGINT AS pos
             |  FROM range(4) t(s), range(16) u(vn)),
             |r5 AS (SELECT s, ('0x' || substr(md5('ring:' || s || ':' || vn), 1, 8))::BIGINT AS pos
             |  FROM range(5) t(s), range(16) u(vn)),
             |k AS (SELECT doc_id, ('0x' || substr(md5('key:' || doc_id), 1, 8))::BIGINT AS kh
             |  FROM documents),
             |a AS (SELECT doc_id,
             |    coalesce(min_by(r4.s, r4.pos) FILTER (WHERE r4.pos >= kh),
             |             min_by(r4.s, r4.pos)) AS s4
             |  FROM k CROSS JOIN r4 GROUP BY doc_id, kh),
             |b AS (SELECT doc_id,
             |    coalesce(min_by(r5.s, r5.pos) FILTER (WHERE r5.pos >= kh),
             |             min_by(r5.s, r5.pos)) AS s5
             |  FROM k CROSS JOIN r5 GROUP BY doc_id, kh),
             |p AS (SELECT s4, s5, CAST(count(*) AS BIGINT) AS n
             |  FROM a JOIN b USING (doc_id) GROUP BY 1, 2),
             |sh AS (SELECT unnest(range(5)) AS shard)
             |SELECT CAST(shard AS INT) AS shard,
             |  CAST(coalesce((SELECT sum(n) FROM p WHERE s4 = shard), 0) AS BIGINT) AS n_before,
             |  CAST(coalesce((SELECT sum(n) FROM p WHERE s5 = shard), 0) AS BIGINT) AS n_after,
             |  CAST(coalesce((SELECT sum(n) FROM p WHERE s5 = shard AND s4 <> s5), 0) AS BIGINT) AS arrivals,
             |  CAST(coalesce((SELECT sum(n) FROM p WHERE s4 = shard AND s4 <> s5), 0) AS BIGINT) AS departures
             |FROM sh ORDER BY shard""".stripMargin)
    ),

    // Prefix-filtering set-similarity join (PPJoin candidate generation):
    // the EXACT Jaccard-threshold join — rare-first token order, prefix
    // lemma candidates, sorted-merge verify. The exact complement to
    // q32's MinHash-LSH (which trades recall for blocking) and q34/q58's
    // attribute-blocked joins (which miss cross-block pairs): this one
    // provably cannot miss a qualifying pair, only the visible bucket
    // cap can. Joins on 3-word shingle sets — unigram Jaccard saturates
    // on this corpus's small vocabulary (the output itself would go
    // quadratic); shingles keep the similarity space sparse (max shingle
    // df 25 at sf0.1), which is also why q32's MinHash shingles.
    QueryDef(
      "q257_prefix_filter_join",
      (s, dir) =>
        orderedOut(Dedup.prefixFilterPairs(t(s, dir, "documents"), "doc_id", "text",
            minJaccardPct = 50, maxBucket = 500, shingleWords = 3),
          "a_doc_id", "b_doc_id"),
      Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
             |  FROM documents),
             |sets AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(range(1, len(w) - 1),
             |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(w[i] || ' ' || w[i+1] || ' ' || w[i+2], ''),
             |               c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w WHERE len(w) >= 3),
             |toks AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM sets),
             |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM toks GROUP BY 1),
             |rk AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM toks JOIN dfreq USING (tok)),
             |pre AS (SELECT doc_id, tok, n, rn FROM rk WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |cap AS (SELECT doc_id, tok, n, rn FROM (
             |    SELECT doc_id, tok, n, rn,
             |      row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS brn
             |    FROM pre) WHERE brn <= 500),
             |cand AS (SELECT DISTINCT a.doc_id AS ad, b.doc_id AS bd
             |  FROM cap a JOIN cap b USING (tok) WHERE a.doc_id < b.doc_id
             |    AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 50
             |    AND (1 + least(a.n - a.rn, b.n - b.rn)) * 150 >= (a.n + b.n) * 50),
             |w2 AS (SELECT doc_id, ts AS ws, CAST(len(ts) AS BIGINT) AS n FROM sets),
             |v AS (SELECT ad, bd, x.n AS a_n, y.n AS b_n,
             |    CAST(len(list_intersect(x.ws, y.ws)) AS BIGINT) AS inter_n
             |  FROM cand JOIN w2 x ON x.doc_id = ad JOIN w2 y ON y.doc_id = bd
             |  WHERE least(x.n, y.n) * 100 >= greatest(x.n, y.n) * 50)
             |SELECT ad AS a_doc_id, bd AS b_doc_id, a_n, b_n, inter_n,
             |  CAST(a_n + b_n - inter_n AS BIGINT) AS union_n,
             |  CAST(inter_n * 100 // (a_n + b_n - inter_n) AS BIGINT) AS jaccard_pct
             |FROM v WHERE inter_n * 150 >= (a_n + b_n) * 50
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    // Parquet footer trust certificate: the row-group statistics a
    // zone-map-pruning reader actually consults (read via the real
    // ParquetFileReader, metadata only — data pages untouched) must
    // equal the exact data aggregates. q216 simulates pruning buckets;
    // this audits the physical stats pruning depends on — a footer that
    // lied here would make min/max skipping silently drop rows. Columns
    // restricted to integral/short-string (Parquet may truncate long
    // binary stats; that caveat is the operator's documented contract).
    QueryDef(
      "q258_parquet_footer",
      (s, dir) =>
        Layout.parquetFooterStats(s, s"$dir/orders.parquet",
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
      Some("""SELECT * FROM (
             |  SELECT 'o_custkey' AS column_name, CAST(count(*) AS BIGINT) AS num_values,
             |    CAST(min(o_custkey) AS VARCHAR) AS min_value,
             |    CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders
             |  UNION ALL
             |  SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
             |    CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
             |    min(o_orderpriority), max(o_orderpriority) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
             |    min(o_orderstatus), max(o_orderstatus) FROM orders)
             |ORDER BY column_name""".stripMargin)
    ),

    // Star-contraction connected components as a GATED query (the spec
    // already pins labels == union-find and the O(log n) round count;
    // this puts the diameter-robust path under the driver's oracle). The
    // planted graph is exactly the adversarial shape for min-label
    // propagation: 64-long chains (template drift across a crawl) whose
    // diameter would cost 64 shuffle rounds hop-by-hop — star contraction
    // closes them in ~log rounds. Components have a closed arithmetic
    // form (consecutive 64-blocks of doc_id), so the oracle needs no
    // recursion: component = doc_id - doc_id % 64.
    QueryDef(
      "q259_cc_star",
      (s, dir) => {
        val ids = t(s, dir, "documents").select(col("doc_id").as("i"))
        val chain = ids.filter(col("i") % 64 =!= 63)
          .select(col("i").as("a"), (col("i") + 1).as("b"))
        val shortcut = ids.filter(col("i") % 64 <= 58 && col("i") % 3 === 0)
          .select(col("i").as("a"), (col("i") + 5).as("b"))
        // drop edges whose target falls past the last doc (partial block)
        val edges = chain.unionByName(shortcut)
          .join(ids.select(col("i").as("b")), Seq("b"), "left_semi")
        Dedup.connectedComponentsStarContraction(edges, "a", "b")
          .groupBy("component")
          .agg(count(lit(1)).cast("long").as("n_members"),
            sum(col("id")).cast("long").as("sum_id"),
            max(col("id")).cast("long").as("max_id"))
          .orderBy("component")
      },
      Some("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
             |lbl AS (SELECT doc_id AS i, doc_id - doc_id % 64 AS c
             |  FROM documents, m
             |  WHERE NOT (doc_id % 64 = 0 AND doc_id = mx))
             |SELECT CAST(c AS BIGINT) AS component,
             |       CAST(count(*) AS BIGINT) AS n_members,
             |       CAST(sum(i) AS BIGINT) AS sum_id,
             |       CAST(max(i) AS BIGINT) AS max_id
             |FROM lbl GROUP BY c ORDER BY component""".stripMargin)
    ),

    // Retraction-capable incremental AGGREGATE maintenance certificate —
    // q241's algebra for the aggregate half: a mixed CDC batch (inserts,
    // tombstones, updates as −old+new) folded into a materialized grouped
    // (count, sum) view via Ivm.maintainSumCount must equal a full
    // recompute of the final state, group-for-group (row-count AND two
    // checksums over (key, n, total) triples — vanished groups or stale
    // sums can't hide). At 100 TB the maintenance cost is one keyed
    // aggregate over the BATCH plus a keyed merge into the view; the base
    // table is never re-scanned.
    QueryDef(
      "q260_agg_ivm_cdc",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey").as("k"),
          col("l_quantity").cast("int").cast("long").as("qty"),
          col("l_partkey").as("pk"))
        val base = li.filter(col("pk") % 10 =!= 3)
        val view0 = base.groupBy("k")
          .agg(count(lit(1)).cast("long").as("n"), sum("qty").as("total"))
        val delta = li.filter(col("pk") % 10 === 3).withColumn("m", lit(1L))
          .unionByName(base.filter(col("pk") % 10 === 6).withColumn("m", lit(-1L)))
          .unionByName(base.filter(col("pk") % 10 === 1).withColumn("m", lit(-1L)))
          .unionByName(base.filter(col("pk") % 10 === 1)
            .withColumn("qty", col("qty") + 5).withColumn("m", lit(1L)))
          .drop("pk")
        val maintained = Ivm.maintainSumCount(
          view0, delta, Seq("k"), "qty").localCheckpoint()
        val h = expr("CAST(conv(substring(md5(concat(CAST(k AS STRING), ',', " +
          "CAST(n AS STRING), ',', CAST(total AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        val final_ = li.filter(col("pk") % 10 =!= 6)
          .withColumn("qty",
            when(col("pk") % 10 === 1, col("qty") + 5).otherwise(col("qty")))
        val recomputed = final_.groupBy("k")
          .agg(count(lit(1)).cast("long").as("n"), sum("qty").as("total"))
        def summarize(d: DataFrame, tag: String) = d.agg(
          count(lit(1)).as(s"${tag}_groups"), sum("n").as(s"${tag}_rows"),
          sum("total").as(s"${tag}_total"), sum(h).as(s"${tag}_hash"))
        summarize(maintained, "maintained").crossJoin(summarize(recomputed, "recomputed"))
          .select(col("maintained_groups"), col("recomputed_groups"),
            col("maintained_rows"), col("recomputed_rows"),
            col("maintained_total"), col("recomputed_total"),
            when(col("maintained_groups") === col("recomputed_groups") &&
              col("maintained_rows") === col("recomputed_rows") &&
              col("maintained_total") === col("recomputed_total") &&
              col("maintained_hash") === col("recomputed_hash"), 1L)
              .otherwise(0L).as("match_ok"))
      },
      Some("""WITH fin AS (SELECT l_orderkey AS k,
             |    CAST(CASE WHEN l_partkey % 10 = 1 THEN CAST(l_quantity AS INT) + 5
             |         ELSE CAST(l_quantity AS INT) END AS BIGINT) AS qty
             |  FROM lineitem WHERE l_partkey % 10 <> 6),
             |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n, sum(qty) AS total
             |  FROM fin GROUP BY k),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS groups,
             |    CAST(sum(n) AS BIGINT) AS rows_, CAST(sum(total) AS BIGINT) AS total,
             |    CAST(sum(('0x' || substr(md5(k || ',' || n || ',' || total), 1, 8))::BIGINT)
             |      AS BIGINT) AS hash FROM g)
             |SELECT groups AS maintained_groups, groups AS recomputed_groups,
             |       rows_ AS maintained_rows, rows_ AS recomputed_rows,
             |       total AS maintained_total, total AS recomputed_total,
             |       CAST(1 AS BIGINT) AS match_ok
             |FROM s""".stripMargin)
    ),

    // Bloom runtime-filter join (semi-join reduction): lineitem joined to
    // a ~3%-selective orders slice through JoinOpt.bloomFilteredEquiJoin
    // — fact rows are dropped map-side by a broadcast Bloom probe BEFORE
    // the join's exchange, and because Bloom has no false negatives the
    // result is EXACTLY the plain inner join the oracle runs. At 100 TB
    // the reduction is the difference between shuffling the whole fact
    // table and shuffling ~selectivity of it. OperatorsSpec additionally
    // pins the plan shape (probe filter below the exchange).
    QueryDef(
      "q261_bloom_join",
      (s, dir) => {
        val dim = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
        val fact = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("int").cast("long").as("qty"),
            col("l_returnflag"))
        JoinOpt.bloomFilteredEquiJoin(fact, dim, "l_orderkey",
            expectedDimKeys = 100000L, fpp = 0.01)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum("qty").as("sum_qty"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
             |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // Content-defined chunking dedup datasheet: documents split at
    // content-hash boundaries (Dedup.cdcChunks — boundaries follow bytes,
    // not offsets, so an insertion near a doc's head re-synchronizes and
    // downstream chunks still dedup), chunk hashes counted corpus-wide,
    // rolled up per source: how much of each feed is chunk-duplicated
    // elsewhere. The storage-dedup view next to token-window span dedup
    // (q113) and winnowing (q55). Chunking is scan-fused expressions; the
    // two shuffles are the hash-freq aggregate and the source rollup.
    QueryDef(
      "q262_cdc_chunks",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val chunks = Dedup.cdcChunks(docs, "doc_id", "text", k = 8, divisor = 32)
          .localCheckpoint()
        val freq = chunks.groupBy("chunk_md5").agg(count(lit(1)).as("__f"))
        chunks.join(freq, Seq("chunk_md5"))
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            countDistinct(col("chunk_md5")).as("n_distinct"),
            sum(when(col("__f") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
            sum(when(col("__f") >= 2, col("chunk_len")).otherwise(0L)).as("dup_bytes"),
            sum(col("chunk_len")).as("total_bytes"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT doc_id, source, text, CAST(length(text) AS INT) AS len,
             |    list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes
             |  FROM documents),
             |bp AS (SELECT doc_id, source, text, len,
             |    CASE WHEN len - 1 < 8 THEN CAST([] AS BIGINT[])
             |         ELSE list_filter(range(8, len), p ->
             |           ((codes[CAST(p AS INT) - 7] * 27512614111 + codes[CAST(p AS INT) - 6] * 887503681
             |           + codes[CAST(p AS INT) - 5] * 28629151 + codes[CAST(p AS INT) - 4] * 923521
             |           + codes[CAST(p AS INT) - 3] * 29791 + codes[CAST(p AS INT) - 2] * 961
             |           + codes[CAST(p AS INT) - 1] * 31 + codes[CAST(p AS INT)]) % 1000000007) % 32 = 0)
             |    END AS bpos
             |  FROM c),
             |bd AS (SELECT doc_id, source, text,
             |    list_concat(list_concat([0], bpos), [CAST(len AS BIGINT)]) AS b
             |  FROM bp),
             |ix AS (SELECT doc_id, source, text, b, unnest(range(1, len(b))) AS i FROM bd),
             |ch AS (SELECT doc_id, source,
             |    md5(substr(text, CAST(b[i] + 1 AS INT), CAST(b[i+1] - b[i] AS INT))) AS h,
             |    b[i+1] - b[i] AS clen
             |  FROM ix),
             |freq AS (SELECT h, count(*) AS f FROM ch GROUP BY h)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
             |       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
             |       CAST(sum(CASE WHEN f >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
             |       CAST(sum(CASE WHEN f >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_bytes,
             |       CAST(sum(clen) AS BIGINT) AS total_bytes
             |FROM ch JOIN freq USING (h)
             |GROUP BY source ORDER BY source""".stripMargin)
    ),

    // Sitemap parse (sitemaps.org protocol) — the missing third leg of
    // the crawl-politeness surface next to robots.txt (q129) and the
    // fetch frontier (q130): <urlset> pages feed the frontier,
    // <sitemapindex> entries must be recursed into (surfaced as `kind`),
    // junk that is neither yields one NULL row, not silence. Planted XML
    // exercises whitespace-trimmed <loc> values and both kinds; the
    // extraction is one codegen'd regexp pass fused into the scan.
    QueryDef(
      "q263_sitemap",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        val host = concat(lit("h"), (col("doc_id") % 11).cast("string"),
          lit(".example.com"))
        def urlEntry(j: Int) = concat(lit("<url><loc>\n  https://"), host,
          lit("/p/"), (col("doc_id") * 3 + j).cast("string"),
          lit(" \n</loc><priority>0.5</priority></url>"))
        def smEntry(j: Int) = concat(lit("<sitemap><loc> https://"), host,
          lit(s"/sitemap-$j.xml </loc></sitemap>"))
        val xml = when(col("doc_id") % 31 === 0,
            lit("<html><body>not a sitemap</body></html>"))
          .when(col("doc_id") % 29 === 0,
            concat(lit("<?xml version=\"1.0\"?>\n<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
              smEntry(1), smEntry(2), lit("</sitemapindex>")))
          .otherwise(
            concat(lit("<?xml version=\"1.0\"?>\n<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
              urlEntry(1), urlEntry(2), urlEntry(3), lit("</urlset>")))
        d.withColumn("__xml", xml)
          .select(col("doc_id"), UrlTools.sitemapEntries("__xml").as("__sm"))
          .select(col("doc_id"), col("__sm.kind").as("kind"),
            posexplode_outer(col("__sm.locs")).as(Seq("loc_idx", "loc")))
          .select(col("doc_id"), col("kind"), col("loc_idx").cast("long").as("loc_idx"),
            col("loc"))
          .orderBy("doc_id", "loc_idx")
      },
      Some("""WITH k AS (SELECT doc_id,
             |    CASE WHEN doc_id % 31 = 0 THEN NULL
             |         WHEN doc_id % 29 = 0 THEN 'sitemapindex'
             |         ELSE 'urlset' END AS kind,
             |    'h' || (doc_id % 11) || '.example.com' AS host
             |  FROM documents),
             |e AS (SELECT doc_id, kind, host,
             |    CASE WHEN kind IS NULL THEN []
             |         WHEN kind = 'sitemapindex' THEN [
             |           'https://' || host || '/sitemap-1.xml',
             |           'https://' || host || '/sitemap-2.xml']
             |         ELSE [
             |           'https://' || host || '/p/' || (doc_id * 3 + 1),
             |           'https://' || host || '/p/' || (doc_id * 3 + 2),
             |           'https://' || host || '/p/' || (doc_id * 3 + 3)] END AS locs
             |  FROM k)
             |SELECT doc_id, kind,
             |       CAST(CASE WHEN len(locs) = 0 THEN NULL ELSE i - 1 END AS BIGINT) AS loc_idx,
             |       CASE WHEN len(locs) = 0 THEN NULL ELSE locs[CAST(i AS INT)] END AS loc
             |FROM e, unnest(CASE WHEN len(locs) = 0 THEN [1] ELSE range(1, len(locs) + 1) END) AS t(i)
             |ORDER BY doc_id, loc_idx""".stripMargin)
    ),

    // FLAC STREAMINFO catalog (audio leg #2 next to WAV decode q90): the
    // header-only read — sample rate / channels / bit depth / total
    // samples bit-unpacked from the mandatory first metadata block, exact
    // integer duration. Cataloging 100 TB of FLAC costs <100 bytes per
    // file. doc_id%17 plants a corrupt magic that must null out; doc_id%5
    // appends a PADDING block proving STREAMINFO-first is what's read.
    QueryDef(
      "q264_flac_meta",
      (s, dir) =>
        Multimodal.flacMeta(
          Multimodal.withFlacPayload(t(s, dir, "documents"), "doc_id"),
          "doc_id", "payload").orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    8000 * (1 + doc_id % 6) AS sr,
             |    CAST(1 + doc_id % 2 AS INT) AS ch,
             |    8000 * (1 + doc_id % 6) * (3 + doc_id % 30) + doc_id % 997 AS ts
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE sr END AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE ch END AS INT) AS channels,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 16 END AS INT) AS bits_per_sample,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE ts END AS BIGINT) AS total_samples,
             |  CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE ts * 1000 // sr END AS BIGINT) AS duration_ms
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // MP3 catalog (audio leg #3): ID3v2 syncsafe-size skip (7 data bits
    // per byte — the classic off-by-128 trap), MPEG1 Layer III frame
    // header decode via the standard bitrate/samplerate tables, CBR
    // byte-count duration. doc_id%23 plants a broken frame sync behind a
    // VALID ID3 tag — the parse must reject the stream, not trust the tag.
    QueryDef(
      "q265_mp3_meta",
      (s, dir) =>
        Multimodal.mp3Meta(
          Multimodal.withMp3Payload(t(s, dir, "documents"), "doc_id"),
          "doc_id", "payload").orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    100 + doc_id % 300 AS tagb,
             |    [32,40,48,56,64,80,96,112,128,160,192,224,256,320][CAST(doc_id % 14 AS INT) + 1] AS br,
             |    [44100,48000,32000][CAST(doc_id % 3 AS INT) + 1] AS sr,
             |    ['stereo','joint_stereo','dual_channel','mono'][CAST(doc_id % 4 AS INT) + 1] AS md,
             |    417 + doc_id % 1000 + 4 AS ab
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL ELSE tagb END AS BIGINT) AS tag_bytes,
             |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL ELSE br END AS INT) AS bitrate_kbps,
             |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL ELSE sr END AS INT) AS sample_rate,
             |  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE md END AS channel_mode,
             |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL ELSE ab * 8 // br END AS BIGINT) AS est_duration_ms
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Time-grid resample + forward-fill: irregular per-user event values
    // regularized onto a 6-hour grid, holes carrying the last observation
    // (n_obs = 0 marks filled rows) — the resample step upstream of any
    // evenly-spaced-assuming monitor (q149 trend, q160 CUSUM). All three
    // stages keyed; the grid is span/step per key, never corpus-sized.
    QueryDef(
      "q266_resample_ffill",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("user_id"), col("ts_us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
          col("event_id"))
        Stats.resampleFfill(e, "user_id", "ts_us", "cents",
            stepUs = 21600000000L, tieCol = "event_id")
          .orderBy("user_id", "bucket")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, event_id
             |  FROM events),
             |b AS (SELECT user_id, us // 21600000000 AS bucket, cents,
             |    row_number() OVER (PARTITION BY user_id, us // 21600000000
             |      ORDER BY us DESC, event_id DESC) AS rn,
             |    count(*) OVER (PARTITION BY user_id, us // 21600000000) AS n_obs
             |  FROM e),
             |l AS (SELECT user_id, bucket, cents, n_obs FROM b WHERE rn = 1),
             |sp AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM b GROUP BY 1),
             |g AS (SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM sp),
             |j AS (SELECT g.user_id, g.bucket, l.cents, coalesce(l.n_obs, 0) AS n_obs
             |  FROM g LEFT JOIN l ON g.user_id = l.user_id AND g.bucket = l.bucket),
             |f AS (SELECT user_id, bucket,
             |    last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents, n_obs
             |  FROM j)
             |SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(bucket * 21600000000 AS BIGINT) AS bucket_start_us,
             |  CAST(cents AS BIGINT) AS cents, CAST(n_obs AS BIGINT) AS n_obs
             |FROM f ORDER BY user_id, bucket""".stripMargin)
    ),

    // Hyperlink extraction -> host link-graph edges: the step between
    // WARC/HTML ingest (q124/q128) and the graph analytics that already
    // run on edge lists (PageRank q203, HITS q166). Planted pages carry
    // double- and single-quoted hrefs plus a fragment-only link the
    // character class must exclude; the oracle re-derives every edge from
    // doc_id arithmetic, so a regex that over- or under-captures breaks
    // the hash. Extraction is one codegen'd regexp pass; the only
    // shuffle is the edge rollup.
    QueryDef(
      "q267_link_extract",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        def pid(j: Int) = (col("doc_id") * 7 + j * 13) % 997
        def dq(j: Int) = concat(lit("<a href=\"http://h"), (pid(j) % 23).cast("string"),
          lit(".example.com/p/"), pid(j).cast("string"), lit("\">x</a>"))
        def sq(j: Int) = concat(lit("<a href='http://h"), (pid(j) % 23).cast("string"),
          lit(".example.com/p/"), pid(j).cast("string"), lit("'>y</a>"))
        val html = concat(lit("<html><body>"), dq(1), lit("<a href=\"#top\">t</a>"),
          dq(2), sq(3), lit("</body></html>"))
        d.withColumn("__html", html)
          .withColumn("src_host",
            concat(lit("s"), (col("doc_id") % 13).cast("string"), lit(".example.org")))
          .select(col("src_host"),
            explode(UrlTools.extractHrefs("__html")).as("__url"))
          .select(col("src_host"),
            regexp_extract(col("__url"), "^https?://([^/]+)", 1).as("dst_host"))
          .groupBy("src_host", "dst_host")
          .agg(count(lit(1)).cast("long").as("n_links"))
          .orderBy("src_host", "dst_host")
      },
      Some("""WITH l AS (SELECT doc_id, unnest([1, 2, 3]) AS j FROM documents),
             |e AS (SELECT 's' || (doc_id % 13) || '.example.org' AS src_host,
             |    'h' || (((doc_id * 7 + j * 13) % 997) % 23) || '.example.com' AS dst_host
             |  FROM l)
             |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
             |FROM e GROUP BY 1, 2 ORDER BY src_host, dst_host""".stripMargin)
    ),

    // Salted many-to-one join under the oracle: SkewTools.saltedJoin
    // replicates the dim side buckets× and joins on (key, salt), so a hot
    // key spreads over `buckets` reduce partitions — the rewrite for the
    // skew shape AQE can't split (many-to-one against a non-broadcastable
    // dim). The join key here (l_returnflag, 3 values over the whole
    // fact table) is maximal skew; the certificate is exact equality with
    // the plain join. PropertiesSpec pins salt-count invariance.
    QueryDef(
      "q268_salted_join",
      (s, dir) => {
        val fact = t(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("int").cast("long").as("qty"))
        val dim = fact.select("flag").distinct()
          .withColumn("rate", (ascii(col("flag")) % 5 + 1).cast("long"))
        graft.engine.SkewTools.saltedJoin(fact, dim, Seq("flag"), buckets = 8)
          .groupBy("flag")
          .agg(count(lit(1)).as("n"), sum(col("qty") * col("rate")).as("weighted_qty"))
          .orderBy("flag")
      },
      Some("""WITH dim AS (SELECT DISTINCT l_returnflag AS flag,
             |    ascii(l_returnflag) % 5 + 1 AS rate FROM lineitem)
             |SELECT flag, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(l_quantity AS INT) * rate) AS BIGINT) AS weighted_qty
             |FROM lineitem JOIN dim ON l_returnflag = flag
             |GROUP BY flag ORDER BY flag""".stripMargin)
    ),

    // Right-to-be-forgotten cascade manifest: seed subjects (customers
    // with c_custkey%97=0) fanned breadth-first over the FK DAG
    // (customer -> orders -> lineitem) as semi-joins that shuffle keys,
    // never payloads. The manifest each table contributes is (row count,
    // order-independent md5 key checksum) — the oracle re-derives both,
    // so the plan provably covers EXACTLY the rows a deletion job must
    // touch, before anything destructive runs.
    QueryDef(
      "q269_delete_cascade",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
          .withColumn("li_key", col("l_orderkey") * 10 + col("l_linenumber"))
        val seeds = cust.filter(col("c_custkey") % 97 === 0).select("c_custkey")
        Governance.cascadeManifest("customer", cust, "c_custkey",
            seeds, "c_custkey",
            Seq(Governance.FkEdge("orders", ord, "o_custkey", "o_orderkey", "customer"),
              Governance.FkEdge("lineitem", li, "l_orderkey", "li_key", "orders")))
          .orderBy("table_name")
      },
      Some("""WITH ck AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
             |ok AS (SELECT o_orderkey AS k FROM orders
             |  WHERE o_custkey IN (SELECT k FROM ck)),
             |lk AS (SELECT l_orderkey * 10 + l_linenumber AS k FROM lineitem
             |  WHERE l_orderkey IN (SELECT k FROM ok)),
             |h AS (SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(coalesce(sum(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT), 0) AS BIGINT) AS key_hash
             |  FROM ck
             |  UNION ALL
             |  SELECT 'orders', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT), 0) AS BIGINT)
             |  FROM ok
             |  UNION ALL
             |  SELECT 'lineitem', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT), 0) AS BIGINT)
             |  FROM lk)
             |SELECT * FROM h ORDER BY table_name""".stripMargin)
    ),

    // Two-sample Kolmogorov–Smirnov drift per event type (third drift
    // lens next to TV q133 and Wasserstein q239): even/odd event_id
    // halves compared by the sup-norm ECDF gap in cross-multiplied
    // integer algebra — |cumA·nB − cumB·nA| rides DECIMAL(38,0), the
    // division to basis points happens once at the end, so no float ever
    // crosses the engine boundary. Keyed windows only.
    QueryDef(
      "q270_ks_drift",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_type"),
          (col("event_id") % 2).as("side"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        Stats.ksDrift(e, "event_type", "side", "cents").orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, event_id % 2 AS side,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |g AS (SELECT event_type, cents,
             |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
             |    sum(CASE WHEN side <> 0 THEN 1 ELSE 0 END) AS cb
             |  FROM e GROUP BY 1, 2),
             |c AS (SELECT event_type,
             |    sum(ca) OVER (PARTITION BY event_type ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
             |    sum(cb) OVER (PARTITION BY event_type ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
             |    sum(ca) OVER (PARTITION BY event_type) AS na,
             |    sum(cb) OVER (PARTITION BY event_type) AS nb
             |  FROM g),
             |k AS (SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
             |    max(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)) AS ks
             |  FROM c GROUP BY 1)
             |SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(ks AS BIGINT) AS ks_num,
             |  CAST(ks * 10000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_bp
             |FROM k WHERE n_a > 0 AND n_b > 0 ORDER BY event_type""".stripMargin)
    ),

    // Hilbert-curve index under the oracle: the locality-tighter layout
    // key next to z-order q139 — Morton order jumps diagonally at
    // power-of-two boundaries, Hilbert moves in unit steps, so a box
    // predicate touches fewer zone-map windows at the same sort cost.
    // The Spark side folds the classic xy2d loop as ONE aggregate HOF
    // (codegen'd CASE/xor/shift algebra); the oracle unrolls the SAME
    // eight bit levels as chained CTEs — any divergence in any level's
    // rotate/flip breaks every row's key. OperatorsSpec additionally
    // pins the order-1/2 golden curves and the unit-step locality win
    // over Morton.
    QueryDef(
      "q271_hilbert",
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey").as("id"),
            (col("o_custkey") % 256).as("x"), (col("o_orderkey") % 256).as("y"))
          .withColumn("hilbert", Layout.hilbertIndex("x", "y", 8))
          .orderBy("id"),
      Some {
        val bits = 8
        val m = (1L << bits) - 1
        val steps = (0 until bits).map { i =>
          val s0 = 1L << (bits - 1 - i)
          s"l${i + 1} AS (SELECT id, x0, y0, " +
            s"d + ${s0 * s0} * xor(CASE WHEN (x & $s0) > 0 THEN 3 ELSE 0 END, " +
            s"CASE WHEN (y & $s0) > 0 THEN 1 ELSE 0 END) AS d, " +
            s"CASE WHEN (y & $s0) > 0 THEN x WHEN (x & $s0) > 0 THEN $m - y ELSE y END AS x, " +
            s"CASE WHEN (y & $s0) > 0 THEN y WHEN (x & $s0) > 0 THEN $m - x ELSE x END AS y " +
            s"FROM l$i)"
        }
        "WITH l0 AS (SELECT o_orderkey AS id, o_custkey % 256 AS x0, " +
          "o_orderkey % 256 AS y0, 0 AS d, o_custkey % 256 AS x, " +
          "o_orderkey % 256 AS y FROM orders WHERE o_orderkey % 37 = 0),\n" +
          steps.mkString(",\n") + "\n" +
          s"SELECT id, CAST(x0 AS BIGINT) AS x, CAST(y0 AS BIGINT) AS y, " +
          s"CAST(d AS BIGINT) AS hilbert FROM l$bits ORDER BY id"
      }
    ),

    // Grouped TWO-feature least squares (Stats.ols2) — multiple regression
    // as ONE aggregate pass: Cramer's rule over the nine power sums in
    // DECIMAL(38,0), fixed-point ×1000 coefficients, truncation-toward-zero
    // division on both engines. Per return flag: extended price (cents)
    // regressed on quantity and discount (basis points ÷10) — the fitted
    // slope b1 recovers the per-unit price and b2 the (negative) discount
    // effect, with no float ever crossing the engine boundary.
    QueryDef(
      "q272_ols2",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_returnflag").as("grp"),
          col("l_quantity").cast("decimal(18,2)").cast("long").as("x1"),
          (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("x2"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
        Stats.ols2(li, "grp", "x1", "x2", "y", scale = 1000).orderBy("grp")
      },
      Some("""WITH b AS (SELECT l_returnflag AS grp,
             |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x1,
             |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
             |  FROM lineitem),
             |a AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    CAST(sum(x1*x1) AS HUGEINT) AS sx1x1, CAST(sum(x2*x2) AS HUGEINT) AS sx2x2,
             |    CAST(sum(x1*x2) AS HUGEINT) AS sx1x2, CAST(sum(x1*y) AS HUGEINT) AS sx1y,
             |    CAST(sum(x2*y) AS HUGEINT) AS sx2y
             |  FROM b GROUP BY grp),
             |m AS (SELECT grp, n, sx1, sx2, sy,
             |    n*sx1x1 - sx1*sx1 AS s11, n*sx2x2 - sx2*sx2 AS s22,
             |    n*sx1x2 - sx1*sx2 AS s12, n*sx1y - sx1*sy AS s1y,
             |    n*sx2y - sx2*sy AS s2y
             |  FROM a),
             |r AS (SELECT grp, n, sx1, sx2, sy,
             |    s11*s22 - s12*s12 AS det,
             |    s22*s1y - s12*s2y AS n1, s11*s2y - s12*s1y AS n2
             |  FROM m),
             |f AS (SELECT grp, n,
             |    CASE WHEN det <> 0 THEN (n1 * 1000) // det END AS b1,
             |    CASE WHEN det <> 0 THEN (n2 * 1000) // det END AS b2,
             |    sx1, sx2, sy, det
             |  FROM r)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  CAST(b1 AS BIGINT) AS b1_fp, CAST(b2 AS BIGINT) AS b2_fp,
             |  CAST(CASE WHEN det <> 0 THEN (sy * 1000 - b1 * sx1 - b2 * sx2) // n END
             |    AS BIGINT) AS a_fp
             |FROM f ORDER BY grp""".stripMargin)
    ),

    // Distinct-count view maintenance under retractions (Ivm
    // .maintainDistinct): COUNT(DISTINCT supplier) per part kept exact
    // through a mixed insert/delete CDC batch via the auxiliary
    // (part, supplier, multiplicity) state — deleting one copy of a
    // supplier that ships the part through other rows must NOT decrement
    // the distinct count, which no scalar counter can decide. Certificate:
    // the maintained view equals a full recompute group-for-group (count,
    // sum and per-row md5 checksum), while the base table is never
    // re-scanned — at 100 TB maintenance costs |state|+|batch|, not the
    // corpus.
    QueryDef(
      "q273_distinct_ivm",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_partkey").as("k"), col("l_suppkey").as("v"),
          (col("l_orderkey") % 10).as("slice"))
        val base = li.filter(col("slice") =!= 3)
        val state0 = base.groupBy("k", "v")
          .agg(count(lit(1)).cast("long").as("m"))
        val delta = li.filter(col("slice") === 3)
          .select(col("k"), col("v"), lit(1L).as("m"))
          .unionByName(base.filter(col("slice") === 7)
            .select(col("k"), col("v"), lit(-1L).as("m")))
        val maintained = Ivm.distinctCounts(
          Ivm.maintainDistinct(state0, delta, Seq("k"), "v"), Seq("k"))
        val recomputed = li.filter(col("slice") =!= 7)
          .groupBy("k").agg(countDistinct("v").cast("long").as("n_distinct"))
        val h = expr("CAST(conv(substring(md5(concat(CAST(k AS STRING), ':', " +
          "CAST(n_distinct AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        def summarize(d: DataFrame, tag: String) = d.agg(
          count(lit(1)).as(s"${tag}_groups"),
          sum("n_distinct").as(s"${tag}_sum"),
          sum(h).as(s"${tag}_hash"))
        summarize(maintained, "maintained").crossJoin(summarize(recomputed, "recomputed"))
          .select(col("maintained_groups"), col("recomputed_groups"),
            col("maintained_sum"), col("recomputed_sum"),
            when(col("maintained_groups") === col("recomputed_groups") &&
              col("maintained_sum") === col("recomputed_sum") &&
              col("maintained_hash") === col("recomputed_hash"), 1L)
              .otherwise(0L).as("match_ok"))
      },
      Some("""WITH fin AS (SELECT l_partkey AS k, l_suppkey AS v
             |  FROM lineitem WHERE l_orderkey % 10 <> 7),
             |g AS (SELECT k, CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
             |  FROM fin GROUP BY k),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS groups,
             |    CAST(sum(n_distinct) AS BIGINT) AS total
             |  FROM g)
             |SELECT groups AS maintained_groups, groups AS recomputed_groups,
             |       total AS maintained_sum, total AS recomputed_sum,
             |       CAST(1 AS BIGINT) AS match_ok
             |FROM s""".stripMargin)
    ),

    // Stratified k-fold assignment (Sampling.stratifiedKFold): per-language
    // round-robin deal over the md5-shuffled stratum order, so per
    // (lang, fold) counts differ by AT MOST ONE by construction — the
    // lang_spread column carries that bound into the output and the
    // assign_hash checksums the exact (doc → fold) mapping, so an
    // off-by-one in either engine's rank arithmetic cannot hide behind
    // matching counts. Hash-mod-k splitting has binomial per-stratum
    // imbalance instead; for near-dup-safe folds feed the q250 cluster
    // fingerprint as the key.
    QueryDef(
      "q274_kfold",
      (s, dir) => {
        val folded = Sampling.stratifiedKFold(
          t(s, dir, "documents"), "doc_id", "lang", k = 5)
        val g = folded.groupBy("lang", "fold")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum(expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', " +
              "CAST(fold AS STRING))), 1, 8), 16, 10) AS BIGINT)")).as("assign_hash"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        g.withColumn("lang_spread", (max("n_rows").over(w) - min("n_rows").over(w)))
          .select(col("lang"), col("fold"), col("n_rows"),
            col("lang_spread"), col("assign_hash"))
          .orderBy("lang", "fold")
      },
      Some("""WITH f AS (SELECT doc_id, lang,
             |    CAST((row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5 AS INT) AS fold
             |  FROM documents),
             |g AS (SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(('0x' || substr(md5(doc_id || ':' || fold), 1, 8))::BIGINT)
             |      AS BIGINT) AS assign_hash
             |  FROM f GROUP BY 1, 2)
             |SELECT lang, fold, n_rows,
             |  CAST(max(n_rows) OVER (PARTITION BY lang)
             |     - min(n_rows) OVER (PARTITION BY lang) AS BIGINT) AS lang_spread,
             |  assign_hash
             |FROM g ORDER BY lang, fold""".stripMargin)
    ),

    // Truncated-EWMA anomaly flags (Stats.ewmaAnomalies): per-user spend
    // judged against the user's OWN exponentially-weighted recent level
    // (α=1/2, last 16 observations, weights 2^15…2^0) entirely in scaled
    // integers — |x·(2^16−1) − Σ2^i·x_i| > $200·(2^16−1), no division
    // before the comparison. The self-baseline complement to MAD (q160,
    // global scale) and calendar-slot residuals (q183): a slow drift never
    // alarms, a jump does. One keyed window sort; O(w) in-frame fold.
    QueryDef(
      "q275_ewma_anomaly",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_id"), col("user_id"),
          col("ts_us"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        Stats.ewmaAnomalies(e, "user_id", Seq("ts_us", "event_id"), "cents",
            window = 16, threshold = 20000L)
          .select(col("user_id"), col("event_id"), col("cents"),
            col("ewma"), col("deviation"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             |    CAST(epoch_us(ts) AS BIGINT) AS ts_us
             |  FROM events),
             |h AS (SELECT event_id, user_id, cents,
             |    list(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |      ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING) AS l
             |  FROM e),
             |f AS (SELECT event_id, user_id, cents,
             |    list_sum(list_transform(range(16), i -> l[i+1] * (1::BIGINT << i))) AS wsum
             |  FROM h WHERE len(l) = 16)
             |SELECT user_id, event_id, cents,
             |  CAST(wsum // 65535 AS BIGINT) AS ewma,
             |  CAST((cents * 65535 - wsum) // 65535 AS BIGINT) AS deviation
             |FROM f WHERE abs(cents * 65535 - wsum) > 20000 * 65535
             |ORDER BY user_id, event_id""".stripMargin)
    ),

    // Randomized-response privacy census (Governance
    // .randomizedResponseCounts): each document reports its sensitive bit
    // truthfully only with p=1/2 (else a fair coin) — the classic Warner
    // mechanism, a 3:1 likelihood ratio per report (ln 3 local ε) — yet
    // the per-language debiased estimate t̂ = (4·yes − n)/2 lands within
    // O(√n) of the true count; both sides of that tradeoff are IN the
    // output (est_fp vs yes_true). Coins are md5-derived for engine-
    // replayability; the deployment swaps in real entropy and drops the
    // yes_true column.
    QueryDef(
      "q276_rr_privacy",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("bit", (col("n_chars") % 2 === 0).cast("int"))
        Governance.randomizedResponseCounts(d, "lang", "doc_id", "bit",
            seed = "rr1", scale = 1000)
          .orderBy("lang")
      },
      Some("""WITH b AS (SELECT lang, doc_id,
             |    CASE WHEN n_chars % 2 = 0 THEN 1 ELSE 0 END AS bit,
             |    md5('rr1:' || doc_id) AS h
             |  FROM documents),
             |r AS (SELECT lang, bit,
             |    CASE WHEN ('0x' || substr(h, 1, 1))::INT < 8 THEN bit
             |         ELSE ('0x' || substr(h, 2, 1))::INT % 2 END AS rep
             |  FROM b),
             |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(bit) AS BIGINT) AS yes_true,
             |    CAST(sum(rep) AS BIGINT) AS yes_reported
             |  FROM r GROUP BY lang)
             |SELECT lang, n, yes_true, yes_reported,
             |  CAST(((4 * yes_reported - n) * 1000) // 2 AS BIGINT) AS est_fp,
             |  CAST(abs(((4 * yes_reported - n) * 1000) // 2 - yes_true * 1000) AS BIGINT) AS err_fp
             |FROM g ORDER BY lang""".stripMargin)
    ),

    // Synchronous label propagation (Graphs.labelPropagation) —
    // COMMUNITIES, not components: 10-clique blocks over doc_ids with a
    // bridge edge between every 5th pair of adjacent blocks. Two rounds
    // settle every block on its base label, and the bridges change
    // NOTHING — the neighbor-label mode outvotes a single cross edge,
    // exactly where any CC walk (q26/q93/q259) would merge the bridged
    // blocks into one component. The oracle replays both synchronous
    // rounds (count-desc/min-label tie-break) as chained CTEs, so the
    // update rule itself is what's certified, not just the final shape.
    QueryDef(
      "q277_lpa_communities",
      (s, dir) => {
        val ids = t(s, dir, "documents")
          .select(col("doc_id").as("i"), (col("doc_id") - col("doc_id") % 10).as("blk"))
          .localCheckpoint()
        val clique = ids.as("x").join(ids.as("y"),
            col("x.blk") === col("y.blk") && col("x.i") < col("y.i"))
          .select(col("x.i").as("a"), col("y.i").as("b"))
        val bridge = ids.filter(col("i") % 10 === 9 &&
            (col("blk") / 10).cast("long") % 5 === 0)
          .select(col("i").as("a"), (col("i") + 1).as("b"))
          .join(ids.select(col("i").as("b")), Seq("b"), "left_semi")
        Graphs.labelPropagation(clique.unionByName(bridge), "a", "b", rounds = 2)
          .groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            min("node").as("min_id"), max("node").as("max_id"))
          .orderBy("community")
      },
      Some {
        def round(prev: String, n: Int) =
          s"""r${n}c AS (SELECT u.d AS i, l.lbl, count(*) AS c
             |  FROM und u JOIN $prev l ON u.s = l.i GROUP BY 1, 2),
             |r${n}p AS (SELECT i, lbl FROM (SELECT i, lbl,
             |    row_number() OVER (PARTITION BY i ORDER BY c DESC, lbl) AS rn
             |  FROM r${n}c) WHERE rn = 1),
             |l$n AS (SELECT nodes.i, COALESCE(p.lbl, nodes.i) AS lbl
             |  FROM nodes LEFT JOIN r${n}p p ON nodes.i = p.i)""".stripMargin
        s"""WITH ids AS (SELECT doc_id AS i, doc_id - doc_id % 10 AS blk FROM documents),
           |ed AS (SELECT x.i AS a, y.i AS b FROM ids x JOIN ids y
           |    ON x.blk = y.blk AND x.i < y.i
           |  UNION ALL
           |  SELECT x.i, x.i + 1 FROM ids x JOIN ids y ON y.i = x.i + 1
           |  WHERE x.i % 10 = 9 AND (x.blk // 10) % 5 = 0),
           |und AS (SELECT a AS s, b AS d FROM ed UNION ALL SELECT b AS s, a AS d FROM ed),
           |nodes AS (SELECT DISTINCT s AS i FROM und),
           |l0 AS (SELECT i, i AS lbl FROM nodes),
           |${round("l0", 1)},
           |${round("l1", 2)}
           |SELECT CAST(lbl AS BIGINT) AS community,
           |  CAST(count(*) AS BIGINT) AS n_members,
           |  CAST(min(i) AS BIGINT) AS min_id, CAST(max(i) AS BIGINT) AS max_id
           |FROM l2 GROUP BY 1 ORDER BY 1""".stripMargin
      }
    ),

    // Retrieval-quality certificate: nDCG@10 of exact cosine retrieval
    // against the embedding labels as binary relevance — the evaluation
    // harness the whole ANN family (q36–q75, q105/q106, q220) reports
    // into, in pure integer algebra: the log2 discount table is pinned as
    // ×10⁶ literals IDENTICAL in both engines (floor(10⁶/log₂(i+1))), so
    // no transcendental ever evaluates at query time. Probes are every
    // 50th vector; DCG sums the discount where the neighbor's label
    // matches, IDCG is the prefix-sum literal at min(R,10), and the final
    // basis-point render divides once.
    QueryDef(
      "q278_ndcg",
      (s, dir) => {
        val disc = NdcgDisc
        val pre = NdcgPre
        val e = t(s, dir, "embeddings")
        val ranked = Similarity.knnJoin(e, "vec_id", "embedding",
            col("vec_id") % 50 === 0, k = 10)
          .join(e.select(col("vec_id").as("probe_id"), col("label").as("probe_label")),
            Seq("probe_id"))
          .join(e.select(col("vec_id").as("neighbor_id"), col("label").as("nbr_label")),
            Seq("neighbor_id"))
        val discCase = disc.zipWithIndex
          .map { case (d, i) => s"WHEN rank = ${i + 1} THEN ${d}L" }
          .mkString("CASE ", " ", " ELSE 0L END")
        val dcg = ranked.groupBy("probe_id", "probe_label")
          .agg(sum(when(col("nbr_label") === col("probe_label"), 1L).otherwise(0L))
              .as("n_rel_at10"),
            sum(when(col("nbr_label") === col("probe_label"),
              expr(discCase)).otherwise(0L)).as("dcg_fp"))
        val totals = e.groupBy(col("label").as("probe_label"))
          .agg(count(lit(1)).cast("long").as("n_label"))
        val preCase = pre.zipWithIndex
          .map { case (p, i) => s"WHEN least(n_label - 1, 10) = ${i + 1} THEN ${p}L" }
          .mkString("CASE ", " ", " ELSE 0L END")
        dcg.join(totals, Seq("probe_label"))
          .withColumn("idcg_fp", expr(preCase))
          .select(col("probe_id"), col("probe_label"), col("n_rel_at10"),
            col("dcg_fp"), col("idcg_fp"),
            when(col("idcg_fp") > 0,
              expr("CAST((dcg_fp * 10000) div idcg_fp AS BIGINT)")).as("ndcg_bp"))
          .orderBy("probe_id")
      },
      Some {
        val disc = NdcgDisc
        val pre = NdcgPre
        val discCase = disc.zipWithIndex
          .map { case (d, i) => s"WHEN rank = ${i + 1} THEN $d" }
          .mkString("CASE ", " ", " ELSE 0 END")
        val preCase = pre.zipWithIndex
          .map { case (p, i) => s"WHEN least(n_label - 1, 10) = ${i + 1} THEN $p" }
          .mkString("CASE ", " ", " ELSE 0 END")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv, label AS probe_label
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |sc AS (SELECT p.probe_id, p.probe_label, e.vec_id AS neighbor_id,
           |    e.label AS nbr_label, ${cos("e.embedding", "p.pv")} AS cs
           |  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.probe_id),
           |rk AS (SELECT probe_id, probe_label, nbr_label,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rank
           |  FROM sc),
           |top AS (SELECT * FROM rk WHERE rank <= 10),
           |d AS (SELECT probe_id, probe_label,
           |    CAST(sum(CASE WHEN nbr_label = probe_label THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at10,
           |    CAST(sum(CASE WHEN nbr_label = probe_label
           |      THEN $discCase ELSE 0 END) AS BIGINT) AS dcg_fp
           |  FROM top GROUP BY 1, 2),
           |t AS (SELECT label AS probe_label, CAST(count(*) AS BIGINT) AS n_label
           |  FROM embeddings GROUP BY 1)
           |SELECT probe_id, probe_label, n_rel_at10, dcg_fp,
           |  CAST($preCase AS BIGINT) AS idcg_fp,
           |  CAST(CASE WHEN $preCase > 0 THEN (dcg_fp * 10000) // ($preCase) END AS BIGINT) AS ndcg_bp
           |FROM d JOIN t USING (probe_label) ORDER BY probe_id""".stripMargin
      }
    ),

    // Graph-expanded ANN recall certificate (Similarity
    // .graphExpandedRecall): the NN-descent move as one deterministic
    // round — a kNN graph drawing on TWO independent hyperplane tables
    // (top-5 among the union of each vector's two buckets), probes
    // additionally search their neighbors' neighbors. Two tables are the
    // point: a one-table graph can never leave the probe's own bucket
    // (neighbors' neighbors share it by construction — an earlier cut of
    // this query measured exactly 0 expansion), while two-hop paths
    // through the second table compose different bucket boundaries and
    // recover true neighbors the baseline bucket cut off. The certificate
    // carries recall@10 against exact brute-force truth BEFORE and AFTER
    // expansion per probe; the oracle replays both plane tables, the
    // union graph, the expansion, both top-10s, and the brute truth.
    QueryDef(
      "q279_ann_graph_expand",
      (s, dir) =>
        Similarity.graphExpandedRecall(t(s, dir, "embeddings"),
            "vec_id", "embedding", probeMod = 50L, bits = 4, kGraph = 5, k = 10,
            seed2 = 1337)
          .orderBy("probe_id"),
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        s"""WITH planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g AS (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |c0 AS (SELECT x.id AS pid, y.id AS cid
           |  FROM v x JOIN v y ON x.ba = y.ba AND x.id <> y.id
           |  WHERE x.id % 50 = 0),
           |th AS (SELECT g1.src AS pid, g2.dst AS cid
           |  FROM g g1 JOIN g g2 ON g1.dst = g2.src
           |  WHERE g1.src % 50 = 0 AND g1.src <> g2.dst),
           |c1 AS (SELECT DISTINCT pid, cid FROM
           |  (SELECT pid, cid FROM c0 UNION ALL SELECT pid, cid FROM th)),
           |tk0 AS (SELECT pid, cid FROM (SELECT c.pid, c.cid,
           |    row_number() OVER (PARTITION BY c.pid
           |      ORDER BY ${cos("p.embedding", "e.embedding")} DESC, c.cid) AS rn
           |  FROM c0 c JOIN embeddings p ON p.vec_id = c.pid
           |    JOIN embeddings e ON e.vec_id = c.cid) WHERE rn <= 10),
           |tk1 AS (SELECT pid, cid FROM (SELECT c.pid, c.cid,
           |    row_number() OVER (PARTITION BY c.pid
           |      ORDER BY ${cos("p.embedding", "e.embedding")} DESC, c.cid) AS rn
           |  FROM c1 c JOIN embeddings p ON p.vec_id = c.pid
           |    JOIN embeddings e ON e.vec_id = c.cid) WHERE rn <= 10),
           |br AS (SELECT pid, cid FROM (SELECT p.vec_id AS pid, e.vec_id AS cid,
           |    row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY ${cos("p.embedding", "e.embedding")} DESC, e.vec_id) AS rn
           |  FROM embeddings e CROSS JOIN
           |    (SELECT * FROM embeddings WHERE vec_id % 50 = 0) p
           |  WHERE e.vec_id <> p.vec_id) WHERE rn <= 10),
           |nb AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_base_cand FROM c0 GROUP BY 1),
           |ne AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_exp_cand FROM c1 GROUP BY 1),
           |bh AS (SELECT t.pid, CAST(count(*) AS BIGINT) AS base_hits
           |  FROM tk0 t JOIN br USING (pid, cid) GROUP BY 1),
           |eh AS (SELECT t.pid, CAST(count(*) AS BIGINT) AS expanded_hits
           |  FROM tk1 t JOIN br USING (pid, cid) GROUP BY 1),
           |p0 AS (SELECT vec_id AS pid FROM embeddings WHERE vec_id % 50 = 0)
           |SELECT p0.pid AS probe_id,
           |  COALESCE(nb.n_base_cand, 0) AS n_base_cand,
           |  COALESCE(ne.n_exp_cand, 0) AS n_exp_cand,
           |  COALESCE(bh.base_hits, 0) AS base_hits,
           |  COALESCE(eh.expanded_hits, 0) AS expanded_hits
           |FROM p0 LEFT JOIN nb USING (pid) LEFT JOIN ne USING (pid)
           |  LEFT JOIN bh USING (pid) LEFT JOIN eh USING (pid)
           |ORDER BY probe_id""".stripMargin
      }
    ),

    // Sample autocorrelation at lags 1..3 (Stats.acf): does per-type spend
    // remember itself? The mean-centered products expand algebraically
    // (c_k = n²Σxy − nS(Σh+Σt) + cnt·S²) so ONE window + ONE aggregate
    // covers every lag with no separate mean pass; everything rides
    // DECIMAL(38,0)/HUGEINT and the ×10⁴ render divides once. The
    // self-memory lens next to burstiness (q180) and trend (q149).
    QueryDef(
      "q280_acf",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_type"), col("ts_us"),
          col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        Stats.acf(e, "event_type", Seq("ts_us", "event_id"), "cents", maxLag = 3)
          .orderBy("event_type", "lag")
      },
      Some {
        def lagSel(k: Int) =
          s"""sum(CASE WHEN l$k IS NOT NULL THEN x * l$k ELSE 0 END) AS sxy$k,
             |    sum(CASE WHEN l$k IS NOT NULL THEN x ELSE 0 END) AS sh$k,
             |    sum(CASE WHEN l$k IS NOT NULL THEN l$k ELSE 0 END) AS st$k,
             |    sum(CASE WHEN l$k IS NOT NULL THEN 1 ELSE 0 END) AS cnt$k""".stripMargin
        def lagOut(k: Int) =
          s"""SELECT event_type, CAST($k AS INT) AS lag, CAST(n AS BIGINT) AS n,
             |  CAST(CASE WHEN c0 > 0 THEN
             |    ((n*n*sxy$k - n*s*(sh$k + st$k) + cnt$k*s*s) * 10000) // c0 END
             |    AS BIGINT) AS acf_fp
             |FROM c""".stripMargin
        s"""WITH e AS (SELECT event_type, event_id,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           |    epoch_us(ts) AS ts_us
           |  FROM events),
           |l AS (SELECT event_type, x,
           |    lead(x, 1) OVER w AS l1, lead(x, 2) OVER w AS l2, lead(x, 3) OVER w AS l3
           |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
           |g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x*x) AS HUGEINT) AS sxx,
           |    ${lagSel(1)},
           |    ${lagSel(2)},
           |    ${lagSel(3)}
           |  FROM l GROUP BY event_type),
           |c AS (SELECT *, n*n*sxx - n*s*s AS c0 FROM g)
           |SELECT * FROM (${lagOut(1)} UNION ALL ${lagOut(2)} UNION ALL ${lagOut(3)})
           |ORDER BY event_type, lag""".stripMargin
      }
    ),

    // Exact trimmed mean (Stats.trimmedMean): per-type spend with the top
    // and bottom 5% BY RANK removed — the robust location estimate between
    // mean and median, cut rows pinned by (value, event_id) tie-break so
    // both engines drop the identical rows. Certificate includes the kept
    // count, so an off-by-one at either cut surfaces as a row diff.
    QueryDef(
      "q281_trimmed_mean",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_type"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        Stats.trimmedMean(e, "event_type", "cents", "event_id", trimPct = 5)
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |r AS (SELECT event_type, cents,
             |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e),
             |k AS (SELECT event_type, cents FROM r
             |  WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(CAST(sum(cents) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS trimmed_mean_fp
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Per-group rank normalization to basis points (Stats.rankNormalize):
    // the distribution-free feature transform — value → (rank−1)·10⁴ div
    // (n−1), a bijection pinned by the (value, event_id) tie-break. Ranks
    // are computed over the FULL group; the output samples every 199th
    // event so the dump stays small while any rank shift anywhere in the
    // group moves some sampled row's basis points.
    QueryDef(
      "q282_rank_normalize",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_type"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        Stats.rankNormalize(e, "event_type", "cents", "event_id")
          .filter(col("event_id") % 199 === 0)
          .select(col("event_type"), col("event_id"), col("cents"), col("rank_bp"))
          .orderBy("event_type", "event_id")
      },
      Some("""WITH e AS (SELECT event_type, event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |r AS (SELECT event_type, event_id, cents,
             |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e)
             |SELECT event_type, event_id, cents,
             |  CAST(CASE WHEN n > 1 THEN (rn - 1) * 10000 // (n - 1) ELSE 0 END AS BIGINT) AS rank_bp
             |FROM r WHERE event_id % 199 = 0
             |ORDER BY event_type, event_id""".stripMargin)
    ),

    // Flesch reading-ease datasheet (TextAnalysis.readability): the
    // trained-nothing readability lens next to Gopher gates (q83) and LM
    // fluency (q112) — three regexp counts (words, [.!?]+ sentence runs,
    // vowel-group syllables) and the classic formula at ×1000 fixed point
    // with truncating divisions both engines replay. Map-side scan only.
    QueryDef(
      "q283_readability",
      (s, dir) =>
        TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
             |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  CAST(CASE WHEN n_words > 0 AND n_sentences > 0 THEN
             |    206835 - (1015 * n_words) // n_sentences - (84600 * n_syllables) // n_words
             |  END AS BIGINT) AS flesch_fp
             |FROM c ORDER BY doc_id""".stripMargin)
    ),

    // k-anonymity release plan (Governance.kAnonymityLevels): the
    // (lang, source) quasi-identifier lattice over documents at k=5 —
    // combos with ≥5 rows release at full detail (level 0), failing
    // combos regroup on lang alone and release generalized if the crowd
    // reaches 5 (level 1), the rest are suppressed (level 2). The
    // collection-side twin q276 adds noise; this is the release-side
    // crowd requirement, emitted as the reviewable plan-as-data contract.
    QueryDef(
      "q284_k_anonymity",
      (s, dir) =>
        Governance.kAnonymityLevels(t(s, dir, "documents"), "lang", "source", k = 5)
          .orderBy("lang", "source"),
      Some("""WITH g0 AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
             |  FROM documents GROUP BY 1, 2),
             |g1 AS (SELECT lang, sum(n_rows) AS n1 FROM g0 WHERE n_rows < 5 GROUP BY 1)
             |SELECT g0.lang, g0.source, g0.n_rows,
             |  CAST(CASE WHEN g0.n_rows >= 5 THEN 0
             |       WHEN g1.n1 >= 5 THEN 1 ELSE 2 END AS INT) AS level
             |FROM g0 LEFT JOIN g1 ON g0.lang = g1.lang
             |ORDER BY g0.lang, g0.source""".stripMargin)
    ),

    // Identity stitching (cross-device entity resolution): users and
    // device-ids from event props form a bipartite graph (edge = user
    // seen on device ≥4 times — the damping that keeps casual overlap
    // from wiring everyone together), connected components stitch the
    // identities. Spark runs the O(log n) star contraction; the oracle
    // computes the SAME components from first principles via a recursive
    // transitive closure — a data-driven CC certified without planted
    // structure, where q259's closed-form oracle couldn't reach.
    QueryDef(
      "q285_identity_stitch",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        val edges = e.groupBy("user_id", "k")
          .agg(count(lit(1)).as("__c")).filter(col("__c") >= 4)
          .select(col("user_id").as("a"), (col("k") + 1000000L).as("b"))
        Dedup.connectedComponentsStarContraction(edges, "a", "b")
          .groupBy("component")
          .agg(sum(when(col("id") < 1000000L, 1L).otherwise(0L)).as("n_users"),
            sum(when(col("id") >= 1000000L, 1L).otherwise(0L)).as("n_devices"),
            min(when(col("id") < 1000000L, col("id"))).as("min_user"),
            max(when(col("id") < 1000000L, col("id"))).as("max_user"))
          .orderBy("component")
      },
      Some("""WITH RECURSIVE
             |e AS (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events),
             |g AS (SELECT user_id, k FROM e GROUP BY user_id, k HAVING count(*) >= 4),
             |ed AS (SELECT user_id AS a, k + 1000000 AS b FROM g),
             |und AS (SELECT a AS s, b AS d FROM ed UNION SELECT b, a FROM ed),
             |nodes AS (SELECT DISTINCT s AS n FROM und),
             |reach(a, b) AS (SELECT n, n FROM nodes
             |  UNION SELECT r.a, u.d FROM reach r JOIN und u ON r.b = u.s),
             |comp AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a)
             |SELECT CAST(component AS BIGINT) AS component,
             |  CAST(sum(CASE WHEN id < 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
             |  CAST(sum(CASE WHEN id >= 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_devices,
             |  CAST(min(CASE WHEN id < 1000000 THEN id END) AS BIGINT) AS min_user,
             |  CAST(max(CASE WHEN id < 1000000 THEN id END) AS BIGINT) AS max_user
             |FROM comp GROUP BY component ORDER BY component""".stripMargin)
    ),

    // Column-level lineage from the ANALYZED Catalyst plan (tools
    // .Lineage): which source columns can influence each output column of
    // a pipeline — the impact-analysis / PII-reachability answer read off
    // the attribute graph BEFORE anything executes (zero jobs run; the
    // result frame is built from the plan). The pipeline under audit
    // joins orders to customer, derives a flag, and aggregates; the
    // oracle pins the hand-derived truth: the weighted sum must trace to
    // o_totalprice ONLY (through the derived flag), the count to no
    // column at all.
    QueryDef(
      "q286_column_lineage",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val pipe = o.join(c, o("o_custkey") === c("c_custkey"))
          .withColumn("big", col("o_totalprice") > 100000)
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(sum(col("o_totalprice") *
              when(col("big"), 2).otherwise(1)).as("weighted"),
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_customers"))
        graft.tools.Lineage.columnLineageDf(s, pipe)
          .orderBy("out_column", "src_table", "src_column")
      },
      Some("""SELECT * FROM (VALUES
             |  ('n_customers', 'orders', 'o_custkey'),
             |  ('n_orders', '(literal)', '(literal)'),
             |  ('segment', 'customer', 'c_mktsegment'),
             |  ('weighted', 'orders', 'o_totalprice'))
             |AS t(out_column, src_table, src_column)
             |ORDER BY out_column, src_table, src_column""".stripMargin)
    ),

    // Chapman–Kolmogorov Markovianity certificate (Stats
    // .markovChapmanKolmogorov): if per-user event sequences were
    // first-order Markov, the two-step transition matrix would equal the
    // one-step matrix squared — both sides computed empirically in ×10⁶
    // fixed point, their gap per (from, to) cell IS the output. The
    // modeling-assumption audit on top of q161's transition matrix.
    QueryDef(
      "q287_markov_ck",
      (s, dir) => {
        val e = eventsUs(s, dir)
        Stats.markovChapmanKolmogorov(e, "user_id", "event_type",
            Seq("ts_us", "event_id"))
          .orderBy("from_state", "to_state")
      },
      Some("""WITH b AS (SELECT user_id, event_type AS s0,
             |    lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
             |n1 AS (SELECT s0 AS f, s1 AS t, count(*) AS n FROM b WHERE s1 IS NOT NULL GROUP BY 1, 2),
             |p1 AS (SELECT f, t, n * 1000000 // sum(n) OVER (PARTITION BY f) AS p FROM n1),
             |md AS (SELECT a.f, b2.t, CAST(sum(a.p * b2.p) // 1000000 AS BIGINT) AS p2m
             |  FROM p1 a JOIN p1 b2 ON a.t = b2.f GROUP BY 1, 2),
             |n2 AS (SELECT s0 AS f, s2 AS t, count(*) AS n FROM b WHERE s2 IS NOT NULL GROUP BY 1, 2),
             |p2 AS (SELECT f, t, CAST(n * 1000000 // sum(n) OVER (PARTITION BY f) AS BIGINT) AS p2e FROM n2)
             |SELECT COALESCE(md.f, p2.f) AS from_state, COALESCE(md.t, p2.t) AS to_state,
             |  COALESCE(p2m, 0) AS p2_model_fp, COALESCE(p2e, 0) AS p2_emp_fp,
             |  COALESCE(p2m, 0) - COALESCE(p2e, 0) AS diff_fp
             |FROM md FULL OUTER JOIN p2 ON md.f = p2.f AND md.t = p2.t
             |ORDER BY from_state, to_state""".stripMargin)
    ),

    // Sliding-window distinct users — the native Spark `window()` sliding
    // window (1 h length, 15 min slide: every event lands in exactly 4
    // windows) with exact distinct-user counts per window; the oracle
    // re-derives the same epoch-aligned window starts by integer
    // arithmetic and explodes the 4 memberships. The batch twin of the
    // streaming windowed-agg path, under the driver's oracle.
    QueryDef(
      "q288_sliding_distinct",
      (s, dir) => {
        val e = events(s, dir)
        e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .select(unix_micros(col("window.start")).as("window_start_us"),
            col("n_events"), col("n_users"))
          .orderBy("window_start_us")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS u FROM events),
             |m AS (SELECT user_id, u,
             |    (u // 900000000) * 900000000 - unnest(range(4)) * 900000000 AS ws
             |  FROM e)
             |SELECT CAST(ws AS BIGINT) AS window_start_us,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM m GROUP BY ws ORDER BY window_start_us""".stripMargin)
    ),

    // Sliding-window distinct via MERGEABLE sketches — q288's scale path:
    // exact sliding countDistinct reprocesses every event len/slide times,
    // while ONE HLL per 15-min base bucket merges into each 1-h window as
    // pure sketch algebra (hll_union_agg over 4 tiny sketches) — at 100 TB
    // the events are touched once and the window layer is metadata-sized.
    // Certified with the q191 flag pattern: per window the estimate must
    // land within 5% (+2 absolute for tiny windows) of the exact count
    // the oracle recomputes.
    QueryDef(
      "q289_sliding_hll",
      (s, dir) => {
        val e = eventsUs(s, dir)
          .withColumn("bucket", expr("(ts_us div 900000000) * 900000000"))
        val perBucket = e.groupBy("bucket")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"),
            count(lit(1)).as("n"))
        val windows = perBucket
          .withColumn("m", explode(sequence(lit(0), lit(3))))
          .withColumn("window_start_us", col("bucket") - col("m") * 900000000L)
          .groupBy("window_start_us")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
            sum("n").as("n_events"))
        val exact = e
          .withColumn("m", explode(sequence(lit(0), lit(3))))
          .withColumn("window_start_us", col("bucket") - col("m") * 900000000L)
          .groupBy("window_start_us")
          .agg(countDistinct("user_id").as("exact_users"))
        windows.join(exact, Seq("window_start_us"))
          .select(col("window_start_us"), col("n_events").cast("long"),
            col("exact_users"),
            when(abs(col("est") - col("exact_users")) * 100 <=
              col("exact_users") * 5 + 200, 1L).otherwise(0L).as("est_ok"))
          .orderBy("window_start_us")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS u FROM events),
             |m AS (SELECT user_id,
             |    (u // 900000000) * 900000000 - unnest(range(4)) * 900000000 AS ws
             |  FROM e)
             |SELECT CAST(ws AS BIGINT) AS window_start_us,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  CAST(1 AS BIGINT) AS est_ok
             |FROM m GROUP BY ws ORDER BY window_start_us""".stripMargin)
    ),

    // Token rank-churn report: the week-over-week movers table — top-20
    // token ranks in the even-doc half vs the odd-doc half, joined on
    // token with rank deltas and entered/left markers. Rank windows are
    // per-half (keyed), the join carries only top-k rows, and the
    // deterministic (count desc, token) order makes every rank
    // engine-exact.
    QueryDef(
      "q290_rank_churn",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select((col("doc_id") % 2 === 0).as("even"),
            explode(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).as("tok"))
        def ranks(side: Boolean) = toks.filter(col("even") === side)
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("tok"))))
          .filter(col("rank") <= 20)
        ranks(true).select(col("tok"), col("rank").as("rank_a"), col("n").as("n_a"))
          .join(ranks(false).select(col("tok"), col("rank").as("rank_b"), col("n").as("n_b")),
            Seq("tok"), "full_outer")
          .select(col("tok"),
            coalesce(col("rank_a"), lit(0)).cast("int").as("rank_a"),
            coalesce(col("rank_b"), lit(0)).cast("int").as("rank_b"),
            (coalesce(col("rank_b"), lit(21)) - coalesce(col("rank_a"), lit(21)))
              .cast("int").as("delta"))
          .orderBy("tok")
      },
      Some("""WITH toks AS (SELECT doc_id % 2 = 0 AS even, unnest(list_filter(
             |    string_split_regex(text, '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |ra AS (SELECT tok, rank_a, n FROM (SELECT tok, count(*) AS n,
             |    row_number() OVER (ORDER BY count(*) DESC, tok) AS rank_a
             |  FROM toks WHERE even GROUP BY tok) WHERE rank_a <= 20),
             |rb AS (SELECT tok, rank_b, n FROM (SELECT tok, count(*) AS n,
             |    row_number() OVER (ORDER BY count(*) DESC, tok) AS rank_b
             |  FROM toks WHERE NOT even GROUP BY tok) WHERE rank_b <= 20)
             |SELECT COALESCE(ra.tok, rb.tok) AS tok,
             |  CAST(COALESCE(rank_a, 0) AS INT) AS rank_a,
             |  CAST(COALESCE(rank_b, 0) AS INT) AS rank_b,
             |  CAST(COALESCE(rank_b, 21) - COALESCE(rank_a, 21) AS INT) AS delta
             |FROM ra FULL OUTER JOIN rb ON ra.tok = rb.tok
             |ORDER BY tok""".stripMargin)
    ),

    // Append-only zone-map maintenance: the metadata-layer IVM — per
    // key-range segment (min, max, n_rows) zone rows maintained under an
    // append batch by a keyed merge (least/greatest/sum), certified
    // row-for-row against zone maps recomputed from the full union. Under
    // APPENDS min/max are a lattice join (associative, no history needed)
    // — deletes would need q273's multiplicity machinery, which is why
    // engines invalidate rather than maintain zone maps on delete. At
    // 100 TB the maintenance cost is the BATCH's zone rows, not a corpus
    // rescan.
    QueryDef(
      "q291_zonemap_ivm",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          (col("l_orderkey") % 64).as("segment"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"),
          (col("l_partkey") % 10).as("slice"))
        def zones(d: DataFrame) = d.groupBy("segment")
          .agg(min("price").as("zmin"), max("price").as("zmax"),
            count(lit(1)).cast("long").as("n_rows"))
        val base = zones(li.filter(col("slice") =!= 3))
        val delta = zones(li.filter(col("slice") === 3))
        val maintained = base.as("b").join(delta.as("d"), Seq("segment"), "full_outer")
          .select(col("segment"),
            least(col("b.zmin"), col("d.zmin")).as("zmin"),
            greatest(col("b.zmax"), col("d.zmax")).as("zmax"),
            (coalesce(col("b.n_rows"), lit(0L)) + coalesce(col("d.n_rows"), lit(0L)))
              .as("n_rows"))
        val recomputed = zones(li)
          .select(col("segment"), col("zmin").as("rmin"), col("zmax").as("rmax"),
            col("n_rows").as("rn"))
        canonOut(maintained.join(recomputed, Seq("segment"))
          .withColumn("match_ok",
            when(col("zmin") === col("rmin") && col("zmax") === col("rmax") &&
              col("n_rows") === col("rn"), 1L).otherwise(0L))
          .select(col("segment"), col("zmin"), col("zmax"), col("n_rows"), col("match_ok"))
          .orderBy("segment"))
      },
      Some("""WITH z AS (SELECT l_orderkey % 64 AS segment,
             |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS zmin,
             |    max(CAST(l_extendedprice AS DECIMAL(18,2))) AS zmax,
             |    CAST(count(*) AS BIGINT) AS n_rows
             |  FROM lineitem GROUP BY 1)
             |SELECT segment, CAST(zmin AS VARCHAR) AS zmin, CAST(zmax AS VARCHAR) AS zmax,
             |  n_rows, CAST(1 AS BIGINT) AS match_ok
             |FROM z ORDER BY segment""".stripMargin)
    ),

    // Decile lift chart: users ranked by total spend, dealt into 10
    // ntile() deciles (SQL-standard sizing both engines implement
    // identically: earlier tiles one row bigger), each decile reporting
    // its share of purchases in basis points — the campaign-targeting
    // "does the top decile carry the purchases" table. One user rollup,
    // one global rank window, integer shares.
    QueryDef(
      "q292_decile_lift",
      (s, dir) => {
        val perUser = eventsUs(s, dir).groupBy("user_id")
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("spend_cents"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchases"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("spend_cents").desc, col("user_id"))
        val tot = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        perUser.withColumn("decile", ntile(10).over(w))
          .groupBy("decile")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("spend_cents").as("spend_cents"),
            sum("purchases").as("purchases"))
          .withColumn("purchase_share_bp",
            expr("purchases * 10000 div sum(purchases) over ()"))
          .select(col("decile"), col("n_users"), col("spend_cents"),
            col("purchases"), col("purchase_share_bp").cast("long"))
          .orderBy("decile")
      },
      Some("""WITH u AS (SELECT user_id,
             |    sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spend_cents,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
             |  FROM events GROUP BY 1),
             |d AS (SELECT ntile(10) OVER (ORDER BY spend_cents DESC, user_id) AS decile,
             |    spend_cents, purchases FROM u),
             |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(spend_cents) AS BIGINT) AS spend_cents,
             |    CAST(sum(purchases) AS BIGINT) AS purchases
             |  FROM d GROUP BY 1)
             |SELECT decile, n_users, spend_cents, purchases,
             |  CAST(purchases * 10000 // sum(purchases) OVER () AS BIGINT) AS purchase_share_bp
             |FROM g ORDER BY decile""".stripMargin)
    ),

    // Foreign-key discovery by inclusion-dependency mining: for candidate
    // (child.col → parent.col) pairs, the share of the child's DISTINCT
    // values contained in the parent's key set — the schema-inference
    // complement to key-candidate ranking (q158) and FD audit (q184). All
    // probes are key-only distinct semi-joins (values shuffle once,
    // payloads never), and a deliberately-wrong candidate shows partial
    // containment so the flag actually discriminates.
    QueryDef(
      "q293_fk_discovery",
      (s, dir) => {
        def probe(childName: String, child: DataFrame, childCol: String,
            parentName: String, parent: DataFrame, parentCol: String) = {
          val cd = child.select(col(childCol).as("v")).filter(col("v").isNotNull)
            .distinct()
          val pd = parent.select(col(parentCol).as("v")).distinct()
          cd.join(pd.withColumn("__in_parent", lit(1L)), Seq("v"), "left_outer")
            .agg(count(lit(1)).cast("long").as("n_child_distinct"),
              coalesce(sum("__in_parent"), lit(0L)).as("n_contained"))
            .select(
              lit(s"$childName.$childCol").as("child"),
              lit(s"$parentName.$parentCol").as("parent"),
              col("n_child_distinct"), col("n_contained"),
              expr("n_contained * 10000 div n_child_distinct").as("containment_bp"),
              when(col("n_contained") === col("n_child_distinct"), 1L)
                .otherwise(0L).as("is_fk"))
        }
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
        Seq(
          probe("lineitem", li, "l_orderkey", "orders", o, "o_orderkey"),
          probe("lineitem", li, "l_suppkey", "supplier", su, "s_suppkey"),
          probe("orders", o, "o_custkey", "customer", c, "c_custkey"),
          // the discriminating negative: order keys are NOT customer keys
          probe("orders", o, "o_orderkey", "customer", c, "c_custkey")
        ).reduce(_ unionByName _).orderBy("child", "parent")
      },
      Some {
        def probe(cTab: String, cCol: String, pTab: String, pCol: String) =
          s"""SELECT '$cTab.$cCol' AS child, '$pTab.$pCol' AS parent,
             |  CAST(count(*) AS BIGINT) AS n_child_distinct,
             |  CAST(sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
             |  CAST(sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS containment_bp,
             |  CAST(CASE WHEN sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END) = count(*)
             |    THEN 1 ELSE 0 END AS BIGINT) AS is_fk
             |FROM (SELECT DISTINCT $cCol AS v FROM $cTab WHERE $cCol IS NOT NULL) c
             |LEFT JOIN (SELECT DISTINCT $pCol AS v FROM $pTab) p USING (v)""".stripMargin
        s"""SELECT * FROM (
           |${probe("lineitem", "l_orderkey", "orders", "o_orderkey")}
           |UNION ALL
           |${probe("lineitem", "l_suppkey", "supplier", "s_suppkey")}
           |UNION ALL
           |${probe("orders", "o_custkey", "customer", "c_custkey")}
           |UNION ALL
           |${probe("orders", "o_orderkey", "customer", "c_custkey")})
           |ORDER BY child, parent""".stripMargin
      }
    ),

    // Schema evolution across snapshot files: a v1 writer (no discount
    // column) and a v2 writer (adds it) land files in the SAME table
    // directory; `mergeSchema` reconciles the footers and v1 rows surface
    // the new column as NULL — the append-only column-add path every
    // long-lived warehouse table walks. The audit reports the merged
    // field list and per-column presence counts; the oracle re-derives
    // them from the writer rules, so a reader that dropped v1 rows (or
    // defaulted instead of NULLing) breaks the counts.
    QueryDef(
      "q294_schema_evolution",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_evo").toString
        val o = t(s, dir, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)").as("price"))
          .write.mode("overwrite").parquet(tmp)
        o.filter(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)").as("price"),
            lit(42L).as("discount_cents"))
          .write.mode("append").parquet(tmp)
        val merged = s.read.option("mergeSchema", "true").parquet(tmp)
        merged.agg(
            count(lit(1)).cast("long").as("n_rows"),
            count(col("price")).cast("long").as("n_with_price"),
            count(col("discount_cents")).cast("long").as("n_with_discount"))
          .withColumn("merged_schema",
            lit(merged.schema.fieldNames.sorted.mkString(",")))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_with_price,
             |  CAST(sum(CASE WHEN o_orderkey % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_discount,
             |  'discount_cents,o_orderkey,price' AS merged_schema
             |FROM orders""".stripMargin)
    ),

    // Plan-shape audit UNDER THE DRIVER GATE: the executed plan of a
    // pinned pipeline (fact scan ⋈ broadcast dim → one aggregate)
    // summarized as feature counts — hash exchanges, broadcast joins,
    // parquet scans, cartesian absence — and compared against the
    // hand-derived VALUES truth. The OperatorsSpec plan gates protect
    // these shapes in CI; this row makes a representative one visible to
    // the round's correctness report, so a Spark upgrade or conf drift
    // that silently adds an exchange fails the ROUND, not just the local
    // suite. (Counts are features of the plan, not timings — stable for
    // a pinned Spark version and conf.)
    QueryDef(
      "q295_plan_audit",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val dim = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"))
        val pipe = li.join(broadcast(dim), "l_orderkey")
          .groupBy("l_returnflag")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
        val plan = pipe.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(plan).size.toLong
        Seq((
          n("Exchange hashpartitioning"),
          n("BroadcastHashJoin"),
          n("Scan parquet|FileScan parquet"),
          if (plan.contains("CartesianProduct")) 1L else 0L
        )).toDF("n_hash_exchanges", "n_broadcast_joins", "n_parquet_scans",
          "has_cartesian")
      },
      Some("""SELECT CAST(1 AS BIGINT) AS n_hash_exchanges,
             |  CAST(1 AS BIGINT) AS n_broadcast_joins,
             |  CAST(2 AS BIGINT) AS n_parquet_scans,
             |  CAST(0 AS BIGINT) AS has_cartesian""".stripMargin)
    ),

    // Market-basket lift: parts co-purchased within an order, scored by
    // lift = co·N / (c_A·c_B) at ×1000 fixed point, top-3 partners per
    // part — the recommender-side co-occurrence twin of the text
    // collocations (q147). The in-order pair blast is bounded by basket
    // size (≤ C(7,2) per order), the support floor (co ≥ 2) kills noise
    // pairs before the rank window, and N rides a 1-row broadcast.
    QueryDef(
      "q296_market_basket",
      (s, dir) => {
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct().localCheckpoint()
        val n = items.select(countDistinct("ok").as("n_orders"))
        val co = items.as("a").join(items.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
          .agg(count(lit(1)).as("co"))
          .filter(col("co") >= 2)
        val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("pa")
          .orderBy(col("co").desc, col("lift_fp").desc, col("pb"))
        co.join(cnt.select(col("pk").as("pa"), col("c").as("ca")), Seq("pa"))
          .join(cnt.select(col("pk").as("pb"), col("c").as("cb")), Seq("pb"))
          .crossJoin(broadcast(n))
          .withColumn("lift_fp",
            expr("co * n_orders * 1000 div (ca * cb)"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("pa"), col("pb"), col("co").cast("long"),
            col("lift_fp").cast("long"), col("rank").cast("int"))
          .orderBy("pa", "rank")
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
             |co AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS co
             |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |cnt AS (SELECT pk, count(*) AS c FROM items GROUP BY 1),
             |sc AS (SELECT pa, pb, co, co * n_orders * 1000 // (ca.c * cb.c) AS lift_fp
             |  FROM co JOIN cnt ca ON ca.pk = co.pa JOIN cnt cb ON cb.pk = co.pb, n),
             |r AS (SELECT pa, pb, co, lift_fp,
             |    row_number() OVER (PARTITION BY pa ORDER BY co DESC, lift_fp DESC, pb) AS rank
             |  FROM sc)
             |SELECT pa, pb, CAST(co AS BIGINT) AS co, CAST(lift_fp AS BIGINT) AS lift_fp,
             |  CAST(rank AS INT) AS rank
             |FROM r WHERE rank <= 3 ORDER BY pa, rank""".stripMargin)
    ),

    // Session path mining: 30-min-gap sessionization (running sum of
    // gap flags — the q24 semantics) then event-type trigrams WITHIN a
    // session, global top-20 paths — the "how do users actually move"
    // table. One keyed window builds sessions and leads in the same
    // sort; the trigram rollup is a keyed aggregate; only the top-20
    // rank is global (20 rows).
    QueryDef(
      "q297_path_mining",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")
        val e = eventsUs(s, dir)
          .withColumn("gap",
            when(col("ts_us") - lag("ts_us", 1).over(w) > 1800000000L, 1L)
              .otherwise(lit(0L)))
          .withColumn("session",
            sum(when(lag("ts_us", 1).over(w).isNull, 1L).otherwise(col("gap"))).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("user_id").orderBy("ts_us", "event_id")
                .rowsBetween(
                  org.apache.spark.sql.expressions.Window.unboundedPreceding,
                  org.apache.spark.sql.expressions.Window.currentRow)))
        val sw = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "session").orderBy("ts_us", "event_id")
        val paths = e
          .withColumn("s1", lead("event_type", 1).over(sw))
          .withColumn("s2", lead("event_type", 2).over(sw))
          .filter(col("s1").isNotNull && col("s2").isNotNull)
          .select(concat_ws(">", col("event_type"), col("s1"), col("s2")).as("path"))
          .groupBy("path").agg(count(lit(1)).cast("long").as("n"))
        paths.withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("path"))))
          .filter(col("rank") <= 20)
          .select(col("rank").cast("int"), col("path"), col("n"))
          .orderBy("rank")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    CAST(epoch_us(ts) AS BIGINT) AS u FROM events),
             |g AS (SELECT *, CASE WHEN u - lag(u) OVER w > 1800000000 THEN 1
             |    WHEN lag(u) OVER w IS NULL THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id)),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY u, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
             |  FROM g),
             |p AS (SELECT event_type || '>' || lead(event_type, 1) OVER sw
             |    || '>' || lead(event_type, 2) OVER sw AS path
             |  FROM s WINDOW sw AS (PARTITION BY user_id, session ORDER BY u, event_id)),
             |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p
             |  WHERE path IS NOT NULL GROUP BY 1),
             |r AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank FROM c)
             |SELECT CAST(rank AS INT) AS rank, path, n FROM r
             |WHERE rank <= 20 ORDER BY rank""".stripMargin)
    ),

    // RFM segmentation: per-user recency / frequency / monetary quintiles
    // (ntile(5), deterministic user_id tie-break; recency tile inverted so
    // 5 always means "best"), rolled up per segment — the classic
    // customer-base census, all integer. The anchor "now" is the corpus
    // max timestamp (a 1-row window aggregate), so the query is
    // reproducible rather than wall-clock-dependent.
    QueryDef(
      "q298_rfm",
      (s, dir) => {
        val perUser = eventsUs(s, dir).groupBy("user_id")
          .agg(max("ts_us").as("last_us"),
            count(lit(1)).cast("long").as("freq"),
            sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("spend_cents"))
          .withColumn("recency_days",
            expr("(max(last_us) over () - last_us) div 86400000000"))
        def tile(c: String, asc: Boolean) = ntile(5).over(
          org.apache.spark.sql.expressions.Window.orderBy(
            (if (asc) col(c).asc else col(c).desc), col("user_id")))
        val scored = perUser
          .withColumn("r_score", (lit(6) - tile("recency_days", asc = true)).cast("int"))
          .withColumn("f_score", tile("freq", asc = true).cast("int"))
          .withColumn("m_score", tile("spend_cents", asc = true).cast("int"))
        scored.groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("spend_cents").as("segment_cents"))
          .orderBy("r_score", "f_score", "m_score")
      },
      Some("""WITH u AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
             |    CAST(count(*) AS BIGINT) AS freq,
             |    sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spend_cents
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, (max(last_us) OVER () - last_us) // 86400000000 AS recency_days
             |  FROM u),
             |sc AS (SELECT user_id, spend_cents,
             |    6 - ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
             |    ntile(5) OVER (ORDER BY freq ASC, user_id) AS f_score,
             |    ntile(5) OVER (ORDER BY spend_cents ASC, user_id) AS m_score
             |  FROM r)
             |SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
             |  CAST(m_score AS INT) AS m_score,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(spend_cents) AS BIGINT) AS segment_cents
             |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),

    // Cohort LTV curve: users cohorted by first-active day, cumulative
    // spend per cohort-age divided by cohort size at ×1000 fixed point —
    // the monetary twin of the q155 retention table. One user rollup
    // fixes cohorts, one keyed (cohort, age) aggregate, one per-cohort
    // running-sum window; cohort sizes join back keyed.
    QueryDef(
      "q299_cohort_ltv",
      (s, dir) => {
        val e = eventsUs(s, dir)
          .withColumn("day", expr("ts_us div 86400000000"))
          .withColumn("cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))
        val firstDay = e.groupBy("user_id").agg(min("day").as("cohort_day"))
        val sizes = firstDay.groupBy("cohort_day")
          .agg(countDistinct("user_id").as("cohort_users"))
        val byAge = e.join(firstDay, Seq("user_id"))
          .withColumn("age", col("day") - col("cohort_day"))
          .groupBy("cohort_day", "age")
          .agg(sum("cents").as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cohort_day").orderBy("age")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        byAge.withColumn("cum_cents", sum("cents").over(w))
          .join(sizes, Seq("cohort_day"))
          .select(col("cohort_day"), col("age"),
            col("cum_cents").cast("long"),
            col("cohort_users"),
            expr("CAST(cum_cents * 1000 div cohort_users AS BIGINT)").as("ltv_fp"))
          .orderBy("cohort_day", "age")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
             |sz AS (SELECT cohort_day, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_users
             |  FROM f GROUP BY 1),
             |a AS (SELECT f.cohort_day, e.day - f.cohort_day AS age, sum(e.cents) AS cents
             |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
             |c AS (SELECT cohort_day, age,
             |    sum(cents) OVER (PARTITION BY cohort_day ORDER BY age
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
             |  FROM a)
             |SELECT c.cohort_day, c.age, CAST(c.cum_cents AS BIGINT) AS cum_cents,
             |  sz.cohort_users,
             |  CAST(c.cum_cents * 1000 // sz.cohort_users AS BIGINT) AS ltv_fp
             |FROM c JOIN sz USING (cohort_day)
             |ORDER BY cohort_day, age""".stripMargin)
    ),

    // The 300th gate: a corpus RELEASE MANIFEST — the whole curation
    // pipeline (exact dedup → quality gate → benchmark decontamination →
    // md5 three-way split → token budget) run end-to-end, with every
    // stage emitting (docs, tokens, order-independent id-checksum) into
    // ONE table the oracle replays stage-for-stage. The checksum column
    // is what makes this a release CONTRACT rather than a dashboard: a
    // single doc surviving a stage it shouldn't (or vanishing from one
    // it shouldn't) moves the checksum even when the counts happen to
    // collide. Every stage is a keyed shuffle or anti-join on hashes —
    // texts never shuffle; at 100 TB the manifest costs one corpus scan
    // plus hash-keyed metadata passes.
    QueryDef(
      "q300_release_manifest",
      (s, dir) =>
        Pipelines.releaseManifest(t(s, dir, "documents"), "doc_id", "text",
            minChars = 200, minWords = 30, evalMod = 97)
          .orderBy("stage"),
      Some("""WITH d AS (SELECT doc_id, n_chars,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS toks,
             |    md5(text) AS h,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ck
             |  FROM documents),
             |dd AS (SELECT * FROM (SELECT *,
             |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM d)
             |  WHERE rn = 1),
             |q AS (SELECT * FROM dd WHERE n_chars >= 200 AND toks >= 30),
             |ev AS (SELECT DISTINCT h FROM d WHERE doc_id % 97 = 0),
             |dc AS (SELECT q.* FROM q WHERE doc_id % 97 <> 0
             |  AND NOT EXISTS (SELECT 1 FROM ev WHERE ev.h = q.h)),
             |sp AS (SELECT *, CASE
             |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
             |      THEN 'split:train'
             |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90
             |      THEN 'split:val' ELSE 'split:test' END AS stage
             |  FROM dc)
             |SELECT * FROM (
             |  SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(COALESCE(sum(toks), 0) AS BIGINT) AS n_tokens,
             |    CAST(COALESCE(sum(ck), 0) AS BIGINT) AS id_checksum FROM d
             |  UNION ALL SELECT '2_dedup', CAST(count(*) AS BIGINT),
             |    CAST(COALESCE(sum(toks), 0) AS BIGINT), CAST(COALESCE(sum(ck), 0) AS BIGINT) FROM dd
             |  UNION ALL SELECT '3_quality', CAST(count(*) AS BIGINT),
             |    CAST(COALESCE(sum(toks), 0) AS BIGINT), CAST(COALESCE(sum(ck), 0) AS BIGINT) FROM q
             |  UNION ALL SELECT '4_decontam', CAST(count(*) AS BIGINT),
             |    CAST(COALESCE(sum(toks), 0) AS BIGINT), CAST(COALESCE(sum(ck), 0) AS BIGINT) FROM dc
             |  UNION ALL SELECT stage, CAST(count(*) AS BIGINT),
             |    CAST(sum(toks) AS BIGINT), CAST(sum(ck) AS BIGINT) FROM sp GROUP BY stage)
             |ORDER BY stage""".stripMargin)
    ),

    // Bucketed co-located join under the driver gate: both sides snapshot
    // as 8-bucket tables on the join key, and the join plans with ZERO
    // hash exchanges — the q145 zero-Exchange result as a VALUES-checked
    // row (the only Exchange left is the final 1-row aggregate's
    // SinglePartition, deliberately not counted). n_rows ties the plan
    // claim to real semantics: the bucketed join must still produce
    // exactly the plain join's row count the oracle computes. At 100 TB
    // this is THE diff-engine layout story: snapshot once bucketed, every
    // subsequent diff/join skips its shuffle entirely.
    QueryDef(
      "q301_bucketed_join_plan",
      (s, dir) => {
        import s.implicits._
        s.sql("DROP TABLE IF EXISTS graft_q301_li")
        s.sql("DROP TABLE IF EXISTS graft_q301_ord")
        // a FRESH session's in-memory catalog has forgotten these tables,
        // but the warehouse DIRECTORY survives the process — saveAsTable
        // then refuses the "new" name over the orphaned location, so the
        // physical paths must go too (found by the round's own re-run)
        val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
        val whFs = wh.getFileSystem(s.sessionState.newHadoopConf())
        Seq("graft_q301_li", "graft_q301_ord")
          .foreach(n => whFs.delete(new org.apache.hadoop.fs.Path(wh, n), true))
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_q301_li")
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_q301_ord")
        val joined = s.table("graft_q301_li")
          .join(s.table("graft_q301_ord"), "l_orderkey")
          .filter(col("o_orderpriority") === "1-URGENT")
        val plan = joined.groupBy().count().queryExecution.executedPlan.toString
        val nHash = "Exchange hashpartitioning".r.findAllIn(plan).size.toLong
        val nRows = joined.count()
        Seq((nHash, nRows)).toDF("n_hash_exchanges", "n_rows")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS n_hash_exchanges,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
    ),

    // PII span-conflict resolution: two detectors emit overlapping spans
    // with priorities (the card detector outranks the generic number
    // detector); a lower-priority span is suppressed when ANY
    // higher-priority span overlaps it [s1 < e2 ∧ s2 < e1). The overlap
    // probe is a per-document self-join — bounded by spans-per-doc,
    // never corpus² — and the census counts survivors, suppressions and
    // surviving covered chars per detector. Span geometry synthesizes
    // deterministically from doc_id so the oracle replays it exactly.
    QueryDef(
      "q302_span_resolve",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        val a = d.withColumn("k", explode(array(lit(0), lit(1), lit(2))))
          .select(col("doc_id"), lit("card").as("det"), lit(2).as("prio"),
            (col("doc_id") % 7 + col("k") * 10).as("s"),
            (col("doc_id") % 7 + col("k") * 10 + 8).as("e"))
        val b = d.withColumn("k", explode(array(lit(0), lit(1), lit(2), lit(3))))
          .select(col("doc_id"), lit("num").as("det"), lit(1).as("prio"),
            (col("doc_id") % 11 % 10 + col("k") * 8).as("s"),
            (col("doc_id") % 11 % 10 + col("k") * 8 + 5).as("e"))
        val spans = a.unionByName(b).localCheckpoint()
        val flagged = spans.as("x").join(spans.as("h"),
            col("x.doc_id") === col("h.doc_id") &&
              col("h.prio") > col("x.prio") &&
              col("x.s") < col("h.e") && col("h.s") < col("x.e"),
            "left_outer")
          .groupBy(col("x.doc_id"), col("x.det"), col("x.s"), col("x.e"))
          .agg(max(when(col("h.prio").isNotNull, 1L).otherwise(0L)).as("suppressed"))
          .select(col("det"), col("s"), col("e"), col("suppressed"))
        flagged.groupBy("det")
          .agg(count(lit(1)).cast("long").as("n_spans"),
            sum(when(col("suppressed") === 0L, 1L).otherwise(0L)).as("n_survivors"),
            sum(col("suppressed")).as("n_suppressed"),
            sum(when(col("suppressed") === 0L, col("e") - col("s")).otherwise(0L))
              .cast("long").as("covered_chars"))
          .orderBy("det")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |a AS (SELECT doc_id, 'card' AS det, 2 AS prio,
             |    doc_id % 7 + k * 10 AS s, doc_id % 7 + k * 10 + 8 AS e
             |  FROM d, (SELECT unnest(range(3)) AS k)),
             |b AS (SELECT doc_id, 'num' AS det, 1 AS prio,
             |    doc_id % 11 % 10 + k * 8 AS s, doc_id % 11 % 10 + k * 8 + 5 AS e
             |  FROM d, (SELECT unnest(range(4)) AS k)),
             |sp AS (SELECT * FROM a UNION ALL SELECT * FROM b),
             |f AS (SELECT sp.doc_id, sp.det, sp.s, sp.e,
             |    max(CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END) AS suppressed
             |  FROM sp LEFT JOIN sp h ON h.doc_id = sp.doc_id
             |    AND h.prio > sp.prio AND sp.s < h.e AND h.s < sp.e
             |  GROUP BY 1, 2, 3, 4)
             |SELECT det, CAST(count(*) AS BIGINT) AS n_spans,
             |  CAST(sum(CASE WHEN suppressed = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
             |  CAST(sum(suppressed) AS BIGINT) AS n_suppressed,
             |  CAST(sum(CASE WHEN suppressed = 0 THEN e - s ELSE 0 END) AS BIGINT) AS covered_chars
             |FROM f GROUP BY det ORDER BY det""".stripMargin)
    ),

    // Reorder-invariant duplicate candidates: docs sharing the md5 of
    // their SORTED DISTINCT token set — the blocking lens for shuffled /
    // re-templated reposts, which exact content hash (q30) misses on any
    // reordering and which repetition differences hide from the bag
    // (multiset) hash. Vocabulary-as-identity is deliberately coarse:
    // it's a CANDIDATE generator feeding the exact verifiers (q34
    // Jaccard, q257 prefix-filter), reported with its lang/source spread.
    // One map-side sort-within-row + one hash-keyed group; bodies never
    // shuffle — at 100 TB the fingerprint column is the only wide thing
    // in flight, and it's 32 hex chars.
    QueryDef(
      "q303_tokenset_dups",
      (s, dir) => {
        val fp = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            md5(expr("array_join(array_sort(array_distinct(" +
              "filter(split(text, '\\\\s+'), x -> x <> ''))), ' ')")).as("fingerprint"))
        fp.groupBy("fingerprint")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            countDistinct("lang").as("n_langs"),
            countDistinct("source").as("n_sources"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy("fingerprint")
      },
      Some("""WITH fp AS (SELECT doc_id, lang, source,
             |    md5(array_to_string(list_sort(list_distinct(
             |      list_filter(string_split_regex(text, '\s+'), x -> x <> ''))), ' ')) AS fingerprint
             |  FROM documents)
             |SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
             |FROM fp GROUP BY fingerprint HAVING count(*) >= 2
             |ORDER BY fingerprint""".stripMargin)
    ),

    // Split-conformal regression certificate: the q272 linear model made
    // honest. Fit on the train half (even order keys), take the
    // ceil((n+1)·0.9)-th smallest absolute residual on the calibration
    // half as q̂ — the distribution-free 90% prediction-interval radius —
    // then MEASURE the coverage that interval actually achieves on the
    // held-out test rows. Everything (fit by integer Cramer, residuals,
    // the rank that picks q̂, coverage basis points) is exact integer
    // algebra, so the coverage number is a certified property of the
    // data + model, not a float artifact. One aggregate fits, one window
    // ranks, one scan measures.
    QueryDef(
      "q304_conformal",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          (col("l_orderkey") % 4).as("fold"), // 0,2 train; 1 cal; 3 test
          col("l_quantity").cast("decimal(18,2)").cast("long").as("x1"),
          (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("x2"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
          .localCheckpoint()
        val fit = Stats.ols2(
          li.filter(col("fold") % 2 === 0).withColumn("grp", lit("all")),
          "grp", "x1", "x2", "y", scale = 1000)
        // residual ×1000: r = |1000·y − (a + b1·x1 + b2·x2)|
        def withResid(d: DataFrame) = d.crossJoin(broadcast(fit))
          .withColumn("r", abs(col("y") * 1000L -
            (col("a_fp") + col("b1_fp") * col("x1") + col("b2_fp") * col("x2"))))
        val cal = withResid(li.filter(col("fold") === 1))
        val nCal = cal.count()
        val rank = ((nCal + 1) * 9 + 9) / 10 // ceil((n+1)·0.9)
        val qhat = cal.select(col("r"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("r"))))
          .filter(col("rn") === math.min(rank, nCal))
          .select(col("r").as("qhat"))
        val test = withResid(li.filter(col("fold") === 3))
          .crossJoin(broadcast(qhat))
        test.agg(
            count(lit(1)).cast("long").as("n_test"),
            max("qhat").as("qhat_fp"),
            sum(when(col("r") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
          .withColumn("n_cal", lit(nCal))
          .select(col("n_cal"), col("n_test"), col("qhat_fp").cast("long"),
            col("n_covered"),
            expr("n_covered * 10000 div n_test").as("coverage_bp"))
      },
      Some("""WITH li AS (SELECT l_orderkey % 4 AS fold,
             |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x1,
             |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
             |  FROM lineitem),
             |tr AS (SELECT * FROM li WHERE fold % 2 = 0),
             |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
             |    CAST(sum(y) AS HUGEINT) AS sy,
             |    CAST(sum(x1*x1) AS HUGEINT) AS sx1x1, CAST(sum(x2*x2) AS HUGEINT) AS sx2x2,
             |    CAST(sum(x1*x2) AS HUGEINT) AS sx1x2, CAST(sum(x1*y) AS HUGEINT) AS sx1y,
             |    CAST(sum(x2*y) AS HUGEINT) AS sx2y
             |  FROM tr),
             |m AS (SELECT n, sx1, sx2, sy,
             |    n*sx1x1 - sx1*sx1 AS s11, n*sx2x2 - sx2*sx2 AS s22,
             |    n*sx1x2 - sx1*sx2 AS s12, n*sx1y - sx1*sy AS s1y, n*sx2y - sx2*sy AS s2y
             |  FROM a),
             |f AS (SELECT ((s22*s1y - s12*s2y) * 1000) // (s11*s22 - s12*s12) AS b1,
             |    ((s11*s2y - s12*s1y) * 1000) // (s11*s22 - s12*s12) AS b2,
             |    n, sx1, sx2, sy, s11, s22, s12 FROM m),
             |ab AS (SELECT b1, b2,
             |    (sy * 1000 - b1 * sx1 - b2 * sx2) // n AS a0 FROM f),
             |cal AS (SELECT abs(y * 1000 - (a0 + b1 * x1 + b2 * x2)) AS r
             |  FROM li, ab WHERE fold = 1),
             |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
             |qh AS (SELECT r AS qhat FROM (SELECT r,
             |    row_number() OVER (ORDER BY r) AS rn FROM cal) rk, nc
             |  WHERE rn = least((n_cal + 1) * 9 // 10 + CASE WHEN (n_cal + 1) * 9 % 10 > 0 THEN 1 ELSE 0 END, n_cal)),
             |tst AS (SELECT abs(y * 1000 - (a0 + b1 * x1 + b2 * x2)) AS r
             |  FROM li, ab WHERE fold = 3)
             |SELECT nc.n_cal, CAST(count(*) AS BIGINT) AS n_test,
             |  CAST(max(qhat) AS BIGINT) AS qhat_fp,
             |  CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
             |  CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS coverage_bp
             |FROM tst, qh, nc GROUP BY nc.n_cal""".stripMargin)
    ),

    // Per-label embedding outliers by centroid distance — the "wrong
    // cluster / mislabeled vector" QA pass next to the norm audit (q96):
    // per-dimension label centroids (avg CAST TO REAL — the q74 float
    // trick that absorbs cross-engine summation-order differences), each
    // vector's squared L2 to its own centroid through the codegen'd
    // native expression, top-3 farthest per label. Centroids are
    // labels×dims tiny and broadcast; the scan stays map-side.
    QueryDef(
      "q305_embed_outliers",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, dir, "embeddings")
        val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "pos").agg(avg("v").cast("float").as("mv"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("ps"))
          .select(col("label"), expr("transform(ps, x -> x.mv)").as("centroid"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
          .orderBy(col("d2").desc, col("vec_id"))
        canonOut(e.join(broadcast(cent), Seq("label"))
          .select(col("label"), col("vec_id"),
            graft.functions.GraftFunctions.squaredL2(col("embedding"), col("centroid"))
              .as("d2"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("label"), col("vec_id"), col("rank").cast("int"),
            col("d2").cast("decimal(20,8)").as("dist_sq"))
          .orderBy("label", "rank"))
      },
      Some("""WITH px AS (SELECT label, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM embeddings, (SELECT unnest(range(64)) AS i) ix GROUP BY label, i),
             |c AS (SELECT label, list(mv ORDER BY i) AS centroid FROM px GROUP BY label),
             |d AS (SELECT e.label, e.vec_id,
             |    list_reduce(list_transform(range(64),
             |      i -> (e.embedding[i+1]::DOUBLE - c.centroid[i+1]::DOUBLE)
             |         * (e.embedding[i+1]::DOUBLE - c.centroid[i+1]::DOUBLE)),
             |      (x, y) -> x + y) AS d2
             |  FROM embeddings e JOIN c USING (label)),
             |r AS (SELECT label, vec_id, d2,
             |    row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rank
             |  FROM d)
             |SELECT label, vec_id, CAST(rank AS INT) AS rank,
             |  CAST(CAST(d2 AS DECIMAL(20,8)) AS VARCHAR) AS dist_sq
             |FROM r WHERE rank <= 3 ORDER BY label, rank""".stripMargin)
    ),

    // Model-DAG build scheduling (Graphs.topoLayers) — the reference's own
    // world made distributed: dbt models build in dependency waves, and
    // wave k is the set whose longest dependency chain is k. The synthetic
    // DAG chains docs within 16-blocks (i→i+1, plus i→i+2 shortcuts every
    // 5th), so the Kahn peeling Spark actually runs must land every model
    // at level = id mod 16 — the closed form the oracle checks, with a
    // per-wave census and an id checksum. Cycles would surface as level
    // −1 rows, never silently vanish.
    QueryDef(
      "q306_model_dag_waves",
      (s, dir) => {
        val ids = t(s, dir, "documents").select(col("doc_id").as("i"))
          .localCheckpoint()
        val chain = ids.filter(col("i") % 16 =!= 15)
          .select(col("i").as("a"), (col("i") + 1).as("b"))
        val short = ids.filter(col("i") % 16 <= 13 && col("i") % 5 === 0)
          .select(col("i").as("a"), (col("i") + 2).as("b"))
        val edges = chain.unionByName(short)
          .join(ids.select(col("i").as("b")), Seq("b"), "left_semi")
        Graphs.topoLayers(edges, "a", "b", maxIters = 32)
          .groupBy("level")
          .agg(count(lit(1)).cast("long").as("n_models"),
            min("node").as("first_model"), max("node").as("last_model"),
            sum("node").cast("long").as("id_sum"))
          .orderBy("level")
      },
      Some("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
             |-- a block base with no successor is an isolated node (no edges
             |-- at all) and therefore absent from the graph's node set
             |lv AS (SELECT doc_id AS i, doc_id % 16 AS level FROM documents, m
             |  WHERE NOT (doc_id % 16 = 0 AND doc_id = mx))
             |SELECT CAST(level AS INT) AS level,
             |  CAST(count(*) AS BIGINT) AS n_models,
             |  CAST(min(i) AS BIGINT) AS first_model,
             |  CAST(max(i) AS BIGINT) AS last_model,
             |  CAST(sum(i) AS BIGINT) AS id_sum
             |FROM lv GROUP BY level ORDER BY level""".stripMargin)
    ),

    // Pseudonymization with referential integrity: customer keys replaced
    // by salted-md5 surrogates in BOTH orders and customer, then the
    // certificate re-runs the join on the pseudonym — row count and
    // revenue must equal the original join exactly, and the surrogate
    // must be collision-free (distinct in == distinct out). The
    // release-side governance step after q284's k-anonymity: analytic
    // joins keep working on data that no longer carries the real key.
    QueryDef(
      "q307_pseudonymize",
      (s, dir) => {
        def pseudo(c: Column) =
          expr(s"substring(md5(concat('gsalt1:', CAST(${c.toString} AS STRING))), 1, 16)")
        val o = t(s, dir, "orders").select(col("o_custkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val before = o.join(c, o("o_custkey") === c("c_custkey"))
          .agg(count(lit(1)).cast("long").as("n_before"),
            sum("cents").as("rev_before"))
        val op = o.withColumn("p", pseudo(col("o_custkey"))).drop("o_custkey")
        val cp = c.withColumn("p", pseudo(col("c_custkey")))
        val after = op.join(cp.select("p"), "p")
          .agg(count(lit(1)).cast("long").as("n_after"),
            sum("cents").as("rev_after"))
        val card = c.agg(countDistinct("c_custkey").as("distinct_orig"))
          .crossJoin(cp.agg(countDistinct("p").as("distinct_pseudo")))
        before.crossJoin(after).crossJoin(card)
          .select(col("n_before"), col("n_after"),
            col("rev_before").cast("long"), col("rev_after").cast("long"),
            col("distinct_orig"), col("distinct_pseudo"),
            when(col("n_before") === col("n_after") &&
              col("rev_before") === col("rev_after") &&
              col("distinct_orig") === col("distinct_pseudo"), 1L)
              .otherwise(0L).as("intact"))
      },
      Some("""WITH o AS (SELECT o_custkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |b AS (SELECT CAST(count(*) AS BIGINT) AS n_before,
             |    CAST(sum(cents) AS BIGINT) AS rev_before
             |  FROM o JOIN customer ON o_custkey = c_custkey),
             |op AS (SELECT substr(md5('gsalt1:' || o_custkey), 1, 16) AS p, cents FROM o),
             |cp AS (SELECT substr(md5('gsalt1:' || c_custkey), 1, 16) AS p, c_custkey
             |  FROM customer),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_after,
             |    CAST(sum(cents) AS BIGINT) AS rev_after
             |  FROM op JOIN cp USING (p)),
             |k AS (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS distinct_orig,
             |    CAST(count(DISTINCT p) AS BIGINT) AS distinct_pseudo FROM cp)
             |SELECT n_before, n_after, rev_before, rev_after,
             |  distinct_orig, distinct_pseudo,
             |  CAST(CASE WHEN n_before = n_after AND rev_before = rev_after
             |    AND distinct_orig = distinct_pseudo THEN 1 ELSE 0 END AS BIGINT) AS intact
             |FROM b, a, k""".stripMargin)
    ),

    // MinHash-LSH parameter advisor: the S-curve p(s) = 1 − (1 − s^r)^b
    // evaluated for every (bands, rows) split of a 64-hash signature at
    // five Jaccard levels — entirely in ×10⁶ integer fixed point (each
    // power step is acc·s div 10⁶; both engines replay the identical
    // truncation chain, so no pow() ever runs). The `pick` flag marks
    // the split whose curve passes closest to p=0.5 at s=0.7 — the
    // threshold the suite's MinHash queries (q32, q122, q148) target.
    // Tuning the index becomes a certified query instead of a notebook.
    QueryDef(
      "q308_lsh_advisor",
      (s, dir) => {
        import s.implicits._
        val cands = Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32), (1, 64))
          .toDF("b", "r")
        val svals = Seq(500000L, 600000L, 700000L, 800000L, 900000L).toDF("s_fp")
        def foldPow(base: String, times: String) =
          s"aggregate(sequence(1, $times), CAST(1000000 AS BIGINT), (acc, i) -> acc * $base div 1000000)"
        val curve = cands.crossJoin(svals)
          .withColumn("sr", expr(foldPow("s_fp", "r")))
          .withColumn("p_fp", expr(
            s"1000000 - ${foldPow("(1000000 - sr)", "b")}"))
        val dev = curve.filter(col("s_fp") === 700000L)
          .select(col("b").as("pb"), col("r").as("pr"),
            abs(col("p_fp") - 500000L).as("dev"))
        val best = dev.orderBy(col("dev"), col("pb")).limit(1)
          .select(col("pb"), col("pr"), lit(1L).as("pick"))
        curve.join(best, col("b") === col("pb") && col("r") === col("pr"), "left_outer")
          .select(col("b").cast("int"), col("r").cast("int"), col("s_fp"),
            col("p_fp").cast("long"), coalesce(col("pick"), lit(0L)).as("pick"))
          .orderBy("b", "s_fp")
      },
      Some {
        def foldPow(base: String, times: String) =
          s"list_reduce(list_concat([CAST(1000000 AS BIGINT)], " +
            s"list_transform(range($times), i -> CAST($base AS BIGINT))), (a, x) -> a * x // 1000000)"
        s"""WITH cands(b, r) AS (VALUES (64, 1), (32, 2), (16, 4), (8, 8),
           |  (4, 16), (2, 32), (1, 64)),
           |sv(s_fp) AS (VALUES (500000), (600000), (700000), (800000), (900000)),
           |c AS (SELECT b, r, CAST(s_fp AS BIGINT) AS s_fp,
           |    ${foldPow("s_fp", "r")} AS sr
           |  FROM cands, sv),
           |p AS (SELECT b, r, s_fp,
           |    1000000 - ${foldPow("(1000000 - sr)", "b")} AS p_fp
           |  FROM c),
           |d AS (SELECT b AS pb, r AS pr, abs(p_fp - 500000) AS dev
           |  FROM p WHERE s_fp = 700000),
           |best AS (SELECT pb, pr, CAST(1 AS BIGINT) AS pick FROM d
           |  ORDER BY dev, pb LIMIT 1)
           |SELECT CAST(p.b AS INT) AS b, CAST(p.r AS INT) AS r, p.s_fp,
           |  CAST(p.p_fp AS BIGINT) AS p_fp,
           |  COALESCE(best.pick, 0) AS pick
           |FROM p LEFT JOIN best ON p.b = best.pb AND p.r = best.pr
           |ORDER BY b, s_fp""".stripMargin
      }
    ),

    // Persistent heavy hitters: tokens that stay frequent across MANY
    // corpus deciles (≥ threshold occurrences in ≥ 6 of 10 id-range
    // windows) — persistence separates structural vocabulary from bursty
    // spikes, the distinction a single global top-k (q81/q174) cannot
    // make. Two keyed aggregates; the per-window threshold bounds what
    // reaches the persistence rollup.
    QueryDef(
      "q309_persistent_hitters",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select((col("doc_id") % 10).as("w"),
            explode(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).as("tok"))
        val perWindow = toks.groupBy("w", "tok")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 20)
        perWindow.groupBy("tok")
          .agg(count(lit(1)).cast("long").as("windows_present"),
            sum("n").cast("long").as("total_n"),
            min("n").cast("long").as("min_n"), max("n").cast("long").as("max_n"))
          .filter(col("windows_present") >= 6)
          .orderBy("tok")
      },
      Some("""WITH toks AS (SELECT doc_id % 10 AS w, unnest(list_filter(
             |    string_split_regex(text, '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |pw AS (SELECT w, tok, count(*) AS n FROM toks GROUP BY 1, 2
             |  HAVING count(*) >= 20)
             |SELECT tok, CAST(count(*) AS BIGINT) AS windows_present,
             |  CAST(sum(n) AS BIGINT) AS total_n,
             |  CAST(min(n) AS BIGINT) AS min_n, CAST(max(n) AS BIGINT) AS max_n
             |FROM pw GROUP BY tok HAVING count(*) >= 6 ORDER BY tok""".stripMargin)
    ),

    // Compaction EXECUTED: q247 planned; this runs the plan against real
    // files and certifies the rewrite. A partitioned table is written
    // with ~10 small files per partition, the planner bins them (target
    // sized so each partition packs to ONE bin), the executor reads each
    // bin's file set and writes it back coalesced into the same
    // partition layout — and the certificate checks what a compaction
    // must preserve: every row (count equality), the partition column
    // (recovered from directory names), and the promised file count
    // (one per partition). The bin loop is DRIVER-side over plan rows —
    // metadata-sized by construction, the same contract as the CLI.
    QueryDef(
      "q310_compaction_execute",
      (s, dir) => {
        import s.implicits._
        import org.apache.hadoop.fs.Path
        val src = java.nio.file.Files.createTempDirectory("graft_cx_src").toString
        val out = java.nio.file.Files.createTempDirectory("graft_cx_out").toString
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").cast("long").as("qty"))
        li.repartition(10).write.mode("overwrite")
          .partitionBy("l_returnflag").parquet(src)
        val fs = new Path(src).getFileSystem(s.sessionState.newHadoopConf())
        def list(root: String): Seq[(String, String, Long)] = {
          val rootStr = fs.getFileStatus(new Path(root)).getPath.toString
          val buf = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
          val it = fs.listFiles(new Path(root), true)
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
              val part = st.getPath.getParent.toString
                .stripPrefix(rootStr).stripPrefix("/")
              buf += ((part, st.getPath.getName, st.getLen))
            }
          }
          buf.toSeq
        }
        val files = list(src).toDF("part", "file_name", "bytes")
        val plan = Layout.compactionPlan(files, "part", "file_name", "bytes",
          smallThreshold = Long.MaxValue / 4, targetSize = Long.MaxValue / 4)
        val binRows = plan.select("part", "bin_id", "file_name").collect()
        binRows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
          case ((part, _), rows) =>
            val paths = rows.map(r => s"$src/$part/${r.getString(2)}")
            s.read.parquet(paths.toIndexedSeq: _*).coalesce(1)
              .write.mode("append").parquet(s"$out/$part")
        }
        val after = s.read.parquet(out)
        val rowsBefore = li.count()
        val rowsAfter = after.count()
        val partsAfter = after.select("l_returnflag").distinct().count()
        val filesAfter = list(out).size.toLong
        val binsPlanned = binRows.map(r => (r.getString(0), r.getLong(1))).distinct.length.toLong
        // everything above is computed eagerly (counts/collects), so the
        // temp table dirs can go now — at rehearsal scale each run would
        // otherwise strand 2x the replicated lineitem in /tmp
        fs.delete(new Path(src), true)
        fs.delete(new Path(out), true)
        Seq((rowsBefore, rowsAfter, partsAfter, binsPlanned, filesAfter,
          if (rowsBefore == rowsAfter && filesAfter == binsPlanned) 1L else 0L))
          .toDF("rows_before", "rows_after", "n_partitions", "bins_planned",
            "files_after", "compaction_ok")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS rows_before,
             |  CAST(count(*) AS BIGINT) AS rows_after,
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_partitions,
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS bins_planned,
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS files_after,
             |  CAST(1 AS BIGINT) AS compaction_ok
             |FROM lineitem""".stripMargin)
    ),

    // Join-order advisor with its homework shown: the two cross-join-free
    // orders of the lineitem–orders–customer(BUILDING) chain, each scored
    // by the CBO estimate |A⋈B| = |A|·|B| div max(ndv_A, ndv_B) (q233's
    // formula) on its INTERMEDIATE, then certified against the exact
    // intermediate the estimate stands in for. Starting from the filtered
    // dim wins by ~5× here — the textbook selective-side-first result,
    // now a checked row instead of folklore. NDVs are exact counts
    // (metadata-sized); at 100 TB they come from the footer/HLL layer the
    // suite already certifies (q258, q120).
    QueryDef(
      "q311_join_order_advisor",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select(col("l_orderkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val c = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        // ALL ten statistics in ONE action (r18): the per-stat count()
        // calls were ten sequential driver jobs; the fused scalar plan
        // (the oracle's own shape) lets AQE run the independent
        // aggregates' stages concurrently. Values unchanged — and the
        // est arithmetic stays Scala-side, truncating exactly as before.
        val statsRow = li
          .agg(count(lit(1)).as("nli"), countDistinct("l_orderkey").as("dli"))
          .crossJoin(o.agg(count(lit(1)).as("no"),
            countDistinct("o_orderkey").as("dok"),
            countDistinct("o_custkey").as("dock")))
          .crossJoin(c.agg(count(lit(1)).as("nc"),
            countDistinct("c_custkey").as("dc")))
          .crossJoin(li.join(o, li("l_orderkey") === o("o_orderkey"))
            .agg(count(lit(1)).as("xa")))
          .crossJoin(o.join(c, o("o_custkey") === c("c_custkey"))
            .agg(count(lit(1)).as("xb")))
          .crossJoin(li.join(o, li("l_orderkey") === o("o_orderkey"))
            .join(c, o("o_custkey") === c("c_custkey"))
            .agg(count(lit(1)).as("fin")))
          .head()
        val Seq(nLi, dLi, nO, dOk, dOck, nC, dC, exactA, exactB, finalRows) =
          (0 until 10).map(statsRow.getLong)
        // plan A: (li ⋈ o) first, then ⋈ c
        val estA = nLi * nO / math.max(dLi, dOk)
        // plan B: (o ⋈ c) first, then ⋈ li
        val estB = nO * nC / math.max(dOck, dC)
        Seq(
          ("A_fact_first", estA, exactA, finalRows, if (estA <= estB) 1L else 0L),
          ("B_dim_first", estB, exactB, finalRows, if (estB < estA) 1L else 0L))
          .toDF("plan", "est_intermediate", "exact_intermediate",
            "final_rows", "picked")
          .orderBy("plan")
      },
      Some("""WITH li AS (SELECT l_orderkey FROM lineitem),
             |o AS (SELECT o_orderkey, o_custkey FROM orders),
             |c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             |s AS (SELECT (SELECT count(*) FROM li) AS nli,
             |  (SELECT count(*) FROM o) AS no_, (SELECT count(*) FROM c) AS nc,
             |  (SELECT count(DISTINCT l_orderkey) FROM li) AS dli,
             |  (SELECT count(DISTINCT o_orderkey) FROM o) AS dok,
             |  (SELECT count(DISTINCT o_custkey) FROM o) AS dock,
             |  (SELECT count(DISTINCT c_custkey) FROM c) AS dc,
             |  (SELECT count(*) FROM li JOIN o ON l_orderkey = o_orderkey) AS xa,
             |  (SELECT count(*) FROM o JOIN c ON o_custkey = c_custkey) AS xb,
             |  (SELECT count(*) FROM li JOIN o ON l_orderkey = o_orderkey
             |     JOIN c ON o_custkey = c_custkey) AS fin)
             |SELECT * FROM (
             |  SELECT 'A_fact_first' AS plan,
             |    CAST(nli * no_ // greatest(dli, dok) AS BIGINT) AS est_intermediate,
             |    CAST(xa AS BIGINT) AS exact_intermediate,
             |    CAST(fin AS BIGINT) AS final_rows,
             |    CAST(CASE WHEN nli * no_ // greatest(dli, dok)
             |      <= no_ * nc // greatest(dock, dc) THEN 1 ELSE 0 END AS BIGINT) AS picked
             |  FROM s
             |  UNION ALL
             |  SELECT 'B_dim_first',
             |    CAST(no_ * nc // greatest(dock, dc) AS BIGINT),
             |    CAST(xb AS BIGINT), CAST(fin AS BIGINT),
             |    CAST(CASE WHEN no_ * nc // greatest(dock, dc)
             |      < nli * no_ // greatest(dli, dok) THEN 1 ELSE 0 END AS BIGINT)
             |  FROM s)
             |ORDER BY plan""".stripMargin)
    ),

    // Snapshot retention policy simulator: GFS-style "keep 7 daily, 4
    // weekly, 12 monthly" evaluated over the order-date calendar in pure
    // epoch-day arithmetic (weekly = newest day of each 7-day bucket,
    // monthly = newest of each 30-day bucket, all relative to the corpus
    // max). Output is the KEEP plan — snapshot GC becomes a reviewable
    // query result the existing SnapshotStore cleanup can consume, not
    // an opaque script.
    QueryDef(
      "q312_retention_policy",
      (s, dir) => {
        val days = t(s, dir, "orders")
          .select(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"))
          .distinct().localCheckpoint()
        val mx = days.agg(max("day").as("mxd"))
        val flagged = days.crossJoin(broadcast(mx))
          .withColumn("keep_daily", (col("day") > col("mxd") - 7).cast("long"))
          .withColumn("wk", expr("(mxd - day) div 7"))
          .withColumn("mo", expr("(mxd - day) div 30"))
        val wkKeep = flagged.filter(col("wk") < 4)
          .groupBy("wk").agg(max("day").as("day"))
          .select(col("day"), lit(1L).as("keep_weekly"))
        val moKeep = flagged.filter(col("mo") < 12)
          .groupBy("mo").agg(max("day").as("day"))
          .select(col("day"), lit(1L).as("keep_monthly"))
        flagged.join(wkKeep, Seq("day"), "left_outer")
          .join(moKeep, Seq("day"), "left_outer")
          .select(col("day"), col("keep_daily"),
            coalesce(col("keep_weekly"), lit(0L)).as("keep_weekly"),
            coalesce(col("keep_monthly"), lit(0L)).as("keep_monthly"))
          .filter(col("keep_daily") + col("keep_weekly") + col("keep_monthly") > 0)
          .orderBy("day")
      },
      Some("""WITH d AS (SELECT DISTINCT CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day
             |  FROM orders),
             |m AS (SELECT max(day) AS mxd FROM d),
             |f AS (SELECT day, CASE WHEN day > mxd - 7 THEN 1 ELSE 0 END AS keep_daily,
             |    (mxd - day) // 7 AS wk, (mxd - day) // 30 AS mo
             |  FROM d, m),
             |w AS (SELECT max(day) AS day, 1 AS keep_weekly FROM f WHERE wk < 4 GROUP BY wk),
             |mo AS (SELECT max(day) AS day, 1 AS keep_monthly FROM f WHERE mo < 12 GROUP BY mo)
             |SELECT f.day, CAST(f.keep_daily AS BIGINT) AS keep_daily,
             |  CAST(COALESCE(w.keep_weekly, 0) AS BIGINT) AS keep_weekly,
             |  CAST(COALESCE(mo.keep_monthly, 0) AS BIGINT) AS keep_monthly
             |FROM f LEFT JOIN w ON f.day = w.day LEFT JOIN mo ON f.day = mo.day
             |WHERE f.keep_daily + COALESCE(w.keep_weekly, 0) + COALESCE(mo.keep_monthly, 0) > 0
             |ORDER BY f.day""".stripMargin)
    ),

    // WebDataset-style shard export manifest: documents assigned to
    // ~5000-token shards by the distributed two-phase prefix sum
    // (Packing.packByTokenBudget — no single-task global sort at any
    // scale), docs never split across shards (assignment is by first
    // token's offset; shards tolerate the overflow of their last doc).
    // The manifest row per shard — doc count, token total, id range — is
    // what a training-data exporter publishes next to the tar files; the
    // q300 release manifest says WHAT ships, this says WHERE each doc
    // physically lands.
    QueryDef(
      "q313_shard_manifest",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            expr("size(filter(split(text, '\\\\s+'), x -> x <> ''))")
              .cast("long").as("toks"))
        Packing.packByTokenBudget(d, "doc_id", "toks", budget = 5000L)
          .groupBy(col("bin_id").as("shard"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("toks").cast("long").as("tokens"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("shard")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS toks
             |  FROM documents),
             |c AS (SELECT doc_id, toks,
             |    sum(toks) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS strt
             |  FROM d)
             |SELECT CAST(strt // 5000 AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM c GROUP BY 1 ORDER BY shard""".stripMargin)
    ),

    // Semi-structured ingest contract: declarative rules over the props
    // JSON blob (required key, integer-typed, in business range, policy
    // rule) evaluated in ONE scan with per-rule violation census and the
    // earliest offending event as the debugging handle — the
    // DataQuality.audit (q169) idea extended to the schemaless column
    // every event pipeline carries.
    QueryDef(
      "q314_props_contract",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_id"),
          get_json_object(col("props"), "$.k").as("kstr"))
          .withColumn("k", col("kstr").cast("long"))
        val rules = Seq(
          ("r1_has_k", col("kstr").isNull),
          ("r2_k_is_int", col("kstr").isNotNull && col("k").isNull),
          ("r3_k_in_0_89", col("k").isNotNull && (col("k") < 0 || col("k") > 89)),
          ("r4_k_even", col("k").isNotNull && col("k") % 2 =!= 0))
        rules.map { case (name, violated) =>
          e.agg(count(lit(1)).cast("long").as("n_checked"),
            sum(when(violated, 1L).otherwise(0L)).as("n_violations"),
            min(when(violated, col("event_id"))).as("first_bad_event"))
            .select(lit(name).as("rule"), col("n_checked"),
              col("n_violations"), col("first_bad_event"))
        }.reduce(_ unionByName _).orderBy("rule")
      },
      Some("""WITH e AS (SELECT event_id,
             |    json_extract_string(props, '$.k') AS kstr,
             |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events)
             |SELECT * FROM (
             |  SELECT 'r1_has_k' AS rule, CAST(count(*) AS BIGINT) AS n_checked,
             |    CAST(sum(CASE WHEN kstr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             |    min(CASE WHEN kstr IS NULL THEN event_id END) AS first_bad_event FROM e
             |  UNION ALL
             |  SELECT 'r2_k_is_int', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN kstr IS NOT NULL AND k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    min(CASE WHEN kstr IS NOT NULL AND k IS NULL THEN event_id END) FROM e
             |  UNION ALL
             |  SELECT 'r3_k_in_0_89', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN k IS NOT NULL AND (k < 0 OR k > 89) THEN 1 ELSE 0 END) AS BIGINT),
             |    min(CASE WHEN k IS NOT NULL AND (k < 0 OR k > 89) THEN event_id END) FROM e
             |  UNION ALL
             |  SELECT 'r4_k_even', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN k IS NOT NULL AND k % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT),
             |    min(CASE WHEN k IS NOT NULL AND k % 2 <> 0 THEN event_id END) FROM e)
             |ORDER BY rule""".stripMargin)
    ),

    // Monotonicity audit — the calibration sanity check on ranked
    // buckets: spend deciles (q292's ntile) SHOULD carry monotonically
    // non-increasing purchase rates from decile 1 down; each adjacent
    // inversion is a violation row with its magnitude in basis points.
    // The lift chart says what each decile does; this says whether the
    // ranking itself is trustworthy.
    QueryDef(
      "q315_monotonicity_audit",
      (s, dir) => {
        val perUser = eventsUs(s, dir).groupBy("user_id")
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("spend_cents"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchases"),
            count(lit(1)).cast("long").as("n_events"))
        val deciles = perUser.withColumn("decile", ntile(10).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("spend_cents").desc, col("user_id"))))
          .groupBy("decile")
          .agg(sum("purchases").as("purch"), sum("n_events").as("n"))
          .withColumn("rate_bp", expr("purch * 10000 div n"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
        deciles.withColumn("next_rate_bp", lead("rate_bp", 1).over(w))
          .select(col("decile").cast("int"), col("rate_bp").cast("long"),
            coalesce(col("next_rate_bp"), lit(-1L)).cast("long").as("next_rate_bp"),
            when(col("next_rate_bp").isNotNull && col("next_rate_bp") > col("rate_bp"),
              col("next_rate_bp") - col("rate_bp")).otherwise(0L)
              .cast("long").as("inversion_bp"))
          .orderBy("decile")
      },
      Some("""WITH u AS (SELECT user_id,
             |    sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spend_cents,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases,
             |    count(*) AS n_events
             |  FROM events GROUP BY 1),
             |d AS (SELECT ntile(10) OVER (ORDER BY spend_cents DESC, user_id) AS decile,
             |    purchases, n_events FROM u),
             |g AS (SELECT decile, sum(purchases) AS purch, sum(n_events) AS n
             |  FROM d GROUP BY 1),
             |r AS (SELECT decile, purch * 10000 // n AS rate_bp FROM g),
             |x AS (SELECT decile, rate_bp, lead(rate_bp) OVER (ORDER BY decile) AS nxt FROM r)
             |SELECT CAST(decile AS INT) AS decile, CAST(rate_bp AS BIGINT) AS rate_bp,
             |  CAST(COALESCE(nxt, -1) AS BIGINT) AS next_rate_bp,
             |  CAST(CASE WHEN nxt IS NOT NULL AND nxt > rate_bp
             |    THEN nxt - rate_bp ELSE 0 END AS BIGINT) AS inversion_bp
             |FROM x ORDER BY decile""".stripMargin)
    ),

    // Strided (overlapping) retrieval chunking — the RAG counterpart of
    // the exact tiling in q46: 100-token chunks every 50 tokens, so
    // context never falls on a boundary; per-source duplication of chunk
    // hashes then measures template repetition at retrieval granularity
    // (overlap itself never collides — adjacent chunks share only half).
    // One explode bounded by n_toks/stride per doc; hashes shuffle,
    // chunk text never leaves the map side.
    QueryDef(
      "q316_strided_chunks",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") > 0)
        val chunks = d
          .withColumn("start", explode(expr("sequence(0, n - 1, 50)")))
          .select(col("doc_id"), col("source"), col("start"),
            md5(expr("array_join(slice(toks, start + 1, 100), ' ')")).as("chunk_md5"))
        chunks.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            countDistinct("chunk_md5").as("n_unique"))
          .withColumn("dup_bp",
            expr("(n_chunks - n_unique) * 10000 div n_chunks"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |n AS (SELECT doc_id, source, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
             |c AS (SELECT doc_id, source,
             |    md5(array_to_string(toks[s+1:s+100], ' ')) AS chunk_md5
             |  FROM n, unnest(range(0, n, 50)) AS t(s)),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
             |    CAST(count(DISTINCT chunk_md5) AS BIGINT) AS n_unique
             |  FROM c GROUP BY source)
             |SELECT source, n_chunks, n_unique,
             |  CAST((n_chunks - n_unique) * 10000 // n_chunks AS BIGINT) AS dup_bp
             |FROM g ORDER BY source""".stripMargin)
    ),

    // Hard-negative mining for contrastive training: per anchor (every
    // 50th vector), the 3 nearest neighbors with a DIFFERENT label —
    // exactly the examples a contrastive loss learns most from, and the
    // complement of q278's same-label relevance. Anchors broadcast
    // (probe set is small by design); ranks are (cosine desc, id)
    // deterministic; the exact scan stays linear in the corpus.
    QueryDef(
      "q317_hard_negatives",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, dir, "embeddings")
        val anchors = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
            col("label").as("anchor_label"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("anchor_id")
          .orderBy(col("cos_sim").desc, col("neg_id"))
        canonOut(e.crossJoin(broadcast(anchors))
          .filter(col("vec_id") =!= col("anchor_id") &&
            col("label") =!= col("anchor_label"))
          .select(col("anchor_id"), col("anchor_label"),
            col("vec_id").as("neg_id"), col("label").as("neg_label"),
            Similarity.cosine("embedding", "av").as("cos_sim"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("anchor_id"), col("anchor_label"), col("neg_id"),
            col("neg_label"), col("rank").cast("int"),
            col("cos_sim").cast("decimal(16,12)"))
          .orderBy("anchor_id", "rank"))
      },
      Some {
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        s"""WITH a AS (SELECT vec_id AS anchor_id, embedding AS av, label AS anchor_label
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |sc AS (SELECT a.anchor_id, a.anchor_label, e.vec_id AS neg_id,
           |    e.label AS neg_label, ${cos("e.embedding", "a.av")} AS cs
           |  FROM embeddings e CROSS JOIN a
           |  WHERE e.vec_id <> a.anchor_id AND e.label <> a.anchor_label),
           |r AS (SELECT anchor_id, anchor_label, neg_id, neg_label, cs,
           |    row_number() OVER (PARTITION BY anchor_id ORDER BY cs DESC, neg_id) AS rank
           |  FROM sc)
           |SELECT anchor_id, anchor_label, neg_id, neg_label,
           |  CAST(rank AS INT) AS rank,
           |  CAST(CAST(cs AS DECIMAL(16,12)) AS VARCHAR) AS cos_sim
           |FROM r WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin
      }
    ),

    // Dedup-threshold sensitivity sweep: exact Jaccard over
    // (lang, length-bucket)-blocked candidate pairs, bucketed into the
    // similarity bands the MinHash S-curve (q308) tunes against — how
    // many pairs would each threshold actually merge? Cross-multiplied
    // integer comparisons (|∩|·10 vs k·|∪|), 3-word shingle sets via the
    // NATIVE sorted-merge intersect (the per-pair hash-set build of
    // array_intersect made the first cut the suite's slowest query;
    // 6.8 s → 4.2 s after the native merge + 20-char buckets), and a
    // HARD block cap (150) with skipped blocks reported in-output: at
    // corpus scale blocks grow with the data, so an uncapped blocked
    // join is quadratic — the cap is the contract, not an optimization.
    // Remaining cost is the exact sweep itself: ~126k pairs × sorted
    // merge, linear in (bounded) pairs.
    QueryDef(
      "q318_threshold_sweep",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val blockCap = 150L
        // tParallel + the CHEAP short-doc prefilter are the r12 plan fix
        // (6.0 -> 1.0 s): the fixture scans as one partition, and the old
        // post-hoc `filter(size(sh) > 0)` was PUSHED below the exchange
        // into the scan, re-evaluating the entire shingle expression on
        // that one task. `size(toks) >= 4` is provably equivalent (the
        // shingle list is sequence(0, size-4), empty exactly when
        // size < 4) and pushes down at regex cost, leaving the heavy
        // fold parallel above the exchange.
        val sh = tParallel(s, dir, "documents")
          .filter(expr("size(filter(split(text, '\\\\s+'), x -> x <> '')) >= 4"))
          .withColumn("toks", expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
          .select(col("doc_id"), col("lang"),
            (col("n_chars") / 20).cast("long").as("lb"),
            // Shingles hash to ints via a base-31 polynomial mod the
            // prime 2^57-13 (r9 moved md5-prefix strings -> 60-bit ints
            // for the cheaper sorted merge — a measured wash because the
            // md5 itself dominated; r11 replaces the digest with the
            // same polynomial family cdcChunks/q324 already fold, a few
            // integer ops per char instead of a digest+hex+conv chain).
            // Both engines fold the identical polynomial, so collisions
            // (birthday-bounded by the ~1.4e17 space, same envelope as
            // the old 2^60 prefix) affect both sides identically.
            // sequence(0, size-4) is safe here: the prefilter guarantees
            // size >= 4 (sequence(0,-1) would yield a DESCENDING pair).
            expr("array_sort(array_distinct(" +
              "transform(sequence(0, size(toks) - 4), " +
              "i -> aggregate(split(array_join(slice(toks, i + 1, 3), ' '), ''), 0L, " +
              "(a, c) -> (a * 31 + ascii(c)) % 144115188075855859L))))").as("sh"))
          .withColumn("__bc", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("lang", "lb")))
          .localCheckpoint()
        val blocks = sh.groupBy("lang", "lb").agg(max("__bc").as("c"))
          .agg(count(lit(1)).cast("long").as("n_blocks"),
            sum(when(col("c") > blockCap, 1L).otherwise(0L)).as("n_skipped_blocks"))
        // pair census stays the PAIR-GRAINED self-join: an r11 experiment
        // moved it to per-block collect_list + local loops (one task per
        // block, arrays loaded once) and measured ~25% SLOWER at sf0.1 —
        // ~50 blocks over 32 cores is straggler-bound, while the join
        // spreads pairs evenly across every partition. The array copies
        // per candidate row are the price of even parallelism.
        val inBlock = sh.filter(col("__bc") <= blockCap)
        val pairs = inBlock.as("a").join(inBlock.as("b"),
            col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            graft.functions.GraftFunctions
              .sortedIntersectCount(col("a.sh"), col("b.sh")).as("inter"),
            (size(col("a.sh")) + size(col("b.sh"))).cast("long").as("szsum"))
          .withColumn("uni", col("szsum") - col("inter"))
        pairs.agg(
            count(lit(1)).cast("long").as("n_candidates"),
            sum(when(col("inter") * 10 >= col("uni") * 9, 1L).otherwise(0L)).as("ge_090"),
            sum(when(col("inter") * 10 >= col("uni") * 7, 1L).otherwise(0L)).as("ge_070"),
            sum(when(col("inter") * 2 >= col("uni"), 1L).otherwise(0L)).as("ge_050"))
          .crossJoin(blocks)
          .select(col("n_blocks"), col("n_skipped_blocks"), col("n_candidates"),
            col("ge_090"), col("ge_070"), col("ge_050"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, CAST(n_chars // 20 AS BIGINT) AS lb,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
             |  FROM documents),
             |sh AS (SELECT doc_id, lang, lb,
             |    list_sort(list_distinct(list_transform(
             |      range(greatest(len(w) - 3, 0)),
             |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(array_to_string(w[i+1:i+3], ' '), ''),
             |               c -> CAST(ord(c) AS BIGINT))),
             |             (a, b) -> (a * 31 + b) % 144115188075855859)))) AS sh
             |  FROM d),
             |f AS (SELECT * FROM sh WHERE len(sh) > 0),
             |bc AS (SELECT lang, lb, count(*) AS c FROM f GROUP BY 1, 2),
             |bk AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             |    CAST(sum(CASE WHEN c > 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped_blocks
             |  FROM bc),
             |g AS (SELECT f.* FROM f JOIN bc USING (lang, lb) WHERE bc.c <= 150),
             |p AS (SELECT len(list_intersect(a.sh, b.sh)) AS inter,
             |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
             |  FROM g a JOIN g b ON a.lang = b.lang AND a.lb = b.lb
             |    AND a.doc_id < b.doc_id),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             |  CAST(sum(CASE WHEN inter * 10 >= uni * 9 THEN 1 ELSE 0 END) AS BIGINT) AS ge_090,
             |  CAST(sum(CASE WHEN inter * 10 >= uni * 7 THEN 1 ELSE 0 END) AS BIGINT) AS ge_070,
             |  CAST(sum(CASE WHEN inter * 2 >= uni THEN 1 ELSE 0 END) AS BIGINT) AS ge_050
             |FROM p)
             |SELECT bk.n_blocks, bk.n_skipped_blocks, agg.n_candidates,
             |  agg.ge_090, agg.ge_070, agg.ge_050
             |FROM agg, bk""".stripMargin)
    ),

    // Ensemble quality score: four independent integer signals (word
    // floor, mean word length band, Flesch floor, type/token diversity
    // floor) summed into a 0–4 score, censused per source — the
    // one-number curation gate a mixture plan consumes, built ONLY from
    // components whose algebra both engines already replay.
    QueryDef(
      "q319_quality_ensemble",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("toks", expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
          .withColumn("w", size(col("toks")).cast("long"))
          .withColumn("chars", expr("CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS BIGINT)"))
          .withColumn("uniq", expr("size(array_distinct(toks))").cast("long"))
          .withColumn("syl",
            expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").cast("long"))
          .withColumn("sen", expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"))
        val scored = d
          .withColumn("s1", when(col("w") >= 30, 1L).otherwise(0L))
          .withColumn("s2", when(col("w") > 0 &&
            col("chars") * 10 >= col("w") * 30 && col("chars") * 10 <= col("w") * 100, 1L)
            .otherwise(0L))
          .withColumn("s3", when(col("w") > 0 && col("sen") > 0 &&
            lit(206835L) - expr("(1015 * w) div sen") - expr("(84600 * syl) div w") >= 50000L, 1L)
            .otherwise(0L))
          .withColumn("s4", when(col("w") > 0 && col("uniq") * 10 >= col("w") * 3, 1L)
            .otherwise(0L))
          .withColumn("score", col("s1") + col("s2") + col("s3") + col("s4"))
        scored.groupBy("source", "score")
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .orderBy("source", "score")
      },
      Some("""WITH d AS (SELECT source, text,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |m AS (SELECT source,
             |    CAST(len(toks) AS BIGINT) AS w,
             |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS chars,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS uniq,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl,
             |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sen
             |  FROM d),
             |sc AS (SELECT source,
             |    (CASE WHEN w >= 30 THEN 1 ELSE 0 END) +
             |    (CASE WHEN w > 0 AND chars * 10 >= w * 30 AND chars * 10 <= w * 100 THEN 1 ELSE 0 END) +
             |    (CASE WHEN w > 0 AND sen > 0 AND
             |       206835 - (1015 * w) // sen - (84600 * syl) // w >= 50000 THEN 1 ELSE 0 END) +
             |    (CASE WHEN w > 0 AND uniq * 10 >= w * 3 THEN 1 ELSE 0 END) AS score
             |  FROM m)
             |SELECT source, CAST(score AS BIGINT) AS score,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM sc GROUP BY 1, 2 ORDER BY source, score""".stripMargin)
    ),

    // Survivorship-policy dedup: within each reorder-invariant dup group
    // (q303's token-set fingerprint), keep the LONGEST member (tie → min
    // id) instead of the min-id default — the policy choice a curation
    // pipeline actually wants (keep the most complete copy), with the
    // kept/dropped char ledger per group so the policy's effect is
    // auditable.
    QueryDef(
      "q320_survivorship",
      (s, dir) => {
        val fp = t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            md5(expr("array_join(array_sort(array_distinct(" +
              "filter(split(text, '\\\\s+'), x -> x <> ''))), ' ')")).as("fingerprint"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
          .orderBy(col("n_chars").desc, col("doc_id"))
        fp.withColumn("__rn", row_number().over(w))
          .groupBy("fingerprint")
          .agg(count(lit(1)).cast("long").as("n_members"),
            max(when(col("__rn") === 1, col("doc_id"))).as("keep_id"),
            max(when(col("__rn") === 1, col("n_chars"))).cast("long").as("kept_chars"),
            sum(when(col("__rn") =!= 1, col("n_chars")).otherwise(0L))
              .cast("long").as("dropped_chars"))
          .filter(col("n_members") >= 2)
          .orderBy("fingerprint")
      },
      Some("""WITH fp AS (SELECT doc_id, n_chars,
             |    md5(array_to_string(list_sort(list_distinct(
             |      list_filter(string_split_regex(text, '\s+'), x -> x <> ''))), ' ')) AS fingerprint
             |  FROM documents),
             |r AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
             |    ORDER BY n_chars DESC, doc_id) AS rn FROM fp)
             |SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_members,
             |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
             |  CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
             |  CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT) AS dropped_chars
             |FROM r GROUP BY fingerprint HAVING count(*) >= 2
             |ORDER BY fingerprint""".stripMargin)
    ),

    // Embedding-space drift: per-label centroid shift between the
    // even-id and odd-id halves — the representation-drift lens
    // completing the drift family (TV q133, KS q270, Wasserstein q239,
    // quantile q207, vocabulary q133): a retrained encoder that moved a
    // class's region shows up here before any scalar statistic moves.
    // Centroids via the avg-CAST-REAL discipline (q74), distance through
    // the codegen'd squared-L2 expression.
    QueryDef(
      "q321_embedding_drift",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, dir, "embeddings")
          .withColumn("half", (col("vec_id") % 2).cast("int"))
        val cent = e.select(col("label"), col("half"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "half", "pos").agg(avg("v").cast("float").as("mv"))
          .groupBy("label", "half")
          .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("ps"))
          .select(col("label"), col("half"), expr("transform(ps, x -> x.mv)").as("c"))
        val a = cent.filter(col("half") === 0).select(col("label"), col("c").as("ca"))
        val b = cent.filter(col("half") === 1).select(col("label"), col("c").as("cb"))
        val n = e.groupBy("label").agg(
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_even"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_odd"))
        canonOut(a.join(b, Seq("label")).join(n, Seq("label"))
          .select(col("label"), col("n_even"), col("n_odd"),
            graft.functions.GraftFunctions.squaredL2(col("ca"), col("cb"))
              .cast("decimal(20,10)").as("centroid_shift_sq"))
          .orderBy("label"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding,
             |    CAST(vec_id % 2 AS INT) AS half FROM embeddings),
             |px AS (SELECT label, half, i,
             |    CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM e, (SELECT unnest(range(64)) AS i) ix GROUP BY label, half, i),
             |c AS (SELECT label, half, list(mv ORDER BY i) AS cv FROM px GROUP BY label, half),
             |n AS (SELECT label,
             |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
             |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
             |  FROM e GROUP BY label),
             |d AS (SELECT a.label,
             |    list_reduce(list_transform(range(64),
             |      i -> (a.cv[i+1]::DOUBLE - b.cv[i+1]::DOUBLE)
             |         * (a.cv[i+1]::DOUBLE - b.cv[i+1]::DOUBLE)),
             |      (x, y) -> x + y) AS d2
             |  FROM c a JOIN c b ON a.label = b.label AND a.half = 0 AND b.half = 1)
             |SELECT d.label, n.n_even, n.n_odd,
             |  CAST(CAST(d.d2 AS DECIMAL(20,10)) AS VARCHAR) AS centroid_shift_sq
             |FROM d JOIN n USING (label) ORDER BY label""".stripMargin)
    ),

    // Cohen's kappa between the marker-based language classifier (q42)
    // and the ground-truth lang column — inter-annotator agreement
    // corrected for chance, in exact rational algebra:
    //
    //   κ = (a·n − Σ_c r_c·k_c) / (n² − Σ_c r_c·k_c)    (×10⁴ render)
    //
    // where a = agreements and r/k are the two marginals. Raw accuracy
    // flatters any classifier on a skewed label mix; kappa is the label-QA
    // number an annotation pipeline actually tracks. One scan for the
    // confusion marginals, integer division once.
    QueryDef(
      "q322_kappa",
      (s, dir) => {
        val pred = TextAnalysis.languageId(
            t(s, dir, "documents"), "doc_id", "text", langMarkers)
          .select(col("doc_id"), col("pred_lang"))
        val both = t(s, dir, "documents").select(col("doc_id"), col("lang"))
          .join(pred, "doc_id")
        val marg = both.groupBy("lang", "pred_lang")
          .agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint()
        val n = marg.agg(sum("c")).head().getLong(0)
        val agree = marg.filter(col("lang") === col("pred_lang"))
          .agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
        val peNum = marg.groupBy("lang").agg(sum("c").as("r"))
          .join(marg.groupBy("pred_lang").agg(sum("c").as("k"))
            .withColumnRenamed("pred_lang", "lang"), Seq("lang"), "inner")
          .agg(coalesce(sum(col("r") * col("k")), lit(0L))).head().getLong(0)
        import s.implicits._
        Seq((n, agree, peNum,
          (agree * n - peNum) * 10000L / (n * n - peNum)))
          .toDF("n", "agree_n", "pe_num", "kappa_fp")
      },
      Some {
        val scores = langMarkers
          .map { case (l, ws) => s"CAST(${duckMarkerScore(ws)} AS BIGINT) AS score_$l" }
          .mkString(",\n  ")
        val g = langMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
        val predCase = langMarkers
          .map { case (l, _) => s"WHEN score_$l = $g THEN '$l'" }
          .mkString("CASE ", " ", " ELSE 'unknown' END")
        s"""WITH s AS (SELECT doc_id, lang, $scores FROM documents),
           |p AS (SELECT doc_id, lang, $predCase AS pred FROM s),
           |m AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN lang = pred THEN c ELSE 0 END) AS BIGINT) AS agree_n
           |  FROM m),
           |pe AS (SELECT CAST(COALESCE(sum(r.rc * k.kc), 0) AS BIGINT) AS pe_num
           |  FROM (SELECT lang, sum(c) AS rc FROM m GROUP BY 1) r
           |  JOIN (SELECT pred, sum(c) AS kc FROM m GROUP BY 1) k ON r.lang = k.pred)
           |SELECT n, agree_n, pe_num,
           |  CAST((agree_n * n - pe_num) * 10000 // (n * n - pe_num) AS BIGINT) AS kappa_fp
           |FROM tot, pe""".stripMargin
      }
    ),

    // Kaplan–Meier time-to-conversion: duration = days from a user's
    // first event to their first PURCHASE, censored at the corpus horizon
    // for users who never convert. The product-limit estimator runs as a
    // ×10⁶ integer truncation chain over BIGINT-ENCODED (t, survivors,
    // at-risk) steps — t·10¹⁰ + (n−d)·10⁵ + n — so BOTH engines fold the
    // identical (acc·(n−d)) div n arithmetic step-for-step with no struct
    // folds and no floats; probes read the chain at 1/3/7 days plus the
    // full horizon. The first genuinely time-to-event lens in the suite —
    // and the estimator that stays HONEST under censoring, where a naive
    // mean of observed delays would bias low.
    QueryDef(
      "q323_kaplan_meier",
      (s, dir) => {
        val per = eventsUs(s, dir)
          .withColumn("day", expr("ts_us div 86400000000"))
          .groupBy("user_id").agg(min("day").as("f"),
            min(when(col("event_type") === "purchase", col("day"))).as("p"),
            max("day").as("l"))
          .localCheckpoint()
        val m = per.agg(max("l")).head().getLong(0)
        val u = per
          .withColumn("censored", when(col("p").isNull, 1).otherwise(0))
          .withColumn("t",
            when(col("p").isNull, lit(m) - col("f")).otherwise(col("p") - col("f")))
        val byT = u.groupBy("t").agg(
            count(lit(1)).cast("long").as("all_t"),
            sum(when(col("censored") === 0, 1L).otherwise(0L)).as("d"))
          .localCheckpoint()
        val total = u.count()
        val w = org.apache.spark.sql.expressions.Window.orderBy("t")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val steps = byT
          .withColumn("n_risk", lit(total) - coalesce(sum("all_t").over(w), lit(0L)))
          .filter(col("d") > 0)
          .select((col("t") * 10000000000L +
            (col("n_risk") - col("d")) * 100000L + col("n_risk")).as("enc"), col("t"))
        val arr = steps.agg(array_sort(collect_list("enc")).as("a"))
        def surv(probe: Long) = expr(
          s"aggregate(a, CAST(1000000 AS BIGINT), (acc, x) -> " +
            s"CASE WHEN x div 10000000000 <= $probe THEN " +
            s"(acc * ((x % 10000000000) div 100000)) div (x % 100000) ELSE acc END)")
        val censoredN = u.agg(sum("censored")).head().getLong(0)
        arr.select(lit(total).as("n_users"), lit(censoredN).as("n_censored"),
          surv(1L).as("s1_fp"), surv(3L).as("s3_fp"),
          surv(7L).as("s7_fp"), surv(Long.MaxValue / 20000000000L).as("s_final_fp"))
      },
      Some("""WITH e AS (SELECT user_id, event_type,
             |    epoch_us(ts) // 86400000000 AS day FROM events),
             |per AS (SELECT user_id, min(day) AS f,
             |    min(CASE WHEN event_type = 'purchase' THEN day END) AS p,
             |    max(day) AS l FROM e GROUP BY 1),
             |mx AS (SELECT max(l) AS m FROM per),
             |u AS (SELECT user_id,
             |    CASE WHEN p IS NULL THEN 1 ELSE 0 END AS censored,
             |    CASE WHEN p IS NULL THEN m - f ELSE p - f END AS t
             |  FROM per, mx),
             |bt AS (SELECT t, CAST(count(*) AS BIGINT) AS all_t,
             |    CAST(sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM u GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS total,
             |    CAST(sum(censored) AS BIGINT) AS n_censored FROM u),
             |st AS (SELECT t,
             |    total - COALESCE(sum(all_t) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk, d
             |  FROM bt, tot),
             |enc AS (SELECT list_sort(list(t * 10000000000 + (n_risk - d) * 100000 + n_risk)) AS a
             |  FROM st WHERE d > 0),
             |f AS (SELECT
             |  list_reduce(list_prepend(CAST(1000000 AS BIGINT), a), (acc, x) ->
             |    CASE WHEN x // 10000000000 <= 1 THEN (acc * ((x % 10000000000) // 100000)) // (x % 100000)
             |         ELSE acc END) AS s1,
             |  list_reduce(list_prepend(CAST(1000000 AS BIGINT), a), (acc, x) ->
             |    CASE WHEN x // 10000000000 <= 3 THEN (acc * ((x % 10000000000) // 100000)) // (x % 100000)
             |         ELSE acc END) AS s3,
             |  list_reduce(list_prepend(CAST(1000000 AS BIGINT), a), (acc, x) ->
             |    CASE WHEN x // 10000000000 <= 7 THEN (acc * ((x % 10000000000) // 100000)) // (x % 100000)
             |         ELSE acc END) AS s7,
             |  list_reduce(list_prepend(CAST(1000000 AS BIGINT), a), (acc, x) ->
             |    (acc * ((x % 10000000000) // 100000)) // (x % 100000)) AS sf
             |  FROM enc)
             |SELECT tot.total AS n_users, tot.n_censored,
             |  CAST(f.s1 AS BIGINT) AS s1_fp, CAST(f.s3 AS BIGINT) AS s3_fp,
             |  CAST(f.s7 AS BIGINT) AS s7_fp, CAST(f.sf AS BIGINT) AS s_final_fp
             |FROM f, tot""".stripMargin)
    ),

    // HLL++ approx-profile CERTIFICATE (retires q05's no_oracle — the
    // q120/q140/q148 sketch-certificate pattern applied to the profile's
    // approx mode): `approx_count_distinct` promises relative standard
    // error rsd = 0.05, so per profiled column the LIVE estimate must land
    // within 3σ of the exact distinct count — |est − exact|·100 ≤ 15·exact,
    // integer algebra, no doubles. Exact nulls/distincts ride along, so the
    // oracle re-derives the whole frame and pins certified = 1: a broken
    // sketch (or a silently changed default rsd) flips the bit and fails
    // the hash. The multi-countDistinct Expand here is certificate-only
    // machinery; the 100 TB profile paths remain q23's melt (exact) and
    // q05's sketches (approx).
    QueryDef(
      "q324_profile_approx_certificate",
      (s, dir) => {
        val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
        val o = t(s, dir, "orders")
        val aggs = cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}__nulls"),
          countDistinct(col(c)).cast("long").as(s"${c}__exact"),
          approx_count_distinct(col(c)).cast("long").as(s"${c}__approx")))
        val row = o.agg(aggs.head, aggs.tail: _*)
        cols.map { c =>
          row.select(lit(c).as("col_name"),
            col(s"${c}__nulls").as("n_nulls"),
            col(s"${c}__exact").as("n_distinct"),
            (abs(col(s"${c}__approx") - col(s"${c}__exact")) * 100 <=
              col(s"${c}__exact") * 15).cast("long").as("certified"))
        }.reduce(_ unionByName _).orderBy("col_name")
      },
      Some {
        val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
        cols.map { c =>
          s"""SELECT '$c' AS col_name,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(1 AS BIGINT) AS certified FROM orders""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }
    ),

    // Salted-digest diff under the oracle (the --salt-skew mechanism,
    // DiffEngine.saltedDigestFrame): keys are DELIBERATELY non-unique
    // (o_orderkey % 1000 → ~15 rows/key at sf0.01) — exactly the regime
    // where the plain full-outer row join multiplies (n_base×n_head per
    // key) and one hot partition eats the stage. The digest path
    // collapses each side per key into (row count, Σ 32-bit row-hash
    // prefixes) via the two-phase salted aggregate, joins one row per
    // key, and still reports ROW-exact added/removed/base/head counts
    // plus key-level changed. The oracle replays count+hash-sum per key
    // and states the same five numbers — planted deletes (k%101),
    // mutations (cents%89), and appends (k%103) must all surface. */
    QueryDef(
      "q325_salted_digest_diff",
      (s, dir) => {
        val base = t(s, dir, "orders").select(
          (col("o_orderkey") % 1000).as("k"),
          col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val head = base.filter(col("k") % 101 =!= 0)
          .withColumn("cents",
            when(col("cents") % 89 === 0, col("cents") + 1).otherwise(col("cents")))
          .unionByName(base.filter(col("k") % 103 === 0)
            .select((col("k") + 1000000).as("k"), col("st"), col("cents")))
        val j = graft.engine.DiffEngine
          .saltedDigestFrame(base, head, Seq("k"), Seq("st", "cents"), buckets = 8)
        j.agg(
          sum(when(col("__base_hash").isNull, col("__head_n")).otherwise(0L))
            .cast("long").as("added"),
          sum(when(col("__head_hash").isNull, col("__base_n")).otherwise(0L))
            .cast("long").as("removed"),
          sum(when(col("__base_hash").isNotNull && col("__head_hash").isNotNull &&
            col("__base_hash") =!= col("__head_hash"), 1L).otherwise(0L))
            .cast("long").as("changed_keys"),
          sum(coalesce(col("__base_n"), lit(0L))).cast("long").as("base_rows"),
          sum(coalesce(col("__head_n"), lit(0L))).cast("long").as("head_rows"))
      },
      Some("""WITH base AS (SELECT o_orderkey % 1000 AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
             |head AS (SELECT k, st,
             |    CASE WHEN cents % 89 = 0 THEN cents + 1 ELSE cents END AS cents
             |    FROM base WHERE k % 101 <> 0
             |  UNION ALL SELECT k + 1000000, st, cents FROM base WHERE k % 103 = 0),
             |db AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    sum(('0x' || substr(md5(st || '|' || cents), 1, 8))::BIGINT) AS s
             |  FROM base GROUP BY k),
             |dh AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    sum(('0x' || substr(md5(st || '|' || cents), 1, 8))::BIGINT) AS s
             |  FROM head GROUP BY k)
             |SELECT
             |  CAST(COALESCE(sum(CASE WHEN db.n IS NULL THEN dh.n END), 0) AS BIGINT) AS added,
             |  CAST(COALESCE(sum(CASE WHEN dh.n IS NULL THEN db.n END), 0) AS BIGINT) AS removed,
             |  CAST(COALESCE(sum(CASE WHEN db.n IS NOT NULL AND dh.n IS NOT NULL
             |       AND (db.n <> dh.n OR db.s <> dh.s) THEN 1 END), 0) AS BIGINT) AS changed_keys,
             |  CAST(COALESCE(sum(db.n), 0) AS BIGINT) AS base_rows,
             |  CAST(COALESCE(sum(dh.n), 0) AS BIGINT) AS head_rows
             |FROM db FULL OUTER JOIN dh USING (k)""".stripMargin)
    ),

    // Reliability diagram + expected calibration error (ECE) — the
    // quality-classifier audit a curation pipeline runs before trusting a
    // score as a keep-probability: bucket the score into deciles and
    // compare each bucket's mean predicted probability against its
    // EMPIRICAL pass rate; ECE is the n-weighted mean absolute gap. Here
    // the "classifier" is the cheap min(n_words,100)% proxy and ground
    // truth is the full Gopher verdict (q83's rules) — deliberately
    // miscalibrated, which is exactly what the diagram must expose. All
    // ×10⁴ fixed point, integer div only; the unpartitioned window runs
    // over ≤10 bucket rows, never data. One corpus pass + one 10-row agg.
    QueryDef(
      "q326_ece_calibration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val g = TextAnalysis.gopherQualityRules(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50)
        g.select(
            least(col("n_words"), lit(100L)).cast("long").as("score_x100"),
            col("passes_all").cast("long").as("pos"))
          .withColumn("bucket",
            least(expr("score_x100 div 10"), lit(9L)).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("score_x100").cast("long").as("__sum_score"),
            sum("pos").cast("long").as("__n_pos"))
          .withColumn("mean_pred_x10000",
            expr("__sum_score * 100 div n").cast("long"))
          .withColumn("emp_rate_x10000",
            expr("__n_pos * 10000 div n").cast("long"))
          .withColumn("gap_x10000",
            abs(col("mean_pred_x10000") - col("emp_rate_x10000")))
          .withColumn("__wg",
            sum(expr("n * gap_x10000")).over(Window.partitionBy(lit(1))))
          .withColumn("__wn", sum(col("n")).over(Window.partitionBy(lit(1))))
          .withColumn("ece_x10000", expr("__wg div __wn").cast("long"))
          .select("bucket", "n", "mean_pred_x10000", "emp_rate_x10000",
            "gap_x10000", "ece_x10000")
          .orderBy("bucket")
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS sy,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS al,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t),
              |v AS (SELECT LEAST(nw, 100) AS score,
              |  CASE WHEN nw BETWEEN 50 AND 100000 AND swc BETWEEN nw * 3 AND nw * 10
              |        AND sy * 100 <= nw * 10 AND al * 100 >= nw * 80 AND st >= 2
              |       THEN 1 ELSE 0 END AS pos FROM m),
              |b AS (SELECT LEAST(score // 10, 9) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(score) AS BIGINT) AS sum_score,
              |  CAST(sum(pos) AS BIGINT) AS n_pos FROM v GROUP BY 1),
              |g AS (SELECT bucket, n,
              |  CAST(sum_score * 100 // n AS BIGINT) AS mean_pred_x10000,
              |  CAST(n_pos * 10000 // n AS BIGINT) AS emp_rate_x10000 FROM b)
              |SELECT CAST(bucket AS BIGINT) AS bucket, n, mean_pred_x10000, emp_rate_x10000,
              |  CAST(abs(mean_pred_x10000 - emp_rate_x10000) AS BIGINT) AS gap_x10000,
              |  CAST(sum(n * abs(mean_pred_x10000 - emp_rate_x10000)) OVER ()
              |       // sum(n) OVER () AS BIGINT) AS ece_x10000
              |FROM g ORDER BY bucket""".stripMargin)
    ),

    // Isotonic calibration (Stats.isotonicCalibration) — PAV via the
    // minimax identity ŷ_i = min_{t≥i} max_{s≤i} avg(s..t), so the fit is
    // pure joins/windows over the ≤101-level table and the oracle replays
    // it verbatim: q326 DIAGNOSED the raw score's miscalibration, this
    // query REPAIRS it into the closest monotone keep-probability, with
    // the monotonicity certificate pinned to 1 on every row. Corpus cost
    // is one aggregate; the minimax runs on ≤ levels² ≈ 5k interval rows.
    QueryDef(
      "q327_isotonic_calibration",
      (s, dir) => {
        val g = TextAnalysis.gopherQualityRules(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50)
        val scored = g.select(
          least(col("n_words"), lit(100L)).cast("long").as("score"),
          col("passes_all").cast("long").as("pos"))
        Stats.isotonicCalibration(scored, "score", "pos")
          .select(col("level"), col("n"), col("n_pos"), col("emp_rate_fp"),
            col("calibrated_fp"), col("is_monotone"))
          .orderBy("level")
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS sy,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS al,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t),
              |v AS (SELECT LEAST(nw, 100) AS level,
              |  CASE WHEN nw BETWEEN 50 AND 100000 AND swc BETWEEN nw * 3 AND nw * 10
              |        AND sy * 100 <= nw * 10 AND al * 100 >= nw * 80 AND st >= 2
              |       THEN 1 ELSE 0 END AS pos FROM m),
              |lv AS (SELECT level, CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(pos) AS BIGINT) AS n_pos FROM v GROUP BY 1),
              |cum AS (SELECT level, n, n_pos,
              |  sum(n_pos) OVER (ORDER BY level) AS cp,
              |  sum(n) OVER (ORDER BY level) AS cn FROM lv),
              |pairs AS (SELECT s.level AS s, t.level AS t,
              |    ((t.cp - (s.cp - s.n_pos)) * 1000000) // (t.cn - (s.cn - s.n)) AS avg_fp
              |  FROM cum s JOIN cum t ON s.level <= t.level),
              |mm AS (SELECT s AS level, t, max(avg_fp) OVER (PARTITION BY t ORDER BY s
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m FROM pairs),
              |fit AS (SELECT level, CAST(min(m) AS BIGINT) AS calibrated_fp FROM mm GROUP BY level)
              |SELECT CAST(lv.level AS BIGINT) AS level, lv.n, lv.n_pos,
              |  CAST((lv.n_pos * 1000000) // lv.n AS BIGINT) AS emp_rate_fp,
              |  fit.calibrated_fp,
              |  CAST(CASE WHEN lag(calibrated_fp) OVER (ORDER BY lv.level) IS NULL
              |         OR lag(calibrated_fp) OVER (ORDER BY lv.level) <= calibrated_fp
              |        THEN 1 ELSE 0 END AS BIGINT) AS is_monotone
              |FROM lv JOIN fit USING (level) ORDER BY level""".stripMargin)
    ),

    // Krippendorff's alpha across THREE automatic judges (word-count
    // floor, mean-word-length band, stopword floor — the q83 rule flags
    // acting as independent raters of the same documents): the
    // multi-rater completion of the agreement family (q322 = Cohen's
    // kappa, two raters). Binary nominal alpha collapses to one exact
    // rational — Do/De = S·(n_tot−1) / ((m−1)·n1·(n_tot−n1)) with
    // S = Σᵢ n1ᵢ(m−n1ᵢ) — so the whole certificate is one corpus
    // aggregate and one integer division, no floats anywhere.
    QueryDef(
      "q328_krippendorff_alpha",
      (s, dir) => {
        val g = TextAnalysis.gopherQualityRules(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50)
          .select(col("ok_word_count").cast("long").as("r1"),
            col("ok_mean_len").cast("long").as("r2"),
            col("ok_stopwords").cast("long").as("r3"))
        Stats.krippendorffAlphaBinary(g, Seq("r1", "r2", "r3"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t),
              |v AS (SELECT
              |  (CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
              |   + CASE WHEN swc BETWEEN nw * 3 AND nw * 10 THEN 1 ELSE 0 END
              |   + CASE WHEN st >= 2 THEN 1 ELSE 0 END) AS n1i FROM m),
              |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
              |  CAST(sum(n1i) AS BIGINT) AS n1,
              |  CAST(sum(n1i * (3 - n1i)) AS BIGINT) AS disagree_sum FROM v)
              |SELECT n_items, CAST(3 AS BIGINT) AS m, n1, disagree_sum,
              |  CASE WHEN n1 = 0 OR n1 = n_items * 3 THEN NULL
              |       ELSE 1000000 - (disagree_sum * (n_items * 3 - 1) * 1000000)
              |            // (2 * n1 * (n_items * 3 - n1)) END AS alpha_fp
              |FROM a""".stripMargin)
    ),

    // Mann–Whitney AUC (Stats.mannWhitneyAuc): does the word-count score
    // actually separate English from non-English documents? AUC =
    // P(random en doc outscores random non-en doc) + ½·ties — the
    // distribution-free discrimination audit run before a score routes or
    // gates sources. Computed WITHOUT the textbook global rank sort: over
    // bounded integer levels, U₁×2 = Σ_v n1(v)·(2·cum_n0(<v) + n0(v)), so
    // the corpus pass is one aggregate to ≤101 rows and the prefix sum
    // runs on the level table; products in DECIMAL(38,0).
    QueryDef(
      "q329_mannwhitney_auc",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("toks", expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
          // when/otherwise, not `(lang === 'en').cast(long)`: the boolean
          // cast sends a NULL lang to NULL (row silently dropped from both
          // groups) while the oracle's CASE WHEN buckets it into group 0 —
          // NULL lang must mean "not English", on both engines
          .select(when(col("lang") === "en", 1L).otherwise(0L).as("g"),
            least(size(col("toks")).cast("long"), lit(100L)).as("v"))
        Stats.mannWhitneyAuc(d, "g", "v")
      },
      Some(s"""WITH t AS (SELECT lang, $duckToks AS toks FROM documents),
              |v AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
              |  LEAST(CAST(len(toks) AS BIGINT), 100) AS level FROM t),
              |lv AS (SELECT level, CAST(sum(g) AS BIGINT) AS n1v,
              |  CAST(sum(1 - g) AS BIGINT) AS n0v FROM v GROUP BY 1),
              |cum AS (SELECT level, n1v, n0v,
              |  COALESCE(sum(n0v) OVER (ORDER BY level
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c0
              |  FROM lv)
              |SELECT CAST(sum(n1v) AS BIGINT) AS n1, CAST(sum(n0v) AS BIGINT) AS n0,
              |  CAST(sum(n1v * (2 * c0 + n0v)) AS BIGINT) AS u1_x2,
              |  CASE WHEN sum(n1v) = 0 OR sum(n0v) = 0 THEN NULL
              |       ELSE CAST((sum(n1v * (2 * c0 + n0v)) * 1000000)
              |            // (2 * sum(n1v) * sum(n0v)) AS BIGINT) END AS auc_fp
              |FROM cum""".stripMargin)
    ),

    // Kendall's τ-a between the raw word-count score and the 0–5 Gopher
    // rule-verdict count (Stats.kendallTauA): do the cheap signal and the
    // full gate agree in ORDERING? τ-a needs no square root (unlike
    // Spearman/τ-b), so the whole rank correlation is one exact rational.
    // No document pairs ever materialize — the corpus collapses to the
    // ≤101×6 level grid in one aggregate and concordant/discordant counts
    // come from the grid self-join. Sign and |τ| emit separately: negative
    // integral division truncates in Spark but floors in DuckDB, so the
    // absolute form is the only one both engines fold identically.
    QueryDef(
      "q330_kendall_tau",
      (s, dir) => {
        val g = TextAnalysis.gopherQualityRules(t(s, dir, "documents"),
          "doc_id", "text", stopwords, minWords = 50)
        val scored = g.select(
          least(col("n_words"), lit(100L)).cast("long").as("x"),
          (col("ok_word_count").cast("long") + col("ok_mean_len").cast("long") +
            col("ok_symbols").cast("long") + col("ok_alpha").cast("long") +
            col("ok_stopwords").cast("long")).as("y"))
        Stats.kendallTauA(scored, "x", "y")
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |m AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS nw,
              |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a,b) -> a + b) AS BIGINT) AS swc,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[#@]|\\.{3}$$'))) AS BIGINT) AS sy,
              |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS al,
              |  CAST(len(list_filter(toks, x -> list_contains(${stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS BIGINT) AS st
              |FROM t),
              |v AS (SELECT LEAST(nw, 100) AS x,
              |  (CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
              |   + CASE WHEN swc BETWEEN nw * 3 AND nw * 10 THEN 1 ELSE 0 END
              |   + CASE WHEN sy * 100 <= nw * 10 THEN 1 ELSE 0 END
              |   + CASE WHEN al * 100 >= nw * 80 THEN 1 ELSE 0 END
              |   + CASE WHEN st >= 2 THEN 1 ELSE 0 END) AS y FROM m),
              |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2),
              |p AS (SELECT sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c,
              |             sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d
              |      FROM cells a JOIN cells b ON a.x < b.x),
              |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells)
              |SELECT tot.n_total,
              |  CAST(COALESCE(p.c, 0) AS BIGINT) AS n_concordant,
              |  CAST(COALESCE(p.d, 0) AS BIGINT) AS n_discordant,
              |  CAST(CASE WHEN COALESCE(p.c, 0) > COALESCE(p.d, 0) THEN 1
              |            WHEN COALESCE(p.c, 0) < COALESCE(p.d, 0) THEN -1
              |            ELSE 0 END AS BIGINT) AS sign,
              |  CASE WHEN tot.n_total < 2 THEN NULL
              |       ELSE CAST((abs(COALESCE(p.c, 0) - COALESCE(p.d, 0)) * 1000000)
              |            // ((tot.n_total * (tot.n_total - 1)) // 2) AS BIGINT) END AS tau_abs_fp
              |FROM p, tot""".stripMargin)
    ),

    // EXACT BPE oracle (upgrades q107's certificate to a value-exact gate):
    // the full 30-round greedy merge training AND the rank-order encode
    // replayed in SQL, so the oracle pins every document's n_bpe_tokens to
    // the digit — no SQL engine "can't replay the iterative loop" excuse
    // left. Word state = symbol string with DOUBLED chr(1) separators and
    // a single-guard merge pattern (␁a␁␁b␁ → ␁ab␁): each adjacent pair
    // occurrence owns one guard char per side, so replace()'s left-to-
    // right non-overlapping scan merges ADJACENT occurrences too —
    // 'banana' under merge (a,n) gives [b,an,an,a] exactly like the
    // trainer's greedy rewrite (a SINGLE shared separator would be
    // consumed by the first match and leave the second unmerged; r12 fix,
    // pinned by BpeSpec's hostile-adjacency corpus). Applying merges in
    // rank order each-everywhere equals the encoder's lowest-rank-first
    // loop: merging a later pair replaces two symbols with one and never
    // deletes a symbol, so it can never make an EARLIER rank's components
    // newly adjacent — rank-order application never re-enables a lower
    // rank.
    // Training runs on the distinct-word/frequency table (vocabulary-
    // sized), mirroring Bpe.train; tie-breaks are (count DESC, a, b) in
    // binary order on both engines. q107 keeps the certificate form (md5
    // round trip + count sandwich); this query pins the exact counts.
    QueryDef(
      "q331_bpe_exact_oracle",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Bpe.train(docs, "text", numMerges = 30)
        Bpe.encodeTokens(docs, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(bpeReplaySql(30))
    ),

    // DSIR-style data selection (Xie et al. 2023) under the oracle: fit
    // hashed unigram+bigram bucket models for a target distribution
    // (lang='zh' — the minority class with real frequency signal) vs the
    // raw corpus, score every document by its average per-feature
    // half-bit-quantized log-likelihood ratio, and select the top 100.
    // The whole model fit replays in SQL because every log is the exact
    // integer floor(2*log2 n) — length(bin(n^2))-1 below 2^31, the
    // top-31-bit mantissa form above it (see Dsir.halfBitLog2 for why
    // float log2 is NOT cross-engine safe, why n^2 must never be taken
    // on a corpus-scale total, and why the +256-halfbit offset precedes
    // the integer division). `dsirQlSql` replays the identical two-regime
    // formula in DuckDB. Enrichment is real, not just replayed algebra:
    // DsirSpec pins >= 3x over base rate.
    QueryDef(
      "q332_dsir_select",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dsir.importanceWeights(docs, "doc_id", "text",
            targetCol = col("lang") === "zh", buckets = 8192)
          .orderBy(col("weight_x1000").desc, col("doc_id"))
          .limit(100)
      },
      Some(s"""WITH $dsirWeightsCtes
             |SELECT doc_id, n_features, weight_x1000 FROM weights
             |ORDER BY weight_x1000 DESC, doc_id LIMIT 100""".stripMargin)
    ),

    // DSIR end-to-end: weights -> importance RESAMPLE -> token-budgeted
    // training mix (closes the r12 "stops at weights" gap). The paper's
    // selection composition, each stage the library's own operator:
    // importanceWeights scores every doc; the score maps to an integer
    // keep-probability (clamped affine -- the negative-side div engine
    // divergence is hidden by the 0-clamp, see the keep_pct comment);
    // Sampling.weightedSample keeps each doc by its md5 key-hash (the
    // sampled SET is target-enriched, not just the top-k -- DsirSpec
    // pins >= 2x base rate); the sampled pool is cut to a 5000-token
    // budget in weight order via Sampling.selectByTokenBudget (two-phase
    // distributed prefix sum, no global window); output is the per-lang
    // mixture share of the final training mix. Every stage is integer/
    // md5-deterministic, so DuckDB replays the whole pipeline to the row.
    QueryDef(
      "q333_dsir_resample_mix",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val w = Dsir.importanceWeights(docs, "doc_id", "text",
          targetCol = col("lang") === "zh", buckets = 8192)
        val d = docs.select(col("doc_id"), col("lang"),
          expr("cast(size(filter(split(text, '\\\\s+'), x -> x != '')) as long)").as("n_toks"))
        // keep_pct: affine squash of weight into [0,100]. Spark `div`
        // truncates toward zero, DuckDB `//` floors -- they differ only
        // below zero, where greatest(0, _) clamps both to 0 identically.
        val enr = w.join(d, Seq("doc_id"))
          .withColumn("keep_pct", least(lit(100L),
            greatest(lit(0L), expr("(weight_x1000 + 2000) div 6"))))
        val samp = Sampling.weightedSample(enr, "doc_id", "keep_pct", maxWeight = 100)
        // weight-desc order with doc_id tiebreak, composed into the one
        // unique ascending key selectByTokenBudget requires. Stride 1e12:
        // |weight_x1000| stays under ~1e5 (a ±100-bit average is already
        // extreme), so |__ord| < 1e17 cannot overflow, and doc_ids are
        // unique below 1e12 — a corpus beyond that recomposes with a
        // struct order, not a bigger stride
        val ord = samp.withColumn("__ord",
          col("weight_x1000") * lit(-1000000000000L) + col("doc_id"))
        val cut = Sampling.selectByTokenBudget(ord, "__ord", "n_toks", budget = 5000L)
        val tot = cut.agg(sum("n_toks").as("__t"))
        cut.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
          .crossJoin(broadcast(tot))
          .select(col("lang"),
            col("n_docs").cast("long").as("n_docs"),
            col("n_tokens").cast("long").as("n_tokens"),
            expr("n_tokens * 10000 div __t").cast("long").as("token_share_x10000"))
          .orderBy("lang")
      },
      Some(s"""WITH $dsirWeightsCtes,
             |d AS (SELECT doc_id, lang,
             |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
             |  FROM documents),
             |enr AS (SELECT w.doc_id, d.lang, d.n_toks, w.weight_x1000,
             |    least(100, greatest(0, (w.weight_x1000 + 2000) // 6)) AS keep_pct
             |  FROM weights w JOIN d USING (doc_id)),
             |samp AS (SELECT * FROM enr
             |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT * 100
             |        < keep_pct * 4294967296),
             |ord AS (SELECT *, -weight_x1000 * 1000000000000 + doc_id AS o FROM samp),
             |run AS (SELECT *, sum(n_toks) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM ord),
             |cut AS (SELECT * FROM run WHERE cum <= 5000),
             |tot2 AS (SELECT sum(n_toks) AS t FROM cut)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |  CAST(sum(n_toks) * 10000 // (SELECT t FROM tot2) AS BIGINT) AS token_share_x10000
             |FROM cut GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    // The accounting q257's maxBucket cap owes (the "no silent caps"
    // rule): truncated-prefix-token and foregone-posting counts from the
    // SAME uncapped postings build the join runs, for two configs — the
    // exact config q257 ships (3-word shingles, cap 500: zero truncation
    // at this scale, certifying that join COMPLETE at its threshold) and
    // a deliberately hot one (unigrams, cap 10: the corpus's common words
    // overflow, so the non-zero counting path is exercised on real data,
    // not just the spec fixture). A qualifying pair can be missed only
    // via postings counted here — see Dedup.prefixFilterPairs's recall
    // condition; OperatorsSpec proves the miss-is-counted property on an
    // overflowing fixture.
    QueryDef(
      "q334_prefix_cap_report",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.prefixFilterCapReport(docs, "doc_id", "text",
            minJaccardPct = 50, maxBucket = 500, shingleWords = 3)
          .withColumn("config", lit("q257_3gram_cap500"))
          .unionByName(
            Dedup.prefixFilterCapReport(docs, "doc_id", "text",
                minJaccardPct = 50, maxBucket = 10, shingleWords = 1)
              .withColumn("config", lit("unigram_cap10")))
          .select(col("config"), col("n_prefix_tokens"), col("n_prefix_postings"),
            col("n_truncated_tokens"), col("n_foregone_postings"))
          .orderBy("config")
      },
      Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
             |  FROM documents),
             |s3 AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(range(1, len(w) - 1),
             |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(w[i] || ' ' || w[i+1] || ' ' || w[i+2], ''),
             |               c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w WHERE len(w) >= 3),
             |t3 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM s3),
             |d3 AS (SELECT tok, count(*) AS dfc FROM t3 GROUP BY 1),
             |r3 AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM t3 JOIN d3 USING (tok)),
             |p3 AS (SELECT tok FROM r3 WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |b3 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM p3 GROUP BY 1),
             |s1 AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(w,
             |      t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w),
             |t1 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM s1),
             |d1 AS (SELECT tok, count(*) AS dfc FROM t1 GROUP BY 1),
             |r1 AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM t1 JOIN d1 USING (tok)),
             |p1 AS (SELECT tok FROM r1 WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |b1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM p1 GROUP BY 1)
             |SELECT 'q257_3gram_cap500' AS config,
             |  CAST(count(*) AS BIGINT) AS n_prefix_tokens,
             |  CAST(sum(c) AS BIGINT) AS n_prefix_postings,
             |  CAST(sum(CASE WHEN c > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated_tokens,
             |  CAST(sum(CASE WHEN c > 500 THEN c - 500 ELSE 0 END) AS BIGINT) AS n_foregone_postings
             |FROM b3
             |UNION ALL
             |SELECT 'unigram_cap10',
             |  CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
             |  CAST(sum(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(sum(CASE WHEN c > 10 THEN c - 10 ELSE 0 END) AS BIGINT)
             |FROM b1
             |ORDER BY config""".stripMargin)
    ),

    // Prefix-filter pairs under a BINDING cap: the cap/position-filter
    // interplay certified value-exact, not argued (r13 review: when the
    // cap binds, the position filter is no longer a sound superset
    // reduction, so engine and oracle must apply IDENTICAL candidate
    // bounds — this config makes the cap bind on 17 of 24 prefix tokens
    // at sf0.01, and the oracle replays cap, length bound and positional
    // bound formula-identically). Complements q334 (which certifies the
    // shipped q257 config never truncates) and the OperatorsSpec fixture
    // (which pins the miss-is-counted property).
    QueryDef(
      "q335_prefix_binding_cap",
      (s, dir) =>
        orderedOut(Dedup.prefixFilterPairs(t(s, dir, "documents"), "doc_id", "text",
            minJaccardPct = 60, maxBucket = 10, shingleWords = 1),
          "a_doc_id", "b_doc_id"),
      Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
             |  FROM documents),
             |sets AS (SELECT doc_id, list_sort(list_distinct(list_transform(w,
             |    t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts FROM w),
             |toks AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM sets),
             |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM toks GROUP BY 1),
             |rk AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM toks JOIN dfreq USING (tok)),
             |pre AS (SELECT doc_id, tok, n, rn FROM rk WHERE rn <= n - (n * 60 + 99) // 100 + 1),
             |cap AS (SELECT doc_id, tok, n, rn FROM (
             |    SELECT doc_id, tok, n, rn,
             |      row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS brn
             |    FROM pre) WHERE brn <= 10),
             |cand AS (SELECT DISTINCT a.doc_id AS ad, b.doc_id AS bd
             |  FROM cap a JOIN cap b USING (tok) WHERE a.doc_id < b.doc_id
             |    AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 60
             |    AND (1 + least(a.n - a.rn, b.n - b.rn)) * 160 >= (a.n + b.n) * 60),
             |w2 AS (SELECT doc_id, ts AS ws, CAST(len(ts) AS BIGINT) AS n FROM sets),
             |v AS (SELECT ad, bd, x.n AS a_n, y.n AS b_n,
             |    CAST(len(list_intersect(x.ws, y.ws)) AS BIGINT) AS inter_n
             |  FROM cand JOIN w2 x ON x.doc_id = ad JOIN w2 y ON y.doc_id = bd
             |  WHERE least(x.n, y.n) * 100 >= greatest(x.n, y.n) * 60)
             |SELECT ad AS a_doc_id, bd AS b_doc_id, a_n, b_n, inter_n,
             |  CAST(a_n + b_n - inter_n AS BIGINT) AS union_n,
             |  CAST(inter_n * 100 // (a_n + b_n - inter_n) AS BIGINT) AS jaccard_pct
             |FROM v WHERE inter_n * 160 >= (a_n + b_n) * 60
             |ORDER BY a_doc_id, b_doc_id""".stripMargin)
    ),

    // C4-style blocklist gate (r14): C4 drops any page containing a term
    // from its fixed "bad words" list; RefinedWeb/FineWeb run the same
    // shape with curated lists. One- and two-token phrases, matched
    // case-insensitively — entirely map-side (literal-array contains in
    // the codegen'd filter, bigrams via zip_with — no explode, no join,
    // no shuffle), so the gate composes with the scan at any corpus size.
    // Terms chosen from the fixture vocabulary so both hit kinds occur.
    QueryDef(
      "q336_blocklist_filter",
      (s, dir) =>
        orderedOut(
          TextAnalysis.blocklistHits(tParallel(s, dir, "documents"), "doc_id", "text",
            phrases = Seq("dup", "fast", "table hash", "merge group")),
          "doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |hits AS (SELECT doc_id,
             |    CAST(len(list_filter(toks, t -> list_contains(['dup', 'fast'], t))) AS BIGINT) AS n_uni_hits,
             |    CAST(len(list_filter(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
             |      b -> list_contains(['table hash', 'merge group'], b))) AS BIGINT) AS n_bi_hits
             |  FROM tk)
             |SELECT doc_id, n_uni_hits, n_bi_hits,
             |  CAST(n_uni_hits + n_bi_hits > 0 AS BIGINT) AS blocked
             |FROM hits ORDER BY doc_id""".stripMargin)
    ),

    // True character-level Shannon entropy in half-bits (r14) — the
    // gibberish/boilerplate screen, upgrading q149's log-free Gini–Simpson
    // diversity now that r13's integer half-bit log (floor(2·log2 n) =
    // length(bin(n²))−1, cross-engine exact) makes real entropy gateable:
    // numer = N·hb(N) − Σ c·hb(c) over run counts c of N codepoints,
    // entropy ≈ numer/2N bits/char. Spark computes every run count
    // MAP-SIDE via one codegen'd aggregate over the sorted codepoint
    // array (no per-character explode, no (doc,char) shuffle — nothing
    // leaves the row); the oracle replays the identical formula the
    // relational way (unnest + GROUP BY), so the gate also certifies the
    // HOF run-length fold against the set-semantics definition.
    QueryDef(
      "q337_entropy_halfbit",
      (s, dir) =>
        orderedOut(
          TextAnalysis.charEntropyHalfBits(tParallel(s, dir, "documents"), "doc_id", "text"),
          "doc_id"),
      Some("""WITH chars AS (SELECT doc_id,
             |    unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch
             |  FROM documents),
             |counts AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
             |  FROM chars GROUP BY 1, 2),
             |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_cp,
             |    CAST(sum(c * (length(to_base(CAST(c * c AS BIGINT), 2)) - 1)) AS BIGINT) AS sum_chb
             |  FROM counts GROUP BY 1),
             |num AS (SELECT d.doc_id,
             |    CAST(coalesce(p.n_cp, 0) AS BIGINT) AS n_cp,
             |    CAST(coalesce(p.sum_chb, 0) AS BIGINT) AS sum_chb,
             |    CAST(CASE WHEN coalesce(p.n_cp, 0) = 0 THEN 0
             |      ELSE p.n_cp * (length(to_base(CAST(p.n_cp * p.n_cp AS BIGINT), 2)) - 1) - p.sum_chb
             |      END AS BIGINT) AS ent_numer_hb
             |  FROM documents d LEFT JOIN per p USING (doc_id))
             |SELECT doc_id, n_cp, sum_chb, ent_numer_hb,
             |  CAST(CASE WHEN n_cp = 0 THEN 0 ELSE ent_numer_hb // n_cp END AS BIGINT) AS ent_halfbits
             |FROM num ORDER BY doc_id""".stripMargin)
    ),

    // PSI drift in integer half-bits (r14): the industry-standard drift
    // score (the one categoricalDrift's scaladoc said would "diverge in
    // the last bits" as a float) made engine-exact — +1-smoothed ppb
    // proportions via multiply-then-div, per-term (p−q)·(hb(p)−hb(q))
    // with the r13 half-bit log; total ≈ 2e9/ln2 × PSI(nats), within 4%
    // of float truth on this fixture, every term ≥ 0. Head side is the
    // parity recipe's planted mutation (drop %131, mutate %97) so the
    // drifted category dominates the score. Fourth drift lens next to
    // TV (q71/q77), KS (q264) and vocab drift.
    QueryDef(
      "q338_psi_drift",
      (s, dir) => {
        val base = t(s, dir, "orders")
        val head = base.filter(col("o_orderkey") % 131 =!= 0)
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 97 === 0, lit("X-DRIFT"))
              .otherwise(col("o_orderpriority")))
        orderedOut(
          graft.engine.DiffEngine.psiDrift(base, head, "o_orderpriority"),
          "value")
      },
      Some("""WITH base AS (SELECT o_orderpriority AS value, CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |head0 AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'X-DRIFT'
             |    ELSE o_orderpriority END AS value
             |  FROM orders WHERE o_orderkey % 131 <> 0),
             |head AS (SELECT value, CAST(count(*) AS BIGINT) AS c FROM head0 GROUP BY 1),
             |j AS (SELECT coalesce(b.value, h.value) AS value,
             |    CAST(coalesce(b.c, 0) AS BIGINT) AS base_n,
             |    CAST(coalesce(h.c, 0) AS BIGINT) AS head_n
             |  FROM base b FULL OUTER JOIN head h ON b.value IS NOT DISTINCT FROM h.value),
             |k AS (SELECT CAST(count(*) AS BIGINT) AS kk,
             |    CAST(sum(base_n) AS BIGINT) AS nb, CAST(sum(head_n) AS BIGINT) AS nh FROM j),
             |p AS (SELECT value, base_n, head_n,
             |    CAST((base_n + 1) * 1000000000 // (nb + kk) AS BIGINT) AS p_ppb,
             |    CAST((head_n + 1) * 1000000000 // (nh + kk) AS BIGINT) AS q_ppb
             |  FROM j, k)
             |SELECT value, base_n, head_n, p_ppb, q_ppb,
             |  CAST((p_ppb - q_ppb) * ((length(to_base(p_ppb * p_ppb, 2)) - 1)
             |    - (length(to_base(q_ppb * q_ppb, 2)) - 1)) AS BIGINT) AS psi_term_hb
             |FROM p ORDER BY value""".stripMargin)
    ),

    // AQE skew-join gate (r14): the third AQE mechanism the 100 TB story
    // leans on, made visible to the round report like the DPP gate
    // (q286) and the bucketed-join gate (q30x). A planted 2/3-hot key
    // forces a skewed sort-merge join (broadcast disabled, thresholds
    // scaled to fixture bytes, forceOptimizeSkewedJoin because the
    // downstream aggregate would otherwise veto the extra shuffle); the
    // output carries the join's DATA truth per event_type (DuckDB
    // replays it) plus the executed-plan markers pinned to 1 — a Spark
    // upgrade or conf drift that stops splitting the hot partition
    // fails the ROUND. Found while building this: skew split operates
    // on per-MAPPER shuffle blocks, so a single-file scan (one mapper)
    // leaves the hot partition one unsplittable block and AQE stays
    // silent — the same single-file hazard Par.ensureParallel guards,
    // resurfacing at the AQE layer; the explicit repartition(32) below
    // is what makes the skew splittable. Session confs are saved and
    // restored in a finally so the gate cannot leak its thresholds into
    // the rest of the sweep.
    QueryDef(
      "q339_aqe_skew_gate",
      (s, dir) => {
        import s.implicits._
        val keys = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.forceOptimizeSkewedJoin")
        val prev = keys.map(k => k -> s.conf.getOption(k))
        try {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
          s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
          s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
          s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
          val fact = t(s, dir, "events").repartition(32)
            .select(
              when(col("user_id") % 3 =!= 0, lit(0L))
                .otherwise(col("user_id")).as("k"),
              col("event_type"))
          val dim = s.range(0, 4000).select(col("id").as("k"))
            .withColumn("w", (col("k") % 7 + 1).cast("long"))
          val pipe = fact.join(dim, "k")
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
          val rows = pipe.collect()
          val plan = pipe.queryExecution.executedPlan.toString
          val skewJoin = if (plan.contains("skew=true")) 1L else 0L
          val skewRead = if (plan.contains("skewed")) 1L else 0L
          rows.map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("sw"),
              skewJoin, skewRead)).toSeq
            .toDF("event_type", "n", "sw", "skew_join_marked", "skewed_read_marked")
            .orderBy("event_type")
        } finally prev.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None)    => s.conf.unset(k)
        }
      },
      Some("""SELECT event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(k % 7 + 1) AS BIGINT) AS sw,
             |  CAST(1 AS BIGINT) AS skew_join_marked,
             |  CAST(1 AS BIGINT) AS skewed_read_marked
             |FROM (SELECT CASE WHEN user_id % 3 <> 0 THEN 0 ELSE user_id END AS k, event_type
             |      FROM events) f
             |JOIN range(0, 4000) r ON f.k = r.range
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Anchor-text extraction (r14): the WAT-style link-context field —
    // q267 extracts the bare href targets, this pairs each with its
    // anchor TEXT, the classic query-document relevance signal (anchor
    // text describes the TARGET page). Planted markup exercises the
    // normalization contract: nested inline tags stripped, multi-line
    // whitespace collapsed (`read\n <b>more</b>` ≡ `read more`), a
    // fragment-only link excluded, an empty-bodied anchor kept with ''
    // text. One codegen'd regex pass per capture group, zipped
    // positionally (both passes match the identical span sequence);
    // map-side until the final count. Oracle replays the planted
    // arithmetic, like every crawl-family gate.
    QueryDef(
      "q340_anchor_text",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        def pid(j: Int) = (col("doc_id") * 7 + j * 13) % 997
        def host(j: Int) = concat(lit("h"), (pid(j) % 23).cast("string"), lit(".example.com"))
        def a1 = concat(lit("<a href=\"http://"), host(1), lit("/p/"), pid(1).cast("string"),
          lit("\">read\n <b>more</b>  p"), pid(1).cast("string"), lit("</a>"))
        // a2 plants data-href AND xlink:href BEFORE the real href: the
        // attribute-name lookbehind must skip both or the pair binds to
        // the wrong URL and the oracle hash breaks (r14 advice + the r15
        // review's ':' hole, both gated here).
        def a2 = concat(
          lit("<a class='x' data-href='http://decoy.example.net/d' " +
            "xlink:href='http://decoy2.example.net/e' href='http://"),
          host(2), lit("/q/"), pid(2).cast("string"), lit("'></a>"))
        val html = concat(lit("<html><body>"), a1,
          lit("<a href=\"#top\">skip</a>"), a2, lit("</body></html>"))
        d.withColumn("__html", html)
          .select(explode(UrlTools.extractAnchors("__html")).as("__a"))
          .select(
            regexp_extract(col("__a.href"), "^https?://([^/]+)", 1).as("dst_host"),
            col("__a.anchor").as("anchor"))
          .groupBy("dst_host", "anchor")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("dst_host", "anchor")
      },
      Some("""WITH l AS (SELECT doc_id, unnest([1, 2]) AS j FROM documents),
             |e AS (SELECT 'h' || (((doc_id * 7 + j * 13) % 997) % 23) || '.example.com' AS dst_host,
             |    CASE WHEN j = 1 THEN 'read more p' || ((doc_id * 7 + 13) % 997) ELSE '' END AS anchor
             |  FROM l)
             |SELECT dst_host, anchor, CAST(count(*) AS BIGINT) AS n
             |FROM e GROUP BY 1, 2 ORDER BY dst_host, anchor""".stripMargin)
    ),

    // TextTiling-style semantic boundaries (r14): Hearst's topic-shift
    // detector in the integer-exact variant this engine can gate —
    // Jaccard ×1e6 adjacent-block cohesion (cosine needs a sqrt no two
    // engines reproduce bit-exactly), one-step neighbor depths, boundary
    // at ≥3/4 of the doc's max depth. Semantic chunking for RAG/context
    // splits, next to q144's fixed-offset chunker. Entirely map-side
    // HOF chain (no explode, no shuffle before the sort); the oracle
    // replays block sets, scores, depths and flags list-op by list-op.
    QueryDef(
      "q341_semantic_chunking",
      (s, dir) =>
        orderedOut(
          TextAnalysis.semanticBoundaries(tParallel(s, dir, "documents"),
            "doc_id", "text", blockTokens = 20),
          "doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |s1 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nt,
             |    CAST((len(toks) + 19) // 20 AS BIGINT) AS nb FROM tk),
             |s2 AS (SELECT doc_id, nt, nb,
             |    list_transform(range(1, CAST(nb AS INT) + 1),
             |      b -> list_distinct(toks[(b-1)*20 + 1 : b*20])) AS sets FROM s1),
             |s3 AS (SELECT doc_id, nt, nb,
             |    CASE WHEN nb <= 1 THEN CAST([] AS BIGINT[])
             |         ELSE list_transform(range(1, CAST(nb AS INT)),
             |           g -> CAST(len(list_intersect(sets[g], sets[g+1])) AS BIGINT) * 1000000
             |                // CAST(len(list_distinct(list_concat(sets[g], sets[g+1]))) AS BIGINT)) END AS scores
             |  FROM s2),
             |s4 AS (SELECT doc_id, nt, nb, scores, CAST(len(scores) AS BIGINT) AS ng FROM s3),
             |s5 AS (SELECT doc_id, nt, nb, ng,
             |    CASE WHEN ng = 0 THEN CAST([] AS BIGINT[])
             |         ELSE list_transform(range(1, CAST(ng AS INT) + 1),
             |           g -> greatest(0, CASE WHEN g > 1 THEN scores[CAST(g AS INT)-1] - scores[CAST(g AS INT)] ELSE 0 END)
             |              + greatest(0, CASE WHEN g < ng THEN scores[CAST(g AS INT)+1] - scores[CAST(g AS INT)] ELSE 0 END)) END AS depths
             |  FROM s4),
             |s6 AS (SELECT doc_id, nt, nb, ng, depths,
             |    CASE WHEN ng = 0 THEN CAST(0 AS BIGINT)
             |         ELSE CAST(list_max(depths) AS BIGINT) END AS max_depth FROM s5),
             |s7 AS (SELECT doc_id, nt, nb, ng, max_depth,
             |    list_filter(list_transform(range(1, CAST(ng AS INT) + 1),
             |      g -> CASE WHEN depths[CAST(g AS INT)] > 0 AND 4 * depths[CAST(g AS INT)] >= 3 * max_depth
             |                THEN g ELSE -1 END), x -> x > 0) AS bidx
             |  FROM s6)
             |SELECT doc_id, nt AS n_tokens, nb AS n_blocks, ng AS n_gaps, max_depth,
             |  CAST(len(bidx) AS BIGINT) AS n_boundaries,
             |  CAST(coalesce(bidx[1], -1) AS BIGINT) AS first_boundary
             |FROM s7 ORDER BY doc_id""".stripMargin)
    ),

    // Similarity-join router (r15, VERDICT r13 #1 / r14 #2): the launch
    // decision for a 100 TB near-dup job, made from one postings-stats
    // pass instead of a dead executor. Two configs on the REAL corpus:
    // q257's shipped 3-gram t=50 (diverse shingle space, predicted mass
    // 1.6k pairs, well under the 100/doc budget -> 'prefix_filter') and
    // unigrams at the same threshold (the fixture's 31-word vocabulary is
    // exactly the degenerate regime the r13 probe measured at 100x:
    // predicted mass 1.13M pairs for 500 docs -> 'minhash_lsh'). The
    // oracle replays the postings build, both clamped quadratic masses
    // and the verdict CASE formula-identically; the masses publish as
    // strings (engine side sums DECIMAL(38,0), oracle HUGEINT — the one
    // operator that must not overflow is the one sizing the overflow).
    QueryDef(
      "q342_similarity_join_advisor",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cols = Seq("n_docs", "n_distinct_tokens", "max_df", "pred_pairs_index",
          "n_prefix_tokens", "n_prefix_postings", "max_prefix_df",
          "pred_pairs_prefix", "pair_budget", "verdict")
        Dedup.similarityJoinAdvisor(docs, "doc_id", "text",
            minJaccardPct = 50, maxPairsPerDoc = 100, shingleWords = 3)
          .withColumn("config", lit("q257_3gram_t50"))
          .unionByName(
            Dedup.similarityJoinAdvisor(docs, "doc_id", "text",
                minJaccardPct = 50, maxPairsPerDoc = 100, shingleWords = 1)
              .withColumn("config", lit("unigram_t50")))
          .select((col("config") +: cols.map(col)): _*)
          .orderBy("config")
      },
      Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
             |  FROM documents),
             |s3 AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(range(1, len(w) - 1),
             |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(w[i] || ' ' || w[i+1] || ' ' || w[i+2], ''),
             |               c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w WHERE len(w) >= 3),
             |t3 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM s3),
             |d3 AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM t3 GROUP BY 1),
             |r3 AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM t3 JOIN d3 USING (tok)),
             |p3 AS (SELECT tok FROM r3 WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |b3 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM p3 GROUP BY 1),
             |s1 AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(w,
             |      t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w),
             |t1 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM s1),
             |d1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM t1 GROUP BY 1),
             |r1 AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM t1 JOIN d1 USING (tok)),
             |p1 AS (SELECT tok FROM r1 WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |b1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM p1 GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
             |i3 AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct_tokens,
             |    CAST(max(dfc) AS BIGINT) AS max_df,
             |    sum(least(dfc, 3000000000) * (least(dfc, 3000000000) - 1) // 2) AS ppi FROM d3),
             |g3 AS (SELECT CAST(count(*) AS BIGINT) AS n_prefix_tokens,
             |    CAST(sum(c) AS BIGINT) AS n_prefix_postings,
             |    CAST(max(c) AS BIGINT) AS max_prefix_df,
             |    sum(least(c, 3000000000) * (least(c, 3000000000) - 1) // 2) AS ppp FROM b3),
             |i1 AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct_tokens,
             |    CAST(max(dfc) AS BIGINT) AS max_df,
             |    sum(least(dfc, 3000000000) * (least(dfc, 3000000000) - 1) // 2) AS ppi FROM d1),
             |g1 AS (SELECT CAST(count(*) AS BIGINT) AS n_prefix_tokens,
             |    CAST(sum(c) AS BIGINT) AS n_prefix_postings,
             |    CAST(max(c) AS BIGINT) AS max_prefix_df,
             |    sum(least(c, 3000000000) * (least(c, 3000000000) - 1) // 2) AS ppp FROM b1)
             |SELECT 'q257_3gram_t50' AS config, n_docs, n_distinct_tokens, max_df,
             |  CAST(ppi AS VARCHAR) AS pred_pairs_index,
             |  n_prefix_tokens, n_prefix_postings, max_prefix_df,
             |  CAST(ppp AS VARCHAR) AS pred_pairs_prefix,
             |  CAST(n_docs * 100 AS BIGINT) AS pair_budget,
             |  CASE WHEN ppp <= n_docs * 100 THEN 'prefix_filter' ELSE 'minhash_lsh' END AS verdict
             |FROM nd, i3, g3
             |UNION ALL
             |SELECT 'unigram_t50', n_docs, n_distinct_tokens, max_df,
             |  CAST(ppi AS VARCHAR),
             |  n_prefix_tokens, n_prefix_postings, max_prefix_df,
             |  CAST(ppp AS VARCHAR),
             |  CAST(n_docs * 100 AS BIGINT),
             |  CASE WHEN ppp <= n_docs * 100 THEN 'prefix_filter' ELSE 'minhash_lsh' END
             |FROM nd, i1, g1
             |ORDER BY config""".stripMargin)
    ),

    // DSIR multi-domain mixture (r15, VERDICT r13 #5 / r14 #6): two
    // per-domain importance models (zh, en) fitted from ONE shared
    // feature pass, composed with integer mixture weights 700:300 — the
    // "40% code, 30% encyclopedic..." training-mix recipe as exact
    // integer algebra. Every per-domain weight equals the single-target
    // operator's output (DsirSpec pins the equality); the mixture is
    // positivity-offset integer division, so Spark div == DuckDB //.
    // The oracle runs one prefixed weights-CTE chain per domain (the
    // q332/q333 chain parameterized) and joins them; gated on the
    // doc_id % 17 slice to keep the dump bounded while still covering
    // every lang and length band.
    QueryDef(
      "q343_dsir_multidomain",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dsir.multiDomainWeights(docs, "doc_id", "text",
            domains = Seq("zh" -> (col("lang") === "zh"), "en" -> (col("lang") === "en")),
            mixX1000 = Seq(700L, 300L))
          .filter(col("doc_id") % 17 === 0)
          .orderBy("doc_id")
      },
      Some(s"""WITH ${dsirDomainCtes("z_", "lang = 'zh'")},
             |${dsirDomainCtes("e_", "lang = 'en'")}
             |SELECT z.doc_id, z.n_features,
             |  z.weight_x1000 AS w_zh_x1000, e.weight_x1000 AS w_en_x1000,
             |  CAST((700 * (z.weight_x1000 + 256000) + 300 * (e.weight_x1000 + 256000)) // 1000
             |       - 256000 AS BIGINT) AS mix_weight_x1000
             |FROM z_weights z JOIN e_weights e USING (doc_id)
             |WHERE doc_id % 17 = 0
             |ORDER BY doc_id""".stripMargin)
    ),

    // Incremental ANN maintenance (r15, VERDICT r13 #6 / r14 #7): a
    // frozen IVF index (fitted on the base 75% of vectors) absorbs the
    // remaining 25% as an assignment-only batch, and the certificate
    // quantifies what freezing cost: how much of the space a refit
    // re-tiles (n_moved / moved_pct_x100) and the probe recall under
    // frozen vs refit centroids against brute-force truth. On this
    // fixture the answer argues FOR the certificate's existence: the
    // frozen index re-tiles 54.8% on refit and serves 40 vs 80 recall
    // for a batch probe — exactly the silent rot incrementalIvfAssign
    // alone would ship. Oracle replays both Lloyd chains (q74's CTE
    // machinery, parameterized by source and prefix), both assignment
    // passes, the truth/candidate top-k sorts and the integer recall
    // algebra.
    QueryDef(
      "q344_incremental_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.incrementalIvfDrift(
          emb.filter(col("vec_id") % 4 =!= 3),
          emb.filter(col("vec_id") % 4 === 3),
          "vec_id", "embedding",
          nlist = 16, kmeansIters = 2, probeId = 3L, k = 10, nprobe = 4)
      },
      Some {
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def assign(src: String, cent: String, out: String) =
          s"""$out AS (SELECT vec_id, embedding, cid FROM (
             |    SELECT e.vec_id, e.embedding, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM $src e CROSS JOIN $cent c)
             |  WHERE rn = 1)""".stripMargin
        def lloyd(asg: String, prev: String, out: String, m: String, n: String) =
          s"""$m AS (SELECT cid, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM $asg, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
             |$n AS (SELECT cid, list(mv ORDER BY i) AS cv FROM $m GROUP BY cid),
             |$out AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM $prev c LEFT JOIN $n n USING (cid))""".stripMargin
        def chain(src: String, p: String) =
          s"""${p}cent0 AS (SELECT vec_id AS cid, embedding AS cv FROM $src ORDER BY vec_id LIMIT 16),
             |${assign(src, s"${p}cent0", s"${p}asg0")},
             |${lloyd(s"${p}asg0", s"${p}cent0", s"${p}cent1", s"${p}m1", s"${p}n1")},
             |${assign(src, s"${p}cent1", s"${p}asg1")},
             |${lloyd(s"${p}asg1", s"${p}cent1", s"${p}cent2", s"${p}m2", s"${p}n2")}""".stripMargin
        def ivftop(p: String, cent: String, asg: String) =
          s"""${p}pl AS (SELECT cid FROM (SELECT c.cid, ${cos("c.cv", "pv")} AS pc FROM $cent c CROSS JOIN p)
             |  ORDER BY pc DESC, cid LIMIT 4),
             |${p}top AS (SELECT vec_id FROM (
             |  SELECT a.vec_id, ${cos("a.embedding", "pv")} AS cs
             |  FROM $asg a JOIN ${p}pl USING (cid) CROSS JOIN p WHERE a.vec_id <> 3
             |  ORDER BY cs DESC, vec_id LIMIT 10))""".stripMargin
        s"""WITH b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 3),
           |u AS (SELECT vec_id, embedding FROM embeddings),
           |${chain("b", "f")},
           |${chain("u", "r")},
           |${assign("u", "fcent2", "fau")},
           |${assign("u", "rcent2", "rau")},
           |mv AS (SELECT CAST(count(*) AS BIGINT) AS n_union,
           |    CAST(sum(CASE WHEN x.cid <> y.cid THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
           |  FROM fau x JOIN rau y USING (vec_id)),
           |p AS (SELECT embedding AS pv FROM u WHERE vec_id = 3),
           |truth AS (SELECT vec_id FROM (
           |  SELECT vec_id, ${cos("embedding", "pv")} AS cs FROM u CROSS JOIN p WHERE vec_id <> 3
           |  ORDER BY cs DESC, vec_id LIMIT 10)),
           |${ivftop("f2", "fcent2", "fau")},
           |${ivftop("r2", "rcent2", "rau")},
           |rf AS (SELECT CAST(coalesce(count(*), 0) * 100 // 10 AS BIGINT) AS recall_frozen_x100 FROM truth JOIN f2top USING (vec_id)),
           |rr AS (SELECT CAST(coalesce(count(*), 0) * 100 // 10 AS BIGINT) AS recall_refit_x100 FROM truth JOIN r2top USING (vec_id)),
           |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM b),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_batch FROM u WHERE vec_id % 4 = 3)
           |SELECT n_base, n_batch, n_union, n_moved,
           |  CAST(n_moved * 10000 // n_union AS BIGINT) AS moved_pct_x100,
           |  recall_frozen_x100, recall_refit_x100
           |FROM nb, nt, mv, rf, rr""".stripMargin
      }
    ),

    // LSH candidate-mass accounting (r15): the q334-shaped "no silent
    // caps" report for the OTHER near-dup path, and the second half of
    // q342's routing story — the advisor prices the exact join, this
    // prices the LSH join from the same corpus (per-bucket C(sz,2) over
    // the band buckets q32 actually joins). Two configs: q32's shipped
    // cap (nothing truncated at this scale — the certificate that the
    // pair set is the UNCAPPED one) and a deliberately binding cap=2
    // (the skipped-mass path exercised on real data). Oracle reuses the
    // exact band CTEs of q32's oracle, so both reports derive from the
    // same signatures.
    QueryDef(
      "q345_lsh_candidate_mass",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.lshCandidateMass(docs, "doc_id", "text",
            numHashes = 8, bandSize = 2, shingleK = 3, maxBucketSize = 500)
          .withColumn("config", lit("q32_cap500"))
          .unionByName(
            Dedup.lshCandidateMass(docs, "doc_id", "text",
                numHashes = 8, bandSize = 2, shingleK = 3, maxBucketSize = 2)
              .withColumn("config", lit("cap2_binding")))
          .select(col("config"), col("n_buckets"), col("n_pair_buckets"),
            col("n_capped_buckets"), col("pred_pairs_emitted"),
            col("pairs_skipped_capped"))
          .orderBy("config")
      },
      Some {
        def block(cap: Int, label: String) =
          s"""SELECT '$label' AS config,
             |  CAST(count(*) AS BIGINT) AS n_buckets,
             |  CAST(sum(CASE WHEN sz BETWEEN 2 AND $cap THEN 1 ELSE 0 END) AS BIGINT) AS n_pair_buckets,
             |  CAST(sum(CASE WHEN sz > $cap THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_buckets,
             |  CAST(sum(CASE WHEN sz BETWEEN 2 AND $cap
             |       THEN least(sz, 3000000000) * (least(sz, 3000000000) - 1) // 2 ELSE 0 END) AS VARCHAR) AS pred_pairs_emitted,
             |  CAST(sum(CASE WHEN sz > $cap
             |       THEN least(sz, 3000000000) * (least(sz, 3000000000) - 1) // 2 ELSE 0 END) AS VARCHAR) AS pairs_skipped_capped
             |FROM sizes""".stripMargin
        s"""WITH $duckMinhashBandsCtes,
           |sizes AS (SELECT band_idx, band_hash, CAST(count(*) AS BIGINT) AS sz
           |  FROM bands GROUP BY 1, 2)
           |${block(500, "q32_cap500")}
           |UNION ALL
           |${block(2, "cap2_binding")}
           |ORDER BY config""".stripMargin
      }
    ),

    // True bigram cross-entropy in half-bits (r15): the CCNet-style LM
    // perplexity gate as exact integer algebra — the half-bit log that
    // made q332's LLR and q337's entropy engine-exact now computes the
    // real −2·log2 p̂(w2|w1) with add-one smoothing, replacing rank
    // stand-ins (q103/q112) with the actual quantity pipelines threshold
    // on. Oracle replays gram explode, bigram/context counts, the
    // continuation vocabulary and the two-regime hb formula term by term.
    QueryDef(
      "q346_lm_cross_entropy",
      (s, dir) =>
        orderedOut(
          TextAnalysis.lmCrossEntropyHalfBits(tParallel(s, dir, "documents"),
            "doc_id", "text"),
          "doc_id"),
      Some(raw"""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
             |bg AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
             |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) ix),
             |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
             |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
             |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |    CAST(sum(${dsirQlSql("c1 + v")}
             |       - ${dsirQlSql("c12 + 1")}) AS BIGINT) AS xent_num_hb
             |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
             |  GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, xent_num_hb,
             |  CAST(xent_num_hb // n_bigrams AS BIGINT) AS xent_halfbits
             |FROM s ORDER BY doc_id""".stripMargin)
    ),

    // Planted-canary leakage across train/val/test (r15b): the
    // memorization-risk gate — canary markers (the secret-sharer setup)
    // planted into docs with doc_id%7<2 (canary id = doc_id%23, so most
    // canaries recur across docs and SOME straddle the q115 hash split),
    // then audited per canary: doc count, split count, the split list,
    // and the leaked flag a release gate fails on. Extraction is one
    // regexp at the scan; the only shuffle groups on the (tiny, planted)
    // canary vocabulary.
    QueryDef(
      "q347_canary_leakage",
      (s, dir) => {
        val planted = t(s, dir, "documents")
          .withColumn("__t", when(col("doc_id") % 7 < 2,
              concat(col("text"), lit(" CANARY-"), (col("doc_id") % 23).cast("string")))
            .otherwise(col("text")))
        TextAnalysis.canaryLeakage(
          Sampling.threeWaySplit(planted, "doc_id", valPct = 10, testPct = 10),
          "doc_id", "__t", "split", "CANARY-[0-9]+")
          .orderBy("canary")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN doc_id % 7 < 2
             |         THEN text || ' CANARY-' || CAST(doc_id % 23 AS VARCHAR) ELSE text END AS t,
             |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
             |        FROM documents)),
             |c AS (SELECT doc_id, split,
             |    unnest(regexp_extract_all(t, 'CANARY-[0-9]+')) AS canary FROM d)
             |SELECT canary, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
             |  array_to_string(list_sort(list_distinct(list(split))), ',') AS splits,
             |  CAST(CASE WHEN count(DISTINCT split) > 1 THEN 1 ELSE 0 END AS BIGINT) AS leaked
             |FROM c GROUP BY canary ORDER BY canary""".stripMargin)
    ),

    // Cross-source exact-duplication matrix (r15b): how much of feed A is
    // ALSO in feed B — the provenance/licensing datasheet q131's
    // per-source dup rate can't see. The base fixture has zero exact dups
    // (q30), so the gate runs on a planted mirror corpus (groups of 4
    // consecutive doc_ids share the leader's text, sources mix within a
    // group); the OPERATOR is corpus-agnostic. No doc pair is ever
    // materialized — the join buckets on content hash with width ≤
    // #sources.
    QueryDef(
      "q348_cross_source_dups",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs
          .select(col("doc_id"), col("source"),
            (col("doc_id") - col("doc_id") % 4).as("__lid"))
          .join(docs.select(col("doc_id").as("__lid"), col("text").as("__lt")), "__lid")
          .select(col("doc_id"), col("source"), col("__lt").as("text"))
        Dedup.crossSourceDupMatrix(corpus, "text", "source")
          .orderBy("src_a", "src_b")
      },
      Some("""WITH c AS (SELECT d.doc_id, d.source, l.text
             |  FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 4),
             |g AS (SELECT md5(text) AS h, source, CAST(count(*) AS BIGINT) AS cnt
             |  FROM c GROUP BY 1, 2)
             |SELECT a.source AS src_a, b.source AS src_b,
             |  CAST(count(*) AS BIGINT) AS n_shared_texts,
             |  CAST(sum(a.cnt * b.cnt) AS BIGINT) AS cross_doc_pairs,
             |  CAST(sum(a.cnt) AS BIGINT) AS docs_a_shared,
             |  CAST(sum(b.cnt) AS BIGINT) AS docs_b_shared
             |FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Vocabulary coverage curve (r15b): the tokenizer-sizing datasheet —
    // smallest frequency-ranked vocab reaching 50/90/95/99% of token
    // mass. The global cumulative window runs over the frequency-of-
    // frequencies histogram (O(√total) rows), never the vocabulary; the
    // boundary-frequency remainder is exact integer algebra (see
    // TextAnalysis.vocabCoverage).
    QueryDef(
      "q349_vocab_coverage",
      (s, dir) =>
        TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text")
          .orderBy("target_bp"),
      Some(raw"""WITH tok AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
             |    x -> x <> '')) AS t FROM documents),
             |v AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
             |fh AS (SELECT c, CAST(count(*) AS BIGINT) AS nt FROM v GROUP BY c),
             |cum AS (SELECT c, nt,
             |    CAST(sum(c * nt) OVER (ORDER BY c DESC) AS BIGINT) AS cm,
             |    CAST(sum(nt) OVER (ORDER BY c DESC) AS BIGINT) AS ct FROM fh),
             |tot AS (SELECT CAST(sum(c * nt) AS BIGINT) AS total FROM fh),
             |tg AS (SELECT CAST(unnest([5000, 9000, 9500, 9900]) AS BIGINT) AS target_bp),
             |nd AS (SELECT target_bp, total,
             |    CAST((total * target_bp + 9999) // 10000 AS BIGINT) AS need FROM tg, tot),
             |sel AS (SELECT * FROM (
             |    SELECT target_bp, total, need, c, nt, cm, ct,
             |      row_number() OVER (PARTITION BY target_bp ORDER BY cm) AS rn
             |    FROM nd JOIN cum ON cm >= need) WHERE rn = 1)
             |SELECT target_bp,
             |  CAST(ct - nt + (need - (cm - c * nt) + c - 1) // c AS BIGINT) AS vocab_size,
             |  CAST((cm - c * nt) + ((need - (cm - c * nt) + c - 1) // c) * c AS BIGINT) AS cum_tokens,
             |  total AS total_tokens, CAST(c AS BIGINT) AS boundary_freq
             |FROM sel ORDER BY target_bp""".stripMargin)
    ),

    // Measured LSH recall vs the exact similarity join (r15b): the
    // certificate that closes the q342/q334/q345 routing loop — the
    // advisor prices both paths; this measures what the cheap path GIVES
    // UP on this corpus at the same threshold and shingle width. The two
    // paths hash shingles through different families (57-bit polynomial
    // vs md5 prefix), so boundary pairs can disagree in either direction
    // and the report carries both (recall AND n_lsh_only). Oracle replays
    // BOTH chains — q257's prefix-filter formulas and q32's band+verify —
    // and full-outer-joins the pair sets.
    QueryDef(
      "q350_lsh_recall",
      // deterministic 1/3 sample — the certificate's documented usage
      // mode (recall is a corpus-shape property; the exact side is the
      // one the advisor routes AWAY from at scale, so the gate runs it
      // the way a 100 TB job would: on a sample). Full-corpus cost was
      // measured 9.6 s at sf0.1 — all in verifying the degenerate
      // corpus's band candidates, exactly the regime q342 flags.
      (s, dir) =>
        Dedup.lshRecallCertificate(
          t(s, dir, "documents").filter(col("doc_id") % 3 === 0),
          "doc_id", "text", minJaccardPct = 50),
      Some(s"""WITH sdocs AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
             |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
             |  FROM sdocs),
             |psets AS (SELECT doc_id,
             |    list_sort(list_distinct(list_transform(range(1, len(w) - 1),
             |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |             list_transform(string_split(w[i] || ' ' || w[i+1] || ' ' || w[i+2], ''),
             |               c -> CAST(ord(c) AS BIGINT))),
             |             (a, c) -> (a * 31 + c) % 144115188075855859)))) AS ts
             |  FROM w WHERE len(w) >= 3),
             |ptoks AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok FROM psets),
             |pdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM ptoks GROUP BY 1),
             |prk AS (SELECT doc_id, tok, n,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn
             |  FROM ptoks JOIN pdf USING (tok)),
             |ppre AS (SELECT doc_id, tok, n, rn FROM prk WHERE rn <= n - (n * 50 + 99) // 100 + 1),
             |pcap AS (SELECT doc_id, tok, n, rn FROM (
             |    SELECT doc_id, tok, n, rn,
             |      row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS brn
             |    FROM ppre) WHERE brn <= 500),
             |pcand AS (SELECT DISTINCT a.doc_id AS ad, b.doc_id AS bd
             |  FROM pcap a JOIN pcap b USING (tok) WHERE a.doc_id < b.doc_id
             |    AND least(a.n, b.n) * 100 >= greatest(a.n, b.n) * 50
             |    AND (1 + least(a.n - a.rn, b.n - b.rn)) * 150 >= (a.n + b.n) * 50),
             |pw AS (SELECT doc_id, ts AS ws, CAST(len(ts) AS BIGINT) AS n FROM psets),
             |pv AS (SELECT ad, bd, x.n AS a_n, y.n AS b_n,
             |    CAST(len(list_intersect(x.ws, y.ws)) AS BIGINT) AS inter_n
             |  FROM pcand JOIN pw x ON x.doc_id = ad JOIN pw y ON y.doc_id = bd
             |  WHERE least(x.n, y.n) * 100 >= greatest(x.n, y.n) * 50),
             |ep AS (SELECT ad AS a, bd AS b FROM pv WHERE inter_n * 150 >= (a_n + b_n) * 50),
             |${duckMinhashBandsCtes.replace("FROM documents)", "FROM sdocs)")},
             |lok AS (SELECT band_idx, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500),
             |lcand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
             |  FROM bands a JOIN lok USING (band_idx, band_hash)
             |  JOIN bands b USING (band_idx, band_hash) WHERE a.doc_id < b.doc_id),
             |msets AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS hs
             |  FROM hashed GROUP BY doc_id),
             |lv AS (SELECT a, b FROM lcand
             |  JOIN msets xa ON xa.doc_id = a JOIN msets xb ON xb.doc_id = b
             |  WHERE len(list_intersect(xa.hs, xb.hs)) * 150 >= (len(xa.hs) + len(xb.hs)) * 50),
             |j AS (SELECT CASE WHEN e.a IS NOT NULL THEN 1 ELSE 0 END AS ee,
             |             CASE WHEN l.a IS NOT NULL THEN 1 ELSE 0 END AS ll
             |  FROM ep e FULL OUTER JOIN lv l ON e.a = l.a AND e.b = l.b),
             |tl AS (SELECT CAST(coalesce(sum(ee), 0) AS BIGINT) AS n_exact_pairs,
             |    CAST(coalesce(sum(ll), 0) AS BIGINT) AS n_lsh_pairs,
             |    CAST(coalesce(sum(ee * ll), 0) AS BIGINT) AS n_common FROM j)
             |SELECT n_exact_pairs, n_lsh_pairs, n_common,
             |  CAST(n_lsh_pairs - n_common AS BIGINT) AS n_lsh_only,
             |  CAST(CASE WHEN n_exact_pairs = 0 THEN 1000
             |       ELSE n_common * 1000 // n_exact_pairs END AS BIGINT) AS recall_x1000
             |FROM tl""".stripMargin)
    ),

    // Margin-based bitext mining (r15b): the ccMatrix/LASER ratio-margin
    // criterion over two embedding corpora (label parity splits the
    // fixture; vec_id%5 bounds the candidate cross the way a real run's
    // ANN blocking does). Shifted-cosine integer margin — the threshold
    // at 1000 is EXACTLY the published margin>1 criterion (the affine
    // shift cancels at the boundary; see Similarity.marginBitextPairs).
    QueryDef(
      "q351_bitext_margin",
      (s, dir) => {
        val emb = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
        Similarity.marginBitextPairs(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 =!= 0),
          "vec_id", "embedding", k = 4, minMarginX1k = 1000L)
          .orderBy("a_id")
      },
      Some {
        def fold(a: String, b: String) =
          s"list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0),
           |av AS (SELECT vec_id AS a_id, embedding AS va FROM e
           |  WHERE label % 2 = 0 AND ${fold("embedding", "embedding")} > 0),
           |bv AS (SELECT vec_id AS b_id, embedding AS vb FROM e
           |  WHERE label % 2 <> 0 AND ${fold("embedding", "embedding")} > 0),
           |p AS (SELECT a_id, b_id,
           |    greatest(CAST(floor((${fold("va", "vb")}
           |      / (sqrt(${fold("va", "va")}) * sqrt(${fold("vb", "vb")}))) * 1000000.0) AS BIGINT)
           |      + 1000000, 0) AS s
           |  FROM av CROSS JOIN bv),
           |na AS (SELECT a_id, CAST(sum(s) AS BIGINT) AS sa, CAST(count(*) AS BIGINT) AS ka FROM (
           |    SELECT a_id, s, row_number() OVER (PARTITION BY a_id ORDER BY s DESC, b_id) AS rn
           |    FROM p) WHERE rn <= 4 GROUP BY a_id),
           |nb AS (SELECT b_id, CAST(sum(s) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS kb FROM (
           |    SELECT b_id, s, row_number() OVER (PARTITION BY b_id ORDER BY s DESC, a_id) AS rn
           |    FROM p) WHERE rn <= 4 GROUP BY b_id),
           |m AS (SELECT p.a_id, p.b_id, p.s,
           |    CAST(2000 * p.s * ka * kb // (sa * kb + sb * ka) AS BIGINT) AS margin_x1k
           |  FROM p JOIN na USING (a_id) JOIN nb USING (b_id) WHERE sa + sb > 0),
           |r AS (SELECT a_id, b_id, CAST(s - 1000000 AS BIGINT) AS cos_x1m, margin_x1k,
           |    row_number() OVER (PARTITION BY a_id ORDER BY margin_x1k DESC, b_id) AS rk FROM m)
           |SELECT a_id, b_id, cos_x1m, margin_x1k
           |FROM r WHERE rk = 1 AND margin_x1k >= 1000 ORDER BY a_id""".stripMargin
      }
    ),

    // Large-blocklist gate (r15b): q336's semantics through the native
    // TokenSetHits expression — O(tokens) hash-set lookups instead of the
    // per-token array scan, the form a 10³–10⁵-phrase compliance list
    // needs at 100 TB. The list is q336's four PRESENT phrases plus 1500
    // generated absent ones (1202 unigrams + 302 bigrams total), so the
    // expected hits equal q336's while the matcher demonstrably carries
    // the full list. The oracle is list-size-independent TOO (unnest +
    // hash join membership), so it is a genuinely different evaluation
    // strategy from both Spark plans.
    QueryDef(
      "q352_blocklist_large",
      (s, dir) =>
        orderedOut(
          TextAnalysis.blocklistHitsLarge(tParallel(s, dir, "documents"),
            "doc_id", "text", q352Phrases),
          "doc_id"),
      Some {
        val uniLits = q352Phrases.filterNot(_.contains(" "))
          .map(p => s"'$p'").mkString("[", ", ", "]")
        val biLits = q352Phrases.filter(_.contains(" "))
          .map(p => s"'$p'").mkString("[", ", ", "]")
        raw"""WITH tk AS (SELECT doc_id,
           |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
           |  FROM documents),
           |ul AS (SELECT lower(unnest($uniLits)) AS p),
           |bl AS (SELECT lower(unnest($biLits)) AS p),
           |ut AS (SELECT doc_id, unnest(toks) AS t FROM tk),
           |bt AS (SELECT doc_id,
           |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b
           |  FROM tk),
           |uh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ut JOIN ul ON t = p GROUP BY doc_id),
           |bh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bt JOIN bl ON b = p GROUP BY doc_id)
           |SELECT d.doc_id,
           |  CAST(coalesce(uh.n, 0) AS BIGINT) AS n_uni_hits,
           |  CAST(coalesce(bh.n, 0) AS BIGINT) AS n_bi_hits,
           |  CAST(coalesce(uh.n, 0) + coalesce(bh.n, 0) > 0 AS BIGINT) AS blocked
           |FROM documents d LEFT JOIN uh ON d.doc_id = uh.doc_id
           |LEFT JOIN bh ON d.doc_id = bh.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }
    ),

    // Banded SimHash near-dup join (r15b; widened r16 per advice):
    // candidate generation from the hash ITSELF via pigeonhole banding —
    // Hamming ≤ 3 over the 64-bit simHash64 ⇒ one of 4 16-bit bands equal
    // (exact recall while the bucket cap is non-binding; the 16-bit
    // keyspace is what keeps it non-binding at corpus scale, where the
    // original 8-bit bands saturated at ~1.3e5 docs). Planted twins
    // (doc + " zz" under id+500000) give the corpus real low-Hamming
    // pairs; verify is one bit_count(xor) per candidate — no arrays move.
    // The gate publishes the per-Hamming census with id-sum checksums;
    // the full pair set still flows through the aggregate on both engines.
    QueryDef(
      "q353_simhash_pairs",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(docs.select((col("doc_id") + 500000L).as("doc_id"),
            concat(col("text"), lit(" zz")).as("text")))
        Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 3)
          .groupBy("hamming")
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            sum(col("a_doc_id")).cast("long").as("sum_a"),
            sum(col("b_doc_id")).cast("long").as("sum_b"))
          .orderBy("hamming")
      },
      Some {
        val sub = duckSimhash64Sub.replace("FROM documents)", "FROM pc)")
        s"""WITH pc AS (SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 500000, text || ' zz' FROM documents),
           |sh AS ($sub),
           |bands AS (SELECT doc_id, simhash64, band_idx,
           |    CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key
           |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |capped AS (SELECT doc_id, simhash64, band_idx, band_key FROM (
           |    SELECT *, row_number() OVER (PARTITION BY band_idx, band_key ORDER BY doc_id) AS rn
           |    FROM bands) WHERE rn <= 500),
           |p AS (SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id,
           |    CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
           |  FROM capped a JOIN capped b USING (band_idx, band_key)
           |  WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash64, b.simhash64)) <= 3)
           |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(a_doc_id) AS BIGINT) AS sum_a, CAST(sum(b_doc_id) AS BIGINT) AS sum_b
           |FROM p GROUP BY hamming ORDER BY hamming""".stripMargin
      }
    ),

    // Mutual (forward∩backward) margin mining (r15b): the published
    // pipelines' final precision filter — keep (x, y) only when y is x's
    // best AND x is y's best under the same shifted-cosine margin. One
    // more windowed rank over q351's scored pairs; the output is a strict
    // subset of q351's rows (MiningSpec pins the subset relation).
    QueryDef(
      "q354_mutual_margin",
      (s, dir) => {
        val emb = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
        Similarity.marginBitextPairs(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 =!= 0),
          "vec_id", "embedding", k = 4, minMarginX1k = 1000L, mutual = true)
          .orderBy("a_id")
      },
      Some {
        def fold(a: String, b: String) =
          s"list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0),
           |av AS (SELECT vec_id AS a_id, embedding AS va FROM e
           |  WHERE label % 2 = 0 AND ${fold("embedding", "embedding")} > 0),
           |bv AS (SELECT vec_id AS b_id, embedding AS vb FROM e
           |  WHERE label % 2 <> 0 AND ${fold("embedding", "embedding")} > 0),
           |p AS (SELECT a_id, b_id,
           |    greatest(CAST(floor((${fold("va", "vb")}
           |      / (sqrt(${fold("va", "va")}) * sqrt(${fold("vb", "vb")}))) * 1000000.0) AS BIGINT)
           |      + 1000000, 0) AS s
           |  FROM av CROSS JOIN bv),
           |na AS (SELECT a_id, CAST(sum(s) AS BIGINT) AS sa, CAST(count(*) AS BIGINT) AS ka FROM (
           |    SELECT a_id, s, row_number() OVER (PARTITION BY a_id ORDER BY s DESC, b_id) AS rn
           |    FROM p) WHERE rn <= 4 GROUP BY a_id),
           |nb AS (SELECT b_id, CAST(sum(s) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS kb FROM (
           |    SELECT b_id, s, row_number() OVER (PARTITION BY b_id ORDER BY s DESC, a_id) AS rn
           |    FROM p) WHERE rn <= 4 GROUP BY b_id),
           |m AS (SELECT p.a_id, p.b_id, p.s,
           |    CAST(2000 * p.s * ka * kb // (sa * kb + sb * ka) AS BIGINT) AS margin_x1k
           |  FROM p JOIN na USING (a_id) JOIN nb USING (b_id) WHERE sa + sb > 0),
           |r AS (SELECT a_id, b_id, CAST(s - 1000000 AS BIGINT) AS cos_x1m, margin_x1k,
           |    row_number() OVER (PARTITION BY a_id ORDER BY margin_x1k DESC, b_id) AS rk,
           |    row_number() OVER (PARTITION BY b_id ORDER BY margin_x1k DESC, a_id) AS rkb
           |  FROM m)
           |SELECT a_id, b_id, cos_x1m, margin_x1k
           |FROM r WHERE rk = 1 AND rkb = 1 AND margin_x1k >= 1000 ORDER BY a_id""".stripMargin
      }
    ),

    // Vocab-coverage IVM twin (r15b): the tokenizer-sizing curve
    // maintained from per-batch token histograms (merge = groupBy sum,
    // exact by count additivity) equals the full recompute — the
    // nightly-maintenance path joins the IVM family (q153/q226/q241/
    // q260/q273/q291). Both sides run the SAME coverage algebra
    // (vocabCoverageFromCounts), so the gate pins the merge, and the
    // match columns make any drift a visible 0.
    QueryDef(
      "q355_vocab_coverage_ivm",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def hist(side: DataFrame) =
          side.select(explode(TextAnalysis.tokens("text")).as("t"))
            .groupBy("t").agg(count(lit(1)).as("c"))
        val merged = hist(docs.filter(col("doc_id") % 5 =!= 0))
          .unionByName(hist(docs.filter(col("doc_id") % 5 === 0)))
          .groupBy("t").agg(sum(col("c")).as("c"))
        val m = TextAnalysis.vocabCoverageFromCounts(merged, "t", "c")
          .select(col("target_bp"), col("vocab_size").as("maintained_vocab"),
            col("cum_tokens").as("maintained_cum"))
        val r = TextAnalysis.vocabCoverage(docs, "text")
          .select(col("target_bp"), col("vocab_size").as("recomputed_vocab"),
            col("cum_tokens").as("recomputed_cum"), col("total_tokens"))
        m.join(r, "target_bp")
          .withColumn("match_ok",
            (col("maintained_vocab") === col("recomputed_vocab") &&
              col("maintained_cum") === col("recomputed_cum")).cast("long"))
          .orderBy("target_bp")
      },
      Some {
        def cov(p: String, counts: String) =
          s"""${p}fh AS (SELECT c, CAST(count(*) AS BIGINT) AS nt FROM $counts GROUP BY c),
             |${p}cum AS (SELECT c, nt,
             |    CAST(sum(c * nt) OVER (ORDER BY c DESC) AS BIGINT) AS cm,
             |    CAST(sum(nt) OVER (ORDER BY c DESC) AS BIGINT) AS ct FROM ${p}fh),
             |${p}tot AS (SELECT CAST(sum(c * nt) AS BIGINT) AS total FROM ${p}fh),
             |${p}nd AS (SELECT target_bp, total,
             |    CAST((total * target_bp + 9999) // 10000 AS BIGINT) AS need FROM tg, ${p}tot),
             |${p}sel AS (SELECT * FROM (
             |    SELECT nd.target_bp, nd.total, nd.need, c, nt, cm, ct,
             |      row_number() OVER (PARTITION BY nd.target_bp ORDER BY cm) AS rn
             |    FROM ${p}nd nd JOIN ${p}cum ON cm >= nd.need)
             |  WHERE rn = 1),
             |${p}out AS (SELECT target_bp,
             |    CAST(ct - nt + (need - (cm - c * nt) + c - 1) // c AS BIGINT) AS vocab_size,
             |    CAST((cm - c * nt) + ((need - (cm - c * nt) + c - 1) // c) * c AS BIGINT) AS cum_tokens,
             |    total FROM ${p}sel)""".stripMargin
        raw"""WITH tg AS (SELECT CAST(unnest([5000, 9000, 9500, 9900]) AS BIGINT) AS target_bp),
           |tokb AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
           |  FROM documents WHERE doc_id % 5 <> 0),
           |tokd AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
           |  FROM documents WHERE doc_id % 5 = 0),
           |hb AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tokb GROUP BY t),
           |hd AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tokd GROUP BY t),
           |mc AS (SELECT t, CAST(sum(c) AS BIGINT) AS c
           |  FROM (SELECT * FROM hb UNION ALL SELECT * FROM hd) GROUP BY t),
           |tokf AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
           |  FROM documents),
           |fc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tokf GROUP BY t),
           |${cov("m_", "mc")},
           |${cov("r_", "fc")}
           |SELECT m.target_bp,
           |  m.vocab_size AS maintained_vocab, m.cum_tokens AS maintained_cum,
           |  r.vocab_size AS recomputed_vocab, r.cum_tokens AS recomputed_cum,
           |  r.total AS total_tokens,
           |  CAST(CASE WHEN m.vocab_size = r.vocab_size AND m.cum_tokens = r.cum_tokens
           |       THEN 1 ELSE 0 END AS BIGINT) AS match_ok
           |FROM m_out m JOIN r_out r USING (target_bp)
           |ORDER BY m.target_bp""".stripMargin
      }
    ),

    // Filter-cascade ordering advisor (r15b): the greedy
    // rejected-fraction/cost rule that decides which curation gate runs
    // FIRST at 100 TB (every doc a cheap filter rejects never reaches
    // the expensive ones). Four real gates with pinned relative costs:
    // metadata equality (1), token count (5), blocklist (20), char
    // entropy (50). One aggregate pass measures every pass rate; the
    // oracle replays the indicators (including the q337 entropy chain)
    // and the integer ranking.
    QueryDef(
      "q356_filter_order",
      (s, dir) =>
        TextAnalysis.filterOrderAdvisor(tParallel(s, dir, "documents"), Seq(
          ("lang_en", col("lang") === "en", 1L),
          ("min_tokens", TextAnalysis.tokenCount("text") >= 20, 5L),
          ("blocklist_clean",
            expr("size(filter(filter(split(lower(text), '\\\\s+'), x -> x != ''), " +
              "t -> array_contains(array('dup', 'fast'), t))) = 0"), 20L),
          ("entropy_ge_8hb", TextAnalysis.charEntropyHalfBitsCol("text") >= 8, 50L)
        )).orderBy("position"),
      Some(raw"""WITH tk AS (SELECT doc_id, lang,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |chars AS (SELECT doc_id, unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch
             |  FROM documents),
             |counts AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2),
             |ent AS (SELECT doc_id,
             |    (sum(c) * (length(to_base(CAST(sum(c) * sum(c) AS BIGINT), 2)) - 1)
             |     - sum(c * (length(to_base(CAST(c * c AS BIGINT), 2)) - 1))) // sum(c) AS hb
             |  FROM counts GROUP BY doc_id),
             |ind AS (SELECT tk.doc_id,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS f_lang,
             |    CASE WHEN len(toks) >= 20 THEN 1 ELSE 0 END AS f_len,
             |    CASE WHEN len(list_filter(toks, t -> list_contains(['dup', 'fast'], t))) = 0
             |         THEN 1 ELSE 0 END AS f_blk,
             |    CASE WHEN coalesce(ent.hb, 0) >= 8 THEN 1 ELSE 0 END AS f_ent
             |  FROM tk LEFT JOIN ent ON tk.doc_id = ent.doc_id),
             |rates AS (
             |  SELECT 'lang_en' AS filter, CAST(1 AS BIGINT) AS cost_x1000,
             |    CAST(sum(f_lang) * 10000 // count(*) AS BIGINT) AS pass_bp FROM ind
             |  UNION ALL SELECT 'min_tokens', 5, CAST(sum(f_len) * 10000 // count(*) AS BIGINT) FROM ind
             |  UNION ALL SELECT 'blocklist_clean', 20, CAST(sum(f_blk) * 10000 // count(*) AS BIGINT) FROM ind
             |  UNION ALL SELECT 'entropy_ge_8hb', 50, CAST(sum(f_ent) * 10000 // count(*) AS BIGINT) FROM ind),
             |ranked AS (SELECT *,
             |    CAST((10000 - pass_bp) * 1000 // cost_x1000 AS BIGINT) AS drop_per_cost,
             |    CAST(row_number() OVER (
             |      ORDER BY (10000 - pass_bp) * 1000 // cost_x1000 DESC, filter) AS BIGINT) AS position
             |  FROM rates)
             |SELECT filter, cost_x1000, pass_bp, drop_per_cost, position
             |FROM ranked ORDER BY position""".stripMargin)
    ),

    // Boundary-overlap stitching (r15b): paginated-crawl repair — page 2
    // begins with the tokens page 1 ends with, and the stitcher finds
    // those pairs by joining on the exact k-token boundary string (no
    // hash, no verify step). The gate splits every ≥10-token doc into
    // two pages sharing a planted 5-token overlap; the operator must
    // recover every (2i, 2i+1) pair (plus any genuine accidental
    // boundary matches the low-vocab corpus produces — the oracle
    // replays those identically).
    QueryDef(
      "q357_boundary_overlap",
      (s, dir) => {
        val w1 = t(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(text, '\\\\s+'), x -> x != '')").as("w"))
          .filter(size(col("w")) >= 10)
        val pages = w1.select((col("doc_id") * 2).as("doc_id"),
            array_join(expr("slice(w, 1, size(w) div 2 + 5)"), " ").as("text"))
          .unionByName(w1.select((col("doc_id") * 2 + 1).as("doc_id"),
            array_join(expr("slice(w, size(w) div 2 + 1, size(w))"), " ").as("text")))
        orderedOut(Dedup.boundaryOverlapPairs(pages, "doc_id", "text", k = 5),
          "a_id", "b_id")
      },
      Some(raw"""WITH w0 AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents),
             |w1 AS (SELECT * FROM w0 WHERE len(w) >= 10),
             |pages AS (
             |  SELECT doc_id * 2 AS doc_id,
             |    array_to_string(w[1 : len(w) // 2 + 5], ' ') AS text FROM w1
             |  UNION ALL
             |  SELECT doc_id * 2 + 1,
             |    array_to_string(w[len(w) // 2 + 1 : len(w)], ' ') FROM w1),
             |pw AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM pages),
             |pk AS (SELECT doc_id, w FROM pw WHERE len(w) >= 5),
             |heads AS (SELECT b_id, boundary FROM (
             |    SELECT doc_id AS b_id, array_to_string(w[1:5], ' ') AS boundary,
             |      row_number() OVER (PARTITION BY array_to_string(w[1:5], ' ')
             |        ORDER BY doc_id) AS rn FROM pk) WHERE rn <= 100),
             |tails AS (SELECT a_id, boundary FROM (
             |    SELECT doc_id AS a_id, array_to_string(w[len(w)-4 : len(w)], ' ') AS boundary,
             |      row_number() OVER (PARTITION BY array_to_string(w[len(w)-4 : len(w)], ' ')
             |        ORDER BY doc_id) AS rn FROM pk) WHERE rn <= 100)
             |SELECT a_id, b_id, boundary
             |FROM tails JOIN heads USING (boundary)
             |WHERE a_id <> b_id
             |ORDER BY a_id, b_id""".stripMargin)
    ),

    // Per-source dedup-savings datasheet (r15b): what exact dedup BUYS in
    // tokens — q131 reports the dup rate, this prices it per feed. Runs
    // on q348's planted mirror corpus (the base fixture has zero exact
    // dups), so every source shows real savings; the oracle replays the
    // keeper join and the basis-point algebra.
    QueryDef(
      "q358_dedup_savings",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs
          .select(col("doc_id"), col("source"),
            (col("doc_id") - col("doc_id") % 4).as("__lid"))
          .join(docs.select(col("doc_id").as("__lid"), col("text").as("__lt")), "__lid")
          .select(col("doc_id"), col("source"), col("__lt").as("text"))
        Dedup.dedupSavings(corpus, "doc_id", "text", "source")
          .orderBy("source")
      },
      Some(raw"""WITH c AS (SELECT d.doc_id, d.source, l.text
             |  FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 4),
             |tk AS (SELECT doc_id, source, md5(text) AS h,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS nt
             |  FROM c),
             |k AS (SELECT h, min(doc_id) AS keep FROM tk GROUP BY h),
             |j AS (SELECT tk.source, tk.nt,
             |    CASE WHEN k.keep = tk.doc_id THEN 1 ELSE 0 END AS kept
             |  FROM tk JOIN k USING (h)),
             |agg AS (SELECT source,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(kept) AS BIGINT) AS n_kept,
             |    CAST(sum(nt) AS BIGINT) AS tokens_total,
             |    CAST(sum(nt * kept) AS BIGINT) AS tokens_kept
             |  FROM j GROUP BY source)
             |SELECT source, n_docs, n_kept, tokens_total, tokens_kept,
             |  CAST(CASE WHEN tokens_total = 0 THEN 0
             |       ELSE (tokens_total - tokens_kept) * 10000 // tokens_total END AS BIGINT) AS saved_bp
             |FROM agg ORDER BY source""".stripMargin)
    ),

    // SimHash cap accounting (r16, per advice): the simHashPairs bucket
    // cap is a skew defense, and this prices what it forgoes — at a
    // binding cap (5) the word-salad fixture's concentrated band keys
    // show real foregone postings; at the default (500) the report's
    // zeros CERTIFY the q353 join's pigeonhole recall is exact. The
    // destructive-pipeline contract: gate on n_foregone_postings = 0 (or
    // route to a wider hash) before removing documents on banded
    // candidates.
    QueryDef(
      "q359_simhash_cap",
      (s, dir) =>
        // one simhash/occupancy pass prices both caps (multi-cap form)
        Dedup.simHashCapReports(t(s, dir, "documents"), "doc_id", "text",
          caps = Seq(5, 500)).orderBy("cap"),
      Some(
        s"""WITH sh AS ($duckSimhash64Sub),
           |bands AS (SELECT doc_id, band_idx,
           |    CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key
           |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |occ AS (SELECT band_idx, band_key, CAST(count(*) AS BIGINT) AS c
           |  FROM bands GROUP BY 1, 2),
           |caps(cap) AS (VALUES (5), (500))
           |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           |  CAST(sum(c) AS BIGINT) AS n_postings,
           |  CAST(sum(CASE WHEN c > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_buckets,
           |  CAST(sum(CASE WHEN c > cap THEN c - cap ELSE 0 END) AS BIGINT) AS n_foregone_postings,
           |  CAST(cap AS BIGINT) AS cap
           |FROM occ, caps GROUP BY cap ORDER BY cap""".stripMargin)
    ),

    // Threshold-derived LSH banding (r16, verdict top item): q308 tunes a
    // 64-hash signature at the suite's fixed s=0.7; the CLI needs the
    // pick AT THE USER'S THRESHOLD over its 8-hash signature. Same ×10⁶
    // fixed-point fold (both engines replay the identical truncation
    // chain — no pow()), pick = the split whose curve passes closest to
    // p=1/2 at s=pct (ties → fewer bands). LshParamsSpec pins this gate
    // row-for-row against the driver-side pure function the CLI actually
    // calls, so the wired path and the certified algebra cannot drift.
    QueryDef(
      "q360_lsh_params",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val cands = Seq((8, 1), (4, 2), (2, 4), (1, 8)).toDF("b", "r")
        val pcts = Seq(30L, 50L, 70L, 85L).toDF("pct")
        def foldPow(base: String, times: String) =
          s"aggregate(sequence(1, $times), CAST(1000000 AS BIGINT), (acc, i) -> acc * $base div 1000000)"
        cands.crossJoin(pcts)
          .withColumn("s_fp", col("pct") * 10000L)
          .withColumn("sr", expr(foldPow("s_fp", "r")))
          .withColumn("p_fp", expr(s"1000000 - ${foldPow("(1000000 - sr)", "b")}"))
          .withColumn("__rk", row_number().over(
            Window.partitionBy("pct").orderBy(abs(col("p_fp") - 500000L), col("b"))))
          .select(col("pct"), col("b").cast("int"), col("r").cast("int"),
            col("p_fp").cast("long"),
            when(col("__rk") === 1, 1L).otherwise(0L).as("pick"))
          .orderBy("pct", "b")
      },
      Some {
        def foldPow(base: String, times: String) =
          s"list_reduce(list_concat([CAST(1000000 AS BIGINT)], " +
            s"list_transform(range($times), i -> CAST($base AS BIGINT))), (a, x) -> a * x // 1000000)"
        s"""WITH cands(b, r) AS (VALUES (8, 1), (4, 2), (2, 4), (1, 8)),
           |pcts(pct) AS (VALUES (30), (50), (70), (85)),
           |c AS (SELECT b, r, CAST(pct AS BIGINT) AS pct,
           |    CAST(pct AS BIGINT) * 10000 AS s_fp,
           |    ${foldPow("s_fp", "r")} AS sr
           |  FROM cands, pcts),
           |p AS (SELECT b, r, pct,
           |    1000000 - ${foldPow("(1000000 - sr)", "b")} AS p_fp
           |  FROM c),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY pct
           |    ORDER BY abs(p_fp - 500000), b) AS rn FROM p)
           |SELECT pct, CAST(b AS INT) AS b, CAST(r AS INT) AS r,
           |  CAST(p_fp AS BIGINT) AS p_fp,
           |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS pick
           |FROM rk ORDER BY pct, b""".stripMargin
      }
    ),

    // ANN-blocked bitext mining, gated (r16, verdict #4): q351/q354
    // documented IVF blocking as the scale mode but only the full cross
    // was oracle-checked — this runs BOTH paths through the shared margin
    // algebra and publishes the recall-vs-full-cross delta next to the
    // scored-mass saving that paid for it. The oracle replays the whole
    // composition: the side-a Lloyd fit (q344's chain machinery, nlist=4,
    // one round), both assignments, the block-local margin, the full
    // cross margin, and the overlap/mass arithmetic.
    QueryDef(
      "q361_bitext_blocked",
      (s, dir) => {
        val emb = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
        Similarity.marginBitextBlockedCertificate(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 =!= 0),
          "vec_id", "embedding", k = 4, minMarginX1k = 1000L,
          mutual = false, nlist = 4, kmeansIters = 1)
      },
      Some {
        def fold(a: String, b: String) =
          s"list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(a: String, b: String) =
          s"(${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)})))"
        // the q351/q354 margin chain over an arbitrary scored-pairs CTE;
        // non-mutual mining: per a_id best b by (margin DESC, b_id)
        def margin(p: String, pairs: String) =
          s"""${p}na AS (SELECT a_id, CAST(sum(s) AS BIGINT) AS sa, CAST(count(*) AS BIGINT) AS ka FROM (
             |    SELECT a_id, s, row_number() OVER (PARTITION BY a_id ORDER BY s DESC, b_id) AS rn
             |    FROM $pairs) WHERE rn <= 4 GROUP BY a_id),
             |${p}nb AS (SELECT b_id, CAST(sum(s) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS kb FROM (
             |    SELECT b_id, s, row_number() OVER (PARTITION BY b_id ORDER BY s DESC, a_id) AS rn
             |    FROM $pairs) WHERE rn <= 4 GROUP BY b_id),
             |${p}m AS (SELECT q.a_id, q.b_id,
             |    CAST(2000 * q.s * ka * kb // (sa * kb + sb * ka) AS BIGINT) AS margin_x1k
             |  FROM $pairs q JOIN ${p}na USING (a_id) JOIN ${p}nb USING (b_id) WHERE sa + sb > 0),
             |${p}f AS (SELECT a_id, b_id FROM (
             |    SELECT a_id, b_id, margin_x1k,
             |      row_number() OVER (PARTITION BY a_id ORDER BY margin_x1k DESC, b_id) AS rk
             |    FROM ${p}m) WHERE rk = 1 AND margin_x1k >= 1000)""".stripMargin
        def assign(src: String, vc: String, idc: String, cent: String, out: String) =
          s"""$out AS (SELECT $idc, $vc, cid FROM (
             |    SELECT e.$idc, e.$vc, c.cid,
             |      row_number() OVER (PARTITION BY e.$idc ORDER BY ${cos(s"e.$vc", "c.cv")} DESC, c.cid) AS rn
             |    FROM $src e CROSS JOIN $cent c)
             |  WHERE rn = 1)""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0),
           |av AS (SELECT vec_id AS a_id, embedding AS va FROM e
           |  WHERE label % 2 = 0 AND ${fold("embedding", "embedding")} > 0),
           |bv AS (SELECT vec_id AS b_id, embedding AS vb FROM e
           |  WHERE label % 2 <> 0 AND ${fold("embedding", "embedding")} > 0),
           |p AS (SELECT a_id, b_id,
           |    greatest(CAST(floor(${cos("va", "vb")} * 1000000.0) AS BIGINT) + 1000000, 0) AS s
           |  FROM av CROSS JOIN bv),
           |${margin("x", "p")},
           |cent0 AS (SELECT a_id AS cid, va AS cv FROM av ORDER BY a_id LIMIT 4),
           |${assign("av", "va", "a_id", "cent0", "asg0")},
           |m1 AS (SELECT cid, i, CAST(avg(va[i+1]::DOUBLE) AS REAL) AS mv
           |  FROM asg0, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
           |n1 AS (SELECT cid, list(mv ORDER BY i) AS cv FROM m1 GROUP BY cid),
           |cent1 AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM cent0 c LEFT JOIN n1 n USING (cid)),
           |${assign("av", "va", "a_id", "cent1", "aa")},
           |${assign("bv", "vb", "b_id", "cent1", "ba")},
           |pb AS (SELECT a.a_id, b.b_id,
           |    greatest(CAST(floor(${cos("a.va", "b.vb")} * 1000000.0) AS BIGINT) + 1000000, 0) AS s
           |  FROM aa a JOIN ba b USING (cid)),
           |${margin("y", "pb")},
           |ov AS (SELECT
           |    CAST((SELECT count(*) FROM xf) AS BIGINT) AS n_full,
           |    CAST((SELECT count(*) FROM yf) AS BIGINT) AS n_blocked,
           |    CAST((SELECT count(*) FROM xf JOIN yf USING (a_id, b_id)) AS BIGINT) AS n_common),
           |mass AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS scored_blocked FROM
           |    (SELECT cid, count(*) AS na FROM aa GROUP BY cid) x
           |    JOIN (SELECT cid, count(*) AS nb FROM ba GROUP BY cid) y USING (cid)),
           |fm AS (SELECT CAST((SELECT count(*) FROM av) * (SELECT count(*) FROM bv) AS BIGINT) AS scored_full)
           |SELECT n_full, n_blocked, n_common,
           |  CAST(CASE WHEN n_full = 0 THEN 1000 ELSE n_common * 1000 // n_full END AS BIGINT) AS recall_x1000,
           |  scored_full, scored_blocked
           |FROM ov, fm, mass""".stripMargin
      }
    ),

    // Incremental-ANN partial refit (r16, verdict #5 — the act-on-drift
    // half q344 left open): a planted batch (label<3 copies shifted +0.5
    // on dims 0..7, ids +100000) drags SOME tiles past the drift
    // threshold; only those re-center and only their members re-assign.
    // The certificate shows partial ≈ full-refit recall while touching a
    // fraction of the corpus. Probe = the shifted copy of vec 0 (label 2
    // at both scales). Oracle replays the full policy: frozen Lloyd
    // chain, member means, the fixed-point drift decision, the patched
    // table, selective reassignment, three bounded IVF probes.
    QueryDef(
      "q362_ivf_partial_refit",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val base = emb.select(col("vec_id"), col("embedding"))
        val batch = emb.filter(col("label") < 3)
          .select((col("vec_id") + 100000L).as("vec_id"),
            expr("""transform(embedding,
                   |  (x, i) -> CASE WHEN i < 8 THEN CAST(x + CAST(0.5 AS FLOAT) AS FLOAT) ELSE x END)
                   |""".stripMargin).as("embedding"))
        Similarity.incrementalIvfPartialRefit(base, batch, "vec_id", "embedding",
          nlist = 16, kmeansIters = 2, driftX1m = 100000L,
          probeId = 100000L, k = 10, nprobe = 4)
      },
      Some {
        def fold(a: String, b: String) =
          s"list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(a: String, b: String) =
          s"(${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)})))"
        def assign(src: String, cent: String, out: String) =
          s"""$out AS (SELECT vec_id, embedding, cid FROM (
             |    SELECT e.vec_id, e.embedding, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM $src e CROSS JOIN $cent c)
             |  WHERE rn = 1)""".stripMargin
        def lloyd(asg: String, prev: String, out: String, m: String, n: String) =
          s"""$m AS (SELECT cid, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
             |  FROM $asg, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
             |$n AS (SELECT cid, list(mv ORDER BY i) AS cv FROM $m GROUP BY cid),
             |$out AS (SELECT c.cid, COALESCE(n.cv, c.cv) AS cv FROM $prev c LEFT JOIN $n n USING (cid))""".stripMargin
        def chain(src: String, p: String) =
          s"""${p}cent0 AS (SELECT vec_id AS cid, embedding AS cv FROM $src ORDER BY vec_id LIMIT 16),
             |${assign(src, s"${p}cent0", s"${p}asg0")},
             |${lloyd(s"${p}asg0", s"${p}cent0", s"${p}cent1", s"${p}m1", s"${p}n1")},
             |${assign(src, s"${p}cent1", s"${p}asg1")},
             |${lloyd(s"${p}asg1", s"${p}cent1", s"${p}cent2", s"${p}m2", s"${p}n2")}""".stripMargin
        def ivftop(p: String, cent: String, asg: String) =
          s"""${p}pl AS (SELECT cid FROM (SELECT c.cid, ${cos("c.cv", "pv")} AS pc FROM $cent c CROSS JOIN pq)
             |  ORDER BY pc DESC, cid LIMIT 4),
             |${p}top AS (SELECT vec_id FROM (
             |  SELECT a.vec_id, ${cos("a.embedding", "pv")} AS cs
             |  FROM $asg a JOIN ${p}pl USING (cid) CROSS JOIN pq WHERE a.vec_id <> 100000
             |  ORDER BY cs DESC, vec_id LIMIT 10)),
             |${p}rc AS (SELECT CAST(coalesce(count(*), 0) * 100 // 10 AS BIGINT) AS v FROM truth JOIN ${p}top USING (vec_id))""".stripMargin
        s"""WITH b AS (SELECT vec_id, embedding FROM embeddings),
           |bt AS (SELECT vec_id + 100000 AS vec_id,
           |    list_transform(range(len(embedding)),
           |      i -> CASE WHEN i < 8 THEN CAST(embedding[i+1] + 0.5 AS REAL) ELSE embedding[i+1] END) AS embedding
           |  FROM embeddings WHERE label < 3),
           |u AS (SELECT * FROM b UNION ALL SELECT * FROM bt),
           |${chain("b", "f")},
           |${assign("u", "fcent2", "fau")},
           |mm AS (SELECT cid, i, CAST(avg(embedding[i+1]::DOUBLE) AS REAL) AS mv
           |  FROM fau, (SELECT unnest(range(64)) AS i) ix GROUP BY cid, i),
           |mn AS (SELECT cid, list(mv ORDER BY i) AS mcv FROM mm GROUP BY cid),
           |dt AS (SELECT c.cid, c.cv, n.mcv,
           |    CASE WHEN n.mcv IS NULL OR ${fold("n.mcv", "n.mcv")} = 0 OR ${fold("c.cv", "c.cv")} = 0 THEN 0
           |         ELSE CAST(floor((1 - ${cos("c.cv", "n.mcv")}) * 1000000.0) AS BIGINT) END AS drift
           |  FROM fcent2 c LEFT JOIN mn n USING (cid)),
           |pcent AS (SELECT cid, CASE WHEN drift > 100000 THEN mcv ELSE cv END AS cv FROM dt),
           |ref AS (SELECT cid FROM dt WHERE drift > 100000),
           |tch AS (SELECT vec_id, embedding FROM fau WHERE cid IN (SELECT cid FROM ref)),
           |${assign("tch", "pcent", "re")},
           |pasg AS (SELECT vec_id, embedding, cid FROM fau WHERE cid NOT IN (SELECT cid FROM ref)
           |  UNION ALL SELECT vec_id, embedding, cid FROM re),
           |${chain("u", "r")},
           |${assign("u", "rcent2", "rau")},
           |pq AS (SELECT embedding AS pv FROM u WHERE vec_id = 100000),
           |truth AS (SELECT vec_id FROM (
           |  SELECT vec_id, ${cos("embedding", "pv")} AS cs FROM u CROSS JOIN pq WHERE vec_id <> 100000
           |  ORDER BY cs DESC, vec_id LIMIT 10)),
           |${ivftop("f2", "fcent2", "fau")},
           |${ivftop("p2", "pcent", "pasg")},
           |${ivftop("r2", "rcent2", "rau")},
           |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM u),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_touched FROM tch),
           |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_tiles_refit FROM ref)
           |SELECT n_union, CAST(16 AS BIGINT) AS n_tiles, n_tiles_refit, n_touched,
           |  CAST(CASE WHEN n_union = 0 THEN 0 ELSE n_touched * 10000 // n_union END AS BIGINT) AS touched_pct_x100,
           |  f2rc.v AS recall_frozen_x100, p2rc.v AS recall_partial_x100, r2rc.v AS recall_refit_x100
           |FROM nu, nt, nr, f2rc, p2rc, r2rc""".stripMargin
      }
    ),

    // Frozen-model DSIR scoring (r16 tranche H): fit the bucket-LLR model
    // on the base 75% of the corpus, score the held-out 25% WITHOUT refit
    // — the daily-crawl deployment shape (q344's frozen-index pattern for
    // importance weighting; refitting per batch would let the arriving
    // data move its own yardstick). Features hashing to buckets the model
    // never saw contribute llr 0 — exactly ql(1)−ql(1), so absence and
    // zero-count presence are indistinguishable by construction and the
    // oracle's LEFT JOIN + coalesce(l, 0) replays it bit-for-bit.
    QueryDef(
      "q363_dsir_frozen_score",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = Dsir.fitModel(docs.filter(col("doc_id") % 4 =!= 3),
          "text", targetCol = col("lang") === "zh", buckets = 8192)
        Dsir.scoreWithModel(docs.filter(col("doc_id") % 4 === 3),
            "doc_id", "text", model, buckets = 8192)
          .orderBy("doc_id")
      },
      Some {
        val hash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(string_split(f, ''), c -> CAST(ord(c) AS BIGINT))), " +
          "(a, c) -> (a * 31 + c) % 144115188075855859) % 8192"
        raw"""WITH ftoks AS (SELECT doc_id, lang = 'zh' AS tgt,
           |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           |  FROM documents WHERE doc_id % 4 <> 3),
           |ffeats AS (SELECT doc_id, tgt, unnest(list_concat(t,
           |      list_transform(range(greatest(len(t) - 1, 0)),
           |        i -> t[i+1] || ' ' || t[i+2]))) AS f FROM ftoks),
           |ffb AS (SELECT doc_id, tgt, $hash AS b FROM ffeats),
           |fcnt AS (SELECT b,
           |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           |    CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
           |  FROM ffb GROUP BY b),
           |fllr AS (SELECT b,
           |    CAST(${dsirQlSql("ct+1")}
           |       - ${dsirQlSql("cr+1")} AS BIGINT) AS l FROM fcnt),
           |ftot AS (SELECT CAST(sum(ct) + 8192 AS BIGINT) AS tt,
           |    CAST(sum(cr) + 8192 AS BIGINT) AS tr FROM fcnt),
           |fnorm AS (SELECT
           |    CAST(${dsirQlSql("tt")}
           |       - ${dsirQlSql("tr")} AS BIGINT) AS nl FROM ftot),
           |stoks AS (SELECT doc_id,
           |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           |  FROM documents WHERE doc_id % 4 = 3),
           |sfeats AS (SELECT doc_id, unnest(list_concat(t,
           |      list_transform(range(greatest(len(t) - 1, 0)),
           |        i -> t[i+1] || ' ' || t[i+2]))) AS f FROM stoks),
           |sfb AS (SELECT doc_id, $hash AS b FROM sfeats),
           |sdoc AS (SELECT sfb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
           |    CAST(sum(coalesce(l, 0)) AS BIGINT) AS s
           |  FROM sfb LEFT JOIN fllr USING (b) GROUP BY sfb.doc_id)
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_features,
           |  CAST((s - n_features * nl + 256 * n_features) * 1000 // n_features
           |       - 256000 AS BIGINT) AS weight_x1000
           |FROM sdoc, fnorm ORDER BY doc_id""".stripMargin
      }
    ),

    // Per-source token-distribution divergence (r16 tranche I): the
    // "which feed is distributionally weird" datasheet row — integer
    // half-bit KL(source || corpus) surrogate via the q332 ql machinery;
    // corpus counts derive from the source-token aggregate by additivity
    // (one token pass), and the positivity offset (+4 half-bits/token,
    // the floor-gap bound) keeps the published average's dividend
    // non-negative so div/'//' agree.
    QueryDef(
      "q364_source_divergence",
      (s, dir) =>
        TextAnalysis.sourceDivergence(tParallel(s, dir, "documents"), "text", "source")
          .orderBy("source"),
      Some(raw"""WITH st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT source, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
             |    FROM documents) GROUP BY source, t),
             |ct AS (SELECT t, CAST(sum(c) AS BIGINT) AS ctot FROM st GROUP BY t),
             |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nsrc,
             |    CAST(count(*) AS BIGINT) AS dt FROM st GROUP BY source),
             |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st),
             |terms AS (SELECT st.source,
             |    st.c * (${dsirQlSql("st.c")} + ${dsirQlSql("nn.n")}
             |          - ${dsirQlSql("ct.ctot")} - ${dsirQlSql("ns.nsrc")}) AS term
             |  FROM st JOIN ct USING (t) JOIN ns USING (source), nn),
             |agg AS (SELECT source, CAST(sum(term) AS BIGINT) AS numer FROM terms GROUP BY source)
             |SELECT a.source, ns.nsrc AS n_tokens, ns.dt AS distinct_tokens,
             |  CAST((numer + 4 * nsrc) * 1000 // nsrc - 4000 AS BIGINT) AS kl_x1000
             |FROM agg a JOIN ns ON a.source = ns.source ORDER BY a.source""".stripMargin)
    ),

    // Scorer calibration curve (r16 tranche I): rank the corpus by the
    // DSIR zh-importance weight, split into 10 equal-count buckets, and
    // report each bucket's positive (lang='zh') rate — the reliability
    // diagram that says whether thresholding on the scorer is safe. A
    // working scorer shows pos_bp rising with the bucket; the gate pins
    // the whole curve, and the spec asserts the monotone-top property.
    QueryDef(
      "q365_score_calibration",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val w = Dsir.importanceWeights(docs, "doc_id", "text",
          targetCol = col("lang") === "zh", buckets = 8192)
        val scored = w.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        TextAnalysis.scoreCalibration(scored, "doc_id", "weight_x1000",
            labelCol = col("lang") === "zh", nBuckets = 10)
          .orderBy("bucket")
      },
      Some(s"""WITH $dsirWeightsCtes,
             |cal_lab AS (SELECT w.doc_id, w.weight_x1000, d.lang = 'zh' AS y
             |  FROM weights w JOIN documents d USING (doc_id)),
             |cal_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cal_lab),
             |cal_rk AS (SELECT *, row_number() OVER (ORDER BY weight_x1000, doc_id) AS r FROM cal_lab),
             |cal_b AS (SELECT (r - 1) * 10 // n AS bucket, weight_x1000,
             |    CASE WHEN y THEN 1 ELSE 0 END AS yy FROM cal_rk, cal_tot)
             |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(weight_x1000) AS BIGINT) AS min_score,
             |  CAST(max(weight_x1000) AS BIGINT) AS max_score,
             |  CAST(sum(yy) AS BIGINT) AS n_pos,
             |  CAST(sum(yy) * 10000 // count(*) AS BIGINT) AS pos_bp
             |FROM cal_b GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),

    // Corpus epoch diff (r16 tranche J): the diff identity applied to the
    // corpus itself — head = the next crawl epoch derived deterministically
    // from base (docs % 7 = 0 dropped, % 5 = 0 re-crawled under id+600000,
    // % 11 = 0 text-updated), so every column of the per-source
    // added/removed/changed/token-delta report exercises on real data and
    // the oracle replays the identical mutation + full-outer rollup.
    QueryDef(
      "q366_corpus_epoch_diff",
      (s, dir) => {
        val base = t(s, dir, "documents")
        val head = base.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" upd")))
              .otherwise(col("text")).as("text"))
          .unionByName(base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 600000L).as("doc_id"), col("source"), col("text")))
        Dedup.corpusEpochDiff(base.select("doc_id", "source", "text"), head,
            "doc_id", "text", "source")
          .orderBy("source")
      },
      Some(raw"""WITH b AS (SELECT doc_id, source, 1 AS p, md5(text) AS h,
             |    CAST(coalesce(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 0) AS BIGINT) AS nt
             |  FROM documents),
             |hd0 AS (SELECT doc_id, source,
             |    CASE WHEN doc_id % 11 = 0 THEN text || ' upd' ELSE text END AS text
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL SELECT doc_id + 600000, source, text FROM documents WHERE doc_id % 5 = 0),
             |h AS (SELECT doc_id, source, 1 AS p, md5(text) AS h,
             |    CAST(coalesce(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 0) AS BIGINT) AS nt
             |  FROM hd0),
             |j AS (SELECT coalesce(h.source, b.source) AS source,
             |    coalesce(b.p, 0) AS bp, coalesce(h.p, 0) AS hp, b.h AS bh, h.h AS hh,
             |    coalesce(b.nt, 0) AS bnt, coalesce(h.nt, 0) AS hnt
             |  FROM b FULL OUTER JOIN h USING (doc_id))
             |SELECT source,
             |  CAST(sum(bp) AS BIGINT) AS n_base,
             |  CAST(sum(hp) AS BIGINT) AS n_head,
             |  CAST(sum(CASE WHEN bp = 0 AND hp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS added,
             |  CAST(sum(CASE WHEN bp = 1 AND hp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS removed,
             |  CAST(sum(CASE WHEN bp = 1 AND hp = 1 AND bh IS DISTINCT FROM hh THEN 1 ELSE 0 END) AS BIGINT) AS changed,
             |  CAST(sum(CASE WHEN bp = 1 AND hp = 1 AND bh IS NOT DISTINCT FROM hh THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
             |  CAST(sum(hnt - bnt) AS BIGINT) AS token_delta
             |FROM j GROUP BY source ORDER BY source""".stripMargin)
    ),

    // Curate resume-manifest algebra (r17, VERDICT #5, the q300 pattern):
    // the fingerprint chain `curate --resume` trusts, gated value-exact —
    // a wrong fingerprint is silent stale data, so the algebra gets an
    // oracle, not just a spec. input_digest is the order-independent
    // one-pass corpus content digest (per-row first-8-hex of
    // md5("id:md5(text)"), exact DECIMAL sum, pmod 2⁶²−1 — DuckDB's
    // HUGEINT sum replays it without overflow); each stage fingerprint
    // md5-chains the previous one with the stage name and canonical
    // params, so the oracle recomputing the same chain over the same
    // corpus pins every link.
    QueryDef(
      "q372_curate_manifest",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val docs = t(s, dir, "documents")
        val digest = graft.engine.CurateResume.corpusDigest(docs, "doc_id", "text")
        val stages = graft.engine.CurateResume.stageFingerprints(digest, Seq(
          "near_dup" -> "mode=lsh|pct=40",
          "dsir" -> "targets=web@/t/web#123,ref@/t/ref#456|mix=700,300",
          "pack" -> "budget=256|minWords=50|spanWords=5"))
        stages.zipWithIndex.map { case ((n, p, fp), i) =>
          (i.toLong, n, p, fp, digest) }
          .toDF("stage_idx", "stage", "params", "fingerprint", "input_digest")
          .orderBy("stage_idx")
      },
      Some(raw"""WITH dg AS (SELECT CAST(sum(('0x' || substr(md5(coalesce(CAST(doc_id AS VARCHAR), '')
             |      || ':' || md5(coalesce(text, ''))), 1, 8))::BIGINT)
             |      % 4611686018427387903 AS BIGINT) AS d FROM documents),
             |f0 AS (SELECT d, md5(CAST(d AS VARCHAR) || '|near_dup|mode=lsh|pct=40') AS fp FROM dg),
             |f1 AS (SELECT d, fp,
             |    md5(fp || '|dsir|targets=web@/t/web#123,ref@/t/ref#456|mix=700,300') AS fp1 FROM f0),
             |f2 AS (SELECT d, fp, fp1,
             |    md5(fp1 || '|pack|budget=256|minWords=50|spanWords=5') AS fp2 FROM f1)
             |SELECT * FROM (
             |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'near_dup' AS stage,
             |    'mode=lsh|pct=40' AS params, fp AS fingerprint, d AS input_digest FROM f2
             |  UNION ALL SELECT CAST(1 AS BIGINT), 'dsir',
             |    'targets=web@/t/web#123,ref@/t/ref#456|mix=700,300', fp1, d FROM f2
             |  UNION ALL SELECT CAST(2 AS BIGINT), 'pack',
             |    'budget=256|minWords=50|spanWords=5', fp2, d FROM f2)
             |ORDER BY stage_idx""".stripMargin)
    ),

    // Iterated NN-descent build (r17, VERDICT #6): q279 certifies ONE
    // neighbor-expansion round; this gates the BUILD loop — per round,
    // every node re-ranks its edges over current-edges ∪ neighbors'-
    // neighbors (top-5 by cosine), and the certificate row publishes the
    // probes' edge overlap with brute-force truth plus the gain, exiting
    // the first round that gains nothing (q210 fixpoint idiom). Per-node
    // edge quality is monotone by construction — old edges always re-
    // enter the candidate set — so hits never decrease; the oracle
    // replays every round (both plane tables, the mate graph, three
    // unrolled NN-descent updates, truth, the per-round census) AND the
    // early-exit emission rule itself: round r appears iff every earlier
    // round gained.
    QueryDef(
      "q371_nn_descent_build",
      (s, dir) =>
        Similarity.nnDescentBuildCertificate(t(s, dir, "embeddings"),
            "vec_id", "embedding", probeMod = 50L, bits = 4, kGraph = 5,
            maxRounds = 3, seed2 = 1337)
          .orderBy("round"),
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        // one NN-descent round: candidates = g ∪ two-hop(g), re-scored,
        // top-5 per src — the exact update the operator loops
        def round(r: Int) =
          s"""c$r AS (SELECT DISTINCT src, dst FROM (
             |    SELECT src, dst FROM g${r - 1}
             |    UNION ALL SELECT g1.src, g2.dst FROM g${r - 1} g1
             |      JOIN g${r - 1} g2 ON g1.dst = g2.src WHERE g1.src <> g2.dst)),
             |s$r AS (SELECT c.src, c.dst, ${cos("x.embedding", "y.embedding")} AS cs
             |  FROM c$r c JOIN embeddings x ON x.vec_id = c.src
             |    JOIN embeddings y ON y.vec_id = c.dst),
             |g$r AS (SELECT src, dst FROM (SELECT src, dst,
             |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM s$r)
             |  WHERE rn <= 5),
             |h$r AS (SELECT CAST(count(*) AS BIGINT) AS h FROM g$r g
             |  JOIN br ON g.src = br.src AND g.dst = br.dst WHERE g.src % 50 = 0)""".stripMargin
        s"""WITH planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g0 AS (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |br AS (SELECT pid AS src, cid AS dst FROM (
           |    SELECT p.vec_id AS pid, e.vec_id AS cid,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${cos("p.embedding", "e.embedding")} DESC, e.vec_id) AS rn
           |    FROM embeddings e CROSS JOIN
           |      (SELECT * FROM embeddings WHERE vec_id % 50 = 0) p
           |    WHERE e.vec_id <> p.vec_id) WHERE rn <= 5),
           |h0 AS (SELECT CAST(count(*) AS BIGINT) AS h FROM g0 g
           |  JOIN br ON g.src = br.src AND g.dst = br.dst WHERE g.src % 50 = 0),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT CAST(0 AS BIGINT) AS round, h0.h AS hits, h0.h AS gained FROM h0
           |UNION ALL SELECT CAST(1 AS BIGINT), h1.h, h1.h - h0.h FROM h0, h1
           |UNION ALL SELECT CAST(2 AS BIGINT), h2.h, h2.h - h1.h FROM h0, h1, h2
           |  WHERE h1.h > h0.h
           |UNION ALL SELECT CAST(3 AS BIGINT), h3.h, h3.h - h2.h FROM h0, h1, h2, h3
           |  WHERE h1.h > h0.h AND h2.h > h1.h
           |ORDER BY round""".stripMargin
      }
    ),

    // Int8-quantization recall certificate (r17, VERDICT #8): the q220
    // measurement at the STORAGE layer — per-dimension affine int8
    // (min/zero-point + range from ONE corpus pass, 4× smaller at rest
    // than float32), then top-10 by quantized cosine vs top-10 by float
    // cosine, overlap per probe. Every quantization step is IEEE double
    // arithmetic + floor, so the oracle replays codes AND dequantized
    // floats to the bit: the gate pins the exact recall delta int8
    // storage costs, per probe, at both scales.
    QueryDef(
      "q370_int8_quant_recall",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val params = Similarity.int8DimParams(e, "embedding")
        val probeF = col("vec_id") % 50 === 0
        val full = Similarity.knnJoin(e, "vec_id", "embedding", probeF, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        val eq = Similarity.dequantizeInt8PerDim(
            Similarity.quantizeInt8PerDim(e, "embedding", params), "q8", "embq", params)
          .select(col("vec_id"), col("embq"))
        val quant = Similarity.knnJoin(eq, "vec_id", "embq", probeF, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        val overlap = full.join(quant, Seq("probe_id", "neighbor_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("overlap10"))
        e.filter(probeF).select(col("vec_id").as("probe_id"))
          .join(overlap, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("overlap10"), lit(0L)).as("overlap10"),
            (coalesce(col("overlap10"), lit(0L)) * 10).as("recall_pct"))
          .orderBy("probe_id")
      },
      Some {
        def fold(n: String, a: String, b: String) =
          s"list_reduce(list_transform(range($n), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(n: String, a: String, b: String) =
          s"""CAST(${fold(n, a, b)}
             | / (sqrt(${fold(n, a, a)}) * sqrt(${fold(n, b, b)})) AS DECIMAL(16,12))"""
            .stripMargin
        s"""WITH mm AS (SELECT i, CAST(min(x) AS DOUBLE) AS mn,
           |    CAST(max(x) AS DOUBLE) - CAST(min(x) AS DOUBLE) AS rg FROM (
           |    SELECT unnest(embedding) AS x, unnest(range(len(embedding))) AS i
           |    FROM embeddings WHERE embedding IS NOT NULL) GROUP BY i),
           |mml AS (SELECT list(mn ORDER BY i) AS mins, list(rg ORDER BY i) AS rngs FROM mm),
           |eq AS (SELECT vec_id, list_transform(range(len(embedding)), i ->
           |    CAST(CASE WHEN rngs[i+1] <= 0 THEN mins[i+1]
           |         ELSE mins[i+1] + least(255.0, greatest(0.0,
           |           floor((embedding[i+1]::DOUBLE - mins[i+1]) * 255.0 / rngs[i+1])))
           |           * rngs[i+1] / 255.0 END AS REAL)) AS embq
           |  FROM embeddings, mml),
           |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
           |  WHERE vec_id % 50 = 0),
           |pq AS (SELECT vec_id AS probe_id, embq AS pq FROM eq
           |  WHERE vec_id % 50 = 0),
           |sf AS (SELECT probe_id, vec_id AS neighbor_id,
           |    ${cos("len(embedding)", "embedding", "pv")} AS cs
           |  FROM embeddings, p WHERE vec_id <> probe_id),
           |rf AS (SELECT probe_id, neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk FROM sf),
           |sq AS (SELECT probe_id, vec_id AS neighbor_id,
           |    ${cos("len(embq)", "embq", "pq")} AS cs
           |  FROM eq, pq WHERE vec_id <> probe_id),
           |rq AS (SELECT probe_id, neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk FROM sq),
           |ov AS (SELECT rf.probe_id, CAST(count(*) AS BIGINT) AS overlap10
           |  FROM rf JOIN rq ON rf.probe_id = rq.probe_id AND rf.neighbor_id = rq.neighbor_id
           |  WHERE rf.rk <= 10 AND rq.rk <= 10 GROUP BY 1)
           |SELECT p.probe_id, CAST(coalesce(ov.overlap10, 0) AS BIGINT) AS overlap10,
           |       CAST(coalesce(ov.overlap10, 0) * 10 AS BIGINT) AS recall_pct
           |FROM p LEFT JOIN ov ON p.probe_id = ov.probe_id
           |ORDER BY p.probe_id""".stripMargin
      }
    ),

    // Incremental SimHash vs a frozen corpus (r17, VERDICT #4): the
    // nightly-crawl form of q353 — the corpus (docs with doc_id % 3 ≠ 0)
    // is banded once per epoch, the arriving batch (% 3 = 0, plus planted
    // " zz" twins of corpus docs under id+500000 so real low-Hamming
    // matches exist) joins its bands against it, and every candidate
    // verifies with one bit_count(xor). The oracle replays the whole
    // algebra — both simhash64 builds, the 4×16-bit banding, the
    // corpus-side postings cap, the cross join and the Hamming verify —
    // and the gate publishes the per-Hamming census with id-sum
    // checksums on BOTH sides of each pair. Batch∪corpus parity with the
    // one-shot simHashPairs is OperatorsSpec's.
    QueryDef(
      "q369_simhash_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), col("text"))
        val batch = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 9 === 1)
            .select((col("doc_id") + 500000L).as("doc_id"),
              concat(col("text"), lit(" zz")).as("text")))
        Dedup.simHashAgainstCorpus(batch, corpus, "doc_id", "text", maxHamming = 3)
          .groupBy("hamming")
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            sum(col("batch_id")).cast("long").as("sum_batch"),
            sum(col("corpus_id")).cast("long").as("sum_corpus"))
          .orderBy("hamming")
      },
      Some {
        val subC = duckSimhash64Sub.replace("FROM documents)", "FROM corp)")
        val subB = duckSimhash64Sub.replace("FROM documents)", "FROM bat)")
        s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
           |  UNION ALL SELECT doc_id + 500000, text || ' zz' FROM documents
           |  WHERE doc_id % 3 <> 0 AND doc_id % 9 = 1),
           |shc AS ($subC),
           |shb AS ($subB),
           |cb AS (SELECT doc_id, simhash64, band_idx,
           |    CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key
           |  FROM shc, (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |cc AS (SELECT doc_id, simhash64, band_idx, band_key FROM (
           |    SELECT *, row_number() OVER (PARTITION BY band_idx, band_key ORDER BY doc_id) AS rn
           |    FROM cb) WHERE rn <= 500),
           |bb AS (SELECT doc_id, simhash64, band_idx,
           |    CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key
           |  FROM shb, (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |p AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           |    CAST(bit_count(xor(b.simhash64, c.simhash64)) AS BIGINT) AS hamming
           |  FROM bb b JOIN cc c USING (band_idx, band_key)
           |  WHERE bit_count(xor(b.simhash64, c.simhash64)) <= 3)
           |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(batch_id) AS BIGINT) AS sum_batch,
           |  CAST(sum(corpus_id) AS BIGINT) AS sum_corpus
           |FROM p GROUP BY hamming ORDER BY hamming""".stripMargin
      }
    ),

    // Byte-level BPE certificate on the real corpus (r17, VERDICT #3):
    // GPT-2/Llama-class token budgets are byte-level with regex
    // pre-tokenization; q107/q331 gate the word mode, this gates the byte
    // mode. Byte-level makes the certificate STRONGER than q107's: the
    // pre-tokenizer's alternatives PARTITION the string (whitespace
    // carries tokens instead of vanishing at a split), so the
    // concatenated token bytes reproduce the document exactly —
    // roundtrip_md5 pins the FULL text, token_mass_bytes pins the byte
    // mass to DuckDB's strlen to the digit, and the count sandwich
    // (>= whitespace words, <= bytes) brackets the count itself. Exact
    // merge algebra on a pinned corpus is q368's gate; driver ==
    // distributed training is BpeSpec's.
    QueryDef(
      "q367_bpe_bytes",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Bpe.trainBytes(docs, "text", numMerges = 30)
        Bpe.encodeBytes(docs, "doc_id", "text", merges)
          .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("text")),
            Seq("doc_id"))
          .select(col("doc_id"),
            col("roundtrip_md5"),
            col("token_mass_bytes"),
            (col("n_bpe_tokens") >=
              size(expr("filter(split(coalesce(text, ''), '\\\\s+'), x -> x <> '')")))
              .cast("long").as("ge_words"),
            (col("n_bpe_tokens") <= col("token_mass_bytes"))
              .cast("long").as("le_bytes"))
          .orderBy("doc_id")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  md5(coalesce(text, '')) AS roundtrip_md5,
             |  CAST(strlen(coalesce(text, '')) AS BIGINT) AS token_mass_bytes,
             |  CAST(1 AS BIGINT) AS ge_words,
             |  CAST(1 AS BIGINT) AS le_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Byte-vs-word BPE fertility delta on a pinned corpus (r17, VERDICT
    // #3's fertility row, q136's family): per source, chars-per-token
    // ×100 under BOTH tokenizer modes and the delta between them — the
    // number that says how far a word-BPE token budget drifts from a
    // production byte-level vocabulary on punctuation-heavy / non-Latin
    // text. The q109 hybrid-oracle pattern: the corpus is a literal
    // fixture, so the oracle's VALUES are computed AT ORACLE-GENERATION
    // TIME by the pure DRIVER trainers/encoders while the query runs the
    // DISTRIBUTED ones (trainBytesDistributed / trainDistributed +
    // mapPartitions encoders) — the gate therefore pins the exact byte-
    // merge algebra AND proves driver == distributed end to end, at both
    // scales, on every value. Sanity is asserted at generation: the dense
    // source's delta must sit below the ascii source's (the divergence
    // this row exists to expose), so a trainer change that erased the
    // signal fails loudly instead of re-pinning garbage.
    QueryDef(
      "q368_bpe_fertility_delta",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val fixt = q368Fixtures.toDF("doc_id", "source", "text")
        // the two trainers are independent greedy loops whose per-round
        // jobs are tiny — run them as concurrent driver-side jobs (guide
        // §2.6) so one loop's scheduling gaps back-fill the other's;
        // results are unchanged (separate lineages, no shared state)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val fB = Future { Bpe.trainBytesDistributed(fixt, "text", numMerges = 16) }
        val fC = Future { Bpe.trainDistributed(fixt, "text", numMerges = 16) }
        val mergesB = Await.result(fB, Duration.Inf)
        val mergesC = Await.result(fC, Duration.Inf)
        val encB = Bpe.encodeBytes(fixt, "doc_id", "text", mergesB)
          .select(col("doc_id"), col("n_bpe_tokens").as("__bt"))
        val encC = Bpe.encodeTokens(fixt, "doc_id", "text", mergesC)
          .select(col("doc_id"), col("n_bpe_tokens").as("__ct"))
        fixt.select(col("doc_id").cast("long").as("doc_id"), col("source"),
            length(col("text")).cast("long").as("__chars"))
          .join(encB, Seq("doc_id")).join(encC, Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("__chars")).cast("long").as("chars"),
            sum(col("__bt")).cast("long").as("byte_tokens"),
            sum(col("__ct")).cast("long").as("cp_tokens"))
          .withColumn("byte_fert_x100", expr("chars * 100 div byte_tokens"))
          .withColumn("cp_fert_x100", expr("chars * 100 div cp_tokens"))
          .withColumn("delta_x100", col("byte_fert_x100") - col("cp_fert_x100"))
          .orderBy("source")
      },
      Some {
        val texts = q368Fixtures.map(_._3)
        val ranksB = Bpe.trainBytesFromTexts(texts, 16).zipWithIndex.toMap
        val ranksC = Bpe.trainFromTexts(texts, 16).zipWithIndex.toMap
        val perSource = q368Fixtures.groupBy(_._2).toSeq.sortBy(_._1).map {
          case (src, docs) =>
            val chars = docs.map(d => d._3.codePointCount(0, d._3.length).toLong).sum
            val bt = docs.map(d => Bpe.encodeBytesText(d._3, ranksB).length.toLong).sum
            val ct = docs.map(d => d._3.split("\\s+").iterator.filter(_.nonEmpty)
              .flatMap(w => Bpe.encodeWord(w, ranksC)).length.toLong).sum
            val bf = chars * 100 / bt
            val cf = chars * 100 / ct
            (src, docs.size.toLong, chars, bt, ct, bf, cf, bf - cf)
        }
        val delta = perSource.map(r => r._1 -> r._8).toMap
        require(delta("dense") < delta("ascii"),
          s"q368 fixture must show the dense source's fertility delta below ascii's, got $delta")
        val rows = perSource.map { case (src, nd, ch, bt, ct, bf, cf, d) =>
          s"('$src', CAST($nd AS BIGINT), CAST($ch AS BIGINT), CAST($bt AS BIGINT), " +
            s"CAST($ct AS BIGINT), CAST($bf AS BIGINT), CAST($cf AS BIGINT), CAST($d AS BIGINT))"
        }.mkString(",\n             |  ")
        s"""SELECT * FROM (VALUES
           |  $rows)
           |  AS t(source, n_docs, chars, byte_tokens, cp_tokens,
           |       byte_fert_x100, cp_fert_x100, delta_x100)
           |ORDER BY source""".stripMargin
      }
    ),

    // Binary (1-bit) quantization recall certificate (r17 continuation,
    // I1): the 32×-compression storage tier next to q370's int8 — 64
    // balanced-Rademacher sign bits packed as two u32 halves, Hamming
    // shortlist (top-100 by bit_count(xor), ties to the smaller id), then
    // the production float-cosine rerank of ONLY the shortlist. The gate
    // pins, per probe, the raw-Hamming top-10 recall (what 8-byte codes
    // alone buy) next to the retrieve-rerank recall (what the two-stage
    // chain restores) against the exact float top-10. The oracle replays
    // both 32-plane tables, the sign folds, the u32 packing, both
    // rankings and both overlaps.
    QueryDef(
      "q376_binary_quant_recall",
      (s, dir) =>
        Similarity.binaryQuantRecall(t(s, dir, "embeddings"),
            "vec_id", "embedding", col("vec_id") % 50 === 0,
            k = 10, shortlist = 100)
          .orderBy("probe_id"),
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(32, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def fold(a: String, b: String) =
          s"list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(a: String, b: String) =
          s"""CAST(${fold(a, b)}
             | / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)})) AS DECIMAL(16,12))"""
            .stripMargin
        def code(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |ck$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS c
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        s"""WITH planesLo(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesHi(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${code("planesLo", "L")},
           |${code("planesHi", "H")},
           |c AS (SELECT l.vec_id, l.c AS lo, h.c AS hi
           |  FROM ckL l JOIN ckH h USING (vec_id)),
           |pc AS (SELECT vec_id AS probe_id, lo AS plo, hi AS phi FROM c
           |  WHERE vec_id % 50 = 0),
           |hr AS (SELECT probe_id, c.vec_id AS neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY
           |      bit_count(xor(c.lo, pc.plo)) + bit_count(xor(c.hi, pc.phi)),
           |      c.vec_id) AS hrk
           |  FROM c, pc WHERE c.vec_id <> pc.probe_id),
           |sh AS (SELECT probe_id, neighbor_id, hrk FROM hr WHERE hrk <= 100),
           |pv AS (SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings
           |  WHERE vec_id % 50 = 0),
           |rr AS (SELECT sh.probe_id, sh.neighbor_id,
           |    row_number() OVER (PARTITION BY sh.probe_id ORDER BY
           |      ${cos("e.embedding", "pv.pvec")} DESC, sh.neighbor_id) AS crk
           |  FROM sh JOIN embeddings e ON e.vec_id = sh.neighbor_id
           |    JOIN pv ON pv.probe_id = sh.probe_id),
           |sf AS (SELECT pv.probe_id, e.vec_id AS neighbor_id,
           |    ${cos("e.embedding", "pv.pvec")} AS cs
           |  FROM embeddings e, pv WHERE e.vec_id <> pv.probe_id),
           |fl AS (SELECT probe_id, neighbor_id FROM (SELECT probe_id, neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk
           |  FROM sf) WHERE rk <= 10),
           |ov1 AS (SELECT fl.probe_id, CAST(count(*) AS BIGINT) AS overlap_raw
           |  FROM fl JOIN sh ON fl.probe_id = sh.probe_id
           |    AND fl.neighbor_id = sh.neighbor_id WHERE sh.hrk <= 10 GROUP BY 1),
           |ov2 AS (SELECT fl.probe_id, CAST(count(*) AS BIGINT) AS overlap_rerank
           |  FROM fl JOIN rr ON fl.probe_id = rr.probe_id
           |    AND fl.neighbor_id = rr.neighbor_id WHERE rr.crk <= 10 GROUP BY 1)
           |SELECT pc.probe_id,
           |  CAST(coalesce(ov1.overlap_raw, 0) AS BIGINT) AS overlap_raw,
           |  CAST(coalesce(ov1.overlap_raw, 0) * 100 // 10 AS BIGINT) AS recall_raw_pct,
           |  CAST(coalesce(ov2.overlap_rerank, 0) AS BIGINT) AS overlap_rerank,
           |  CAST(coalesce(ov2.overlap_rerank, 0) * 100 // 10 AS BIGINT) AS recall_rerank_pct
           |FROM pc LEFT JOIN ov1 ON pc.probe_id = ov1.probe_id
           |  LEFT JOIN ov2 ON pc.probe_id = ov2.probe_id
           |ORDER BY pc.probe_id""".stripMargin
      }
    ),

    // Random-projection (JL) dimensionality reduction certificate (r17
    // continuation, I2): 64→16 dims via the deterministic balanced-
    // Rademacher table, keeping projection VALUES (ordered double folds,
    // one float rounding) — 4× fewer vector bytes through every downstream
    // shuffle. The gate pins, per probe, (a) top-10 recall of cosine
    // search on the reduced vectors vs the full-dimension exact top-10 and
    // (b) the JL distortion census: ⌊1000·‖Δy‖²/(16·‖Δx‖²)⌋ concentrates
    // at 1000, counted within ±10%/±25% bands (counts, never cross-row
    // float means — bit-exact on both engines). The oracle replays the
    // plane table, the folds, the float rounding, both searches and the
    // census bands.
    QueryDef(
      "q377_rp_distortion",
      (s, dir) =>
        Similarity.rpDistortionCertificate(t(s, dir, "embeddings"),
            "vec_id", "embedding", col("vec_id") % 50 === 0,
            k = 10, dims = 64, outDims = 16)
          .orderBy("probe_id"),
      Some {
        val planeVals =
          graft.functions.HyperplaneBucket.table(16, 64, Similarity.DefaultPlaneSeed)
            .zipWithIndex.map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def fold(n: String, a: String, b: String) =
          s"list_reduce(list_transform(range($n), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(n: String, a: String, b: String) =
          s"""CAST(${fold(n, a, b)}
             | / (sqrt(${fold(n, a, a)}) * sqrt(${fold(n, b, b)})) AS DECIMAL(16,12))"""
            .stripMargin
        def sqFold(n: String, a: String, b: String) =
          s"list_reduce(list_transform(range($n), i -> ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE) * ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE)), (x,y) -> x + y)"
        s"""WITH planes(idx, w) AS (VALUES
           |  $planeVals),
           |pr AS (SELECT e.vec_id, p.idx,
           |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
           |  FROM embeddings e CROSS JOIN planes p),
           |y AS (SELECT vec_id, list(CAST(proj AS REAL) ORDER BY idx) AS rp
           |  FROM pr GROUP BY vec_id),
           |pvf AS (SELECT vec_id AS probe_id, embedding AS px FROM embeddings
           |  WHERE vec_id % 50 = 0),
           |pvr AS (SELECT vec_id AS probe_id, rp AS py FROM y WHERE vec_id % 50 = 0),
           |sf AS (SELECT pvf.probe_id, e.vec_id AS neighbor_id,
           |    ${cos("64", "e.embedding", "pvf.px")} AS cs
           |  FROM embeddings e, pvf WHERE e.vec_id <> pvf.probe_id),
           |fl AS (SELECT probe_id, neighbor_id FROM (SELECT probe_id, neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk
           |  FROM sf) WHERE rk <= 10),
           |sr AS (SELECT pvr.probe_id, y.vec_id AS neighbor_id,
           |    ${cos("16", "y.rp", "pvr.py")} AS cs
           |  FROM y, pvr WHERE y.vec_id <> pvr.probe_id),
           |rl AS (SELECT probe_id, neighbor_id FROM (SELECT probe_id, neighbor_id,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, neighbor_id) AS rk
           |  FROM sr) WHERE rk <= 10),
           |ov AS (SELECT fl.probe_id, CAST(count(*) AS BIGINT) AS overlap10
           |  FROM fl JOIN rl ON fl.probe_id = rl.probe_id
           |    AND fl.neighbor_id = rl.neighbor_id GROUP BY 1),
           |pb AS (SELECT f.probe_id, f.px, r.py FROM pvf f JOIN pvr r USING (probe_id)),
           |cen AS (SELECT s.probe_id, CAST(count(*) AS BIGINT) AS pairs,
           |    CAST(sum(CASE WHEN r BETWEEN 900 AND 1100 THEN 1 ELSE 0 END) AS BIGINT) AS within_10pct,
           |    CAST(sum(CASE WHEN r BETWEEN 750 AND 1250 THEN 1 ELSE 0 END) AS BIGINT) AS within_25pct
           |  FROM (SELECT pb.probe_id,
           |      CAST(floor(${sqFold("16", "y.rp", "pb.py")} * 1000.0
           |        / (${sqFold("64", "e.embedding", "pb.px")} * 16)) AS BIGINT) AS r
           |    FROM embeddings e JOIN y ON e.vec_id = y.vec_id
           |      CROSS JOIN pb
           |    WHERE e.vec_id <> pb.probe_id
           |      AND ${sqFold("64", "e.embedding", "pb.px")} > 0.0) s
           |  GROUP BY 1)
           |SELECT pvf.probe_id,
           |  CAST(coalesce(ov.overlap10, 0) AS BIGINT) AS overlap10,
           |  CAST(coalesce(ov.overlap10, 0) * 100 // 10 AS BIGINT) AS recall_pct,
           |  CAST(coalesce(cen.pairs, 0) AS BIGINT) AS pairs,
           |  CAST(coalesce(cen.within_10pct, 0) AS BIGINT) AS within_10pct,
           |  CAST(coalesce(cen.within_25pct, 0) AS BIGINT) AS within_25pct
           |FROM pvf LEFT JOIN ov ON pvf.probe_id = ov.probe_id
           |  LEFT JOIN cen ON pvf.probe_id = cen.probe_id
           |ORDER BY pvf.probe_id""".stripMargin
      }
    ),

    // Exact-count mixture materialization WITH upsampling (r17
    // continuation, I4): closes rebalanceToMixture's documented
    // "approached from above only" limitation. Budget = 3·corpus + 37
    // (computed in-query at any scale, so every domain upsamples and the
    // 37 extra slots exercise the largest-remainder tie machinery);
    // targets come from the Hamilton apportionment, then every domain
    // emits ⌊t/n⌋ full copies of each doc plus the t mod n docs ranked
    // smallest by (md5-hash, id) at copy_idx = copies — Σ emitted ≡ target
    // BY CONSTRUCTION. The oracle replays the whole chain: counts,
    // apportionment (base + largest-remainder rank), copy explosion,
    // md5-rank remainder cut, and pins per-domain emitted / distinct /
    // id-checksum / copy-weighted checksum.
    QueryDef(
      "q378_mixture_upsample",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val total = docs.filter(col("lang").isNotNull).count()
        val budget = 3L * total + 37L
        val alloc = Sampling.largestRemainderAllocation(docs, "lang", budget)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
          .toList.sortBy(_._1)
        val targets = alloc.map(a => a._1 -> a._3).toMap
        val out = Sampling.materializeMixture(docs, "lang", "doc_id", targets)
        val summary = out.groupBy(col("lang")).agg(
          count(lit(1)).as("emitted"),
          countDistinct(col("doc_id")).as("distinct_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(col("doc_id") * (col("copy_idx") + 1)).as("sum_weighted"))
        val planDf = alloc.map { case (d, n, tgt) => (d, n, tgt, tgt / n, tgt % n) }
          .toDF("lang", "n_src", "target", "full_copies", "remainder")
        planDf.join(summary, Seq("lang"))
          .select(col("lang"), col("n_src"), col("target"), col("full_copies"),
            col("remainder"), col("emitted"), col("distinct_docs"),
            col("sum_doc_id"), col("sum_weighted"))
          .orderBy("lang")
      },
      Some(
        s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
           |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
           |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS N,
           |    CAST(3 * sum(cnt) + 37 AS BIGINT) AS B FROM c),
           |a AS (SELECT lang, cnt, B * cnt // N AS base, B * cnt % N AS remq
           |  FROM c, tt),
           |lo AS (SELECT CAST((SELECT B FROM tt) - sum(base) AS BIGINT) AS L FROM a),
           |al AS (SELECT lang, cnt,
           |    base + CASE WHEN rk <= (SELECT L FROM lo) THEN 1 ELSE 0 END AS target
           |  FROM (SELECT a.*, row_number() OVER (ORDER BY remq DESC, lang) AS rk
           |        FROM a)),
           |p AS (SELECT lang, cnt AS n_src, target,
           |    target // cnt AS full_copies, target % cnt AS remainder FROM al),
           |fc AS (SELECT d.doc_id, d.lang, unnest(range(p.full_copies)) AS copy_idx
           |  FROM documents d JOIN p ON p.lang = d.lang),
           |rk AS (SELECT d.doc_id, d.lang, row_number() OVER (PARTITION BY d.lang
           |    ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT,
           |      d.doc_id) AS rnk
           |  FROM documents d JOIN p ON p.lang = d.lang),
           |rm AS (SELECT rk.doc_id, rk.lang, p.full_copies AS copy_idx
           |  FROM rk JOIN p ON p.lang = rk.lang WHERE rk.rnk <= p.remainder),
           |em AS (SELECT * FROM fc UNION ALL SELECT * FROM rm),
           |sm AS (SELECT lang, CAST(count(*) AS BIGINT) AS emitted,
           |    CAST(count(DISTINCT doc_id) AS BIGINT) AS distinct_docs,
           |    CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           |    CAST(sum(doc_id * (copy_idx + 1)) AS BIGINT) AS sum_weighted
           |  FROM em GROUP BY 1)
           |SELECT p.lang, p.n_src, CAST(p.target AS BIGINT) AS target,
           |  CAST(p.full_copies AS BIGINT) AS full_copies,
           |  CAST(p.remainder AS BIGINT) AS remainder,
           |  sm.emitted, sm.distinct_docs, sm.sum_doc_id, sm.sum_weighted
           |FROM p JOIN sm USING (lang)
           |ORDER BY lang""".stripMargin)
    ),

    // Integer-exact PCA power iteration (r17 continuation, I3): the top
    // principal component of the embedding corpus with NO floats anywhere
    // — dims quantized to 2^16 fixed point by floor, ONE distributed Gram
    // pass (per-partition long kernel, BigInt-combined; the collect is
    // partitions × (64²+65) longs, corpus-size-independent), scatter
    // matrix and 8 power-iteration rounds in exact big-integer
    // arithmetic with truncating renormalization. Per round the gate pins
    // the exact Rayleigh ratio in basis points (monotone toward λ₁/Σλ —
    // the convergence receipt), the top-|component| dimension, and the
    // component's sign fingerprint as two u32 halves (the epoch-drift
    // signal next to ann-maintain). The oracle replays everything in
    // HUGEINT with 8 unrolled CTE rounds — floor-division replays the
    // truncating BigInt division via sign decomposition.
    QueryDef(
      "q379_pca_power",
      (s, dir) =>
        Similarity.pcaPowerCertificate(t(s, dir, "embeddings"), "embedding",
            dims = 64, iters = 8)
          .orderBy("iter"),
      Some {
        val unions = (1 to 8).map(tt => s"SELECT * FROM r$tt").mkString("\nUNION ALL ")
        s"""WITH ${pcaChainSql("",
             """SELECT vec_id,
               |    list_transform(embedding, x -> CAST(floor(x::DOUBLE * 65536.0) AS BIGINT)) AS qv
               |  FROM embeddings WHERE embedding IS NOT NULL""".stripMargin)}
           |$unions
           |ORDER BY iter""".stripMargin
      }
    ),

    // Principal-component drift between corpus epochs (r17 continuation,
    // J1): both epochs run q379's integer-exact power chain, and the
    // certificate row carries each side's final Rayleigh ratio and top
    // dimension plus the exact squared cosine between the final iterates
    // — (vᵀw)²·10⁴/(vᵀv·wᵀw) in pure integers (squared, so the
    // component's arbitrary sign cancels; no sqrt). Epoch B is epoch A
    // with +0.25 added to dims 0..7 of every even-id vector (the q362
    // planted-drift idiom, float-exact on both engines) — a real
    // embedding-space rotation the certificate must price. The oracle
    // replays BOTH chains (two parametrized 8-round HUGEINT CTE
    // pipelines) plus the cosine ratio.
    QueryDef(
      "q380_pca_epoch_drift",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val head = e.withColumn("embedding",
          when(col("vec_id") % 2 === 0,
            transform(col("embedding"), (x, i) =>
              when(i < 8, (x.cast("double") + 0.25).cast("float")).otherwise(x)))
            .otherwise(col("embedding")))
        Similarity.pcaEpochDrift(e, head, "embedding", dims = 64, iters = 8)
      },
      Some {
        val baseSrc =
          """SELECT vec_id,
            |    list_transform(embedding, x -> CAST(floor(x::DOUBLE * 65536.0) AS BIGINT)) AS qv
            |  FROM embeddings WHERE embedding IS NOT NULL""".stripMargin
        val headSrc =
          """SELECT vec_id,
            |    list_transform(range(64), i -> CAST(floor(
            |      (CASE WHEN vec_id % 2 = 0 AND i < 8
            |        THEN CAST(embedding[i+1]::DOUBLE + 0.25 AS REAL)
            |        ELSE embedding[i+1] END)::DOUBLE * 65536.0) AS BIGINT)) AS qv
            |  FROM embeddings WHERE embedding IS NOT NULL""".stripMargin
        s"""WITH ${pcaChainSql("a_", baseSrc)},
           |${pcaChainSql("b_", headSrc)},
           |dd AS (SELECT sum(a.v * b.v) AS d FROM a_v8 a JOIN b_v8 b USING (i)),
           |na AS (SELECT sum(v * v) AS s FROM a_v8),
           |nb AS (SELECT sum(v * v) AS s FROM b_v8)
           |SELECT CAST((SELECT var_explained_bp FROM a_r8) AS BIGINT) AS base_var_bp,
           |  CAST((SELECT var_explained_bp FROM b_r8) AS BIGINT) AS head_var_bp,
           |  CAST((SELECT top_dim FROM a_r8) AS BIGINT) AS base_top_dim,
           |  CAST((SELECT top_dim FROM b_r8) AS BIGINT) AS head_top_dim,
           |  CAST(dd.d * dd.d * 10000 // (na.s * nb.s) AS BIGINT) AS cos2_x10k
           |FROM dd, na, nb""".stripMargin
      }
    ),

    // Best-F1 threshold for the DSIR gate (r17 continuation, J2): the
    // calibration family's ACTION — q365 describes the score/label curve,
    // this picks the operating point. Scores are the ×1000 DSIR importance
    // weights toward lang='zh', labels the actual zh docs; for every
    // distinct score t the suffix sums give TP/FP/FN exactly (the F1
    // denominator collapses to n_ge + P), f1 in exact millionths, argmax
    // with (f1 desc, threshold asc) pinned. One row: the cut a curation
    // pipeline should gate at, with its confusion counts and
    // precision/recall in bp. The oracle replays the weight fold, the
    // suffix sums and the argmax.
    QueryDef(
      "q381_best_f1_threshold",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val w = Dsir.importanceWeights(docs, "doc_id", "text",
          targetCol = col("lang") === "zh", buckets = 8192)
        val scored = w.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        Stats.bestF1Threshold(scored, "weight_x1000", col("lang") === "zh")
      },
      Some(s"""WITH $dsirWeightsCtes,
             |lab AS (SELECT w.weight_x1000 AS s,
             |    CASE WHEN d.lang = 'zh' THEN 1 ELSE 0 END AS y
             |  FROM weights w JOIN documents d USING (doc_id)),
             |tt AS (SELECT CAST(coalesce(sum(y), 0) AS BIGINT) AS P FROM lab),
             |ps AS (SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
             |  FROM lab GROUP BY 1),
             |cum AS (SELECT s, sum(n) OVER (ORDER BY s DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nge,
             |  sum(p) OVER (ORDER BY s DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pge FROM ps),
             |f AS (SELECT s, pge, nge, P,
             |    pge * 2000000 // (nge + P) AS f1 FROM cum, tt)
             |SELECT CAST(s AS BIGINT) AS threshold, CAST(pge AS BIGINT) AS tp,
             |  CAST(nge - pge AS BIGINT) AS fp, CAST(P - pge AS BIGINT) AS fn,
             |  CAST(CASE WHEN nge > 0 THEN pge * 10000 // nge ELSE 0 END AS BIGINT)
             |    AS precision_bp,
             |  CAST(CASE WHEN P > 0 THEN pge * 10000 // P ELSE 0 END AS BIGINT)
             |    AS recall_bp,
             |  CAST(f1 AS BIGINT) AS f1_x1e6
             |FROM f QUALIFY row_number() OVER (ORDER BY f1 DESC, s) = 1""".stripMargin)
    ),

    // Shard-balance audit for the epoch shuffle (r17 continuation, J5):
    // epochShuffle's scaladoc defers the size audit — this is it. Per
    // shard of the seeded md5 deal: key count, share of the ideal
    // n/nShards in bp (positive-only integer division, then the signed
    // deviation by SUBTRACTION — a signed division would floor/truncate
    // differently across engines), empty shards surfaced via the spine.
    // The oracle replays the seeded hash, the mod deal and the spine.
    QueryDef(
      "q382_epoch_shard_audit",
      (s, dir) =>
        Sampling.epochShuffleAudit(t(s, dir, "documents"), "doc_id",
            seed = 7L, nShards = 16)
          .orderBy("shard"),
      Some(
        s"""WITH h AS (SELECT ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard
           |  FROM documents),
           |c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_keys FROM h GROUP BY 1),
           |tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
           |SELECT s.shard, CAST(coalesce(c.n_keys, 0) AS BIGINT) AS n_keys,
           |  CAST(coalesce(c.n_keys, 0) * 16 * 10000 // tt.n AS BIGINT) AS share_bp,
           |  CAST(coalesce(c.n_keys, 0) * 16 * 10000 // tt.n - 10000 AS BIGINT) AS dev_bp
           |FROM range(16) s(shard) LEFT JOIN c ON s.shard = c.shard, tt
           |ORDER BY s.shard""".stripMargin)
    ),

    // Token-budgeted mixture cut (r17 continuation, J3): the mixture in
    // the unit budgets are written in. Temperature shares (√count, exact
    // bp) over a half-the-corpus token budget give per-language token
    // targets; each language keeps the maximal md5-ordered doc prefix
    // whose token sum fits (no backfill), via the bucket machinery — so
    // the sample is deterministic AND the shortfall/overshoot shows up as
    // utilization, never as a silently different cut. The oracle replays
    // token counts, √-shares, targets, the per-domain running-sum prefix
    // and the per-domain rollup with id checksums.
    QueryDef(
      "q383_token_budget_mixture",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .withColumn("n_tok",
            size(expr("filter(split(text, '\\\\s+'), x -> x != '')")).cast("long"))
        val shares = Sampling.sqrtTemperatureShares(docs, "lang")
          .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
        val totTok = docs.agg(sum(col("n_tok")).as("t")).collect()(0).getLong(0)
        val budget = totTok / 2
        val targets = shares.map { case (d, bp) => d -> budget * bp / 10000 }
        val kept = Sampling.tokenBudgetMixture(docs, "lang", "doc_id", "n_tok", targets)
        val summary = kept.groupBy(col("lang")).agg(
          count(lit(1)).as("docs_kept"),
          sum(col("n_tok")).as("tokens_kept"),
          sum(col("doc_id")).as("sum_doc_id"))
        val src = docs.groupBy(col("lang")).agg(
          count(lit(1)).as("n_src_docs"), sum(col("n_tok")).as("tokens_src"))
        val tgtDf = targets.toSeq.toDF("lang", "target_tokens")
        src.join(tgtDf, "lang").join(summary, Seq("lang"), "left")
          .na.fill(0L, Seq("docs_kept", "tokens_kept", "sum_doc_id"))
          .select(col("lang"), col("n_src_docs"), col("tokens_src"),
            col("target_tokens"), col("docs_kept"), col("tokens_kept"),
            expr("case when target_tokens > 0 then tokens_kept * 10000 div target_tokens else 0 end")
              .as("util_bp"),
            col("sum_doc_id"))
          .orderBy("lang")
      },
      Some(
        s"""WITH dt AS (SELECT doc_id, lang,
           |    CAST(len($duckToks) AS BIGINT) AS n_tok FROM documents),
           |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM dt
           |  WHERE lang IS NOT NULL GROUP BY 1),
           |w AS (SELECT lang, cnt, CAST(floor(sqrt(cnt)) AS BIGINT) AS ws FROM c),
           |wt AS (SELECT CAST(sum(ws) AS BIGINT) AS wtot FROM w),
           |tk AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot FROM dt),
           |tg AS (SELECT w.lang,
           |    (tk.tot // 2) * (w.ws * 10000 // wt.wtot) // 10000 AS target
           |  FROM w, wt, tk),
           |rk AS (SELECT dt.*, sum(n_tok) OVER (PARTITION BY lang
           |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct FROM dt),
           |kp AS (SELECT rk.* FROM rk JOIN tg ON tg.lang = rk.lang
           |  WHERE rk.ct <= tg.target),
           |sm AS (SELECT lang, CAST(count(*) AS BIGINT) AS docs_kept,
           |    CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           |    CAST(sum(doc_id) AS BIGINT) AS sum_doc_id FROM kp GROUP BY 1),
           |src AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_src_docs,
           |    CAST(sum(n_tok) AS BIGINT) AS tokens_src FROM dt GROUP BY 1)
           |SELECT src.lang, src.n_src_docs, src.tokens_src,
           |  CAST(tg.target AS BIGINT) AS target_tokens,
           |  CAST(coalesce(sm.docs_kept, 0) AS BIGINT) AS docs_kept,
           |  CAST(coalesce(sm.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           |  CAST(CASE WHEN tg.target > 0
           |    THEN coalesce(sm.tokens_kept, 0) * 10000 // tg.target
           |    ELSE 0 END AS BIGINT) AS util_bp,
           |  CAST(coalesce(sm.sum_doc_id, 0) AS BIGINT) AS sum_doc_id
           |FROM src JOIN tg ON src.lang = tg.lang
           |  LEFT JOIN sm ON src.lang = sm.lang
           |ORDER BY src.lang""".stripMargin)
    ),

    // Stale-quantization drift certificate (r17 continuation, J4): int8
    // params are fit once per epoch in practice; when the corpus drifts
    // (q380's planted +0.25 on dims 0..7 of even ids), values outside the
    // stale per-dim range CLAMP — silently flattening exactly the
    // directions that moved. Per probe: recall of search over
    // stale-params-quantized vectors vs fresh-params-quantized vectors,
    // both against float truth on the CURRENT corpus, plus the global
    // clamped-value count (the refit trigger). The oracle replays the
    // mutation, BOTH param fits, both quantize/dequantize chains, all
    // three searches and the clamp census.
    QueryDef(
      "q384_stale_quant_drift",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val head = e.withColumn("embedding",
          when(col("vec_id") % 2 === 0,
            transform(col("embedding"), (x, i) =>
              when(i < 8, (x.cast("double") + 0.25).cast("float")).otherwise(x)))
            .otherwise(col("embedding")))
        Similarity.staleQuantRecall(e, head, "vec_id", "embedding",
            col("vec_id") % 50 === 0, k = 10)
          .orderBy("probe_id")
      },
      Some {
        def fold(n: String, a: String, b: String) =
          s"list_reduce(list_transform(range($n), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)"
        def cos(n: String, a: String, b: String) =
          s"""CAST(${fold(n, a, b)}
             | / (sqrt(${fold(n, a, a)}) * sqrt(${fold(n, b, b)})) AS DECIMAL(16,12))"""
            .stripMargin
        def dimParams(src: String, vc: String, out: String) =
          s"""pp$out AS (SELECT i, CAST(min(x) AS DOUBLE) AS mn,
             |    CAST(max(x) AS DOUBLE) - CAST(min(x) AS DOUBLE) AS rg,
             |    CAST(max(x) AS DOUBLE) AS mx FROM (
             |    SELECT unnest($vc) AS x, unnest(range(len($vc))) AS i
             |    FROM $src WHERE $vc IS NOT NULL) GROUP BY i),
             |ml$out AS (SELECT list(mn ORDER BY i) AS mins, list(rg ORDER BY i) AS rngs,
             |    list(mx ORDER BY i) AS maxs FROM pp$out)""".stripMargin
        def quant(params: String, out: String) =
          s"""eq$out AS MATERIALIZED (SELECT vec_id, list_transform(range(len(emb)), i ->
             |    CAST(CASE WHEN rngs[i+1] <= 0 THEN mins[i+1]
             |         ELSE mins[i+1] + least(255.0, greatest(0.0,
             |           floor((emb[i+1]::DOUBLE - mins[i+1]) * 255.0 / rngs[i+1])))
             |           * rngs[i+1] / 255.0 END AS REAL)) AS embq
             |  FROM hd, $params)""".stripMargin
        def search(rel: String, vc: String, out: String) =
          s"""pr$out AS (SELECT vec_id AS probe_id, $vc AS pv FROM $rel
             |  WHERE vec_id % 50 = 0),
             |rk$out AS (SELECT pr$out.probe_id, r.vec_id AS neighbor_id,
             |    row_number() OVER (PARTITION BY pr$out.probe_id ORDER BY
             |      ${cos(s"len(r.$vc)", s"r.$vc", s"pr$out.pv")} DESC, r.vec_id) AS rk
             |  FROM $rel r, pr$out WHERE r.vec_id <> pr$out.probe_id)""".stripMargin
        s"""WITH hd AS MATERIALIZED (SELECT vec_id, list_transform(range(64), i ->
           |    CASE WHEN vec_id % 2 = 0 AND i < 8
           |      THEN CAST(embedding[i+1]::DOUBLE + 0.25 AS REAL)
           |      ELSE embedding[i+1] END) AS emb
           |  FROM embeddings WHERE embedding IS NOT NULL),
           |${dimParams("embeddings", "embedding", "S")},
           |${dimParams("hd", "emb", "F")},
           |${quant("mlS", "S")},
           |${quant("mlF", "F")},
           |${search("hd", "emb", "T")},
           |${search("eqS", "embq", "S")},
           |${search("eqF", "embq", "F")},
           |ovS AS (SELECT t.probe_id, CAST(count(*) AS BIGINT) AS overlap_stale
           |  FROM rkT t JOIN rkS s ON t.probe_id = s.probe_id
           |    AND t.neighbor_id = s.neighbor_id
           |  WHERE t.rk <= 10 AND s.rk <= 10 GROUP BY 1),
           |ovF AS (SELECT t.probe_id, CAST(count(*) AS BIGINT) AS overlap_fresh
           |  FROM rkT t JOIN rkF f ON t.probe_id = f.probe_id
           |    AND t.neighbor_id = f.neighbor_id
           |  WHERE t.rk <= 10 AND f.rk <= 10 GROUP BY 1),
           |cl AS (SELECT CAST(coalesce(sum(CASE WHEN u.x::DOUBLE < mlS.mins[u.i+1]
           |      OR u.x::DOUBLE > mlS.maxs[u.i+1] THEN 1 ELSE 0 END), 0) AS BIGINT)
           |    AS clamped_vals
           |  FROM (SELECT unnest(emb) AS x, unnest(range(len(emb))) AS i FROM hd) u, mlS)
           |SELECT prT.probe_id,
           |  CAST(coalesce(ovS.overlap_stale, 0) AS BIGINT) AS overlap_stale,
           |  CAST(coalesce(ovS.overlap_stale, 0) * 100 // 10 AS BIGINT) AS recall_stale_pct,
           |  CAST(coalesce(ovF.overlap_fresh, 0) AS BIGINT) AS overlap_fresh,
           |  CAST(coalesce(ovF.overlap_fresh, 0) * 100 // 10 AS BIGINT) AS recall_fresh_pct,
           |  cl.clamped_vals
           |FROM prT LEFT JOIN ovS ON prT.probe_id = ovS.probe_id
           |  LEFT JOIN ovF ON prT.probe_id = ovF.probe_id, cl
           |ORDER BY prT.probe_id""".stripMargin
      }
    ),

    // Unicode-script census (r17 continuation, K3): lang-ID says what a
    // doc CLAIMS to be; this says what its characters ARE (a 'zh'-labeled
    // doc with zero CJK characters is a labeling bug). Over the q368
    // multilingual literal fixture (the synthetic documents table is
    // all-ASCII regardless of its lang labels — this fixture actually has
    // CJK/Latin-1/punctuation mass), per source: space-stripped char
    // totals, Latin/digit/CJK/Cyrillic/other counts by regexp-strip
    // length deltas, and Latin/CJK shares in bp. Spark counts UTF-16
    // units, DuckDB code points — identical on this BMP fixture (the
    // documented caveat). The oracle recomputes every count with RE2
    // classes over the same literals.
    QueryDef(
      "q385_script_census",
      (s, dir) => {
        import s.implicits._
        val docs = q368Fixtures.toDF("doc_id", "source", "text")
        TextAnalysis.scriptCensus(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .groupBy(col("source")).agg(
            sum(col("n_chars")).as("n_chars"),
            sum(col("latin")).as("latin"),
            sum(col("digit")).as("digit"),
            sum(col("cjk")).as("cjk"),
            sum(col("cyrillic")).as("cyrillic"),
            sum(col("other")).as("other"))
          .withColumn("latin_bp", expr("latin * 10000 div n_chars"))
          .withColumn("cjk_bp", expr("cjk * 10000 div n_chars"))
          .orderBy("source")
      },
      Some {
        val rows = q368Fixtures.map { case (id, src, text) =>
          s"($id, '$src', '${text.replace("'", "''")}')"
        }.mkString(",\n  ")
        def cnt(cls: String) =
          s"length(t) - length(regexp_replace(t, '$cls', '', 'g'))"
        s"""WITH d(doc_id, source, text) AS (VALUES
           |  $rows),
           |s AS (SELECT doc_id, source, regexp_replace(text, '\\s', '', 'g') AS t FROM d),
           |c AS (SELECT source, CAST(length(t) AS BIGINT) AS n_chars,
           |    CAST(${cnt("[A-Za-zÀ-ÖØ-öø-ÿ]")} AS BIGINT) AS latin,
           |    CAST(${cnt("[0-9]")} AS BIGINT) AS digit,
           |    CAST(${cnt("[\\x{4e00}-\\x{9fff}]")} AS BIGINT) AS cjk,
           |    CAST(${cnt("[\\x{0400}-\\x{04ff}]")} AS BIGINT) AS cyrillic
           |  FROM s),
           |g AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |    CAST(sum(latin) AS BIGINT) AS latin, CAST(sum(digit) AS BIGINT) AS digit,
           |    CAST(sum(cjk) AS BIGINT) AS cjk, CAST(sum(cyrillic) AS BIGINT) AS cyrillic
           |  FROM c GROUP BY 1)
           |SELECT source, n_chars, latin, digit, cjk, cyrillic,
           |  CAST(n_chars - latin - digit - cjk - cyrillic AS BIGINT) AS other,
           |  CAST(latin * 10000 // n_chars AS BIGINT) AS latin_bp,
           |  CAST(cjk * 10000 // n_chars AS BIGINT) AS cjk_bp
           |FROM g ORDER BY source""".stripMargin
      }
    ),

    // Incremental cluster maintenance (r17 continuation, L1): the
    // assignment-table half of the nightly near-dup loop — q369 flags the
    // arriving batch against the frozen corpus, THIS turns those flags
    // into the next epoch's cluster table without re-clustering the
    // corpus (delta graph over batch ids + touched prior labels; work ∝
    // new edges). The oracle is the strongest kind: it computes the
    // FROM-SCRATCH min-id clustering of corpus ∪ batch (recursive
    // closure over the replayed simhash pair sets), so the gate passes
    // only because incremental ≡ from-scratch — the operator's central
    // claim, checked value-exact at both scales. Per-cluster rollup with
    // member/new counts and id checksums.
    QueryDef(
      "q386_incremental_clusters",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), col("text"))
        val batch = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 9 === 1)
            .select((col("doc_id") + 500000L).as("doc_id"),
              concat(col("text"), lit(" zz")).as("text")))
        // band each side ONCE (r18): the corpus bands feed both the prior
        // clustering and the frozen index, the batch bands both the
        // cross-leg and the batch self-pairs — the simhash aggregate (the
        // expensive per-doc pass, pinned by its internal checkpoint)
        // previously ran twice per side
        val corpusBands = Dedup.simHashBandsOf(corpus, "doc_id", "text")
        val batchBands = Dedup.simHashBandsOf(batch, "doc_id", "text")
        val cc0 = Dedup.connectedComponents(
          Dedup.simHashPairsFromBands(corpusBands, "doc_id"), "a_doc_id", "b_doc_id")
        val prior = corpus.select(col("doc_id"))
          .join(cc0.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("cluster"))
        val out = Dedup.incrementalClusters(prior, "doc_id",
          Dedup.simHashAgainstCorpusFromBands(batchBands,
            Dedup.simHashCorpusIndexFromBands(corpusBands, "doc_id"), "doc_id"),
          Dedup.simHashPairsFromBands(batchBands, "doc_id"),
          batch.select("doc_id"), "a_doc_id", "b_doc_id")
        out.groupBy("cluster").agg(
            count(lit(1)).cast("long").as("n_members"),
            sum(col("is_new")).cast("long").as("n_new"),
            sum(col("doc_id")).cast("long").as("sum_id"))
          .orderBy("cluster")
      },
      Some {
        val subC = duckSimhash64Sub.replace("FROM documents)", "FROM corp)")
        val subB = duckSimhash64Sub.replace("FROM documents)", "FROM bat)")
        s"""WITH RECURSIVE corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
           |  UNION ALL SELECT doc_id + 500000, text || ' zz' FROM documents
           |  WHERE doc_id % 3 <> 0 AND doc_id % 9 = 1),
           |shc AS ($subC),
           |shb AS ($subB),
           |ccb AS (SELECT doc_id, simhash64, band_idx, band_key FROM (
           |    SELECT doc_id, simhash64, band_idx,
           |      CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key,
           |      row_number() OVER (PARTITION BY band_idx,
           |        CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT)
           |        ORDER BY doc_id) AS rn
           |    FROM shc, (SELECT unnest([0, 1, 2, 3]) AS band_idx)) WHERE rn <= 500),
           |bbc AS (SELECT doc_id, simhash64, band_idx, band_key FROM (
           |    SELECT doc_id, simhash64, band_idx,
           |      CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key,
           |      row_number() OVER (PARTITION BY band_idx,
           |        CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT)
           |        ORDER BY doc_id) AS rn
           |    FROM shb, (SELECT unnest([0, 1, 2, 3]) AS band_idx)) WHERE rn <= 500),
           |bbn AS (SELECT doc_id, simhash64, band_idx,
           |    CAST((simhash64 >> ((3 - band_idx) * 16)) & 65535 AS INT) AS band_key
           |  FROM shb, (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |pcc AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
           |  FROM ccb a JOIN ccb b USING (band_idx, band_key)
           |  WHERE a.doc_id < b.doc_id
           |    AND bit_count(xor(a.simhash64, b.simhash64)) <= 3),
           |pbc AS (SELECT DISTINCT b.doc_id AS u, c.doc_id AS v
           |  FROM bbn b JOIN ccb c USING (band_idx, band_key)
           |  WHERE bit_count(xor(b.simhash64, c.simhash64)) <= 3),
           |pbb AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
           |  FROM bbc a JOIN bbc b USING (band_idx, band_key)
           |  WHERE a.doc_id < b.doc_id
           |    AND bit_count(xor(a.simhash64, b.simhash64)) <= 3),
           |edges AS (SELECT u, v FROM (SELECT * FROM pcc UNION SELECT * FROM pbc
           |    UNION SELECT * FROM pbb)
           |  UNION SELECT v, u FROM (SELECT * FROM pcc UNION SELECT * FROM pbc
           |    UNION SELECT * FROM pbb)),
           |reach(id, r) AS (
           |  SELECT DISTINCT u, u FROM edges
           |  UNION
           |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
           |lab AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
           |allids AS (SELECT doc_id, 0 AS is_new FROM corp
           |  UNION ALL SELECT doc_id, 1 FROM bat),
           |fin AS (SELECT a.doc_id, coalesce(l.component, a.doc_id) AS cluster,
           |    a.is_new FROM allids a LEFT JOIN lab l ON l.id = a.doc_id)
           |SELECT CAST(cluster AS BIGINT) AS cluster,
           |  CAST(count(*) AS BIGINT) AS n_members,
           |  CAST(sum(is_new) AS BIGINT) AS n_new,
           |  CAST(sum(doc_id) AS BIGINT) AS sum_id
           |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
      }
    ),

    // Prior-labeling contract audit (r18, VERDICT r17 #2): the runtime
    // check `neardup-maintain --prior` now refuses on — q386's
    // equivalence proof assumes a min-id labeling, and this gates the
    // auditor that enforces it. A correct exact-dup min-id labeling of
    // documents (cluster = min doc_id per md5(text) group) is corrupted
    // deterministically (labels shifted +1 on doc_id % 101 = 5), and the
    // audit must surface EXACTLY the broken labels with their reasons:
    // self-membership and min-membership from ONE aggregate. The oracle
    // replays labeling, corruption, and audit; the spec adds the
    // clean-labeling-audits-empty law (incl. a real connectedComponents
    // output) that a VALUES oracle can't express.
    QueryDef(
      "q387_prior_audit",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val w = Window.partitionBy(md5(coalesce(col("text"), lit(""))))
        val prior = docs.select(col("doc_id").cast("long").as("doc_id"),
          min(col("doc_id").cast("long")).over(w).as("cluster"))
        val corrupt = prior.withColumn("cluster",
          when(col("doc_id") % 101 === 5, col("cluster") + 1)
            .otherwise(col("cluster")))
        Dedup.auditPriorLabeling(corrupt, "doc_id").orderBy("cluster")
      },
      Some("""WITH pr AS (SELECT CAST(doc_id AS BIGINT) AS id,
             |    min(CAST(doc_id AS BIGINT)) OVER (PARTITION BY md5(coalesce(text, ''))) AS cluster
             |  FROM documents),
             |co AS (SELECT id,
             |    CASE WHEN id % 101 = 5 THEN cluster + 1 ELSE cluster END AS cluster
             |  FROM pr),
             |ag AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
             |    min(id) AS min_member,
             |    CAST(max(CASE WHEN id = cluster THEN 1 ELSE 0 END) AS BIGINT) AS self_member
             |  FROM co GROUP BY cluster)
             |SELECT cluster, n_members, min_member, self_member,
             |  CASE WHEN self_member = 0 THEN 'label_not_member'
             |       ELSE 'label_not_min' END AS reason
             |FROM ag WHERE self_member = 0 OR cluster > min_member
             |ORDER BY cluster""".stripMargin)
    ),

    // Scalable BPE at PRODUCTION merge count (r18, VERDICT r17 #5):
    // trainBytesDistributed launches one Spark job per merge round — at
    // 8k–32k merges the per-round fixed cost dominates. The scalable
    // split (one distributed pre-token count, then a DELTA-maintained
    // driver loop whose per-round work ∝ the winning pair's occurrences)
    // is gated here at 1000 merges on a pinned fixture: the certificate
    // pins the winning count, the delta work (words_touched — the cost
    // curve the verdict asked for, in data units), the candidate-pair
    // population, and the md5 of the merge-table PREFIX at each curve
    // round — a wrong merge ANYWHERE in the thousand shifts every later
    // prefix digest. The oracle's VALUES come from an INDEPENDENT naive
    // replay at generation time (per-round from-scratch pair recount —
    // O(rounds × vocab), fine on the fixture, exactly what the delta
    // structures must agree with); BpeSpec-side laws prove scalable ==
    // trainBytes == trainBytesDistributed on real corpus text.
    QueryDef(
      "q389_bpe_scalable_1k",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val fixt = q389Fixtures.toDF("doc_id", "text")
        Bpe.scalableTrainCertificate(fixt, "text", numMerges = 1000,
            curveRounds = Seq(1, 10, 100, 250, 500, 750, 1000))
          .orderBy("round")
      },
      Some {
        // independent replay: from-scratch pair recount every round
        val words0: Map[Vector[String], Long] = q389Fixtures.iterator
          .flatMap(d => Bpe.bytePreTokens(d._2))
          .map(p => p.iterator.map(_.toString).toVector)
          .foldLeft(Map.empty[Vector[String], Long]) { (m, w) =>
            m.updated(w, m.getOrElse(w, 0L) + 1L) }
        val nVocab = words0.size.toLong
        var words = words0.toVector
        val curve = Set(1, 10, 100, 250, 500, 750, 1000)
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5Of(ms: Seq[(String, String)]): String = {
          md.reset()
          md.update(ms.map { case (a, b) => a + " " + b }.mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
          md.digest().map(b => f"$b%02x").mkString
        }
        val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val rows = scala.collection.mutable.ArrayBuffer.empty[String]
        var cum = 0L
        var r = 1
        while (r <= 1000) {
          val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
          words.foreach { case (syms, n) =>
            syms.iterator.zip(syms.iterator.drop(1)).foreach(p =>
              pc(p) = pc.getOrElse(p, 0L) + n) }
          require(pc.nonEmpty, s"q389 fixture exhausted at round $r — grow the fixture")
          val distinctPairs = pc.size.toLong
          val ((x, y), cnt) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          var touched = 0L
          words = words.map { case (syms, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            var hit = false
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
                out += (x + y); i += 2; hit = true
              } else { out += syms(i); i += 1 }
            }
            if (hit) { touched += 1; (out.result(), n) } else (syms, n)
          }
          merges += ((x, y))
          cum += touched
          if (curve(r)) rows +=
            s"(CAST($r AS BIGINT), CAST($cnt AS BIGINT), CAST($touched AS BIGINT), " +
              s"CAST($cum AS BIGINT), CAST($distinctPairs AS BIGINT), " +
              s"'${md5Of(merges.toSeq)}', CAST($nVocab AS BIGINT), CAST(0 AS BIGINT))"
          r += 1
        }
        require(rows.length == 7, s"q389 expected 7 curve rows, got ${rows.length}")
        s"""SELECT * FROM (VALUES
           |  ${rows.mkString(",\n  ")})
           |  AS t(round, best_count, words_touched, cum_touched, distinct_pairs,
           |       merges_md5, n_vocab_kept, occ_foregone)
           |ORDER BY round""".stripMargin
      }
    ),

    // Query-time graph-ANN search (r18, VERDICT r17 #6): q371 builds and
    // certifies the kNN graph; this gates the operator that USES it — the
    // greedy/beam walk an HNSW-family index answers queries with. Entry
    // points are the 4 ids minimizing md5(id) (deterministic, replayed by
    // the oracle's ORDER BY md5); per beam width (1 = greedy, 4 = beam)
    // the frontier is the top-b of the visited pool, each hop expands
    // graph neighbors and scores only NEW candidates, and the row pins
    // the whole query's cost (n_visited) next to its recall vs brute
    // float truth. The oracle replays the graph build, the md5-seeded
    // entries, all three hops of BOTH walks, and both recall counts.
    QueryDef(
      "q388_graph_search",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
          bits = 4, kGraph = 5, seed2 = 1337)
        Similarity.graphSearchTopK(e, "vec_id", "embedding", g,
            col("vec_id") % 50 === 0, k = 5, beams = Seq(1, 4),
            nEntry = 4, maxHops = 3)
          .orderBy("probe_id", "beam")
      },
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        // one beam walk: frontier = top-b of the visited pool, expand via
        // g0, score only NEW candidates, three hops
        def hop(b: Int, h: Int) =
          s"""f$b${h - 1} AS MATERIALIZED (SELECT pid, cid FROM (
             |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
             |    FROM vb$b${h - 1}) WHERE rn <= $b),
             |n$b$h AS MATERIALIZED (SELECT DISTINCT f.pid, g.dst AS cid
             |  FROM f$b${h - 1} f JOIN g0 g ON g.src = f.cid
             |  WHERE g.dst <> f.pid AND NOT EXISTS (
             |    SELECT 1 FROM vb$b${h - 1} v WHERE v.pid = f.pid AND v.cid = g.dst)),
             |s$b$h AS MATERIALIZED (SELECT n.pid, n.cid, ${cos("q.pv", "e.embedding")} AS cs
             |  FROM n$b$h n JOIN pp q ON q.pid = n.pid
             |    JOIN embeddings e ON e.vec_id = n.cid),
             |vb$b$h AS MATERIALIZED (SELECT pid, cid, cs FROM vb$b${h - 1}
             |  UNION ALL SELECT pid, cid, cs FROM s$b$h)""".stripMargin
        def beam(b: Int) =
          s"""vb${b}0 AS MATERIALIZED (SELECT pid, cid, cs FROM v0),
             |${hop(b, 1)},
             |${hop(b, 2)},
             |${hop(b, 3)},
             |tb$b AS MATERIALIZED (SELECT pid, cid FROM (
             |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
             |    FROM vb${b}3) WHERE rn <= 5),
             |rb$b AS MATERIALIZED (SELECT p.pid,
             |    (SELECT CAST(count(*) AS BIGINT) FROM vb${b}3 v WHERE v.pid = p.pid) AS n_visited,
             |    (SELECT CAST(count(*) AS BIGINT) FROM tb$b t JOIN br ON br.src = t.pid AND br.dst = t.cid
             |      WHERE t.pid = p.pid) AS hits
             |  FROM (SELECT DISTINCT pid FROM pp) p)""".stripMargin
        s"""WITH planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |br AS MATERIALIZED (SELECT pid AS src, cid AS dst FROM (
           |    SELECT p.vec_id AS pid, e.vec_id AS cid,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${cos("p.embedding", "e.embedding")} DESC, e.vec_id) AS rn
           |    FROM embeddings e CROSS JOIN
           |      (SELECT * FROM embeddings WHERE vec_id % 50 = 0) p
           |    WHERE e.vec_id <> p.vec_id) WHERE rn <= 5),
           |ent AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
           |pp AS MATERIALIZED (SELECT vec_id AS pid, embedding AS pv
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |v0 AS MATERIALIZED (SELECT pp.pid, ent.vec_id AS cid,
           |    ${cos("pp.pv", "ent.embedding")} AS cs
           |  FROM pp, ent WHERE ent.vec_id <> pp.pid),
           |${beam(1)},
           |${beam(4)}
           |SELECT CAST(pid AS BIGINT) AS probe_id, CAST(1 AS BIGINT) AS beam,
           |  CAST(3 AS BIGINT) AS hops, n_visited, hits,
           |  CAST(hits * 100 // 5 AS BIGINT) AS recall_pct FROM rb1
           |UNION ALL SELECT CAST(pid AS BIGINT), CAST(4 AS BIGINT), CAST(3 AS BIGINT),
           |  n_visited, hits, CAST(hits * 100 // 5 AS BIGINT) FROM rb4
           |ORDER BY probe_id, beam""".stripMargin
      }
    ),

    // The SERVING answer itself (r18, q388's companion): q388 gates the
    // walk's recall statistics; this gates the ranked neighbor LIST a
    // query service returns — (probe, rank, neighbor), value-exact, the
    // same md5-seeded beam-4 walk. The streaming twin
    // (StreamingSimilarity.graphServeGate — a broadcast-index row-local
    // walk, the production replica shape) must reproduce these rows
    // exactly; StreamingSpec pins that twin law.
    QueryDef(
      "q390_graph_search_answers",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
          bits = 4, kGraph = 5, seed2 = 1337)
        Similarity.graphSearchNeighbors(e, "vec_id", "embedding", g,
            col("vec_id") % 50 === 0, k = 5, beam = 4, nEntry = 4, maxHops = 3)
          .orderBy("probe_id", "rank")
      },
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        def hop(h: Int) =
          s"""f${h - 1} AS MATERIALIZED (SELECT pid, cid FROM (
             |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
             |    FROM vv${h - 1}) WHERE rn <= 4),
             |n$h AS MATERIALIZED (SELECT DISTINCT f.pid, g.dst AS cid
             |  FROM f${h - 1} f JOIN g0 g ON g.src = f.cid
             |  WHERE g.dst <> f.pid AND NOT EXISTS (
             |    SELECT 1 FROM vv${h - 1} v WHERE v.pid = f.pid AND v.cid = g.dst)),
             |s$h AS MATERIALIZED (SELECT n.pid, n.cid, ${cos("q.pv", "e.embedding")} AS cs
             |  FROM n$h n JOIN pp q ON q.pid = n.pid
             |    JOIN embeddings e ON e.vec_id = n.cid),
             |vv$h AS MATERIALIZED (SELECT pid, cid, cs FROM vv${h - 1}
             |  UNION ALL SELECT pid, cid, cs FROM s$h)""".stripMargin
        s"""WITH planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |ent AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
           |pp AS MATERIALIZED (SELECT vec_id AS pid, embedding AS pv
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |vv0 AS MATERIALIZED (SELECT pp.pid, ent.vec_id AS cid,
           |    ${cos("pp.pv", "ent.embedding")} AS cs
           |  FROM pp, ent WHERE ent.vec_id <> pp.pid),
           |${hop(1)},
           |${hop(2)},
           |${hop(3)}
           |SELECT CAST(pid AS BIGINT) AS probe_id, CAST(rn AS BIGINT) AS rank,
           |  CAST(cid AS BIGINT) AS neighbor_id
           |FROM (SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
           |      FROM vv3) WHERE rn <= 5
           |ORDER BY probe_id, rank""".stripMargin
      }
    ),

    // Compressed-tier graph serving with float rerank (r18, q388 × q370):
    // a replica serving int8 codes walks the graph on QUANTIZED scores —
    // and pays a recall price the standard fix (rerank the bounded
    // visited pool in float) buys back. The gate pins, per probe, the
    // walk cost and BOTH answers' recall vs float truth: top-k by
    // quantized score and top-k after the float rerank of the same pool
    // — the q376 retrieve-rerank contract at the graph-serving layer.
    // The oracle replays the q370 quantize/dequantize chain, the
    // float-built graph, the quantized 3-hop walk, the rerank, and both
    // recall counts.
    QueryDef(
      "q391_graph_quant_rerank",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
          bits = 4, kGraph = 5, seed2 = 1337)
        Similarity.graphSearchQuantRerank(e, "vec_id", "embedding", g,
            col("vec_id") % 50 === 0, k = 5, beam = 4, nEntry = 4, maxHops = 3)
          .orderBy("probe_id")
      },
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        def hop(h: Int) =
          s"""f${h - 1} AS MATERIALIZED (SELECT pid, cid FROM (
             |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
             |    FROM vv${h - 1}) WHERE rn <= 4),
             |n$h AS MATERIALIZED (SELECT DISTINCT f.pid, g.dst AS cid
             |  FROM f${h - 1} f JOIN g0 g ON g.src = f.cid
             |  WHERE g.dst <> f.pid AND NOT EXISTS (
             |    SELECT 1 FROM vv${h - 1} v WHERE v.pid = f.pid AND v.cid = g.dst)),
             |s$h AS MATERIALIZED (SELECT n.pid, n.cid, ${cos("q.pq", "e.embq")} AS cs
             |  FROM n$h n JOIN ppq q ON q.pid = n.pid
             |    JOIN eq e ON e.vec_id = n.cid),
             |vv$h AS MATERIALIZED (SELECT pid, cid, cs FROM vv${h - 1}
             |  UNION ALL SELECT pid, cid, cs FROM s$h)""".stripMargin
        s"""WITH mm AS (SELECT i, CAST(min(x) AS DOUBLE) AS mn,
           |    CAST(max(x) AS DOUBLE) - CAST(min(x) AS DOUBLE) AS rg FROM (
           |    SELECT unnest(embedding) AS x, unnest(range(len(embedding))) AS i
           |    FROM embeddings WHERE embedding IS NOT NULL) GROUP BY i),
           |mml AS (SELECT list(mn ORDER BY i) AS mins, list(rg ORDER BY i) AS rngs FROM mm),
           |eq AS MATERIALIZED (SELECT vec_id, list_transform(range(len(embedding)), i ->
           |    CAST(CASE WHEN rngs[i+1] <= 0 THEN mins[i+1]
           |         ELSE mins[i+1] + least(255.0, greatest(0.0,
           |           floor((embedding[i+1]::DOUBLE - mins[i+1]) * 255.0 / rngs[i+1])))
           |           * rngs[i+1] / 255.0 END AS REAL)) AS embq
           |  FROM embeddings, mml),
           |planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |br AS MATERIALIZED (SELECT pid AS src, cid AS dst FROM (
           |    SELECT p.vec_id AS pid, e.vec_id AS cid,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${cos("p.embedding", "e.embedding")} DESC, e.vec_id) AS rn
           |    FROM embeddings e CROSS JOIN
           |      (SELECT * FROM embeddings WHERE vec_id % 50 = 0) p
           |    WHERE e.vec_id <> p.vec_id) WHERE rn <= 5),
           |ent AS MATERIALIZED (SELECT eq.vec_id, eq.embq FROM eq
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
           |ppq AS MATERIALIZED (SELECT vec_id AS pid, embq AS pq
           |  FROM eq WHERE vec_id % 50 = 0),
           |ppf AS MATERIALIZED (SELECT vec_id AS pid, embedding AS pf
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |vv0 AS MATERIALIZED (SELECT ppq.pid, ent.vec_id AS cid,
           |    ${cos("ppq.pq", "ent.embq")} AS cs
           |  FROM ppq, ent WHERE ent.vec_id <> ppq.pid),
           |${hop(1)},
           |${hop(2)},
           |${hop(3)},
           |tq AS (SELECT pid, cid FROM (
           |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
           |    FROM vv3) WHERE rn <= 5),
           |rr AS MATERIALIZED (SELECT v.pid, v.cid, ${cos("p.pf", "e.embedding")} AS cs
           |  FROM vv3 v JOIN ppf p ON p.pid = v.pid
           |    JOIN embeddings e ON e.vec_id = v.cid),
           |tr AS (SELECT pid, cid FROM (
           |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
           |    FROM rr) WHERE rn <= 5),
           |res AS (SELECT p.pid,
           |    (SELECT CAST(count(*) AS BIGINT) FROM vv3 v WHERE v.pid = p.pid) AS n_visited,
           |    (SELECT CAST(count(*) AS BIGINT) FROM tq t JOIN br ON br.src = t.pid AND br.dst = t.cid
           |      WHERE t.pid = p.pid) AS hits_quant,
           |    (SELECT CAST(count(*) AS BIGINT) FROM tr t JOIN br ON br.src = t.pid AND br.dst = t.cid
           |      WHERE t.pid = p.pid) AS hits_rerank
           |  FROM (SELECT DISTINCT pid FROM ppq) p)
           |SELECT CAST(pid AS BIGINT) AS probe_id, n_visited, hits_quant, hits_rerank,
           |  CAST(hits_quant * 100 // 5 AS BIGINT) AS recall_quant_pct,
           |  CAST(hits_rerank * 100 // 5 AS BIGINT) AS recall_rerank_pct
           |FROM res ORDER BY probe_id""".stripMargin
      }
    ),

    // EXTERNAL-probe serving through the broadcast-index row-local walk
    // (r18, q390's companion): q390 gates the DataFrame walk on corpus
    // probes; this gates the SERVING code path itself — buildServeIndex +
    // graphServeGate, the exact code the streaming gate and the
    // graph-serve CLI run — on probes that are NOT corpus members
    // (corpus vectors under shifted ids, so the identical twin is
    // reachable and never self-excluded). The oracle replays the same
    // walk with the shifted probe table; every guard (`<> pid`) is
    // vacuous for external ids, which is exactly the semantics the gate
    // pins.
    QueryDef(
      "q392_graph_serve_external",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val g = Similarity.bucketMateGraph(e, "vec_id", "embedding",
          bits = 4, kGraph = 5, seed2 = 1337)
        val idx = graft.streaming.StreamingSimilarity.buildServeIndex(
          e, "vec_id", "embedding", g, nEntry = 4)
        val probes = e.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 500000L).as("probe_id"),
            col("embedding").as("vec"))
        graft.streaming.StreamingSimilarity.graphServeGate(
            probes, idx, k = 5, beam = 4, maxHops = 3)
          .orderBy("probe_id", "rank")
      },
      Some {
        def planeVals(seed: Int) =
          graft.functions.HyperplaneBucket.table(4, 64, seed).zipWithIndex
            .map { case (row, p) =>
              s"($p, ${row.map(b => if (b) "1" else "-1").mkString("[", ", ", "]")})"
            }.mkString(",\n  ")
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y)
             | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x,y) -> x + y))
             |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x,y) -> x + y))))""".stripMargin
        def bucket(planes: String, out: String) =
          s"""pr$out AS (SELECT e.vec_id, p.idx,
             |    list_reduce(list_transform(range(64), i -> e.embedding[i+1]::DOUBLE * p.w[i+1]), (x,y) -> x + y) AS proj
             |  FROM embeddings e CROSS JOIN $planes p),
             |bk$out AS (SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS bkt
             |  FROM pr$out GROUP BY vec_id)""".stripMargin
        def hop(h: Int) =
          s"""f${h - 1} AS MATERIALIZED (SELECT pid, cid FROM (
             |    SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
             |    FROM vv${h - 1}) WHERE rn <= 4),
             |n$h AS MATERIALIZED (SELECT DISTINCT f.pid, g.dst AS cid
             |  FROM f${h - 1} f JOIN g0 g ON g.src = f.cid
             |  WHERE g.dst <> f.pid AND NOT EXISTS (
             |    SELECT 1 FROM vv${h - 1} v WHERE v.pid = f.pid AND v.cid = g.dst)),
             |s$h AS MATERIALIZED (SELECT n.pid, n.cid, ${cos("q.pv", "e.embedding")} AS cs
             |  FROM n$h n JOIN pp q ON q.pid = n.pid
             |    JOIN embeddings e ON e.vec_id = n.cid),
             |vv$h AS MATERIALIZED (SELECT pid, cid, cs FROM vv${h - 1}
             |  UNION ALL SELECT pid, cid, cs FROM s$h)""".stripMargin
        s"""WITH planesA(idx, w) AS (VALUES
           |  ${planeVals(Similarity.DefaultPlaneSeed)}),
           |planesB(idx, w) AS (VALUES
           |  ${planeVals(1337)}),
           |${bucket("planesA", "A")},
           |${bucket("planesB", "B")},
           |v AS (SELECT e.vec_id AS id, e.embedding AS vec, a.bkt AS ba, b.bkt AS bb
           |  FROM embeddings e JOIN bkA a USING (vec_id) JOIN bkB b USING (vec_id)),
           |mt AS (SELECT x.id AS src, y.id AS dst, ${cos("x.vec", "y.vec")} AS cs
           |  FROM v x JOIN v y ON x.id <> y.id AND (x.ba = y.ba OR x.bb = y.bb)),
           |g0 AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn FROM mt)
           |  WHERE rn <= 5),
           |ent AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
           |pp AS MATERIALIZED (SELECT vec_id + 500000 AS pid, embedding AS pv
           |  FROM embeddings WHERE vec_id % 50 = 0),
           |vv0 AS MATERIALIZED (SELECT pp.pid, ent.vec_id AS cid,
           |    ${cos("pp.pv", "ent.embedding")} AS cs
           |  FROM pp, ent WHERE ent.vec_id <> pp.pid),
           |${hop(1)},
           |${hop(2)},
           |${hop(3)}
           |SELECT CAST(pid AS BIGINT) AS probe_id, CAST(rn AS BIGINT) AS rank,
           |  CAST(cid AS BIGINT) AS neighbor_id
           |FROM (SELECT pid, cid, row_number() OVER (PARTITION BY pid ORDER BY cs DESC, cid) AS rn
           |      FROM vv3) WHERE rn <= 5
           |ORDER BY probe_id, rank""".stripMargin
      }
    ),

    // Fixed-length sequence packing with boundary-crossing documents
    // (r18, q160/packByTokenBudget's missing half): a training packer
    // fills every context window to EXACTLY seqLen tokens, splitting the
    // straddling document — this gates the sample-to-sequence mapping.
    // Every interior sequence's n_tokens = 256 BY CONSTRUCTION (the gate
    // proves the construction), split membership is counted per
    // sequence, and first/last doc pin the layout. The oracle replays
    // the global prefix sum, the per-doc sequence range, the interval
    // intersections, and the rollup — the distributed two-phase scan
    // must equal the single-window form exactly.
    QueryDef(
      "q393_sequence_pack",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("doc_id"),
            size(expr("filter(split(coalesce(text, ''), '\\\\s+'), x -> x != '')"))
              .cast("long").as("n_tok"))
        Packing.packFixedSequences(docs, "doc_id", "n_tok", seqLen = 256L)
          .orderBy("seq_id")
      },
      Some(raw"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |    CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS BIGINT) AS n
             |  FROM documents),
             |c AS (SELECT doc_id, n,
             |    CAST(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) - n AS BIGINT) AS s
             |  FROM d),
             |b AS (SELECT doc_id, n, s, s // 256 AS f,
             |    CASE WHEN n <= 0 THEN s // 256 ELSE (s + n - 1) // 256 END AS l
             |  FROM c),
             |x AS (SELECT doc_id, n, s, f, l, CAST(seqs.seq AS BIGINT) AS seq
             |  FROM b, LATERAL (SELECT unnest(generate_series(f, l)) AS seq) seqs),
             |p AS (SELECT doc_id, seq,
             |    greatest(0, least(s + n, (seq + 1) * 256) - greatest(s, seq * 256)) AS t,
             |    CASE WHEN f <> l THEN 1 ELSE 0 END AS split
             |  FROM x)
             |SELECT seq AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(t) AS BIGINT) AS n_tokens,
             |  CAST(sum(split) AS BIGINT) AS n_split_docs,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM p GROUP BY seq ORDER BY seq_id""".stripMargin)
    )
  )

  /** Generate one integer-exact PCA power chain as DuckDB CTEs (shared by
    * q379 and q380's two-epoch replay): `p`-prefixed names, `sourceSelect`
    * supplies the quantized (vec_id, qv) relation. 8 rounds, all stages
    * MATERIALIZED (the chain references earlier CTEs many times — DuckDB
    * would otherwise inline them exponentially). */
  private def pcaChainSql(p: String, sourceSelect: String): String = {
    def iterSql(tt: Int): String = {
      val pv = if (tt == 1) s"${p}v0" else s"${p}v${tt - 1}"
      s"""${p}u$tt AS MATERIALIZED (SELECT mm.i, sum(mm.m * $pv.v) AS u
         |  FROM ${p}mm mm JOIN $pv ON $pv.i = mm.j GROUP BY 1),
         |${p}x$tt AS MATERIALIZED (SELECT max(abs(u)) AS mx FROM ${p}u$tt),
         |${p}v$tt AS MATERIALIZED (SELECT i, CASE WHEN u < 0 THEN -((-u) * 65536 // mx)
         |    ELSE (u * 65536) // mx END AS v FROM ${p}u$tt, ${p}x$tt),
         |${p}r$tt AS (SELECT CAST($tt AS BIGINT) AS iter,
         |    CAST((SELECT sum(va.v * mm.m * vb.v) FROM ${p}mm mm
         |        JOIN ${p}v$tt va ON va.i = mm.i JOIN ${p}v$tt vb ON vb.i = mm.j) * 10000
         |      // ((SELECT sum(v * v) FROM ${p}v$tt) * (SELECT tr FROM ${p}tr)) AS BIGINT)
         |      AS var_explained_bp,
         |    CAST((SELECT i FROM ${p}v$tt ORDER BY abs(v) DESC, i LIMIT 1) AS BIGINT)
         |      AS top_dim,
         |    CAST((SELECT sum(CASE WHEN v > 0 AND i < 32
         |        THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) ELSE 0 END)
         |      FROM ${p}v$tt) AS BIGINT) AS sign_lo,
         |    CAST((SELECT sum(CASE WHEN v > 0 AND i >= 32
         |        THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INTEGER)) ELSE 0 END)
         |      FROM ${p}v$tt) AS BIGINT) AS sign_hi)""".stripMargin
    }
    val its = (1 to 8).map(iterSql).mkString(",\n")
    s"""${p}q AS MATERIALIZED ($sourceSelect),
       |${p}px AS MATERIALIZED (SELECT vec_id, i, qv[i+1] AS x FROM ${p}q, range(64) t(i)),
       |${p}gm AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS HUGEINT) * b.x) AS g
       |  FROM ${p}px a JOIN ${p}px b USING (vec_id) GROUP BY 1, 2),
       |${p}sv AS MATERIALIZED (SELECT i, sum(CAST(x AS HUGEINT)) AS s FROM ${p}px GROUP BY 1),
       |${p}nn AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM ${p}q),
       |${p}mm AS MATERIALIZED (SELECT gm.i, gm.j, nn.n * gm.g - sa.s * sb.s AS m
       |  FROM ${p}gm gm, ${p}nn nn, ${p}sv sa, ${p}sv sb WHERE sa.i = gm.i AND sb.i = gm.j),
       |${p}tr AS MATERIALIZED (SELECT sum(m) AS tr FROM ${p}mm WHERE i = j),
       |${p}v0 AS MATERIALIZED (SELECT i, CAST(65536 AS HUGEINT) AS v FROM range(64) t(i)),
       |$its""".stripMargin
  }

  /** q352's blocklist: q336's four present phrases plus 1500 generated
    * absent entries — large enough that an array-scan plan pays a
    * visible per-token factor while the native hash-set path does not.
    * Shared with the specs so the perf A/B and the gate use ONE list. */
  private[graft] lazy val q352Phrases: Seq[String] =
    Seq("dup", "fast", "table hash", "merge group") ++
      (0 until 1200).map(i => s"blk$i") ++
      (0 until 300).map(i => s"blk$i blk${i + 1}")

  /** Generate the q331 oracle: `numMerges` chained CTE stages, each
    * re-deriving pair counts from the current vocabulary state, picking
    * the (count DESC, a ASC, b ASC) winner and rewriting states via
    * guarded `replace`; then a single encode expression nesting one
    * replace per merge in rank order. All stages are MATERIALIZED — each
    * w{s}/m{s} is referenced twice and must not be re-inlined. Assumes
    * every document participates in training (true whenever ndocs <=
    * Bpe.train's sampleDocs cap, which holds for every gate fixture; a
    * 100 TB run trains on a sample and would not use this gate query). */
  /** q368's literal corpus: an ASCII-prose source and a punctuation/CJK-
    * heavy source, shared by the query lambda (distributed trainers +
    * encoders) and the oracle generator (pure driver trainers + encoders)
    * so the gate proves driver == distributed on every pinned value. All
    * characters are BMP (the documented supplementary-plane tie-break
    * caveat in [[graft.operators.Bpe.trainDistributed]] never applies). */
  private[queries] lazy val q368Fixtures: Seq[(Long, String, String)] = {
    val ascii = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a scan of the table returns the rows in order",
      "the query plan joins the small table to the large table",
      "data flows from the scan to the join to the aggregate",
      "the fox and the dog share the same den",
      "plans that broadcast the small side win at scale")
    val dense = Seq(
      "数据库查询计划在大规模下的表现非常重要",
      "¡hola! ¿cómo está el añejo café — sí, señor?",
      "naïve résumé façade coöperate — déjà vu, garçon!",
      "大数据处理需要分布式计算框架的支持",
      "punctuation-heavy!!! text; with: lots, of... marks??? (and) [brackets] {braces}",
      "混合 mixed 文本 text 测试 test 用例 case")
    ascii.zipWithIndex.map { case (t, i) => (i.toLong, "ascii", t) } ++
      dense.zipWithIndex.map { case (t, i) => ((100 + i).toLong, "dense", t) }
  }

  /** q389's literal fixture: 120 documents over a 397-word synthetic
    * vocabulary (LCG-drawn 6–10 letter words), sized so the byte-level
    * merge space comfortably exceeds 1000 merges (Σ per-word byte length
    * ≈ 3.2k candidate merges) — the production-merge-count regime the
    * scalable trainer exists for, kept literal so the oracle generator
    * can replay training without corpus access. */
  private[queries] lazy val q389Fixtures: Seq[(Long, String)] = {
    def word(i: Int): String = {
      var st = i * 2654435761L + 97531L
      val len = 6 + math.floorMod(st >>> 20, 5L).toInt
      (0 until len).map { _ =>
        st = st * 6364136223846793005L + 1442695040888963407L
        ('a' + math.floorMod(st >>> 16, 26L).toInt).toChar
      }.mkString
    }
    var sel = 11L
    (0 until 120).map { d =>
      val text = (0 until 40).map { _ =>
        sel = sel * 6364136223846793005L + 1442695040888963407L
        word(math.floorMod(sel >>> 16, 397L).toInt)
      }.mkString(" ")
      (d.toLong, text)
    }
  }

  /** q109's three literal fixtures — LCG printable noise, LCG common-word
    * prose, a repeated bigram run — shared by the query lambda and the
    * oracle generator so the pinned percentages and the measured ones are
    * computed from the SAME strings. */
  private[queries] lazy val q109Fixtures: Seq[(Long, String)] = {
    val vocab = Vector("the", "of", "and", "to", "a", "in", "is", "was",
      "he", "for", "it", "with", "as", "his", "on", "be", "at", "by",
      "had", "not", "are", "but", "from", "or", "have", "an", "they",
      "which", "one", "you", "were", "her", "all", "she", "there",
      "would", "their", "we", "him", "been", "has", "when", "who",
      "will", "more", "no", "if", "out", "so", "said", "what", "up",
      "its", "about", "into", "than", "them", "can", "only", "other",
      "new", "some", "could", "time")
    var st = 7L
    val prose = (1 to 800).map { _ =>
      st = st * 6364136223846793005L + 1442695040888963407L
      vocab(math.floorMod(st >>> 16, 64L).toInt)
    }.mkString(" ")
    var sn = 42L
    val noise = {
      val sb = new StringBuilder
      while (sb.length < 4096) {
        sn = sn * 6364136223846793005L + 1442695040888963407L
        sb.append((33 + math.floorMod(sn >>> 16, 94L).toInt).toChar)
      }
      sb.take(4096).toString
    }
    Seq((-3L, noise), (-2L, prose), (-1L, "ab" * 2048))
  }

  /** Deflater level-6 compressed size as a percentage of raw — the exact
    * loop [[TextAnalysis.compressionRatio]] runs per row, evaluated on the
    * driver to pin the q109 fixture oracle against THIS JVM's zlib. */
  private[queries] def deflatePct(text: String): Long = {
    val raw = text.getBytes("UTF-8")
    val deflater = new java.util.zip.Deflater(6)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](64 * 1024)
    var compressed = 0L
    while (!deflater.finished()) compressed += deflater.deflate(buf)
    deflater.end()
    compressed * 100L / raw.length
  }

  /** DuckDB replay of [[graft.operators.Dsir.halfBitLog2]] — the SAME
    * two-regime floor(2·log2 n): exact `length(bin(n²))−1` below 2^31;
    * above it, 2·(bitlen−1) plus the top-31-bit-mantissa half-power test
    * against 2^61 (the mantissa folds back from the binary-string prefix
    * exactly like the Spark side's `conv(substring(bin(n),1,31),2,10)`).
    * Formula-identical on both engines, so parity holds at any n < 2^62,
    * including the one-in-2^31 mantissa knife edge. `e` must be a
    * BIGINT-typed SQL expression (cast HUGEINT sums first). */
  private def dsirQlSql(e: String): String =
    s"""(CASE WHEN ($e) < 2147483648
       |  THEN length(to_base(($e)*($e), 2)) - 1
       |  ELSE 2 * (length(to_base($e, 2)) - 1)
       |    + (CASE WHEN power_m.m * power_m.m >= 2305843009213693952
       |       THEN 1 ELSE 0 END) END)""".stripMargin
      .replace("power_m.m",
        s"list_reduce(list_transform(string_split(substr(to_base($e, 2), 1, 31), ''), " +
          s"c -> CAST(c AS BIGINT)), (a, d) -> a * 2 + d)")
      .replaceAll("\\s+", " ")

  /** The DSIR weight-fit replay shared by q332, q333 and (per domain)
    * q343: the full CTE chain from tokens to a
    * `<p>weights(doc_id, n_features, weight_x1000)` relation,
    * formula-identical to [[graft.operators.Dsir.importanceWeights]]
    * (base-31 feature hash, 8192 buckets, two-regime half-bit logs via
    * [[dsirQlSql]], +256-halfbit positivity offset). `p` prefixes every
    * CTE name so K domain chains coexist in one WITH; `tgtSql` is the
    * domain's membership predicate. */
  private def dsirDomainCtes(p: String, tgtSql: String): String =
    raw"""${p}toks AS (SELECT doc_id, $tgtSql AS tgt,
         |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
         |${p}feats AS (SELECT doc_id, tgt, unnest(list_concat(t,
         |      list_transform(range(greatest(len(t) - 1, 0)),
         |        i -> t[i+1] || ' ' || t[i+2]))) AS f FROM ${p}toks),
         |${p}fb AS (SELECT doc_id, tgt,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(f, ''), c -> CAST(ord(c) AS BIGINT))),
         |      (a, c) -> (a * 31 + c) % 144115188075855859) % 8192 AS b FROM ${p}feats),
         |${p}cnt AS (SELECT b,
         |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
         |  FROM ${p}fb GROUP BY b),
         |${p}llr AS (SELECT b,
         |    CAST(${dsirQlSql("ct+1")}
         |       - ${dsirQlSql("cr+1")} AS BIGINT) AS l FROM ${p}cnt),
         |${p}tot AS (SELECT CAST(sum(ct) + 8192 AS BIGINT) AS tt,
         |    CAST(sum(cr) + 8192 AS BIGINT) AS tr FROM ${p}cnt),
         |${p}norm AS (SELECT
         |    CAST(${dsirQlSql("tt")}
         |       - ${dsirQlSql("tr")} AS BIGINT) AS nl FROM ${p}tot),
         |${p}doc AS (SELECT ${p}fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |    CAST(sum(l) AS BIGINT) AS s
         |  FROM ${p}fb JOIN ${p}llr USING (b) GROUP BY ${p}fb.doc_id),
         |${p}weights AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, n_features,
         |  CAST((s - n_features * nl + 256 * n_features) * 1000 // n_features
         |       - 256000 AS BIGINT) AS weight_x1000
         |FROM ${p}doc, ${p}norm)""".stripMargin

  private lazy val dsirWeightsCtes: String = dsirDomainCtes("", "lang = 'zh'")

  private def bpeReplaySql(numMerges: Int): String = {
    val S = "chr(1)"
    val SS = s"$S || $S" // doubled separator: adjacent matches never share a guard
    val words = "SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word\n" +
      "        FROM documents WHERE text IS NOT NULL AND text <> ''"
    val parts = Vector.newBuilder[String]
    parts += s"""w0 AS MATERIALIZED (
                |  SELECT $SS || array_to_string(string_split(word, ''), $SS) || $SS AS state,
                |         CAST(count(*) AS BIGINT) AS n
                |  FROM ($words)
                |  GROUP BY 1)""".stripMargin
    for (i <- 1 to numMerges) {
      val p = i - 1
      parts += s"""m$i AS MATERIALIZED (
                  |  SELECT a, b FROM (
                  |    SELECT syms[j] AS a, syms[j+1] AS b, sum(n) AS cnt
                  |    FROM (SELECT string_split(state, $SS) AS syms, n FROM w$p),
                  |         LATERAL (SELECT unnest(range(2, len(syms) - 1)) AS j)
                  |    GROUP BY 1, 2)
                  |  ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      parts += s"""w$i AS MATERIALIZED (
                  |  SELECT replace(state, $S || m.a || $SS || m.b || $S, $S || m.a || m.b || $S) AS state,
                  |         CAST(sum(n) AS BIGINT) AS n
                  |  FROM w$p, m$i m GROUP BY 1)""".stripMargin
    }
    val encExpr = (1 to numMerges).foldLeft(
      s"$SS || array_to_string(string_split(word, ''), $SS) || $SS") { (acc, i) =>
      s"replace($acc, $S || m$i.a || $SS || m$i.b || $S, $S || m$i.a || m$i.b || $S)"
    }
    val mJoin = (1 to numMerges).map(i => s"m$i").mkString(", ")
    parts += s"""wordtok AS MATERIALIZED (
                |  SELECT word, CAST(len(string_split($encExpr, $SS)) - 2 AS BIGINT) AS ntok
                |  FROM (SELECT DISTINCT word FROM ($words)), $mJoin)""".stripMargin
    "WITH " + parts.result().mkString(",\n") + s"""
      |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |       CAST(coalesce(sum(t.ntok), 0) AS BIGINT) AS n_bpe_tokens
      |FROM documents d
      |LEFT JOIN (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
      |           FROM documents) w ON d.doc_id = w.doc_id
      |LEFT JOIN wordtok t ON w.word = t.word
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
