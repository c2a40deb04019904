package graft

import org.apache.spark.sql.functions._
import graft.operators.{Par, TextAnalysis, Bpe, Dedup}

/** The scan-parallelism guard ([[graft.operators.Par.ensureParallel]]):
  * a single-partition input (the single-file parquet fixture shape) must
  * be round-robined up to the session's shuffle parallelism before an
  * expensive per-row stage, an already-parallel input must pass through
  * untouched, and the conf lever must disable the guard entirely. The
  * plan-shape test pins the q318 pushdown trap: the heavy tokenize
  * expression must evaluate ONCE, above the exchange — a pushable
  * size-filter would be substituted through the Project and re-run the
  * whole tokenize below the exchange on the one scan task. */
class ParSpec extends SparkTestBase {
  import spark.implicits._

  private def target = spark.sessionState.conf.numShufflePartitions

  test("ensureParallel: single-partition input is raised to session parallelism") {
    val one = spark.range(100).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    assert(Par.ensureParallel(one).rdd.getNumPartitions == target)
  }

  test("ensureParallel: already-parallel input passes through with no repartition") {
    val wide = spark.range(100).repartition(target).toDF("id")
    val out = Par.ensureParallel(wide)
    assert(out.rdd.getNumPartitions == target)
    // no second exchange stacked on top of the existing one (the physical
    // plan prints the partitioning CamelCase — match case-insensitively)
    assert("(?i)roundrobinpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).size <= 1)
  }

  test("ensureParallel: non-scan-rooted plans pass through reference-identical") {
    // probing .rdd on an exchange-bearing plan under AQE materializes its
    // upstream stages at composition time, discarded on re-plan — so the
    // guard must not even LOOK at partition counts of such frames. The
    // eq-assertions prove the short-circuit fires before any probe.
    val agg = spark.range(100).toDF("id").groupBy("id").count()
    assert(Par.ensureParallel(agg) eq agg)
    val joined = spark.range(10).toDF("a")
      .join(spark.range(10).toDF("a"), "a")
    assert(Par.ensureParallel(joined) eq joined)
    // but narrow wrappers over a scan stay guarded: a coalesced, projected,
    // filtered scan is still the single-file fixture shape
    val wrapped = spark.range(100).toDF("id").coalesce(1)
      .select((col("id") * 2).as("x")).filter(col("x") >= 0)
    assert(Par.ensureParallel(wrapped).rdd.getNumPartitions == target)
    // and a localCheckpoint (LeafNode) keeps its guard too
    val cp = spark.range(100).toDF("id").coalesce(1).localCheckpoint()
    assert(Par.ensureParallel(cp).rdd.getNumPartitions == target)
  }

  test("ensureParallel: spark.graft.scanParallel=false disables the guard") {
    spark.conf.set("spark.graft.scanParallel", "false")
    try {
      val one = spark.range(100).toDF("id").coalesce(1)
      assert(Par.ensureParallel(one).rdd.getNumPartitions == 1)
    } finally spark.conf.set("spark.graft.scanParallel", "true")
  }

  test("guarded operators spread a single-partition input across the session") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n"))
      .toDF("doc_id", "text").coalesce(1)
    assert(Dedup.cdcChunks(docs, "doc_id", "text", k = 2, divisor = 2)
      .rdd.getNumPartitions == target)
    assert(Bpe.encodeTokens(docs, "doc_id", "text", Seq(("a", "b")))
      .rdd.getNumPartitions == target)
  }

  test("plan shape: ngramModel tokenizes once, above the exchange (q318 trap)") {
    val docs = Seq((1L, "a b a b c"), (2L, "x y"), (3L, ""), (4L, "lone"))
      .toDF("doc_id", "text").coalesce(1)
    val model = TextAnalysis.ngramModel(docs, "text", n = 2, k = 3)
    val plan = model.queryExecution.executedPlan.toString
    assert("(?i)roundrobinpartitioning".r.findAllIn(plan).nonEmpty,
      s"guard exchange missing from plan:\n$plan")
    assert("split\\(text".r.findAllIn(plan).size == 1,
      s"tokenize must appear exactly once (a pushed filter would re-run it " +
        s"below the exchange), plan:\n$plan")
    // semantics unchanged by the CASE-guard rewrite: short/empty docs are
    // simply absent, gram counts are exact
    val rows = model.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.contains(("a", 1L, "b", 2L)))
    assert(!rows.exists(_._1.contains("lone")))
  }

  test("lmFluencyScore: short docs drop, in-model grams rank exactly") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"), (4L, "z q"))
      .toDF("doc_id", "text").coalesce(1)
    val out = TextAnalysis.lmFluencyScore(docs, "doc_id", "text", n = 2, k = 2)
      .orderBy("doc_id").collect()
    // doc 3 has one token -> no grams -> absent
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_grams") == 3L && d1.getAs[Long]("in_model") == 3L)
  }
}
