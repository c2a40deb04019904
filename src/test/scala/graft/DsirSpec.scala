package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling ([[graft.operators.Dsir]]): the integer
  * half-bit log, weight determinism across layout, the short/empty-doc
  * contract, and — the part no oracle can check — that the selection
  * actually ENRICHES the target distribution on the real fixture. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("halfBitLog2 equals floor(2*log2 n) across both regimes up to 2^62") {
    // small regime (n < 2^31): EXACT, including every power-of-two edge.
    // large regime (the r12 n^2 form silently wrapped here): exact
    // except a documented one-in-2^31 mantissa knife edge, where the
    // formula may sit exactly 1 half-bit low — never high, never throws.
    val knife = 1518500249L // floor(2^30.5): the only under-reporting mantissa
    val ns = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 31) - 1, 1L << 31, (1L << 31) + 1, 3000000000L, 3100000000L,
      (1L << 40) - 1, 1L << 40, 987654321987L,
      (1L << 61) - 1, 1L << 61, (1L << 62) - 1,
      // knife-edge neighborhood at several shifts: mantissa == floor(2^30.5)
      knife << 8, (knife << 8) + 255L, (knife + 1) << 8, (knife - 1) << 8)
    val got = ns.toDF("n")
      .select(Dsir.halfBitLog2(col("n")).cast("long")).as[Long].collect()
    def mantissa31(n: Long): Long = {
      val bits = java.lang.Long.toBinaryString(n)
      java.lang.Long.parseLong(bits.take(31), 2)
    }
    ns.zip(got).foreach { case (n, g) =>
      val truth = (BigInt(n) * BigInt(n)).bitLength - 1L
      if (n < (1L << 31) || mantissa31(n) != knife)
        assert(g == truth, s"n=$n: got $g expected $truth")
      else // knife edge: low bits decide; formula may be 1 low by design
        assert(g == truth || g == truth - 1, s"n=$n knife: got $g truth $truth")
    }
    // the float form this replaces is NOT safe cross-engine; in the small
    // regime it must still agree (the STRING form is the contract)
    ns.filter(_ < (1L << 31)).foreach { n =>
      assert((BigInt(n) * BigInt(n)).bitLength - 1L ==
        math.floor(2.0 * math.log(n.toDouble) / math.log(2.0) + 1e-9).toLong)
    }
  }

  test("halfBitLog2 replays value-identically in the DuckDB oracle form") {
    // the q332 oracle's dsirQlSql must be formula-identical: pin the
    // Spark expression's outputs here so the oracle generator's spec in
    // the verify gate (q332 hash match) is anchored by explicit values
    // spanning the regime switch — these constants were cross-checked
    // against DuckDB's to_base/list_reduce form when the formula landed
    val pinned = Seq(
      1L -> 0L, 3L -> 3L, 2147483647L -> 61L, 2147483648L -> 62L,
      3000000000L -> 62L, (1L << 40) -> 80L, ((1L << 62) - 1) -> 123L)
    val got = pinned.map(_._1).toDF("n")
      .select(Dsir.halfBitLog2(col("n")).cast("long")).as[Long].collect()
    assert(got.toSeq == pinned.map(_._2),
      s"pinned ql values moved: ${pinned.map(_._1).zip(got.toSeq)}")
  }

  test("weights: deterministic across layout, short docs follow the token contract") {
    val docs = Seq(
      (1L, "alpha beta alpha", "t"), (2L, "alpha beta gamma delta", "r"),
      (3L, "beta beta beta", "r"), (4L, "solo", "r"), (5L, "", "r"),
      (6L, null.asInstanceOf[String], "t"), (7L, "alpha alpha", "t")
    ).toDF("id", "text", "grp")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(df, "id", "text", col("grp") === "t", buckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = run(docs)
    // doc 5 ("" -> no tokens) and doc 6 (null) are absent; doc 4 has ONE
    // token -> one unigram feature, no bigram
    assert(!base.exists(r => r._1 == 5L || r._1 == 6L))
    assert(base.find(_._1 == 4L).get._2 == 1L)
    // unigrams + bigrams: "alpha beta alpha" -> 3 + 2 = 5 features
    assert(base.find(_._1 == 1L).get._2 == 5L)
    // layout cannot move a weight: repartitioned + shuffled input agrees
    assert(run(docs.repartition(7)) == base)
    // target-looking docs outscore raw-only vocabulary: doc 7 (pure
    // target vocab) must beat doc 3 (raw-only vocab)
    val w = base.map(r => r._1 -> r._3).toMap
    assert(w(7L) > w(3L), s"target-vocab doc must outscore raw-vocab doc: $w")
  }

  test("frozen model: same-corpus score reproduces importanceWeights; unseen vocab scores llr 0") {
    val docs = Seq(
      (1L, "alpha beta alpha", "t"), (2L, "alpha beta gamma delta", "r"),
      (3L, "beta beta beta", "r"), (4L, "solo", "r"), (7L, "alpha alpha", "t")
    ).toDF("id", "text", "grp")
    val model = Dsir.fitModel(docs, "text", col("grp") === "t", buckets = 64)
    // model shape: one row per occupied bucket, the normalizer repeated
    val rows = model.collect()
    assert(rows.nonEmpty && rows.map(_.getAs[Long]("norm")).distinct.length == 1)
    // the frozen-model contract: scoring the SAME corpus against its own
    // model IS importanceWeights, row for row
    def tup(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tup(Dsir.scoreWithModel(docs, "id", "text", model, buckets = 64)) ==
      tup(Dsir.importanceWeights(docs, "id", "text", col("grp") === "t", buckets = 64)))
    // a batch of mostly-unseen vocabulary: a feature whose bucket the
    // model never saw coalesces to llr 0 (absence = zero-count presence);
    // at 64 buckets other features may COLLIDE into occupied buckets, so
    // the expected weight replays the exact lookup-and-fold from the
    // model rows rather than assuming s = 0
    val unseen = Seq((100L, "zq wk ej")).toDF("id", "text")
    val u = Dsir.scoreWithModel(unseen, "id", "text", model, buckets = 64).head()
    val norm = rows.head.getAs[Long]("norm")
    val llrMap = rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("llr")).toMap
    val fb = unseen
      .withColumn("__toks", expr("filter(split(text, '\\\\s+'), x -> x != '')"))
      .select(Dsir.featureBucketsExpr("__toks", 64).as("fb"))
      .head().getSeq[Long](0)
    assert(fb.exists(b => !llrMap.contains(b)), s"fixture must hit an unseen bucket: $fb")
    val s = fb.map(b => llrMap.getOrElse(b, 0L)).sum
    assert(u.getAs[Long]("n_features") == 5L)
    assert(u.getAs[Long]("weight_x1000") ==
      (s - 5L * norm + 256L * 5L) * 1000L / 5L - 256000L)
    // featureless docs emit no row, like the batch scorer
    assert(Dsir.scoreWithModel(Seq((9L, "")).toDF("id", "text"),
      "id", "text", model, buckets = 64).count() == 0L)
  }

  test("fixture enrichment: top-100 by weight holds >= 3x the base rate of the target") {
    // sf0.01 (500 docs): measured 66/100 zh hits at a 15% base rate
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val target = col("lang") === "zh"
    val top = Dsir.importanceWeights(docs, "doc_id", "text", target, buckets = 8192)
      .orderBy(col("weight_x1000").desc, col("doc_id")).limit(100)
      .join(docs.select(col("doc_id"), target.as("t")), Seq("doc_id"))
    val hits = top.filter(col("t")).count()
    val total = docs.count()
    val baseRate = docs.filter(target).count().toDouble / total
    assert(hits >= math.ceil(3 * 100 * baseRate).toLong,
      s"top-100 target hits $hits under 3x base rate $baseRate")
  }

  test("resample composition: the SAMPLED set (not just the top-k) is target-enriched") {
    import graft.operators.Sampling
    // q333's exact pipeline up to the sample stage: weights -> clamped
    // affine keep_pct -> md5-hash weighted sample. The enrichment claim
    // must hold on the whole resampled POOL, which is what trains;
    // measured 53/141 zh (37.6%) at the 15% base rate on sf0.01
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "zh", buckets = 8192)
    val enr = w.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("keep_pct", least(lit(100L),
        greatest(lit(0L), expr("(weight_x1000 + 2000) div 6"))))
    val samp = Sampling.weightedSample(enr, "doc_id", "keep_pct", maxWeight = 100)
      .select(col("doc_id"), col("lang")).collect()
    val n = samp.length.toLong
    val zh = samp.count(_.getString(1) == "zh").toLong
    val total = docs.count()
    val baseRate = docs.filter(col("lang") === "zh").count().toDouble / total
    assert(n > 50 && n < total / 2, s"sample must subsample meaningfully: $n of $total")
    assert(zh.toDouble / n >= 2 * baseRate,
      s"sampled pool zh rate ${zh.toDouble / n} under 2x base rate $baseRate")
  }

  test("multi-domain: each per-domain weight equals the single-target fit, mixture exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val domains = Seq("zh" -> (col("lang") === "zh"), "en" -> (col("lang") === "en"))
    val multi = Dsir.multiDomainWeights(docs, "doc_id", "text", domains, Seq(700L, 300L))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_features"), r.getAs[Long]("w_zh_x1000"),
          r.getAs[Long]("w_en_x1000"), r.getAs[Long]("mix_weight_x1000")))).toMap
    // equality with K independent single-target fits: the shared-pass
    // model (ct_k, total - ct_k) IS the single-target contrast, so the
    // column must match row-for-row — the property that makes the
    // 2-passes-for-any-K design trustworthy
    for ((name, pred) <- domains) {
      val single = Dsir.importanceWeights(docs, "doc_id", "text", pred)
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_features"), r.getAs[Long]("weight_x1000")))).toMap
      assert(single.keySet == multi.keySet)
      for ((id, (nf, w)) <- single) {
        val m = multi(id)
        assert(m._1 == nf, s"doc $id n_features: multi ${m._1} vs single $nf")
        val mw = if (name == "zh") m._2 else m._3
        assert(mw == w, s"doc $id domain $name: multi $mw vs single $w")
      }
    }
    // mixture is the exact offset integer formula on the published columns
    for ((id, (_, wz, we, mix)) <- multi) {
      val want = (700L * (wz + 256000L) + 300L * (we + 256000L)) / 1000L - 256000L
      assert(mix == want, s"doc $id mixture: got $mix want $want")
    }
    // per-domain enrichment: each domain's top-100 beats 2x its base rate
    val total = docs.count()
    for ((name, pred) <- domains) {
      val baseRate = docs.filter(pred).count().toDouble / total
      val colName = s"w_${name}_x1000"
      val top = Dsir.multiDomainWeights(docs, "doc_id", "text", domains, Seq(500L, 500L))
        .orderBy(col(colName).desc, col("doc_id")).limit(100)
        .join(docs.select(col("doc_id"), pred.as("t")), Seq("doc_id"))
      val hits = top.filter(col("t")).count()
      assert(hits >= math.ceil(2 * 100 * baseRate).toLong,
        s"domain $name top-100 hits $hits under 2x base rate $baseRate")
    }
    // argument contract
    assertThrows[IllegalArgumentException](Dsir.multiDomainWeights(
      docs, "doc_id", "text", domains, Seq(700L)))
    assertThrows[IllegalArgumentException](Dsir.multiDomainWeights(
      docs, "doc_id", "text", domains, Seq(0L, 0L)))
    assertThrows[IllegalArgumentException](Dsir.multiDomainWeights(
      docs, "doc_id", "text", Seq("a b" -> lit(true)), Seq(1L)))
    assertThrows[IllegalArgumentException](Dsir.multiDomainWeights(
      docs, "doc_id", "text", Seq("d" -> lit(true), "d" -> lit(false)), Seq(1L, 1L)))
  }
}
