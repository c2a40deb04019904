package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling ([[graft.operators.Dsir]]): the integer
  * half-bit log, weight determinism across layout, the short/empty-doc
  * contract, and — the part no oracle can check — that the selection
  * actually ENRICHES the target distribution on the real fixture. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("halfBitLog2 equals floor(2*log2 n) across the boundary cases") {
    val ns = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 31) - 1, 1L << 31, 3000000000L)
    val got = ns.toDF("n")
      .select(Dsir.halfBitLog2(col("n")).cast("long")).as[Long].collect()
    val expected = ns.map(n => java.lang.Long.toBinaryString(n * n).length - 1L)
    assert(got.toSeq == expected,
      s"halfBitLog2 diverged: got ${got.toSeq} expected $expected")
    // the float form this replaces is NOT safe: floor(2*log2 n) via
    // doubles must still agree here, but the STRING form is the contract
    expected.zip(ns).foreach { case (e, n) =>
      assert(e == math.floor(2.0 * math.log(n.toDouble) / math.log(2.0) + 1e-9).toLong)
    }
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
}
