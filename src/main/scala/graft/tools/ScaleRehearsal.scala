package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale rehearsal for the flagship paths — converts the "survives a
  * 100× scale-up" posture from a plan-shape argument into a measured
  * scaling ratio, recorded in BENCHOUT.json next to the sf0.1 numbers.
  *
  * Data: no sf1 testdata is driver-provided, so the rehearsal derives one
  * from sf0.1 by unioning `copies` key-offset replicas of the two tables
  * the flagship queries read (`orders`, `documents`). Key offsets are
  * 1e9-spaced so the diff fixtures' own planted +10M/+1M appended keys
  * stay inside their replica's band (no cross-replica key collisions that
  * would double join cardinalities).
  *
  * Replica text gets a replica tag token spliced after every 2nd word.
  * Without it, every document would have `copies−1` byte-identical twins
  * and the LSH near-dup workload would grow quadratically in the
  * replication factor — measuring fixture artifact, not engine scaling.
  * With a tag in every trigram-shingle window, cross-replica shingle
  * overlap drops to ~0, so near-dup DENSITY stays at the sf0.1 level and
  * a near-linear wall-time ratio is the honest pass criterion (≤ ~12×
  * wall for 10× rows per VERDICT r8 #2; documents carry ~1.5× chars from
  * the tags, so ratios up to ~15× on text-bound paths are still linear).
  *
  * Generation is one-time (a done-marker skips it) and write-once per
  * table; queries run unmodified — the same `SparkEntry.queries` closures,
  * pointed at the rehearsal dir. */
object ScaleRehearsal {

  /** Flagship paths per VERDICT r8 next-round item 2 — full keyed diff,
    * LSH dedup, curation pipeline, digest-narrowed diff — plus the suite's
    * two most expensive document operators (trained langid's fused corpus
    * trigram pass; transitive contamination's bounded cluster enumeration),
    * so the scaling claim covers the heaviest text paths, not just joins.
    * r12 (VERDICT r11 #5) adds the three most expensive clean-record
    * queries — threshold sweep (capped per-block all-pairs), model-DAG
    * Kahn waves (iterative left_anti peel), identity stitch
    * (star-contraction connected components over events) — so their
    * sub-linear claims are measured, not plan-shape reasoning. The KMV
    * replayable profile (q05, new r12) rides along: its O(k)-per-column
    * bounded-sketch claim should show near-flat scaling per row. */
  val Flagships: Seq[String] = Seq(
    "q05_profile_approx", "q332_dsir_select",
    "q11_diff_summary", "q32_dedup_minhash_lsh",
    "q88_curate_pipeline", "q206_diff_by_segments",
    "q138_trained_langid", "q236_transitive_contamination",
    "q318_threshold_sweep", "q306_model_dag_waves",
    "q285_identity_stitch",
    // r13 (VERDICT r12 #5, second tranche): the remaining clean floors
    // >= 1.9 s without 100x evidence — star-contraction CC over
    // documents (measured 9.5x per 100x), executed compaction (32x —
    // the set's most linear entry because the work IS a real row
    // rewrite), and the bloom-prune certificate (18x; fixed mBits, the
    // probe scan scales, the sketch does not).
    //
    // q257_prefix_filter_join was measured for this tranche and then
    // DELIBERATELY EXCLUDED: the replica-tag splice (every 2nd word)
    // degrades 3-shingles to effective bigrams, so the derived corpus's
    // 38.4M postings collapse to 300k distinct shingles (df≈128) and
    // ~every same-replica pair becomes a GENUINE t=50 candidate — 548M
    // distinct candidate pairs at 100x, unchanged by PPJoin's position
    // filter (measured), 618 s isolated and an OOM inside the shared
    // sweep JVM. That is the corpus's true quadratic answer, not an
    // engine defect: exact low-threshold set joins are output-bound on
    // low-diversity text, which is exactly the regime the suite hands
    // to MinHash-LSH (q32, rehearsed sub-linear above). Rehearsing
    // q257 here would measure the tag artifact, so its scale evidence
    // is the r13 probe record (PLANS.md) instead of a block ratio.
    "q259_cc_star",
    "q310_compaction_execute", "q224_bloom_join_prune",
    // r15 (VERDICT r14 #4): the four ops whose 100× story previously
    // rested on isolated PLANS.md notes, promoted into the auditable
    // block. q333 = the DSIR weight→resample→budget chain (per-row
    // feature hashing, the q332 family's heaviest composition); q334 =
    // the uncapped prefix-postings accounting — NOTE it rehearses the
    // POSTINGS BUILD (linear: explode + per-doc window + token agg),
    // not a pair join, so the tag-degraded corpus that excludes q257
    // does not go quadratic here (no candidate enumeration in its
    // plan); q336/q337 = the two heaviest r14 map-side text passes
    // (literal-array blocklist; sorted-codepoint entropy fold).
    "q333_dsir_resample_mix", "q334_prefix_cap_report",
    "q336_blocklist_filter", "q337_entropy_halfbit",
    // r16: the 64-bit banded-SimHash cap accounting — the operator whose
    // scale claim (16-bit band keyspace keeps caps non-binding on a
    // well-spread corpus; saturation is measured, never assumed) the
    // rehearsal directly evidences. One simhash pass prices both caps;
    // measured ~flat at 10× in the r16 warm probe (3.5 → 3.1 s).
    "q359_simhash_cap",
    // r17b: the integer-exact PCA Gram pass — the round's one new
    // mapPartitions kernel; replicas keep values identical, so the
    // certificate rows double as a scale-invariance check (see
    // ensureData's embeddings block)
    "q379_pca_power",
    // r18: the prior-labeling audit (one aggregate + one window over
    // documents — the nightly loop's new runtime gate, linear by
    // construction) and the fixed-length sequence packer (the
    // distributed two-phase prefix scan + bounded explode — the
    // decade ratio IS the "no single-task global sort" claim).
    // q388/q390/q391/q392 are DELIBERATELY absent: replicated
    // identical embeddings make the bucket-mate graph build quadratic
    // in copies (the q257-class fixture artifact documented above);
    // the walk's own per-probe cost is bounded by construction and
    // evidenced by the gated n_visited column instead.
    "q387_prior_audit", "q393_sequence_pack")

  /** Build (once per source-fixture state) the `copies`× dataset under
    * `outDir`; returns outDir. The done-marker carries a fingerprint of
    * the SOURCE tables (row counts), so a driver-regenerated or grown
    * sf0.1 invalidates the derived data instead of silently producing
    * ratios against a stale rehearsal set. */
  def ensureData(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int = 10): String = {
    val done = java.nio.file.Paths.get(outDir, "_REHEARSAL_READY")
    val fingerprint = Seq("orders", "documents", "events", "lineitem", "embeddings").map { t =>
      s"$t=${spark.read.parquet(s"$srcDir/$t.parquet").count()}"
    }.mkString(s"copies=$copies;", ";", "")
    if (java.nio.file.Files.exists(done) &&
      java.nio.file.Files.readString(done).trim == fingerprint) return outDir
    val off = 1000000000L

    val o = spark.read.parquet(s"$srcDir/orders.parquet")
    (0 until copies).map { i =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    // lineitem (q224 bloom prune, q310 compaction): the fact side of the
    // orders join — l_orderkey shifts by the SAME per-replica offset as
    // o_orderkey, so every replica keeps the source join cardinalities
    val l = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until copies).map { i =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    val d = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until copies).map { i =>
      val keyed = d.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) keyed
      else keyed
        .withColumn("text",
          regexp_replace(col("text"), "((\\S+ ){2})", s"$$1r$i "))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // embeddings (q379 PCA): vec_id shifts per replica, VALUES stay
    // identical — the scatter matrix of c identical replicas is exactly
    // c² times the source's, so the certificate's var/top-dim/sign rows
    // are scale-INVARIANT by construction and any drift in them at 10×
    // or 100× is an engine bug, while the wall measures the Gram pass's
    // linear corpus scan (the driver tail is fixed at dims²)
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until copies).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * off))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events (q285 identity stitch): the bipartite user↔device graph must
    // keep its component structure PER REPLICA — replicating user_id alone
    // would attach every replica's users to the SAME shared device keys
    // and collapse the whole corpus into a few giant components (graph
    // density artifact, not engine scaling). So both endpoints shift per
    // replica: user_id by 2000 (source band 0–1499) and props.k by 200
    // (source band 0–99), keeping max user 100×2000+1499 < the 1e6 device
    // offset q285 assumes even at 100 copies. props is rebuilt from the
    // extracted k — the fixture's props are exactly {"k": N}.
    val e = spark.read.parquet(s"$srcDir/events.parquet")
    (0 until copies).map { i =>
      e.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * 2000L))
        .withColumn("props",
          concat(lit("{\"k\": "),
            get_json_object(col("props"), "$.k").cast("long") + lit(i * 200L),
            lit("}")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    java.nio.file.Files.writeString(done, fingerprint + "\n")
    outDir
  }

  /** Standalone entry for iterating on the rehearsal without a full bench
    * sweep: generates (if needed) and runs the flagships at sf0.1 and
    * `SPARK_GRAFT_REHEARSAL_COPIES`× (default 10), printing one JSON line
    * per query with the ratio. A 100× run (~15M orders / 500k docs) is the
    * deeper one-off evidence pass; each copy count gets its own dir. */
  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_COPIES", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tools.Hygiene.silenceBoundedWindowWarn()
    val dir = ensureData(spark, sfDir,
      if (copies == 10) "target/testdata-sf1" else s"target/testdata-x$copies",
      copies)
    val base = run(spark, sfDir).toMap
    val big = run(spark, dir)
    big.foreach { case (n, s) =>
      val b = base(n)
      println(f"""{"query":"$n","copies":$copies,"sf01":$b%.3f,"scaled":$s%.3f,"ratio":${s / b}%.2f}""")
    }
    spark.stop()
  }

  /** Run each flagship at `dir`, `reps` times, returning min seconds. */
  def run(spark: SparkSession, dir: String, reps: Int = 2): Seq[(String, Double)] =
    Flagships.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        Hygiene.unpersistAll(spark)
        dt
      }
      name -> times.min
    }
}
