package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only per partitioning — a repartition or a
  * different executor count changes the sample, which is poison for
  * reproducible dataset builds. These operators decide membership from a
  * HASH OF THE ROW KEY alone: any engine, any partitioning, any scale
  * produces the identical sample (and the md5 fold is the same one DuckDB
  * computes, so samples are oracle-checkable). Embarrassingly parallel —
  * a pure filter, no shuffle, pushes down around column pruning.
  *
  * The hash is uniform on [0, 2^32), so `pct`% selects pct/100 of keys in
  * expectation with deviation O(1/√n); membership is stable under corpus
  * growth (a key's verdict never changes as other rows arrive) — the
  * property that makes held-out sets stay held out across pipeline runs.
  */
object Sampling {

  /** The key-hash domain size — [[hash32Of]] is uniform on [0, 2^32). */
  private val Two32 = BigInt(1) << 32

  /** Engine-portable 32-bit key hash in [0, 2^32): the
    * `conv(substring(md5(key),1,8),16,10)` fold every oracle replicates as
    * `('0x'||substr(md5(key),1,8))::BIGINT`. Single source of truth for all
    * sampling decisions. */
  def hash32Of(keyCol: String): Column =
    expr(s"cast(conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint)")

  /** Uniform per-key bucket in [0, 100): `hash32(key) mod 100`. */
  def bucketOf(keyCol: String): Column = hash32Of(keyCol) % 100

  /** Keep ~`pct`% of rows, decided per key — deterministic across runs,
    * partitionings, and engines. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.filter(bucketOf(keyCol) < pct)
  }

  /** Stratified deterministic sample: an independent per-stratum rate.
    * Strata absent from `pctByStratum` default to 0 (dropped) — explicit
    * rates only, so a new stratum appearing upstream can't silently flood
    * the sample. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      pctByStratum: Map[String, Int]
  ): DataFrame = {
    require(pctByStratum.values.forall(p => p >= 0 && p <= 100), "rates must be 0..100")
    val rate = pctByStratum.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucketOf(keyCol) < rate)
  }

  /** Disjoint train/holdout split on the same key hash: a key lands in
    * exactly one side, forever (holdout = buckets [100-holdoutPct, 100)). */
  def trainHoldoutSplit(df: DataFrame, keyCol: String, holdoutPct: Int): (DataFrame, DataFrame) = {
    require(holdoutPct > 0 && holdoutPct < 100, s"holdoutPct must be 1..99, got $holdoutPct")
    val b = bucketOf(keyCol)
    (df.filter(b < 100 - holdoutPct), df.filter(b >= 100 - holdoutPct))
  }

  /** Three-way train/val/test assignment on the same key hash: bucket
    * [0, 100−valPct−testPct) → train, then val, then test — every key lands
    * in exactly one split, forever, across runs/engines/partitionings. A
    * pure map expression (no shuffle, no RNG); downstream writers filter on
    * `split`, so the assignment column is also the natural partition column
    * for a `partitionBy("split")` export. */
  def threeWaySplit(df: DataFrame, keyCol: String, valPct: Int, testPct: Int): DataFrame = {
    require(valPct > 0 && testPct > 0 && valPct + testPct < 100,
      s"val/test must be positive and sum below 100, got $valPct/$testPct")
    val b = bucketOf(keyCol)
    df.withColumn("split",
      when(b < 100 - valPct - testPct, lit("train"))
        .when(b < 100 - testPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Token-budget curation cut: walk the corpus in `orderCol` order
    * (callers put their quality ranking there — best first) and keep the
    * contiguous PREFIX whose running token total stays within `budget` —
    * "the best N-token dataset this corpus can yield", the final selection
    * step of a budgeted pretraining mix. Prefix semantics are deliberate:
    * once a document overflows the budget, later (worse) documents do NOT
    * backfill the gap — a backfilling knapsack would make the cut depend
    * on every downstream doc and lose the clean "quality threshold"
    * interpretation.
    *
    * The running total is [[graft.operators.Packing.withRunningTotal]]'s
    * two-phase distributed scan (range repartition + per-slice window +
    * #partitions-row offset collect) — no single-task global window at any
    * scale. `orderCol` must be unique (compose `quality·K + id`). Output
    * keeps `cum_tokens` so the cut is auditable. */
  def selectByTokenBudget(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    Packing.withRunningTotal(df, orderCol, tokenCol, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
  }

  /** Quality-weighted deterministic sampling: keep a row with probability
    * `weight/maxWeight`, decided by the row's key hash — the soft
    * alternative to a hard quality cutoff (a doc scoring 80 keeps 80% of
    * its hash buckets, a doc scoring 20 keeps 20%, verdicts stable across
    * runs/partitionings/engines like every sampler here). `weightCol` must
    * be integer-valued in [0, maxWeight]; out-of-range weights clamp.
    * Pure filter — pushdown-friendly, no shuffle. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, maxWeight: Int = 100): DataFrame = {
    require(maxWeight > 0, "maxWeight must be positive")
    val w = least(greatest(col(weightCol).cast("long"), lit(0L)), lit(maxWeight.toLong))
    df.filter(hash32Of(keyCol) * maxWeight < w * Two32.toLong)
  }

  /** Curation top-k: keep the best `k` rows per group under an explicit
    * ordering — "the 100 highest-quality documents per language" selection
    * step of a curated dataset build. Callers pass a DETERMINISTIC ordering
    * (break ties on a unique key) or the cut line is partition-dependent.
    *
    * Scale: a per-group window shuffle on `groupCol`; k rows survive per
    * group. With FEW large groups the shuffle skews — mitigate upstream by
    * pre-aggregating a per-partition top-k (each partition can discard all
    * but its local k before the exchange; [[graft.functions.TopKAggregator]]
    * is that form for aggregable payloads). For the usual many-groups case
    * the window is one balanced exchange. */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int, order: Seq[Column]): DataFrame = {
    require(k > 0, "k must be positive")
    require(order.nonEmpty, "ordering must be explicit")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= k)
  }

  /** Per-group cap: keep at most `cap` rows per group, chosen by the
    * engine-portable key hash (an UNBIASED uniform subsample of each group,
    * not a top-k by any payload ordering) with the raw key as the total
    * tie-break. The C4/RefinedWeb "domain cap" — no crawl domain may
    * contribute more than `cap` documents — and deterministic across runs,
    * partitionings, and engines. One window exchange on the group key; for
    * hot groups AQE's skew handling applies, and the output is bounded by
    * `groups × cap` regardless of input skew. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    topKPerGroup(df, groupCol, cap, Seq(hash32Of(keyCol), col(keyCol)))
  }

  /** Rebalance a corpus toward a target DOMAIN MIXTURE — the data-mixing
    * step of a training build ("30% code, 50% web, 20% books"): given
    * relative weights per domain and a total row budget, compute each
    * domain's deterministic keep-threshold and sample it per key.
    *
    * The keep test is `hash32(key) < threshold_d` at the hash's FULL 2^32
    * resolution: `threshold_d = ⌊budget·w_d·2^32 / (Σw·n_d)⌋`, computed in
    * BigInt on the driver (exact — no overflow for any Long budget, no
    * basis-point grid to floor a small-but-positive rate down to zero).
    * Domains without a weight drop; a domain smaller than its target keeps
    * everything (mixtures can only be approached from above without
    * upsampling — callers see the shortfall in the output counts). One tiny
    * count aggregate (bounded by #WEIGHTED domains — the count is filtered
    * to `weights.keys` before the collect, so a high-cardinality domain
    * column can't blow the driver; `domainCol` is a MIXTURE LABEL, tens of
    * values, not a raw URL host) feeds the thresholds; the sample itself is
    * a pure pushdown-friendly filter. */
  def rebalanceToMixture(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      weights: Map[String, Int],
      totalBudget: Long
  ): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "weights must be non-negative with a positive sum")
    require(totalBudget > 0, "totalBudget must be positive")
    val domainStr = col(domainCol).cast("string")
    val threshold = mixtureThresholds(df, domainCol, weights, totalBudget)
      .foldLeft(lit(0L)) { case (acc, (d, t)) =>
        when(domainStr === d, lit(t)).otherwise(acc)
      }
    df.filter(hash32Of(keyCol) < threshold)
  }

  /** The frozen per-epoch threshold table behind [[rebalanceToMixture]],
    * exposed so a STREAM can apply the same mixture (compute thresholds
    * once per corpus epoch, broadcast the map to the firehose — the
    * frozen-model pattern DSIR uses): domain → keep iff
    * `hash32(key) < threshold`, `threshold = ⌊budget·w_d·2³²/(Σw·n_d)⌋`
    * in BigInt on the driver (exact — no overflow for any Long budget, no
    * basis-point grid to floor a small-but-positive rate to zero).
    *
    * Domains are compared as STRINGS on both sides: an int-coded domain
    * column would otherwise ClassCastException on getString; casting the
    * group key and the gate comparison identically keeps lookup
    * consistent. NULL domains are excluded from the counts — they can
    * never match a weight so they always drop, and folding them into a
    * real domain's count would deflate its keep-rate. Unweighted domains
    * always drop and never need counting: the isin filter bounds the
    * collect at |weights| rows regardless of the column's cardinality.
    * Empty weighted domains get no entry (nothing to keep). */
  def mixtureThresholds(df: DataFrame, domainCol: String,
      weights: Map[String, Int], totalBudget: Long): Map[String, Long] = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "weights must be non-negative with a positive sum")
    require(totalBudget > 0, "totalBudget must be positive")
    val wSum = BigInt(weights.values.sum)
    val domainStr = col(domainCol).cast("string")
    val counts = df.filter(domainStr.isin(weights.keys.toSeq: _*))
      .groupBy(domainStr.as("__d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.flatMap { case (d, w) =>
      counts.get(d).filter(_ > 0).map { n =>
        d -> (BigInt(totalBudget) * w * Two32 / (wSum * n)).min(Two32).toLong
      }
    }
  }

  /** Largest-remainder (Hamilton) apportionment of an integer sample
    * budget across domains: every domain gets `budget·n div N` slots, and
    * the `budget − Σbase` leftover slots go one each to the largest
    * remainders (ties break on domain name, so the allocation is total and
    * deterministic). By construction `Σalloc = budget` EXACTLY — the
    * property float-rounded quota columns can't give a downstream sampler.
    *
    * The rank window is unpartitioned but runs over one row per DOMAIN
    * (the mixture-label cardinality contract of [[rebalanceToMixture]]),
    * never over data rows; the corpus itself is scanned once for the
    * counts. */
  def largestRemainderAllocation(df: DataFrame, domainCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as(domainCol))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("__N"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"${budget}L * cnt div __N"))
      .withColumn("rem", expr(s"${budget}L * cnt % __N"))
    val leftover = based.agg((lit(budget) - sum("base")).as("__L"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rk",
        row_number().over(Window.orderBy(col("rem").desc, col(domainCol))))
      .select(col(domainCol), col("cnt"), col("base"), col("rem"),
        (col("base") + when(col("__rk") <= col("__L"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Temperature-scaled mixture shares (T = 2, i.e. p^(1/2)): the standard
    * multilingual/multi-domain rebalance that upsamples the tail without
    * letting the head dominate — unnormalized weight = √count, reported as
    * exact basis points against the √-weight total, next to the raw share.
    * `boost_bp > 0` marks domains the temperature favors over proportional
    * sampling. floor(sqrt) over a BIGINT count is engine-portable (IEEE
    * double sqrt is correctly rounded and counts ≪ 2⁵²), and all shares are
    * integer `div` — no float crosses the output boundary.
    *
    * Plan: one map-side-combined count per domain (the mixture-label
    * cardinality contract of [[rebalanceToMixture]] applies), one 1-row
    * total broadcast back — the corpus is scanned once, never shuffled. */
  def sqrtTemperatureShares(df: DataFrame, domainCol: String): DataFrame = {
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as(domainCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w_sqrt", expr("cast(floor(sqrt(cnt)) as bigint)"))
    val totals = counts.agg(sum("cnt").as("__tot"), sum("w_sqrt").as("__wtot"))
    counts.crossJoin(broadcast(totals))
      .select(col(domainCol), col("cnt"),
        expr("cnt * 10000 div __tot").as("share_bp"),
        col("w_sqrt"),
        expr("w_sqrt * 10000 div __wtot").as("temp_share_bp"),
        expr("w_sqrt * 10000 div __wtot - cnt * 10000 div __tot").as("boost_bp"))
  }

  /** Exact-count mixture MATERIALIZATION with upsampling — the missing half
    * of [[rebalanceToMixture]], which can only approach a mixture from
    * above (its scaladoc says so): here every domain hits its target count
    * EXACTLY, over- or under-represented. Domain d with n_d rows and
    * target t_d emits ⌊t_d/n_d⌋ full copies of every row (`copy_idx`
    * 0..copies−1 — the per-epoch repeat factor low-resource languages get
    * in multilingual pretraining mixes) plus the t_d mod n_d rows ranked
    * smallest by (hash32(key), key) at `copy_idx` = copies. Σ emitted ≡ t_d
    * BY CONSTRUCTION — the property expectation-based threshold sampling
    * cannot give a token-budgeted pipeline.
    *
    * The remainder selection is the rem_d smallest keys per domain under
    * the engine-portable md5 order, computed WITHOUT a domain-sized window
    * task: per-(domain, hash-prefix-bucket) counts (one aggregate, collect
    * bounded by |domains|·buckets — the mixture-label cardinality contract
    * of [[rebalanceToMixture]] applies), a driver walk picks each domain's
    * boundary bucket and quota, full buckets pass as a pure filter, and
    * only the boundary bucket (~1/buckets of one domain) ranks in a
    * window. Equivalent, by bucket monotonicity in the hash, to the
    * global per-domain rank ≤ rem — the form the oracle replays and the
    * spec pins.
    *
    * Targets for absent/empty domains are shortfalls, not errors — they
    * emit nothing; surface them by comparing targets to output counts.
    * `keyCol` must uniquely identify a row within its domain (ranking ties
    * between genuinely distinct rows would make the cut nondeterministic). */
  def materializeMixture(df: DataFrame, domainCol: String, keyCol: String,
      targets: Map[String, Long], buckets: Int = 1024): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0),
      "targets must be non-negative")
    require(buckets > 0 && (Two32 % buckets) == 0,
      s"buckets must divide 2^32, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val dStr = col(domainCol).cast("string")
    val widthL = (Two32 / buckets).toLong
    val bucketC = expr(
      s"cast(conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint) div $widthL")
    val counts = df.filter(dStr.isin(targets.keys.toSeq: _*))
      .groupBy(dStr.as("__d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plan = targets.flatMap { case (d, t) =>
      counts.get(d).filter(_ > 0).map(n => d -> (t / n, t % n))
    }
    val copiesLit = plan.foldLeft(lit(0L)) { case (acc, (d, (c, _))) =>
      when(dStr === d, lit(c)).otherwise(acc)
    }
    val withCopies = df.withColumn("__copies", copiesLit)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
    val remPlan = plan.filter(_._2._2 > 0)
    if (remPlan.isEmpty) withCopies
    else {
      val bCounts = df.filter(dStr.isin(remPlan.keys.toSeq: _*))
        .groupBy(dStr.as("__d"), bucketC.as("__b"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val cut: Map[String, (Long, Long)] = remPlan.map { case (d, (_, rem)) =>
        val bs = bCounts.filter(_._1 == d).sortBy(_._2)
        var cum = 0L
        var boundary = -1L
        var quota = 0L
        var i = 0
        while (i < bs.length && boundary < 0) {
          val (_, b, n) = bs(i)
          if (cum + n >= rem) { boundary = b; quota = rem - cum } else cum += n
          i += 1
        }
        d -> (boundary, quota)
      }
      val boundaryLit = cut.foldLeft(lit(Long.MinValue)) { case (acc, (d, (b, _))) =>
        when(dStr === d, lit(b)).otherwise(acc)
      }
      val quotaLit = cut.foldLeft(lit(0L)) { case (acc, (d, (_, q))) =>
        when(dStr === d, lit(q)).otherwise(acc)
      }
      val base = df.filter(dStr.isin(remPlan.keys.toSeq: _*))
        .withColumn("__b", bucketC)
      val fullBuckets = base.filter(col("__b") < boundaryLit)
      val w = Window.partitionBy(dStr, col("__b"))
        .orderBy(hash32Of(keyCol), col(keyCol))
      val boundaryRows = base.filter(col("__b") === boundaryLit)
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= quotaLit)
        .drop("__rk")
      val remainder = fullBuckets.unionByName(boundaryRows)
        .withColumn("copy_idx", copiesLit)
        .drop("__b")
      withCopies.unionByName(remainder)
    }
  }

  /** TOKEN-budgeted mixture cut — [[materializeMixture]]'s sibling in the
    * unit budgets are actually written in: per domain, keep the maximal
    * (hash32(key), key)-ordered PREFIX whose token sum stays ≤ target_d
    * ([[selectByTokenBudget]]'s no-backfill semantics, per domain; token
    * counts are non-negative, so "running sum ≤ target" IS the maximal
    * prefix). Deterministic on any engine/partitioning; under- and
    * over-shoot surface as utilization against the target, never as a
    * silently different sample.
    *
    * Same scale machinery as [[materializeMixture]]: per-(domain, bucket)
    * token sums (collect bounded by |domains|·buckets), a driver walk
    * finds each domain's boundary bucket and residual budget, full
    * buckets pass as a filter, and only the boundary bucket (~1/buckets
    * of one domain) pays a running-sum window. Bucket monotonicity in the
    * hash makes this provably ≡ the global per-domain prefix — the form
    * the oracle replays and the spec pins. */
  def tokenBudgetMixture(df: DataFrame, domainCol: String, keyCol: String,
      tokenCol: String, targets: Map[String, Long], buckets: Int = 1024): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0),
      "targets must be non-negative")
    require(buckets > 0 && (Two32 % buckets) == 0,
      s"buckets must divide 2^32, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val dStr = col(domainCol).cast("string")
    val widthL = (Two32 / buckets).toLong
    val bucketC = expr(
      s"cast(conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint) div $widthL")
    val base = df.filter(dStr.isin(targets.keys.toSeq: _*))
      .withColumn("__b", bucketC)
    val bStats = base.groupBy(dStr.as("__d"), col("__b"))
      .agg(sum(col(tokenCol).cast("long")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cut: Map[String, (Long, Long)] = targets.map { case (d, tgt) =>
      val bs = bStats.filter(_._1 == d).sortBy(_._2)
      var cum = 0L
      var boundary = Long.MaxValue // no boundary: the whole domain fits
      var local = 0L
      var i = 0
      while (i < bs.length && boundary == Long.MaxValue) {
        val (_, b, tk) = bs(i)
        if (cum + tk > tgt) { boundary = b; local = tgt - cum } else cum += tk
        i += 1
      }
      d -> (boundary, local)
    }
    val boundaryLit = cut.foldLeft(lit(Long.MinValue)) { case (acc, (d, (b, _))) =>
      when(dStr === d, lit(b)).otherwise(acc)
    }
    val localLit = cut.foldLeft(lit(0L)) { case (acc, (d, (_, q))) =>
      when(dStr === d, lit(q)).otherwise(acc)
    }
    val full = base.filter(col("__b") < boundaryLit)
    val w = Window.partitionBy(dStr, col("__b"))
      .orderBy(hash32Of(keyCol), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bnd = base.filter(col("__b") === boundaryLit)
      .withColumn("__ct", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("__ct") <= localLit)
      .drop("__ct")
    full.unionByName(bnd).drop("__b")
  }

  /** Deterministic per-epoch training-order shuffle: every key lands in a
    * shard and a position decided ONLY by `md5(seed:key)` — any engine,
    * any partitioning, any cluster size reproduces the identical order,
    * and changing the seed re-permutes globally (the per-epoch reshuffle
    * pretraining loaders need, without ever materializing a random
    * permutation driver-side).
    *
    * `shard` = hash mod `nShards`; `pos` = 1-based rank of the hash
    * within the shard (key as tie-break — total order even on hash
    * collisions). The sort is PER SHARD: at scale each shard's window
    * sorts its own hash-partition slice, so no global single-task sort
    * exists; readers consume shards independently in (shard, pos) order.
    * Shard sizes concentrate at n/nShards (multinomial, O(√) deviation) —
    * emit a size audit alongside if balance must be certified. */
  def epochShuffle(df: DataFrame, keyCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", epochHash(keyCol, seed))
      .withColumn("shard", col("__h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** The seeded per-epoch key hash shared by [[epochShuffle]] and
    * [[epochShuffleAudit]] — `md5(seed:key)`, first 8 hex as a bigint. */
  private def epochHash(keyCol: String, seed: Long): Column =
    expr(s"cast(conv(substring(md5(concat('$seed', ':', " +
      s"cast($keyCol as string))), 1, 8), 16, 10) as bigint)")

  /** The size audit [[epochShuffle]]'s scaladoc defers: per-shard key
    * counts with the balance deviation a loader-capacity plan needs.
    * `share_bp` = 10000·n_shard/(n/nShards) (integer: n_shard·nShards·10⁴
    * div n — positive-only division, so truncation is engine-identical),
    * `dev_bp` = share_bp − 10000 (subtraction AFTER the division — a
    * signed integer division would floor/truncate differently across
    * engines). Shards the hash never hit still get a row (share 0,
    * dev −10000) via the shard spine — an empty shard is precisely what
    * the audit exists to surface. One count aggregate over the corpus;
    * the spine join is nShards rows. */
  def epochShuffleAudit(df: DataFrame, keyCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    val counts = df
      .withColumn("shard", epochHash(keyCol, seed) % nShards)
      .groupBy("shard").agg(count(lit(1)).as("n_keys"))
    val tot = df.agg(count(lit(1)).as("__n"))
    // empty corpus: `div 0` is NULL in Spark, and downstream getLong on a
    // NULL share is an opaque NPE (r17 ADVICE) — emit the honest all-empty
    // audit instead: every spine shard at share 0, deviation -10000
    val share = s"case when __n = 0 then 0 else n_keys * $nShards * 10000 div __n end"
    spark.range(nShards).select(col("id").as("shard"))
      .join(counts, Seq("shard"), "left")
      .na.fill(0L, Seq("n_keys"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_keys"),
        expr(share).as("share_bp"),
        (expr(share) - 10000).as("dev_bp"))
  }

  /** Stratified k-fold assignment — cross-validation folds that preserve
    * label proportions EXACTLY, not in expectation. Within each stratum
    * rows are ordered by md5(key) (the engine-independent deterministic
    * shuffle every split in this suite uses) and dealt round-robin:
    * fold = (rank − 1) mod k, so per (stratum, fold) counts differ by at
    * most one BY CONSTRUCTION — unlike hash-mod-k assignment, whose
    * per-stratum imbalance is binomial (a rare stratum can land entirely
    * in one fold and zero a validation split).
    *
    * Deterministic: same keys → same folds on any engine, partitioning, or
    * cluster size. Scale shape: one window rank per stratum — strata order
    * independently in parallel; no global sort. For cluster-aware splits
    * (near-dup leakage) feed the CLUSTER fingerprint as `keyCol` — the
    * q250 lesson composes. */
  def stratifiedKFold(df: DataFrame, keyCol: String, labelCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(expr(s"md5(cast($keyCol as string))"), col(keyCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }
}
