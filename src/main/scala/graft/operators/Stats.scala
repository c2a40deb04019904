package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics for pipeline QA — the integer-exact
  * complements to the approximate profile sketches in DiffEngine.
  */
object Stats {

  /** Exact per-group discrete quantiles via rank arithmetic — no floats:
    * the `p`% quantile is the value at 1-based sorted position
    * `⌈n·p/100⌉ = (n·p + 99) div 100`, i.e. `percentile_disc` semantics
    * (the smallest value whose cumulative frequency reaches p%). Integer
    * positions on integer-ordered values make the result engine-exact,
    * unlike interpolating percentiles (float averaging on even counts) or
    * approximate sketches (engine-specific).
    *
    * Output: one row per (group, p) with the quantile value.
    *
    * Scale: one window sort per group — exact quantiles fundamentally
    * require rank information, so the sort is the cost of exactness. Groups
    * sort independently (parallel across groups); for quantiles over a
    * HUGE single group prefer the sketch profile (approx mode) and keep
    * this for per-stratum QA where groups are partition-sized. */
  def groupedQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      percents: Seq[Int]
  ): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in 1..100")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val pArr = array(percents.map(lit): _*)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol),
        row_number().over(w).as("__rn"),
        count(lit(1)).over(Window.partitionBy(col(groupCol))).as("__n"))
      .select(col(groupCol), col(valueCol), col("__rn"), col("__n"),
        explode(pArr).as("p"))
      .filter(col("__rn") === expr("(__n * p + 99) div 100"))
      .select(col(groupCol), col("p").cast("long").as("p"), col(valueCol))
  }

  /** Per-group ordinary-least-squares trend over integer (x, y) points —
    * the drift detector for rates ("is this source's hourly volume
    * rising?"), computed ENTIRELY in 64-bit integer arithmetic:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * emitted ×10^6 with integral division, so the result is bit-identical
    * cross-engine — the standard float OLS never hash-matches. Alongside
    * it, mean_y_x100 (the level the slope perturbs). Groups whose x has no
    * variance (denominator 0) are dropped — a slope there is undefined.
    *
    * Scale shape: ONE map-side-combined groupBy computing five sums; no
    * window, no sort, no second pass. Overflow headroom: callers must
    * normalize x to a small origin-relative range (e.g. hour − min hour);
    * with |x| ≤ 10⁴ and Σ|y| ≤ 10⁶ per group the ×10^6 numerator stays
    * under 2⁶³ with ~100× margin. */
  def groupedTrend(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_points"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
      .filter(expr("n_points * __sxx - __sx * __sx != 0"))
      .select(groupCols.map(col) ++ Seq(
        col("n_points"),
        expr("(n_points * __sxy - __sx * __sy) * 1000000 div (n_points * __sxx - __sx * __sx)")
          .as("slope_x1m"),
        expr("__sy * 100 div n_points").as("mean_y_x100")): _*)
  }

  /** Ordered-step funnel analysis: how many entities completed steps
    * 1..k IN ORDER (each step's first occurrence strictly after the
    * previous step's first occurrence). First-occurrence positions are
    * taken on `orderCol` — callers should pass a UNIQUE monotone column
    * (an event id) rather than a timestamp, so the comparison is
    * deterministic cross-engine (timestamps tie and carry precision
    * differences; ids don't).
    *
    * Output: one row per step (step_idx, step, n_entities), n_entities
    * non-increasing down the funnel.
    *
    * Scale shape: ONE groupBy(entity) computing a conditional min per
    * step, then one tiny k-row aggregate — no joins, no windows, the
    * event stream shuffles once on the entity key. */
  def funnel(df: DataFrame, entityCol: String, stepCol: String,
      orderCol: String, steps: Seq[String]): DataFrame =
    funnelCore(df, entityCol, stepCol, orderCol, steps, None)

  /** [[funnel]] with a conversion window: step k counts only when it also
    * happened within `maxGap` order units of step k−1 — "signed up, then
    * purchased WITHIN A WEEK", the form product funnels are actually
    * quoted in. Same first-occurrence semantics and single aggregate
    * pass; the bound composes into the per-entity completion predicate,
    * so the plan is unchanged. */
  def funnelWithin(df: DataFrame, entityCol: String, stepCol: String,
      orderCol: String, steps: Seq[String], maxGap: Long): DataFrame = {
    require(maxGap > 0, "maxGap must be positive")
    funnelCore(df, entityCol, stepCol, orderCol, steps, Some(maxGap))
  }

  private def funnelCore(df: DataFrame, entityCol: String, stepCol: String,
      orderCol: String, steps: Seq[String], maxGap: Option[Long]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, "steps must be distinct, non-empty")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(stepCol) === s, col(orderCol))).as(s"__m$i")
    }
    val perEntity = df.groupBy(col(entityCol)).agg(mins.head, mins.tail: _*)
    // completed(k) = m0 < m1 < ... < mk, all present (NULL comparisons
    // fail), each hop additionally within maxGap when bounded
    val completed = steps.indices.map { k =>
      val cond = (1 to k).foldLeft(col("__m0").isNotNull) { (acc, i) =>
        val hop = col(s"__m${i - 1}") < col(s"__m$i")
        acc && maxGap.fold(hop)(g =>
          hop && col(s"__m$i") - col(s"__m${i - 1}") <= g)
      }
      sum(when(cond, 1L).otherwise(0L)).as(s"__c$k")
    }
    val row = perEntity.agg(completed.head, completed.tail: _*)
    val stepStructs = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).cast("long").as("step_idx"), lit(s).as("step"),
        col(s"__c$i").as("n_entities"))
    }
    row.select(explode(array(stepStructs: _*)).as("f"))
      .select(col("f.step_idx"), col("f.step"), col("f.n_entities"))
  }

  /** Cohort retention: group entities by their FIRST active day (the
    * cohort), then for every later day offset k count how many of that
    * cohort were active again — the engagement-decay table every
    * product/ops dashboard draws, and for a corpus pipeline the "does a
    * source keep contributing?" signal. Integer day arithmetic only;
    * retained_pct_x100 is an integral div of exact counts.
    *
    * Scale shape: one distinct (entity, day) reduction, one groupBy(entity)
    * for cohort assignment, one join back keyed on the entity (both sides
    * hash-partition on it), then two tiny aggregates. Everything keys on
    * the entity or the (cohort, k) pair — no windows, no self-joins. */
  def retentionCohorts(df: DataFrame, entityCol: String, dayCol: String): DataFrame = {
    val days = df.select(col(entityCol).cast("long").as("__e"),
      col(dayCol).cast("long").as("__d")).distinct()
    val cohorts = days.groupBy(col("__e")).agg(min(col("__d")).as("cohort_day"))
    val active = days.join(cohorts, "__e")
      .select(col("cohort_day"), (col("__d") - col("cohort_day")).as("k"))
      .groupBy(col("cohort_day"), col("k")).agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    active.join(sizes, "cohort_day")
      .select(col("cohort_day"), col("k"), col("n_active"), col("cohort_size"),
        expr("n_active * 10000 div cohort_size").as("retained_pct_x100"))
  }

  /** CUSUM change-point detection over per-group ordered (x, y) series —
    * "when did this source's volume shift?" — in EXACT integer
    * arithmetic: the classic centered cumulative sum Sᵢ = Σ₁..ᵢ(yⱼ − ȳ)
    * is rational, so it is tracked scaled by n (devᵢ = n·cumᵢ − i·Σy,
    * an integer); the change-point is the position of max |dev|, ties
    * broken toward the earliest position. Output per group: n_points,
    * cp_x (the x at the change-point), max_abs_dev_xn (the deviation,
    * still ×n — callers comparing across groups divide by n·n or
    * compare the derived ratio).
    *
    * Scale shape: one groupBy for the series points, one per-group window
    * cumsum (groups sort independently in parallel), one ranked cut —
    * the same per-group-window posture as [[groupedQuantiles]]. */
  def changePoints(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__x"))
    val wAll = Window.partitionBy(col(groupCol))
    val scored = df
      .select(col(groupCol), col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__cum", sum(col("__y")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sy", sum(col("__y")).over(wAll))
      .withColumn("__dev", abs(col("__n") * col("__cum") - col("__i") * col("__sy")))
    scored
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__dev").desc, col("__i").asc)))
      .filter(col("__r") === 1)
      .select(col(groupCol), col("__n").cast("long").as("n_points"),
        col("__x").as("cp_x"), col("__dev").as("max_abs_dev_xn"))
  }

  /** Robust outlier census per group — median/MAD, the z-score's
    * heavy-tail-safe sibling (one wild value wrecks a mean+stddev gate;
    * the median and the median absolute deviation shrug it off): a value
    * is an outlier when |v − median| > (threshX10000/10^4)·MAD, default
    * 3·1.4826 (the normal-consistency constant). Both medians are
    * [[groupedQuantiles]]'s percentile_disc rank arithmetic and the
    * threshold test is a cross-multiplied integer comparison — exact
    * cross-engine, no float σ anywhere.
    *
    * Input values must be integers (scale currency to cents etc. BEFORE
    * calling — through DECIMAL, not a float multiply). Output per group:
    * (group, n_rows, median, mad, n_outliers).
    *
    * Scale shape: two per-group window sorts (median, then deviation
    * median) + one aggregate; groups sort independently, same posture as
    * [[groupedQuantiles]]. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshX10000: Long = 44478L): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val med = groupedQuantiles(base, groupCol, "__v", Seq(50))
      .select(col(groupCol), col("__v").as("__med"))
    val dev = base.join(med, groupCol)
      .select(col(groupCol), col("__v"), col("__med"),
        abs(col("__v") - col("__med")).as("__dev"))
    val mad = groupedQuantiles(dev.select(col(groupCol), col("__dev")), groupCol, "__dev", Seq(50))
      .select(col(groupCol), col("__dev").as("__mad"))
    dev.join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("__med")).as("median"),
        max(col("__mad")).as("mad"),
        sum(when(col("__dev") * 10000 > lit(threshX10000) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** First-order Markov transition matrix over per-entity ordered state
    * sequences — "after a click, what comes next?": adjacent-state pairs
    * on the `orderCol` ordering (pass a UNIQUE monotone id, same contract
    * as [[funnel]]), counted and row-normalized to ×10^6 integral
    * probabilities. The behavioral-model complement of [[funnel]]'s
    * fixed-path view.
    *
    * Scale shape: one window lag per entity partition (hash shuffle +
    * in-partition sort), then two map-side-combined aggregates; the
    * transition matrix is |states|² — driver-safe for any real state
    * alphabet. Output: (from_state, to_state, n, p_x1m). */
  def markovTransitions(df: DataFrame, entityCol: String, stateCol: String,
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
    val pairs = df
      .select(col(entityCol), col(stateCol).as("to_state"), col(orderCol))
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state")).agg(count(lit(1)).as("n"))
    val rowTotals = pairs.groupBy(col("from_state")).agg(sum(col("n")).as("__tot"))
    pairs.join(rowTotals, "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000 div __tot").as("p_x1m"))
  }

  /** Chapman–Kolmogorov Markovianity certificate: is one step of memory
    * enough? If the state sequence is first-order Markov, the two-step
    * transition matrix must equal the one-step matrix squared — so the
    * certificate computes BOTH sides empirically and reports the gap:
    *
    *   model:     P²(i,k) = Σ_j P(i,j)·P(j,k)   (lag-1 estimates)
    *   empirical: P̂₂(i,k) from direct lag-2 counts
    *
    * in ×10⁶ fixed point (the [[markovTransitions]] convention): the
    * matrix product sums p·p products (≤ 10¹²·|states| — long-safe) and
    * divides by 10⁶ once at the end; both engines truncate identically.
    * A large diff on some (i,k) is evidence the chain remembers more than
    * one step — the modeling-assumption audit next to the ACF's linear
    * memory lens.
    *
    * One keyed window supplies both lags; the matrix product is a
    * |states|²-sized self-join — states are categorical (handfuls), so
    * the join is a broadcast triviality at any corpus size. */
  def markovChapmanKolmogorov(df: DataFrame, entityCol: String,
      stateCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val base = df
      .select(col(entityCol) +: col(stateCol).as("s0") +: orderCols.map(col): _*)
      .withColumn("s1", lead(col("s0"), 1).over(w))
      .withColumn("s2", lead(col("s0"), 2).over(w))
      .localCheckpoint()
    def probs(toCol: String): DataFrame = {
      val pairs = base.filter(col(toCol).isNotNull)
        .groupBy(col("s0").as("from_state"), col(toCol).as("to_state"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy("from_state").agg(sum("n").as("__tot"))
      pairs.join(tot, "from_state")
        .select(col("from_state"), col("to_state"),
          expr("n * 1000000 div __tot").as("p_fp"))
    }
    val p1 = probs("s1").localCheckpoint()
    val model = p1.select(col("from_state").as("i"), col("to_state").as("j"),
        col("p_fp").as("pij"))
      .join(p1.select(col("from_state").as("j"), col("to_state").as("k"),
        col("p_fp").as("pjk")), Seq("j"))
      .groupBy(col("i").as("from_state"), col("k").as("to_state"))
      .agg(expr("CAST(sum(pij * pjk) div 1000000 AS BIGINT)").as("p2_model_fp"))
    val emp = probs("s2")
      .select(col("from_state"), col("to_state"), col("p_fp").as("p2_emp_fp"))
    model.join(emp, Seq("from_state", "to_state"), "full_outer")
      .select(col("from_state"), col("to_state"),
        coalesce(col("p2_model_fp"), lit(0L)).as("p2_model_fp"),
        coalesce(col("p2_emp_fp"), lit(0L)).as("p2_emp_fp"))
      .withColumn("diff_fp", col("p2_model_fp") - col("p2_emp_fp"))
  }

  /** Peak concurrency per group via the classic sweep line: each interval
    * `[start, end)` contributes a +1 event at `start` and a -1 event at
    * `end`; the running sum of events in time order is the number of
    * intervals open at that instant, and its maximum is the peak. Ties at
    * the same instant process ends BEFORE starts (delta ascending), the
    * half-open-interval convention — an interval ending exactly when
    * another starts never counts as overlap. Zero/negative-length
    * intervals are dropped (they are empty under [s, e)).
    *
    * Output one row per group: (group, n_intervals, max_concurrent,
    * peak_at) with `peak_at` the EARLIEST instant the peak is reached —
    * a deterministic representative.
    *
    * Plan: one explode (2 rows per interval) + one per-group window
    * (hash shuffle + in-partition sort) + one aggregate — no joins, no
    * driver state. Groups sweep independently and in parallel; for a
    * sweep over ONE huge ungrouped timeline the in-partition sort
    * serializes per group, so split by a coarse time bucket and stitch
    * boundary sums with a [[graft.operators.Packing]]-style two-level
    * prefix sum instead. */
  def maxConcurrency(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val iv = df
      .select(col(groupCol).as("g"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull && col("s") < col("e"))
    val events = iv.select(col("g"),
      explode(array(
        struct(col("s").as("t"), lit(1L).as("delta")),
        struct(col("e").as("t"), lit(-1L).as("delta")))).as("ev"))
      .select(col("g"), col("ev.t"), col("ev.delta"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The per-group max re-uses the sweep's partitioning: both windows hash
    // on g, so the second adds no exchange — one shuffle total.
    val swept = events
      .withColumn("running", sum(col("delta")).over(w))
      .withColumn("__gmax", max(col("running")).over(Window.partitionBy(col("g"))))
    swept.groupBy(col("g"))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("running")).as("max_concurrent"),
        min(when(col("running") === col("__gmax"), col("t"))).as("peak_at"))
      .withColumnRenamed("g", groupCol)
  }

  /** Union length of (possibly overlapping) half-open integer intervals per
    * group — "how much time was actually covered" where [[maxConcurrency]]
    * answers "how deep did coverage stack". The sweep is the classic
    * merge-islands scan expressed as per-group windows: an interval starts a
    * new island iff its start exceeds the running max end of every earlier
    * interval in the group; islands then reduce to `max(e) - min(s)` each.
    * Touching intervals ([1,3)+[3,5)) merge — zero gap is still covered.
    *
    * Scale: both windows and the final aggregate hash-partition on the
    * group column — one exchange total, no per-group data ever collects.
    * Ordering ties on (s, e) don't affect island assignment (a tie's
    * running max can only differ by intervals with the same start, whose
    * ends cannot precede it), so the output is deterministic. */
  def coveredLength(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val iv = df
      .select(col(groupCol).as("g"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull && col("s") < col("e"))
    val wPrev = Window.partitionBy(col("g")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("g")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islanded = iv
      .withColumn("__pm", max(col("e")).over(wPrev))
      .withColumn("__new",
        when(col("__pm").isNull || col("s") > col("__pm"), 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wRun))
    islanded
      .groupBy(col("g"), col("__isl"))
      .agg(count(lit(1)).as("__n"), min(col("s")).as("__is"), max(col("e")).as("__ie"))
      .groupBy(col("g"))
      .agg(
        sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"),
        (max(col("__ie")) - min(col("__is"))).as("span"))
      .withColumn("coverage_bp", expr("covered * 10000 div span"))
      .withColumnRenamed("g", groupCol)
  }

  /** Per-group covariance/correlation SUFFICIENT STATISTICS, exactly: n,
    * Σx, Σy, Σx², Σy², Σxy over integer-scaled inputs, plus the integer
    * numerators `n·Σxy − Σx·Σy` (covariance ×n²) and `n·Σx² − (Σx)²`
    * per axis (variance ×n²). Correlation itself needs a square root —
    * irreducibly float — so the CERTIFICATE stops at the exact integer
    * numerators (corr² = cov²/(varx·vary) is derivable by any consumer);
    * this is the same exact-integer-core / float-at-the-edge split as
    * the sketch certificates.
    *
    * All accumulation is DECIMAL(38,0): Σy² on cent-scaled prices
    * overflows a 64-bit long at ~10⁵ rows per group, long before 100 TB.
    * Plan: ONE map-side-combined aggregate pass, no joins, no windows. */
  def covarianceStats(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * x).as("sum_xx"), sum(y * y).as("sum_yy"),
        sum(x * y).as("sum_xy"))
      .withColumn("cov_num_xnn",
        col("n").cast("decimal(38,0)") * col("sum_xy") - col("sum_x") * col("sum_y"))
      .withColumn("var_x_xnn",
        col("n").cast("decimal(38,0)") * col("sum_xx") - col("sum_x") * col("sum_x"))
      .withColumn("var_y_xnn",
        col("n").cast("decimal(38,0)") * col("sum_yy") - col("sum_y") * col("sum_y"))
  }

  /** Two-proportion A/B test as an EXACT RATIONAL certificate — no square
    * root, no division, no float ever: the pooled two-proportion z² is
    *
    *   z² = (x_a·n_b − x_b·n_a)² · (n_a+n_b)
    *        ─────────────────────────────────────────
    *        n_a·n_b · (x_a+x_b) · (n_a+n_b−x_a−x_b)
    *
    * so significance at 95% is the INTEGER comparison
    * `num·10⁴ ≥ den·38415` (z²_crit = 3.8415) — bit-identical on any
    * engine with wide-integer arithmetic. DECIMAL(38,0) throughout: the
    * numerator passes 10¹⁸ around 10⁵ exposures per arm. A degenerate
    * denominator (all successes or all failures pooled) reports
    * not-significant.
    *
    * Input: one row per exposure with a variant label and a 0/1 success.
    * ONE conditional-aggregate pass over the exposures — no shuffle wider
    * than a single combine row. Output one row:
    * (n_a, x_a, n_b, x_b, z2_num, z2_den, significant_95). */
  def abTestStats(df: DataFrame, variantCol: String, successCol: String,
      variantA: String, variantB: String): DataFrame = {
    val isA = col(variantCol) === variantA
    val isB = col(variantCol) === variantB
    def d(c: String) = col(c).cast("decimal(38,0)")
    df.agg(
        coalesce(sum(when(isA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
        coalesce(sum(when(isA, col(successCol)).otherwise(0L)), lit(0L)).as("x_a"),
        coalesce(sum(when(isB, 1L).otherwise(0L)), lit(0L)).as("n_b"),
        coalesce(sum(when(isB, col(successCol)).otherwise(0L)), lit(0L)).as("x_b"))
      .withColumn("__d", d("x_a") * d("n_b") - d("x_b") * d("n_a"))
      .withColumn("z2_num", col("__d") * col("__d") * (d("n_a") + d("n_b")))
      .withColumn("z2_den",
        d("n_a") * d("n_b") * (d("x_a") + d("x_b")) * (d("n_a") + d("n_b") - d("x_a") - d("x_b")))
      .withColumn("significant_95",
        when(col("z2_den") > 0 && col("z2_num") * 10000 >= col("z2_den") * 38415, 1L)
          .otherwise(0L))
      .drop("__d")
  }

  /** Per-entity inter-arrival (gap) statistics — the burstiness census bot
    * detection and rate-limit tuning read: a crawler hammering a host has
    * tiny, regular gaps; a human has large, high-variance ones. One lag
    * window per entity (single hash shuffle, rows stream through), then
    * the exact integer moment pass: variance is kept as the
    * cross-multiplied numerator `n·Σg² − (Σg)²` in DECIMAL(38,0) — no
    * division, no floats, engine-exact (the [[covarianceStats]]
    * certificate algebra on one variable). Entities with fewer than
    * `minEvents` arrivals carry no gap signal and are dropped. Output:
    * (entity, n_gaps, sum_gap, max_gap, var_num). */
  def interArrivalStats(df: DataFrame, entityCol: String, timeCol: String,
      minEvents: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("entity")).orderBy(col("__t"))
    def d(c: Column) = c.cast("decimal(38,0)")
    df.select(col(entityCol).as("entity"), col(timeCol).cast("long").as("__t"))
      .withColumn("__gap", col("__t") - lag("__t", 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy("entity")
      .agg(count(lit(1)).as("n_gaps"), sum("__gap").as("sum_gap"),
        max("__gap").as("max_gap"),
        (count(lit(1)).cast("decimal(38,0)") * sum(d(col("__gap")) * d(col("__gap"))) -
          d(sum("__gap")) * d(sum("__gap"))).as("var_num"))
      .filter(col("n_gaps") >= minEvents - 1)
  }

  /** Exact per-group weighted median: the smallest value whose cumulative
    * weight reaches half the group total — `2·cumw ≥ W` kept as an integer
    * cross-multiplication (no halving, no floats). The robust center for
    * weighted corpora (doc quality weighted by token count, latency
    * weighted by request volume) where the plain median over-counts
    * featherweight rows. One window sort per group, like
    * [[groupedQuantiles]] — rank information is the cost of exactness;
    * groups parallelize. Output: (group, total_weight, wmedian). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("long").as("__v"), col(weightCol).cast("long").as("__w"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    base
      // range frame: equal values share one cumulative weight, so ties
      // can't make the qualifying set depend on an arbitrary row order
      .withColumn("__cum", sum("__w").over(wCum))
      .withColumn("__tot", sum("__w").over(wAll))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy("grp")
      .agg(max("__tot").as("total_weight"), min("__v").as("wmedian"))
  }

  /** Seasonal-slot residual census: per slot (hour-of-day, weekday …) the
    * exact count/sum plus how many rows sit farther than `threshold` from
    * their OWN slot's mean — |v·n − Σ| > θ·n cross-multiplied, so the mean
    * is never materialized as a float. The calendar-aware anomaly screen
    * that a flat [[madOutliers]] cut gets wrong (3 a.m. traffic isn't an
    * outlier at 3 a.m.). One aggregate pass + a broadcast-sized slot-stats
    * join back (|slots| rows). Output per slot:
    * (slot, n, sum_value, n_outliers). */
  def slotResidualOutliers(df: DataFrame, slotCol: String, valueCol: String,
      threshold: Long): DataFrame = {
    require(threshold >= 0, "threshold is an absolute value-units bound")
    def d(c: Column) = c.cast("decimal(38,0)")
    val rows = df.select(col(slotCol).cast("long").as("slot"),
      col(valueCol).cast("long").as("__v"))
    val slots = rows.groupBy("slot")
      .agg(count(lit(1)).as("n"), sum("__v").as("sum_value"))
    rows.join(broadcast(slots), "slot")
      .groupBy("slot")
      .agg(max("n").as("n"), max("sum_value").as("sum_value"),
        sum(when(
          abs(d(col("__v")) * d(col("n")) - d(col("sum_value"))) >
            d(lit(threshold)) * d(col("n")), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Exact global percentile thresholds of one integer column, collected to
    * the driver (|percents| longs) — [[groupedQuantiles]]'s rank arithmetic
    * on a single group. The sort is global (exactness requires rank); at
    * corpus scale use [[approxThresholds]] — the use case (curriculum /
    * quality-tier boundaries) tolerates sketch error, and the assignment
    * step is identical either way. */
  def exactThresholds(df: DataFrame, valueCol: String, percents: Seq[Int]): Seq[Long] = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in 1..100")
    val ranked = groupedQuantiles(
      df.select(col(valueCol)).withColumn("__g", lit(1)), "__g", valueCol, percents)
      .collect().map(r => r.getLong(1) -> r.getAs[Number](2).longValue()).toMap
    percents.map(p => ranked(p.toLong))
  }

  /** Sketch-based global thresholds (`percentile_approx`, a mergeable
    * bounded-memory quantile summary): rank error ≤ n/accuracy, no global
    * sort — the 100 TB path for [[bucketByThresholds]] boundaries. */
  def approxThresholds(
      df: DataFrame, valueCol: String, percents: Seq[Int], accuracy: Int = 10000): Seq[Long] = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in 1..100")
    val arr = percents.map(p => p / 100.0).mkString("array(", ", ", ")")
    df.select(expr(s"percentile_approx($valueCol, $arr, $accuracy)"))
      .head().getSeq[Number](0).map(_.longValue()).toSeq
  }

  /** Assign each row its quality/curriculum tier from ascending score
    * thresholds: `bucket = 1 + |{t : score > t}|` (threshold t_i is the
    * UPPER bound of bucket i, matching percentile_disc boundaries). A pure
    * when-sum map stage — no global sort, no shuffle; thresholds come from
    * [[exactThresholds]] (oracle-exact) or [[approxThresholds]] (scale). */
  /** Time-weighted mean (TWAP) per key: each observation holds its value
    * until the next one, so the mean weights each value by its holding
    * duration — Σ(vᵢ·gapᵢ) div Σ(gapᵢ) over consecutive-event gaps, the
    * canonical time-series aggregate an evenly-spaced AVG silently gets
    * wrong on irregular sampling. The product sum rides DECIMAL(38,0)
    * (a long value × a multi-day micros gap overflows int64; Spark's
    * long sum wraps SILENTLY — the decimal is the correctness, not
    * pedantry), final division back to BIGINT. Keys with a single
    * observation (no gap) drop out. One keyed window + one keyed
    * aggregate — two linear shuffles, no global sort. Ties on the
    * timestamp order by `tieCol` so both engines weight the same event. */
  def timeWeightedMean(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__tie"))
    df.select(col(keyCol), col(tsCol).cast("long").as("__ts"),
        col(valCol).cast("long").as("__v"), col(tieCol).as("__tie"))
      .withColumn("__gap", lead(col("__ts"), 1).over(w) - col("__ts"))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap")).as("span_us"),
        sum(col("__gap").cast("decimal(38,0)") * col("__v")).as("__wsum"))
      .filter(col("span_us") > 0)
      .select(col(keyCol), col("n_gaps"), col("span_us"),
        expr("CAST(__wsum div span_us AS BIGINT)").as("twap"))
  }

  /** Regularize an irregular time series onto a fixed grid with
    * forward-fill — the resample step upstream of any drift/trend monitor
    * that assumes evenly spaced observations (q149's slopes, q160's CUSUM
    * both do). Three stages, all keyed — no global sort at any scale:
    *
    *   1. per (key, bucket) the LAST observation (latest `tsUsCol`, ties
    *      broken by `tieCol` so both engines pick the same row) and the
    *      observation count;
    *   2. per key the dense bucket grid min..max (`sequence` + explode —
    *      grid size is span/step per key, bounded by the caller's step
    *      choice, never corpus-sized);
    *   3. a running `last(ignoreNulls)` window per key carries the most
    *      recent value across empty buckets. The first grid bucket always
    *      holds an observation (the grid starts AT the key's first event),
    *      so no leading-null branch exists.
    *
    * Output: (key, bucket, bucket_start_us, valueCol forward-filled,
    * n_obs with 0 marking filled rows). */
  def resampleFfill(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, stepUs: Long, tieCol: String): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val b = df.withColumn("__bucket", expr(s"$tsUsCol div $stepUs"))
    val wLast = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsUsCol).desc, col(tieCol).desc)
    val lastIn = b.withColumn("__rn", row_number().over(wLast))
      .withColumn("__n_obs",
        count(lit(1)).over(Window.partitionBy(col(keyCol), col("__bucket"))))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__bucket"), col(valueCol).as("__v"), col("__n_obs"))
    val grid = b.groupBy(keyCol)
      .agg(min("__bucket").as("__mn"), max("__bucket").as("__mx"))
      .select(col(keyCol), explode(expr("sequence(__mn, __mx)")).as("__bucket"))
    val wFill = Window.partitionBy(keyCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastIn, Seq(keyCol, "__bucket"), "left")
      .select(col(keyCol), col("__bucket").as("bucket"),
        (col("__bucket") * stepUs).as("bucket_start_us"),
        last(col("__v"), ignoreNulls = true).over(wFill).as(valueCol),
        coalesce(col("__n_obs"), lit(0L)).cast("long").as("n_obs"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group — the THIRD drift
    * lens next to total-variation (q71/q133, categorical) and
    * Wasserstein-1 (q239, magnitude-sensitive): KS is the sup-norm of the
    * ECDF gap, the classic "did the distribution shift ANYWHERE" test
    * that TV under-weights on ordered domains and W1 dilutes when a
    * narrow band shifts hard. Cross-multiplied integer form — for value
    * x, the scaled gap is |cumA(x)·nB − cumB(x)·nA| and
    * KS = max(gap)/(nA·nB) — so no engine-specific float division
    * touches the comparison; products ride DECIMAL(38,0) (two ~10⁹-row
    * sides already overflow int64) and the report surfaces basis points.
    *
    * Per-group windows ordered by value — keyed shuffles only, no global
    * sort. `sideCol` = 0 is side A, anything else side B. */
  def ksDrift(df: DataFrame, groupCol: String, sideCol: String,
      valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val g = df.groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(sideCol) =!= 0, 1L).otherwise(0L)).as("__cb"))
    val w = Window.partitionBy(groupCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCol)
    g.withColumn("__cumA", sum("__ca").over(w))
      .withColumn("__cumB", sum("__cb").over(w))
      .withColumn("__nA", sum("__ca").over(tot))
      .withColumn("__nB", sum("__cb").over(tot))
      .groupBy(col(groupCol))
      .agg(max("__nA").as("n_a"), max("__nB").as("n_b"),
        max(abs(d(col("__cumA")) * d(col("__nB")) -
          d(col("__cumB")) * d(col("__nA")))).as("__ks"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("__ks").cast("long").as("ks_num"),
        expr("CAST((__ks * 10000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("ks_bp"))
  }

  def bucketByThresholds(df: DataFrame, scoreCol: String, thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      "thresholds must be non-empty ascending")
    val over = thresholds.map(t => when(col(scoreCol) > t, 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("bucket", (lit(1) + over).cast("int"))
  }

  /** Grouped TWO-feature least squares — the multiple-regression step up
    * from [[groupedTrend]]'s single slope, in the same exact integer
    * algebra. Solving the centered normal equations by Cramer's rule needs
    * only the nine power sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y,
    * Σx₂y), so the whole fit is ONE aggregate pass — no feature matrix is
    * ever materialized and no iteration runs. With the n-scaled central
    * moments S_ab = n·Σab − Σa·Σb:
    *
    *   β₁ = (S₂₂·S₁y − S₁₂·S₂y) / det,   β₂ = (S₁₁·S₂y − S₁₂·S₁y) / det,
    *   det = S₁₁·S₂₂ − S₁₂²,             α  = (Σy − β₁Σx₁ − β₂Σx₂) / n
    *
    * All products ride DECIMAL(38,0): inputs must be pre-quantized to
    * integers (the suite-wide cents/basis-point discipline). Headroom
    * audit for the shipped q272 shape (n ≤ 3·10⁵ rows/group, |x₁| ≤ 50,
    * |x₂| ≤ 10, |y| ≤ 1.1·10⁷ cents): numerators ≤ ~5·10³², ×scale(10³)
    * ≤ 5·10³⁵ < 10³⁸. Numerators grow ~n³, so the cents quantization holds
    * to n ≈ 10⁶ per group; beyond that quantize y one decade coarser per
    * decade of n (dollars buy n ≈ 10⁷) — overflow is loud, not silent:
    * Spark nulls the cast and the certificate hash breaks. Both engines
    * truncate integer division toward zero, so the fixed-point render is
    * engine-exact including negative slopes.
    *
    * Collinear groups (det = 0) surface as NULL coefficients rather than a
    * throw — degenerate strata are data, not errors. Output per group:
    * n, b1/b2 at ×scale fixed point, intercept at ×scale (derived from the
    * already-truncated b1/b2 so both engines agree bit-for-bit). */
  def ols2(df: DataFrame, groupCol: String, x1Col: String, x2Col: String,
      yCol: String, scale: Int = 1000): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val agg0 = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("long").as("n"),
      sum(d(col(x1Col))).as("sx1"), sum(d(col(x2Col))).as("sx2"),
      sum(d(col(yCol))).as("sy"),
      sum(d(col(x1Col)) * d(col(x1Col))).as("sx1x1"),
      sum(d(col(x2Col)) * d(col(x2Col))).as("sx2x2"),
      sum(d(col(x1Col)) * d(col(x2Col))).as("sx1x2"),
      sum(d(col(x1Col)) * d(col(yCol))).as("sx1y"),
      sum(d(col(x2Col)) * d(col(yCol))).as("sx2y"))
    val nn = d(col("n"))
    val s11 = nn * col("sx1x1") - col("sx1") * col("sx1")
    val s22 = nn * col("sx2x2") - col("sx2") * col("sx2")
    val s12 = nn * col("sx1x2") - col("sx1") * col("sx2")
    val s1y = nn * col("sx1y") - col("sx1") * col("sy")
    val s2y = nn * col("sx2y") - col("sx2") * col("sy")
    agg0
      .withColumn("__det", s11 * s22 - s12 * s12)
      .withColumn("__n1", s22 * s1y - s12 * s2y)
      .withColumn("__n2", s11 * s2y - s12 * s1y)
      .select(col(groupCol), col("n"),
        when(col("__det") =!= 0,
          expr(s"CAST((__n1 * $scale) div __det AS BIGINT)")).as("b1_fp"),
        when(col("__det") =!= 0,
          expr(s"CAST((__n2 * $scale) div __det AS BIGINT)")).as("b2_fp"),
        when(col("__det") =!= 0,
          expr(s"CAST((sy * $scale - CAST((__n1 * $scale) div __det AS DECIMAL(38,0)) * sx1" +
            s" - CAST((__n2 * $scale) div __det AS DECIMAL(38,0)) * sx2) div CAST(n AS DECIMAL(38,0)) AS BIGINT)"))
          .as("a_fp"))
  }

  /** Sample autocorrelation at lags 1..`maxLag` in exact integer algebra —
    * the self-similarity diagnostic next to [[interArrivalStats]]
    * (burstiness) and [[groupedTrend]] (drift): does a series remember
    * itself one step back, two, three? Expanding the mean-centered products
    * algebraically removes the two-pass mean:
    *
    *   c_k = n²·Σx_t·x_{t+k} − n·S·(Σ_head + Σ_tail) + cnt_k·S²
    *   c_0 = n²·Σx² − n·S²,        acf_k = c_k / c_0   (rendered ×10⁴)
    *
    * where S = Σx and Σ_head/Σ_tail are the lag-clipped partial sums — so
    * ONE keyed window (the `lead`s) plus ONE aggregate computes every lag,
    * values pre-quantized to integers and products on DECIMAL(38,0).
    * Truncation-toward-zero division on both engines; negative
    * autocorrelation renders exactly.
    *
    * Scale: the window sorts per group (parallel across groups); headroom
    * n²·Σx² ≤ 10³⁸ holds to n ≈ 10⁷ rows/group at cents magnitudes. */
  def acf(df: DataFrame, groupCol: String, orderCols: Seq[String],
      valueCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12, "maxLag out of range")
    def d(c: Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols.map(col): _*)
    val withLeads = (1 to maxLag).foldLeft(
      df.select((groupCol +: valueCol +: orderCols).distinct.map(col): _*)) {
      (acc, k) => acc.withColumn(s"__lead$k", lead(col(valueCol), k).over(w))
    }
    val aggs = Seq(
      count(lit(1)).cast("long").as("n"),
      sum(d(col(valueCol))).as("s"),
      sum(d(col(valueCol)) * d(col(valueCol))).as("sxx")) ++
      (1 to maxLag).flatMap { k =>
        val lk = col(s"__lead$k")
        Seq(
          sum(when(lk.isNotNull, d(col(valueCol)) * d(lk)).otherwise(lit(0))).as(s"sxy$k"),
          sum(when(lk.isNotNull, d(col(valueCol))).otherwise(lit(0))).as(s"sh$k"),
          sum(when(lk.isNotNull, d(lk)).otherwise(lit(0))).as(s"st$k"),
          sum(when(lk.isNotNull, 1L).otherwise(0L)).as(s"cnt$k"))
      }
    val g = withLeads.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .withColumn("__c0", expr("CAST(n AS DECIMAL(38,0)) * n * sxx - CAST(n AS DECIMAL(38,0)) * s * s"))
    (1 to maxLag).map { k =>
      g.select(col(groupCol), lit(k).as("lag"), col("n"),
        when(col("__c0") > 0, expr(
          s"CAST(((CAST(n AS DECIMAL(38,0)) * n * sxy$k" +
            s" - CAST(n AS DECIMAL(38,0)) * s * (sh$k + st$k)" +
            s" + CAST(cnt$k AS DECIMAL(38,0)) * s * s) * 10000) div __c0 AS BIGINT)"))
          .as("acf_fp"))
    }.reduce(_ unionByName _)
  }

  /** Exact trimmed mean — the outlier-robust location estimate between the
    * plain mean (breaks on one wild value) and the median (throws away all
    * magnitude information): drop the bottom and top `trimPct`% BY RANK
    * (floor(n·pct/100) rows each side, tie-broken on `tieCol` so both
    * engines cut the identical rows) and average the rest at ×`scale`
    * fixed point. One keyed window rank + one aggregate; integer division
    * truncates identically cross-engine. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, trimPct: Int, scale: Int = 1000): DataFrame = {
    require(trimPct >= 1 && trimPct < 50, "trimPct in 1..49")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val n = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__cut", expr(s"CAST(__n * $trimPct div 100 AS INT)"))
      .filter(col("__rn") > col("__cut") && col("__rn") <= col("__n") - col("__cut"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        expr(s"CAST(sum(CAST($valueCol AS DECIMAL(38,0))) * $scale div count(*) AS BIGINT)")
          .as("trimmed_mean_fp"))
  }

  /** Per-group rank normalization to basis points — the distribution-free
    * feature transform (the rank half of rank-gauss): value →
    * floor((rank−1)·10⁴/(n−1)) ∈ [0, 10000], tie-broken on `tieCol` so
    * the mapping is a bijection both engines agree on. Constant groups
    * (n = 1) map to 0. One keyed window; no global sort. */
  def rankNormalize(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val n = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("rank_bp",
        when(col("__n") > 1,
          expr("CAST((__rn - 1) * 10000 div (__n - 1) AS BIGINT)"))
          .otherwise(lit(0L)))
      .drop("__rn", "__n")
  }

  /** Truncated-EWMA anomaly flags in exact integer algebra — the
    * exponentially-weighted complement to [[madOutliers]] (global robust
    * scale) and [[slotResidualOutliers]] (calendar baseline): here the
    * baseline is each key's OWN recent level, so a user whose spend drifts
    * up slowly never alarms while a sudden jump does.
    *
    * α = 1/2 EWMA truncated to the last `window` observations: weights
    * 2^(w−1) … 2^0 over the trailing frame (newest heaviest), denominator
    * 2^w − 1. Everything stays scaled by the denominator — the flag
    * compares |x·(2^w−1) − Σ 2^i·x_i| > threshold·(2^w−1), so no division
    * happens before the comparison and both engines agree bit-for-bit.
    * The weighted terms, their sum, and both comparison sides run in
    * DECIMAL(38,0): for ANY Long-valued x and window ≤ 62 the largest
    * intermediate is < 2^63·2^62 ≈ 4.3e37 < 10^38, so the algebra is
    * exact with no silent Long wraparound (plain LONG would wrap for
    * window ≳ 48 at cent-scale magnitudes), and a hypothetical
    * out-of-contract overflow fails loudly under ANSI decimal discipline
    * instead of producing wrong flags.
    * Truncation error vs the infinite EWMA is ≤ max|x|/2^w — below one
    * cent for w=16 at any realistic magnitude, and the bounded frame is
    * what makes the operator a WINDOW (one keyed sort, O(w) per row via
    * the in-frame fold) instead of an unbounded running state.
    *
    * Rows need ≥ `window` predecessors to be judged (cold keys are
    * baseline-less, not anomalous). Returns only flagged rows with the
    * scaled-down EWMA and deviation for the report. */
  def ewmaAnomalies(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, window: Int = 16, threshold: Long = 20000L): DataFrame = {
    require(window >= 2 && window <= 62, "window must be in 2..62")
    val den = (1L << window) - 1
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, -1)
    df.withColumn("__hist", collect_list(col(valueCol)).over(w))
      .filter(size(col("__hist")) === window)
      .withColumn("__wsum",
        expr("aggregate(transform(__hist, (v, i) -> " +
          "CAST(v AS DECIMAL(38,0)) * CAST(shiftleft(1L, i) AS DECIMAL(38,0))), " +
          "CAST(0 AS DECIMAL(38,0)), (a, x) -> CAST(a + x AS DECIMAL(38,0)))"))
      .withColumn("__dev",
        col(valueCol).cast("decimal(38,0)") * den - col("__wsum"))
      .filter(abs(col("__dev")) > lit(threshold).cast("decimal(38,0)") * den)
      .select(col(keyCol) +: orderCols.map(col) :+ col(valueCol) :+
        expr(s"CAST(__wsum div $den AS BIGINT)").as("ewma") :+
        expr(s"CAST(__dev div $den AS BIGINT)").as("deviation"): _*)
  }

  /** Kendall's τ-a between two integer-leveled scores — the rank-
    * correlation certificate for "do two quality signals agree in
    * ORDERING" (a cheap proxy score vs an expensive gate): τ-a =
    * (concordant − discordant) / (N(N−1)/2) over all document pairs,
    * which — unlike Spearman or τ-b — needs NO square root, so the whole
    * statistic is one exact rational both engines replay.
    *
    * Never materializes document pairs: the corpus collapses to the
    * bounded (x-level, y-level) grid in ONE aggregate, and concordant/
    * discordant pair counts fall out of the grid's self-join
    * (≤ maxCells² cell pairs, trivially small) — C = Σ n_a·n_b over cell
    * pairs with x and y strictly increasing, D with x increasing and y
    * decreasing; ties on either axis count as neither (τ-a). Products
    * run in DECIMAL(38,0) (n_a·n_b and N(N−1)/2 approach N²).
    *
    * The magnitude and sign emit separately (tau_abs_fp ×scale, sign
    * ∈ {−1,0,1}): integral division of a NEGATIVE numerator truncates
    * toward zero in Spark but floors in DuckDB/ANSI `//` — dividing the
    * absolute value is the only form both engines fold identically. */
  def kendallTauA(df: DataFrame, xCol: String, yCol: String,
      scale: Long = 1000000L, maxCells: Int = 4096): DataFrame = {
    require(scale > 0, "scale must be positive")
    val cells = df.groupBy(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint()
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"kendallTauA: $nCells distinct (x, y) level cells exceed maxCells=$maxCells — bucket the scores first")
    val a = cells.select(col("x").as("ax"), col("y").as("ay"), col("n").as("an"))
    val b = cells.select(col("x").as("bx"), col("y").as("by"), col("n").as("bn"))
    val pairs = a.join(b, col("ax") < col("bx"))
      .select(expr("CAST(an AS DECIMAL(38,0)) * bn").as("w"),
        when(col("by") > col("ay"), lit(1)).when(col("by") < col("ay"), lit(-1))
          .otherwise(lit(0)).as("dir"))
    val stats = pairs.agg(
      sum(when(col("dir") === 1, col("w")).otherwise(lit(0))).as("__c"),
      sum(when(col("dir") === -1, col("w")).otherwise(lit(0))).as("__d"))
      .crossJoin(cells.agg(sum("n").cast("long").as("n_total")))
    stats
      .withColumn("n_concordant", expr("CAST(coalesce(__c, 0) AS DECIMAL(38,0))"))
      .withColumn("n_discordant", expr("CAST(coalesce(__d, 0) AS DECIMAL(38,0))"))
      .withColumn("sign",
        expr("CAST(sign(n_concordant - n_discordant) AS BIGINT)"))
      .withColumn("tau_abs_fp",
        when(col("n_total") < 2, lit(null).cast("long"))
          .otherwise(expr(
            s"(abs(n_concordant - n_discordant) * $scale) div " +
              "((CAST(n_total AS DECIMAL(38,0)) * (n_total - 1)) div 2)")))
      .select(col("n_total"),
        expr("CAST(n_concordant AS BIGINT)").as("n_concordant"),
        expr("CAST(n_discordant AS BIGINT)").as("n_discordant"),
        col("sign"), col("tau_abs_fp"))
  }

  /** Mann–Whitney U / AUC between two groups of an integer-leveled score —
    * the distribution-free "does the score separate the groups" audit
    * (AUC = P(random group-1 score > random group-0 score) + ½ ties): the
    * question a curation team asks before using a quality score to route
    * or gate sources. Rank-based, so it is EXACT integer algebra — no
    * normality assumption, no floats.
    *
    * The textbook form ranks the whole corpus (a global sort — the classic
    * scale bottleneck); over BOUNDED integer levels the same U falls out
    * of the level table alone:
    *
    *   U₁×2 = Σ_v (2·n1(v)·cum_n0(<v) + n1(v)·n0(v))
    *
    * so the corpus pass is ONE aggregate down to ≤`maxLevels` rows and the
    * prefix sum runs on the level table ([[isotonicCalibration]]'s shape).
    * Products run in DECIMAL(38,0) — n1·cum_n0 approaches N²/4, past Long
    * near 4e9 rows. AUC is NULL when either group is empty (undefined,
    * not 0). Output: n1, n0, u1_x2, auc_fp (×scale). */
  def mannWhitneyAuc(df: DataFrame, groupCol: String, valueCol: String,
      scale: Long = 1000000L, maxLevels: Int = 1024): DataFrame = {
    require(scale > 0, "scale must be positive")
    val g = col(groupCol).cast("long")
    val lv = df.groupBy(col(valueCol).cast("long").as("level"))
      .agg(sum(when(g === 1, 1L).otherwise(0L)).cast("long").as("n1v"),
        sum(when(g === 0, 1L).otherwise(0L)).cast("long").as("n0v"))
      .localCheckpoint()
    val nLevels = lv.count()
    require(nLevels <= maxLevels,
      s"mannWhitneyAuc: $nLevels distinct score levels exceed maxLevels=$maxLevels — bucket the score first")
    val wPrev = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, -1)
    lv.withColumn("c0", coalesce(sum("n0v").over(wPrev), lit(0L)))
      .agg(sum("n1v").cast("long").as("n1"),
        sum("n0v").cast("long").as("n0"),
        sum(expr("CAST(n1v AS DECIMAL(38,0)) * (2 * c0 + n0v)")).as("__u"))
      .withColumn("u1_x2", expr("CAST(__u AS DECIMAL(38,0))"))
      .withColumn("auc_fp",
        when(col("n1") === 0 || col("n0") === 0, lit(null).cast("long"))
          .otherwise(expr(
            s"(CAST(__u AS DECIMAL(38,0)) * $scale) div (CAST(2 AS DECIMAL(38,0)) * n1 * n0)")))
      .select(col("n1"), col("n0"),
        expr("CAST(u1_x2 AS BIGINT)").as("u1_x2"), col("auc_fp"))
  }

  /** Krippendorff's alpha for m binary raters, no missing values — the
    * multi-rater agreement certificate next to Cohen's kappa (q322, two
    * raters): when several automatic judges (quality gates, heuristic
    * labelers) rate every document, alpha says how much of their agreement
    * exceeds chance, with the same "raw accuracy flatters skewed label
    * mixes" correction kappa gives two raters.
    *
    * For binary values the nominal-alpha algebra collapses to exact
    * integers: with per-item ones-count n1ᵢ of m raters, total ones n1 of
    * n_total = m·N ratings,
    *
    *   Do/De = (Σᵢ n1ᵢ·(m−n1ᵢ)) · (n_total−1) / ((m−1) · n1·(n_total−n1))
    *   α     = 1 − Do/De,   emitted ×scale via one integer div
    *
    * so both engines fold identical arithmetic — no floats. The ratio is
    * evaluated in DECIMAL(38,0): the numerator S·(n_tot−1)·scale would
    * overflow a plain Long around 2M items (m=3, scale=1e6), and at 1e12
    * items it still sits near 1e31 — comfortably exact in 38 digits.
    * Degenerate marginals (all ratings equal ⇒ De = 0) return alpha_fp
    * NULL rather than a fake 1.0 — Krippendorff defines alpha as
    * indeterminate there. One row out: n_items, m, n1, disagree_sum,
    * alpha_fp. Cost: one map-side per-row sum + one global aggregate. */
  def krippendorffAlphaBinary(df: DataFrame, raterCols: Seq[String],
      scale: Long = 1000000L): DataFrame = {
    require(raterCols.size >= 2, "need at least two rater columns")
    require(scale > 0, "scale must be positive")
    val m = raterCols.size
    val n1i = raterCols.map(c => col(c).cast("long")).reduce(_ + _)
    // domain guard: a NULL rating would NULL the whole row's __n1i (the
    // item silently vanishes from the sums) and a 2 would corrupt the
    // binary algebra without failing — so the out-of-domain count rides
    // the SAME aggregate (no second pass) and trips raise_error at
    // execution, attached to n_items so column pruning can't drop it
    val badRow = raterCols.map(c =>
      when(col(c).isNull || (col(c).cast("long") =!= 0L &&
        col(c).cast("long") =!= 1L), 1L).otherwise(0L)).reduce(_ + _)
    df.select(n1i.as("__n1i"), badRow.as("__bad_row"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("__n1i")).cast("long").as("n1"),
        sum(col("__n1i") * (lit(m.toLong) - col("__n1i"))).cast("long")
          .as("disagree_sum"),
        sum(col("__bad_row")).cast("long").as("__bad"))
      .withColumn("n_items",
        when(col("__bad") > 0, raise_error(concat(
          lit("krippendorffAlphaBinary: "), col("__bad").cast("string"),
          lit(" rating(s) NULL or outside {0,1} — rater columns must be non-null binary"))))
          .otherwise(col("n_items")).cast("long"))
      .withColumn("m", lit(m.toLong))
      .withColumn("__ntot", col("n_items") * m)
      .withColumn("alpha_fp",
        when(col("n1") === 0 || col("n1") === col("__ntot"), lit(null).cast("long"))
          .otherwise(lit(scale) -
            expr("(CAST(disagree_sum AS DECIMAL(38,0)) * (__ntot - 1) * " +
              s"CAST($scale AS DECIMAL(38,0))) div " +
              s"(CAST(${m - 1} AS DECIMAL(38,0)) * n1 * (__ntot - n1))")))
      .select("n_items", "m", "n1", "disagree_sum", "alpha_fp")
  }

  /** Weighted isotonic regression over bounded integer score levels — the
    * production calibrator for a quality-classifier score (Zadrozny &
    * Elkan 2002's PAV recipe): fit the monotone-non-decreasing step
    * function closest (weighted L2) to each level's empirical positive
    * rate, so the calibrated value can be READ as a keep-probability.
    *
    * Instead of the sequential pool-adjacent-violators walk, this uses the
    * minimax identity ŷ_i = min_{t ≥ i} max_{s ≤ i} avg(y_s..y_t) — pure
    * joins/windows over the LEVEL table, so both engines replay it exactly:
    * per-level (n, n_pos) aggregate → prefix sums → all (s ≤ t) interval
    * averages at ×`scale` fixed point → running max over s within t →
    * min over t per i. Monotone for ANY value matrix (the min/max nesting
    * alone forces ŷ_i ≤ ŷ_{i+1}), so `is_monotone` is a structural
    * certificate, emitted per row for the oracle to pin at 1.
    *
    * Scale shape: the corpus pass is ONE aggregate down to ≤`maxLevels`
    * rows; everything after runs on the level table (≤ maxLevels² interval
    * rows — 5151 at the default 101 levels). scoreCol must be integral
    * with bounded cardinality (require-checked), which a decile/percent
    * bucketing upstream guarantees. */
  def isotonicCalibration(df: DataFrame, scoreCol: String, posCol: String,
      scale: Long = 1000000L, maxLevels: Int = 256): DataFrame = {
    require(scale > 0, "scale must be positive")
    // the corpus aggregate runs ONCE: the level table is materialized
    // eagerly (localCheckpoint) and every later frame — cardinality
    // check, prefix sums, final join — reads the checkpoint, never the
    // corpus again
    val lv = df.groupBy(col(scoreCol).cast("long").as("level"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(posCol).cast("long")).as("n_pos"))
      .localCheckpoint()
    val nLevels = lv.count()
    require(nLevels <= maxLevels,
      s"isotonicCalibration: $nLevels distinct score levels exceed maxLevels=$maxLevels — bucket the score first")
    // prefix sums over the tiny level table (single partition by design)
    val wCum = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, 0)
    val cum = lv
      .withColumn("cp", sum("n_pos").over(wCum))
      .withColumn("cn", sum("n").over(wCum))
    val sSide = cum.select(col("level").as("s"),
      (col("cp") - col("n_pos")).as("cp_prev"), (col("cn") - col("n")).as("cn_prev"))
    val tSide = cum.select(col("level").as("t"), col("cp").as("cp_t"), col("cn").as("cn_t"))
    val pairs = sSide.join(tSide, col("s") <= col("t"))
      .withColumn("avg_fp",
        expr(s"((cp_t - cp_prev) * ${scale}L) div (cn_t - cn_prev)"))
    // M(i,t) = max_{s ≤ i} avg(s,t): running max over s inside each t
    val wMax = Window.partitionBy("t").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val m = pairs.withColumn("m", max("avg_fp").over(wMax))
      .select(col("s").as("level"), col("t"), col("m"))
    // ŷ_i = min_{t ≥ i} M(i,t); pair rows exist exactly for t ≥ i
    val fit = m.groupBy("level").agg(min("m").as("calibrated_fp"))
    val wMono = Window.orderBy("level")
    lv.join(fit, Seq("level"))
      .withColumn("emp_rate_fp", expr(s"(n_pos * ${scale}L) div n"))
      .withColumn("is_monotone",
        when(lag(col("calibrated_fp"), 1).over(wMono).isNull ||
          lag(col("calibrated_fp"), 1).over(wMono) <= col("calibrated_fp"), 1L)
          .otherwise(0L))
  }

  /** Best-F1 operating point for a score gate — the threshold a curation
    * pipeline should cut at when it has a labeled sample (the q327/q365
    * calibration family's ACTION: those describe the curve, this picks the
    * point). Predicting positive at `score ≥ t` for every distinct score t:
    * TP = positives at-or-above, and the F1 denominator collapses to
    * 2TP+FP+FN = n_ge + P, so `f1_x1e6 = 2·TP·10⁶ div (n_ge + P)` — exact
    * integers end to end; the argmax takes the HIGHEST f1 with ties to the
    * SMALLEST threshold (the more-recall point of equal-F1 cuts — both
    * orderings are defensible, one is pinned). One row: threshold, the
    * confusion counts, precision/recall in bp, f1_x1e6.
    *
    * Scale contract: the suffix sums run in one unpartitioned window over
    * DISTINCT scores — [[exactThresholds]]' cardinality contract (scores
    * are quantized integers: ×1000 weights, ×100 ratios), never raw-row
    * cardinality. Degenerate inputs (no positives) yield f1 = 0 rows and
    * threshold = the smallest score. */
  def bestF1Threshold(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val base = df.select(col(scoreCol).cast("long").as("__s"),
      when(coalesce(labelCol, lit(false)), 1L).otherwise(0L).as("__y"))
    val perScore = base.groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__ps"))
    // NB: Spark resolution is case-insensitive — the total must not differ
    // from the per-score column by case alone
    val tot = base.agg(coalesce(sum(col("__y")), lit(0L)).as("__ptot"))
    val wCum = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perScore
      .withColumn("__nge", sum(col("__n")).over(wCum))
      .withColumn("__pge", sum(col("__ps")).over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("__s").as("threshold"),
        col("__pge").as("tp"),
        (col("__nge") - col("__pge")).as("fp"),
        (col("__ptot") - col("__pge")).as("fn"),
        expr("case when __nge > 0 then __pge * 10000 div __nge else 0 end")
          .as("precision_bp"),
        expr("case when __ptot > 0 then __pge * 10000 div __ptot else 0 end")
          .as("recall_bp"),
        expr("__pge * 2000000 div (__nge + __ptot)").as("f1_x1e6"))
    curve.withColumn("__rk", row_number().over(
        Window.orderBy(col("f1_x1e6").desc, col("threshold"))))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }
}
