package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket of an
  * `Array[Float]` embedding in ONE pass.
  *
  * Bit p of the bucket is the sign of the projection of the vector onto a
  * pseudo-random Rademacher (±1) hyperplane: `Σ_i s(p,i)·v[i]` with
  * `s(p,i) ∈ {+1,−1}` derived from a splitmix64-style mix of
  * (plane, dimension, seed) — deterministic across JVMs/executors with no
  * RNG state to ship, and unlike axis-aligned sign bits it is robust to the
  * correlated/biased dimensions real embedding models produce (an
  * all-positive first dimension would otherwise collapse every row into the
  * same bucket). Rademacher entries are a standard substitute for Gaussian
  * planes (Achlioptas-style database-friendly random projections).
  *
  * Sign tables are memoized per (bits, dims, seed) so the per-row work is
  * `bits × dims` additions — no hashing on the hot path; the loop inlines
  * into whole-stage codegen.
  */
case class HyperplaneBucket(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val tab = HyperplaneBucket.table(bits, n, seed)
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      var p = 0
      while (p < bits) {
        if (tab(p)(i)) acc(p) += x else acc(p) -= x
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < bits) {
      if (acc(p) > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val x = ctx.freshName("x")
      val acc = ctx.freshName("acc"); val tab = ctx.freshName("tab")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |boolean[][] $tab = graft.functions.HyperplaneBucket.table($bits, $n, $seed);
         |double[] $acc = new double[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  for (int $p = 0; $p < $bits; $p++) {
         |    if ($tab[$p][$i]) $acc[$p] += $x; else $acc[$p] -= $x;
         |  }
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  if ($acc[$p] > 0.0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Boolean]]]()

  /** Memoized sign table, BALANCED per plane: exactly ⌈dims/2⌉ positive signs
    * (the dims ranked highest by the hash mix). A plane whose signs don't sum
    * to ~0 projects the dataset's mean vector as a constant offset, and on
    * the biased, all-positive-ish embeddings real models emit that offset
    * pins the bit for most rows (few occupied buckets). Balancing cancels
    * the common-mean component exactly, leaving the per-row variation to
    * decide the bit — still a pure function of (bits, dims, seed). Embedding
    * datasets have a fixed dimensionality, so the cache stays tiny. */
  def table(bits: Int, dims: Int, seed: Int): Array[Array[Boolean]] = {
    val dd = math.max(dims, 1)
    cache.computeIfAbsent((bits, dd, seed), { _ =>
      Array.tabulate(bits) { p =>
        val ranked = Array.tabulate(dd)(i => (mix(p, i, seed), i)).sortBy(_._1)
        val row = new Array[Boolean](dd)
        var r = 0
        while (r < dd) { row(ranked(r)._2) = r >= dd / 2; r += 1 }
        row
      }
    })
  }

  private def mix(p: Int, i: Int, seed: Int): Long = {
    var h = p.toLong * 0x9E3779B97F4A7C15L +
      i.toLong * 0xC2B2AE3D27D4EB4FL + seed.toLong * 0x165667B19E3779F9L
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^= (h >>> 33)
    h
  }
}

/** Multi-probe companion to [[HyperplaneBucket]]: the vector's own bucket
  * plus the `nProbes−1` alternates reached by flipping the bits whose
  * projection MARGIN is smallest — the planes the vector sits closest to,
  * i.e. where hash noise most likely put a true neighbor on the other side
  * (standard multi-probe LSH, Lv et al., VLDB'07). Probing these buckets
  * recovers most of the recall lost to bucketing at ~nProbes× candidate
  * cost, without re-hashing or extra tables.
  *
  * Same memoized balanced sign table as [[HyperplaneBucket]], so element 0
  * always equals `hyperplane_bucket(v)` — single-probe callers compose
  * unchanged. Distinct buckets are disjoint, so downstream joins need no
  * dedup. */
case class HyperplaneProbeBuckets(child: Expression, bits: Int, nProbes: Int, seed: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
  require(nProbes >= 1 && nProbes <= bits + 1,
    s"nProbes must be in [1, bits + 1], got $nProbes with $bits bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_probe_buckets"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HyperplaneProbeBuckets.compute(input.asInstanceOf[ArrayData], bits, nProbes, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.HyperplaneProbeBuckets.compute($a, $bits, $nProbes, $seed));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneProbeBuckets {

  /** Shared by interpreted eval and codegen (static call keeps the generated
    * method small; the projection loop itself is branch-light JVM code). */
  def compute(a: ArrayData, bits: Int, nProbes: Int, seed: Int): Array[Long] = {
    val n = a.numElements()
    val tab = HyperplaneBucket.table(bits, n, seed)
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      var p = 0
      while (p < bits) {
        if (tab(p)(i)) acc(p) += x else acc(p) -= x
        p += 1
      }
      i += 1
    }
    var main = 0L
    var p = 0
    while (p < bits) {
      if (acc(p) > 0.0) main |= (1L << p)
      p += 1
    }
    val out = new Array[Long](nProbes)
    out(0) = main
    val used = new Array[Boolean](bits)
    var q = 1
    while (q < nProbes) { // nProbes−1 passes over ≤62 margins: selection sort is optimal here
      var best = -1
      var bestAbs = Double.MaxValue
      var r = 0
      while (r < bits) {
        val m = math.abs(acc(r))
        if (!used(r) && m < bestAbs) { bestAbs = m; best = r }
        r += 1
      }
      used(best) = true
      out(q) = main ^ (1L << best)
      q += 1
    }
    out
  }
}
