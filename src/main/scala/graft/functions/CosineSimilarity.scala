package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fused cosine similarity over two
  * `Array[Float]` columns in ONE pass.
  *
  * The composable form (`aggregate(zip_with(a,b,*)) / (sqrt(...)*sqrt(...))`)
  * walks each array three times through interpreted higher-order lambdas and
  * allocates an intermediate product array per row. This expression computes
  * dot product and both norms in a single loop, participates in whole-stage
  * codegen (`doGenCode` emits the loop inline into the generated consume
  * path), and allocates nothing — the difference between interpreted
  * per-element closures and a tight JIT'd loop on the 100 TB hot path.
  *
  * Accumulation is in array-index order, identical to the sequential fold of
  * the HOF form and to a sequential SQL `list_reduce` — bit-reproducible
  * doubles across engines. Null elements count as 0; zero-norm inputs yield
  * NULL (the HOF form's NaN also renders to NULL through the DECIMAL cast).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $y = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions (FunctionRegistry
  * injection — usable from SQL and via `call_function`). Idempotent. */
object GraftFunctions {

  val CosineName = "graft_cosine_similarity"
  val TokenSetHitsName = "graft_token_set_hits"
  val SqL2Name = "graft_squared_l2_distance"
  val SortedIntersectName = "graft_sorted_intersect_count"
  val WinnowingName = "graft_winnowing_fingerprints"
  val HyperplaneName = "graft_hyperplane_bucket"
  val ProbeBucketsName = "graft_hyperplane_probe_buckets"

  private def registerOne(
      spark: SparkSession, name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, new ExpressionInfo(clazz.getName, name), builder)
    }
  }

  def register(spark: SparkSession): Unit = {
    registerOne(spark, CosineName, classOf[CosineSimilarity], { children =>
      require(children.length == 2, s"$CosineName expects 2 arguments")
      CosineSimilarity(children.head, children(1))
    })
    registerOne(spark, TokenSetHitsName, classOf[TokenSetHits], { children =>
      require(children.length == 3, s"$TokenSetHitsName expects (text, unigrams, bigrams)")
      // accept ANY foldable array<string> child (constant folding runs
      // AFTER function resolution, so SQL's array('a','b') arrives as
      // CreateArray, not Literal — eval'ing the foldable expression makes
      // the registered name callable from SQL too, r15b review finding)
      def strArr(e: Expression, what: String): Seq[String] = e.dataType match {
        case org.apache.spark.sql.types.ArrayType(StringType, _) if e.foldable =>
          e.eval(null) match {
            case d: org.apache.spark.sql.catalyst.util.ArrayData =>
              d.toObjectArray(StringType).map {
                case null => throw new IllegalArgumentException(
                  s"$TokenSetHitsName $what must not contain NULL phrases")
                case s => s.asInstanceOf[UTF8String].toString
              }.toSeq
            case _ => throw new IllegalArgumentException(
              s"$TokenSetHitsName $what must not be NULL")
          }
        case _ => throw new IllegalArgumentException(
          s"$TokenSetHitsName $what must be a foldable array<string>, got $e")
      }
      TokenSetHits(children.head, strArr(children(1), "unigrams"), strArr(children(2), "bigrams"))
    })
    registerOne(spark, SqL2Name, classOf[SquaredL2Distance], { children =>
      require(children.length == 2, s"$SqL2Name expects 2 arguments")
      SquaredL2Distance(children.head, children(1))
    })
    registerOne(spark, SortedIntersectName, classOf[SortedIntersectCount], { children =>
      require(children.length == 2, s"$SortedIntersectName expects 2 arguments")
      SortedIntersectCount(children.head, children(1))
    })
    registerOne(spark, WinnowingName, classOf[WinnowingFingerprints], { children =>
      require(children.length == 3, s"$WinnowingName expects (text, k, w)")
      def intLit(e: Expression): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"$WinnowingName k/w must be int literals, got $other")
      }
      WinnowingFingerprints(children.head, intLit(children(1)), intLit(children(2)))
    })
    registerOne(spark, HyperplaneName, classOf[HyperplaneBucket], { children =>
      require(children.length == 3, s"$HyperplaneName expects (vec, bits, seed)")
      def intLit(e: Expression): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"$HyperplaneName bits/seed must be int literals, got $other")
      }
      HyperplaneBucket(children.head, intLit(children(1)), intLit(children(2)))
    })
    registerOne(spark, ProbeBucketsName, classOf[HyperplaneProbeBuckets], { children =>
      require(children.length == 4, s"$ProbeBucketsName expects (vec, bits, nProbes, seed)")
      def intLit(e: Expression): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"$ProbeBucketsName bits/nProbes/seed must be int literals, got $other")
      }
      HyperplaneProbeBuckets(children.head, intLit(children(1)), intLit(children(2)), intLit(children(3)))
    })
  }

  /** Column DSL for the fused cosine (caller must have registered). */
  def cosineSim(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** Column DSL for the fused squared-L2 distance. */
  def squaredL2(a: Column, b: Column): Column = call_function(SqL2Name, a, b)

  /** Column DSL for the native large-blocklist matcher: packed
    * (n_uni_hits << 32) | n_bi_hits over whitespace tokens. */
  def tokenSetHits(text: Column, unigrams: Seq[String], bigrams: Seq[String]): Column =
    call_function(TokenSetHitsName, text,
      org.apache.spark.sql.functions.lit(unigrams.toArray),
      org.apache.spark.sql.functions.lit(bigrams.toArray))

  /** Column DSL for the sorted-merge intersection count. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function(SortedIntersectName, a, b)

  /** Column DSL for native winnowing fingerprints. */
  def winnowing(text: Column, k: Int, w: Int): Column =
    call_function(WinnowingName, text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(w))

  /** Column DSL for the random-hyperplane LSH bucket. */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Int): Column =
    call_function(HyperplaneName, vec,
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(seed))

  /** Column DSL for multi-probe LSH buckets (own + lowest-margin flips). */
  def hyperplaneProbeBuckets(vec: Column, bits: Int, nProbes: Int, seed: Int): Column =
    call_function(ProbeBucketsName, vec, org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(nProbes), org.apache.spark.sql.functions.lit(seed))
}
