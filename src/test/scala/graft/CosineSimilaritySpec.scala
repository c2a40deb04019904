package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, GraftFunctions}
import graft.operators.Similarity

/** Specs for the native codegen'd cosine expression: correctness, parity
  * with the sequential-fold HOF form (bit-exact), SQL registration, nulls. */
class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
    (3L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
  ).toDF("id", "a", "b")

  test("native expression matches the HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val hof = (Similarity.dot("a", "b") /
      (sqrt(Similarity.norm2("a")) * sqrt(Similarity.norm2("b")))).as("c")
    val rows = vecs.select(
      GraftFunctions.cosineSim($"a", $"b").as("native"), hof).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("callable from SQL after registration") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("cos_vecs")
    val r = spark.sql(
      s"select id, ${GraftFunctions.CosineName}(a, b) as c from cos_vecs order by id").collect()
    assert(math.abs(r(0).getDouble(1) - 0.9746318) < 1e-6)
    assert(r(2).getDouble(1) == 0.0)
  }

  test("null array -> null; zero vector -> null; null elements count as 0") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Option(Array(0.0f, 0.0f)), Option(Array(1.0f, 1.0f))),
      (2L, None: Option[Array[Float]], Option(Array(1.0f, 1.0f)))
    ).toDF("id", "a", "b")
    val r = df.select($"id", GraftFunctions.cosineSim($"a", $"b").as("c")).orderBy("id").collect()
    assert(r(0).isNullAt(1)) // zero norm
    assert(r(1).isNullAt(1)) // null input
  }

  test("sorted intersect count: merge semantics on sorted distinct arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Array("a", "b", "c", "d"), Array("b", "d", "e")),
      (2L, Array("a"), Array("b")),
      (3L, Array.empty[String], Array("a"))
    ).toDF("id", "x", "y")
    val r = df.select($"id", GraftFunctions.sortedIntersectCount($"x", $"y").as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(r == Seq(2L, 0L, 0L))
  }

  test("optimizer rule rewrites size(array_intersect) of sorted distinct arrays") {
    import graft.functions.IntersectCountRewrite
    IntersectCountRewrite.install(spark)
    // parquet-backed input: local literal data would be constant-folded into
    // a LocalRelation before the plan can be inspected. The rule matches the
    // INLINE canonical token-set shape.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(8)
    val pairs = docs.select(col("doc_id"), col("text"))
      .crossJoin(docs.select(col("doc_id").as("doc_id2"), col("text").as("text2")))
      .filter("doc_id < doc_id2")
    val inline = "size(array_intersect(sort_array(array_distinct(split(text, ' '))), " +
      "sort_array(array_distinct(split(text2, ' ')))))"
    val q = pairs.selectExpr("doc_id", "doc_id2", s"$inline as n")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sorted_intersect_count"), s"rewrite did not fire:\n$optimized")
    // values must match a rule-free evaluation of the same expression
    val got = q.orderBy("doc_id", "doc_id2").collect().map(_.getInt(2)).toSeq
    val expected = pairs.selectExpr("doc_id", "doc_id2",
      "size(filter(sort_array(array_distinct(split(text, ' '))), " +
        "x -> array_contains(sort_array(array_distinct(split(text2, ' '))), x))) as n")
      .orderBy("doc_id", "doc_id2").collect().map(_.getInt(2)).toSeq
    assert(got == expected)
    // non-matching shape (unsorted) must NOT be rewritten
    val raw = docs.selectExpr("size(array_intersect(split(text, ' '), split(text, ' '))) as n")
    assert(!raw.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
  }

  test("rewrite skips null-bearing arrays (array_intersect counts a shared null)") {
    import graft.functions.IntersectCountRewrite
    IntersectCountRewrite.install(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(4)
    // array(text, NULL) has containsNull=true: the sorted merge skips nulls but
    // array_intersect counts a null shared by both sides — result would shift
    // by one, so the rule must leave this expression alone
    val withNull = "size(array_intersect(" +
      "sort_array(array_distinct(array(text, cast(null as string)))), " +
      "sort_array(array_distinct(array(text, cast(null as string))))))"
    val q = docs.selectExpr(s"$withNull as n")
    assert(!q.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
    // and the untouched builtin counts {text, null} -> 2
    assert(q.collect().forall(_.getInt(0) == 2))
  }

  test("extensions class injects functions into a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
    // injection is validated end-to-end by the registry path tests; here we
    // only assert the wiring executes without error
  }

  test("interpreted eval agrees with codegen path") {
    // force interpreted evaluation via the expression's eval()
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val e = CosineSimilarity(
      Literal.create(Array(3.0f, 4.0f), ArrayType(FloatType)),
      Literal.create(Array(4.0f, 3.0f), ArrayType(FloatType)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 24.0 / 25.0) < 1e-12)
  }

  test("native expressions COMPILE under codegen (no silent Janino fallback)") {
    // GenerateUnsafeProjection.generate throws if doGenCode emits bad Java —
    // a plain DataFrame test would silently fall back to interpreted eval
    // and hide the break. Each expression's generated result must equal its
    // interpreted eval on the same input.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val vec = Literal.create(Array(0.5f, -1.5f, 2.0f, 0.25f), ArrayType(FloatType))
    val strs = Literal.create(Array(UTF8String.fromString("a"), UTF8String.fromString("b")),
      ArrayType(StringType))
    val longs = Literal.create(Array(1L, 3L, 7L), ArrayType(LongType))
    val exprs = Seq(
      CosineSimilarity(vec, vec),
      graft.functions.SortedIntersectCount(strs, strs),
      graft.functions.SortedIntersectCount(longs, longs),
      graft.functions.HyperplaneBucket(vec, bits = 6, seed = 42))
    exprs.foreach { e =>
      val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on codegen failure
      val generated = proj(InternalRow.empty).get(0, e.dataType)
      assert(generated == e.eval(InternalRow.empty), s"codegen != eval for ${e.prettyName}")
    }
  }
}
