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
}
