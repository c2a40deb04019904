package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — makes graft's native expressions
  * available cluster-wide via configuration, with no code changes in user
  * jobs:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftSparkExtensions ...
  *
  * (The runtime path `GraftFunctions.register(spark)` covers sessions
  * created without the conf; both routes are idempotent.)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.PointIntervalJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, GraftFunctions.CosineName),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${GraftFunctions.CosineName} expects 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.SortedIntersectName),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, GraftFunctions.SortedIntersectName),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${GraftFunctions.SortedIntersectName} expects 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
  }
}
