package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single most recent
  * right row with `right.time <= left.time` on the same key. Spark has no
  * native operator for this; the naive formulations are a range join
  * (quadratic blow-up) or a per-row subquery (no). This is the scalable
  * composition: tag both sides, UNION, and run ONE ordered window per key
  * with `last(..., ignoreNulls)` — a single shuffle on the key, linear in
  * input size, no interval explosion.
  *
  * Ordering within a key is (time, tag, tieBreak) with right rows tagged 0 <
  * left's 1, so a right row exactly at the left row's time matches
  * (inclusive as-of), and equal-time right rows resolve deterministically by
  * `rightTieBreak` (the LAST one in tie order wins — dedupe the right side
  * per (key,time) first if a specific winner is required).
  *
  * Time columns must be mutually comparable and totally ordered (use epoch
  * seconds/micros for cross-engine-reproducible results).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Option[String] = None
  ): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one right payload column")
    val leftCols = left.columns.toSeq
    val payloadStruct = struct((rightTime +: payload).map(col): _*)

    val taggedRight = right.select(
      Seq(
        col(rightKey).cast("long").as("__k"),
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__tag"),
        rightTieBreak.fold(lit(0L))(c => col(c).cast("long")).as("__tie"),
        payloadStruct.as("__p")
      ) ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val taggedLeft = left.select(
      Seq(
        col(leftKey).cast("long").as("__k"),
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__tag"),
        lit(Long.MaxValue).as("__tie"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p")
      ) ++ leftCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        Seq(col(s"__match.$rightTime").as(s"asof_$rightTime")) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }
}
