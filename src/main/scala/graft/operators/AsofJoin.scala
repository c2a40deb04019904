package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (point-in-time) join — for each left row, the single nearest right
  * row on the same key in the requested direction. Spark has no native
  * operator for this; the naive formulations are a range join (quadratic
  * blow-up) or a per-row subquery (no). This is the scalable composition:
  * tag both sides, UNION, and run ONE ordered window per key — a single
  * shuffle on the key, linear in input size, no interval explosion.
  *
  * Directions (pandas merge_asof surface):
  *   - `backward` (default): most recent right with `r.time <= l.time`;
  *   - `forward`: earliest right with `r.time >= l.time`;
  *   - `nearest`: whichever of the two is closer in time (tie → backward).
  *
  * Keys partition by VALUE EQUALITY on the raw columns (any type — string
  * tickers, UUIDs, numeric ids); the union widens mixed-but-compatible
  * key types (int vs bigint) to the common type. Null keys group with null
  * keys (null-equal semantics, like a window PARTITION BY).
  *
  * Time columns must be integral (already epoch units) or date/timestamp;
  * anything else is rejected up front rather than silently null-casting.
  * Temporal times convert to epoch MICROseconds, so `tolerance` is in
  * micros for date/timestamp inputs and in the columns' own units for
  * integral inputs. Both sides must be in the same family (integral vs
  * temporal) — mixed units would silently mis-match.
  *
  * `tolerance` nulls a match farther than the bound; for `nearest` it
  * applies to each direction BEFORE choosing, so a too-far backward match
  * still falls through to an in-range forward one (pandas semantics).
  *
  * Inclusivity/determinism: a right row exactly at the left row's time
  * matches in every direction; equal-time right rows resolve
  * deterministically by `rightTieBreak` (backward: last in tie order wins;
  * forward: first wins — dedupe the right side per (key,time) first if a
  * specific winner is required).
  */
object AsofJoin {

  private def timeFamily(side: String, name: String, dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType        => "integral"
    case DateType | TimestampType | TimestampNTZType          => "temporal"
    case other => throw new IllegalArgumentException(
      s"as-of $side time column '$name' must be integral (epoch units) or date/timestamp, " +
        s"got $other — cast it explicitly before the join")
  }

  private def timeAsLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
    case _                                             => unix_micros(col(c).cast("timestamp"))
  }

  def asofJoin(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Option[String] = None,
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one right payload column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val lFam = timeFamily("left", leftTime, left.schema(leftTime).dataType)
    val rFam = timeFamily("right", rightTime, right.schema(rightTime).dataType)
    require(lFam == rFam,
      s"as-of time columns disagree: '$leftTime' is $lFam but '$rightTime' is $rFam — " +
        "mixed units would silently mis-match; align them first")
    rightTieBreak.foreach { c =>
      right.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"as-of tie-break column '$c' must be integral, got $other")
      }
    }
    val leftCols = left.columns.toSeq
    // __rt duplicates the right time in converted (long) units so tolerance
    // and nearest-distance math never re-derive it from the raw column.
    val payloadStruct = struct(
      (timeAsLong(right, rightTime).as("__rt") +: col(rightTime) +: payload.map(col)): _*)

    val taggedRight = right.select(
      Seq(
        col(rightKey).as("__k"), // raw value — equality partitioning needs no cast
        timeAsLong(right, rightTime).as("__t"),
        lit(0).as("__tag"), // sorts BEFORE left at equal time (backward-inclusive)
        rightTieBreak.fold(lit(0L))(c => col(c).cast("long")).as("__tie"),
        payloadStruct.as("__p")
      ) ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val taggedLeft = left.select(
      Seq(
        col(leftKey).as("__k"),
        timeAsLong(left, leftTime).as("__t"),
        lit(1).as("__tag"),
        lit(Long.MaxValue).as("__tie"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p")
      ) ++ leftCols.map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight)

    // backward: rights sort before lefts at equal (t, tie) → preceding frame
    // is inclusive; LAST right in order = latest time, largest tie.
    val wBack = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: time DESCENDING flips the frame — the preceding frame holds
    // exactly the rows with t >= left's t. At equal time rights (tag 0)
    // still sort before left (tag 1) so the match is inclusive, and tie
    // DESC makes LAST = earliest time, smallest tie ("first wins").
    val wFwd = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__tag").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def withinTol(m: Column): Column = tolerance.fold(m) { tol =>
      when(m.isNotNull && abs(col("__t") - m.getField("__rt")) <= tol, m)
        .otherwise(lit(null).cast(taggedRight.schema("__p").dataType))
    }

    val needBack = direction != "forward"
    val needFwd = direction != "backward"
    val withMatches = unioned
      .withColumn("__mb", if (needBack) withinTol(last(col("__p"), ignoreNulls = true).over(wBack)) else lit(null))
      .withColumn("__mf", if (needFwd) withinTol(last(col("__p"), ignoreNulls = true).over(wFwd)) else lit(null))
    val chosen = direction match {
      case "backward" => col("__mb")
      case "forward"  => col("__mf")
      case "nearest" =>
        val bDist = col("__t") - col("__mb").getField("__rt")
        val fDist = col("__mf").getField("__rt") - col("__t")
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(bDist <= fDist, col("__mb")) // tie → backward (pandas)
          .otherwise(col("__mf"))
    }

    withMatches
      .withColumn("__match", chosen)
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        Seq(col(s"__match.$rightTime").as(s"asof_$rightTime")) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }
}
