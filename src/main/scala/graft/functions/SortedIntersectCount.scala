package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: |A ∩ B| for two SORTED arrays via a linear
  * merge — O(n+m), zero per-row allocation. Elements are `string` or
  * `bigint` (both sides the same type); the long form exists because the
  * hashed-token-set dedup path compares 8-byte integers instead of variable-
  * length UTF8 strings — the same merge at a fraction of the per-element
  * cost.
  *
  * `array_intersect` builds a hash set per row and materializes the
  * intersection array just to take its size; on a candidate-pair stream
  * (millions of rows at scale, ~50-element token arrays) that allocation
  * dominates. Inputs must be sorted ascending with no duplicates (what
  * `sort_array(array_distinct(...))` produces — the canonical token-set
  * form used by the dedup operators); duplicates would be counted per
  * matching run, unsorted inputs undercount.
  *
  * Null elements are ignored (token sets have none; `sort_array` places
  * nulls first, the merge skips them).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOf(t: DataType): Option[DataType] = t match {
    case ArrayType(e @ (StringType | LongType), _) => Some(e)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> or two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0L
    val longs = isLong
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val c =
          if (longs) java.lang.Long.compare(a.getLong(i), b.getLong(j))
          else a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val utf8 = classOf[UTF8String].getName
      val cmp =
        if (isLong)
          s"""long $x = $a.getLong($i);
             |long $y = $b.getLong($j);
             |int $c = Long.compare($x, $y);""".stripMargin
        else
          s"""$utf8 $x = $a.getUTF8String($i);
             |$utf8 $y = $b.getUTF8String($j);
             |int $c = $x.compareTo($y);""".stripMargin
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    $cmp
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
