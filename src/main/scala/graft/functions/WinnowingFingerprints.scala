package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints: polynomial rolling hash of every char
  * k-gram (base 257 mod 1e9+7), minimum per w-window, sorted distinct
  * minima out.
  *
  * Semantically identical to the HOF formulation
  * (TextAnalysis.gramHashesSql + winnowSql) and to the DuckDB oracle, but
  * one compiled per-row loop instead of ~8·len interpreted lambda
  * evaluations — the difference measured at 40s → sub-second for the q55
  * corpus. CodegenFallback is deliberate: the loop body is compiled Scala
  * already; only the per-ROW dispatch is interpreted, which is noise.
  *
  * Chars beyond the string (len < k tail) contribute 0, matching
  * `ascii(substring(...)) = ascii('') = 0` in the SQL form.
  *
  * Iterates CODE POINTS, not UTF-16 code units: the SQL form counts
  * characters with `length()` and hashes `ascii(substring(...))` code
  * points, so a surrogate-pair character (emoji etc. — routine in web
  * training text) must be one gram position with its full code-point
  * value, exactly as DuckDB computes it.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string argument")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprints"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray // code points, matching SQL length()/substring()
    val len = cps.length
    val n = math.max(len - k + 1, 1)
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < k) {
        val c = if (i + j < len) cps(i + j).toLong else 0L
        acc = (acc * 257L + c) % P
        j += 1
      }
      grams(i) = acc
      i += 1
    }
    val m = math.max(n - w + 1, 1)
    val selected = mutable.SortedSet.empty[Long]
    i = 0
    while (i < m) {
      var mn = Long.MaxValue
      var j = i
      val end = math.min(i + w, n)
      while (j < end) { if (grams(j) < mn) mn = grams(j); j += 1 }
      selected += mn
      i += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
