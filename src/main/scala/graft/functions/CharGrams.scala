package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character n-gram extraction:
  * `graft_chargrams(text, n)` → `array<string>` of the text's DISTINCT
  * n-character grams in first-appearance order — exactly
  * `array_distinct(transform(sequence(1, length(text) - n + 1),
  * i -> substring(text, i, n)))` for `length(text) >= n`, and an empty
  * array for shorter text (where the HOF form's descending `sequence`
  * would fabricate positions — callers filter those rows anyway).
  *
  * Why native (design-ladder tier b, see [[DotProduct]]/[[Winnow]]): the
  * HOF form pays one interpreted lambda dispatch plus a boxed
  * UTF8String per CHARACTER POSITION (a 300-char document is ~300
  * dispatches + allocations), then `array_distinct`'s element-wise
  * dedup over the materialized array. This expression walks the text
  * once in one compiled loop, deduping into one LinkedHashSet per row.
  *
  * Code-point exactness: gram boundaries are code-point offsets
  * (`offsetByCodePoints`), matching Spark's code-point `length`/
  * `substring` semantics on supplementary characters, not UTF-16 units.
  *
  * Null semantics: null text → null; n is a validated >= 1 literal
  * (Winnow's analysis-time discipline: a bad literal is a clean
  * typecheck failure, never an exception from generated code).
  */
case class CharGrams(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable) {
      scala.util.Try(right.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_chargrams n literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(n) =>
          if (n == null || n.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"graft_chargrams n must be >= 1, got $n")
          else TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_chargrams expects (string, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_chargrams"

  @transient private lazy val n = right.eval().asInstanceOf[Int]

  override def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val charLen = text.length
    // code-point start offsets (UTF-16 char indices); for BMP-only text
    // this is the identity walk, one bounds check per char
    val total = text.codePointCount(0, charLen)
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](total + 1)
    var ci = 0
    var cp = 0
    while (cp < total) {
      starts(cp) = ci
      ci = text.offsetByCodePoints(ci, 1)
      cp += 1
    }
    starts(total) = charLen
    val seen = new java.util.LinkedHashSet[String]()
    var p = 0
    val last = total - n
    while (p <= last) {
      seen.add(text.substring(starts(p), starts(p + n)))
      p += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      out(idx) = UTF8String.fromString(it.next())
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGrams =
    copy(left = newLeft, right = newRight)
}
