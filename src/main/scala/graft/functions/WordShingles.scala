package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-shingle construction:
  * `graft_shingles(toks, k)` → `array<string>` of the token array's
  * consecutive k-word shingles joined by single spaces, in order —
  * exactly `transform(sequence(1, size(toks)-k+1), i ->
  * concat_ws(' ', toks[i-1], ..., toks[i+k-2]))` for `size(toks) >= k`
  * (null elements skipped, concat_ws semantics), and an empty array for
  * shorter inputs (whose descending `sequence` the HOF form never
  * reaches because every call site filters `size(toks) >= k` first).
  *
  * Why native (design-ladder tier b, see [[CharGrams]]): the HOF form is
  * the front half of EVERY shingle consumer in the dedup family (minhash
  * signatures, LSH bands, decontamination, boilerplate audit, the
  * normalization-recall triple pass, the streaming near-dup key) and
  * pays one interpreted lambda dispatch plus a concat_ws expression
  * eval — with its own per-call argument boxing — per shingle per row.
  * This expression walks the token array once per row in one compiled
  * loop, building each shingle with a single StringBuilder pass.
  */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      scala.util.Try(right.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_shingles k literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(k) =>
          if (k == null || k.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"graft_shingles k must be >= 1, got $k")
          else TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (array<string>, foldable int), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_shingles"

  @transient private lazy val k = right.eval().asInstanceOf[Int]

  override def nullSafeEval(toksAny: Any, kAny: Any): Any = {
    val arr = toksAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // one decode pass: the HOF form touches each token k times
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder()
    var p = 0
    while (p <= n - k) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < k) {
        val t = toks(p + j)
        // concat_ws semantics: null elements are skipped entirely
        if (t != null) {
          if (!first) sb.append(' ')
          sb.append(t)
          first = false
        }
        j += 1
      }
      out(p) = UTF8String.fromString(sb.toString)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
