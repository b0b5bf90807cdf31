package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character-gram counter:
  * `graft_gramcounts(text)` returns `array<struct<g: string, k: int,
  * cnt: bigint>>` — for every word of `split(text, ' ')` with length >= 1,
  * every character n-gram of length k in 1..3, counted WITHIN the
  * document. Summing `cnt` across documents per (g, k) equals the
  * per-instance exploded count exactly (gram occurrences are additive),
  * which is the unigram-tokenizer family's training statistic.
  *
  * WHY native (design-ladder tier b, see [[DotProduct]]): the HOF form —
  * explode words, then per word
  * `flatten(transform(array(1,2,3), n -> slice(transform(sequence(1,
  * length(w)), i -> struct(substring(w, i, n), n)), 1, ...)))` — is
  * `CodegenFallback` AND allocation-bound: one interpreted lambda
  * dispatch plus a boxed struct per gram OCCURRENCE (the sf0.1 corpus's
  * 270 k word instances carry ~4 M occurrences), and every occurrence
  * becomes an exploded row into the aggregate. This expression counts
  * occurrences row-locally in one compiled loop with one hash map per
  * document, so only the document's DISTINCT (g, k) entries (already
  * partially aggregated) reach the explode and the aggregate — the
  * map-side-combine discipline pushed inside the row. Used by the
  * streaming maintainer (q322), where no batch staging can absorb the
  * explode because every micro-batch pays it on arrival.
  *
  * Null semantics: null text -> null (the word stream of a null document
  * is empty either way). Tokenization matches `split(text, ' ')` +
  * `length(w) >= 1`: split on each single space, empty tokens skipped.
  */
case class GramCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gramcounts expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_gramcounts"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // insertion-ordered so the output is deterministic per document (the
    // downstream aggregate is order-insensitive regardless)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var start = 0
    val len = text.length
    var p = 0
    while (p <= len) {
      if (p == len || text.charAt(p) == ' ') {
        if (p > start) {
          // code-point start offsets within the word (identity walk on
          // BMP text, one extra array fill): a gram must never split a
          // surrogate pair — the same offsetByCodePoints discipline as
          // CharGrams, matching the HOF form's UTF8String code-point
          // substring semantics on supplementary characters
          val cpTotal = text.codePointCount(start, p)
          val starts = new Array[Int](cpTotal + 1)
          var ci = start
          var cp = 0
          while (cp < cpTotal) {
            starts(cp) = ci
            ci = text.offsetByCodePoints(ci, 1)
            cp += 1
          }
          starts(cpTotal) = p
          var n = 1
          while (n <= 3 && n <= cpTotal) {
            var i = 0
            val last = cpTotal - n
            while (i <= last) {
              val g = text.substring(starts(i), starts(i + n))
              val key = n.toString + ':' + g
              val c = counts.get(key)
              counts.put(key, if (c == null) 1L else c + 1L)
              i += 1
            }
            n += 1
          }
        }
        start = p + 1
      }
      p += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var idx = 0
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      val k = key.charAt(0) - '0'
      val g = key.substring(2)
      out(idx) = InternalRow(UTF8String.fromString(g), k, e.getValue)
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramCounts =
    copy(child = newChild)
}
