package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q270's boilerplate-strip audit core, one compiled pass per page:
  * `graft_blockaudit(blocks, stopwords)` over an `array<array<string>>`
  * page returns the seven counters the jusText-style gate reports —
  * `struct<b_all, b_short, b_link, b_nostop, b_content, w_kept, w_all>`
  * (all BIGINT) — under exactly the rule lattice the HOF form states:
  *
  *   - SHORT:   `size(b) < 6`
  *   - LINKY:   `(100 * |{t : t has a digit or starts with 'http'}|)
  *               div size(b) > 20`
  *   - NO-STOP: no token of b is in `stopwords`
  *   - CONTENT: none of the rules fire; w_kept sums content block sizes
  *
  * Why native: the HOF form evaluates SEVEN independent projections,
  * and CollapseProject inlines the O(page) `blocks` construction into
  * each — seven block-array builds plus seven interpreted lambda
  * traversals (with an `rlike` per token) per row. This expression
  * consumes ONE `blocks` reference and walks it once.
  *
  * Null semantics mirror the HOF lattice exactly (BlockAuditSpec pins
  * every branch): a null BLOCK counts in b_all, fails every filter
  * predicate (SQL null), and nulls w_all through the `aggregate` fold —
  * w_kept stays defined because a null block is never content. A null
  * TOKEN is neither linky nor a stopword and still counts in size(b).
  * `stopwords` must be a foldable array literal — the q270 probe set. */
case class BlockAudit(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(StringType, _), _), ArrayType(StringType, _))
      if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_blockaudit expects (array<array<string>>, foldable " +
        s"array<string>), got (${l.simpleString(20)}, ${r.simpleString(20)})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("b_all", LongType, nullable = false),
    StructField("b_short", LongType, nullable = false),
    StructField("b_link", LongType, nullable = false),
    StructField("b_nostop", LongType, nullable = false),
    StructField("b_content", LongType, nullable = false),
    StructField("w_kept", LongType, nullable = false),
    StructField("w_all", LongType, nullable = true)))

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_blockaudit"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) set.add(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    set
  }

  private def isLinky(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= '0' && c <= '9') return true
      i += 1
    }
    t.length >= 4 && t.startsWith("http")
  }

  override def nullSafeEval(blocksAny: Any, stopAny: Any): Any = {
    val blocks = blocksAny.asInstanceOf[ArrayData]
    val nb = blocks.numElements()
    var bShort = 0L
    var bLink = 0L
    var bNostop = 0L
    var bContent = 0L
    var wKept = 0L
    var wAll = 0L
    var sawNullBlock = false
    var j = 0
    while (j < nb) {
      if (blocks.isNullAt(j)) sawNullBlock = true
      else {
        val b = blocks.getArray(j)
        val n = b.numElements()
        var linky = 0
        var stops = 0
        var i = 0
        while (i < n) {
          if (!b.isNullAt(i)) {
            val t = b.getUTF8String(i).toString
            if (isLinky(t)) linky += 1
            if (stopSet.contains(t)) stops += 1
          }
          i += 1
        }
        val short = n < 6
        // n >= 1 is the call-site contract (slice bounds); guard the
        // div anyway so a degenerate empty block is LINKY-false, not a
        // crash — matching `100 * 0 div 0` never arising in the HOF
        val link = n > 0 && (100L * linky) / n > 20L
        val nostop = stops == 0
        if (short) bShort += 1
        if (link) bLink += 1
        if (nostop) bNostop += 1
        if (!short && !link && !nostop) { bContent += 1; wKept += n }
        wAll += n
      }
      j += 1
    }
    InternalRow(nb.toLong, bShort, bLink, bNostop, bContent, wKept,
      if (sawNullBlock) null else wAll)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BlockAudit =
    copy(left = newLeft, right = newRight)
}
