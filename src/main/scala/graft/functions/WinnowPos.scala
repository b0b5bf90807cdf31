package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** [[Winnow]] with POSITIONS — the posting form a substring-run index
  * needs: `graft_winnow_pos(text, gram, window)` → the DISTINCT
  * (window-minimum md5 hash, 1-based gram position of its LEFTMOST
  * in-window occurrence) pairs, in first-appearance order — exactly
  * `array_distinct(transform(sequence(1, size(h)-window+1), j ->
  * struct(array_min(slice(h, j, window)),
  * j + array_position(slice(h, j, window), array_min(...)) - 1)))` over
  * the same gram-hash array `h` as [[Winnow]]. The q97 DuckDB oracle
  * re-derives the identical pairs with list_min/list_position, so the
  * selection is cross-checked by an independent implementation.
  *
  * Why native: the HOF form pays TWO interpreted slice+min evaluations
  * plus an array_position per window (measured ~19 s at sf0.1 for the
  * substring-run postings — and left as chained projections the
  * optimizer inlines the md5 transform into the selection lambda, which
  * turns the hash pass O(|text|^2)). This walks the text once, md5s each
  * gram once, and keeps the leftmost rolling minimum with the same
  * monotonic deque as [[Winnow]] — strictly-greater pops keep the
  * EARLIEST index of equal minima at the front, which is precisely
  * array_position's first-occurrence contract.
  */
case class WinnowPos(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType && second.foldable && third.foldable) {
      scala.util.Try((second.eval(), third.eval())) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_winnow_pos gram/window literals failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success((g, w)) =>
          if (g == null || w == null ||
              g.asInstanceOf[Int] < 1 || w.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"graft_winnow_pos gram and window must be >= 1, got ($g, $w)")
          else TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_winnow_pos expects (string, int literal gram, int literal window), got (" +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("print", StringType, nullable = false),
                   StructField("pos", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_winnow_pos"

  override def nullSafeEval(text: Any, gram: Any, window: Any): Any =
    WinnowPos.winnowPos(text.asInstanceOf[UTF8String],
      gram.asInstanceOf[Int], window.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, g, w) => {
      s"${ev.value} = graft.functions.WinnowPos.winnowPos($t, $g, $w);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowPos =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowPos {

  /** Static entry point shared by eval and generated code. Mirrors
    * [[Winnow.winnow]]; the deque's strict-greater pop keeps the leftmost
    * equal minimum at the front, so the emitted position is the window's
    * FIRST occurrence of its minimum hash. */
  def winnowPos(text: UTF8String, gram: Int, window: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var cp = 0
    var off = 0
    val offsets = new Array[Int](nBytes + 1)
    while (off < nBytes) {
      offsets(cp) = off
      val b = bytes(off) & 0xff
      off += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      cp += 1
    }
    offsets(cp) = nBytes
    val nGrams = cp - gram + 1
    if (nGrams < window) return new GenericArrayData(Array.empty[Any])
    val digest = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      digest.reset()
      digest.update(bytes, offsets(i), offsets(i + gram) - offsets(i))
      h(i) = hexString(digest.digest())
      i += 1
    }
    // LinkedHashSet of (hash, 1-based pos) keeps first-appearance order,
    // matching array_distinct over the HOF's struct stream
    val selected = new java.util.LinkedHashSet[(String, Int)]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      while (tail > head && h(deque(tail - 1)).compareTo(h(i)) > 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - window) head += 1
      if (i >= window - 1) selected.add((h(deque(head)), deque(head) + 1))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) {
      val (hash, pos) = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(hash), pos.toLong)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hexString(digest: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(digest(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
