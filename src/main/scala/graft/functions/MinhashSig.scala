package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row minhash signature over a shingle array:
  * `graft_minhashsig(shingles, n)` → `array<string>` of n 5-hex-char
  * slots, slot i = MIN over the DISTINCT shingles of
  * `substring(concat(md5(x), md5(concat('x', x))), i*5 + 1, 5)` — the
  * q22 signature family's dual-md5 window construction, computed in one
  * compiled loop per row instead of explode → 12 min-aggregates (the
  * batch discipline) or n interpreted HOF folds (the row-local form the
  * q304 scaladoc measured at ~5 s).
  *
  * Exact equivalence to the explode+min form (MinhashSigSpec pins it):
  * distinct-before-hash changes nothing (min over a set equals min over
  * the multiset), null shingles hash to null and drop from every min
  * (the aggregate's null rule), and hex comparison is byte-wise either
  * way. A row whose array holds NO non-null shingle returns all-null
  * slots — callers that must mirror the explode form's row-vanishing
  * semantics keep their `size(toks) >= k` guard, as every q22-family
  * site already does.
  *
  * Design-ladder tier b ([[DotProduct]]): CodegenFallback — the win is
  * the compiled hash loop (one MessageDigest reused across the row's
  * shingles, no per-shingle row materialization, no partial-agg
  * machinery), not whole-stage fusion.
  */
case class MinhashSig(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      scala.util.Try(right.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_minhashsig n literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(nv) =>
          val bad = nv == null || nv.asInstanceOf[Int] < 1 ||
            nv.asInstanceOf[Int] * 5 > 64
          if (bad) TypeCheckResult.TypeCheckFailure(
            s"graft_minhashsig n must be in [1, 12] (5-char windows of a " +
              s"64-char dual md5), got $nv")
          else TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_minhashsig expects (array<string>, foldable int), got " +
        s"(${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_minhashsig"

  @transient private lazy val n = right.eval().asInstanceOf[Int]

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hexInto(bytes: Array[Byte], out: Array[Char], off: Int): Unit = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(off + 2 * i) = hexDigits(b >>> 4)
      out(off + 2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
  }

  override def nullSafeEval(arrAny: Any, nAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    // fresh per row: expression instances are shared across tasks, so a
    // cached MessageDigest would race; one instance amortizes over the
    // row's shingles, which is where the work is
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val h = new Array[Char](64)
    val mins = new Array[Array[Char]](n)
    var j = 0
    val total = arr.numElements()
    while (j < total) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j).toString
        if (seen.add(s)) {
          hexInto(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), h, 0)
          hexInto(md.digest(("x" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8)), h, 32)
          var i = 0
          while (i < n) {
            val off = i * 5
            val cur = mins(i)
            var smaller = cur == null
            if (!smaller) {
              var p = 0
              var cmp = 0
              while (p < 5 && cmp == 0) {
                cmp = h(off + p) - cur(p)
                p += 1
              }
              smaller = cmp < 0
            }
            if (smaller) {
              val w = new Array[Char](5)
              System.arraycopy(h, off, w, 0, 5)
              mins(i) = w
            }
            i += 1
          }
        }
      }
      j += 1
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (mins(i) == null) null
        else UTF8String.fromString(new String(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSig =
    copy(left = newLeft, right = newRight)
}
