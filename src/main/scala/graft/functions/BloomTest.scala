package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter membership test over an md5 hex fingerprint:
  * `graft_bloom_test(g, bits)` — true iff all 3 of `g`'s Bloom positions
  * are set in the packed bit array `bits`.
  *
  * Position family (must match the filter BUILD side and the DuckDB
  * oracle digit for digit): position i (i in 0..2) is the i-th disjoint
  * 8-hex-char window of `g` parsed as an unsigned 32-bit value, mod
  * 2^20. `bits` packs the 2^20 filter bits 32-per-BIGINT in the low
  * half of each word (word w = positions 32w..32w+31), the layout the
  * build side's `bit_or(shiftleft(1L, p % 32))` aggregate produces and
  * the one DuckDB can replay with checked shifts.
  *
  * WHY a custom scalar (design-ladder tier b): the SQL form of this
  * test needs the 128 KB word array ON each row — either a single-row
  * BroadcastNestedLoopJoin materializing the array per shingle row, or
  * a 200 KB literal in the plan text — and evaluates
  * `conv(substring(g,…),16,10)` per window via string machinery. Here
  * the bits arrive once as a FOLDABLE literal (driver-collected,
  * bounded by filter sizing at 128 KB regardless of corpus size —
  * the bounded-premise-scalar idiom, see q150/q208), are unpacked to a
  * plain `long[]` once per task, and each row runs a branch-free
  * nibble loop over the UTF8String's bytes — no substring allocation,
  * no radix parse, no join. At 100 TB this is the textbook Bloom
  * decontamination probe: a codegen'd scalar predicate on the corpus
  * scan, so only candidate survivors ever reach an exchange.
  *
  * Null semantics: null `g` -> null (unknown membership), the same as
  * the SQL form's null-propagating arithmetic. A `g` shorter than 24
  * hex chars (impossible for md5 output) -> false, never an error.
  *
  * Reference analog: the reference's contamination checks are exact
  * joins in BigQuery (`/root/reference/sql/aggregations.sql`); this is
  * the bounded-memory candidate generator in front of that exact join.
  */
case class BloomTest(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okBits = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (left.dataType == StringType && okBits && right.foldable) {
      scala.util.Try(right.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_bloom_test bits literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(null) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_bloom_test bits must be a non-null literal array")
        case scala.util.Success(_) => TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_bloom_test expects (string, foldable array<bigint>), got (" +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_bloom_test"

  /** Unpacked once per task (after deserialization); 128 KB for the
    * 2^20-bit filter — independent of data volume by construction. */
  @transient private lazy val bits: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(g: Any, bitsIgnored: Any): Any =
    BloomTest.test(g.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, (g, _) =>
      s"${ev.value} = graft.functions.BloomTest.test($g, $bitsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomTest =
    copy(left = newLeft, right = newRight)
}

object BloomTest {

  /** Number of filter bits — a power of two so the 32-bit-window mod is
    * exactly uniform; 2^20 sizes the filter to <= 0.5% FP at the
    * bounded bench-side cardinality (see DedupQueries q207 scaladoc). */
  val BloomBits: Long = 1048576L

  /** The 3-window test, shared by interpreted eval and generated code.
    * Lowercase-hex nibble Horner over the UTF8String's bytes — byte
    * access only, no substring, no allocation. */
  def test(g: UTF8String, bits: Array[Long]): Boolean = {
    if (g.numBytes() < 24) return false
    var w = 0
    while (w < 3) {
      var v = 0L
      var i = 8 * w
      val end = i + 8
      while (i < end) {
        val c = g.getByte(i)
        val d = if (c <= '9') c - '0' else c - 'a' + 10
        v = (v << 4) | d
        i += 1
      }
      val p = (v % BloomBits).toInt
      if ((bits(p >>> 5) & (1L << (p & 31))) == 0L) return false
      w += 1
    }
    true
  }
}
