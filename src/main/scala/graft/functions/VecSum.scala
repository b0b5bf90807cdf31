package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native elementwise long-vector sum: `graft_vecsum(array<bigint>)` — an
  * aggregate that adds its input arrays component by component and
  * returns the `array<bigint>` of per-position sums. Null rows are
  * skipped; all non-null inputs in a group must share one length (a
  * ragged input raises, loudly — silent truncation would corrupt the
  * lattice).
  *
  * WHY a custom aggregate (the established design-ladder-tier-b ruling —
  * see [[Kmv]]): the SQL-expressible forms of "sum N positions across
  * rows" are (a) posexplode to N rows per input row and hash-aggregate on
  * the position key — every element pays a per-row hash probe and the
  * exchange carries rows × N tuples (q157's pre-round-15 shape: 2 000
  * vectors × 2 016 pair positions = 4 M rows through the aggregate), or
  * (b) N separate `sum(arr[i])` columns — an N-wide codegen blowup that
  * falls over for N in the thousands. This aggregate's state is ONE long
  * array of the input width, update is a straight componentwise add, it
  * partial-aggregates map-side (ObjectHashAggregate plans a
  * partial_graft_vecsum before the exchange), and merge is the same add —
  * so at 100 TB each executor ships one N-long vector per group instead
  * of rows × N exploded tuples.
  *
  * Determinism contract: long addition is associative and commutative and
  * overflow wraps identically regardless of order, so the result is
  * invariant under row order, partitioning, and merge order — exactly the
  * guarantee the exploded hash-aggregate form gives, which is what the
  * DuckDB oracles replay (callers keep their existing headroom analyses:
  * the lattice bounds that made the exploded sums exact make these exact).
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Null only for an all-null (or empty) group — sum-like semantics. */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_vecsum"

  /** Empty marker; the real buffer allocates lazily at the first non-null
    * input so the aggregate does not need the width at analysis time. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    if (buf.isEmpty) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getLong(i); i += 1 }
      fresh
    } else {
      require(buf.length == n,
        s"graft_vecsum: ragged input — saw lengths ${buf.length} and $n")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else {
      require(a.length == b.length,
        s"graft_vecsum: ragged merge — saw lengths ${a.length} and ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren(0))
}
