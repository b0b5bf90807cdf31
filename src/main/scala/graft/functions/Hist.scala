package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native fixed-bin histogram sketch: `graft_hist(bin, nbins)` — an
  * aggregate whose state is a flat `Array[Long]` of nbins counters,
  * returned as an `array<bigint>` of length nbins. Out-of-range bins
  * clamp to the edge counters (the aggregate is total over any long
  * input); nulls are skipped.
  *
  * WHY a custom aggregate (design-ladder tier b): the SQL-expressible
  * histogram shuffles one row per (group, TOUCHED bin) — state and
  * exchange volume proportional to bins × groups with per-row shuffle
  * overhead, and every downstream rank selection needs a window over
  * those rows. This aggregate carries the WHOLE histogram as one
  * fixed-width buffer per group: it partial-aggregates map-side
  * (ObjectHashAggregate plans a partial_graft_hist before the
  * exchange), `merge` is element-wise addition — the canonical
  * mergeable sketch, so per-shard histograms (per-day → per-month)
  * union without re-reading data — and the exchange ships exactly
  * |groups| buffers of 8·nbins bytes. Rank selection (quantiles) then
  * runs ROW-LOCALLY over the bounded array: zero windows, zero second
  * shuffle (q248's consumer).
  *
  * Determinism contract: integer counters under element-wise merge are
  * invariant to row order, partitioning, and merge order, so the
  * DuckDB oracle (per-bin GROUP BY counts) hash-matches exactly.
  *
  * Reference analog: the reference's only distribution readout is the
  * hourly COUNT histogram (`/root/reference/sql/aggregations.sql:16-22`);
  * this is the bounded-state generalization that serves exact-rank
  * quantiles at corpus scale.
  */
case class Hist(
    child: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && nExpr.dataType == IntegerType &&
        nExpr.foldable) {
      scala.util.Try(nExpr.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_hist nbins literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(n) =>
          if (n == null || n.asInstanceOf[Int] < 1 ||
              n.asInstanceOf[Int] > (1 << 20))
            TypeCheckResult.TypeCheckFailure(
              s"graft_hist nbins must be a literal in [1, 2^20], got $n")
          else TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_hist expects (bigint, int literal nbins), got (" +
        s"${child.dataType.simpleString}, ${nExpr.dataType.simpleString})")

  private lazy val nbins: Int = nExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_hist"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Long]
      val i = if (b < 0L) 0 else if (b >= nbins) nbins - 1 else b.toInt
      buf(i) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nbins) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf, nbins))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nbins)
    var i = 0
    while (i < nbins) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](nbins)
    var i = 0
    while (i < nbins) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Hist =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): Hist =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Hist =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
