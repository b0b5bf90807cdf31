package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded-state TOP-K aggregate:
  * `graft_topk(sort_key, payload, k)` keeps the k smallest
  * (sort_key, payload) pairs seen in the group — both `bigint`, ordered
  * lexicographically so equal keys tie-break on the payload — and
  * returns them as a sorted `array<struct<k: bigint, v: bigint>>`.
  * Descending top-k is the caller negating the key (exact for bigint).
  *
  * WHY a custom aggregate (design-ladder tier b): the library already
  * owns two top-k-per-group forms — the window row_number filter (state
  * linear in the group: every row shuffles, then sorts) and q170's
  * two-phase pigeonhole (lossless, but two window passes). This
  * aggregate is the third point in that design space: state is a
  * bounded TreeSet of at most k pairs, it partial-aggregates map-side
  * (Spark plans ObjectHashAggregate with a partial_graft_topk before
  * the exchange), and `merge` is union-then-truncate — so at 100 TB
  * each executor ships k pairs per group instead of the group's rows,
  * and no per-group sort ever materializes. The exchange carries
  * |groups| × k fixed-width values: for small k this is the optimal
  * shuffle volume for the question.
  *
  * Determinism contract: the result is the set of k lexicographically
  * smallest distinct (key, payload) pairs — invariant under row order,
  * partitioning, and merge order (TopkSpec shuffles the input and
  * re-checks). Callers pass a unique payload (an id) so set semantics
  * equal row semantics; null keys/payloads are skipped. The DuckDB
  * oracle is the window-ranked form — both engines express the same
  * total (key, payload) order.
  *
  * Reference analog: the reference's top-k is `ORDER BY ... LIMIT`
  * after a full aggregate (`/root/reference/sql/aggregations.sql:1-12`);
  * this is the bounded-state per-group generalization.
  */
case class Topk(
    keyExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType == LongType && payloadExpr.dataType == LongType &&
        kExpr.dataType == IntegerType && kExpr.foldable) {
      scala.util.Try(kExpr.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_topk k literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(k) =>
          if (k == null || k.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"graft_topk k must be a literal >= 1, got $k")
          else TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_topk expects (bigint key, bigint payload, int literal k), got (" +
        s"${keyExpr.dataType.simpleString}, ${payloadExpr.dataType.simpleString}, " +
        s"${kExpr.dataType.simpleString})")

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null)
      insert(buf, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: java.util.TreeSet[(Long, Long)],
      b: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** Insert keeping only the k smallest pairs: when full, a pair past
    * the current kth is rejected with one O(log k) probe — the common
    * case at scale — and an accepted pair evicts the largest. */
  private def insert(buf: java.util.TreeSet[(Long, Long)],
                     p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (ord.lt(p, buf.last())) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[(Long, Long)](ord)
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Topk =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): Topk =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Topk =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1),
      kExpr = newChildren(2))
}
