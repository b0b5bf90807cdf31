package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native KMV (k-minimum-values) distinct-count sketch:
  * `graft_kmv(hash_col, k)` — an aggregate that keeps the k SMALLEST
  * distinct long hash values seen in the group and returns them as a
  * sorted `array<bigint>`. The caller derives the distinct-count estimate
  * `(k-1) * 2^32 / kth_value` (for 32-bit hashes); when fewer than k
  * distinct values exist the sketch holds all of them and the exact
  * distinct-hash count is `size(result)`.
  *
  * WHY a custom aggregate (design-ladder tier b): the SQL-expressible
  * k-smallest-per-group needs a per-group sort of EVERY distinct hash
  * (window + row_number), i.e. state linear in the group's cardinality —
  * the exact cost a sketch exists to avoid. This aggregate's state is a
  * bounded TreeSet of at most k longs, it deduplicates on insert, it
  * partial-aggregates map-side (Spark plans it as ObjectHashAggregate
  * with a partial_graft_kmv before the exchange), and `merge` is the
  * standard mergeable-sketch union-then-truncate — so at 100 TB each
  * executor ships k longs per group instead of its full distinct set,
  * and sketches for disjoint shards can be unioned later without
  * re-reading data (the property every production sketch pipeline —
  * per-day sketches rolled into per-month — depends on).
  *
  * Determinism contract: the result is the set of k smallest distinct
  * inputs — invariant under row order, partitioning, and merge order —
  * so the DuckDB oracle (window-ranked k smallest) hash-matches exactly.
  * Null inputs are skipped (count-distinct semantics ignore null).
  *
  * Reference analog: the reference's only cardinality profiling is exact
  * `COUNT(DISTINCT ...)` in BigQuery (`/root/reference/sql/
  * aggregations.sql`); this is the bounded-state form of the same
  * question at corpus scale.
  */
case class Kmv(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && kExpr.dataType == IntegerType &&
        kExpr.foldable) {
      // validate the literal at analysis time; a foldable expression may
      // still throw on eval (ANSI cast failure) — surface that as a clean
      // typecheck failure, not a raw exception from the analyzer
      scala.util.Try(kExpr.eval()) match {
        case scala.util.Failure(e) =>
          TypeCheckResult.TypeCheckFailure(
            "graft_kmv k literal failed to evaluate: " +
              Option(e.getMessage).getOrElse(e.getClass.getName))
        case scala.util.Success(k) =>
          if (k == null || k.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"graft_kmv k must be a literal >= 1, got $k")
          else TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_kmv expects (bigint, int literal k), got (" +
        s"${child.dataType.simpleString}, ${kExpr.dataType.simpleString})")

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** Insert keeping only the k smallest: skip values already above the
    * current kth when the sketch is full (the common case at scale —
    * O(log k) membership probe, no churn). */
  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Kmv =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): Kmv =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Kmv =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
