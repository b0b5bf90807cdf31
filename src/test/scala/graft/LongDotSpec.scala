package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft_ldot must match the HOF fold it replaces (exact long lattice)
  * including its null-poisoning, and graft_pairprods must match the
  * nested-transform flatten in value AND order. */
class LongDotSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"

  test("graft_ldot equals the HOF fold on random long vectors") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 40).map { _ =>
      val a = Seq.fill(64)(rnd.nextInt(20001) - 10000L)
      val b = Seq.fill(64)(rnd.nextInt(20001) - 10000L)
      (a, b)
    }
    import spark.implicits._
    val df = rows.toDF("a", "b").selectExpr(s"graft_ldot(a, b) AS n", s"$hof AS h")
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_ldot(q, q) equals the self-dot HOF fold (int8Ranked's qn2)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40).map(_ => Tuple1(Seq.fill(64)(rnd.nextInt(255) - 127L)))
    import spark.implicits._
    val df = rows.toDF("q").selectExpr(
      "graft_ldot(q, q) AS n",
      "aggregate(q, 0L, (a, x) -> a + x * x) AS h")
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_ldot null semantics: null array, null element, length mismatch") {
    val r = spark.sql(
      "SELECT graft_ldot(CAST(NULL AS ARRAY<BIGINT>), array(1L)), " +
        "graft_ldot(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L)), " +
        "graft_ldot(array(1L, 2L), array(1L, 2L, 3L))").first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("graft_pairprods equals the nested-transform flatten, same order") {
    val r = spark.sql(
      "SELECT graft_pairprods(a), " +
        "flatten(transform(sequence(1, 3), i -> " +
        "  transform(sequence(i + 1, 4), j -> a[i-1] * a[j-1]))) " +
        "FROM VALUES (array(2L, 3L, 5L, 7L)) AS t(a)").first()
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    assert(r.getSeq[Long](0) === Seq(6L, 10L, 14L, 15L, 21L, 35L))
  }

  test("graft_pairprods null semantics and degenerate sizes") {
    val r = spark.sql(
      "SELECT graft_pairprods(CAST(NULL AS ARRAY<BIGINT>)), " +
        "graft_pairprods(array(1L, CAST(NULL AS BIGINT))), " +
        "size(graft_pairprods(array(5L))), " +
        "size(graft_pairprods(CAST(array() AS ARRAY<BIGINT>)))").first()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) === 0 && r.getInt(3) === 0)
  }
}
