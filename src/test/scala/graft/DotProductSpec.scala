package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native graft_dot expression must be bit-identical to the
  * higher-order-function fold it replaces (the oracle hash gate depends on
  * the shared accumulation order). */
class DotProductSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val hofFold =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"

  test("graft_dot equals the HOF fold bit-for-bit on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1e3, 1e3))
    val pairs = Iterator.continually(
      for (a <- vecGen.sample; b <- vecGen.sample) yield (a, b)
    ).flatten.take(50).toSeq
    val df = pairs.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("native"), expr(hofFold).as("hof"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot is callable from plain SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))").first()
    assert(r.getDouble(0) === 32.0)
  }

  test("graft_dot length mismatch -> null, matching the HOF fold's null-poisoning") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d)), " +
        "aggregate(zip_with(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d), (x, y) -> x * y), " +
        "cast(0.0 as double), (acc, x) -> acc + x)").first()
    assert(r.isNullAt(0))
    assert(r.isNullAt(1)) // the documented-equivalent HOF form agrees
  }

  test("graft_dot null semantics: null array -> null, null element poisons -> null") {
    val r = spark.sql(
      "SELECT graft_dot(cast(null as array<double>), array(1.0d)), " +
        "graft_dot(array(1.0d, cast(null as double), 3.0d), array(2.0d, 5.0d, 4.0d)), " +
        "aggregate(zip_with(array(1.0d, cast(null as double), 3.0d), " +
        "array(2.0d, 5.0d, 4.0d), (x, y) -> x * y), " +
        "cast(0.0 as double), (acc, x) -> acc + x)").first()
    assert(r.isNullAt(0))
    assert(r.isNullAt(1), "a null element must poison the dot product")
    assert(r.isNullAt(2)) // the HOF fold agrees — the shared contract
  }

  test("codegen path survives a full query (q25 unchanged vs direct compute)") {
    val out = operators.SimilarityQueries.q25CosineTopk(spark, SparkTestSession.sfDir)
    assert(out.count() > 0)
  }
}
