package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native KMV sketch aggregate (functions/Kmv.scala, q101's engine):
  * differential equivalence against the linear-state SQL form it
  * replaces, merge-path invariance under repartitioning (the property
  * that makes per-shard sketches safe to union at 100 TB), the
  * under-filled-sketch edge, null skipping, and the estimate's error
  * envelope on a corpus large enough for the asymptotics to hold. */
class KmvSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val grouped = (0 until 5000)
    .map(i => ((i % 7).toString, (i.toLong * 2654435761L) % 100000L))
    .toDF("g", "h")

  test("graft_kmv equals the window-ranked k smallest distinct values") {
    val kmv = grouped.groupBy("g")
      .agg(expr("graft_kmv(h, 16)").as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    val expected = grouped.select("g", "h").distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= 16)
      .groupBy("g").agg(sort_array(collect_list("h")).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(kmv === expected)
    assert(kmv.values.forall(_.length == 16))
  }

  test("result is invariant under partitioning (merge path)") {
    def run(parts: Int): Map[String, Seq[Long]] =
      grouped.repartition(parts).groupBy("g")
        .agg(expr("graft_kmv(h, 16)").as("ks"))
        .as[(String, Seq[Long])].collect().toMap
    assert(run(1) === run(32))
  }

  test("a group with fewer than k distinct values returns them all, sorted") {
    val small = Seq(("a", 5L), ("a", 3L), ("a", 5L), ("a", 9L))
      .toDF("g", "h")
    val out = small.groupBy("g").agg(expr("graft_kmv(h, 16)").as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") === Seq(3L, 5L, 9L))
  }

  test("null inputs are skipped (count-distinct semantics)") {
    val withNulls = Seq(("a", Some(4L)), ("a", None), ("a", Some(2L)))
      .toDF("g", "h")
    val out = withNulls.groupBy("g").agg(expr("graft_kmv(h, 8)").as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") === Seq(2L, 4L))
  }

  test("rejects a non-literal or invalid k with a clean analysis error") {
    val e = intercept[Exception] {
      grouped.groupBy("g").agg(expr("graft_kmv(h, 0)")).collect()
    }
    assert(e.getMessage.contains("graft_kmv"))
  }

  test("estimate is inside the error envelope on 20k distinct values") {
    // q101's exact construction: 32-bit hash from the md5 hex prefix;
    // KMV relative stderr is ~1/sqrt(k-2) ~= 18% at k=32 — the
    // deterministic fixture must land well inside 3 sigma
    val k = 32
    val n = 20000
    val est = spark.range(n.toLong).toDF("v")
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(v as string)), 1, 8), 16, 10) as bigint)"))
      .agg(expr(s"graft_kmv(h, $k)").as("ks"))
      .select(expr(s"(${k - 1}.0 * 4294967296.0) / cast(element_at(ks, $k) as double)"))
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.54, s"estimate $est too far from $n")
  }
}
