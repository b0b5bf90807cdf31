package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{AnalyticsView, SetupDatabase, TransformJourneys, TransformWeather, Warehouse}

/** E1→E2→E3 pipeline parity (SURVEY.md §3, §7 phase 3): the full reference
  * lifecycle against the fixture tables, asserting schema contracts,
  * bootstrap overwrite/append semantics, and the J5 cardinality invariant. */
class EtlPipelineSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val warehouse =
    graft.Staging.fresh("etl_spec")

  test("E1 setup_database writes both dimensions") {
    SetupDatabase.run(spark, sfDir, warehouse)
    val ts = spark.read.parquet(s"$warehouse/dim_timestamp")
    assert(ts.count() === 31L * 1440)
    assert(ts.columns.toSet ===
      Set("id", "timestamp", "year", "month", "dayofmonth", "weekofyear",
          "hour", "minute", "day"))
    // surrogate key is unique
    assert(ts.select("id").distinct().count() === ts.count())
    val loc = spark.read.parquet(s"$warehouse/dim_locations")
    assert(loc.count() === Tables.nation(spark, sfDir).count())
    assert(loc.schema("lat").dataType.typeName === "decimal(8,6)")
    assert(loc.schema("long").dataType.typeName === "decimal(9,6)")
  }

  test("E2 transform_weather: composite key unique, bootstrap append doubles rows") {
    TransformWeather.run(spark, sfDir, warehouse, firstRun = true)
    val first = spark.read.parquet(s"$warehouse/dim_weather")
    val n = first.count()
    assert(n > 0)
    assert(first.select("id").distinct().count() === n)
    // append run (reference months after the first) adds rows instead of replacing
    TransformWeather.run(spark, sfDir, warehouse, firstRun = false)
    assert(spark.read.parquet(s"$warehouse/dim_weather").count() === 2 * n)
    // bootstrap re-run truncates back
    TransformWeather.run(spark, sfDir, warehouse, firstRun = true)
    assert(spark.read.parquet(s"$warehouse/dim_weather").count() === n)
  }

  test("E3 transform_journeys: weather annotation preserves fact cardinality") {
    val j = TransformJourneys.journeys(spark, sfDir)
    val nJourneys = j.count()
    val (nRental, nFact) = TransformJourneys.run(spark, sfDir, warehouse, firstRun = true)
    assert(nRental === nJourneys)
    assert(nFact === nJourneys) // J5 self-join re-merge must not duplicate or drop
    val fact = spark.read.parquet(s"$warehouse/fact_journey")
    assert(fact.columns.contains("start_weather_id"))
    assert(fact.columns.contains("end_weather_id"))
    // some journeys land on station/day combos with weather coverage
    assert(fact.filter(col("start_weather_id").isNotNull).count() > 0)
  }

  test("dynamic partition upsert replaces one slice, leaves the others byte-identical") {
    import spark.implicits._
    val path = graft.Staging.fresh("upsert") + "/t"
    val v1 = Seq(("2024-01", 1L), ("2024-01", 2L), ("2024-02", 3L), ("2024-03", 4L))
      .toDF("month", "id")
    Warehouse.writePartitioned(v1, "month", path, firstRun = true)
    // re-load February with corrected rows: only that partition changes
    val feb2 = Seq(("2024-02", 30L), ("2024-02", 31L)).toDF("month", "id")
    Warehouse.upsertPartitions(feb2, "month", path)
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getAs[String]("month"), r.getAs[Long]("id"))).toSet
    assert(after === Set(("2024-01", 1L), ("2024-01", 2L),
      ("2024-02", 30L), ("2024-02", 31L), ("2024-03", 4L)))
    // idempotence: the same upsert again changes nothing
    Warehouse.upsertPartitions(feb2, "month", path)
    assert(spark.read.parquet(path).count() === 5)
  }

  test("aggregation on the bucket key plans with no hash exchange") {
    // the bucketed layout satisfies the aggregation's distribution
    // requirement the same way it satisfies the join's — grouping by the
    // bucket column must not shuffle the fact table
    val s = spark
    val agg = graft.operators.EtlQueries.bucketedOrdersCustomer(s, sfDir)
      .groupBy("o_custkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
  }

  test("partition-pruned warehouse read returns only the requested slice") {
    val day = Warehouse.readPartition(spark, s"$warehouse/dim_timestamp", "day", "2024-01-15")
    assert(day.count() === 1440)
    // the predicate must reach the scan as a partition filter, not a
    // post-scan row filter — that is the S3 behavior this test pins
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-15"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("analytics view joins role-playing locations without changing cardinality") {
    val view = AnalyticsView.create(spark, warehouse)
    assert(view.count() === spark.read.parquet(s"$warehouse/fact_journey").count())
    assert(view.columns.contains("start_location_point"))
    assert(view.filter(col("start_location_name").isNotNull).count() > 0)
  }
}
