package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and produces a sane result: the
  * oracle hash gate (Verify + DuckDB) checks exact values at sf0.01; this
  * suite guards the registration contract itself — every query has an
  * oracle twin, executes, and yields rows with non-empty schemas. */
class QueriesSmokeSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  // queries deliberately registered WITHOUT an oracle (driver does a
  // rows-only check). Empty since round 4: the sketch queries (q45, q51)
  // emit exact values + bounded-error booleans, so they oracle-check too.
  private val rowsOnlyQueries = Set.empty[String]

  test("every query has an oracle entry (minus declared rows-only sketches)") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyQueries
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle entry has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, "empty schema")
      assert(df.count() > 0, "no rows")
    }
  }

  test("entry (driver smoke contract) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q17 generates the full January minute grid") {
    assert(SparkEntry.queries("q17_timestamp_dim")(spark, sfDir).count() === 31L * 1440)
  }
}
