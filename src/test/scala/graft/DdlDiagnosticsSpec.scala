package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Ddl

/** K4 typed empty tables and the §2.13 schema/null-profile diagnostic. */
class DdlDiagnosticsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("K4: typed empty table is created with the declared schema") {
    val loc = graft.Staging.fresh("ddl")
    Ddl.createEmptyTable(spark, "graft_fact_contract", Ddl.factJourneySchema, loc)
    val t = spark.table("graft_fact_contract")
    assert(t.count() === 0)
    assert(t.schema.fieldNames.toSeq === Ddl.factJourneySchema.fieldNames.toSeq)
    // idempotent recreate (the reference recreates tables each deploy)
    Ddl.createEmptyTable(spark, "graft_fact_contract", Ddl.rentalSchema, loc)
    assert(spark.table("graft_fact_contract").schema.fieldNames.toSeq ===
      Ddl.rentalSchema.fieldNames.toSeq)
    spark.sql("DROP TABLE IF EXISTS graft_fact_contract")
  }

  test("K4: REQUIRED mode is enforced at load time") {
    import spark.implicits._
    val good = Seq((1L, 10, Some(60)), (2L, 11, None))
      .toDF("id", "bike_id", "duration")
      .selectExpr("cast(id as bigint) id", "cast(bike_id as int) bike_id",
        "cast(duration as int) duration")
    // relax-then-pin nullability to match the declared contract
    val pinned = spark.createDataFrame(good.rdd, Ddl.rentalSchema)
    assert(Ddl.enforce(pinned, Ddl.rentalSchema).count() === 2)
    val withNullRequired = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(null, 10, 60))),
      org.apache.spark.sql.types.StructType(
        Ddl.rentalSchema.fields.map(_.copy(nullable = true))))
    val e = intercept[IllegalArgumentException] {
      Ddl.enforce(withNullRequired, Ddl.rentalSchema)
    }
    assert(e.getMessage.contains("REQUIRED"))
  }

  test("schema profile reports one row per column with null counts") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (2, None), (3, Some("c")))
      .toDF("id", "name")
    val prof = Diagnostics.schemaProfile(df).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(prof("id") === (("int", 0L, 3L)))
    assert(prof("name") === (("string", 1L, 3L)))
  }

  test("schema profile on a fixture table matches the q11 null counts") {
    val prof = Diagnostics.schemaProfile(Tables.orders(spark, sfDir))
    assert(prof.count() === Tables.orders(spark, sfDir).columns.length.toLong)
  }
}
