package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.BinaryPipeline
import graft.sources.{Station, XmlStations}

/** Source-adapter tests: XML station feed round-trip (S7) and the
  * multimodal binary batch-decode plumbing. */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("XML render/parse round-trips stations, including escaped names") {
    val stations = Seq(
      Station(1, "Hyde Park Corner", "T1"),
      Station(2, "A & B <Station>", "T2"),
      Station(3, "", "T3"))
    assert(XmlStations.parse(XmlStations.render(stations)) === stations)
  }

  test("XML round-trip property: arbitrary printable names survive") {
    val nameGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('&', '<', '>', ' ')))
      .map(_.mkString)
    val names = Iterator.continually(nameGen.sample).flatten.take(100)
    names.foreach { name =>
      val st = Seq(Station(7, name, "T7"))
      assert(XmlStations.parse(XmlStations.render(st)) === st, s"name=$name")
    }
  }

  test("binary pipeline decodes every row with a correct checksum") {
    val media = BinaryPipeline.mediaFromDocuments(spark, sfDir)
    val decoded = BinaryPipeline.decode(media).collect()
    assert(decoded.length === Tables.documents(spark, sfDir).count())
    val one = media.filter(_.doc_id == decoded.head.doc_id).head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(one.payload).map("%02x".format(_)).mkString
    assert(decoded.head.checksum === expected)
    assert(decoded.head.n_bytes === one.payload.length)
  }

  test("stateful streaming sessionizer matches the batch gaps-and-islands twin") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = streaming.Sessionize.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    // expected: batch sessions minus each user's final (still-open) session
    val batch = operators.RelationalQueries.q39Sessionize(spark, sfDir)
    val w = Window.partitionBy("user_id")
    val expected = batch
      .withColumn("max_idx", max(col("session_idx")).over(w))
      .filter(col("session_idx") < col("max_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    assert(streamed === expected)
    assert(expected.nonEmpty, "fixture should contain at least one closed session")
  }

  test("streaming hourly counts equal the batch aggregate's finalized windows") {
    import org.apache.spark.sql.functions._
    val streamed = streaming.StreamingQueries.q36StreamingHourly(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // append mode emits only windows finalized by the final watermark
    // (max ts − 1 h): window end ≤ watermark ⇔ hour + 2 h ≤ max(ts)
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("hr") + expr("INTERVAL 2 HOURS") <=
        Tables.events(spark, sfDir).agg(max("ts")).head().getTimestamp(0))
      .select(date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("h"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty, "finalized-window set should be non-empty")
  }
}
