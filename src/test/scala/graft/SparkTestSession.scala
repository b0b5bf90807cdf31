package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Spark sessions are expensive;
  * ScalaTest suites run sequentially in the forked JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.getOrCreate("4")
  val sfDir = "/root/testdata/sf0.001"
}
