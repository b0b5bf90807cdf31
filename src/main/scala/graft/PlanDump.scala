package graft

import java.nio.file.{Files, Paths}

/** Dev diagnostic for the optimization rounds: write each named query's
  * `.explain("formatted")` output to `<outDir>/<name>_<suffix>.txt` — the
  * before/after plan evidence the round's deliverables require. Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <name> [name...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (dir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val spark = GraftSession.getOrCreate()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
