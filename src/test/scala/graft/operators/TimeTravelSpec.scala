package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark
import graft.etl.Warehouse

/** The versioned-snapshot log's filesystem half (q323/q324/q325's spec):
  * copy-on-write retention of replaced files, changed-file-granularity
  * CDF cancellation, the vacuum/time-travel retention interplay (a file a
  * retained snapshot references is NOT an orphan), expire-then-reclaim,
  * and the emptiedDirs contract for all-rows-deleted partitions. */
class TimeTravelSpec extends AnyFunSuite {

  private val dayMs = 24L * 3600 * 1000

  /** Two-partition lake: pa has ids 1-4, pb has ids 11-14. */
  private def buildLake(): String = {
    import spark.implicits._
    val path = graft.Staging.fresh("ttspec")
    val df = Seq((1L, "pa", 10L), (2L, "pa", 20L), (3L, "pa", 30L), (4L, "pa", 40L),
      (11L, "pb", 10L), (12L, "pb", 20L), (13L, "pb", 30L), (14L, "pb", 40L))
      .toDF("id", "part", "v")
    Warehouse.writePartitioned(df, "part", path, firstRun = true)
    path
  }

  private def schemaOf(path: String) =
    Some(spark.read.parquet(path).schema)

  private def fileBytes(path: String, rel: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path, rel))

  test("copy-on-write rewrite keeps every retained version byte-readable") {
    val path = buildLake()
    val sc = schemaOf(path)
    val v1 = Warehouse.commitSnapshotFromListing(path)
    assert(v1 == 1)
    val v1Rows = Warehouse.readSnapshot(spark, path, v1, sc)
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // rewrite ONLY pa: drop id=2
    val survivors = Warehouse.readSnapshot(spark, path, v1, sc)
      .filter(col("part") === "pa" && col("id") =!= 2L)
    val v2 = Warehouse.rewritePartitionsLogged(survivors, "part", path)
    assert(v2 == 2)
    // v1 still reads WHOLE after the rewrite — the old pa files exist
    val v1Again = Warehouse.readSnapshot(spark, path, v1, sc)
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v1Again == v1Rows, "time travel: v1 must be unchanged by the rewrite")
    // head = survivors ∪ untouched pb
    val headIds = Warehouse.readManifested(spark, path, sc)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(headIds == Set(1L, 3L, 4L, 11L, 12L, 13L, 14L))
    // the untouched partition's files are the SAME entries in both
    // manifests (not rewritten copies)
    val f1 = Warehouse.snapshotFiles(path, v1).filter(_.startsWith("part=pb/"))
    val f2 = Warehouse.snapshotFiles(path, v2).filter(_.startsWith("part=pb/"))
    assert(f1 == f2 && f1.nonEmpty, "untouched partition files carried, not copied")
    // the replaced pa files are on disk though absent from the head
    val paV1 = Warehouse.snapshotFiles(path, v1).filter(_.startsWith("part=pa/"))
    val paV2 = Warehouse.snapshotFiles(path, v2).filter(_.startsWith("part=pa/")).toSet
    assert(paV1.nonEmpty && paV1.forall(!paV2.contains(_)))
    paV1.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, f)),
      s"replaced file $f must remain on disk while v1 is retained"))
    // head pointer equals the newest log entry
    assert(Warehouse.manifestedFiles(path) == Warehouse.snapshotFiles(path, v2))
    assert(Warehouse.snapshotVersions(path) == Seq(1, 2))
  }

  test("CDF reads only changed files and cancels untouched survivors") {
    val path = buildLake()
    val sc = schemaOf(path)
    val v1 = Warehouse.commitSnapshotFromListing(path)
    // delete id=2, edit id=3 (v 30→31), pa only; pb untouched
    val next = Warehouse.readSnapshot(spark, path, v1, sc)
      .filter(col("part") === "pa" && col("id") =!= 2L)
      .withColumn("v", when(col("id") === 3L, lit(31L)).otherwise(col("v")))
    val v2 = Warehouse.rewritePartitionsLogged(next, "part", path)
    val feed = Warehouse.snapshotChanges(spark, path, v1, v2, sc)
      .select("change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // survivors 1 and 4 appear in both sides and CANCEL; the edit is a
    // delete+insert pair; pb never read (its files are in both manifests)
    assert(feed == Set(("delete", 2L, 20L), ("delete", 3L, 30L), ("insert", 3L, 31L)))
  }

  test("vacuum spares files referenced by a retained snapshot, reclaims them after expiry") {
    val path = buildLake()
    val sc = schemaOf(path)
    val v1 = Warehouse.commitSnapshotFromListing(path)
    val survivors = Warehouse.readSnapshot(spark, path, v1, sc)
      .filter(col("part") === "pa" && col("id") =!= 2L)
    val v2 = Warehouse.rewritePartitionsLogged(survivors, "part", path)
    val paV1 = Warehouse.snapshotFiles(path, v1).filter(_.startsWith("part=pa/"))
    val headFiles = Warehouse.snapshotFiles(path, v2)
    val headBytes = headFiles.map(f => f -> fileBytes(path, f).toSeq).toMap
    val aged = System.currentTimeMillis() + 48L * dayMs
    // v1 retained: its exclusive files are NOT orphans — nothing to sweep
    // even with the clock far ahead
    val r1 = Warehouse.vacuum(path, retentionMs = dayMs, nowMs = aged)
    assert(r1.isEmpty, "retained-snapshot files must not be examined as orphans")
    paV1.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, f))))
    // expire v1 → its exclusive files become reclaimable orphans
    assert(Warehouse.expireSnapshots(path, keepLast = 1) == Seq(v1))
    assert(Warehouse.snapshotVersions(path) == Seq(v2))
    val r2 = Warehouse.vacuum(path, retentionMs = dayMs, nowMs = aged)
    assert(r2.nonEmpty && r2.forall(_._3), "expired-version files all swept")
    assert(r2.map(t => s"${t._1}/${t._2}").toSet == paV1.toSet)
    paV1.foreach(f => assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(path, f)),
      s"expired file $f must be reclaimed"))
    // head files byte-identical through expire+vacuum; v1 unreadable; a
    // second sweep finds nothing
    headFiles.foreach(f =>
      assert(fileBytes(path, f).toSeq == headBytes(f), s"live file $f touched"))
    intercept[IllegalArgumentException] {
      Warehouse.readSnapshot(spark, path, v1, sc)
    }
    assert(Warehouse.vacuum(path, retentionMs = dayMs, nowMs = aged).isEmpty)
  }

  test("an all-rows-deleted partition needs emptiedDirs to leave the manifest") {
    val path = buildLake()
    val sc = schemaOf(path)
    val v1 = Warehouse.commitSnapshotFromListing(path)
    // takedown of ALL of pb: the survivor frame carries no pb rows, so the
    // rewrite writes no pb files and cannot infer pb was touched
    val survivors = Warehouse.readSnapshot(spark, path, v1, sc)
      .filter(col("part") === "pa")
    val v2 = Warehouse.rewritePartitionsLogged(survivors, "part", path)
    assert(Warehouse.readManifested(spark, path, sc)
        .filter(col("part") === "pb").count() == 4,
      "without emptiedDirs the emptied partition's old files stay live")
    val v3 = Warehouse.rewritePartitionsLogged(
      Warehouse.readSnapshot(spark, path, v2, sc).filter(col("part") === "pa"),
      "part", path, emptiedDirs = Seq("part=pb"))
    assert(Warehouse.readManifested(spark, path, sc)
      .filter(col("part") === "pb").count() == 0)
    // and time travel still reaches the pre-delete state
    assert(Warehouse.readSnapshot(spark, path, v1, sc).count() == 8)
    assert(v3 == 3)
  }
}
