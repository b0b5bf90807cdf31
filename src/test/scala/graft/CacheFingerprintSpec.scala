package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 cache-key discipline: every per-JVM staged-index cache keys
  * on graft.CorpusKey — a part-file-level fingerprint (max mtime + total
  * bytes + file count + sorted-name hash) — so an IN-SESSION fixture
  * regeneration can never serve stale staged state. The round-10 holes
  * this closes: fpIndexCache (q85) and Zorder.layouts keyed on the BARE
  * dir (any regen was invisible for the JVM lifetime), and the other
  * five caches keyed on the parquet DIRECTORY's own mtime:length, which
  * is 1-second-granular and size-blind. The name hash carries Spark's
  * per-job part-file UUIDs, so even a same-second, same-byte-count
  * rewrite misses. */
class CacheFingerprintSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("CorpusKey fails loudly on a missing source") {
    val e = intercept[IllegalArgumentException] {
      CorpusKey("/nonexistent_graft_dir", "documents.parquet")
    }
    assert(e.getMessage.contains("source missing"))
  }

  test("CorpusKey misses on a same-content rewrite (part-name UUIDs)") {
    val dir = Staging.fresh("ckey")
    spark.range(100).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val k1 = CorpusKey(dir, "t.parquet")
    // identical rows, identical layout, possibly the same mtime second
    // and the same byte count — only the embedded job UUID differs
    spark.range(100).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val k2 = CorpusKey(dir, "t.parquet")
    assert(k1 != k2, "a rewrite must change the fingerprint")
  }

  test("Zorder layout rebuilds after an in-session events regen") {
    val dir = Staging.fresh("ckzord")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val n1 = spark.read.parquet(etl.Zorder.layoutFor(spark, dir)).count()
    assert(n1 == ev.count())
    // regenerate with half the rows: a stale layout would keep serving n1
    ev.filter("event_id % 2 = 0")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val n2 = spark.read.parquet(etl.Zorder.layoutFor(spark, dir)).count()
    assert(n2 == ev.filter("event_id % 2 = 0").count() && n2 != n1,
      "the layout map must miss on the regenerated corpus, not serve stale")
  }

  test("q85 fingerprint index rebuilds after an in-session documents regen") {
    val dir = Staging.fresh("ckfp")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = SparkEntry.queries("q85_bucketed_dedup")(spark, dir).count()
    // drop half the corpus AND half the batch: verdicts must change
    docs.filter("doc_id % 2 = 0")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r2 = SparkEntry.queries("q85_bucketed_dedup")(spark, dir).count()
    val expected = docs.filter("doc_id % 2 = 0 and doc_id % 10 = 7").count()
    assert(r2 == expected && r2 != r1,
      "fpIndexCache must miss on the regenerated corpus, not serve stale")
  }
}
