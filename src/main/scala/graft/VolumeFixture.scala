package graft

import org.apache.spark.sql.functions._

/** Dev tool: build the N× volume fixture the SCALE.md sweeps read —
  * documents/embeddings/events/customer from a source sf dir, each row
  * copied N times under shifted ids. Documents get a per-copy salt token
  * so the dedup structure SCALES (near-dup cliques of ~N) instead of
  * collapsing every copy family into one exact clique; customers get a
  * regenerated name for their new key so entity blocks scale the same
  * way; embeddings/events copy under shifted ids. Copy 0 is the original
  * row byte-for-byte. Usage:
  *
  *   sbt "runMain graft.VolumeFixture /root/testdata/sf0.1 /tmp/graft10x 10"
  */
object VolumeFixture {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft10x")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate()
    def copies = explode(expr(s"sequence(0, ${n - 1})")).as("cp")

    spark.read.parquet(s"$src/documents.parquet")
      .select(col("*"), copies)
      .select((col("doc_id") * n + col("cp")).as("doc_id"),
        expr("case when cp = 0 then text " +
          s"else concat(text, ' salt', cast(doc_id * $n + cp as string)) end").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("*"), copies)
      .select((col("vec_id") * n + col("cp")).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    spark.read.parquet(s"$src/events.parquet")
      .select(col("*"), copies)
      .select((col("event_id") * n + col("cp")).as("event_id"), col("ts"),
        (col("user_id") * n + col("cp")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    spark.read.parquet(s"$src/customer.parquet")
      .select(col("*"), copies)
      .select((col("c_custkey") * n + col("cp")).as("c_custkey"),
        expr(s"concat('Customer#', lpad(cast(c_custkey * $n + cp as string), 9, '0'))")
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // remaining TPC-H tables copy through unscaled: they exist so warmup
    // and incidental dim reads work; the volume sweep's subjects are the
    // four scaled tables above
    for (t <- Seq("region", "nation", "supplier", "part", "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    println(s"[volfix] wrote ${n}x fixture to $out")
    spark.stop()
  }
}
