package graft

/** Content fingerprint for per-JVM cache keys over staged corpus
  * artifacts (trained codebooks, propagated labels, bucketed layouts).
  *
  * Every staged index in the engine is a deterministic function of one
  * source table, so "have I already built this?" reduces to "is the
  * source bit-identical to what I built from?". The pre-round-11 keys
  * answered that with `File(path).lastModified:length`, which has two
  * holes the round-10 advice called out:
  *   - a MISSING path fingerprints as the constant `0:0` instead of
  *     failing, so a typo'd dir would happily share one cache slot;
  *   - a Spark-written parquet DIRECTORY's own mtime has 1-second
  *     granularity (and `length` is meaningless for a directory), so an
  *     in-session fixture regeneration could silently serve stale
  *     staged state.
  * This helper walks the PART FILES instead: max mtime + total bytes +
  * file count + an MD5 digest of the sorted RELATIVE paths. Spark
  * embeds a fresh job UUID in every part-file name, so any rewrite —
  * even one landing in the same second with identical sizes — changes
  * the path digest and misses the cache; relative paths (not bare
  * basenames) keep nested directories with coincidentally equal file
  * names distinct, and a real digest removes the 32-bit
  * `String.hashCode` collision surface a cache-identity key should not
  * carry. CacheFingerprintSpec proves the regen-miss for each cached
  * family.
  *
  * Every staged per-JVM cache keys through here (the dedup/similarity
  * codebook, label, pair, and fingerprint-index caches, the Z-order
  * layout map, the quality-filter feature stage, and the streaming
  * schema-probe cache); callers append their own geometry suffixes
  * (sample mod, sub-vector count) after the key.
  *
  * The walk goes through the Hadoop FileSystem API (resolved from the
  * active session's Hadoop conf when one exists), so the SAME
  * fingerprint discipline — and therefore the whole staging/reattach
  * economics — carries to HDFS or object storage unchanged: a
  * `LocatedFileStatus` exposes the same mtime/length/path fields the
  * earlier `java.io.File` walk read, and on local FS the two walks
  * produce identical keys over the CONTENT files (CacheFingerprintSpec
  * pins this parity; Hadoop's ChecksumFileSystem hides its own `.crc`
  * shadow files, local-FS artifacts the fingerprint is better off
  * without). Object-store caveat that does NOT break the key: S3-style
  * stores have no directories, so the recursive listing already sees
  * exactly the part objects.
  */
object CorpusKey {

  private def fsAndPath(dir: String, table: String) = {
    val root = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir), table)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    (root.getFileSystem(conf), root)
  }

  /** Typed existence probe for callers that treat an absent source as a
    * VALID state (Layouts.sourceFingerprint's optional tables) — the
    * alternative is classifying apply()'s failure by message text, a
    * string coupling that breaks on any reword. */
  def exists(dir: String, table: String): Boolean = {
    val (fs, root) = fsAndPath(dir, table)
    fs.exists(root)
  }

  /** Fingerprint `dir/table` (a file or a parquet directory). Fails
    * loudly when the path does not exist — a cache keyed on a missing
    * source is always a bug at the call site. */
  def apply(dir: String, table: String): String = {
    val (fs, root) = fsAndPath(dir, table)
    require(fs.exists(root), s"CorpusKey: source missing: $root")
    // scheme-free root prefix, so the key text (and thus every cache
    // slot) is identical whether the path arrives as /x/y or file:/x/y
    val rootStr = fs.makeQualified(root).toUri.getPath
    var maxMtime = 0L
    var bytes = 0L
    val rels = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true) // recursive; yields FILES only
    while (it.hasNext) {
      val st = it.next()
      maxMtime = math.max(maxMtime, st.getModificationTime)
      bytes += st.getLen
      rels += st.getPath.toUri.getPath.stripPrefix(rootStr).stripPrefix("/")
    }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(rels.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"$rootStr@$maxMtime:$bytes:${rels.size}:$digest"
  }
}
