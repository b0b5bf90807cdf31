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
  * LOCAL-FS ASSUMPTION: the walk uses `java.io.File`, matching the
  * single-JVM local[32] deployment this library is driven under; a
  * cluster deployment reading object storage would port this walk to
  * the Hadoop FileSystem listing (same fields are available there) —
  * the KEY FORMAT is storage-agnostic, only the walk is not.
  */
object CorpusKey {

  /** Fingerprint `dir/table` (a file or a parquet directory). Fails
    * loudly when the path does not exist — a cache keyed on a missing
    * source is always a bug at the call site. */
  def apply(dir: String, table: String): String = {
    val root = new java.io.File(dir, table)
    require(root.exists(), s"CorpusKey: source missing: ${root.getPath}")
    val rootPath = root.toPath
    var maxMtime = 0L
    var bytes = 0L
    val rels = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(walk)
      } else {
        maxMtime = math.max(maxMtime, f.lastModified())
        bytes += f.length()
        rels += rootPath.relativize(f.toPath).toString
      }
    walk(root)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(rels.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${root.getPath}@$maxMtime:$bytes:${rels.size}:$digest"
  }
}
