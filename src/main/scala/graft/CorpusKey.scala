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
  * file count + a hash of the sorted file names. Spark embeds a fresh
  * job UUID in every part-file name, so any rewrite — even one landing
  * in the same second with identical sizes — changes the name hash and
  * misses the cache. CacheFingerprintSpec proves the regen-miss for
  * each cached family.
  *
  * All seven caches key through here (ivfCodebookCache, ivfAssignedCache,
  * pqCodebookCache, ccLabelsCache, fuzzyPairsCache, erLabelsCache,
  * fpIndexCache) plus the Z-order layout map; callers append their own
  * geometry suffixes (sample mod, sub-vector count) after the key.
  */
object CorpusKey {

  /** Fingerprint `dir/table` (a file or a parquet directory). Fails
    * loudly when the path does not exist — a cache keyed on a missing
    * source is always a bug at the call site. */
  def apply(dir: String, table: String): String = {
    val root = new java.io.File(dir, table)
    require(root.exists(), s"CorpusKey: source missing: ${root.getPath}")
    var maxMtime = 0L
    var bytes = 0L
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(walk)
      } else {
        maxMtime = math.max(maxMtime, f.lastModified())
        bytes += f.length()
        names += f.getName
      }
    walk(root)
    val nameHash = names.sorted.mkString("\n").hashCode
    s"${root.getPath}@$maxMtime:$bytes:${names.size}:$nameHash"
  }
}
