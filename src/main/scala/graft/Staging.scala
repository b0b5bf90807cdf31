package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM staging directories under java.io.tmpdir, deleted on JVM exit.
  *
  * Used by the ETL round-trip queries (q30/q31/q32 write-then-read their
  * operator under test), the staged-subtree queries (q42/q50 truncate an
  * expensive lineage through parquet), and test fixtures. Every path is
  * unique per CALL: each of those sites writes then re-reads its dir, and
  * any sharing scheme (a (tag, sf, pid) key, as used pre-round-6) lets two
  * concurrent invocations of the same query in one JVM race an
  * overwrite against a read. A single shutdown hook removes every
  * registered root, so repeated runs don't accumulate abandoned graft_*
  * trees in tmpdir.
  */
object Staging {

  private val registered = scala.collection.mutable.LinkedHashSet[String]()

  /** A unique staging dir, swept at JVM exit. */
  def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_${tag}_").toString
    register(p)
    p
  }

  private def register(p: String): Unit = synchronized {
    if (registered.isEmpty)
      Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
    registered += p
  }

  private def sweep(): Unit =
    synchronized(registered.toList).foreach { root =>
      val p = Paths.get(root)
      if (Files.exists(p)) deleteRecursively(p)
    }

  private def deleteRecursively(p: Path): Unit = {
    val stream = Files.walk(p)
    try stream.sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally stream.close()
  }
}
