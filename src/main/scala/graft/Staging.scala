package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM staging directories under java.io.tmpdir, deleted on JVM exit.
  *
  * Used by the ETL round-trip queries (q30/q31/q32 write-then-read their
  * operator under test) and q50's iterative label checkpoints. Paths are
  * keyed by (tag, source dir, pid): the sf-dir key stops concurrent runs at
  * DIFFERENT scale factors from colliding, the pid stops two JVMs at the
  * SAME sf (e.g. Verify next to Bench) from overwriting each other
  * mid-read. A single shutdown hook removes every registered root, so
  * repeated runs no longer accumulate abandoned graft_* trees in tmpdir
  * (pre-round-5 they leaked three copies of events per JVM, forever).
  */
object Staging {

  private val registered = scala.collection.mutable.LinkedHashSet[String]()

  def path(tag: String, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    val p = s"${sys.props("java.io.tmpdir")}/graft_${tag}_${key}_${ProcessHandle.current().pid()}"
    register(p)
    p
  }

  /** A unique (not keyed) staging dir, still swept at JVM exit — for test
    * fixtures that need per-call isolation. */
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
