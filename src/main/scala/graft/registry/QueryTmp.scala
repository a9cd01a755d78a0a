package graft.registry

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentLinkedQueue

/** Temp-dir allocation for the roundtrip fixture queries (S-family
  * write→read-back shapes): every dir handed out is registered for
  * recursive deletion at JVM shutdown, so repeated harness / probe /
  * bench invocations of the same query don't accumulate litter under
  * the system temp root. The fixtures deliberately take a FRESH dir
  * per invocation — two concurrent constructions of one query must
  * not race on the same files — so cleanup is by shutdown hook, not
  * by path reuse.
  */
object QueryTmp {
  private val registered = new ConcurrentLinkedQueue[Path]()

  private def deleteRecursively(root: Path): Unit = {
    try {
      if (Files.exists(root)) {
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.delete(p) catch { case _: Exception => () } })
      }
    } catch { case _: Exception => () }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(deleteRecursively)
  }, "graft-query-tmp-cleanup"))

  /** Eagerly delete every dir handed out so far and forget them — for
    * long-lived probe/bench sessions that re-run the roundtrip queries
    * many times and would otherwise accumulate fixture-sized dirs
    * until JVM exit (the shutdown hook stays as backstop; sweeping an
    * already-deleted or concurrently-registered dir is safe — deletes
    * are idempotent and the queue is drained atomically per element).
    *
    * Caller contract: no query construction may be in flight — a
    * sweep mid-construction would delete a dir the query is about to
    * read back. Verify/Bench call it between queries, never during.
    */
  def sweep(): Unit = {
    var p = registered.poll()
    while (p != null) { deleteRecursively(p); p = registered.poll() }
  }

  /** A fresh temp directory (as a String path) deleted recursively at
    * JVM exit.
    */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
