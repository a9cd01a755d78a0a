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

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach { root =>
      try {
        if (Files.exists(root)) {
          Files.walk(root).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { try Files.delete(p) catch { case _: Exception => () } })
        }
      } catch { case _: Exception => () }
    }
  }, "graft-query-tmp-cleanup"))

  /** A fresh temp directory (as a String path) deleted recursively at
    * JVM exit.
    */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
