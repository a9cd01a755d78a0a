package graft.registry

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Eager-sweep lifecycle of the roundtrip-fixture temp dirs: sweep()
  * deletes everything handed out so far, is idempotent (double sweep,
  * sweep of an externally-deleted dir), and later allocations are
  * untouched by an earlier sweep.
  */
class QueryTmpSpec extends AnyFunSuite {

  test("sweep deletes registered dirs and is double-delete safe") {
    val a = QueryTmp.dir("graft-tmp-spec-a")
    val b = QueryTmp.dir("graft-tmp-spec-b")
    Files.writeString(Paths.get(a, "x.txt"), "payload")
    Files.createDirectories(Paths.get(b, "nested", "deep"))
    Files.writeString(Paths.get(b, "nested", "deep", "y.txt"), "payload")
    // one dir already gone before the sweep — must not throw
    val c = QueryTmp.dir("graft-tmp-spec-c")
    Files.delete(Paths.get(c))

    QueryTmp.sweep()
    assert(!Files.exists(Paths.get(a)))
    assert(!Files.exists(Paths.get(b)))
    assert(!Files.exists(Paths.get(c)))
    // second sweep over the drained queue: no-op, no throw
    QueryTmp.sweep()
  }

  test("allocations after a sweep are live until the next sweep") {
    QueryTmp.sweep()
    val d = QueryTmp.dir("graft-tmp-spec-d")
    assert(Files.exists(Paths.get(d)))
    Files.writeString(Paths.get(d, "z.txt"), "still here")
    assert(Files.exists(Paths.get(d, "z.txt")))
    QueryTmp.sweep()
    assert(!Files.exists(Paths.get(d)))
  }
}
