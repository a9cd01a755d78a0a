package graft.tools

import scala.sys.process._

/** One-command round-start drift check. The driver regenerates
  * `/root/testdata` at round start (and has done so mid-round), and
  * writer layouts drift between regenerations (the round-6
  * TIMESTAMP_NTZ events, int-width flips) — `Tables` normalizes on
  * read, but each regeneration must be PROVEN green before building on
  * it. This tool folds the four manual steps into one:
  *
  *   1. compare fixture mtimes against the last commit time (newer
  *      fixtures = a regeneration this round — the layouts may have
  *      changed even if Verify still passes);
  *   2. run [[graft.Verify]] over the full registry at sf0.01;
  *   3. run the DuckDB oracle comparison (`tools/check_oracle.py`);
  *   4. print one summary line: `GREEN` (build on it) or `DRIFT`
  *      (fix `Tables`/oracles first).
  *
  * Usage: runMain graft.tools.RoundStart [sfDir] [outDir]
  * (defaults: /root/testdata/sf0.01, /tmp/graft_roundstart)
  */
object RoundStart {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_roundstart"

    val fixtureDir = new java.io.File(sfDir)
    require(fixtureDir.isDirectory, s"no fixture dir at $sfDir")
    val newestFixture = fixtureDir.listFiles().map(_.lastModified()).max
    val lastCommitMs =
      try Seq("git", "log", "-1", "--format=%ct").!!.trim.toLong * 1000L
      catch { case _: Exception => 0L }
    val regenerated = newestFixture > lastCommitMs
    println(s"[roundstart] fixtures ${if (regenerated) "REGENERATED since" else "unchanged since"} " +
      s"last commit (fixture=${new java.util.Date(newestFixture)}, " +
      s"commit=${new java.util.Date(lastCommitMs)})")

    // Verify in-process (we're already inside the sbt JVM — a nested
    // `sbt runMain` would deadlock on the target-dir lock).
    val rc =
      try { graft.Verify.main(Array(sfDir, outDir)); 0 }
      catch { case e: Throwable =>
        println(s"[roundstart] Verify FAILED: ${e.getMessage}"); 1 }
    if (rc != 0) { println("[roundstart] DRIFT — Verify did not complete"); sys.exit(1) }

    val oracleOut = new StringBuilder
    val oracleRc = Process(
      Seq("python3", "tools/check_oracle.py", sfDir, outDir))
      .!(ProcessLogger(l => { oracleOut ++= l; oracleOut += '\n' }))
    val tail = oracleOut.toString.linesIterator.toSeq.takeRight(3)
    tail.foreach(l => println(s"[roundstart] $l"))
    if (oracleRc == 0 && tail.exists(_.endsWith("0 fail")))
      println(s"[roundstart] GREEN — registry matches the oracle on $sfDir" +
        (if (regenerated) " (regenerated fixtures: normalization held)" else ""))
    else {
      println(s"[roundstart] DRIFT — oracle mismatches on $sfDir; " +
        "fix Tables normalization / affected twins before building")
      sys.exit(1)
    }
  }
}
