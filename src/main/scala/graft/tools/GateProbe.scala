package graft.tools

/** Registry-consistency probe for the snapshot gate
  * (`tools/snapshot_gate.sh`). Prints one machine-readable line and
  * exits nonzero if the driver contract is internally inconsistent:
  * every `oracleSql` key must name a registered query, and the
  * registered count must match `tools/QUERY_COUNT` (a deliberate,
  * committed number — adding or retiring a query means bumping that
  * file in the same commit, so an accidental drop is refused, not
  * silently shipped).
  *
  * No SparkSession is created: the probe must stay sub-second so the
  * gate's cost is dominated by the work that actually needs a JVM
  * (compile + the fast spec subset).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    val orphans = o.diff(q)
    if (orphans.nonEmpty) {
      println(s"[gateprobe] FAIL oracleSql without queries: ${orphans.toSeq.sorted.mkString(",")}")
      sys.exit(1)
    }
    val expectedPath = java.nio.file.Paths.get("tools/QUERY_COUNT")
    val expected =
      new String(java.nio.file.Files.readAllBytes(expectedPath), "UTF-8").trim.toInt
    if (q.size != expected) {
      println(s"[gateprobe] FAIL queries=${q.size} expected=$expected " +
        "(bump tools/QUERY_COUNT in the same commit if the change is deliberate)")
      sys.exit(1)
    }
    println(s"[gateprobe] OK queries=${q.size} oracles=${o.size} expected=$expected")
  }
}
