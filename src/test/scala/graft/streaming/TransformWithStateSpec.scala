package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Spark-4 arbitrary-stateful API (`transformWithState`, state v2)
  * carries the same semantics as the GroupState form it will replace:
  * [[EventStreams.runningTotalsTws]] is run on REAL multi-batch
  * streams against [[EventStreams.runningTotals]] and must emit
  * bit-identical rows, including state carried across micro-batch
  * boundaries. The v2 API requires the RocksDB state-store provider —
  * itself the production backend (RocksDbStateSpec) — so the TWS query
  * runs in a session with that conf while the GroupState twin runs on
  * the default provider: parity across BOTH the API and the backend.
  */
class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    EventStreams.UserEvent(1L, ts("2024-01-01 10:00:00"), 2.0),
    EventStreams.UserEvent(1L, ts("2024-01-01 10:01:00"), 2.0),
    EventStreams.UserEvent(2L, ts("2024-01-01 10:01:30"), 9.0))
  private val batch2 = Seq(
    EventStreams.UserEvent(1L, ts("2024-01-01 10:02:00"), 2.0), // crosses 5.0
    EventStreams.UserEvent(2L, ts("2024-01-01 10:03:00"), 1.0))

  private def run(useTws: Boolean, tag: String): Seq[(Long, Double, Long, Boolean)] = {
    val s2 = spark.newSession()
    if (useTws) {
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val events = mem.toDS()
    val out =
      if (useTws) EventStreams.runningTotalsTws(events, alertAt = 5.0)
      else EventStreams.runningTotals(events, alertAt = 5.0)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(s"tws_parity_$tag").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*) // state must carry across the boundary
    q.processAllAvailable()
    val rows = s2.table(s"tws_parity_$tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(t => (t._1, t._3))
    q.stop()
    rows
  }

  test("transformWithState emits bit-identical running totals vs GroupState") {
    val tws = run(useTws = true, "tws")
    val gs = run(useTws = false, "gs")
    assert(tws === gs)
    // and both carried state across the micro-batch boundary: user 1's
    // third event sees total 6.0 and alerts, user 2 accumulates 10.0
    assert(tws === Seq(
      (1L, 2.0, 1L, false), (1L, 4.0, 2L, false), (1L, 6.0, 3L, true),
      (2L, 9.0, 1L, true), (2L, 10.0, 2L, true)))
  }
}
