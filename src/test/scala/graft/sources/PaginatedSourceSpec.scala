package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S1 stop-condition contract (fetch.py:233-240). */
class PaginatedSourceSpec extends AnyFunSuite {

  private def fixtureApi(n: Int)(offset: Long, limit: Int) =
    PaginatedSource.FetchResult(
      (offset until math.min(offset + limit, n)).toSeq, Some(n.toLong))

  test("short page stops the scan") {
    val (rows, stats) = PaginatedSource.fetchAll(fixtureApi(250), pageSize = 100)
    assert(rows === (0 until 250))
    assert(stats.stoppedBy === "short_page")
    assert(stats.pages === 3)
  }

  test("total-reached stops when pages divide evenly") {
    val (rows, stats) = PaginatedSource.fetchAll(fixtureApi(200), pageSize = 100)
    assert(rows === (0 until 200))
    assert(stats.stoppedBy === "total_reached")
    assert(stats.pages === 2)
  }

  test("empty first page") {
    val (rows, stats) = PaginatedSource.fetchAll(fixtureApi(0), pageSize = 100)
    assert(rows.isEmpty)
    assert(stats.stoppedBy === "empty_page")
  }

  test("max-records caps mid-page") {
    val (rows, stats) =
      PaginatedSource.fetchAll(fixtureApi(1000), pageSize = 100, maxRecords = 250)
    assert(rows === (0 until 250))
    assert(stats.stoppedBy === "max_records")
    assert(stats.fetched === 250)
  }
}
