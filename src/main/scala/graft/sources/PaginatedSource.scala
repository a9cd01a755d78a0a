package graft.sources

/** S1 — the paginated REST scan (`code/fetch.py:49-87,194-246`),
  * generalized: a page fetcher (the network boundary; a fixture slice
  * offline) driven by the reference's stop conditions — empty page,
  * short page, max-records cap, reported-total satisfied.
  *
  * Pagination is inherently a driver-side sequential protocol (each
  * page depends on the previous offset), so this deliberately is NOT a
  * distributed operator; the fetched batch becomes a DataFrame via
  * `spark.createDataFrame` and everything downstream distributes. At
  * scale the equivalent is a DSv2 source with offset-ranged
  * InputPartitions when the API allows random offset access — the stop
  * conditions here are the contract either way.
  */
object PaginatedSource {

  case class FetchResult[T](rows: Seq[T], reportedTotal: Option[Long])

  case class ScanStats(pages: Int, fetched: Long, stoppedBy: String)

  def fetchAll[T](
      fetchPage: (Long, Int) => FetchResult[T],
      pageSize: Int,
      maxRecords: Long = 0): (Seq[T], ScanStats) = {
    val out = Seq.newBuilder[T]
    var offset = 0L
    var pages = 0
    var fetched = 0L
    var stop: Option[String] = None
    while (stop.isEmpty) {
      val page = fetchPage(offset, pageSize)
      pages += 1
      val rows =
        if (maxRecords > 0 && fetched + page.rows.size > maxRecords)
          page.rows.take((maxRecords - fetched).toInt)
        else page.rows
      out ++= rows
      fetched += rows.size
      offset += page.rows.size
      stop =
        if (page.rows.isEmpty) Some("empty_page")
        else if (maxRecords > 0 && fetched >= maxRecords) Some("max_records")
        else if (page.rows.size < pageSize) Some("short_page")
        else if (page.reportedTotal.exists(offset >= _)) Some("total_reached")
        else None
    }
    (out.result(), ScanStats(pages, fetched, stop.get))
  }
}
