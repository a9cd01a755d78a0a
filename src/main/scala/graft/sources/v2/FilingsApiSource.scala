package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 at scale: the paginated-API scan as a DataSourceV2 table with
  * offset-ranged InputPartitions (SURVEY §2.1 S1's cluster path).
  * Where the driver-side `PaginatedSource` walks pages sequentially,
  * this source hands each executor its own `[offset, offset+pageSize)`
  * slice — the shape you use when the upstream API (or dump) supports
  * random offset access, giving a parallel, restartable scan.
  *
  * Offline, rows are a deterministic closed-form function of the
  * record index (the fixture stands in for the remote endpoint), which
  * also makes the source oracle-checkable.
  *
  * Usage: `spark.read.format("graft.sources.v2.FilingsApiSource")
  *   .option("total", n).option("pageSize", p).load()`
  */
class FilingsApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FilingsApiSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FilingsApiTable(
      opts.getOrDefault("total", "1000").toLong,
      opts.getOrDefault("pagesize", "100").toInt)
  }
}

object FilingsApiSource {
  val Schema: StructType = StructType(Seq(
    StructField("submission_id", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("submission_type", StringType, nullable = false),
    StructField("docket_number", StringType, nullable = false),
    StructField("amount", DoubleType, nullable = false)))

  /** Closed-form record for index i — keep in sync with the DuckDB
    * oracle in OpsQueries.
    */
  def recordAt(i: Long, pageSize: Int): (String, Int, String, String, Double) = (
    s"SUB-$i",
    (i / pageSize).toInt,
    if (i % 4 == 0) "APPLICATION" else if (i % 4 == 1) "COMMENT"
    else if (i % 4 == 2) "PETITION" else "REQUEST",
    if (i % 3 == 0) "INBOX-52.15" else "25-100",
    (i % 1000) / 10.0)
}

class FilingsApiTable(total: Long, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"filings_api(total=$total,pageSize=$pageSize)"
  override def schema(): StructType = FilingsApiSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = FilingsApiSource.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        (0L until total by pageSize.toLong)
          .map(off => OffsetRange(off, math.min(off + pageSize, total), pageSize))
          .toArray[InputPartition]
      override def createReaderFactory(): PartitionReaderFactory =
        new FilingsReaderFactory
    }
}

case class OffsetRange(start: Long, end: Long, pageSize: Int) extends InputPartition

class FilingsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[OffsetRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        val (sid, page, st, dk, amount) = FilingsApiSource.recordAt(i, r.pageSize)
        InternalRow(
          UTF8String.fromString(sid), page,
          UTF8String.fromString(st), UTF8String.fromString(dk), amount)
      }
      override def close(): Unit = ()
    }
  }
}
