package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic distributed sampling as a custom aggregate (the §2.8
  * UDAF surface): the k rows with the smallest md5 of the value — a
  * bottom-k (KMV-style) hash sample. Unlike `rand()`-based sampling it
  * is order- and partitioning-independent, mergeable (partial bottom-k
  * ∪ partial bottom-k → trim), and reproducible across engines, which
  * is what makes it oracle-checkable: DuckDB's `min_by(x, md5(x), k)`
  * computes the identical multiset in the identical order.
  *
  * The per-group state is a bounded k-entry max-heap — the same memory
  * contract as any top-k aggregate; a hot group costs O(k), not
  * O(group size).
  */
case class HashSampleK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]]
    with UnaryLike[Expression] {
  require(k > 0, s"sample_k requires k > 0, got $k")

  // max-heap: head = lexicographically largest (hash, value) retained
  private val ord: Ordering[(String, String)] =
    Ordering.Tuple2(Ordering.String, Ordering.String)

  override def prettyName: String = "sample_k"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_k requires a string column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)](ord)

  private def push(buf: mutable.PriorityQueue[(String, String)],
                   entry: (String, String)): Unit = {
    if (buf.size < k) buf.enqueue(entry)
    else if (ord.lt(entry, buf.head)) { buf.dequeue(); buf.enqueue(entry) }
  }

  override def update(
      buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      push(buf, (HashSampleK.md5Hex(s), s))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(String, String)],
      other: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(buf.toSeq.sorted(ord)
      .map(e => UTF8String.fromString(e._2)).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) =>
      out.writeUTF(h)
      val vb = v.getBytes(StandardCharsets.UTF_8)
      out.writeInt(vb.length); out.write(vb)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val h = in.readUTF()
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      buf.enqueue((h, new String(vb, StandardCharsets.UTF_8)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashSampleK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashSampleK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HashSampleK =
    copy(child = newChild)
}

object HashSampleK {
  private[graft] def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
