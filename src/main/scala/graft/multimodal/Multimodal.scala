package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.etl.Normalize

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schemas, partition-friendly
  * batch shape, effect-boundary decode — is real; the codec itself is a
  * STUB (this container has no image/audio libraries): `decodeImages`
  * derives deterministic fake dimensions from the content digest, at
  * exactly the seam where a JNI/FFI decoder would plug in.
  *
  * Decode runs in `mapPartitions` (one codec init per partition, not
  * per row) — the same batch-boundary pattern as enrichment. At 100 TB,
  * pair with `spark.sql.files.maxPartitionBytes` sizing so a partition
  * of binaries fits executor memory.
  */
object Multimodal {

  case class BinDoc(doc_id: Long, content: Array[Byte])
  case class Decoded(doc_id: Long, width: Int, height: Int, channels: Int, n_frames: Int)

  /** Column-level metadata: byte size, magic-byte type, content digest.
    * Pure expressions — no decode needed, so it runs in the scan.
    */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("size_bytes", length(col(binCol)).cast("long"))
      .withColumn("file_type",
        coalesce(Normalize.classifyFileType(col(binCol)), lit("bin")))
      .withColumn("content_md5", md5(col(binCol)))

  /** STUB decode — deterministic fake dimensions from md5 nibbles.
    * Replace the body with the real codec call; the signature, batch
    * shape, and determinism contract are the real design.
    */
  def decodeImages(ds: Dataset[BinDoc]): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec once per partition here
      val md = MessageDigest.getInstance("MD5")
      it.map { d =>
        md.reset()
        val hex = md.digest(d.content).map("%02x".format(_)).mkString
        Decoded(
          d.doc_id,
          width = 32 * (1 + hex.charAt(0).toInt % 8),
          height = 32 * (1 + hex.charAt(1).toInt % 8),
          channels = 1 + hex.charAt(2).toInt % 4,
          n_frames = 1 + hex.charAt(3).toInt % 30)
      }
    }
  }

  case class Embedded(doc_id: Long, embedding: Seq[Double])

  /** STUB feature extraction — a deterministic `dim`-component vector
    * from md5 hex nibbles, through the same mapPartitions codec seam as
    * [[decodeImages]] (a real implementation runs the vision encoder
    * here, batched per partition). Downstream similarity/ANN operators
    * consume the output exactly as they consume text embeddings — this
    * is the decode → feature-extract → index chain of a multimodal
    * training pipeline.
    */
  def embedStub(ds: Dataset[BinDoc], dim: Int = 8): Dataset[Embedded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: load the encoder once per partition here
      val md = MessageDigest.getInstance("MD5")
      it.map { d =>
        md.reset()
        val hex = md.digest(d.content).map("%02x".format(_)).mkString
        Embedded(d.doc_id,
          (0 until dim).map(i => (hex.charAt(i).toInt % 16) / 15.0 - 0.5))
      }
    }
  }

  /** Resize plan: target dims preserving the stub's aspect ratio —
    * column math over decoded metadata (the real resize is per-binary
    * work behind the same decode seam).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling: every `stride`-th frame index per video — the
    * explode keeps downstream per-frame work row-parallel.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
