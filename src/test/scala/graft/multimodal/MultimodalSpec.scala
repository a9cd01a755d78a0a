package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resizePlan preserves aspect ratio and never upscales") {
    val decoded = Seq(
      (1L, 256, 128, 3, 1),  // downscale 2x -> 128x64
      (2L, 64, 32, 3, 1),    // under maxSide both dims -> untouched
      (3L, 100, 200, 1, 1))  // portrait downscale -> 64x128
      .toDF("doc_id", "width", "height", "channels", "n_frames")
    val got = Multimodal.resizePlan(decoded, maxSide = 128)
      .select("doc_id", "out_width", "out_height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) === ((128, 64)))
    assert(got(2L) === ((64, 32)))
    assert(got(3L) === ((64, 128)))
  }

  test("decode stub is deterministic and bounded") {
    val docs = Seq((1L, "hello".getBytes), (2L, "world".getBytes))
      .toDF("doc_id", "content").as[Multimodal.BinDoc]
    val a = Multimodal.decodeImages(docs).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeImages(docs).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    a.foreach { d =>
      assert(d.width >= 32 && d.width <= 256 && d.width % 32 == 0)
      assert(d.channels >= 1 && d.channels <= 4)
      assert(d.n_frames >= 1 && d.n_frames <= 30)
    }
  }
}
