package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.PpmImage

/** The real P6 PPM decode/resize kernels (r7 VERDICT item #5), driven
  * with hand-built rasters where every expected pixel is known — the
  * image-level evidence the corpus-level OperatorSpec checks can't
  * give (the corpus payloads are packed text).
  */
class MultimodalSpec extends AnyFunSuite {

  private def ppm(w: Int, h: Int, px: Array[Byte], header: String = null): Array[Byte] = {
    val hdr = Option(header).getOrElse(s"P6\n$w $h\n255\n").getBytes("US-ASCII")
    hdr ++ px
  }

  private def px(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  test("decodePpm: canonical 2x2 image round-trips header and plane") {
    val plane = px(
      255, 0, 0,   0, 255, 0, // row 0: red, green
      0, 0, 255,   255, 255, 255) // row 1: blue, white
    val img = Multimodal.decodePpm(ppm(2, 2, plane)).get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == plane.toSeq)
  }

  test("decodePpm: netpbm whitespace variants and comments parse") {
    val plane = px(1, 2, 3)
    // comment between fields, CR/tab separators, multi-space
    val weird = "P6\n# a comment\n1 \t1\r# another\n255\n".getBytes("US-ASCII") ++ plane
    val img = Multimodal.decodePpm(weird).get
    assert(img.width == 1 && img.height == 1 && img.pixels.toSeq == plane.toSeq)
  }

  test("decodePpm: negative paths all return None, never garbage") {
    val plane = px(1, 2, 3)
    assert(Multimodal.decodePpm("P5\n1 1\n255\n".getBytes ++ plane).isEmpty) // wrong magic
    assert(Multimodal.decodePpm(ppm(1, 1, px(1, 2))).isEmpty) // truncated plane
    assert(Multimodal.decodePpm(ppm(1, 1, plane, "P6\n1 1\n65535\n")).isEmpty) // 2-byte maxval
    assert(Multimodal.decodePpm(ppm(1, 1, plane, "P6\n0 1\n255\n")).isEmpty) // zero dim
    assert(Multimodal.decodePpm(ppm(1, 1, plane, "P6\n1 1\n\n")).isEmpty) // missing maxval
    assert(Multimodal.decodePpm(Array[Byte]()).isEmpty)
    assert(Multimodal.decodePpm("not an image at all".getBytes).isEmpty)
  }

  test("encodePpm -> decodePpm round-trip preserves payload bytes and pads with zeros") {
    val raw = "hello, raster".getBytes("US-ASCII")
    val img = Multimodal.decodePpm(Multimodal.encodePpm(raw)).get
    assert(img.width == 16 && img.height == 1)
    assert(img.pixels.take(raw.length).toSeq == raw.toSeq)
    assert(img.pixels.drop(raw.length).forall(_ == 0))
    // exactly one 48-byte row per started 48-byte chunk
    val raw2 = new Array[Byte](49)
    assert(Multimodal.decodePpm(Multimodal.encodePpm(raw2)).get.height == 2)
  }

  test("resizePpm: 2x2 -> 1x1 picks the top-left pixel (nearest neighbor)") {
    val plane = px(
      10, 11, 12,   20, 21, 22,
      30, 31, 32,   40, 41, 42)
    val out = Multimodal.resizePpm(PpmImage(2, 2, plane), 1, 1)
    assert(out.pixels.toSeq == px(10, 11, 12).toSeq)
  }

  test("resizePpm: 4x4 gradient -> 2x2 samples the exact source grid points") {
    // pixel (x, y) = (x*10 + y, 0, 0): recognizable per-position values
    val plane = (for (y <- 0 until 4; x <- 0 until 4)
      yield Seq(x * 10 + y, 0, 0)).flatten.map(_.toByte).toArray
    val out = Multimodal.resizePpm(PpmImage(4, 4, plane), 2, 2)
    // nearest-neighbor with sy = y*4/2, sx = x*4/2 -> sources (0,0), (2,0), (0,2), (2,2)
    val reds = (0 until 4).map(i => out.pixels(i * 3) & 0xff)
    assert(reds == Seq(0, 20, 2, 22))
  }

  test("resizePpm: upscale replicates pixels, never reads out of bounds") {
    val plane = px(5, 6, 7)
    val out = Multimodal.resizePpm(PpmImage(1, 1, plane), 3, 2)
    assert(out.pixels.grouped(3).toSeq.forall(_.toSeq == px(5, 6, 7).toSeq))
    assert(out.pixels.length == 3 * 2 * 3)
  }
}
