package graft

import graft.ops.TiffCodec

/** Binary raster codec: lossless roundtrip, point addressing, and
  * rejection of malformed payloads (the error path the reference hits
  * when a WCS fetch returns an HTML error page instead of a tile). */
class TiffCodecSpec extends SparkSpecBase {

  private def grid(h: Int, w: Int): Array[Array[Double]] =
    Array.tabulate(h, w)((r, c) => ((r * 31 + c * 17) % 97) + r * 0.5)

  test("encode/decode roundtrip is lossless for double pixels") {
    val g = grid(16, 16)
    val r = TiffCodec.decode(TiffCodec.encode(g)).get
    assert(r.width == 16 && r.height == 16)
    for (row <- 0 until 16; col <- 0 until 16)
      assert(r.at(row, col) == g(row)(col))
  }

  test("non-square and tiny rasters roundtrip") {
    for ((h, w) <- Seq((1, 1), (2, 7), (5, 3))) {
      val r = TiffCodec.decode(TiffCodec.encode(grid(h, w))).get
      assert(r.height == h && r.width == w)
      assert(r.at(h - 1, w - 1) == grid(h, w)(h - 1)(w - 1))
    }
  }

  test("malformed payloads decode to None, never throw") {
    assert(TiffCodec.decode(Array.empty[Byte]).isEmpty)
    assert(TiffCodec.decode("<html>error</html>".getBytes).isEmpty)
    assert(TiffCodec.decode(Array[Byte]('I', 'I', 42, 0)).isEmpty) // truncated
    val good = TiffCodec.encode(grid(4, 4))
    assert(TiffCodec.decode(good.take(good.length - 9)).isEmpty) // strip cut short
    val badMagic = good.clone(); badMagic(2) = 77
    assert(TiffCodec.decode(badMagic).isEmpty)
  }
}
