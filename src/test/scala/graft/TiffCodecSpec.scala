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

  test("compressed roundtrips: LZW, deflate (both ids), PackBits") {
    val g = grid(33, 21)
    for (comp <- Seq(TiffCodec.CompLzw, TiffCodec.CompDeflate,
                     TiffCodec.CompDeflateOld, TiffCodec.CompPackBits)) {
      val r = TiffCodec.decode(TiffCodec.encodeEx(g, compression = comp)).get
      assert(r.width == 21 && r.height == 33, s"comp=$comp")
      for (row <- 0 until 33; col <- 0 until 21)
        assert(r.at(row, col) == g(row)(col), s"comp=$comp ($row,$col)")
    }
  }

  test("multi-strip layout roundtrips, including a ragged last strip") {
    val g = grid(29, 13) // 29 rows / rps 8 -> 4 strips, last has 5 rows
    for (comp <- Seq(TiffCodec.CompNone, TiffCodec.CompLzw, TiffCodec.CompDeflate)) {
      val r = TiffCodec.decode(TiffCodec.encodeEx(g, compression = comp, rowsPerStrip = 8)).get
      for (row <- 0 until 29; col <- 0 until 13)
        assert(r.at(row, col) == g(row)(col), s"comp=$comp ($row,$col)")
    }
  }

  test("tiled layout roundtrips, edge tiles padded per spec") {
    val g = grid(40, 50) // 16x16 tiles -> 4 across x 3 down, padded edges
    for (comp <- Seq(TiffCodec.CompNone, TiffCodec.CompLzw, TiffCodec.CompDeflate)) {
      val r = TiffCodec.decode(
        TiffCodec.encodeEx(g, compression = comp, tile = Some((16, 16)))).get
      assert(r.width == 50 && r.height == 40)
      for (row <- 0 until 40; col <- 0 until 50)
        assert(r.at(row, col) == g(row)(col), s"comp=$comp ($row,$col)")
    }
  }

  test("integer and float32 sample formats decode") {
    val gInt = Array.tabulate(9, 7)((r, c) => ((r * 13 + c * 7) % 200).toDouble)
    for ((bits, fmt) <- Seq((8, 1), (16, 1), (32, 1), (16, 2), (32, 2))) {
      val r = TiffCodec.decode(TiffCodec.encodeEx(gInt, bits = bits, fmt = fmt)).get
      for (row <- 0 until 9; col <- 0 until 7)
        assert(r.at(row, col) == gInt(row)(col), s"bits=$bits fmt=$fmt")
    }
    val gNeg = Array.tabulate(5, 5)((r, c) => (r * c - 12).toDouble)
    val rNeg = TiffCodec.decode(TiffCodec.encodeEx(gNeg, bits = 16, fmt = 2)).get
    assert(rNeg.at(0, 0) == -12.0)
    val gF = grid(6, 6).map(_.map(v => v.toFloat.toDouble)) // f32-representable
    val rF = TiffCodec.decode(TiffCodec.encodeEx(gF, bits = 32, fmt = 3)).get
    for (row <- 0 until 6; col <- 0 until 6) assert(rF.at(row, col) == gF(row)(col))
  }

  test("horizontal-differencing predictor roundtrips for integer samples") {
    // smooth ramps are exactly what predictor 2 exists for
    val g = Array.tabulate(17, 31)((r, c) => (1000 + r * 3 + c).toDouble)
    for ((bits, fmt) <- Seq((8, 1), (16, 1), (16, 2), (32, 2));
         comp <- Seq(TiffCodec.CompLzw, TiffCodec.CompDeflate)) {
      val gg = if (bits == 8) g.map(_.map(_ % 256)) else g
      val enc = TiffCodec.encodeEx(gg, compression = comp, bits = bits, fmt = fmt,
        rowsPerStrip = 5, predictor = 2)
      val r = TiffCodec.decode(enc).get
      for (row <- 0 until 17; col <- 0 until 31)
        assert(r.at(row, col) == gg(row)(col), s"bits=$bits fmt=$fmt comp=$comp")
    }
  }

  test("LZW survives deep tables: 12-bit codes and Clear resets") {
    // 180x160 float64 of pseudo-random doubles = 230 KB of high-entropy
    // bytes -> the code table fills past 4093 entries and the encoder
    // emits mid-stream Clear codes; bit-width transitions 9->10->11->12
    // all exercised.
    val rnd = new scala.util.Random(42)
    val g = Array.fill(180, 160)(rnd.nextDouble() * 1e6 - 5e5)
    val enc = TiffCodec.encodeEx(g, compression = TiffCodec.CompLzw)
    val r = TiffCodec.decode(enc).get
    for (row <- 0 until 180; col <- 0 until 160)
      assert(r.at(row, col) == g(row)(col))
    // and a low-entropy grid (long runs -> KwKwK cases)
    val flat = Array.fill(64, 64)(7.5)
    val rf = TiffCodec.decode(TiffCodec.encodeEx(flat, compression = TiffCodec.CompLzw)).get
    assert((0 until 64).forall(i => rf.at(i, i) == 7.5))
  }

  test("truncated compressed segments decode to None, never throw") {
    val g = grid(20, 20)
    for (comp <- Seq(TiffCodec.CompLzw, TiffCodec.CompDeflate, TiffCodec.CompPackBits)) {
      val enc = TiffCodec.encodeEx(g, compression = comp)
      assert(TiffCodec.decode(enc.take(enc.length - 40)).isEmpty, s"comp=$comp")
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
