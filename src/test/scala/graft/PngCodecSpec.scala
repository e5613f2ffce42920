package graft

import graft.ops.PngCodec
import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def grey(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i / w, i % w))

  test("greyscale round-trip under every scanline filter type") {
    val w = 13; val h = 11 // deliberately not a power of two
    val px = grey(w, h)((r, c) => (r * 23 + c * 31) % 251)
    for (filter <- 0 to 4) {
      val bytes = PngCodec.encode(w, h, 1, px, _ => filter)
      val img = PngCodec.decode(bytes).getOrElse(fail(s"filter $filter did not decode"))
      assert(img.width == w && img.height == h && img.channels == 1)
      assert(img.pixels.sameElements(px), s"filter $filter round-trip")
    }
  }

  test("mixed per-row filters and multi-IDAT reassembly") {
    val w = 16; val h = 12
    val px = grey(w, h)((r, c) => (r * 7 + c * 13 + 5) % 256)
    val bytes = PngCodec.encode(w, h, 1, px, r => r % 5, chunkPerRow = true)
    val img = PngCodec.decode(bytes).get
    assert(img.pixels.sameElements(px))
  }

  test("RGB and RGBA round-trip (filters run on bytes at bpp offsets, not pixels)") {
    for (ch <- Seq(3, 4)) {
      val w = 9; val h = 7
      val px = Array.tabulate(w * h * ch)(i => (i * 37 + 11) % 256)
      val bytes = PngCodec.encode(w, h, ch, px, r => (r + 2) % 5)
      val img = PngCodec.decode(bytes).get
      assert(img.channels == ch)
      assert(img.pixels.sameElements(px))
      assert(img.at(2, 3, ch - 1) == px((2 * w + 3) * ch + ch - 1))
    }
  }

  test("malformed payloads decode to None, never throw") {
    val good = PngCodec.encode(4, 4, 1, Array.fill(16)(7))
    assert(PngCodec.decode("<html>err</html>".getBytes).isEmpty) // not a PNG
    assert(PngCodec.decode(good.dropRight(9)).isEmpty)           // truncated
    val corrupted = good.clone()
    corrupted(40) = (corrupted(40) ^ 0xff).toByte                // flip an IDAT byte
    assert(PngCodec.decode(corrupted).isEmpty)                   // CRC catches it
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    // unsupported: 16-bit depth flag forged into a valid header fails CRC;
    // build a real unsupported one via interlace byte instead
    val interlaced = good.clone()
    // IHDR data starts at offset 16; interlace byte is its 13th byte (offset 28)
    // flipping it invalidates the CRC -> None either way; the point is no throw
    interlaced(28) = 1
    assert(PngCodec.decode(interlaced).isEmpty)
  }

  test("ancillary chunks are skipped") {
    val w = 5; val h = 3
    val px = grey(w, h)((r, c) => r * 50 + c)
    val bytes = PngCodec.encode(w, h, 1, px)
    // splice a tEXt chunk between IHDR and IDAT (IHDR ends at offset 33)
    val data = "graftkeyword".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data)
      .putInt(crc.getValue.toInt)
    val spliced = bytes.take(33) ++ chunk.array() ++ bytes.drop(33)
    assert(PngCodec.decode(spliced).get.pixels.sameElements(px))
  }
}
