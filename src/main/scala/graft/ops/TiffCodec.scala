package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** SURVEY §2.10 D1 — real binary raster decode, replacing the earlier
  * stub: a minimal TIFF 6.0 codec for single-band, uncompressed,
  * single-strip, 64-bit-float little-endian rasters (the layout our
  * encoder emits, and the baseline layout of the reference's float
  * GeoTIFF tiles from the USGS exportImage path,
  * /root/reference/containers/topography/topography_container.py:111-142
  * — minus the geo keys, which the engine carries relationally as the
  * affine transform columns).
  *
  * No codec library: the byte layout is parsed directly, which is all a
  * 100 TB decode pass needs — the hot loop is a ByteBuffer sweep per
  * tile, embarrassingly parallel over a binary column.
  */
object TiffCodec {

  /** Encode a dense grid as single-strip uncompressed float64 TIFF. */
  def encode(grid: Array[Array[Double]]): Array[Byte] = {
    val h = grid.length
    val w = if (h == 0) 0 else grid(0).length
    require(grid.forall(_.length == w), "ragged grid")
    val nTags = 9
    val headerSize = 8
    val ifdSize = 2 + nTags * 12 + 4
    val dataOffset = headerSize + ifdSize
    val dataSize = w * h * 8
    val buf = ByteBuffer.allocate(dataOffset + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerSize) // IFD right after header
    buf.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(id.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    tag(256, 3, 1, w)           // ImageWidth (SHORT)
    tag(257, 3, 1, h)           // ImageLength
    tag(258, 3, 1, 64)          // BitsPerSample
    tag(259, 3, 1, 1)           // Compression = none
    tag(262, 3, 1, 1)           // Photometric = BlackIsZero
    tag(273, 4, 1, dataOffset)  // StripOffsets (LONG)
    tag(277, 3, 1, 1)           // SamplesPerPixel
    tag(279, 4, 1, dataSize)    // StripByteCounts
    tag(339, 3, 1, 3)           // SampleFormat = IEEE float
    buf.putInt(0)               // next IFD = none
    var r = 0
    while (r < h) { var c = 0; while (c < w) { buf.putDouble(grid(r)(c)); c += 1 }; r += 1 }
    buf.array()
  }

  final case class Raster(width: Int, height: Int, pixels: Array[Double]) {
    def at(row: Int, col: Int): Double = pixels(row * width + col)
  }

  /** Decode; returns None on anything that isn't a valid raster of the
    * supported layout (truncated, bad magic, unsupported compression). */
  def decode(bytes: Array[Byte]): Option[Raster] = {
    try {
      if (bytes.length < 8) return None
      val order = (bytes(0), bytes(1)) match {
        case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
        case ('M', 'M') => ByteOrder.BIG_ENDIAN
        case _ => return None
      }
      val buf = ByteBuffer.wrap(bytes).order(order)
      if (buf.getShort(2) != 42) return None
      val ifd = buf.getInt(4)
      val n = buf.getShort(ifd).toInt
      var w, h, bits, comp, strip, count = -1
      var i = 0
      while (i < n) {
        val e = ifd + 2 + i * 12
        val id = buf.getShort(e) & 0xffff
        val typ = buf.getShort(e + 2) & 0xffff
        val v = if (typ == 3) buf.getShort(e + 8) & 0xffff else buf.getInt(e + 8)
        id match {
          case 256 => w = v
          case 257 => h = v
          case 258 => bits = v
          case 259 => comp = v
          case 273 => strip = v
          case 279 => count = v
          case _ =>
        }
        i += 1
      }
      if (w <= 0 || h <= 0 || bits != 64 || comp != 1 ||
          strip < 0 || count != w * h * 8 || strip + count > bytes.length) return None
      val px = new Array[Double](w * h)
      var j = 0
      while (j < px.length) { px(j) = buf.getDouble(strip + j * 8); j += 1 }
      Some(Raster(w, h, px))
    } catch { case _: Exception => None }
  }
}
