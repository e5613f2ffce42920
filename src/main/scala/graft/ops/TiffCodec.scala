package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** SURVEY §2.10 D1 — real binary raster decode, replacing the earlier
  * stub: a TIFF 6.0 codec for single-band rasters.
  *
  * Round 7 handled only the layout our own encoder emits (uncompressed,
  * single-strip, float64 LE). Real LANDFIRE / USGS tiles (the reference's
  * rasterio path, /root/reference/containers/landfire/landfire_container.py:89-96)
  * are deflate- or LZW-compressed, striped or tiled, and integer- or
  * float32-banded — so the decoder now covers, per the public TIFF 6.0
  * spec:
  *
  *  - Compression: none (1), LZW (5, MSB-first codes with the spec's
  *    "early change" code-width bump), Adobe/zlib Deflate (8 and the
  *    legacy 32946 id), PackBits (32773).
  *  - Layout: single- or multi-strip (RowsPerStrip) and tiled
  *    (TileWidth/TileLength, edge tiles padded to full size per spec).
  *  - Samples: unsigned/signed int at 8/16/32 bits, IEEE float at 32/64
  *    bits; single band (SamplesPerPixel=1); both byte orders.
  *  - Predictor 2 (horizontal differencing) for integer samples.
  *
  * No codec library: the byte layout is parsed directly, which is all a
  * 100 TB decode pass needs — the hot loop is a ByteBuffer sweep per
  * tile, embarrassingly parallel over a binary column. The decoder never
  * throws: any malformed payload (the HTML-error-page-instead-of-a-tile
  * case the reference hits on WCS failures) returns None.
  */
object TiffCodec {

  /** Encode a dense grid as single-strip uncompressed float64 TIFF.
    * (Kept byte-identical across rounds: staged fixtures hash these.) */
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

  // TIFF 6.0 compression ids
  val CompNone = 1
  val CompLzw = 5
  val CompDeflate = 8       // "Adobe" deflate — what modern writers emit
  val CompPackBits = 32773
  val CompDeflateOld = 32946

  /** General encoder: compression, sample format/width, multi-strip or
    * tiled layout, optional horizontal-differencing predictor (integer
    * samples only, per spec). Used by specs to synthesize every layout
    * the decoder claims.
    *
    * @param bits 8/16/32 (fmt 1/2) or 32/64 (fmt 3)
    * @param fmt  1=unsigned int, 2=signed int, 3=IEEE float
    * @param rowsPerStrip 0 = single strip (all rows); ignored when tiled
    * @param tile Some((tileWidth, tileLength)) — spec requires multiples of 16
    */
  def encodeEx(
      grid: Array[Array[Double]],
      compression: Int = CompNone,
      bits: Int = 64,
      fmt: Int = 3,
      rowsPerStrip: Int = 0,
      tile: Option[(Int, Int)] = None,
      predictor: Int = 1): Array[Byte] = {
    val h = grid.length
    val w = if (h == 0) 0 else grid(0).length
    require(grid.forall(_.length == w), "ragged grid")
    require(Seq(CompNone, CompLzw, CompDeflate, CompPackBits, CompDeflateOld).contains(compression))
    require((fmt == 3 && (bits == 32 || bits == 64)) ||
            ((fmt == 1 || fmt == 2) && (bits == 8 || bits == 16 || bits == 32)))
    require(predictor == 1 || (predictor == 2 && fmt != 3), "predictor 2 is integer-only")
    val bps = bits / 8

    def packRows(r0: Int, r1: Int, c0: Int, rowW: Int): Array[Byte] = {
      // Pack rows [r0, r1) × cols [c0, c0+rowW) as samples; rows/cols past
      // the grid edge pad with 0 (tiled layouts require full tiles).
      val out = ByteBuffer.allocate((r1 - r0) * rowW * bps).order(ByteOrder.LITTLE_ENDIAN)
      var r = r0
      while (r < r1) {
        var c = 0
        var prev = 0L
        while (c < rowW) {
          val v = if (r < h && c0 + c < w) grid(r)(c0 + c) else 0.0
          fmt match {
            case 3 if bits == 64 => out.putDouble(v)
            case 3               => out.putFloat(v.toFloat)
            case _ =>
              var iv = v.toLong
              if (predictor == 2) { val d = iv - prev; prev = iv; iv = d }
              bits match {
                case 8  => out.put(iv.toByte)
                case 16 => out.putShort(iv.toShort)
                case 32 => out.putInt(iv.toInt)
              }
          }
          c += 1
        }
        r += 1
      }
      out.array()
    }

    val compress: Array[Byte] => Array[Byte] = compression match {
      case CompNone                     => identity
      case CompLzw                      => lzwEncode
      case CompDeflate | CompDeflateOld => deflate
      case CompPackBits                 => packBitsEncode
    }

    // Build the segment payloads first; the IFD layout follows from them.
    val (segs, layoutTags) = tile match {
      case Some((tw, th)) =>
        val across = (w + tw - 1) / tw
        val down = (h + th - 1) / th
        val s = for (ty <- 0 until down; tx <- 0 until across)
          yield compress(packRows(ty * th, ty * th + th, tx * tw, tw))
        (s.toIndexedSeq, Seq((322, tw), (323, th))) // offsets/counts added below
      case None =>
        val rps = if (rowsPerStrip <= 0 || rowsPerStrip > h) math.max(h, 1) else rowsPerStrip
        val n = math.max(1, (h + rps - 1) / rps)
        val s = for (i <- 0 until n)
          yield compress(packRows(i * rps, math.min(h, (i + 1) * rps), 0, w))
        (s.toIndexedSeq, Seq((278, rps)))
    }
    val nSeg = segs.length
    val (offTag, cntTag) = if (tile.isDefined) (324, 325) else (273, 279)

    // Tags in ascending id order (TIFF requirement). Array-valued LONG
    // tags (> 1 element) live out-of-line in a value area after the IFD.
    val scalarTags = (Seq(
      (256, w), (257, h), (258, bits), (259, compression), (262, 1), (277, 1)
    ) ++ layoutTags ++ (if (predictor != 1) Seq((317, predictor)) else Nil) ++ Seq(
      (339, fmt)
    ))
    val nTags = scalarTags.length + 2 // + offsets + counts
    val headerSize = 8
    val ifdSize = 2 + nTags * 12 + 4
    val valueArea = if (nSeg > 1) 2 * 4 * nSeg else 0
    val dataOffset = headerSize + ifdSize + valueArea
    val segOffsets = segs.scanLeft(dataOffset)(_ + _.length).take(nSeg)
    val total = dataOffset + segs.map(_.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerSize)
    buf.putShort(nTags.toShort)
    val allTags: Seq[(Int, Int, Int, Int)] = // (id, typ, count, value)
      (scalarTags.map { case (id, v) => (id, 3, 1, v) } ++ Seq(
        (offTag, 4, nSeg, if (nSeg == 1) segOffsets(0) else headerSize + ifdSize),
        (cntTag, 4, nSeg, if (nSeg == 1) segs(0).length else headerSize + ifdSize + 4 * nSeg)
      )).sortBy(_._1)
    allTags.foreach { case (id, typ, count, value) =>
      buf.putShort(id.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    buf.putInt(0) // next IFD
    if (nSeg > 1) {
      segOffsets.foreach(buf.putInt)
      segs.foreach(s => buf.putInt(s.length))
    }
    segs.foreach(buf.put)
    buf.array()
  }

  /** Decode; returns None on anything that isn't a valid single-band
    * raster of a supported layout (truncated, bad magic, unsupported
    * compression, inconsistent segment sizes). */
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
      if (ifd < 8 || ifd + 2 > bytes.length) return None
      val n = buf.getShort(ifd).toInt
      if (n <= 0 || ifd + 2 + n * 12 > bytes.length) return None

      // Resolve each SHORT/LONG tag to its value array (inline when the
      // payload fits in the 4-byte value cell, out-of-line otherwise).
      val tags = scala.collection.mutable.Map.empty[Int, Array[Long]]
      var i = 0
      while (i < n) {
        val e = ifd + 2 + i * 12
        val id = buf.getShort(e) & 0xffff
        val typ = buf.getShort(e + 2) & 0xffff
        val count = buf.getInt(e + 4)
        if (count < 0 || count > (1 << 24)) return None
        val elemSize = typ match { case 3 => 2; case 4 => 4; case _ => 0 }
        if (elemSize > 0) {
          val totalSize = elemSize * count
          val base = if (totalSize <= 4) e + 8 else buf.getInt(e + 8)
          if (base < 0 || base + totalSize > bytes.length) return None
          val vals = new Array[Long](count)
          var j = 0
          while (j < count) {
            vals(j) =
              if (typ == 3) (buf.getShort(base + j * 2) & 0xffff).toLong
              else buf.getInt(base + j * 4).toLong & 0xffffffffL
            j += 1
          }
          tags(id) = vals
        }
        i += 1
      }
      def t1(id: Int, default: Long = -1L): Long =
        tags.get(id).filter(_.nonEmpty).map(_(0)).getOrElse(default)

      val w = t1(256).toInt
      val h = t1(257).toInt
      val bits = t1(258).toInt
      val comp = t1(259, 1).toInt
      val spp = t1(277, 1).toInt
      val fmt = t1(339, 1).toInt
      val predictor = t1(317, 1).toInt
      if (w <= 0 || h <= 0 || spp != 1) return None
      if (w.toLong * h > (1L << 28)) return None // 256M px cap: one tile, not a bomb
      val floatOk = fmt == 3 && (bits == 32 || bits == 64)
      val intOk = (fmt == 1 || fmt == 2) && (bits == 8 || bits == 16 || bits == 32)
      if (!floatOk && !intOk) return None
      if (predictor != 1 && !(predictor == 2 && intOk)) return None
      if (!Seq(CompNone, CompLzw, CompDeflate, CompPackBits, CompDeflateOld).contains(comp)) return None
      val bps = bits / 8

      val px = new Array[Double](w * h)

      // One segment = one strip or one tile: decompress, un-predict,
      // parse samples, place into the full-raster pixel array.
      def readSegment(off: Long, cnt: Long, rows: Int, rowW: Int,
                      dstRow: Int, dstCol: Int): Boolean = {
        if (off < 0 || cnt < 0 || off + cnt > bytes.length) return false
        val rawLen = rows * rowW * bps
        val raw: Array[Byte] = comp match {
          case CompNone =>
            if (cnt != rawLen) return false
            java.util.Arrays.copyOfRange(bytes, off.toInt, (off + cnt).toInt)
          case CompLzw =>
            val d = lzwDecode(bytes, off.toInt, cnt.toInt, rawLen)
            if (d == null || d.length != rawLen) return false else d
          case CompDeflate | CompDeflateOld =>
            val d = inflate(bytes, off.toInt, cnt.toInt, rawLen)
            if (d == null || d.length != rawLen) return false else d
          case CompPackBits =>
            val d = packBitsDecode(bytes, off.toInt, cnt.toInt, rawLen)
            if (d == null || d.length != rawLen) return false else d
        }
        val rb = ByteBuffer.wrap(raw).order(order)
        var r = 0
        while (r < rows) {
          var prev = 0L
          var c = 0
          while (c < rowW) {
            val p = (r * rowW + c) * bps
            val v: Double = fmt match {
              case 3 if bits == 64 => rb.getDouble(p)
              case 3               => rb.getFloat(p).toDouble
              case _ =>
                var iv: Long = bits match {
                  case 8  => if (fmt == 2) raw(p).toLong else (raw(p) & 0xff).toLong
                  case 16 => if (fmt == 2) rb.getShort(p).toLong else (rb.getShort(p) & 0xffff).toLong
                  case 32 => if (fmt == 2) rb.getInt(p).toLong else rb.getInt(p).toLong & 0xffffffffL
                }
                if (predictor == 2) {
                  iv += prev
                  // wrap to the sample width, as the spec's modular
                  // arithmetic requires, then re-sign-extend
                  iv = bits match {
                    case 8  => if (fmt == 2) iv.toByte.toLong else iv & 0xffL
                    case 16 => if (fmt == 2) iv.toShort.toLong else iv & 0xffffL
                    case 32 => if (fmt == 2) iv.toInt.toLong else iv & 0xffffffffL
                  }
                  prev = iv
                }
                iv.toDouble
            }
            val gr = dstRow + r
            val gc = dstCol + c
            // out-of-bounds = edge padding of a tile: parsed, dropped
            if (gr < h && gc < w) px(gr * w + gc) = v
            c += 1
          }
          r += 1
        }
        true
      }

      val tiled = tags.contains(324)
      if (tiled) {
        val tw = t1(322).toInt
        val th = t1(323).toInt
        if (tw <= 0 || th <= 0) return None
        val offs = tags.getOrElse(324, return None)
        val cnts = tags.getOrElse(325, return None)
        val across = (w + tw - 1) / tw
        val down = (h + th - 1) / th
        if (offs.length != across * down || cnts.length != offs.length) return None
        var ty = 0
        while (ty < down) {
          var tx = 0
          while (tx < across) {
            val k = ty * across + tx
            if (!readSegment(offs(k), cnts(k), th, tw, ty * th, tx * tw)) return None
            tx += 1
          }
          ty += 1
        }
      } else {
        val offs = tags.getOrElse(273, return None)
        val cnts = tags.getOrElse(279, return None)
        if (cnts.length != offs.length || offs.isEmpty) return None
        val rps = math.max(1, t1(278, h.toLong).toInt)
        if ((h + rps - 1) / rps != offs.length) return None
        var s = 0
        while (s < offs.length) {
          val rows = math.min(rps, h - s * rps)
          if (!readSegment(offs(s), cnts(s), rows, w, s * rps, 0)) return None
          s += 1
        }
      }
      Some(Raster(w, h, px))
    } catch { case _: Exception => None }
  }

  // ---- zlib deflate (TIFF compression 8 / 32946) ----------------------

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def inflate(bytes: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(bytes, off, len)
      val out = new Array[Byte](maxOut)
      var pos = 0
      while (pos < maxOut && !inf.finished()) {
        val got = inf.inflate(out, pos, maxOut - pos)
        if (got == 0 && inf.needsInput()) return null // truncated stream
        pos += got
      }
      if (pos == maxOut) out else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  // ---- PackBits (TIFF compression 32773, spec §9) ---------------------

  private def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 128 + 1)
    var i = 0
    while (i < data.length) {
      // find run length at i
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal stretch: until a run of >=3 starts (2-byte runs aren't
        // worth breaking a literal for) or 128 bytes
        var lit = 1
        var continue = true
        while (continue && i + lit < data.length && lit < 128) {
          if (i + lit + 2 < data.length &&
              data(i + lit) == data(i + lit + 1) && data(i + lit) == data(i + lit + 2))
            continue = false
          else lit += 1
        }
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  private def packBitsDecode(bytes: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    val out = new Array[Byte](maxOut)
    var i = off
    val end = off + len
    var pos = 0
    while (i < end && pos < maxOut) {
      val nv = bytes(i).toInt
      i += 1
      if (nv >= 0) {
        val cnt = nv + 1
        if (i + cnt > end || pos + cnt > maxOut) return null
        System.arraycopy(bytes, i, out, pos, cnt)
        i += cnt; pos += cnt
      } else if (nv != -128) {
        val cnt = 1 - nv
        if (i >= end || pos + cnt > maxOut) return null
        java.util.Arrays.fill(out, pos, pos + cnt, bytes(i))
        i += 1; pos += cnt
      } // -128: no-op per spec
    }
    if (pos == maxOut) out else null
  }

  // ---- LZW (TIFF compression 5, spec §13) -----------------------------
  //
  // MSB-first bit packing; codes 0–255 literal, 256 = Clear, 257 = EOI,
  // table entries from 258; code width starts at 9 and uses the spec's
  // "early change": the writer bumps the width as soon as the NEXT code
  // to be added would not fit, one step earlier than classic GIF-LZW.
  // Encoder and decoder below are the matched pair (round-trip
  // property-tested through 12-bit codes and Clear resets).

  private val LzwClear = 256
  private val LzwEoi = 257

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var bits = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << bits) | code
      bitCnt += bits
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    // (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var nextCode = 258
    put(LzwClear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = Integer.valueOf((prefix << 8) | b)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          if (nextCode == (1 << bits) - 1 && bits < 12) bits += 1
          else if (nextCode >= 4094) { // table nearly full: reset
            put(LzwClear)
            dict = new java.util.HashMap[Integer, Integer](4096)
            nextCode = 258
            bits = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    put(LzwEoi)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** Returns null on corrupt input. */
  private def lzwDecode(bytes: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    val out = new Array[Byte](maxOut)
    var pos = 0
    var bitPos = off.toLong * 8
    val bitEnd = (off + len).toLong * 8
    var bits = 9
    def next(): Int = {
      if (bitPos + bits > bitEnd) return LzwEoi
      var v = 0
      var i = 0
      while (i < bits) {
        val b = bytes((bitPos >> 3).toInt) & 0xff
        v = (v << 1) | ((b >> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    // table(code) = (prefixCode, firstByte, lastByte, length); literals implied
    val prefixOf = new Array[Int](4096)
    val lastOf = new Array[Byte](4096)
    val firstOf = new Array[Byte](4096)
    val lenOf = new Array[Int](4096)
    var c = 0
    while (c < 256) { prefixOf(c) = -1; firstOf(c) = c.toByte; lastOf(c) = c.toByte; lenOf(c) = 1; c += 1 }
    var tableSize = 258
    var prev = -1
    def emit(code: Int): Boolean = { // write expansion of `code` at pos
      val l = lenOf(code)
      if (pos + l > maxOut) return false
      var p = pos + l - 1
      var cc = code
      while (cc >= 0) { out(p) = lastOf(cc); p -= 1; cc = prefixOf(cc) }
      pos += l
      true
    }
    var done = false
    while (!done) {
      val code = next()
      if (code == LzwEoi) done = true
      else if (code == LzwClear) { tableSize = 258; bits = 9; prev = -1 }
      else {
        if (code > tableSize || (code == tableSize && prev < 0)) return null
        if (prev >= 0 && tableSize < 4096) {
          // entry under construction: prev + firstByte(current)
          val firstB = if (code == tableSize) firstOf(prev) else firstOf(code)
          prefixOf(tableSize) = prev
          firstOf(tableSize) = firstOf(prev)
          lastOf(tableSize) = firstB
          lenOf(tableSize) = lenOf(prev) + 1
          tableSize += 1
        }
        if (!emit(code)) return null
        if (tableSize == (1 << bits) - 2 && bits < 12) bits += 1
        prev = code
        if (pos == maxOut) {
          // consume trailing EOI if present; either way we're complete
          done = true
        }
      }
    }
    if (pos == maxOut) out else null
  }
}
