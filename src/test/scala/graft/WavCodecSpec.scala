package graft

import graft.ops.WavCodec
import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  test("16-bit mono round-trip") {
    val s = Array.tabulate(480)(t => ((t * 37) % 2003) - 1001)
    val w = WavCodec.decode(WavCodec.encode(s, 8000, 1)).get
    assert(w.sampleRate == 8000 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.samples.sameElements(s))
    assert(w.nFrames == 480)
  }

  test("16-bit stereo keeps interleaving and frame addressing") {
    val s = Array.tabulate(200)(i => if (i % 2 == 0) i * 3 else -i * 5)
    val w = WavCodec.decode(WavCodec.encode(s, 44100, 2)).get
    assert(w.channels == 2 && w.nFrames == 100)
    assert(w.at(7, 0) == s(14) && w.at(7, 1) == s(15))
  }

  test("8-bit PCM re-centers the on-disk unsigned bytes to signed") {
    val s = Array.tabulate(64)(i => (i * 5) % 120 - 60)
    val w = WavCodec.decode(WavCodec.encode(s, 16000, 1, bits = 8)).get
    assert(w.bitsPerSample == 8)
    assert(w.samples.sameElements(s))
  }

  test("ancillary LIST chunk (odd length + pad byte) is skipped") {
    val s = Array.tabulate(32)(i => i * 100 - 1600)
    val bytes = WavCodec.encode(s, 22050, 1, junkChunk = true)
    val w = WavCodec.decode(bytes).get
    assert(w.samples.sameElements(s))
  }

  test("malformed payloads decode to None, never throw") {
    val good = WavCodec.encode(Array.tabulate(16)(_ * 3), 8000, 1)
    assert(WavCodec.decode("<html>err</html>".getBytes).isEmpty)
    assert(WavCodec.decode(good.dropRight(5)).isEmpty)  // truncated data chunk
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    // float PCM (format tag 3) is unsupported -> None
    val floatTag = good.clone()
    floatTag(20) = 3 // fmt tag lives at offset 20
    assert(WavCodec.decode(floatTag).isEmpty)
  }
}
