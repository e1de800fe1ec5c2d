package graft

import graft.operators.MultiModal._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-JVM tests of the BMP/WAV codecs — byte-level framing checks
  * that the Spark-side oracle (formula restatement) cannot see, plus
  * malformed-input rejection. */
class MultiModalCodecSpec extends AnyFunSuite with Matchers {

  test("BMP: header bytes are spec-exact (magic, offsets, LE fields)") {
    val b = encodeBmp(7L, 5, 3)
    (b(0).toChar, b(1).toChar) shouldBe (('B', 'M'))
    // stride of a 5-px row = 16 (15 data + 1 pad); file = 54 + 3*16
    b.length shouldBe 54 + 3 * 16
    // little-endian file size at offset 2
    ((b(2) & 0xff) | ((b(3) & 0xff) << 8)) shouldBe b.length
    (b(10) & 0xff) shouldBe 54 // pixel data offset
    (b(14) & 0xff) shouldBe 40 // BITMAPINFOHEADER size
    (b(18) & 0xff) shouldBe 5  // width
    (b(22) & 0xff) shouldBe 3  // height
    (b(28) & 0xff) shouldBe 24 // bpp
  }

  test("BMP: rows stored bottom-up — first file row is the LAST image row") {
    val b = encodeBmp(0L, 2, 2) // pixels top-down: 0,1 / 2,3
    // file row 0 (offset 54) must hold image row 1: values 2,3 (B=G=R)
    (b(54) & 0xff) shouldBe 2
    (b(57) & 0xff) shouldBe 3
    decodeBmp(b).pxSum shouldBe (0 + 1 + 2 + 3)
  }

  test("BMP round-trip at awkward widths (stride padding 0..3)") {
    for (w <- 1 to 8; h <- 1 to 4; id <- Seq(0L, 200L, 99999L)) {
      val info = decodeBmp(encodeBmp(id, w, h))
      info.width shouldBe w
      info.height shouldBe h
      info.bpp shouldBe 24
      info.pxSum shouldBe (0L until w.toLong * h).map(p => (id + p) % 256).sum
    }
  }

  test("BMP: malformed inputs rejected") {
    an[IllegalArgumentException] should be thrownBy decodeBmp(Array[Byte](1, 2, 3))
    val ok = encodeBmp(1L, 4, 4)
    an[IllegalArgumentException] should be thrownBy decodeBmp(ok.take(60)) // truncated pixels
    val wrongMagic = ok.clone(); wrongMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy decodeBmp(wrongMagic)
  }

  test("WAV: canonical 44-byte header then LE int16 samples") {
    val b = encodeWav(3L, 8000, 2)
    new String(b.slice(0, 4), "US-ASCII") shouldBe "RIFF"
    new String(b.slice(8, 12), "US-ASCII") shouldBe "WAVE"
    new String(b.slice(36, 40), "US-ASCII") shouldBe "data"
    b.length shouldBe 44 + 4
    val s0 = (((b(44) & 0xff) | ((b(45) & 0xff) << 8)).toShort).toInt
    s0 shouldBe ((3 * 31) % 2003 - 1001)
  }

  test("WAV round-trip with signed samples") {
    for (id <- Seq(0L, 41L, 123456L); n <- Seq(1, 10, 33)) {
      val info = decodeWav(encodeWav(id, 44100, n))
      info.sampleRate shouldBe 44100
      info.channels shouldBe 1
      info.bits shouldBe 16
      info.nSamples shouldBe n
      info.sampleSum shouldBe (0L until n.toLong).map(i => (id * 31 + i * 7) % 2003 - 1001).sum
    }
  }

  test("WAV: chunk walk survives an extra LIST chunk before data") {
    val base = encodeWav(9L, 16000, 5)
    // splice a 6-byte LIST chunk (odd size → 1 pad byte) between fmt and data
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36) // through end of fmt chunk
    out.write('L'); out.write('I'); out.write('S'); out.write('T')
    out.write(5); out.write(0); out.write(0); out.write(0) // size 5 LE
    out.write(Array[Byte](1, 2, 3, 4, 5)); out.write(0)    // payload + pad
    out.write(base, 36, base.length - 36)
    val spliced = out.toByteArray
    // patch the RIFF size field (offset 4, LE) to the new length - 8
    val riffSz = spliced.length - 8
    spliced(4) = (riffSz & 0xff).toByte
    spliced(5) = ((riffSz >> 8) & 0xff).toByte
    val info = decodeWav(spliced)
    info.nSamples shouldBe 5
    info.sampleSum shouldBe decodeWav(base).sampleSum
  }

  test("WAV: malformed inputs rejected") {
    an[IllegalArgumentException] should be thrownBy decodeWav(Array[Byte](1, 2))
    val ok = encodeWav(1L, 8000, 3)
    val notWave = ok.clone(); notWave(9) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy decodeWav(notWave)
    an[IllegalArgumentException] should be thrownBy decodeWav(ok.take(40)) // truncated data chunk
  }
}
