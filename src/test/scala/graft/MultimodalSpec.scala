package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Contract of the REAL RIFF/WAVE codec in [[operators.Multimodal]]:
  * encode produces spec-conformant containers (alignment pads, size
  * fields), parse walks chunks rather than assuming offsets, stats are
  * exact, and malformed bytes are rejected loudly instead of decoded into
  * garbage. */
class MultimodalSpec extends AnyFunSuite {

  private def sampleBytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  test("encode → parse round-trips header fields and sample stats") {
    for (n <- Seq(1, 2, 7, 256, 1001)) { // odd sizes exercise the pad path
      val payload = sampleBytes(n)
      val container = Multimodal.encodeWav(payload, sampleRate = 8000)
      val (rate, ch, bits, samples, sum, mx, mn) = Multimodal.parseWav(container)
      assert((rate, ch, bits) == ((8000, 1, 8)))
      assert(samples == n.toLong)
      assert(sum == payload.map(_ & 0xff).map(_.toLong).sum)
      assert(mx == payload.map(_ & 0xff).max)
      assert(mn == payload.map(_ & 0xff).min)
      // RIFF word alignment: total size even, and the size field honest
      assert(container.length % 2 == 0, s"unaligned container at n=$n")
      assert(container.length == 76 + n + n % 2, s"layout size at n=$n")
    }
  }

  test("parser walks chunks — it does not assume the canonical 44-byte offset") {
    // encodeWav inserts a LIST/INFO chunk between fmt and data; a parser
    // seeking straight to offset 44 would read the LIST header as data.
    val container = Multimodal.encodeWav(sampleBytes(64))
    val listAt = container.indexOfSlice("LIST".getBytes("US-ASCII"))
    val dataAt = container.indexOfSlice("data".getBytes("US-ASCII"))
    // canonical layout puts the data chunk header at offset 36 (12-byte
    // RIFF/WAVE preamble + 24-byte fmt chunk); the LIST chunk sits there
    // instead, so a parser hardcoding 36/44 reads metadata as samples
    assert(listAt == 36 && dataAt > listAt,
      "the decoy LIST chunk must sit where a naive parser expects data")
  }

  test("malformed containers are rejected, not silently decoded") {
    val good = Multimodal.encodeWav(sampleBytes(32))
    def corrupt(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.parseWav(corrupt(b => b(0) = 'X'.toByte))
    }
    intercept[IllegalArgumentException] { // RIFF size disagrees with length
      Multimodal.parseWav(corrupt(b => b(4) = (b(4) + 1).toByte))
    }
    intercept[IllegalArgumentException] { // form is not WAVE
      Multimodal.parseWav(corrupt(b => b(8) = 'X'.toByte))
    }
    intercept[IllegalArgumentException] { // non-PCM format code
      Multimodal.parseWav(corrupt(b => b(20) = 3.toByte))
    }
  }

  // --- BMP codec (the image sibling) ---------------------------------------

  test("BMP encode → parse round-trips geometry, stats, and the corners") {
    // n = 41 exactly fills one row; 42 forces a zero-filled tail; 1001
    // spans many rows — all with width 41, whose 123-byte rows force the
    // 4-byte stride pad
    for (n <- Seq(1, 40, 41, 42, 82, 1001)) {
      val payload = sampleBytes(n)
      val container = Multimodal.encodeBmp(payload)
      val (w, h, bpp, nPix, sum, mx, mn, first, last, stride) =
        Multimodal.parseBmp(container)
      val hExp = (n + 40) / 41
      assert((w, h, bpp, stride) == ((41, hExp, 24, 124)), s"geometry at n=$n")
      assert(nPix == 41L * hExp)
      assert(sum == payload.map(_ & 0xff).map(_.toLong).sum, s"sum at n=$n")
      assert(mx == payload.map(_ & 0xff).max)
      val padded = 41 * hExp > n
      assert(mn == (if (padded) 0 else payload.map(_ & 0xff).min), s"min at n=$n")
      // position-sensitive corners: prove the bottom-up un-flip
      assert(first == (payload(0) & 0xff), s"first px at n=$n")
      assert(last == (if (padded) 0 else payload(n - 1) & 0xff), s"last px at n=$n")
      assert(container.length == 54 + 124 * hExp, s"layout size at n=$n")
    }
  }

  test("BMP rows are stored bottom-up — a no-flip parser reads the wrong corner") {
    // payload long enough for 2 rows, with distinct first and last bytes
    val payload = sampleBytes(82) // exactly 2 full rows, no padding
    val container = Multimodal.encodeBmp(payload)
    // physical first pixel row in the file is the LAST logical row: its
    // first pixel must be payload(41), not payload(0)
    val firstPhysicalPixel = container(54) & 0xff
    assert(firstPhysicalPixel == (payload(41) & 0xff),
      "bottom-up storage: physical row 0 is logical row h-1")
    val (_, _, _, _, _, _, _, first, _, _) = Multimodal.parseBmp(container)
    assert(first == (payload(0) & 0xff), "parser un-flips to logical order")
  }

  test("malformed BMP containers are rejected") {
    val good = Multimodal.encodeBmp(sampleBytes(100))
    def corrupt(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.parseBmp(corrupt(b => b(0) = 'X'.toByte))
    }
    intercept[IllegalArgumentException] { // file size field disagrees
      Multimodal.parseBmp(corrupt(b => b(2) = (b(2) + 1).toByte))
    }
    intercept[IllegalArgumentException] { // not a BITMAPINFOHEADER
      Multimodal.parseBmp(corrupt(b => b(14) = 39.toByte))
    }
    intercept[IllegalArgumentException] { // unsupported bpp
      Multimodal.parseBmp(corrupt(b => b(28) = 8.toByte))
    }
    intercept[IllegalArgumentException] { // compression flag set
      Multimodal.parseBmp(corrupt(b => b(30) = 1.toByte))
    }
    intercept[IllegalArgumentException] { // non-gray pixel
      Multimodal.parseBmp(corrupt(b => b(55) = (b(55) + 1).toByte))
    }
    intercept[IllegalArgumentException] { // empty payload refused at encode
      Multimodal.encodeBmp(Array.empty[Byte])
    }
  }
}
