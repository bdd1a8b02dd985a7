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
}
