package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads as opaque `binary` columns with
  * typed metadata structs, and a partition-batched decode stage.
  *
  * The real decode (image/audio codecs) is STUBBED — those libraries are
  * not in this container — behind [[decodeStub]]'s deterministic fake: the
  * Spark-side plumbing (schema, binary payloads, mapPartitions batch shape,
  * typed output encoder) is real and tested, and a codec only replaces the
  * body of the per-record function. This is the Scala twin of a Python
  * `mapInPandas` decode stage: per-partition iterator in, iterator out, no
  * per-row driver round-trips, codec state reusable across a partition.
  */
object Multimodal {

  /** Decoded-media metadata row (what a real image decode would yield:
    * dimensions + channel info, here derived deterministically from the
    * payload bytes so results are oracle-checkable). */
  final case class MediaMeta(doc_id: Long, byte_len: Int, fake_width: Int,
      fake_height: Int, lang: String)

  /** Attach an opaque binary payload + typed metadata struct to each doc —
    * the multimodal table layout: payload column stays unread unless
    * projected (parquet column pruning makes metadata-only queries cheap
    * even when payloads are megabytes). */
  def attachPayload(docs: DataFrame): DataFrame = docs
    .withColumn("payload", col("text").cast("binary"))
    .withColumn("meta", struct(col("lang"), col("source"), col("n_chars")))

  /** Partition-batched "decode": one codec instantiation per partition,
    * streaming iterator over records. STUB body — replace the MediaMeta
    * construction with a real codec call to productionize. */
  def decodeStub(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { records =>
        // a real implementation would initialize the codec here, once
        records.map { case (id, bytes, lang) =>
          val len = bytes.length
          MediaMeta(id, len, len % 640, (len * 7) % 480, lang)
        }
      }
  }

  /** One sampled frame of a video-like payload: evenly-spaced byte ranges,
    * fingerprinted. A real frame sampler only replaces the slice with a
    * container-format seek+decode; the 1-row→N-rows generator shape, the
    * per-partition batching, and the downstream schema stay identical. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int,
      frame_md5: String)

  /** Frame sampling (video → N evenly-spaced frames), partition-batched.
    * Deterministic stub: frame f of n is the byte range
    * [f·len/n, (f+1)·len/n) of the payload; the fingerprint is its md5 —
    * both restatable by a SQL oracle over the source text. Emits only
    * non-empty frames (payloads shorter than n bytes yield fewer). */
  def frameSampleStub(spark: SparkSession, withPayload: DataFrame,
      nFrames: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { records =>
        val md = java.security.MessageDigest.getInstance("MD5") // per partition
        records.flatMap { case (id, bytes) =>
          val len = bytes.length
          (0 until nFrames).iterator
            .map(f => (f, (f * len) / nFrames, ((f + 1) * len) / nFrames))
            .filter { case (_, start, end) => end > start }
            .map { case (f, start, end) =>
              md.reset()
              val hex = md.digest(java.util.Arrays.copyOfRange(bytes, start, end))
                .map("%02x".format(_)).mkString
              Frame(id, f, end - start, hex)
            }
        }
      }
  }

  /** Per-frame "feature extraction" — a deterministic integer-mixer stub in
    * place of a real vision embedding. Declarative (codegen) on purpose:
    * after decode, feature math should live in the plan, not in opaque
    * closures, so it prunes/pushes down like any other projection. */
  def frameFeatures(frames: DataFrame, nFeatures: Int = 4): DataFrame =
    (0 until nFeatures).foldLeft(frames) { (df, j) =>
      df.withColumn(s"feat_$j",
        ((col("frame_len") * (j + 1) + col("frame_idx") * 31 +
          col("doc_id") * 17) * lit(2654435761L) % 1000).cast("double") / 1000.0)
    }

  // ---------------------------------------------------------------------
  // Real container codec: RIFF/WAVE. Unlike decodeStub (a documented fake
  // for codecs whose libraries this container lacks), this path does a
  // GENUINE byte-level parse — magic validation, little-endian field
  // reads, chunk walking with word-alignment padding — over well-formed
  // WAV containers built from the payload bytes (8-bit mono PCM). The
  // encode is a deterministic Spark-side transformation, so an oracle can
  // restate the decoded sample statistics from the same source bytes;
  // the decode never assumes the canonical 44-byte layout (an extra
  // LIST/INFO chunk sits between fmt and data precisely so a
  // seek-to-offset-44 shortcut would fail loudly).
  // ---------------------------------------------------------------------

  /** Build a genuine RIFF/WAVE container around `payload` interpreted as
    * unsigned 8-bit mono PCM samples: RIFF header, canonical fmt chunk,
    * a LIST/INFO/ICMT metadata chunk, then the data chunk (padded to word
    * alignment when the sample count is odd, per the RIFF spec). */
  def encodeWav(payload: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val comment = "graft-wav-v1".getBytes("US-ASCII") // even length — no pad
    val listBody = 4 + 8 + comment.length // "INFO" + ICMT header + body
    val dataPad = payload.length % 2
    val riffSize = 4 + (8 + 16) + (8 + listBody) + (8 + payload.length + dataPad)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate = rate * channels * bits/8
      .putShort(1) // block align
      .putShort(8) // bits per sample
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      .put("INFO".getBytes("US-ASCII"))
      .put("ICMT".getBytes("US-ASCII")).putInt(comment.length).put(comment)
    out.put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    if (dataPad == 1) out.put(0.toByte)
    out.array()
  }

  /** Decoded WAV facts: header fields as parsed plus PCM sample stats
    * (unsigned 8-bit domain) and the container's total size. */
  final case class WavMeta(doc_id: Long, sample_rate: Int, n_channels: Int,
      bits: Int, n_samples: Long, amp_sum: Long, amp_max: Int, amp_min: Int,
      container_bytes: Long)

  /** Parse one RIFF/WAVE container: validate magic, walk chunks (honoring
    * word-alignment pads) to find fmt and data, read little-endian header
    * fields, aggregate the PCM samples. Throws on malformed input — a
    * decoder that silently invents values for bad bytes poisons every
    * downstream stat. */
  def parseWav(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    val riffSize = bb.getInt
    require(riffSize == bytes.length - 8, s"RIFF size field $riffSize " +
      s"disagrees with container length ${bytes.length}")
    require(fourcc() == "WAVE", "RIFF form is not WAVE")
    var rate, channels, bits = -1
    var dataOff, dataLen = -1
    while (bb.remaining() >= 8 && dataOff < 0) {
      val id = fourcc()
      val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort == 1, "not PCM")
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          bits = bb.getShort.toInt
          bb.position(fmtEnd + (size % 2))
        case "data" =>
          dataOff = bb.position(); dataLen = size
        case _ => // LIST/INFO etc.: skip body + word-alignment pad
          bb.position(bb.position() + size + (size % 2))
      }
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 8 && channels == 1, s"unsupported layout: $bits-bit x$channels")
    var i = dataOff
    var sum = 0L
    var mx = 0
    var mn = 255
    while (i < dataOff + dataLen) {
      val v = bytes(i) & 0xff
      sum += v
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    (rate, channels, bits, dataLen.toLong, sum, mx, mn)
  }

  /** Partition-batched real decode: payload → WAV container → parsed
    * stats. Same mapPartitions batch shape as [[decodeStub]], with an
    * actual codec in the body. */
  def decodeWav(spark: SparkSession, withPayload: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { records =>
        records.map { case (id, payload) =>
          val container = encodeWav(payload)
          val (rate, ch, bits, n, sum, mx, mn) = parseWav(container)
          WavMeta(id, rate, ch, bits, n, sum, mx, mn, container.length.toLong)
        }
      }
  }

  // ---------------------------------------------------------------------
  // Real container codec #2: Windows BMP (24-bit uncompressed). The image
  // sibling of the WAV path: payload bytes become grayscale pixels of a
  // 41-px-wide image (41·3 = 123-byte rows force the 4-byte row-stride
  // padding a naive parser forgets), stored BOTTOM-UP per the BMP spec
  // (first_px/last_px are position-sensitive, so a parser that skips the
  // vertical flip or miswalks the stride fails the oracle loudly, not
  // just on exotic stats). Tail pixels of the last row are zero-filled —
  // the oracle models that fill with explicit arithmetic.
  // ---------------------------------------------------------------------

  /** Build a genuine BMP container: BITMAPFILEHEADER + BITMAPINFOHEADER +
    * bottom-up 24-bit pixel rows (B=G=R = payload byte, zero-filled tail),
    * each row padded to a 4-byte boundary. */
  def encodeBmp(payload: Array[Byte], width: Int = 41): Array[Byte] = {
    require(payload.nonEmpty, "empty payload")
    val h = (payload.length + width - 1) / width
    val stride = ((width * 3 + 3) / 4) * 4
    val fileSize = 54 + stride * h
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(width).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var rowPhys = 0
    while (rowPhys < h) {
      val rowLogical = h - 1 - rowPhys // bottom-up storage
      var x = 0
      while (x < width) {
        val idx = rowLogical * width + x
        val v = if (idx < payload.length) payload(idx) else 0.toByte
        out.put(v).put(v).put(v)
        x += 1
      }
      var p = width * 3
      while (p < stride) { out.put(0.toByte); p += 1 }
      rowPhys += 1
    }
    out.array()
  }

  /** Decoded BMP facts: geometry as parsed plus grayscale pixel stats over
    * the FULL pixel grid (zero-fill included — the container's truth) and
    * the position-sensitive corners that prove the bottom-up walk. */
  final case class BmpMeta(doc_id: Long, width: Int, height: Int, bpp: Int,
      n_pixels: Long, px_sum: Long, px_max: Int, px_min: Int, first_px: Int,
      last_px: Int, row_stride: Int, container_bytes: Long)

  /** Parse one BMP container: validate both headers field-by-field, walk
    * the bottom-up padded rows, check gray consistency (B=G=R), aggregate
    * pixel stats in LOGICAL (top-down) order. Throws on malformed input. */
  def parseBmp(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Int, Int, Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    val fileSize = bb.getInt
    require(fileSize == bytes.length, s"file size field $fileSize " +
      s"disagrees with container length ${bytes.length}")
    bb.getShort; bb.getShort
    val pixOff = bb.getInt
    require(bb.getInt == 40, "not a BITMAPINFOHEADER")
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0, s"unsupported geometry ${width}x$height")
    require(bb.getShort == 1, "planes != 1")
    val bpp = bb.getShort.toInt
    require(bpp == 24, s"unsupported bpp $bpp")
    require(bb.getInt == 0, "compressed BMP unsupported")
    val stride = ((width * 3 + 3) / 4) * 4
    require(pixOff + stride.toLong * height <= bytes.length, "truncated pixel array")
    var sum = 0L
    var mx = 0
    var mn = 255
    var first = -1
    var last = -1
    var rowLogical = 0
    while (rowLogical < height) {
      val rowPhys = height - 1 - rowLogical // un-flip the bottom-up rows
      val rowOff = pixOff + rowPhys * stride
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        val v = bytes(o) & 0xff
        require((bytes(o + 1) & 0xff) == v && (bytes(o + 2) & 0xff) == v,
          s"non-gray pixel at ($x, $rowLogical)")
        sum += v
        if (v > mx) mx = v
        if (v < mn) mn = v
        if (rowLogical == 0 && x == 0) first = v
        if (rowLogical == height - 1 && x == width - 1) last = v
        x += 1
      }
      rowLogical += 1
    }
    (width, height, bpp, width.toLong * height, sum, mx, mn, first, last, stride)
  }

  /** Partition-batched real decode: payload → BMP container → parsed
    * stats. Same mapPartitions batch shape as [[decodeWav]]. */
  def decodeBmp(spark: SparkSession, withPayload: DataFrame): Dataset[BmpMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { records =>
        records.map { case (id, payload) =>
          val container = encodeBmp(payload)
          val (w, h, bpp, n, sum, mx, mn, first, last, stride) = parseBmp(container)
          BmpMeta(id, w, h, bpp, n, sum, mx, mn, first, last, stride,
            container.length.toLong)
        }
      }
  }

  /** "Resize" stub over the payload, fully declarative: a crop (first
    * `cropBytes` bytes — substring works on binary) and a 2:1 downsample
    * (every other byte via regex pair-collapse). Real image resize replaces
    * the two expressions with a codec UDF; fingerprints keep the stub
    * oracle-checkable. */
  def resizeStub(withPayload: DataFrame, cropBytes: Int = 256): DataFrame =
    withPayload.select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      md5(substring(col("payload"), 1, cropBytes)).as("crop_md5"),
      md5(regexp_replace(col("text"), "(.).", "$1")).as("half_md5"),
      length(regexp_replace(col("text"), "(.).", "$1")).as("half_len"))
}
