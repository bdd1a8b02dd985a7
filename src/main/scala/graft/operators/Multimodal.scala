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
