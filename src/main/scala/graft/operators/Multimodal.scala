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
}
