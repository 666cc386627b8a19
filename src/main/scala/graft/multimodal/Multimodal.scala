package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media row: bytes + typed metadata travelling through Spark as
  * ordinary columns (`binary` + scalars). This is the 100 TB multimodal
  * pattern: the engine never interprets media server-side; partitioning,
  * shuffling, and predicate pushdown all operate on the narrow metadata
  * columns, and the (huge) `bytes` column is only touched inside the
  * decode `mapPartitions`.
  */
final case class MediaRow(
    media_id: Long,
    media_type: String,
    bytes: Array[Byte])

/** Decoded features: deterministic metadata a real codec would produce. */
final case class DecodedMedia(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    checksum: Long)

/** Resize output: original + resized payload metadata (the payload itself
  * stays on the executor — only narrow features leave the map stage).
  */
final case class ResizedMedia(
    media_id: Long,
    n_bytes: Long,
    n_bytes_resized: Long,
    width_r: Int,
    height_r: Int,
    checksum_r: Long)

/** Multimodal column handling — decode / feature-extract / frame-sample
  * over binary columns (beyond-parity LLM-pipeline surface).
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs exist
  * in this offline container): it derives deterministic fake dimensions
  * from the byte stream. The Spark-side plumbing — binary schema, typed
  * `Dataset` encoders, partition-batched iteration, narrow-column
  * pushdown — is real and oracle-tested.
  */
object Multimodal {

  /** STUB — replace with a real codec (e.g. javax.imageio / ffmpeg JNI)
    * when available. Deterministic so the DuckDB oracle can reproduce it:
    *   width  = 16 + n_bytes mod 240
    *   height = 16 + (7 * n_bytes) mod 240
    *   checksum = sum of byte values mod 997
    * A real implementation keeps the exact same signature: bytes in,
    * scalar features out, no driver involvement.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length.toLong
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    ((16 + n % 240).toInt, (16 + (7 * n) % 240).toInt, sum % 997)
  }

  /** Decode a media dataset partition-by-partition. Executors stream rows
    * (no per-partition materialization), so memory stays bounded by one
    * row's media size regardless of partition row count.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init goes here in a real codec (native lib handles,
      // thread-local buffers) — amortized across the whole partition
      rows.map { m =>
        val (w, h, cks) = decodeStub(m.bytes)
        DecodedMedia(m.media_id, m.media_type, m.bytes.length.toLong, w, h, cks)
      }
    }
  }

  /** STUB resize — a real implementation decodes, rescales, re-encodes
    * (e.g. imageio/libvips JNI) with the same bytes-in/bytes-out shape.
    * The stub keeps every `factor`-th byte (a stride resample — the 1-D
    * analogue of nearest-neighbour downscaling) so the arithmetic is
    * reproducible by the DuckDB oracle.
    */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Resize a media dataset partition-by-partition; emits original +
    * resized feature metadata. Streams rows like [[decode]] — executor
    * memory stays bounded by one row's media regardless of partition size.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val r = resizeStub(m.bytes, factor)
        val (w, h, cks) = decodeStub(r)
        ResizedMedia(m.media_id, m.bytes.length.toLong, r.length.toLong,
          w, h, cks)
      }
    }
  }

  /** Sample every `stride`-th fixed-size frame from a binary payload —
    * the video-frame-sampling access pattern, as a pure column expression
    * (no decode needed for byte-range math; a real pipeline hands the
    * sampled ranges to the codec). SQL form: dynamic substring offsets
    * need expression arguments the Scala `substring` helper doesn't take.
    */
  def sampleFrames(bytesColName: String, frameSize: Int,
                   stride: Int): org.apache.spark.sql.Column = {
    val step = frameSize * stride
    expr(s"""
      transform(
        sequence(0, (length(`$bytesColName`) - 1) div $step),
        i -> substring(`$bytesColName`, 1 + i * $step, $frameSize))""")
  }

  /** Synthetic media table derived from `documents` (UTF-8 text bytes as
    * the opaque payload) — the container ships no real media, but the
    * schema and flow match a parquet table with a true binary column.
    */
  def mediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("image/fake-"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
