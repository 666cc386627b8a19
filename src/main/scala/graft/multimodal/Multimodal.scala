package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

/** Frame-strip media row: the payload is a vertical strip of equal-height
  * frames and `frame_height` travels as typed metadata next to the bytes
  * (the brief's "binary columns with typed metadata" — a real pipeline
  * carries frame geometry in the row, not inside the codec).
  */
final case class FrameMediaRow(
    media_id: Long,
    frame_height: Int,
    bytes: Array[Byte])

/** Decoded image features from a REAL codec pass. */
final case class DecodedMedia(
    media_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    checksum: Long)

/** Resize output: decoded-then-rescaled-then-re-encoded feature metadata
  * (the payloads stay on the executor — only narrow features leave the
  * map stage).
  */
final case class ResizedMedia(
    media_id: Long,
    width_r: Int,
    height_r: Int,
    checksum_r: Long)

/** Frame-sampling output: every `stride`-th frame of the strip, decoded
  * and checksummed.
  */
final case class SampledFrames(
    media_id: Long,
    n_frames: Int,
    n_frames_sampled: Int,
    sampled_checksum: Long)

/** Multimodal column handling — decode / resize / frame-sample over
  * binary columns (beyond-parity LLM-pipeline surface).
  *
  * The codec is REAL since round 15: `javax.imageio` (pure JDK, no
  * native/network dependency) decodes and re-encodes PNG, and the resize
  * is a `java.awt.Graphics2D` pass with a pinned NEAREST_NEIGHBOR
  * interpolation hint. The container ships no media files, so the test
  * payloads are deterministic synthetic PNGs generated in-plan
  * ([[syntheticPng]]) whose pixel values follow a closed form in
  * (media_id, x, y) — which is what lets an engine-independent oracle
  * (DuckDB) predict the DECODED features without running a codec: if the
  * encode→decode round trip is anything but lossless-and-exact, the gate
  * hashes diverge. PNG is lossless by spec, so the checksums double as a
  * codec-correctness check, not just plumbing coverage.
  *
  * VIDEO stays out of scope: the JDK ships no video codec and the
  * container has no ffmpeg/JNI, so there is no real decode path to gate.
  * The honest remainder is [[sampleFrames]] — pure byte-range arithmetic
  * that slices an opaque payload into frame-sized ranges for an EXTERNAL
  * decoder, never interpreting the bytes.
  */
object Multimodal {

  // keep ImageIO in-memory on executors: the default pipes every
  // encode/decode through a disk-backed cache file, which is pure
  // overhead at one-small-image-per-row granularity
  ImageIO.setUseCache(false)

  /** Closed-form pixel model shared by the generator, the decoder specs,
    * and the DuckDB oracles (all BIGINT-safe arithmetic):
    *   width        = 16 + 2·(id mod 24)          (even, 16..62)
    *   frame height = 16 + 2·((7·id) mod 24)      (even, 16..62)
    *   red(x)   = (5·x + id) mod 256  — varies along x only
    *   green(y) = (11·y)     mod 256  — varies along y only
    *   blue     = id mod 256          — constant per image
    * Separable channels keep the oracle's checksum a 1-D sum per axis
    * instead of a W×H double loop.
    */
  def synthWidth(id: Long): Int = (16 + 2 * (id % 24)).toInt
  def synthFrameHeight(id: Long): Int = (16 + 2 * ((7 * id) % 24)).toInt
  def synthRed(id: Long, x: Int): Int = ((5L * x + id) % 256).toInt
  def synthGreen(y: Int): Int = ((11L * y) % 256).toInt
  def synthBlue(id: Long): Int = (id % 256).toInt

  /** A REAL PNG (decodable by any codec) whose pixels follow the closed
    * form above; `frames` equal-height frames are stacked vertically
    * (frame k covers rows [k·frameHeight, (k+1)·frameHeight)). Encoding
    * runs on the executor inside the generating map — the driver never
    * sees a payload.
    */
  def syntheticPng(id: Long, frames: Int = 1): Array[Byte] = {
    val w = synthWidth(id)
    val hf = synthFrameHeight(id)
    val h = hf * frames
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val g = synthGreen(y)
      var x = 0
      while (x < w) {
        px(y * w + x) =
          (synthRed(id, x) << 16) | (g << 8) | synthBlue(id)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Sum of (r+g+b) over every pixel — the deterministic feature the
    * oracle replays in closed form. Bulk getRGB keeps this one array
    * scan per image.
    */
  private def pixelChecksum(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      i += 1
    }
    sum
  }

  /** REAL decode: bytes → BufferedImage via javax.imageio. Fails loudly
    * on undecodable payloads (a silent skip would undercount a corpus).
    */
  def decodeImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException(
      s"decode: payload of ${bytes.length} bytes is not a decodable " +
        "image (ImageIO found no reader)")
    img
  }

  /** REAL half-scale: Graphics2D with the NEAREST_NEIGHBOR interpolation
    * hint pinned, dimensions halved exactly (the generator only emits
    * even dims). The JDK's nearest pass inverse-maps destination pixel
    * (x, y) to source (2x+1, 2y+1) — i.e. floor((x+0.5)·2) per axis —
    * which MultimodalSpec pins against the closed form so a JDK
    * rendering change surfaces as a test failure, not a silent oracle
    * drift.
    */
  def resizeHalf(img: BufferedImage): BufferedImage = {
    val w2 = img.getWidth / 2
    val h2 = img.getHeight / 2
    require(img.getWidth % 2 == 0 && img.getHeight % 2 == 0,
      s"resizeHalf: dims ${img.getWidth}x${img.getHeight} must be even")
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g2.drawImage(img, 0, 0, w2, h2, null)
    } finally g2.dispose()
    out
  }

  /** Re-encode as PNG (lossless — the resize gate decodes the RESULT
    * bytes again, so the checksum crosses a full encode→decode round
    * trip in each direction).
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a media dataset partition-by-partition with the REAL codec.
    * Executors stream rows (no per-partition materialization), so memory
    * stays bounded by one row's media size regardless of partition row
    * count; codec state (ImageIO's reader registry) is JVM-wide and
    * amortized across the partition.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = decodeImage(m.bytes)
        DecodedMedia(m.media_id, m.media_type, img.getWidth,
          img.getHeight, pixelChecksum(img))
      }
    }
  }

  /** Decode → half-scale → re-encode → re-decode, per row: the output
    * features come from the SECOND decode, so they witness both codec
    * directions plus the Graphics2D pass. Only narrow features leave
    * the map stage.
    */
  def resize(media: Dataset[MediaRow]): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val resized = decodeImage(encodePng(resizeHalf(decodeImage(m.bytes))))
        ResizedMedia(m.media_id, resized.getWidth, resized.getHeight,
          pixelChecksum(resized))
      }
    }
  }

  /** Sample every `stride`-th frame of each frame-strip payload with the
    * REAL decoder: decode once, then checksum `getSubimage` views (no
    * copies) of the sampled frames. The strip height must be an exact
    * multiple of the row's `frame_height` metadata — a mismatch is a
    * lying row, failed loudly.
    */
  def sampleFrameChecksums(media: Dataset[FrameMediaRow],
      stride: Int): Dataset[SampledFrames] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = decodeImage(m.bytes)
        if (m.frame_height <= 0 || img.getHeight % m.frame_height != 0)
          throw new IllegalArgumentException(
            s"frame sampling: strip height ${img.getHeight} is not a " +
              s"multiple of frame_height ${m.frame_height} " +
              s"(media_id ${m.media_id})")
        val nFrames = img.getHeight / m.frame_height
        var k = 0
        var sampled = 0
        var sum = 0L
        while (k < nFrames) {
          sum += pixelChecksum(img.getSubimage(
            0, k * m.frame_height, img.getWidth, m.frame_height))
          sampled += 1
          k += stride
        }
        SampledFrames(m.media_id, nFrames, sampled, sum)
      }
    }
  }

  /** Byte-range frame sampling over an OPAQUE payload — the video story:
    * the JDK ships no video codec (and this container no ffmpeg), so
    * video stays a binary column whose frames are sliced by pure
    * byte-range arithmetic and handed to an external decoder; the engine
    * never interprets the bytes. Every `stride`-th fixed-size frame, as
    * a column expression (dynamic substring offsets need expression
    * arguments the Scala `substring` helper doesn't take).
    */
  def sampleFrames(bytesColName: String, frameSize: Int,
                   stride: Int): Column = {
    val step = frameSize * stride
    expr(s"""
      transform(
        sequence(0, (length(`$bytesColName`) - 1) div $step),
        i -> substring(`$bytesColName`, 1 + i * $step, $frameSize))""")
  }

  /** Synthetic media table derived from `documents` — REAL PNG payloads
    * generated executor-side from each doc_id (the container ships no
    * media files; the schema and flow match a parquet table with a true
    * binary column, and the closed-form pixels are what give the DuckDB
    * oracle its codec-free replay).
    */
  def mediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, "image/png", syntheticPng(id))))
  }

  /** Frame-strip variant: 1 + (id mod 4) frames stacked vertically, the
    * frame height riding the row as typed metadata.
    */
  def frameMediaFromDocs(docs: DataFrame): Dataset[FrameMediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val frames = (1 + id % 4).toInt
        FrameMediaRow(id, synthFrameHeight(id), syntheticPng(id, frames))
      })
  }
}
