package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal coverage entries — see [[graft.multimodal.Multimodal]].
  * The decode is a deterministic stub (no codecs in the container), so
  * the DuckDB oracle reproduces its arithmetic from the source text: the
  * documents are ASCII, hence byte values == character codes.
  */
object MultimodalQ {

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "q40_multimodal_decode",
      """SELECT doc_id AS media_id,
        |  'image/fake-' || source AS media_type,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(16 + length(text) % 240 AS INT) AS width,
        |  CAST(16 + (7 * length(text)) % 240 AS INT) AS height,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |                               j -> CAST(ascii(text[j]) AS BIGINT)))
        |       % 997 AS BIGINT) AS checksum
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.decode(
        Multimodal.mediaFromDocs(Tables.load(s, dir, "documents"))).toDF()
    },

    // Resize plumbing: stride-resample stub (every 2nd byte) + re-decoded
    // feature metadata; ASCII documents ⇒ the oracle reproduces the byte
    // arithmetic from the text (1-indexed odd positions).
    QueryDef(
      "q41_multimodal_resize",
      """SELECT doc_id AS media_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST((length(text) + 1) // 2 AS BIGINT) AS n_bytes_resized,
        |  CAST(16 + ((length(text) + 1) // 2) % 240 AS INT) AS width_r,
        |  CAST(16 + (7 * ((length(text) + 1) // 2)) % 240 AS INT) AS height_r,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1, 2),
        |                               j -> CAST(ascii(text[j]) AS BIGINT)))
        |       % 997 AS BIGINT) AS checksum_r
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.resize(
        Multimodal.mediaFromDocs(Tables.load(s, dir, "documents")),
        factor = 2).toDF()
    },

    // Frame sampling plumbing: byte-range arithmetic only (the payload
    // stays opaque). frameSize=32, stride=2 ⇒ a 32-byte frame every 64
    // bytes; the last frame may be short. Oracle recomputes counts and
    // total sampled bytes from the same arithmetic.
    QueryDef(
      "q42_multimodal_frames",
      """SELECT doc_id AS media_id,
        |  CAST((length(text) - 1) // 64 + 1 AS BIGINT) AS n_frames,
        |  CAST(list_sum([least(32, length(text) - i * 64)
        |                 for i in range(0, (length(text) - 1) // 64 + 1)])
        |       AS BIGINT) AS sampled_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .withColumn("frames", Multimodal.sampleFrames("payload", 32, 2))
        .select(col("media_id"),
          size(col("frames")).cast("bigint").as("n_frames"),
          aggregate(transform(col("frames"), f => length(f).cast("bigint")),
            lit(0L), (a, x) => a + x).as("sampled_bytes"))
    },
  )
}
