package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal

/** Multimodal coverage entries — see [[graft.multimodal.Multimodal]].
  * The codec is REAL (`javax.imageio`, round 15): each query generates
  * deterministic synthetic PNGs in-plan, runs them through the actual
  * decode / Graphics2D-resize / re-encode paths, and emits decoded
  * features. The DuckDB oracle replays the generator's closed-form pixel
  * model (fixed bytes in → fixed ints out), so a hash match certifies
  * the full encode→decode round trip, not just the plumbing. Video has
  * no JDK codec and stays out of scope — its access pattern is covered
  * by [[Multimodal.sampleFrames]] byte-range slicing (MultimodalSpec).
  *
  * Shared closed form (all BIGINT arithmetic; id = doc_id):
  *   w  = 16 + 2·(id % 24)        h_frame = 16 + 2·((7·id) % 24)
  *   r(x) = (5x + id) % 256       g(y) = (11y) % 256     b = id % 256
  *   checksum = Σ pixels (r+g+b)  — separable: h·Σr + w·Σg + w·h·b
  */
object MultimodalQ {

  val entries: Seq[QueryDef] = Seq(

    // REAL ImageIO decode of an in-plan PNG: width/height/pixel checksum
    // come from the decoded raster; the oracle computes them from the
    // generator's closed form. PNG is lossless, so any codec defect
    // breaks the hash.
    QueryDef(
      "q40_multimodal_decode",
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS id,
        |         16 + 2*(doc_id % 24) AS w,
        |         16 + 2*((7*doc_id) % 24) AS h,
        |         doc_id % 256 AS b
        |  FROM documents)
        |SELECT media_id, 'image/png' AS media_type,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(h * list_sum(list_transform(range(0, w),
        |                                   x -> (5*x + id) % 256))
        |     + w * list_sum(list_transform(range(0, h),
        |                                   y -> (11*y) % 256))
        |     + w * h * b AS BIGINT) AS checksum
        |FROM m""".stripMargin) { (s, dir) =>
      Multimodal.decode(
        Multimodal.mediaFromDocs(Tables.load(s, dir, "documents"))).toDF()
    },

    // REAL resize: decode → Graphics2D NEAREST_NEIGHBOR half-scale →
    // re-encode PNG → decode AGAIN; features come from the second
    // decode, witnessing both codec directions. The JDK's nearest pass
    // maps destination (x, y) to source (2x+1, 2y+1) — floor((x+0.5)·2)
    // per axis — pinned in MultimodalSpec; the oracle replays that
    // mapping in closed form.
    QueryDef(
      "q41_multimodal_resize",
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS id,
        |         16 + 2*(doc_id % 24) AS w,
        |         16 + 2*((7*doc_id) % 24) AS h,
        |         doc_id % 256 AS b
        |  FROM documents)
        |SELECT media_id,
        |  CAST(w // 2 AS INT) AS width_r,
        |  CAST(h // 2 AS INT) AS height_r,
        |  CAST((h // 2) * list_sum(list_transform(range(0, w // 2),
        |                             x -> (5*(2*x+1) + id) % 256))
        |     + (w // 2) * list_sum(list_transform(range(0, h // 2),
        |                             y -> (11*(2*y+1)) % 256))
        |     + (w // 2) * (h // 2) * b AS BIGINT) AS checksum_r
        |FROM m""".stripMargin) { (s, dir) =>
      Multimodal.resize(
        Multimodal.mediaFromDocs(Tables.load(s, dir, "documents"))).toDF()
    },

    // REAL frame sampling: a 1+(id%4)-frame vertical strip (frame height
    // rides the row as typed metadata), decoded ONCE, then every 2nd
    // frame checksummed via getSubimage views. Oracle: per sampled frame
    // k = 0,2,…, the frame checksum in closed form, summed.
    QueryDef(
      "q42_multimodal_frames",
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS id,
        |         16 + 2*(doc_id % 24) AS w,
        |         16 + 2*((7*doc_id) % 24) AS hf,
        |         1 + doc_id % 4 AS nf,
        |         doc_id % 256 AS b
        |  FROM documents)
        |SELECT media_id,
        |  CAST(nf AS INT) AS n_frames,
        |  CAST((nf + 1) // 2 AS INT) AS n_frames_sampled,
        |  CAST(list_sum(list_transform(range(0, (nf + 1) // 2), ki ->
        |      hf * list_sum(list_transform(range(0, w),
        |                                   x -> (5*x + id) % 256))
        |    + w * list_sum(list_transform(range(2*ki*hf, (2*ki+1)*hf),
        |                                  y -> (11*y) % 256))
        |    + w * hf * b)) AS BIGINT) AS sampled_checksum
        |FROM m""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrameChecksums(
        Multimodal.frameMediaFromDocs(Tables.load(s, dir, "documents")),
        stride = 2).toDF()
    },
  )
}
