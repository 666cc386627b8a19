package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FrameMediaRow, MediaRow, Multimodal}

/** Pins the REAL javax.imageio codec path (round 15 — the q40–q42 gates'
  * Spark side): PNG encode determinism, lossless decode vs the generator's
  * closed form, the Graphics2D NEAREST_NEIGHBOR inverse mapping the q41
  * oracle replays, frame-strip sampling, loud failure on undecodable
  * payloads, and the byte-range video-payload slicer. The mapping pin is
  * the load-bearing one: the q41 oracle assumes destination (x, y) ←
  * source (2x+1, 2y+1), which is JDK rendering behavior — if a JDK change
  * ever moves it, THIS fails rather than the oracle hash drifting
  * silently.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private val ids = Seq(0L, 1L, 23L, 24L, 37L, 997L, 4999L)

  private def closedFormChecksum(id: Long, w: Int, yLo: Int, yHi: Int)
      : Long = {
    val sumR = (0 until w).map(Multimodal.synthRed(id, _).toLong).sum
    val sumG = (yLo until yHi).map(Multimodal.synthGreen(_).toLong).sum
    (yHi - yLo) * sumR + w * sumG +
      w.toLong * (yHi - yLo) * Multimodal.synthBlue(id)
  }

  test("synthetic PNG: deterministic encode, lossless closed-form decode") {
    for (id <- ids) {
      val a = Multimodal.syntheticPng(id)
      val b = Multimodal.syntheticPng(id)
      assert(java.util.Arrays.equals(a, b), s"id=$id encode not stable")
      val img = Multimodal.decodeImage(a)
      val w = Multimodal.synthWidth(id)
      val h = Multimodal.synthFrameHeight(id)
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      // exact per-pixel round trip (PNG is lossless; the oracle's whole
      // premise): spot-check every pixel against the closed form
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xFF) == Multimodal.synthRed(id, x) &&
          ((p >> 8) & 0xFF) == Multimodal.synthGreen(y) &&
          (p & 0xFF) == Multimodal.synthBlue(id),
          s"id=$id pixel ($x,$y) not lossless")
      }
    }
  }

  test("Graphics2D NEAREST half-scale maps dst (x,y) <- src (2x+1, 2y+1)") {
    for (id <- ids) {
      val src = Multimodal.decodeImage(Multimodal.syntheticPng(id))
      val rz = Multimodal.resizeHalf(src)
      assert(rz.getWidth == src.getWidth / 2 &&
        rz.getHeight == src.getHeight / 2)
      for (y <- 0 until rz.getHeight; x <- 0 until rz.getWidth)
        assert(rz.getRGB(x, y) == src.getRGB(2 * x + 1, 2 * y + 1),
          s"id=$id resized pixel ($x,$y): JDK nearest mapping moved — " +
            "the q41 oracle's (2x+1, 2y+1) closed form no longer holds")
      // and the re-encode → re-decode pass (q41's second codec leg) is
      // lossless too
      val again = Multimodal.decodeImage(Multimodal.encodePng(rz))
      for (y <- 0 until rz.getHeight; x <- 0 until rz.getWidth)
        assert(again.getRGB(x, y) == rz.getRGB(x, y))
    }
  }

  test("decode/resize/frame datasets match the closed form end to end") {
    import spark.implicits._
    val media = ids.map(id =>
      MediaRow(id, "image/png", Multimodal.syntheticPng(id))).toDS()
    Multimodal.decode(media).collect().foreach { d =>
      val w = Multimodal.synthWidth(d.media_id)
      val h = Multimodal.synthFrameHeight(d.media_id)
      assert(d.width == w && d.height == h)
      assert(d.checksum == closedFormChecksum(d.media_id, w, 0, h))
    }
    Multimodal.resize(media).collect().foreach { r =>
      val w = Multimodal.synthWidth(r.media_id)
      val h = Multimodal.synthFrameHeight(r.media_id)
      val sumR = (0 until w / 2)
        .map(x => Multimodal.synthRed(r.media_id, 2 * x + 1).toLong).sum
      val sumG = (0 until h / 2)
        .map(y => Multimodal.synthGreen(2 * y + 1).toLong).sum
      assert(r.width_r == w / 2 && r.height_r == h / 2)
      assert(r.checksum_r == (h / 2) * sumR + (w / 2) * sumG +
        (w / 2).toLong * (h / 2) * Multimodal.synthBlue(r.media_id))
    }
    val strips = ids.map { id =>
      val nf = (1 + id % 4).toInt
      FrameMediaRow(id, Multimodal.synthFrameHeight(id),
        Multimodal.syntheticPng(id, nf))
    }.toDS()
    Multimodal.sampleFrameChecksums(strips, stride = 2).collect()
      .foreach { s =>
        val id = s.media_id
        val nf = (1 + id % 4).toInt
        val w = Multimodal.synthWidth(id)
        val hf = Multimodal.synthFrameHeight(id)
        assert(s.n_frames == nf)
        assert(s.n_frames_sampled == (nf + 1) / 2)
        val expected = (0 until (nf + 1) / 2).map(ki =>
          closedFormChecksum(id, w, 2 * ki * hf, (2 * ki + 1) * hf)).sum
        assert(s.sampled_checksum == expected, s"id=$id strip checksum")
      }
  }

  test("undecodable payloads fail loudly; frame metadata is validated") {
    import spark.implicits._
    val junk = Seq(MediaRow(1L, "image/png",
      Array[Byte](1, 2, 3, 4, 5))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decode(junk).collect())
    assert(e.getMessage != null)
    // a lying frame_height (strip height not a multiple) is an error,
    // not a silent truncation
    val bad = Seq(FrameMediaRow(2L, 7, Multimodal.syntheticPng(2L))).toDS()
    val e2 = intercept[org.apache.spark.SparkException](
      Multimodal.sampleFrameChecksums(bad, 2).collect())
    assert(e2.getMessage != null)
  }

  test("video payloads: byte-range frame slicing (no codec, by design)") {
    // the JDK ships no video codec — an opaque payload's frames are
    // sliced by pure byte-range arithmetic for an external decoder.
    // 100 bytes, frameSize 32, stride 2 ⇒ step 64 ⇒ frames at 0 and 64
    // (the second one short: 36 bytes remain, capped at 32).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Array.tabulate[Byte](100)(_.toByte)))
      .toDF("vid", "payload")
      .withColumn("frames", Multimodal.sampleFrames("payload", 32, 2))
    val r = df.select(col("vid"), size(col("frames")).as("n"),
      expr("transform(frames, f -> length(f))").as("lens"))
      .collect().head
    assert(r.getInt(1) == 2)
    assert(r.getSeq[Int](2) == Seq(32, 32))
    val frames = df.select(col("frames")).collect().head
      .getSeq[Array[Byte]](0)
    assert(frames(0).head == 0 && frames(1).head == 64)
  }
}
