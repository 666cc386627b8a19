package graft

import graft.transforms.TransformParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the CHUNK verb (q67/q140 core): the distributed
  * fan-out must match a driver-side replay of the window algebra exactly
  * for arbitrary documents — including zero-token docs (emit nothing),
  * runs of multiple spaces (tokenizer drops empties, mirroring the
  * oracle's list_filter), tail chunks shorter than SIZE, and the
  * overlap/tiling boundary shapes. Same plain-scalacheck sampling as
  * NearDupPropertySpec (fixed seeds — the scalatest bridge isn't in the
  * offline cache).
  */
class ChunkPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Driver-side replica of the verb's tokenizer: split on single
    * space, drop empties (graft.functions.Text.tokens / the oracle's
    * `list_filter(string_split(text, ' '), x -> x <> '')`).
    */
  private def toks(text: String): Seq[String] =
    text.split(" ", -1).toSeq.filter(_.nonEmpty)

  private def refChunks(tokens: Seq[String], w: Int, s: Int)
      : Seq[(Long, Int, String)] =
    if (tokens.isEmpty) Seq.empty
    else (0 to (tokens.size - 1) / s).map { i =>
      val c = tokens.slice(i * s, i * s + w)
      (i.toLong, c.size, c.mkString(" "))
    }

  private def docsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 16)
    texts <- Gen.listOfN(n, for {
      nt <- Gen.frequency((1, Gen.const(0)), (9, Gen.choose(1, 150)))
      words <- Gen.listOfN(nt, Gen.oneOf("alpha", "bravo", "c7", "dd"))
      seps <- Gen.listOfN(math.max(nt - 1, 0), Gen.oneOf(" ", "  ", "   "))
    } yield
      if (words.isEmpty) ""
      else words.head + seps.zip(words.tail)
        .map { case (sep, w) => sep + w }.mkString)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("CHUNK == driver-side window replay on random documents") {
    import spark.implicits._
    val cases = (0 until 6).flatMap(i =>
      docsGen.apply(Gen.Parameters.default, Seed(4242L + i)))
    assert(cases.size >= 4, "generator drought")
    for (docs <- cases; (w, s) <- Seq((64, 48), (2, 2), (5, 3), (1, 1))) {
      val got = TransformParser
        .parse(s"CHUNK ON txt KEY id SIZE $w STRIDE $s")
        .build(Map.empty, docs.toDF("id", "txt").repartition(4))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      val want = docs.flatMap { case (id, text) =>
        refChunks(toks(text), w, s).map { case (ci, nT, t) =>
          (id, ci, nT, t)
        }
      }
      assert(got.length == want.length && got.toSet == want.toSet,
        s"SIZE $w STRIDE $s: got ${got.length} chunks, want ${want.length}")
    }
  }
}
