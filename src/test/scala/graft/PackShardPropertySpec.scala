package graft

import graft.transforms.TransformParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the SHARD / PACK verbs (q130/q131/q134/q135 core):
  * the distributed implementations must match a driver-side replay of the
  * same algebra exactly, for arbitrary id/size multisets — including the
  * degenerate shapes (all-equal sizes, single row, sizes with heavy ties)
  * where window tie-breaks and serpentine block boundaries are easiest to
  * get subtly wrong. Same plain-scalacheck sampling as NearDupPropertySpec
  * (fixed seeds — the scalatest bridge isn't in the offline cache).
  */
class PackShardPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Driver-side replica of the verbs' seeded 60-bit md5 key hash. */
  private def keyHash(seed: String, id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$id".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def refPack(rows: Seq[(Long, Long)], writers: Int,
      groups: Int): Map[Long, Int] =
    rows.groupBy { case (id, _) => keyHash("pack", id) % groups }
      .flatMap { case (_, members) =>
        members.sortBy { case (id, sz) => (-sz, id) }.zipWithIndex.map {
          case ((id, _), r0) =>
            val block = r0 / writers
            val pos = r0 % writers
            id -> (if (block % 2 == 0) pos else writers - 1 - pos)
        }
      }

  private def rowsGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 500L)
      sz <- Gen.oneOf(Gen.choose(1L, 20L), Gen.choose(1L, 100000L))
        .flatMap(g => g)
    } yield (id, sz))
  } yield rows.groupBy(_._1).map { case (id, g) => (id, g.head._2) }.toSeq

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "n_chars")
      .repartition(4) // exercise the distributed path, not one partition
  }

  test("PACK == driver-side serpentine replay on random multisets") {
    val cases = (0 until 8).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(777L + i)))
    assert(cases.size >= 6, "generator drought")
    for ((rows, i) <- cases.zipWithIndex; writers <- Seq(2, 8);
         groups <- Seq(1, writers)) {
      val got = TransformParser
        .parse(s"PACK BY n_chars KEY doc_id INTO $writers GROUPS $groups")
        .build(Map.empty, df(rows))
        .select("doc_id", "writer").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = refPack(rows, writers, groups)
      assert(got == want, s"case[$i] writers=$writers groups=$groups: " +
        s"only-spark=${got.toSet -- want.toSet} only-ref=${want.toSet -- got.toSet}")
      // balance bound from SURVEY §9: spread <= groups x max size
      val totals = rows.map { case (id, sz) => (got(id), sz) }
        .groupBy(_._1).map(_._2.map(_._2).sum).toSeq
      if (totals.size == writers) {
        val maxSz = rows.map(_._2).max
        assert(totals.max - totals.min <= groups.toLong * maxSz,
          s"case[$i]: spread ${totals.max - totals.min} > $groups x $maxSz")
      }
    }
  }

  test("PACK ties: equal sizes fall back to key order deterministically") {
    // all-equal sizes make EVERY rank decision a tie-break — any
    // nondeterminism in the window order shows up here
    val rows = (0L until 40L).map(id => (id, 100L))
    val verb = "PACK BY n_chars KEY doc_id INTO 8"
    val a = TransformParser.parse(verb).build(Map.empty, df(rows))
      .select("doc_id", "writer").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == refPack(rows, 8, 8))
    val b = TransformParser.parse(verb).build(Map.empty, df(rows))
      .select("doc_id", "writer").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "re-run must be identical")
  }

  test("SHARD == driver-side md5 replay; ids cover [0, n)") {
    val cases = (0 until 6).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(991L + i)))
    for ((rows, i) <- cases.zipWithIndex; n <- Seq(2, 8); seed <- Seq(7, 42)) {
      val got = TransformParser
        .parse(s"SHARD ON doc_id INTO $n SEED $seed")
        .build(Map.empty, df(rows))
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = rows.map { case (id, _) =>
        id -> (keyHash(seed.toString, id) % n).toInt }.toMap
      assert(got == want, s"case[$i] n=$n seed=$seed")
      assert(got.values.forall(s => s >= 0 && s < n))
    }
  }
}
