package graft

import graft.transforms.NearDup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[NearDup.clusters]] (the q47 / NEARDEDUP
  * connected-components core): for arbitrary undirected pair graphs, the
  * distributed min-label propagation must produce exactly the components
  * a driver-side union-find produces, with each cluster labelled by its
  * minimum member id. Same plain-scalacheck sampling as CronPropertySpec
  * (fixed seeds — the scalatest bridge isn't in the offline cache).
  *
  * Graph shapes that historically break label propagation are forced in
  * alongside the random cases: long paths (diameter >> 1, exercises the
  * iteration-to-convergence loop), cycles (labels must not oscillate),
  * stars with a high-id hub (label must flow hub-ward then back out),
  * and disjoint unions of all three (no cross-component bleed).
  */
class NearDupPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label: union-by-min above makes every root the component min
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id)).toMap
  }

  private def sparkComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    NearDup.clusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Seq[(Long, Long)], label: String): Unit = {
    val got = sparkComponents(edges)
    val want = refComponents(edges)
    assert(got == want,
      s"$label: mismatch\n  only-spark=${got.toSet -- want.toSet}" +
        s"\n  only-ref=${want.toSet -- got.toSet}")
  }

  private val edgesGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)
    m <- Gen.choose(1, 45)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  test("clusters == union-find on random graphs") {
    val cases = (0 until 10).flatMap(i =>
      edgesGen.apply(Gen.Parameters.default, Seed(4242L + i)))
    assert(cases.size >= 8, "generator drought")
    cases.zipWithIndex.foreach { case (edges, i) =>
      check(edges, s"random[$i] (${edges.size} edges)")
    }
  }

  test("clusters handles adversarial shapes: path, cycle, star, union") {
    // path 10→9→...→0: diameter 10, forces multiple propagation rounds
    val path = (0L until 10L).map(i => (i, i + 1))
    check(path, "path-11")
    // reversed-id path: labels must flow against edge orientation too
    val revPath = (0L until 10L).map(i => (10L - i - 1, 10L - i))
    check(revPath, "rev-path-11")
    // cycle: no oscillation, single component labelled 0
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8L)).map {
      case (a, b) => (math.min(a, b), math.max(a, b))
    }
    check(cycle, "cycle-8")
    // star with high-id hub: min label sits on a leaf
    val star = (0L until 6L).map(i => (i, 99L))
    check(star, "star-hub-99")
    // disjoint union of all of the above, offset so ids never collide
    val union = path ++
      cycle.map { case (a, b) => (a + 100, b + 100) } ++
      star.map { case (a, b) => (a + 200, b + 200) }
    check(union, "disjoint-union")
    // self-contained two-node component next to a big one
    check(Seq((0L, 1L), (500L, 501L)) ++ path.map {
      case (a, b) => (a + 50, b + 50)
    }, "two-node-plus-path")
  }

  test("pairsCapped: inactive cap equals pairs; active cap is a subset") {
    val sh = NearDup.shingled(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text")
      .localCheckpoint()
    def set(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = set(NearDup.pairs(sh, 0.5))
    assert(exact.nonEmpty, "vacuous corpus: no pairs at 0.5")
    // a cap no shingle reaches ⇒ identical answer, jaccard values included
    // (posting-count jaccard and array_intersect jaccard must agree)
    val uncapped = set(NearDup.pairsCapped(sh, 0.5, Long.MaxValue))
    assert(uncapped == exact,
      s"missing=${exact -- uncapped} spurious=${uncapped -- exact}")
    // a tight cap may lose pairs but can never invent them — and it must
    // actually BITE here, or the subset property is tested vacuously
    val tight = set(NearDup.pairsCapped(sh, 0.5, 2L))
    assert((tight -- exact).isEmpty, s"spurious=${tight -- exact}")
    assert(tight != exact,
      "df <= 2 cap dropped nothing at sf0.001 — tighten the cap so the " +
        "subset property is exercised on a genuinely removed pair")
  }

  test("clusters fails loud when the round cap is below the diameter") {
    // silent non-convergence would let duplicates survive dedup; the cap
    // must throw, and raising it must converge the same graph
    val key = "graft.neardedup.maxRounds"
    val saved = sys.props.get(key)
    // seed labels already cover distance 1, so a long path needs many
    // propagation rounds — cap at 2 and it cannot finish
    val longPath = (0L until 30L).map(i => (i, i + 1))
    try {
      sys.props(key) = "2"
      val e = intercept[IllegalStateException](sparkComponents(longPath))
      assert(e.getMessage.contains("did not converge"), e.getMessage)
      sys.props(key) = "50"
      check(longPath, "path-31-after-raising-cap")
    } finally {
      saved match {
        case Some(v) => sys.props(key) = v
        case None => sys.props -= key
      }
      ()
    }
  }

  test("minhashPairsStar: star split preserves the cluster partition") {
    // a 6-member mutated family (pairwise J ≈ 0.93) floods its band
    // buckets; with starAbove = 2 every hot bucket takes the star path.
    // The star pair set is smaller than the full one, but connected
    // components — the dedup consumer — must produce the identical
    // partition: one family cluster plus the unrelated pair untouched.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val seedToks = (0 until 30).map(i => s"tok$i").mkString(" ")
    val fam = (0 until 6).map(i => (i.toLong, s"$seedToks uniq$i"))
    val other = Seq(
      (100L, "completely different words entirely here and more of them"),
      (101L, "completely different words entirely here and more of those"))
    val docs = (fam ++ other).toDF("id", "txt")
    val sh = NearDup.shingled(docs, "id", "txt")
    val full = NearDup.minhashPairs(sh, 0.8)
      .select(col("doc_a"), col("doc_b"))
    val star = NearDup.minhashPairsStar(sh, 0.8, starAbove = 2L)
      .select(col("doc_a"), col("doc_b"))
    assert(star.count() <= full.count())
    def partition(p: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      NearDup.clusters(p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullPart = partition(full)
    assert(partition(star) == fullPart)
    assert(fullPart.filter(_._1 < 100L).values.toSet == Set(0L))
    // the diagnostic reports the hot buckets the star path split
    assert(NearDup.bandHeavyHitters(sh, minF = 3L).count() >= 16)
  }

  test("autoBands: fewest-bands config with per-pair miss ≤ 1e-6 at the threshold") {
    // closed-form check of the NEARDEDUP METHOD LSH auto-banding: miss
    // prob for a pair at exactly t is (1 − t^r)^b; the chosen config must
    // meet 1e-6 and every FEWER-bands (more rows) config must not — so
    // candidate mass is minimized subject to the recall bound.
    def miss(t: Double, b: Int, r: Int): Double =
      math.pow(1.0 - math.pow(t, r), b)
    for (t <- Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)) {
      val (b, r) = NearDup.autoBands(t)
      assert(b * r <= 128 && b >= 1 && r >= 1)
      assert(miss(t, b, r) <= 1e-6, s"t=$t chose ($b,$r)")
      // every config with more rows per band (fewer bands) fails the bound
      for (r2 <- Seq(16, 8, 4, 2, 1) if r2 > r)
        assert(miss(t, 128 / r2, r2) > 1e-6, s"t=$t: ($b,$r) not minimal")
    }
    // the known anchors (documented in TransformParser's NEARDEDUP doc)
    assert(NearDup.autoBands(0.5) == (64, 2))
    assert(NearDup.autoBands(0.8) == (32, 4))
    assert(NearDup.autoBands(0.3) == (128, 1))
    // below ~0.105 no 128-perm banding reaches the bound → actionable error
    val e = intercept[IllegalArgumentException](NearDup.autoBands(0.05))
    assert(e.getMessage.contains("raise the threshold"), e.getMessage)
  }

  test("delete1Variants rejects reserved vh/__i input columns") {
    // the variant generator withColumn's its working names — an input
    // already carrying them would be silently REPLACED; the guard turns
    // that into a structured error instead (all other columns pass
    // through untouched)
    import spark.implicits._
    for (reserved <- Seq("vh", "__i")) {
      val df = Seq((1L, "abc", 9L)).toDF("id", "txt", reserved)
      val e = intercept[IllegalArgumentException](
        NearDup.delete1Variants(df, "txt"))
      assert(e.getMessage.contains(reserved) &&
        e.getMessage.contains("reserved"), e.getMessage)
    }
    // case-insensitive like every other column resolution
    val e2 = intercept[IllegalArgumentException](
      NearDup.delete1Variants(Seq((1L, "a", 2L)).toDF("id", "txt", "VH"),
        "txt"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    // and the passthrough contract still holds for ordinary columns
    val out = NearDup.delete1Variants(
      Seq((1L, "ab", "keep")).toDF("id", "txt", "extra"), "txt")
    assert(out.columns.toSeq == Seq("id", "txt", "extra", "vh"))
    assert(out.count() == 3) // identity + 2 single-char deletions
  }
}
