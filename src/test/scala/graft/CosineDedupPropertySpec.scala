package graft

import graft.transforms.TransformParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for NEARDEDUP METHOD COSINE (q141 core): the verb must
  * match a driver-side replay — brute-force round-6 cosine pairs at the
  * threshold, union-find components, min-key survivor per component,
  * zero/null vectors passing through — on random vector multisets that
  * deliberately mix jittered near-dup families, exact duplicate arrays
  * (the exact-first collapse path), isolated vectors, and zero vectors.
  * Threshold 0.8 with 32×4 sign-LSH blocking keeps the per-pair
  * candidate-miss probability ~1e-9, so blocked candidates == brute
  * force on every sampled corpus and the replay is exact (fixed seeds;
  * deterministic hyperplanes — nothing here is probabilistic at run
  * time).
  */
class CosineDedupPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private val T = 0.8

  /** Driver-side replica of the verb's round-6 cosine: same IEEE ops,
    * same left-to-right dot fold, same HALF_UP rounding.
    */
  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    if (c.isNaN) Double.NaN
    else java.math.BigDecimal.valueOf(c)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def refKept(rows: Seq[(Long, Array[Double])]): Set[Long] = {
    // passthrough classes: zero vectors (norm 0 → cosine NaN),
    // NaN-component vectors (norm NaN → cosine NaN), and overflow
    // vectors (norm Inf → Inf/Inf = NaN cosine) — all excluded from
    // the pair graph and always kept. Mirror the verb's guard exactly:
    // it filters on the norm, i.e. on sqrt(Σx²)
    def dead(v: Array[Double]): Boolean = {
      val n2 = v.map(x => x * x).sum
      n2 == 0.0 || n2.isNaN || n2.isInfinite
    }
    val zero = rows.filter(r => dead(r._2)).map(_._1)
    val live = rows.filterNot(r => dead(r._2))
    val parent = scala.collection.mutable.Map(live.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ia, va) <- live; (ib, vb) <- live if ia < ib
      if cos6(va, vb) >= T
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val kept = live.map(_._1).filter(id => find(id) == id)
    (kept ++ zero).toSet
  }

  private val bases = Seq(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
    Array(0.2, -0.4, 0.7, 0.1))

  private def rowsGen: Gen[Seq[(Long, Array[Double])]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, Gen.frequency(
      // jittered member of a near-dup family
      (6, for {
        b <- Gen.oneOf(bases)
        j <- Gen.listOfN(4, Gen.choose(-0.05, 0.05))
      } yield b.zip(j).map { case (x, d) => x + d }),
      // exact duplicate of a base (the collapse path)
      (2, Gen.oneOf(bases).map(_.clone())),
      // isolated direction
      (1, Gen.listOfN(4, Gen.choose(-1.0, 1.0)).map(_.toArray)),
      // zero vector (must pass through)
      (1, Gen.const(Array(0.0, 0.0, 0.0, 0.0))),
      // NaN-component vector (must pass through — NaN > 0 is true
      // under Spark's NaN ordering, so the norm guard needs the
      // explicit isnan; without it this vector would "match" every
      // bucket collision and merge unrelated clusters)
      (1, Gen.const(Array(1.0, Double.NaN, 0.0, 0.0))),
      // overflow vector: squares overflow, norm = Inf, cosine = NaN —
      // same every-bucket-match failure mode, needs the finite guard
      (1, Gen.const(Array(1.6e160, 1.0e160, 0.0, 0.0)))))
  } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("COSINE verb == driver-side union-find replay on random corpora") {
    import spark.implicits._
    val cases = (0 until 6).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(9090L + i)))
    assert(cases.size >= 4, "generator drought")
    for (rows <- cases) {
      val got = TransformParser
        .parse(s"NEARDEDUP ON v KEY id THRESHOLD $T METHOD COSINE")
        .build(Map.empty, rows.toDF("id", "v").repartition(4))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = refKept(rows)
      assert(got == want,
        s"n=${rows.size}: verb kept ${got.toSeq.sorted}, " +
          s"replay kept ${want.toSeq.sorted}")
    }
  }
}
