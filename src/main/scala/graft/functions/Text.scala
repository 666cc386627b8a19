package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, fingerprinting, quality scoring). Everything here is a pure
  * Catalyst expression tree — no UDFs — so it stays inside whole-stage
  * codegen and scales to 100 TB document corpora unchanged.
  *
  * Reference analogue: none — the reference engine (michaelbironneau/analyst)
  * has no text operators; these are the beyond-parity LLM-pipeline surface.
  */
object Text {

  /** Prime modulus shared with the DuckDB oracles (fits products in int64:
    * max acc*31 + 255 < 2^63).
    */
  val HashMod = 1000000007L

  /** Whitespace tokens (empty strings filtered so "a  b" and trailing
    * blanks can't skew counts).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct space-joined word k-shingles; empty array when the document
    * has fewer than k words (guard matters: sequence(0, negative) would
    * generate a *descending* range in Spark).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = tokens(text)
    when(size(ws) >= k, shinglesFromTokens(ws, k))
      .otherwise(array().cast("array<string>"))
  }

  /** Shingles from an already-tokenized array. Callers must guarantee
    * `size(ws) >= k` (e.g. by filtering on the cheap token count):
    * sequence(0, negative) would generate a *descending* range.
    *
    * Prefer this + a `size(tokens) >= k` filter over [[shingles]] on the
    * hot path: a filter on the (expensive) shingle array itself gets its
    * full expression substituted into the predicate by PushDownPredicates
    * and pushed below any repartition — i.e. the whole shingle computation
    * re-runs serially at the scan. A token-count predicate pushes down as
    * one cheap split pass instead.
    */
  def shinglesFromTokens(ws: Column, k: Int = 3): Column =
    array_distinct(transform(sequence(lit(0), size(ws) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j + 1)): _*)))

  /** Polynomial rolling hash of a string, base 31 mod [[HashMod]], over
    * character codes. Deterministic and engine-portable: the DuckDB oracle
    * computes the identical value via
    * `list_reduce(list_prepend(0, codes), (a,b) -> (a*31+b) % 1000000007)`.
    */
  def polyHash(s: Column): Column =
    aggregate(
      // split("") walks the string once; substr(i, 1) per position would
      // rescan from the start each time (O(len²) on the hot path). The
      // trailing "" that split(limit=-1) emits is filtered out.
      transform(filter(split(s, ""), c => c =!= ""), c => ascii(c)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % HashMod)

  /** One xxhash64 per shingle — the single pass over string data. All
    * `numPerm` MinHash permutations then re-mix these 8-byte values
    * ([[minhashSigFromHashes]]) instead of re-hashing strings, so the
    * string cost is paid exactly once per document.
    *
    * IMPORTANT expression-shape note (applies to this whole file): an
    * expensive expression placed inside a `transform(sequence(0, n), ...)`
    * lambda is re-evaluated once per generated element — and Catalyst's
    * CollapseProject happily inlines a producer Project into such a lambda
    * when the producer is referenced only once, turning an O(len) column
    * into O(n·len) at runtime. The helpers below therefore unroll static
    * ranges Scala-side, referencing their input column once per unrolled
    * term: CollapseProject's multi-reference guard then keeps the producer
    * in its own Project (evaluated once per row), and the unrolled terms
    * are plain codegen-able expressions.
    */
  def hashedShingles(shingleArr: Column): Column =
    transform(shingleArr, x => xxhash64(x))

  /** MinHash signature over pre-hashed shingles (see [[hashedShingles]]):
    * for each of `numPerm` permutations, the min of xxhash64(h, seed=perm).
    * Constant memory per doc; the 100 TB-scale replacement for pairwise
    * Jaccard. Native codegen'd expression ([[MinHashSigExpression]]).
    */
  def minhashSigFromHashes(hashes: Column, numPerm: Int): Column =
    org.apache.spark.sql.GraftCatalystBridge.column(
      MinHashSigExpression(
        org.apache.spark.sql.GraftCatalystBridge.expression(hashes), numPerm))

  /** LSH band key array for a minhash signature: `numBands` structs of
    * (band index, xxhash64 of that band's signature slice). Two docs are
    * candidates iff they collide on ≥1 band. Statically unrolled (no HOF
    * over the band range) — slice + xxhash64 stay in whole-stage codegen.
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map(b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))): _*)

  /** One xxhash64 per token — the single pass over string data; SimHash
    * then works on the 8-byte hashes.
    */
  def hashedTokens(toks: Column): Column =
    transform(toks, t => xxhash64(t))

  /** 64-bit SimHash over the token *multiset* (repeated tokens weigh
    * more, matching the classic Charikar construction), from pre-hashed
    * tokens. Native codegen'd expression ([[SimHashExpression]]).
    */
  def simhashFromHashes(hs: Column): Column =
    org.apache.spark.sql.GraftCatalystBridge.column(
      SimHashExpression(
        org.apache.spark.sql.GraftCatalystBridge.expression(hs)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
