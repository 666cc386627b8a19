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
    when(size(ws) >= k,
      array_distinct(transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial rolling hash of a string, base 31 mod [[HashMod]], over
    * character codes. Deterministic and engine-portable: the DuckDB oracle
    * computes the identical value via
    * `list_reduce(list_prepend(0, codes), (a,b) -> (a*31+b) % 1000000007)`.
    */
  def polyHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % HashMod)

  /** MinHash signature: for each of `numPerm` hash permutations, the min
    * xxhash64 over the shingle set (seed mixed in as an extra hashed column).
    * Constant memory per doc; the 100 TB-scale replacement for pairwise
    * Jaccard.
    */
  def minhashSig(shingleArr: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      s => array_min(transform(shingleArr, x => xxhash64(x, s))))

  /** LSH band key array for a minhash signature: `numBands` structs of
    * (band index, xxhash64 of that band's signature slice). Two docs are
    * candidates iff they collide on ≥1 band.
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bh")))

  /** 64-bit SimHash over the token *multiset* (repeated tokens weigh more,
    * matching the classic Charikar construction). Bit i of the result is 1
    * iff the sum over tokens of ±1 (sign = bit i of xxhash64(token)) is
    * positive.
    *
    * Two projection steps so the expensive pass runs once per row:
    * [[simhashBitSums]] hashes each token once and folds its 64 sign bits
    * into a 64-counter array; [[simhashPack]] packs the counter signs into
    * one BIGINT. Written as SQL lambda strings because dynamic shift
    * amounts need the SQL form (the Scala `shiftleft` helper only accepts
    * literal ints); both take plain column *names* so the generated SQL is
    * trivially valid attributes.
    */
  def simhashBitSums(tokensColName: String): Column =
    expr(s"""
      aggregate(
        transform(`$tokensColName`, tok -> xxhash64(tok)),
        array_repeat(CAST(0 AS BIGINT), 64),
        (cnt, h) -> zip_with(
          cnt,
          transform(sequence(0, 63),
            j -> IF((shiftright(h, j) & 1) = 1, CAST(1 AS BIGINT),
                    CAST(-1 AS BIGINT))),
          (x, y) -> x + y))""")

  /** Pack the 64 SimHash counters (see [[simhashBitSums]]) into one BIGINT. */
  def simhashPack(bitSumsColName: String): Column =
    expr(s"""
      aggregate(
        sequence(0, 63),
        CAST(0 AS BIGINT),
        (acc, i) -> IF(element_at(`$bitSumsColName`, i + 1) > 0,
                       acc | shiftleft(CAST(1 AS BIGINT), i),
                       acc))""")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
