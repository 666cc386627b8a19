package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{Text, Vectors}
import graft.transforms.NearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators over the `documents` table — the
  * beyond-parity LLM-training-pipeline surface (no analogue in the
  * reference engine).
  *
  * Four tiers, each the idiomatic Spark shape for its scale:
  *
  *  - exact:        groupBy(text) — at 100 TB you group by xxhash64(text)
  *                  instead of the full text to keep shuffle rows narrow;
  *  - n-gram Jaccard: *inverted index* self-join on shingles (explode →
  *                  join on shingle → count common per pair). Never
  *                  materializes the O(n²) pair space — only pairs that
  *                  share ≥1 shingle, shuffled by shingle. This is the
  *                  exact-but-scalable path;
  *  - MinHash+LSH:  constant-size signature per doc (128 perms), banded
  *                  (32×4) so candidate pairs come from equality joins on
  *                  band hashes — the classic sub-quadratic near-dup path.
  *                  Candidates are then *exactly* verified, so the output
  *                  equals brute force whenever LSH recall is 1 (at the
  *                  0.8 threshold the miss probability per true pair is
  *                  (1-j⁴)³² ≤ 6e-8; the DuckDB oracle cross-checks);
  *  - SimHash:      64-bit fingerprint per doc, hamming≤k pairs found via
  *                  16-bit band blocking (pigeonhole: hamming≤3 ⇒ one of 4
  *                  bands equal) — candidates verified with bit_count(xor).
  *
  * All expression trees are UDF-free and stay in whole-stage codegen.
  */
object Dedup {

  /** Documents, spread across all cores. The local test corpus is one
    * small parquet file = one input split = one task, which would serialize
    * the (CPU-heavy) shingle/signature projections below; on a real
    * many-file 100 TB corpus the scan's own splits provide this parallelism
    * and the narrow text shuffle is noise next to the per-row hash work.
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)

  /** Shared shingle projection: (doc_id, shs) distinct shingle arrays.
    * Filtered on the cheap token count, NOT on the shingle array — see
    * [[Text.shinglesFromTokens]] for the pushdown rationale.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"), Text.shinglesFromTokens(col("ws")).as("shs"))

  /** DuckDB-side 3-gram shingle set (mirrors [[Text.shingles]]). */
  private[queries] val oracleShingles =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
      |  FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS sh
      |  FROM w WHERE len(ws) >= 3
      |)""".stripMargin

  private def oracleJaccardPairs(threshold: Double) =
    s"""$oracleShingles
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= $threshold""".stripMargin

  /** The AGAINST-kept oracle at an arbitrary threshold — ONE text
    * shape for the whole family so no gate's truth can desynchronize
    * from the brute-force batch×corpus Jaccard statement (the
    * ivfOracleSql pattern from Similarity.scala). At 0.5 it serves the
    * verb gate (q128), the stored-artifact gates (q144/q148/q151) and
    * the maintenance chains (q156/q158/q162); q165 takes it at the
    * REBUILD THRESHOLD gate's 0.9.
    */
  private[queries] def againstKeptOracleSqlAt(threshold: Double): String =
    s"""WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS sh
      |  FROM w WHERE len(ws) >= 3),
      |b AS (SELECT * FROM s WHERE doc_id % 2 = 0),
      |c AS (SELECT * FROM s WHERE doc_id % 2 = 1),
      |m AS (
      |  SELECT DISTINCT b.doc_id
      |  FROM b JOIN c ON round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
      |      / (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))), 6) >= $threshold)
      |SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM m)""".stripMargin

  private[queries] val againstKeptOracleSql: String =
    againstKeptOracleSqlAt(0.5)

  /** q168's oracle — brute-force top-10 Jaccard retrieval at grade 0.5:
    * every even query doc's exact round-6 Jaccard against the DISTINCT
    * odd corpus TEXTS (the stored artifact collapses to one entry per
    * distinct text, so the brute force must rank the same candidate
    * set — q164's `DISTINCT v` move for the text family), floored at
    * the banding threshold (the artifact only promises recall there —
    * the verb's documented grade contract), with CONTENT
    * self-exclusion (`c.text <> b.text` — the serve keys both sides by
    * xxhash64(text)). The projection is (qid, jaccard, rank):
    * neighbor ids are the store's content hashes and stay out of the
    * hash exactly as q164's do; equal-jaccard ties make the projection
    * multiset-identical under any tie order.
    */
  private[queries] val jaccardKnnOracleSql: String =
    """WITH w AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS ws
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS sh
      |  FROM w WHERE len(ws) >= 3),
      |b AS (SELECT doc_id, text, sh FROM s WHERE doc_id % 2 = 0),
      |c AS (SELECT DISTINCT text, sh FROM s WHERE doc_id % 2 = 1),
      |j AS (
      |  SELECT b.doc_id AS qid,
      |    round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
      |      / (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))), 6)
      |      AS jaccard
      |  FROM b JOIN c ON c.text <> b.text),
      |r AS (
      |  SELECT qid, jaccard, row_number() OVER (
      |    PARTITION BY qid ORDER BY jaccard DESC) AS rank
      |  FROM j WHERE jaccard >= 0.5)
      |SELECT qid, jaccard, rank FROM r WHERE rank <= 10""".stripMargin

  /** q159's oracle — [[againstKeptOracleSql]] with the corpus restated
    * under CONTENT-KEYED deletion: after `build(odds) → append(evens) →
    * delete(evens)`, the artifact's entries are the odd texts that are
    * NOT the text of any even doc (entries are one per distinct text, so
    * deleting a text removes its membership no matter which rows carried
    * it — including odd corpus rows that SHARE an even doc's text, which
    * exist at sf0.1). Both failure modes of the DELETE fail this hash:
    * false retention (a surviving appended even entry matches its own
    * batch doc back, dropping it) and over-deletion (a lost odd entry
    * un-drops its near-matching batch docs).
    */
  private[queries] val deleteKeptOracleSql: String =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS sh
      |  FROM w WHERE len(ws) >= 3),
      |b AS (SELECT * FROM s WHERE doc_id % 2 = 0),
      |c AS (
      |  SELECT s.* FROM s JOIN documents d USING (doc_id)
      |  WHERE doc_id % 2 = 1 AND d.text NOT IN (
      |    SELECT text FROM documents WHERE doc_id % 2 = 0)),
      |m AS (
      |  SELECT DISTINCT b.doc_id
      |  FROM b JOIN c ON round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
      |      / (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))), 6) >= 0.5)
      |SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM m)""".stripMargin

  /** One stored band index per corpus dir per JVM — the deployment
    * model (the index-build job runs once over the odd-id corpus;
    * every probe batch consumes the same files), and it keeps q144's
    * repeat runs from re-paying the identical deterministic build.
    * Pure function of the corpus ⇒ sharing cannot change any output.
    * Same memo pattern as Similarity.storedIvf. Banding is
    * autoBands(0.5) = 64 bands × 2 rows — the exact banding the q128
    * verb path auto-derives, so the two gates index identically.
    */
  private val storedBands =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[queries] def bandStore(s: SparkSession, dir: String): String =
    storedBands.getOrElseUpdate(dir, {
      val shC = shingled(s, dir).where(col("doc_id") % 2 === 1)
        .toDF("id", "shs")
      NearDup.bandStoreFrom(shC, numPerm = 128, numBands = 64,
        rowsPerBand = 2, cells = 64)
    })

  val entries: Seq[QueryDef] = Seq(

    // ---- Exact dedup: one keeper (min doc_id) per distinct text. ----
    QueryDef(
      "q30_dedup_exact",
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin) { (s, dir) =>
      // At 100 TB: groupBy(xxhash64(text)) — 8-byte shuffle key instead of
      // the document body; full-text equality check within hash buckets if
      // collision paranoia warrants.
      docs(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
    },

    // ---- Near-dup via exact n-gram Jaccard, inverted-index join. ----
    // Machinery lives in transforms/NearDup.scala (shared with the
    // NEARDEDUP language verb): postings on 8-byte hashed shingles,
    // broadcast per-doc size frames, pair space bounded by shared
    // shingles — never O(n²). See NearDup.pairs for the full plan notes.
    QueryDef("q31_dedup_ngram_jaccard", oracleJaccardPairs(0.5)) { (s, dir) =>
      NearDup.pairs(shingled(s, dir).toDF("id", "shs"), 0.5)
    },

    // ---- Near-dup via MinHash + LSH banding, exact-verified. ----
    // Machinery in NearDup.minhashPairs (shared with the graft.Scale
    // replication harness, which proves LSH == exact pair-for-pair at
    // 16× corpus size): native-codegen 128-perm signatures, 32×4 bands,
    // collision-bounded candidates, exact verification.
    QueryDef("q32_dedup_minhash_lsh", oracleJaccardPairs(0.8)) { (s, dir) =>
      NearDup.minhashPairs(shingled(s, dir).toDF("id", "shs"), 0.8)
    },

    // ---- Near-dup via 64-bit SimHash + 16-bit band blocking. ----
    // No oracle: SimHash depends on xxhash64 bit patterns, which DuckDB
    // cannot reproduce; recall asserted in PipelineSpec against q31's exact
    // pairs.
    QueryDef.noOracle("q33_dedup_simhash") { (s, dir) =>
      val fp = docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), Text.hashedTokens(col("toks")).as("hs"))
        .select(col("doc_id"), Text.simhashFromHashes(col("hs")).as("simhash"))
      // 4 bands of 16 bits: hamming ≤ 3 guarantees ≥1 identical band.
      val bands = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.band").as("band"), col("bk.bv").as("bv"))
      bands.toDF("doc_a", "sh_a", "band", "bv")
        .join(bands.toDF("doc_b", "sh_b", "band", "bv"), Seq("band", "bv"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          Text.hamming(col("sh_a"), col("sh_b")).as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
    },

    // ---- SimHash with an engine-portable hash: the q33 pipeline made
    // oracle-checkable. q33's fingerprint rides xxhash64 bit patterns
    // DuckDB cannot reproduce, so it carries a recall spec instead of a
    // hash match; THIS gate rebuilds the identical construction — per-
    // token hash → ±1 bit votes → sign fingerprint → banded blocking →
    // hamming verify — from md5-derived 60-bit token hashes (the
    // q69/q109/q111 portability trick: conv(substr(md5(x),1,15)) is
    // bit-identical in both engines), so DuckDB replays signature AND
    // banding bit-for-bit and the driver hash-compares the pair set.
    // Bands are 4 × 15 bits (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 band equal).
    // The native-codegen xxhash64 expression stays the bench path; this
    // is the correctness pin for the construction.
    QueryDef(
      "q126_simhash_portable",
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, t FROM w, unnest(ws) AS u(t)),
        |h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
        |  FROM tok),
        |b AS (
        |  SELECT doc_id, j,
        |    SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS wgt
        |  FROM h, unnest(range(0, 60)) AS r(j)
        |  GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN wgt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
        |      AS simhash
        |  FROM b GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, simhash, band,
        |    (simhash >> (band * 15)) & 32767 AS bv
        |  FROM sh, unnest([0, 1, 2, 3]) AS bb(band)),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.simhash, c.simhash)) AS INTEGER) AS hamming
        |  FROM bands a JOIN bands c
        |    ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 3""".stripMargin) {
      (s, dir) =>
      val h = docs(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
        .select(col("doc_id"),
          conv(substring(md5(col("t")), 1, 15), 16, 10)
            .cast("long").as("h"))
      // token × bit fan-out (60× rows) → one (doc, bit) partial-agg
      // shuffle; weights collapse map-side, then 60 rows per doc fold
      // into the fingerprint — vocab-independent shuffle volume
      val fp = h
        .select(col("doc_id"), col("h"),
          explode(sequence(lit(0), lit(59))).as("j"))
        .select(col("doc_id"), col("j"),
          when(expr("shiftright(h, j) & 1") === 1, lit(1))
            .otherwise(lit(-1)).as("sign"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(col("sign")).as("wgt"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("wgt") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
          .as("simhash"))
      val bands = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * 15)
              .bitwiseAND(lit(0x7FFFL)).as("bv"))): _*)).as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.band").as("band"), col("bk.bv").as("bv"))
      bands.toDF("doc_a", "sh_a", "band", "bv")
        .join(bands.toDF("doc_b", "sh_b", "band", "bv"), Seq("band", "bv"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("CAST(bit_count(sh_a ^ sh_b) AS INT)").as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
    },

    // ---- Embedding-cosine near-dup: LSH-blocked, exact-verified. ----
    // Candidate pairs come from sign-LSH bucket collisions (32 tables × 4
    // bits over deterministic hyperplanes), then the true cosine is
    // computed only for candidates — the same candidates-then-verify shape
    // as q32, so the pair space is never materialized. At 100 TB the
    // bucketing is one narrow map-side projection and the join shuffles
    // by (table, bucket); raise Bits for sharper pruning when dups are
    // tighter than this corpus's cos≈0.5 (e.g. 12-16 bits at cos≥0.9).
    // For a pair at cosine c, P[missed by all tables] =
    // (1-(1-acos(c)/pi)^4)^32 — ≈2e-3 at c=0.45, and recall over this
    // deterministic dataset is exactly 1 (asserted in PipelineSpec).
    QueryDef(
      "q44_dedup_embedding",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_reduce(list_prepend(0.0, [x*x for x in v]), (a,b) -> a+b)) AS nrm
        |  FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_reduce(list_prepend(0.0,
        |      [a.v[i] * b.v[i] for i in range(1, len(a.v)+1)]), (x,y) -> x+y)
        |    / (a.nrm * b.nrm), 6) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_reduce(list_prepend(0.0,
        |      [a.v[i] * b.v[i] for i in range(1, len(a.v)+1)]), (x,y) -> x+y)
        |    / (a.nrm * b.nrm), 6) >= 0.45""".stripMargin) { (s, dir) =>
      val NumTables = 32; val Bits = 4; val Dims = 64; val Threshold = 0.45
      val e = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Vectors.l2norm(col("v")))
      val buckets = e.select(col("vec_id"),
        posexplode(Vectors.lshBuckets(col("v"), NumTables, Bits, Dims))
          .as(Seq("t", "bucket")))
      val cand = buckets.toDF("vec_a", "t", "bucket")
        .join(buckets.toDF("vec_b", "t", "bucket"), Seq("t", "bucket"))
        .where(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      cand
        .join(e.toDF("vec_a", "va", "nrm_a"), "vec_a")
        .join(e.toDF("vec_b", "vb", "nrm_b"), "vec_b")
        .withColumn("cosine",
          round(Vectors.dot(col("va"), col("vb"))
            / (col("nrm_a") * col("nrm_b")), 6))
        .where(col("cosine") >= Threshold)
        .select(col("vec_a"), col("vec_b"), col("cosine"))
    },

    // ---- Dup-cluster canonicalization: connected components over the
    // near-dup pair graph (q31's exact Jaccard ≥ 0.5 pairs), so "keep one
    // doc per duplicate cluster" is a join away. Iterative min-label
    // propagation — each round is one join + aggregate over the (tiny
    // relative to the corpus) edge set; rounds ≤ graph diameter, with a
    // driver-side fixpoint check. This is the standard Spark shape for
    // connected components at scale (GraphFrames does the same under the
    // hood); the DuckDB oracle walks the closure with a recursive CTE.
    QueryDef(
      "q47_dedup_clusters",
      s"""$oracleShingles,
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach AS (
         |  WITH RECURSIVE r(id, label) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.id)
         |  SELECT * FROM r)
         |SELECT id AS doc_id, MIN(label) AS cluster_id
         |FROM reach GROUP BY id""".stripMargin) { (s, dir) =>
      // Iterative min-label propagation extracted to NearDup.clusters
      // (shared with the NEARDEDUP verb): localCheckpoint per round keeps
      // the plan constant-depth; convergence is a 1-row monotone-sum agg.
      val pairs = Dedup.entries.find(_.name == "q31_dedup_ngram_jaccard").get
        .build(s, dir)
        .select(col("doc_a"), col("doc_b"))
      NearDup.clusters(pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
    },

    // ---- Canonical-document selection: the step that APPLIES dedup.
    // q47 says which docs form a duplicate cluster; this picks the one
    // survivor per cluster (longest text wins, lowest doc_id breaks ties
    // — both exact integer keys) and marks the rest for dropping. The
    // winner is an argmax-by-struct aggregation + a same-key join (q59's
    // no-window trick): both sides of the keep-join hash-shuffle on
    // cluster_id, so the agg's exchange is reused and no per-cluster sort
    // happens — at 100 TB cluster membership is ∝ duplicated docs (often
    // a third of the corpus) and a row_number window would sort every
    // cluster; the struct-max agg is partial-aggregatable instead. The
    // cluster frame joins document metadata by doc_id un-hinted: AQE
    // broadcasts it while it fits, shuffles when a pathological corpus
    // makes it huge — both correct.
    QueryDef(
      "q118_cluster_canonical",
      s"""$oracleShingles,
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach AS (
         |  WITH RECURSIVE r(id, label) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.id)
         |  SELECT * FROM r),
         |cl AS (SELECT id AS doc_id, MIN(label) AS cluster_id
         |  FROM reach GROUP BY id),
         |m AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
         |  FROM cl JOIN documents d USING (doc_id))
         |SELECT doc_id, cluster_id, n_chars,
         |  row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id) = 1 AS keep
         |FROM m""".stripMargin) { (s, dir) =>
      val clusters = Dedup.entries.find(_.name == "q47_dedup_clusters").get
        .build(s, dir)
      val meta = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val members = clusters.join(meta, "doc_id")
      val winners = members.groupBy(col("cluster_id"))
        .agg(max(struct(col("n_chars"), -col("doc_id"))).as("w"))
        .select(col("cluster_id"), (-col("w.col2")).as("win_doc"))
      members.join(winners, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_chars"),
          (col("doc_id") === col("win_doc")).as("keep"))
    },

    // ---- Incremental dedup: a new batch against an existing corpus. ----
    // The production shape for continuous ingestion: the corpus side's
    // MinHash signatures/bands are computed ONCE at index time and stored
    // (here both sides derive from the same table, split deterministically
    // by doc_id parity — even = new batch, odd = indexed corpus); each
    // arriving batch computes signatures only for its own documents and
    // probes the stored band index. Candidates are exact-verified, so at
    // the 0.8 threshold the output equals brute-force batch×corpus
    // Jaccard (q32's miss-probability argument), which is what the DuckDB
    // oracle computes. At 100 TB: the band index is bucketed by (band, bh)
    // at write time, so the probe join shuffles ONLY the batch side —
    // per-batch cost ∝ batch size, never corpus size.
    QueryDef(
      "q85_dedup_incremental",
      s"""$oracleShingles,
         |bt AS (SELECT * FROM s WHERE doc_id % 2 = 0),
         |cp AS (SELECT * FROM s WHERE doc_id % 2 = 1),
         |m AS (
         |  SELECT bt.doc_id, cp.doc_id AS dup
         |  FROM bt JOIN cp ON round(CAST(len(list_intersect(bt.sh, cp.sh)) AS DOUBLE)
         |    / (len(bt.sh) + len(cp.sh) - len(list_intersect(bt.sh, cp.sh))), 6) >= 0.8)
         |SELECT bt.doc_id, count(m.dup) AS n_dups, count(m.dup) > 0 AS is_dup
         |FROM bt LEFT JOIN m USING (doc_id)
         |GROUP BY bt.doc_id""".stripMargin) { (s, dir) =>
      // round 16: the shingle frame feeds the signature chain, both
      // exact-verify sides AND the final batch left side (4 consumers —
      // the before-plan shows 10 corpus scans); the band frame feeds
      // both candidate-join sides. Materialize each once: sh lazy (the
      // eager bands checkpoint below runs through it), bands eager so
      // the join's sibling stages read cached blocks (guide §2.4).
      val sh = shingled(s, dir).localCheckpoint(false)
      val sig = sh.select(col("doc_id"), Text.hashedShingles(col("shs")).as("hs"))
        .select(col("doc_id"),
          Text.minhashSigFromHashes(col("hs"), numPerm = 128).as("sig"))
      val bands = sig
        .select(col("doc_id"),
          explode(Text.lshBands(col("sig"), numBands = 32, rowsPerBand = 4))
            .as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
        .localCheckpoint()
      val batchBands = bands.where(col("doc_id") % 2 === 0)
        .toDF("doc_a", "band", "bh")
      val corpusBands = bands.where(col("doc_id") % 2 === 1)
        .toDF("doc_b", "band", "bh")
      val cand = batchBands.join(corpusBands, Seq("band", "bh"))
        .select("doc_a", "doc_b")
        .distinct()
      val matches = NearDup.verifyPairs(
        cand, sh.select(col("doc_id"), col("shs")), 0.8)
        .groupBy(col("doc_a").as("doc_id"))
        .agg(count(lit(1)).as("n_dups"))
      sh.where(col("doc_id") % 2 === 0).select(col("doc_id"))
        .join(matches, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          (coalesce(col("n_dups"), lit(0L)) > 0).as("is_dup"))
    },

    // ---- Containment dedup: directional near-dup (doc ⊂ doc). ----
    // Jaccard misses the "quoted wholesale inside a bigger page" case: a
    // short doc fully embedded in a long one has low Jaccard (union is
    // dominated by the container) but containment |A∩B|/|A| ≈ 1. Corpus
    // curation removes the contained copy, keeps the container. Same
    // inverted-index shape as q31 — the pair space is only pairs sharing
    // ≥1 shingle, shuffled by 8-byte shingle hash — then the symmetric
    // common-count frame fans out into BOTH directional scores (one extra
    // map-side projection, no second join). ≥5 shingles floor keeps
    // trivially-small docs from matching everything. At 100 TB: identical
    // scale path as q31 (drop ultra-high-DF shingles first); the
    // directional fan-out adds zero shuffles.
    QueryDef(
      "q106_dedup_containment",
      s"""$oracleShingles
         |SELECT a.doc_id AS contained, b.doc_id AS container,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(a.sh), 6) AS containment
         |FROM s a JOIN s b ON a.doc_id <> b.doc_id
         |WHERE len(a.sh) >= 5 AND len(b.sh) >= 5
         |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(a.sh), 6) >= 0.9""".stripMargin) { (s, dir) =>
      // NO size-filter on the corpus path: a where(size(shs) >= 5) above
      // the shingle projection gets alias-substituted by predicate
      // pushdown and re-evaluates the whole tokenize+shingle pipeline
      // inside the pushed filter (measured 5.8 s vs 1.3 s for q31's
      // identical join at sf0.1). The ≥5-shingle floor is applied below
      // on the |pairs|-sized scored frame via the already-joined
      // n_a/n_b — same semantics as the oracle's len(sh) >= 5 per side.
      // round 16: materialize the postings once — they feed the counts
      // frame AND both self-join sides (the before-plan shows 4 corpus
      // scans; guide §2.4). Lazy: the eager counts checkpoint below
      // materializes it in one job at build time.
      val sh = shingled(s, dir)
        .select(col("doc_id"), size(col("shs")).as("n"),
          explode(Text.hashedShingles(col("shs"))).as("h"))
        .localCheckpoint(false)
      // localCheckpoint (same rationale as q31): one corpus scan feeds
      // both broadcast sides, and — the 4× cost here — the n_a/n_b ≥ 5
      // floor below can no longer be alias-substituted through the
      // broadcast join into a per-row size(<shingle pipeline>) filter on
      // the raw text scan (predicate pushdown stops at the RDD barrier).
      val counts = sh.select(col("doc_id"), col("n")).distinct()
        .localCheckpoint()
      val a = sh.select(col("doc_id").as("doc_a"), col("h"))
      val b = sh.select(col("doc_id").as("doc_b"), col("h"))
      val common = a.join(b, "h")
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("common"))
      val na = broadcast(counts.toDF("doc_a", "n_a"))
      val nb = broadcast(counts.toDF("doc_b", "n_b"))
      // Both directional scores come off each symmetric pair row as plain
      // columns, the threshold prunes |pairs| → |near-dups| while still
      // fully codegen'd, and only the surviving handful explode into
      // (contained, container) rows. Two earlier shapes measured 4-5×
      // slower at sf0.1: a union of two selects physically duplicates the
      // whole inverted-index subtree (exchanges are reused, operator
      // subtrees are not), and exploding BEFORE the filter paid the
      // non-codegen generator over the full 1.1M-row pair frame.
      common.join(na, "doc_a").join(nb, "doc_b")
        .where(col("n_a") >= 5 && col("n_b") >= 5)
        .withColumn("c_ab",
          round(col("common").cast("double") / col("n_a"), 6))
        .withColumn("c_ba",
          round(col("common").cast("double") / col("n_b"), 6))
        .where(col("c_ab") >= 0.9 || col("c_ba") >= 0.9)
        .select(explode(array(
          struct(col("doc_a").as("contained"), col("doc_b").as("container"),
            col("c_ab").as("containment")),
          struct(col("doc_b").as("contained"), col("doc_a").as("container"),
            col("c_ba").as("containment")))).as("e"))
        .select(col("e.contained").as("contained"),
          col("e.container").as("container"),
          col("e.containment").as("containment"))
        .where(col("containment") >= 0.9)
    },

    // ---- Typo/fuzzy dedup via deletion-neighborhood blocking (SymSpell's
    // index, adapted to a join): match noisy strings to a canonical
    // dictionary at edit distance ≤ 1 WITHOUT the |dirty|×|dict|
    // cross-levenshtein. Completeness: two strings within ED 1 always
    // share a member of {s} ∪ deletes1(s) (deletion ⇒ q ∈ D1(c);
    // substitution ⇒ same-position deletes collide; equality trivial), so
    // an equi-join on the variant covers every true pair and levenshtein
    // runs ONLY on candidates. The join key is xxhash64(variant) — 8-byte
    // shuffle rows regardless of string length; hash collisions can only
    // add candidates, never drop them, and the exact verify removes them.
    // Candidate volume is Σ(len+1) per side (~|rows|×len), linear — at
    // 100 TB the dictionary's delete index is precomputed and bucketed,
    // exactly like q85's MinHash band index. The dirty probe set here is
    // derived in-plan: every third customer name with one character
    // (position = key mod length) deleted. The oracle is the brute-force
    // cross join — so the gate also PROVES blocking completeness.
    QueryDef(
      "q98_dedup_typo",
      """WITH dirty AS (
        |  SELECT c_custkey AS qkey,
        |    substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT)) ||
        |    substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)
        |      AS q
        |  FROM customer WHERE c_custkey % 3 = 0)
        |SELECT d.qkey, d.q AS dirty, c.c_name AS canonical,
        |  levenshtein(d.q, c.c_name) AS dist
        |FROM dirty d JOIN customer c
        |  ON levenshtein(d.q, c.c_name) <= 1""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      // delete-1 variants plus the identity — the SHARED generator
      // (NearDup.delete1Variants, also the TYPO verb's blocking)
      def variants(src: DataFrame, strCol: String): DataFrame =
        NearDup.delete1Variants(src, strCol)
      val dirty = cust.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("qkey"),
          concat(
            expr("substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))"),
            expr("substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)"))
            .as("q"))
      val probe = variants(dirty, "q")
      val index = variants(cust, "c_name")
      probe.join(index, Seq("vh"))
        .select(col("qkey"), col("q"), col("c_custkey"), col("c_name"))
        .distinct()
        .where(levenshtein(col("q"), col("c_name")) <= 1)
        .select(col("qkey"), col("q").as("dirty"),
          col("c_name").as("canonical"),
          levenshtein(col("q"), col("c_name")).as("dist"))
    },

    // ---- Banded text index as a STORED artifact: build once, persist
    // cell-partitioned, probe from the files. q128 proves the AGAINST
    // algebra through the language layer with the corpus index built
    // in-plan; THIS gate proves the deployment shape the 100 TB story
    // everywhere promises (NearDup.minhashCrossMatches scaladoc: "the
    // corpus band index is written once and every batch pays only its
    // own collision mass"): corpus shingling + signatures + band keys
    // happen ONE time in NearDup.bandStoreFrom's index-build job, and
    // the per-batch probe (minhashCrossMatchesStored) answers from the
    // stored files alone — batch-side signatures, driver-routed static
    // cell pruning on both the band store and the shingle store, exact
    // verification, never a corpus text re-scan. The oracle is the SAME
    // brute-force batch×corpus SQL as q128, so storing and re-reading
    // the index (band keys and shingle arrays round-trip parquet
    // exactly) must not change a single kept row. graft.BandScale
    // measures the per-batch flatness claim this gate pins the
    // correctness of.
    QueryDef(
      "q144_neardedup_stored",
      againstKeptOracleSql) { (s, dir) =>
      val base = bandStore(s, dir)
      val batch = docs(s, dir).where(col("doc_id") % 2 === 0)
        .localCheckpoint(false) // feeds shingling AND the final anti-join
      val shB = batch
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("doc_id").as("id"),
          Text.shinglesFromTokens(col("ws")).as("shs"))
      val matched = NearDup.minhashCrossMatchesStored(s, base, shB, 0.5,
        numPerm = 128, numBands = 64, rowsPerBand = 2).toDF("doc_id")
      batch.join(matched, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    },
  )
}
