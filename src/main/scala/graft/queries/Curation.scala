package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators over `documents` — the slicing/filtering/
  * sampling layer of a training-data pipeline, complementing the dedup
  * (q30-q33/q44/q47) and text-analysis (q36-q39) families. Beyond-parity
  * surface: the reference has no text-corpus operators.
  *
  * Scale notes per query are inline; the common thread is that every
  * per-document computation is a map-side projection or an explode
  * (row fan-out, no shuffle), and every aggregation shuffles on
  * (doc_id, gram)-shaped keys whose cardinality is bounded by corpus
  * token count — never by document pairs.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Local-mode parallelism for the gram-explosion queries: one parquet
    * file = one input split = one task, so fan the scan out before the
    * CPU-heavy n-gram work (same rationale as Dedup.docs). Not used by
    * q67/q69/q71, whose map-side-only plan shape is itself the contract
    * (PlanSpec) and whose per-row work is cheap.
    */
  private def docsPar(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).repartition(s.sparkContext.defaultParallelism)

  /** Whitespace tokens, DuckDB-mirrorable (same list both engines). */
  private val DuckWs =
    "list_filter(string_split(text, ' '), x -> x <> '')"

  /** q67's oracle text, exposed for the CHUNK-verb gate (q140): the verb
    * at SIZE 64 STRIDE 48 is q67's algebra through the language layer,
    * so the two gates share one oracle by construction.
    */
  private[queries] val chunkOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $DuckWs AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, ws,
       |    unnest(range(0, (len(ws) - 1) // 48 + 1)) AS chunk_idx
       |  FROM t WHERE len(ws) > 0)
       |SELECT doc_id, chunk_idx,
       |  len(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64))
       |    AS n_chunk_tokens,
       |  array_to_string(
       |    list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')
       |    AS chunk_text
       |FROM c""".stripMargin

  val entries: Seq[QueryDef] = Seq(

    // ---- Fixed-size token chunking with overlap (64-token windows,
    // stride 48): the standard pre-tokenization shaping step before
    // training/embedding. explode(sequence) is a map-side row fan-out —
    // fan-out factor ≈ 1/stride of the token count, no shuffle anywhere;
    // slice/array_join stay inside codegen. At 100 TB this parallelizes
    // purely by input partition; downstream writers see chunk rows whose
    // size is bounded by the window, so no skew regardless of document
    // length distribution.
    QueryDef(
      "q67_doc_chunking",
      chunkOracleSql) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      val chunk = slice(col("ws"),
        (col("chunk_idx") * 48 + 1).cast("int"), lit(64))
      docs(s, dir)
        .select(col("doc_id"), ws.as("ws"))
        .where(size(col("ws")) > 0)
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(0L),
            ((size(col("ws")) - 1) / 48).cast("long"))).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          size(chunk).as("n_chunk_tokens"),
          array_join(chunk, " ").as("chunk_text"))
    },

    // ---- Repetition-ratio quality signals (the Gopher-rule family):
    // share of the document covered by its most frequent bigram, and by
    // all repeated bigrams. Two hash aggregations — (doc_id, gram) then
    // doc_id — both with map-side partial agg; shuffle volume is bounded
    // by distinct grams per doc, not tokens². The bigram build is a
    // per-row array transform evaluated once per token (not a hot
    // 10⁴-per-row kernel, so interpreted HOF cost is immaterial here —
    // contrast functions/MinHashSigExpression for the native-kernel case).
    QueryDef(
      "q68_repetition_quality",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
         |      AS gram
         |  FROM t WHERE len(ws) >= 2),
         |c AS (
         |  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
         |SELECT doc_id,
         |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_bigram_frac,
         |  round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
         |    / sum(cnt), 6) AS dup_bigram_frac
         |FROM c GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      docsPar(s, dir)
        .select(col("doc_id"), ws.as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(ws) - 2),
            |  i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))
            |""".stripMargin)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          round(max(col("cnt")).cast("double") / sum(col("cnt")), 6)
            .as("top_bigram_frac"),
          round(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
            .cast("double") / sum(col("cnt")), 6).as("dup_bigram_frac"))
    },

    // ---- Deterministic stratified sampling: per-language keep rates
    // (en 50%, others 20%) decided by the engine-portable md5 hash bucket
    // of the key alone (the q66 split trick) — membership is a pure
    // function of doc_id, reproducible across engines, partitionings,
    // runs, and scale. Map-side only; no sampling state, no shuffle, and
    // the rate table extends per stratum without replanning.
    QueryDef(
      "q69_stratified_sample",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 1000 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM t
        |WHERE bucket < CASE WHEN lang = 'en' THEN 500 ELSE 200 END
        |""".stripMargin) { (s, dir) =>
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("bigint") % 1000
      docs(s, dir)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .where(col("bucket") <
          when(col("lang") === "en", 500).otherwise(200))
    },

    // ---- Benchmark-contamination scan: count distinct shared 5-grams
    // between every corpus document and a probe ("benchmark") set — here
    // the deterministic 2% slice doc_id % 50 = 0. Inverted-index shape:
    // explode distinct grams per side and equi-join on the gram, so cost
    // is ∝ colliding grams, never |corpus|×|probes|. The probe side is
    // tiny by construction → broadcast, corpus grams never shuffle for
    // the join; the (doc, probe) count agg shuffles only matched pairs.
    // At 100 TB the gram join key would be xxhash64(gram) (8 bytes, like
    // q31's posting lists); the string key here keeps the oracle exact.
    QueryDef(
      "q70_contamination",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(
         |      [array_to_string(list_slice(ws, i, i + 4), ' ')
         |       for i in range(1, len(ws) - 3)])) AS gram
         |  FROM t WHERE len(ws) >= 5),
         |p AS (SELECT doc_id AS probe_id, gram FROM g WHERE doc_id % 50 = 0),
         |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
         |SELECT c.doc_id, p.probe_id, count(*) AS n_shared
         |FROM c JOIN p USING (gram)
         |GROUP BY c.doc_id, p.probe_id""".stripMargin) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      val grams = docsPar(s, dir)
        .select(col("doc_id"), ws.as("ws"))
        .where(size(col("ws")) >= 5)
        .select(col("doc_id"), explode(array_distinct(expr(
          """transform(sequence(0, size(ws) - 5),
            |  i -> array_join(slice(ws, i + 1, 5), ' '))""".stripMargin)))
          .as("gram"))
      val probes = grams.where(col("doc_id") % 50 === 0)
        .withColumnRenamed("doc_id", "probe_id")
      val corpus = grams.where(col("doc_id") % 50 =!= 0)
      corpus.join(broadcast(probes), "gram")
        .groupBy(col("doc_id"), col("probe_id"))
        .agg(count(lit(1)).as("n_shared"))
    },

    // ---- Sequence packing: assign documents to fixed 512-token training
    // sequences by running token count, packed per source shard in doc_id
    // order. The window is PARTITION BY source — packing state never
    // crosses a shard, so parallelism = shard count and no global sort
    // exists anywhere (the per-shard sort is the one shuffle). That
    // mirrors production packing, which is per-worker/per-file anyway;
    // a global pack order would serialize the corpus for no training
    // benefit. Deterministic: doc_id is a total order within shard.
    QueryDef(
      "q71_sequence_packing",
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    len($DuckWs) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, source, n_tokens,
         |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
         |  CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
         |FROM c""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("bigint").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 512).cast("bigint")
            .as("seq_id"),
          ((col("cum") - col("n_tokens")) % 512).cast("bigint")
            .as("seq_offset"))
    },

    // ---- Decontamination: the removal step downstream of q70 — keep
    // only corpus documents sharing NO 5-gram with the probe set, as a
    // left-anti join against the contaminated-id set. The anti join's
    // build side is (distinct contaminated ids) ≤ |probe hits| — tiny,
    // broadcast; the corpus side streams map-side. Output is the
    // surviving-count per language (the pipeline health metric).
    QueryDef(
      "q72_decontaminate",
      s"""WITH t AS (
         |  SELECT doc_id, lang, $DuckWs AS ws FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(
         |      [array_to_string(list_slice(ws, i, i + 4), ' ')
         |       for i in range(1, len(ws) - 3)])) AS gram
         |  FROM t WHERE len(ws) >= 5),
         |bad AS (
         |  SELECT DISTINCT c.doc_id
         |  FROM (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0) c
         |  JOIN (SELECT gram FROM g WHERE doc_id % 50 = 0) p USING (gram))
         |SELECT lang, count(*) AS n_clean
         |FROM documents
         |WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
         |GROUP BY lang""".stripMargin) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      val grams = docsPar(s, dir)
        .select(col("doc_id"), ws.as("ws"))
        .where(size(col("ws")) >= 5)
        .select(col("doc_id"), explode(array_distinct(expr(
          """transform(sequence(0, size(ws) - 5),
            |  i -> array_join(slice(ws, i + 1, 5), ' '))""".stripMargin)))
          .as("gram"))
      val contaminated = grams.where(col("doc_id") % 50 =!= 0)
        .join(broadcast(
          grams.where(col("doc_id") % 50 === 0).select(col("gram"))), "gram")
        .select(col("doc_id")).distinct()
      docs(s, dir).where(col("doc_id") % 50 =!= 0)
        .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_clean"))
    },

    // ---- Embedding int8 quantization: symmetric per-vector scaling to
    // [-127, 127] — the 4× storage/bandwidth shrink ANN indexes ship
    // with. Pure map-side per-vector arithmetic. Cross-engine exactness:
    // elements widen float→double identically in both engines, and the
    // quantizer is floor(x + 0.5) (not round(), whose half-case rule
    // differs between engines); outputs are integer sums/extrema plus a
    // 6-dp scale, so the oracle hash-matches bit-for-bit.
    QueryDef(
      "q73_embed_quantize",
      """WITH t AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
        |    embedding
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, maxabs,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5)
        |        AS BIGINT)) AS qv
        |  FROM t WHERE maxabs > 0)
        |SELECT vec_id, round(maxabs / 127.0, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM q""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          array_max(expr("transform(embedding, x -> abs(CAST(x AS DOUBLE)))"))
            .as("maxabs"))
        .where(col("maxabs") > 0)
        .withColumn("qv", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS BIGINT))"))
        .select(col("vec_id"),
          round(col("maxabs") / 127.0, 6).as("scale"),
          expr("aggregate(qv, 0L, (a, x) -> a + x)").cast("bigint").as("q_sum"),
          array_min(col("qv")).cast("bigint").as("q_min"),
          array_max(col("qv")).cast("bigint").as("q_max"))
    },

    // ---- Corpus unigram log-probability scoring: the KenLM-style
    // fluency signal, self-trained — P(t) = c(t)/N over the corpus, doc
    // score = Σ ln P(token). Shapes: token counts = one hash agg (vocab-
    // sized output), N = in-plan 1-row agg cross-joined (the q56
    // pattern, no extra action), per-doc score = broadcast vocab join on
    // the exploded tokens + one doc-keyed agg. Cross-engine exactness:
    // each ln is quantized to DECIMAL(28,12) BEFORE summing — decimal
    // sums are associative, so the result is identical under any
    // partitioning and matches DuckDB bit-for-bit (a raw double sum
    // would be partition-order-dependent).
    QueryDef(
      "q74_unigram_logprob",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(ws) AS term FROM t WHERE len(ws) > 0),
         |vocab AS (
         |  SELECT term, count(*) AS c FROM tok GROUP BY term),
         |n AS (SELECT count(*) AS n_total FROM tok)
         |SELECT tok.doc_id,
         |  count(*) AS n_tokens,
         |  round(CAST(SUM(CAST(ln(CAST(vocab.c AS DOUBLE) / n.n_total)
         |    AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
         |FROM tok, n
         |JOIN vocab ON tok.term = vocab.term
         |GROUP BY tok.doc_id""".stripMargin) { (s, dir) =>
      val tok = docsPar(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .where(size(col("ws")) > 0)
        .select(col("doc_id"), explode(col("ws")).as("term"))
      val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
      // N = Σ vocab counts, attached via an unpartitioned window over the
      // vocab aggregate — vocab-sized data through one task, which is fine
      // because the whole frame is about to broadcast anyway. Computing N
      // from `tok` directly would cost a third full corpus scan+tokenize
      // (Spark recomputes unshared subtrees); this shape keeps the query
      // at the minimal two corpus scans (vocab build + scoring).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      val vocabN = vocab.withColumn("n_total", sum(col("c")).over(w))
      tok.join(broadcast(vocabN), "term")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          round(
            sum(log(col("c").cast("double") / col("n_total"))
              .cast("decimal(28,12)")).cast("double") / count(lit(1)),
            6).as("avg_logprob"))
    },

    // ---- Composite quality-filter verdict: the C4/Gopher-style keep/
    // drop materialization — length bounds, type-token ratio, and
    // duplicate-bigram bounds combined into one decision with the first
    // failing rule as the reason (what a curation pipeline logs before
    // dropping). One explode + two hash aggs (the q68 shape) then a
    // map-side verdict projection; thresholds are literals in the plan.
    QueryDef(
      "q75_quality_filter",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
         |      AS gram
         |  FROM t WHERE len(ws) >= 2),
         |c AS (
         |  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
         |rep AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
         |      / sum(cnt) AS dup_frac
         |  FROM c GROUP BY doc_id),
         |m AS (
         |  SELECT t.doc_id, len(ws) AS n_tokens,
         |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
         |    rep.dup_frac
         |  FROM t JOIN rep ON t.doc_id = rep.doc_id)
         |SELECT doc_id, n_tokens,
         |  CASE
         |    WHEN n_tokens < 10 THEN 'too_short'
         |    WHEN n_tokens > 5000 THEN 'too_long'
         |    WHEN ttr < 0.2 THEN 'low_diversity'
         |    WHEN dup_frac > 0.5 THEN 'repetitive'
         |    ELSE 'keep'
         |  END AS verdict
         |FROM m""".stripMargin) { (s, dir) =>
      val base = docsPar(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
      val rep = base
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(ws) - 2),
            |  i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))
            |""".stripMargin)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg((sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
          .cast("double") / sum(col("cnt"))).as("dup_frac"))
      base
        .select(col("doc_id"), size(col("ws")).as("n_tokens"),
          (size(array_distinct(col("ws"))).cast("double") / size(col("ws")))
            .as("ttr"))
        .join(rep, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") < 10, "too_short")
            .when(col("n_tokens") > 5000, "too_long")
            .when(col("ttr") < 0.2, "low_diversity")
            .when(col("dup_frac") > 0.5, "repetitive")
            .otherwise("keep").as("verdict"))
    },

    // ---- Repeated-span detection: exact substring-level dedup (the
    // "dedup training data at the span level, not the document level"
    // step — near-dup documents share long verbatim runs even when the
    // whole doc differs). Fixed 16-token windows at stride 8 cover every
    // token with ≤2 windows, so any verbatim run ≥ 23 tokens is caught
    // regardless of alignment. explode is a map-side fan-out of
    // ~tokens/stride rows; the only shuffle is the span hash-agg, with
    // map-side partial agg bounding it by distinct spans per partition.
    // At 100 TB the group key becomes xxhash64(span) (8 bytes, q31's
    // posting trick) and the HAVING keeps output ∝ duplicated spans only.
    QueryDef(
      "q76_repeated_spans",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(list_slice(ws, i, i + 15), ' ')
         |            for i in range(1, len(ws) - 14, 8)]) AS span
         |  FROM t WHERE len(ws) >= 16)
         |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
         |FROM sp GROUP BY span
         |HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin) { (s, dir) =>
      docsPar(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .where(size(col("ws")) >= 16)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, (size(ws) - 16) div 8),
            |  i -> array_join(slice(ws, CAST(i * 8 + 1 AS INT), 16), ' '))
            |""".stripMargin)).as("span"))
        .groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .where(col("n_docs") >= 2)
    },

    // ---- Per-source quota cap (domain caps): keep at most 10 documents
    // per source, deterministically (lowest doc_id wins) — the "no single
    // domain dominates the corpus" rule. Implemented as SALTED two-phase
    // top-N: phase 1 ranks within (source, salt16) so a hot domain's rows
    // spread over 16 reducers and each emits ≤10 survivors; phase 2 ranks
    // the ≤160 survivors per source. Identical output to a single window
    // (the oracle), but no reducer ever sees more than ~1/16 of a hot
    // domain — the q48 salting idea applied to top-N instead of a join.
    QueryDef(
      "q77_source_cap",
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 10""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val salted = Window
        .partitionBy(col("source"), pmod(xxhash64(col("doc_id")), lit(16)))
        .orderBy(col("doc_id"))
      val perSource = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("lrn", row_number().over(salted))
        .where(col("lrn") <= 10) // each salt lane over-keeps the cap
        .withColumn("rn", row_number().over(perSource))
        .where(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn"))
    },

    // ---- Bigram language-model scoring: add-one-smoothed conditional
    // log-probability P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), averaged
    // per document — the step up from q74's unigram fluency signal.
    // Self-trained in the same plan: bigram counts are one hash agg
    // (vocab²-bounded output); context counts c(w1 ·) and the vocabulary
    // size V ride windows over that already-aggregated frame (sum over
    // w1; max dense_rank = count distinct, which window functions can't
    // express directly) — so the corpus is tokenized exactly twice (count
    // build + scoring), never three times. The enriched model frame then
    // broadcasts; exploded bigrams never shuffle by gram. Exactness: each
    // ln is quantized to DECIMAL(28,12) before summing (q74's trick), so
    // the sum is partition-order-independent and hash-matches DuckDB.
    QueryDef(
      "q78_bigram_logprob",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
         |      AS gram
         |  FROM t WHERE len(ws) >= 2),
         |c12 AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
         |c1 AS (
         |  SELECT split_part(gram, ' ', 1) AS w1, sum(c) AS c1
         |  FROM c12 GROUP BY 1),
         |v AS (SELECT count(DISTINCT split_part(gram, ' ', 2)) AS v FROM c12)
         |SELECT g.doc_id, count(*) AS n_bigrams,
         |  round(CAST(sum(CAST(ln((c12.c + 1.0) / (c1.c1 + v.v))
         |    AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
         |FROM g, v
         |JOIN c12 ON g.gram = c12.gram
         |JOIN c1 ON split_part(g.gram, ' ', 1) = c1.w1
         |GROUP BY g.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val grams = docsPar(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(ws) - 2),
            |  i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))
            |""".stripMargin)).as("gram"))
      val c12 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .withColumn("w1", split_part(col("gram"), lit(" "), lit(1)))
        .withColumn("w2", split_part(col("gram"), lit(" "), lit(2)))
      // model frame is vocab²-sized; single-task windows are fine because
      // the whole frame broadcasts right after (same call as q74's n_total)
      val all = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      val model = c12
        .withColumn("c1", sum(col("c")).over(Window.partitionBy(col("w1"))))
        .withColumn("r", dense_rank().over(Window.partitionBy().orderBy(col("w2"))))
        .withColumn("v", max(col("r")).over(all))
        .select(col("gram"), col("c"), col("c1"), col("v"))
      grams.join(broadcast(model), "gram")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          round(
            sum(log((col("c") + 1.0) / (col("c1") + col("v")))
              .cast("decimal(28,12)")).cast("double") / count(lit(1)),
            6).as("avg_logprob"))
    },

    // ---- Weighted sampling without replacement (Efraimidis–Spirakis
    // A-ES): keep the 50 documents with the largest ln(u)/w where u is a
    // per-doc uniform draw and w = n_chars — equivalent to drawing 50
    // docs weighted by length, without replacement. The draw is the
    // engine-portable md5 trick (q66/q69): 13 hex chars = 52 bits < 2⁵³,
    // so u is bit-exact in both engines' doubles and the sample is a pure
    // function of doc_id — reproducible across runs, partitionings, and
    // engines. This is THE distributed weighted-sampling shape: keys are
    // independent per row (map-side), and top-k-by-key merges across
    // partitions (TakeOrderedAndProject) — per-partition reservoirs of
    // size k, merged, no global sort, no sampling state.
    QueryDef(
      "q89_weighted_sample",
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |       AS BIGINT) + 0.5) / 4503599627370496.0 AS u
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, lang, n_chars, round(ln(u) / n_chars, 9) AS skey
        |FROM t ORDER BY ln(u) / n_chars DESC, doc_id LIMIT 50""".stripMargin) {
      (s, dir) =>
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("bigint") + lit(0.5)) / lit(4503599627370496.0)
      Tables.load(s, dir, "documents")
        .where(col("n_chars") > 0)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (log(u) / col("n_chars")).as("k0"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("k0"), 9).as("skey"), col("k0"))
        .orderBy(col("k0").desc, col("doc_id"))
        .limit(50)
        .drop("k0")
    },

    // ---- Temperature-scaled source mixing: resample a multi-source
    // corpus so source s keeps rate ∝ (bytes_min / bytes_s)^(1−T) —
    // the smallest source keeps 100 % and kept MASS comes out
    // ∝ bytes_s^T, which at T = 0.5 flattens the source-size
    // distribution (a 9× bigger source ends 3× bigger, not 9×) — the
    // standard multilingual/multi-source rebalancing before LLM
    // training, achievable without upsampling. (Round-8 fix: the
    // original rate ∝ bytes^T/max kept the LARGEST source whole and
    // thinned the small ones — kept mass ∝ bytes^(1+T), the opposite
    // of flattening; the MIX verb's T=1 identity exposed it.) Stage 1
    // aggregates bytes per source (|sources| rows); the rate frame
    // broadcasts back onto the corpus and the keep decision is the
    // md5-bucket trick (q69) — map-side, deterministic, engine-
    // portable. sqrt, division and the ×10⁶ floor are correctly-
    // rounded IEEE ops ⇒ identical thresholds on both engines. Two
    // corpus scans total (stats + filter), the q78 pattern; at 100 TB
    // the rate frame is computed once per snapshot and reused across
    // epochs.
    QueryDef(
      "q100_temperature_mix",
      """WITH stats AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS bytes_s
        |  FROM documents GROUP BY source),
        |rates AS (
        |  -- min over POSITIVE weights only, and a degenerate (zero-
        |  -- weight) source reports keep_ppm = 0 for itself instead of
        |  -- poisoning every source's rate (sqrt(0)/sqrt(w) would zero
        |  -- the whole corpus; 0/0 = NaN would diverge between engines)
        |  SELECT source, bytes_s,
        |    CASE WHEN bytes_s > 0 THEN
        |      CAST(floor(1000000.0 *
        |        sqrt(CAST(min(CASE WHEN bytes_s > 0 THEN bytes_s END)
        |          OVER () AS DOUBLE)) /
        |        sqrt(CAST(bytes_s AS DOUBLE))) AS BIGINT)
        |    ELSE 0 END AS keep_ppm
        |  FROM stats),
        |kept AS (
        |  SELECT d.source,
        |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 1000000 < r.keep_ppm AS keep
        |  FROM documents d JOIN rates r USING (source))
        |SELECT r.source, r.bytes_s, r.keep_ppm,
        |  (SELECT count(*) FROM kept k
        |   WHERE k.source = r.source AND k.keep) AS n_kept
        |FROM rates r""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val stats = d.groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("bigint").as("bytes_s"))
      val rates = stats.withColumn("keep_ppm",
        when(col("bytes_s") > 0,
          floor(lit(1000000.0) *
            sqrt(min(when(col("bytes_s") > 0, col("bytes_s")))
              .over(Window.partitionBy()).cast("double")) /
            sqrt(col("bytes_s").cast("double"))).cast("bigint"))
          .otherwise(lit(0L)))
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("bigint") % 1000000
      val kept = d.join(broadcast(rates.select("source", "keep_ppm")),
          Seq("source"))
        .where(bucket < col("keep_ppm"))
        .groupBy(col("source")).agg(count(lit(1)).as("nk"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("bytes_s"), col("keep_ppm"),
          coalesce(col("nk"), lit(0L)).as("n_kept"))
    },

    // ---- Corpus-driven boilerplate-token pruning: rewrite every document
    // with tokens whose document frequency exceeds 50% of the corpus
    // removed — the data-driven stopword pass (C4-style boilerplate
    // stripping at token granularity; the threshold comes from the corpus
    // itself, not a fixed list). Plan: one (tok) shuffle builds the df
    // frame (|vocab| rows), the stoplist collapses to a deterministic
    // sorted array on a 1-row frame, and the rewrite is a map-side HOF
    // filter under a broadcast cross-join — token order preserved in
    // place, no explode/regroup round trip, corpus scanned exactly twice.
    // At 100 TB the stoplist stays tiny (df > N/2 bounds it hard) and the
    // cleaning pass is embarrassingly parallel.
    QueryDef(
      "q107_stopword_prune",
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |n AS (SELECT count(*) AS nd FROM w),
        |t AS (SELECT DISTINCT doc_id, tok
        |      FROM (SELECT doc_id, unnest(ws) AS tok FROM w)),
        |d AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
        |stop AS (SELECT list(tok ORDER BY tok) AS sl
        |         FROM d, n WHERE df * 2 > nd)
        |SELECT w.doc_id,
        |  -- COALESCE on array_to_string: DuckDB yields NULL for an empty
        |  -- list where Spark's array_join yields '' (fully-pruned docs).
        |  -- COALESCE on sl: list() over ZERO stop rows is NULL (Spark's
        |  -- collect_list is []) — without it an empty stoplist strips
        |  -- every token instead of none
        |  COALESCE(array_to_string(
        |      list_filter(ws, x -> NOT list_contains(COALESCE(sl, []), x)),
        |      ' '), '')
        |    AS clean_text,
        |  CAST(len(ws)
        |    - len(list_filter(ws, x -> NOT list_contains(COALESCE(sl, []), x)))
        |    AS BIGINT) AS n_removed
        |FROM w CROSS JOIN stop""".stripMargin) { (s, dir) =>
      val w = docs(s, dir).select(col("doc_id"),
        graft.functions.Text.tokens(col("text")).as("ws"))
      // per-doc token dedup happens MAP-SIDE (array_distinct before the
      // explode), so df needs only the one partial-aggregatable (tok)
      // shuffle — a (doc_id, tok) distinct would shuffle the corpus twice
      val df_ = w.select(explode(array_distinct(col("ws"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      // 1-row frames: corpus size and the sorted stoplist (q56's in-plan
      // count shape — no driver-side action)
      val nFrame = w.agg(count(lit(1)).as("nd"))
      val stop = df_.crossJoin(broadcast(nFrame))
        .where(col("df") * 2 > col("nd"))
        .agg(sort_array(collect_list(col("tok"))).as("sl"))
      val cleaned = w.crossJoin(broadcast(stop))
        .withColumn("clean",
          filter(col("ws"), x => !array_contains(col("sl"), x)))
      cleaned.select(col("doc_id"),
        array_join(col("clean"), " ").as("clean_text"),
        (size(col("ws")) - size(col("clean"))).cast("bigint").as("n_removed"))
    },

    // ---- Duplicated-span coverage filter: the document-level APPLICATION
    // of q76's exact-substring detection (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better"; RefinedWeb drops docs
    // whose duplicate-span coverage is high). Per doc: what fraction of
    // its 16-token stride-8 spans appear verbatim in ≥ 2 distinct docs?
    // keep = coverage < 50 % (docs too short to span always keep).
    // Scale shape: span explode is a map-side fan-out; the dup-span set
    // is ONE partial-aggregatable (span) shuffle; coverage is a shuffle
    // join back on span (the dup set is corpus-sized at 100 TB — never
    // broadcast it) + one (doc_id) count agg. All outputs are integer
    // counts + a boolean, so the gate is hash-exact. At 100 TB the join
    // key becomes xxhash64(span) — 8 bytes instead of ~100 (q31's trick);
    // the string key here keeps the oracle engine-portable.
    QueryDef(
      "q122_dup_coverage",
      s"""WITH t AS (
         |  SELECT doc_id, $DuckWs AS ws FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(list_slice(ws, i, i + 15), ' ')
         |            for i in range(1, len(ws) - 14, 8)]) AS span
         |  FROM t WHERE len(ws) >= 16),
         |d AS (
         |  SELECT span FROM sp GROUP BY span
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT sp.doc_id, COUNT(*) AS n_spans, COUNT(d.span) AS n_dup
         |  FROM sp LEFT JOIN d ON sp.span = d.span
         |  GROUP BY sp.doc_id)
         |SELECT t.doc_id,
         |  COALESCE(n_spans, 0) AS n_spans,
         |  COALESCE(n_dup, 0) AS n_dup_spans,
         |  (COALESCE(n_spans, 0) = 0 OR COALESCE(n_dup, 0) * 2
         |    < COALESCE(n_spans, 0)) AS keep
         |FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id""".stripMargin) {
      (s, dir) =>
      val t = docsPar(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
      val spans = t.where(size(col("ws")) >= 16)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, (size(ws) - 16) div 8),
            |  i -> array_join(slice(ws, CAST(i * 8 + 1 AS INT), 16), ' '))
            |""".stripMargin)).as("span"))
      val dup = spans.groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2)
        .select(col("span"), lit(1L).as("is_dup"))
      val cov = spans.join(dup, Seq("span"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      t.select(col("doc_id")).join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup_spans"),
          (coalesce(col("n_spans"), lit(0L)) === 0 ||
            coalesce(col("n_dup"), lit(0L)) * 2
              < coalesce(col("n_spans"), lit(0L))).as("keep"))
    },

    // ---- Per-source boilerplate pruning: q107's rule applied PER SOURCE
    // (the C4/web-pipeline form — navigation chrome repeats within a
    // domain, not across the corpus): a token in > 50 % of a source's
    // docs is that source's boilerplate and is stripped from its docs
    // only. Scale shape: per-doc token dedup map-side (array_distinct
    // before explode), ONE (source, tok) partial-aggregatable shuffle for
    // the df frame, per-source doc counts ride a broadcast; the stoplist
    // frame is |sources| rows (∝ domains × their chrome vocab, metadata-
    // sized at 100 TB) and broadcasts onto the corpus, so the rewrite
    // itself never shuffles a document.
    QueryDef(
      "q123_boilerplate_prune",
      """WITH w AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |n AS (SELECT source, count(*) AS nd FROM w GROUP BY 1),
        |t AS (SELECT DISTINCT doc_id, source, tok
        |      FROM (SELECT doc_id, source, unnest(ws) AS tok FROM w)),
        |d AS (SELECT source, tok, count(*) AS df FROM t GROUP BY 1, 2),
        |stop AS (SELECT d.source, list(tok ORDER BY tok) AS sl
        |         FROM d JOIN n ON d.source = n.source
        |         WHERE df * 2 > nd GROUP BY 1)
        |SELECT w.doc_id,
        |  COALESCE(array_to_string(
        |      list_filter(ws, x -> NOT list_contains(COALESCE(sl, []), x)),
        |      ' '), '') AS clean_text,
        |  CAST(len(ws)
        |    - len(list_filter(ws, x -> NOT list_contains(COALESCE(sl, []), x)))
        |    AS BIGINT) AS n_removed
        |FROM w LEFT JOIN stop ON w.source = stop.source""".stripMargin) {
      (s, dir) =>
      val w = docs(s, dir).select(col("doc_id"), col("source"),
        Text.tokens(col("text")).as("ws"))
      val df_ = w.select(col("source"),
          explode(array_distinct(col("ws"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("df"))
      val nFrame = w.groupBy(col("source")).agg(count(lit(1)).as("nd"))
      val stop = df_.join(broadcast(nFrame), "source")
        .where(col("df") * 2 > col("nd"))
        .groupBy(col("source"))
        .agg(sort_array(collect_list(col("tok"))).as("sl"))
      val empty = array().cast("array<string>")
      val cleaned = w.join(broadcast(stop), Seq("source"), "left")
        .withColumn("clean",
          filter(col("ws"),
            x => !array_contains(coalesce(col("sl"), empty), x)))
      cleaned.select(col("doc_id"),
        array_join(col("clean"), " ").as("clean_text"),
        (size(col("ws")) - size(col("clean"))).cast("bigint").as("n_removed"))
    },

    // ---- Seeded epoch shards: the deterministic global shuffle every
    // training run needs — docs land in S shards by a seeded hash
    // (md5("42:" || doc_id), re-seed per epoch to re-shuffle), and the
    // output is the shard MANIFEST a dataloader verifies against: per
    // shard, the doc count, total chars, a commutative content
    // fingerprint (sum of the doc keys mod a prime — order-independent,
    // so any engine that writes the same membership reproduces it; the
    // per-doc terms sum in DECIMAL(38,0)/HUGEINT so the running sum is
    // exact to ~1e28 rows and the OUTER mod keeps the artifact a bounded
    // BIGINT — a raw long sum of ~5e8-sized terms would wrap past
    // ~1.9e10 docs/shard, silently in Spark and as an error in DuckDB,
    // exactly at the corpus scale the manifest is for), and
    // the doc-id range. Shard membership is a pure map-side projection;
    // the manifest is one S-group partial aggregation — at 100 TB this
    // is a single corpus scan with map-side combine into 8 cells, and
    // within-shard order (hash asc) is a sortWithinPartitions at write
    // time, never a global sort. Portable via the md5 60-bit trick
    // (q69/q109/q111): both engines derive identical shard and
    // fingerprint integers.
    QueryDef(
      "q130_seeded_shards",
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM documents)
        |SELECT CAST(h % 8 AS INTEGER) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(h % 1000000007) % 1000000007 AS BIGINT) AS fp,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM h GROUP BY 1""".stripMargin) { (s, dir) =>
      val h = docs(s, dir).select(col("doc_id"), col("n_chars"),
        conv(substring(md5(concat(lit("42:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("bigint").as("h"))
      // exact decimal running sum (DuckDB sums BIGINT in HUGEINT), outer
      // mod bounds the published fingerprint
      h.groupBy(pmod(col("h"), lit(8)).cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum((col("h") % lit(1000000007L)).cast("decimal(38,0)"))
            % lit(1000000007L)).cast("bigint").as("fp"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    },

    // ---- Balanced writer packing: assign docs to W=8 output writers so
    // per-writer byte totals come out nearly equal — the shard-sizing
    // step before writing training data, where naive hash sharding
    // leaves the fattest writer dictating the stage tail. Shape: salt
    // docs into G=8 independent groups by a seeded hash, rank each
    // group by (n_chars DESC, doc_id), and deal ranks onto writers in
    // serpentine (boustrophedon) order — block r/W alternates direction,
    // so within every block of W the biggest doc of one pass pairs with
    // the smallest of the next and per-writer totals converge fast.
    // Every window is PARTITIONed by the salt group (q127's contract: no
    // global sort, no single-reducer window); at 100 TB, G grows with
    // the cluster and each group ranks 1/G of the corpus independently —
    // the imbalance of the sum of G serpentine deals stays bounded by
    // G × (largest doc). Balance is asserted in PipelineSpec; membership
    // is hash-exact vs the oracle.
    QueryDef(
      "q131_writer_packing",
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 8 AS g
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars, g,
        |    row_number() OVER (PARTITION BY g ORDER BY n_chars DESC, doc_id)
        |      - 1 AS r0
        |  FROM h)
        |SELECT doc_id, CAST(g AS INTEGER) AS salt_group,
        |  CAST(CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8
        |            ELSE 7 - (r0 % 8) END AS INTEGER) AS writer
        |FROM r""".stripMargin) { (s, dir) =>
      val W = 8
      val h = docs(s, dir).select(col("doc_id"), col("n_chars"),
        pmod(conv(substring(md5(concat(lit("pack:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("bigint"),
          lit(8)).as("g"))
      val gw = Window.partitionBy(col("g"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      h.withColumn("r0", row_number().over(gw) - 1)
        .select(col("doc_id"), col("g").cast("int").as("salt_group"),
          when((expr(s"r0 DIV $W") % 2) === 0,
            col("r0") % W)
            .otherwise(lit(W - 1) - col("r0") % W)
            .cast("int").as("writer"))
    },

    // ---- PII scrubbing: the redaction pass every pre-training corpus
    // runs before release (emails, IPv4s, phone-like numbers → typed
    // placeholders, plus per-class counts for the scrub report). The
    // synthetic corpus carries no real PII, so the gate INJECTS a
    // deterministic payload per doc in-plan (email + IP + 555-prefixed
    // phone derived from doc_id) and both engines replay injection,
    // extraction counts, and the three-stage replacement chain
    // identically — what the gate pins is the cross-engine regex
    // semantics (Java regex vs RE2: the patterns stay in the common
    // subset — POSIX classes, bounded quantifiers, \b, no lookaround)
    // and the replacement ORDER (emails first, so the user@host dots
    // are gone before the IP pass; IPs before phones). 100 TB shape:
    // a pure map-side compiled-regex chain the scan absorbs — zero
    // shuffle, codegen'd string expressions, embarrassingly parallel;
    // per-class counts are plain column functions, no second scan.
    QueryDef(
      "q150_pii_scrub",
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or 10.2.' || CAST(doc_id % 256 AS VARCHAR) ||
        |    '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
        |    ' call 555-01' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(t, '\b555-[0-9]{2,}\b')) AS n_phones,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(t,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '[EMAIL]', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '[IP]', 'g'),
        |    '\b555-[0-9]{2,}\b', '[PHONE]', 'g') AS clean_text
        |FROM d""".stripMargin) { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phoneRe = "\\b555-[0-9]{2,}\\b"
      // docsPar: the regex chain is per-row CPU-heavy — fan the
      // single-split local scan out first (docsPar's documented trap)
      docsPar(s, dir)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or 10.2."),
            (col("doc_id") % 256).cast("string"), lit("."),
            ((col("doc_id") * 7) % 256).cast("string"),
            lit(" call 555-01"), col("doc_id").cast("string")).as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
            .cast("bigint").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(ipRe), lit(0)))
            .cast("bigint").as("n_ips"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
            .cast("bigint").as("n_phones"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("t"), emailRe, "[EMAIL]"),
              ipRe, "[IP]"),
            phoneRe, "[PHONE]").as("clean_text"))
    },
  )
}
