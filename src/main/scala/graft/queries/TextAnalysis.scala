package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — language ID, quality
  * scoring, token counting, fingerprinting (beyond-parity LLM-pipeline
  * surface; the reference has no text operators).
  *
  * Every metric is a deterministic integer-or-single-division expression
  * so the DuckDB oracles reproduce results bit-for-bit. All expression
  * trees are UDF-free (whole-stage codegen; per-row cost is linear in
  * document length, embarrassingly parallel — no shuffle at all, these
  * are pure map-side projections that scale to 100 TB by partition count
  * alone).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Tiny embedded stopword lists for the language-ID heuristic. */
  private val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val StopFn: Map[String, Seq[String]] = Map(
    "en" -> StopEn,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "est", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation. */
  private val BpeRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  val entries: Seq[QueryDef] = Seq(

    // ---- Quality scoring: length/diversity/stopword-density signals. ----
    QueryDef(
      "q36_text_quality",
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars_m,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM documents)
         |SELECT doc_id, n_chars_m,
         |  len(ws) AS n_tokens,
         |  len(list_distinct(ws)) AS n_types,
         |  round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS ttr,
         |  round(CAST(n_chars_m - len(ws) + 1 AS DOUBLE) / len(ws), 6) AS avg_token_len,
         |  round(CAST(len(list_filter(ws, w -> list_contains(${sqlList(StopEn)}, w))) AS DOUBLE)
         |    / len(ws), 6) AS stopword_ratio
         |FROM t WHERE len(ws) > 0""".stripMargin) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      docs(s, dir)
        .select(col("doc_id"), length(col("text")).as("n_chars_m"), ws.as("ws"))
        .where(size(col("ws")) > 0)
        .select(
          col("doc_id"), col("n_chars_m"),
          size(col("ws")).as("n_tokens"),
          size(array_distinct(col("ws"))).as("n_types"),
          round(size(array_distinct(col("ws"))).cast("double")
            / size(col("ws")), 6).as("ttr"),
          // single-space-separated text: chars = sum(len)+n-1
          round((col("n_chars_m") - size(col("ws")) + 1).cast("double")
            / size(col("ws")), 6).as("avg_token_len"),
          round(size(filter(col("ws"),
            w => array_contains(typedLit(StopEn), w))).cast("double")
            / size(col("ws")), 6).as("stopword_ratio"))
    },

    // ---- Language ID: argmax stopword-hit-rate over per-lang lists. ----
    QueryDef(
      "q37_lang_id",
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |${StopFn.toSeq.sortBy(_._1).map { case (l, sw) =>
           s"    round(CAST(len(list_filter(ws, w -> list_contains(${sqlList(sw)}, w))) AS DOUBLE) / len(ws), 6) AS score_$l"
         }.mkString(",\n")}
         |  FROM t WHERE len(ws) > 0)
         |SELECT doc_id, lang,
         |  CASE ${StopFn.toSeq.sortBy(_._1).map { case (l, _) =>
           s"WHEN score_$l >= greatest(${StopFn.keys.toSeq.sorted.map("score_" + _).mkString(", ")}) AND score_$l > 0 THEN '$l'"
         }.mkString(" ")}
         |  ELSE 'und' END AS predicted
         |FROM scored""".stripMargin) { (s, dir) =>
      val ws = Text.tokens(col("text"))
      val base = docs(s, dir)
        .select(col("doc_id"), col("lang"), ws.as("ws"))
        .where(size(col("ws")) > 0)
      val scored = StopFn.toSeq.sortBy(_._1).foldLeft(base) { case (df, (l, sw)) =>
        df.withColumn(s"score_$l",
          round(size(filter(col("ws"),
            w => array_contains(typedLit(sw), w))).cast("double")
            / size(col("ws")), 6))
      }
      val langs = StopFn.keys.toSeq.sorted
      val best = greatest(langs.map(l => col(s"score_$l")): _*)
      // first lang (alphabetical) reaching the max wins — same CASE order
      // as the oracle, so ties resolve identically
      val predicted = langs.foldRight(lit("und")) { (l, acc) =>
        when(col(s"score_$l") >= best && col(s"score_$l") > 0, lit(l))
          .otherwise(acc)
      }
      scored.select(col("doc_id"), col("lang"), predicted.as("predicted"))
    },

    // ---- Token counting: whitespace + BPE-ish regex pre-tokenizer. ----
    QueryDef(
      "q38_token_count",
      s"""SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
         |  len(regexp_extract_all(text, '$BpeRegex', 0)) AS bpe_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_estimate
         |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(Text.tokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeRegex), lit(0)))
          .as("bpe_tokens"),
        ceil(length(col("text")) / 4.0).cast("bigint").as("byte_estimate"))
    },

    // ---- Document fingerprinting: min polynomial rolling hash over
    // 3-gram shingles (winnowing-style content signature). ----
    QueryDef(
      "q39_fingerprint",
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS shs
        |  FROM w WHERE len(ws) >= 3),
        |h AS (
        |  SELECT doc_id, list_transform(shs, sh ->
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, len(sh) + 1),
        |                       j -> CAST(ascii(sh[j]) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        |  FROM s)
        |SELECT doc_id, list_min(hs) AS fingerprint, len(hs) AS n_shingles
        |FROM h""".stripMargin) { (s, dir) =>
      // repartition: the per-shingle polynomial hash is the heaviest
      // per-row projection in this family; one local parquet file = one
      // task would serialize it (real corpora parallelize via scan splits).
      // The filter rides the cheap token count (see Text.shinglesFromTokens).
      docs(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("doc_id"), Text.shinglesFromTokens(col("ws")).as("shs"))
        .select(col("doc_id"),
          array_min(transform(col("shs"), sh => Text.polyHash(sh)))
            .as("fingerprint"),
          size(col("shs")).as("n_shingles"))
    },

    // ---- Unicode normalization + casefold: NFC-compose then lowercase,
    // so composed/decomposed variants of the same logical text hash
    // identically before shingling/MinHash. Native codegen expression
    // (graft.functions.NormalizeExpression) with an isNormalized fast
    // path; pure map-side. DuckDB's nfc_normalize oracles it; the
    // non-ASCII composed/decomposed equivalence is pinned in
    // ExtensionsSpec.
    QueryDef(
      "q65_unicode_normalize",
      """SELECT doc_id, lower(nfc_normalize(text)) AS norm_text
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.GraftExtensions.register(s)
      docs(s, dir).selectExpr("doc_id", "text_normalize(text) AS norm_text")
    },
  )
}
