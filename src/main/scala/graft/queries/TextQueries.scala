package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 X28 ⊕ — text analysis over the `documents` fixture:
  * the operations a training-data pipeline runs over every document.
  * Everything is built-in string/regex/array expressions (codegen'd, no
  * UDFs), so each query is a single scan + hash aggregate — the shape
  * that holds at 100 TB (per-document work is row-local; only the final
  * roll-up shuffles, on low-cardinality keys).
  */
object TextQueries {

  /** X28 core — char/token statistics per (lang, source) facet, plus a
    * validation that the stored n_chars matches length(text). */
  val stats = Q(
    "x28_text_stats",
    "Facet roll-up: doc counts, char/token count stats, stored-n_chars consistency check. Single scan, one shuffle on (lang, source).",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          count(when(length(col("text")) === col("n_chars"), 1)).as("n_chars_consistent")
        )
    },
    Some("""SELECT lang, source, count(*) AS n_docs,
            round(avg(n_chars), 4) AS avg_chars,
            round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
            max(len(string_split(text, ' '))) AS max_tokens,
            count(CASE WHEN length(text) = n_chars THEN 1 END) AS n_chars_consistent
            FROM documents GROUP BY lang, source""")
  )

  /** X28 quality scoring — length/punctuation/stopword-ratio heuristics
    * composed into a [0,1] score + keep/filter bucket. */
  val quality = Q(
    "x28_quality_score",
    "Per-document quality heuristic: token count, mean token length, stopword ratio, alpha ratio -> weighted score + keep/filter class.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(col("doc_id") < 100)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("mean_tok_len",
          round((length(col("text")) - col("n_tokens") + 1).cast("double") / col("n_tokens"), 6))
        .withColumn("stop_ratio",
          round(size(filter(split(col("text"), " "), tk => tk.isin("the", "a")))
            .cast("double") / col("n_tokens"), 6))
        .withColumn("len_score",
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
        .withColumn("quality",
          round(lit(0.5) * col("len_score") + lit(0.5) * (lit(1.0) - col("stop_ratio")), 6))
        .withColumn("bucket", when(col("quality") >= 0.8, "keep").otherwise("review"))
        .select("doc_id", "n_tokens", "mean_tok_len", "stop_ratio", "quality", "bucket")
    },
    Some("""WITH d AS (
              SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens FROM documents WHERE doc_id < 100
            ), m AS (
              SELECT doc_id, n_tokens,
                round(CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
                round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE) / n_tokens, 6) AS stop_ratio,
                least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS len_score
              FROM d)
            SELECT doc_id, n_tokens, mean_tok_len, stop_ratio,
              round(0.5 * len_score + 0.5 * (1.0 - stop_ratio), 6) AS quality,
              CASE WHEN round(0.5 * len_score + 0.5 * (1.0 - stop_ratio), 6) >= 0.8
                   THEN 'keep' ELSE 'review' END AS bucket
            FROM m""")
  )

  /** X28 language-ID — stopword-hit heuristic: score each candidate
    * language by marker-token ratio, predict the argmax, compare to the
    * labeled lang. (The fixture corpus is English-vocab for every label,
    * so the confusion roll-up itself is the interesting output.) */
  val langId = Q(
    "x28_lang_id",
    "N-gram/stopword language-ID heuristic: per-language marker ratios, argmax prediction, labeled-vs-predicted confusion counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("en_hits", size(filter(col("toks"), tk => tk.isin("the", "a", "and", "of"))))
        .withColumn("es_hits", size(filter(col("toks"), tk => tk.isin("el", "la", "de", "y"))))
        .withColumn("predicted",
          when(col("en_hits") >= col("es_hits") && col("en_hits") > 0, "en")
            .when(col("es_hits") > col("en_hits"), "es")
            .otherwise("unknown"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("en_hits").cast("double") / col("n_tokens")), 6).as("avg_en_ratio"))
    },
    Some("""WITH d AS (
              SELECT lang, string_split(text, ' ') AS toks FROM documents
            ), h AS (
              SELECT lang, len(toks) AS n_tokens,
                len(list_filter(toks, t -> t IN ('the', 'a', 'and', 'of'))) AS en_hits,
                len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y'))) AS es_hits
              FROM d)
            SELECT lang,
              CASE WHEN en_hits >= es_hits AND en_hits > 0 THEN 'en'
                   WHEN es_hits > en_hits THEN 'es' ELSE 'unknown' END AS predicted,
              count(*) AS n,
              round(avg(CAST(en_hits AS DOUBLE) / n_tokens), 6) AS avg_en_ratio
            FROM h GROUP BY 1, 2""")
  )

  /** X28 fingerprinting + BPE-ish tokenization — md5 of the
    * whitespace-normalized text as the doc fingerprint; regex token count
    * (letter runs / digits / punctuation as separate tokens). */
  val fingerprint = Q(
    "x28_fingerprint",
    "Document fingerprint (md5 of normalized text) + BPE-ish regex token census; per-lang distinct-fingerprint counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
        .withColumn("n_bpe_tokens",
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\\\s]', 0)")))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          count_distinct(col("fp")).as("n_distinct_fp"),
          round(avg(col("n_bpe_tokens")), 4).as("avg_bpe_tokens")
        )
    },
    Some("""SELECT lang, count(*) AS n_docs,
            count(DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_distinct_fp,
            round(avg(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]'))), 4) AS avg_bpe_tokens
            FROM documents GROUP BY lang""")
  )

  /** X28 token counting — whitespace tokens vs BPE-granularity subword
    * pieces (greedy ≤4-char letter chunks, digit runs, punctuation — the
    * piece-length profile a BPE vocabulary produces). The subword/word
    * ratio is the "fertility" statistic used to budget LLM token costs
    * per corpus slice. Row-local regex work, one low-cardinality shuffle. */
  val tokenCount = Q(
    "x28_token_count",
    "Token budget census: whitespace tokens vs subword pieces (greedy 4-char chunks) per source; fertility = pieces per word.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("ws_tokens", size(expr("regexp_extract_all(text, '\\\\S+', 0)")))
        .withColumn("subword_tokens",
          size(expr("regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\\\s]', 0)")))
        .groupBy(col("source"))
        .agg(
          sum(col("ws_tokens")).as("ws_tokens"),
          sum(col("subword_tokens")).as("subword_tokens"),
          round(sum(col("subword_tokens")).cast("double") / sum(col("ws_tokens")), 6)
            .as("fertility"))
    },
    Some("""SELECT source,
            CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
            CAST(sum(len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\s]'))) AS BIGINT) AS subword_tokens,
            round(CAST(sum(len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\s]'))) AS DOUBLE)
                  / sum(len(regexp_extract_all(text, '\S+'))), 6) AS fertility
            FROM documents GROUP BY source""")
  )

  /** X28 filter chain — the C4-style document quality gate: an ORDERED
    * rule cascade (length bounds → mean word length → symbol ratio →
    * stopword presence → exact-dup) where each document gets keep or its
    * FIRST failing rule as the drop reason. One scan + a window for the
    * dup rule + one low-cardinality roll-up; the per-reason counts are
    * the corpus-curation dashboard every training-data pipeline keeps. */
  val filterChain = Q(
    "x28_filter_chain",
    "C4-style quality cascade: length/word-length/symbol/stopword/dup rules in order, first failure wins; per-source drop-reason census.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
      t.documents
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("mean_word_len",
          (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
        .withColumn("symbol_ratio",
          size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast("double") / col("n_chars"))
        .withColumn("has_stopword",
          arrays_overlap(split(col("text"), " "),
            array(lit("the"), lit("a"), lit("and"), lit("of"))))
        .withColumn("fp", md5(col("text")))
        .withColumn("dup_rank", row_number().over(w))
        .withColumn("drop_reason",
          when(col("n_chars") < 100, "too_short")
            .when(col("n_chars") > 20000, "too_long")
            .when(col("mean_word_len") < 3 || col("mean_word_len") > 10, "word_length")
            .when(col("symbol_ratio") >= 0.1, "symbol_ratio")
            .when(!col("has_stopword"), "no_stopwords")
            .when(col("dup_rank") > 1, "duplicate")
            .otherwise("kept"))
        .groupBy(col("source"), col("drop_reason"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""WITH d AS (
              SELECT source, doc_id, n_chars,
                len(string_split(text, ' ')) AS n_tokens,
                CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
                  / len(string_split(text, ' ')) AS mean_word_len,
                CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / n_chars AS symbol_ratio,
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'and', 'of'))) > 0 AS has_stopword,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS dup_rank
              FROM documents)
            SELECT source,
              CASE WHEN n_chars < 100 THEN 'too_short'
                   WHEN n_chars > 20000 THEN 'too_long'
                   WHEN mean_word_len < 3 OR mean_word_len > 10 THEN 'word_length'
                   WHEN symbol_ratio >= 0.1 THEN 'symbol_ratio'
                   WHEN NOT has_stopword THEN 'no_stopwords'
                   WHEN dup_rank > 1 THEN 'duplicate'
                   ELSE 'kept' END AS drop_reason,
              count(*) AS n
            FROM d GROUP BY 1, 2""")
  )

  def all: Seq[Q] = Seq(stats, quality, langId, fingerprint, tokenCount, filterChain)
}
