package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: quality scoring, token counting, language ID, fingerprinting.
  * Everything except langid/fingerprint is pure `functions._` Column algebra
  * (whole-stage codegen'd, pushdown-friendly); langid/fingerprint are
  * deterministic per-row Scala driven through typed map.
  */
object TextAnalysis {

  /** Stopword lists per language — tiny, used both for quality scoring and
    * the n-gram/stopword language-ID heuristic.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "un", "una", "por", "para", "con")
  )

  /** Punctuation class shared verbatim with the DuckDB oracle SQL. */
  val PunctClass = "[.,!?;:]"

  private def wordsCol(text: Column): Column = split(trim(text), "\\s+")

  /** Quality metrics: word count, char count, punct ratio, stopword ratio,
    * mean word length. All expressible in ANSI SQL → full DuckDB oracle.
    */
  def quality(documents: DataFrame): DataFrame = {
    val words = wordsCol(col("text"))
    val lowerWords = wordsCol(lower(col("text")))
    val en = Stopwords("en")
    documents.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(words).cast("bigint").as("n_words"),
      round(
        (length(col("text")) - length(regexp_replace(col("text"), PunctClass, ""))).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
      round(
        size(filter(lowerWords, w => w.isin(en: _*))).cast("double") /
          greatest(size(words), lit(1)), 4).as("stopword_ratio"),
      round(
        (length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double")) /
          greatest(size(words), lit(1)), 4).as("mean_word_len")
    )
  }

  /** Token counts: whitespace tokens and a BPE-ish regex token count
    * (letter runs, single digits, single punctuation marks). Regex kept to a
    * dialect-neutral subset so the DuckDB oracle is exactly equivalent.
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(wordsCol(col("text"))).cast("bigint").as("ws_tokens"),
      regexp_count(col("text"), lit(BpeIshPattern)).cast("bigint").as("bpe_ish_tokens")
    )

  /** Language ID: stopword-hit scoring over the per-language lists; ties
    * broken by language order (en, de, fr, es), 'und' (undetermined) when no
    * stopword hits. Deterministic; accuracy asserted against the generated
    * `lang` column in tests. Column-only implementation (no UDF): one
    * aggregate over the words array per language. The words array is
    * hoisted into its own projection so the text is split exactly ONCE per
    * row — round 3 repeated the split expression under each language filter
    * and leaned on whole-stage-codegen subexpression elimination; the
    * single-split shape is now structural (and plan-asserted in tests:
    * CollapseProject keeps a non-cheap multi-referenced alias hoisted).
    */
  def langId(documents: DataFrame): DataFrame = {
    val withWords = documents.select(col("doc_id"), col("lang").as("lang_true"),
      wordsCol(lower(col("text"))).as("_words"))
    val scores = Seq("en", "de", "fr", "es").map { l =>
      size(filter(col("_words"), w => w.isin(Stopwords(l): _*))).as(s"score_$l")
    }
    val withScores = withWords.select(col("doc_id") +: col("lang_true") +: scores: _*)
    val best = Seq("en", "de", "fr", "es").foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestScore), l) =>
        val s = col(s"score_$l")
        (when(s > bestScore, lit(l)).otherwise(bestLang),
         when(s > bestScore, s).otherwise(bestScore))
    }
    withScores.select(col("doc_id"), col("lang_true"), best._1.as("lang_pred"))
  }

  /** Character-level Shannon entropy (nats) per document — a cheap
    * model-free quality signal (gibberish and boilerplate sit at the two
    * extremes). Native unary expression (H = ln(n) − (Σ c·ln c)/n over
    * per-code-point counts): O(len) per row, ZERO shuffles, whole-stage
    * codegen'd. Round 2 computed the identical formula via
    * `explode(split(text,''))` + two aggregations — correct, but its plan
    * shuffled one row per input character (~10¹⁴ exchange rows at 100 TB
    * for a per-row scalar); the expression keeps it a map-only scan.
    * Empty texts produce no row (the explode formulation's and the DuckDB
    * oracle's natural semantics).
    */
  def charEntropy(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        round(graft.functions.functions.char_entropy(col("text")), 4).as("entropy_nats"))
      .filter(col("entropy_nats").isNotNull)

  /** PII-style redaction: emails and URLs replaced with fixed tags, with
    * per-document hit counts — the scrubbing pass every training-data
    * pipeline runs before tokenization. Patterns stay in the regex subset
    * where Java's engine and RE2 (DuckDB) agree, so the oracle replays them
    * exactly. Pure Column algebra (regexp_count/regexp_replace, codegen'd).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n]+"
  def redact(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).cast("bigint").as("n_emails"),
      regexp_count(col("text"), lit(UrlPattern)).cast("bigint").as("n_urls"),
      regexp_replace(regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>").as("clean_text"))

  /** Winnowing-style document fingerprint: minimum rolling hash over k-word
    * windows, as a native expression (no typed-map encoder round trip —
    * round 1 deserialized every row to compute a pure byte function). The
    * polynomial-mod hash is DuckDB-recomputable, so t4 carries a full
    * oracle.
    */
  def fingerprint(documents: DataFrame, window: Int = 4): DataFrame =
    documents.select(col("doc_id"),
      graft.functions.functions.doc_fingerprint(col("text"), window).as("fingerprint"))
}
