package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, token counting, document
  * fingerprinting. Everything is built from codegen'd Catalyst expressions
  * (`split`/`filter`/`transform`/`md5` …) — no Scala UDFs — so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with input
  * splits (pure map-side work, zero shuffles).
  */
object TextAnalysis {

  /** Word tokens: lowercase, split on non-word runs, drop empties.
    * Mirrors the reference's only tokenizer
    * (`WordCount.java:54`: `toLowerCase().split("\\W+")`).
    *
    * Implemented by the codegen'd single-pass
    * [[graft.expressions.AsciiWordTokens]] — the tokenizer is the hot
    * loop of every text query; the regex form ([[tokensHof]]) is kept as
    * the cross-check reference. */
  def tokens(text: Column): Column =
    graft.expressions.AsciiWordTokens.tokens(text)

  /** Reference implementation of [[tokens]] via built-in regex split —
    * equivalence is spec-asserted; kept for cross-checking only. */
  def tokensHof(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  /** Tiny multilingual stopword list used by the heuristics below. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Count of stopword occurrences (duplicates counted). */
  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords: _*)))

  /** N-gram-heuristic language ID: presence of high-frequency English
    * function words ⇒ "en"; all-ASCII but no stopword hits ⇒ "und";
    * any non-ASCII character ⇒ "other". Deterministic, shuffle-free. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    when(text.rlike("[^\\x00-\\x7F]"), lit("other"))
      .when(stopwordHits(toks) > 0, lit("en"))
      .otherwise(lit("und"))
  }

  /** Whitespace token count (cheap) — `split` on space runs. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** Regex token count — BPE-ish word/number/punct-run tokens. */
  def reTokenCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => t =!= ""))

  /** Mean token length (rounded to 4 places for cross-engine stability). */
  def avgTokenLen(toks: Column): Column =
    round(
      aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double")) /
        greatest(size(toks).cast("double"), lit(1.0)),
      4)

  /** Ratio of stopword tokens (quality signal). */
  def stopwordRatio(toks: Column): Column =
    round(stopwordHits(toks).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0)), 4)

  /** Punctuation-character ratio over the raw text. */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0)), 4)

  // --- Gopher rule-filter signals (Rae et al. 2021, §A.1.1) --------------
  // The rule-based pre-filter stage of an LLM curation pipeline; each
  // signal is a pure map-side column expression (zero shuffles).

  /** Hash-symbol-to-word ratio ('#' occurrences per token). Gopher
    * (Rae et al. 2021 §A.1.1) thresholds each symbol's ratio SEPARATELY,
    * so '#' and ellipsis get their own columns rather than one sum. */
  def hashRatio(text: Column, toks: Column): Column =
    round((length(text) - length(translate(text, "#", "")))
      .cast("double") / greatest(size(toks).cast("double"), lit(1.0)), 4)

  /** Ellipsis-to-word ratio: three-dot '...' occurrences (left-to-right
    * non-overlapping length-difference, exactly divisible by 3 so the
    * double division is exact cross-engine) plus the single-char Unicode
    * ellipsis '…' (U+2026), which §A.1.1 also counts, per token. */
  def ellipsisRatio(text: Column, toks: Column): Column =
    round(((length(text) - length(regexp_replace(text, "\\Q...\\E", ""))) / lit(3) +
        (length(text) - length(translate(text, "…", ""))))
      .cast("double") / greatest(size(toks).cast("double"), lit(1.0)), 4)

  /** Fraction of tokens containing at least one letter (non-word tokens
    * are bare numbers under this tokenizer). */
  def alphaWordFrac(toks: Column): Column =
    round(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0)), 4)

  /** Number of DISTINCT stopwords present (Gopher's "contains at least
    * two of a small stop set" rule wants kinds, not occurrences). */
  def stopwordKinds(toks: Column): Column =
    size(array_distinct(filter(toks, t => t.isin(Stopwords: _*)))).cast("long")

  /** Composite document-quality score in [0,1]: favors mid-length docs with
    * some (but not all) stopwords and little punctuation. Weights are
    * arbitrary but fixed; the point is a deterministic, columnar scoring
    * pipeline. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore  = least(size(toks).cast("double") / lit(20.0), lit(1.0))
    val stopScore = least(stopwordRatio(toks) * 4, lit(1.0))
    val punctPen  = punctRatio(text)
    round(greatest(least(lenScore * 0.5 + stopScore * 0.5 - punctPen, lit(1.0)), lit(0.0)), 4)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * (The rolling-hash shape of the prompt realized as a single pass —
    * normalization + hash are both codegen'd, and md5 keys are uniform for
    * downstream hash-partitioned dedup at any scale.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  // --- repetition signals (Gopher-style quality filters) -----------------
  // "Scaling Language Models: Methods, Analysis & Insights from Training
  // Gopher" (Rae et al. 2021, §A.1.1) filters documents by the fraction of
  // duplicate n-grams — highly repetitive text is boilerplate or spam.
  // All three signals below are pure map-side array arithmetic
  // (array_distinct over a materialized token column): zero shuffles, so
  // the filter costs one scan at any corpus size.

  /** Consecutive word n-grams of a token array as an array column
    * (empty for docs shorter than n tokens — a doc with no n-grams has no
    * repetition evidence, unlike [[DedupOps.shingles]] where the
    * whole-document fallback keeps short docs joinable). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fraction of array elements that are repeats of an earlier element:
    * (|all| − |distinct|) / |all| (0 for empty arrays — the subtraction
    * form gets that for free where 1 − d/n would not). Rounded to 4
    * places for cross-engine stability. */
  def dupFrac(arr: Column): Column =
    round((size(arr) - size(array_distinct(arr))).cast("double") /
      greatest(size(arr).cast("double"), lit(1.0)), 4)

  /** Duplicate-token fraction: how much of the doc is repeated words. */
  def dupTokenFrac(toks: Column): Column = dupFrac(toks)

  /** Duplicate word-n-gram fraction (Gopher's dup_ngram_frac signal). */
  def dupNgramFrac(toks: Column, n: Int): Column = dupFrac(ngrams(toks, n))

  /** Whitespace normalization: lowercase, collapse runs to single
    * spaces, trim. Regex classes kept to ASCII ground shared by Java
    * and RE2 regex engines (the DuckDB oracle). Pure map-side. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** ASCII cleanup on a [[normalizeWs]]-normalized string: drop every
    * char outside [a-z0-9 ]. The canonical form exact-dedup fingerprints
    * should hash — punctuation/casing variants collapse to one digest. */
  def asciiClean(norm: Column): Column =
    regexp_replace(norm, "[^a-z0-9 ]", "")

  /** Default redaction rules for [[scrubPii]], applied in order: email-
    * shaped tokens first (so their digit parts aren't half-eaten by the
    * id rule), then digit runs of ≥5 (account/phone-like identifiers;
    * 4-digit years survive). Patterns stay on the Java∩RE2 regex common
    * ground so the DuckDB oracle replays them identically. */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{5,}" -> "<ID>")

  /** PII / identifier scrub — the redaction pass a corpus takes before
    * text ships to training. Each (pattern → replacement) rule rewrites
    * every match (global), rules compose left to right. A chain of
    * codegen'd `regexp_replace`s: pure map-side, zero shuffles, and at
    * 100 TB the cost is one streaming pass over the text column. */
  def scrubPii(text: Column, rules: Seq[(String, String)] = piiRules): Column =
    rules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Count of matches a single [[scrubPii]] rule would redact — the
    * audit signal (how much PII per source/segment) next to the rewrite. */
  def piiHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
