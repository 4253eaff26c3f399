package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.{functions => F}

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, quality metrics, language-ID heuristics, and document
  * fingerprinting. All are composed from codegen'd builtins so they run
  * inside whole-stage codegen — no Scala UDFs in the hot path, which is
  * what keeps a 100 TB corpus scan CPU-bound instead of
  * serialization-bound.
  *
  * The reference pipeline has no text operators (SURVEY.md §2.9); these are
  * the training-data extensions mandated by the build plan (§7.2 step 7).
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe: trim first so leading/trailing blanks
    * don't produce empty tokens, and return 0 for blank/empty strings
    * (Spark's split("") yields [""], size 1 — guarded here).
    *
    * This is the WORD rule — marker voting, stopwords, and word-shingle
    * dedup all want whitespace words. For token BUDGETS (chunk windows,
    * pack bins, length floors) use [[scriptTokens]]/[[tokenCountScript]],
    * which count unspaced CJK scripts correctly.
    */
  def tokens(text: Column): Column =
    F.when(F.trim(text) === F.lit(""), F.array().cast("array<string>"))
      .otherwise(F.split(F.trim(text), "\\s+"))

  def tokenCount(text: Column): Column =
    F.size(tokens(text)).cast(LongType)

  /** Character class of the scripts that tokenize one-codepoint-per-token:
    * Han, Hiragana, Katakana, Hangul — [[ScriptUtil]]'s primary-block
    * ranges verbatim, so script counting and tokenization agree. Public
    * because the DuckDB oracles restate the identical intervals.
    */
  val cjkClass: String =
    "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{AC00}-\\x{D7A3}]"

  /** Script-aware tokens: each CJK codepoint is its own token (the
    * standard fallback for scripts written without word spaces — a
    * whitespace split counts a whole Chinese document as ~1 token);
    * everything else whitespace-splits as [[tokens]]. Implemented by
    * space-padding each CJK codepoint and reusing the whitespace rule,
    * so one `regexp_replace` makes the oracle replay exact. Map-only,
    * codegen'd.
    */
  def scriptTokens(text: Column): Column =
    F.call_function("script_tokens", text)

  /** The declarative (regex) statement of [[scriptTokens]]' semantics —
    * what the DuckDB oracles replay. The compiled kernel
    * ([[ScriptUtil.scriptTokens]]) is the production path (two plain char
    * passes vs two regex-engine runs per document); a differential spec
    * pins kernel == regex on the edge cases (CJK at string edges,
    * untrimmable \t/\n whitespace, all-space/empty input).
    */
  private[graft] def scriptTokensRegex(text: Column): Column =
    tokens(F.regexp_replace(text, s"($cjkClass)", " $1 "))

  /** Token count for budget-style uses (chunk windows, pack bins, length
    * floors, corpus token totals): whitespace words plus one per CJK
    * codepoint.
    */
  def tokenCountScript(text: Column): Column =
    F.size(scriptTokens(text)).cast(LongType)

  /** A crude BPE-ish subword count: word characters grouped in runs of at
    * most 4 plus isolated non-space symbols — a deterministic, dependency-
    * free stand-in for a real tokenizer's token count, useful for
    * budget-style filtering at corpus scale.
    */
  def subwordCount(text: Column): Column =
    F.regexp_count(text, F.lit("\\w{1,4}|[^\\w\\s]")).cast(LongType)

  /** Number of punctuation characters. */
  def punctCount(text: Column): Column =
    F.length(text) - F.length(F.regexp_replace(text, "[\\p{Punct}]", ""))

  /** Number of alphabetic characters. */
  def alphaCount(text: Column): Column =
    F.length(F.regexp_replace(text, "[^\\p{L}]", ""))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Count of stopword tokens (lowercased exact match). */
  def stopwordCount(text: Column): Column = {
    val sw = F.array(stopwords.map(F.lit): _*)
    F.size(F.filter(tokens(F.lower(text)), t => F.array_contains(sw, t)))
      .cast(LongType)
  }

  /** Composite quality score in [0,1]: blend of length saturation,
    * stopword presence, and non-punctuation ratio — the standard cheap
    * heuristics used to pre-filter web corpora before expensive model
    * scoring. Deterministic fixed-point arithmetic (see oracle note in
    * SparkEntry): each component is a ratio of integer counts.
    */
  def qualityScore(text: Column): Column = {
    val n = F.length(text).cast(DoubleType)
    val lenSat = F.least(n / F.lit(500.0), F.lit(1.0))
    // denominator is the script-aware budget count: an unspaced CJK doc
    // is thousands of tokens with zero latin stopwords, not one token
    // with an inflated stop ratio
    val stopRatio = F.least(
      stopwordCount(text).cast(DoubleType) * F.lit(10.0) /
        F.greatest(tokenCountScript(text).cast(DoubleType), F.lit(1.0)),
      F.lit(1.0))
    val punctOk = F.lit(1.0) - F.least(
      punctCount(text).cast(DoubleType) * F.lit(4.0) / F.greatest(n, F.lit(1.0)),
      F.lit(1.0))
    (lenSat * F.lit(0.4) + stopRatio * F.lit(0.3) + punctOk * F.lit(0.3))
  }

  /** Language-ID: marker-word voting over a small per-language lexicon.
    * Returns the language with the most marker hits; ties and zero-hit
    * documents fall back in a fixed priority order (en > de > es > fr),
    * making the classifier fully deterministic. An n-gram model would be
    * strictly better but needs training data; marker voting is the
    * standard cheap heuristic and is expressible in pure SQL for the
    * oracle.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "es", "que"),
    "fr" -> Seq("le", "les", "est", "dans", "une"))

  def langHits(text: Column, lang: String): Column = {
    val markers = F.array(langMarkers(lang).map(F.lit): _*)
    F.size(F.filter(tokens(F.lower(text)), t => F.array_contains(markers, t)))
  }

  def langId(text: Column): Column = {
    val en = langHits(text, "en"); val de = langHits(text, "de")
    val es = langHits(text, "es"); val fr = langHits(text, "fr")
    // Fixed priority on ties: en, then de, then es, then fr.
    F.when(en >= de && en >= es && en >= fr, F.lit("en"))
      .when(de >= es && de >= fr, F.lit("de"))
      .when(es >= fr, F.lit("es"))
      .otherwise(F.lit("fr"))
  }

  /** Script-aware language ID — the coverage [[langId]]'s latin marker
    * voting lacks: non-latin scripts identify by their dominant block
    * (in a fixed priority: Japanese kana before Han so ja beats zh on
    * mixed kanji+kana text, then Hangul, Cyrillic, Arabic, Greek,
    * Hebrew, Devanagari), and only script-ambiguous (latin) text falls
    * through to marker voting. Every branch is a count comparison over
    * [[ScriptStatsF.scriptCounts]] fields, so a SQL oracle replays the
    * whole decision chain. Input should be NFC-normalized
    * ([[ScriptStatsF.nfc]]) so decomposed accents count as their
    * precomposed latin forms.
    */
  def langIdScript(text: Column): Column = {
    val sc = ScriptStatsF.scriptCounts(ScriptStatsF.nfc(text))
    def c(b: String) = sc.getField(b)
    F.when(c("hiragana") + c("katakana") > 0, F.lit("ja"))
      .when(c("hangul") > 0, F.lit("ko"))
      .when(c("han") > 0, F.lit("zh"))
      .when(c("cyrillic") > 0, F.lit("ru"))
      .when(c("arabic") > 0, F.lit("ar"))
      .when(c("greek") > 0, F.lit("el"))
      .when(c("hebrew") > 0, F.lit("he"))
      .when(c("devanagari") > 0, F.lit("hi"))
      .otherwise(langId(text))
  }

  /** URL pattern — RE2-portable (no lookarounds, no \b) so the SQL
    * oracle's regex engine matches Java byte-for-byte.
    */
  val UrlRe = "https?://[^\\s]+"

  /** Markup tag pattern: one angle-bracketed run with no nested
    * brackets — the boilerplate-stripping heuristic, not an HTML parser.
    */
  val TagRe = "<[^<>]+>"

  def urlCount(text: Column): Column =
    F.regexp_count(text, F.lit(UrlRe)).cast(LongType)

  def tagCount(text: Column): Column =
    F.regexp_count(text, F.lit(TagRe)).cast(LongType)

  /** Strip markup tags and collapse whitespace — the standard first
    * cleaning pass over scraped web text. Map-only, codegen'd regexes;
    * deterministic, so cleaned output grades as an md5 digest.
    */
  def stripMarkup(text: Column): Column =
    F.trim(F.regexp_replace(
      F.regexp_replace(text, TagRe, " "), "\\s+", " "))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Stable across engines (md5 is standard), cheap (single pass),
    * and the first stage of exact dedup at corpus scale — group by a
    * 16-byte digest instead of shuffling full document bodies.
    */
  def fingerprint(text: Column): Column =
    F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))

  /** Character n-gram shingles via sequence+transform HOFs — the
    * DECLARATIVE REFERENCE formulation that the differential specs pin
    * the compiled [[graft.functions.CharShingles]] kernel against. NOT a
    * production path: the lambda references `chars`/`norm` (a full-text
    * regex + split), which interpreted HOFs re-evaluate once per window
    * — O(n^2) in document length. Hot paths use the kernel.
    */
  def charShingles(text: Column, n: Int = 5): Column = {
    val norm = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    val chars = F.split(norm, "")
    F.when(F.length(norm) < n, F.array(norm))
      .otherwise(
        F.transform(
          F.sequence(F.lit(1), F.length(norm) - F.lit(n - 1)),
          i => F.concat_ws("", F.slice(chars, i, F.lit(n)))))
  }

  /** Word n-gram shingles — like [[charShingles]], the declarative
    * reference twin of the compiled [[graft.functions.WordShingles]]
    * kernel (the lambda's `toks` re-tokenizes per window when
    * interpreted); differential-spec use only.
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(F.lower(text))
    F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks)))
      .otherwise(
        F.transform(
          F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
          i => F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(n)))))
  }
}
