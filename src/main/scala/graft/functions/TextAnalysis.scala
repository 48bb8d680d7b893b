package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, shingling, document
  * fingerprinting. Everything is built-in column expressions (codegen'd,
  * shuffle-free, embarrassingly parallel) — the per-document cost is O(doc
  * length) with no driver involvement, which is exactly what a 100 TB text
  * corpus needs.
  */
object TextAnalysis {

  /** ASCII lowercase via `translate` — a pure char-map expression.
    * NEVER use `lower()`/`upper()`/`initcap()` in engine paths: Spark 4
    * routes them through ICU collation support whose class initializer
    * builds full Unicode case tables and can take MINUTES on first touch
    * (observed >10 min in this container), serializing every executor
    * thread on the class-init monitor.
    */
  def asciiLower(c: Column): Column =
    translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

  /** Whitespace tokens (ASCII-lowercased). */
  def tokens(text: Column): Column =
    filter(split(asciiLower(text), "\\s+"), t => length(t) > 0)

  /** Regex token classes: alphabetic words, numbers, other (BPE-ish
    * pre-tokenization census).
    */
  def alphaTokens(text: Column): Column = regexp_extract_all(asciiLower(text), lit("[a-z]+"), lit(0))
  def numTokens(text: Column): Column = regexp_extract_all(text, lit("[0-9]+"), lit(0))

  /** Small per-language stopword sets for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and hard-coded: the operator contract is
    * "deterministic lexicon hit-rate", not linguistic accuracy.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "im"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"))

  /** Count of tokens that appear in `lexicon`. */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => t.isin(lexicon: _*)))

  /** Language-ID: argmax of per-language stopword hit counts, deterministic
    * lexicographic tiebreak, "und" (undetermined) when no hits at all.
    */
  def langId(toks: Column): Column = {
    val scored = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(lexiconHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    // max over (hits, lang): ties break to the LAST in array order for
    // array_max on structs; invert lang ordering is messier — instead use
    // a fold with strict > so earlier (lexicographically smaller) wins ties
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: mean of four deterministic signals —
    * stopword ratio (any language), alpha-char fraction, mean-token-length
    * window [3,12], and a length factor saturating at 200 tokens. All exact
    * integer counts divided at the end (portable across engines).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val allStop = Stopwords.values.flatten.toSeq.distinct
    val stopRatio = lexiconHits(toks, allStop).cast("double") /
      greatest(nTok.cast("double"), lit(1.0))
    val alphaChars = length(regexp_replace(asciiLower(text), "[^a-z]", ""))
    val alphaFrac = alphaChars.cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val meanTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(nTok.cast("double"), lit(1.0))
    val lenOk = when(meanTokLen >= 3 && meanTokLen <= 12, lit(1.0)).otherwise(lit(0.0))
    val lenFactor = least(nTok.cast("double") / 200.0, lit(1.0))
    (least(stopRatio * 2.0, lit(1.0)) + alphaFrac + lenOk + lenFactor) / 4.0
  }

  /** C4-style text normalization: ASCII-lower, map characters outside the
    * kept set (lowercase ASCII letters, digits, space, basic punctuation)
    * to spaces, collapse space runs, trim. Pure per-row string work —
    * embarrassingly parallel, engine-portable (mirrored 1:1 in oracle SQL
    * via DuckDB `translate` — NOT `lower()`, whose Unicode case mapping
    * diverges from [[asciiLower]] on e.g. U+212A/U+0130 — + regexp_replace
    * 'g').
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(asciiLower(c), "[^a-z0-9 .,!?']", " "), " +", " "))

  /** HTML → text extraction (the web-crawl ingestion step): drop
    * script/style subtrees wholesale, turn block-level closers into
    * newlines so words don't fuse across paragraphs, strip every
    * remaining tag, decode the five XML entities plus nbsp, squash
    * whitespace. Pure per-row regexp/replace work — engine-portable (the
    * patterns use only the Java ∩ RE2 regex subset: `(?is)` flags and
    * lazy `.*?` mean the same in both), no UDF, fully codegen'd.
    */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val blocksToBreaks = regexp_replace(noScript,
      "(?i)</(p|div|h[1-6]|li|tr)>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocksToBreaks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (ent, ch)) => regexp_replace(e, ent, ch) }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** PII-style masking: email-shaped tokens → `<email>`, digit runs of
    * `minDigits`+ → `<num>`. Pure per-row regexp work, engine-portable
    * (the patterns use only the regex subset Java and RE2 agree on).
    */
  def redact(c: Column, minDigits: Int = 4): Column =
    regexp_replace(
      regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<email>"),
      s"[0-9]{$minDigits,}", "<num>")

  /** Count of matches [[redact]] would mask (emails + long digit runs). */
  def redactionCount(c: Column, minDigits: Int = 4): Column =
    size(regexp_extract_all(c,
      lit(s"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{$minDigits,}"), lit(0)))

  /** Word n-gram shingles (distinct), the MinHash input unit.
    * Note: `sequence(0, -1)` in Spark yields a DESCENDING array, not an
    * empty one — short docs must short-circuit to an empty shingle set.
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val idx = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(typedLit(Seq.empty[Int]))
    array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Document fingerprint: min of seeded 60-bit hashes over the k-gram
    * shingle set (winnowing-style representative), plus the shingle count.
    * Stable across engines via the portable md5 hash.
    */
  def docFingerprint(shingles: Column, seed: String): Column =
    array_min(transform(shingles, s => Hashing.hash60(s, seed)))

  /** Adjacent word bigrams in document order (NOT distinct — repetition
    * analysis needs the multiset). Empty for docs under 2 tokens.
    */
  def bigrams(toks: Column): Column = {
    val idx = when(size(toks) >= 2, sequence(lit(0), size(toks) - 2))
      .otherwise(typedLit(Seq.empty[Int]))
    transform(idx, i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
  }

  /** Count of the most frequent element (the mode's multiplicity) — a
    * per-row O(n log n) sort + one linear fold, NO explode/groupBy shuffle.
    * At 100 TB this is the difference between an embarrassingly parallel
    * map stage and a (doc_id, token)-keyed shuffle of the whole corpus.
    * Empty arrays → 0.
    */
  def modeCount(arr: Column): Column = {
    val sorted = array_sort(arr)
    val folded = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      })
    folded.getField("best")
  }
}
