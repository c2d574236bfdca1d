package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All pure `Column` expressions (whole-stage codegen, no UDFs): language-ID
  * heuristic, quality scoring, token counting, document fingerprinting,
  * shingling. Designed to run as a projection over a 100 TB `documents`
  * scan — column-pruned to `text` only, no shuffle.
  */
object Text {

  /** Whitespace word tokens (lowercased, empty tokens dropped). */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), " +"), w => length(w) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alphanumeric runs and single non-alnum,
    * non-space marks each count as one token — a cheap deterministic proxy
    * for a byte-pair-encoded length.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Punctuation marks per character. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Tiny English-ish stopword list used by the quality score. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    val stops = array(Stopwords.map(lit): _*)
    size(filter(ws, w => array_contains(stops, w))).cast("double") /
      greatest(size(ws), lit(1)).cast("double")
  }

  /** Mean word length (chars, whitespace excluded). */
  def avgWordLen(text: Column): Column = avgWordLenFromWords(words(text))

  /** [[avgWordLen]] over a pre-split words array: exact long char-sum over
    * word count, ONE double division — engine-identical (no intermediate
    * float accumulation to diverge).
    */
  def avgWordLenFromWords(ws: Column): Column =
    aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(size(ws), lit(1)).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length documents and
    * normal word shape, penalizes punctuation soup and stopword-free strings
    * (a proxy for the classic C4/CCNet-style heuristics).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val wordScore =
      when(avgWordLen(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    (lenScore * 0.4 + wordScore * 0.2 + punctScore * 0.2 + stopScore * 0.2)
  }

  /** Language-marker word lists for the n-gram/stopword language-ID
    * heuristic. Marker hits are counted per language; argmax wins.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "que", "dans"))

  def langMarkerHits(text: Column, markers: Seq[String]): Column = {
    val ws = words(text)
    val m = array(markers.map(lit): _*)
    size(filter(ws, w => array_contains(m, w)))
  }

  /** Predicted language: argmax of marker hits, 'und' when no marker hits.
    * Ties break in `LangMarkers` declaration order (en > es > de > fr),
    * matching the oracle's CASE evaluation order.
    */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> langMarkerHits(text, ms) }
    val best = greatest(hits.map(_._2): _*)
    hits
      .foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, h)) =>
        acc.when(h === best, lit(lang))
      }
      .otherwise(lit("und"))
  }

  /** Canonical content fingerprint: md5 over the sorted distinct word set.
    * Word-order- and duplication-insensitive, so reordered near-copies
    * collide — the batch analog of a rolling-hash document fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** Shingles from a PRE-MATERIALIZED words array column. Hot paths must
    * project `words(text)` into its own column first and pass that
    * attribute here: the per-gram lambda indexes `ws` n times per gram, and
    * if `ws` is a computed expression (not an attribute) Spark's
    * interpreted higher-order functions re-tokenize the whole document on
    * every access — measured ~10x on the dedup pipeline.
    */
  def shinglesFromWords(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(ws) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    array_distinct(when(size(ws) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Distinct word n-gram shingles (n >= 1). Documents shorter than n words
    * yield an empty set. Convenience form — see [[shinglesFromWords]] for
    * the two-step shape hot paths should use.
    */
  def wordShingles(text: Column, n: Int): Column = shinglesFromWords(words(text), n)

  /** ALL word n-gram windows in order, WITH multiplicity — one element per
    * window position (vs [[shinglesFromWords]]'s distinct SET). The span
    * form: window i duplicates window j iff their strings are equal, and a
    * phrase repeated five times contributes five windows.
    */
  def allShinglesFromWords(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(ws) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    when(size(ws) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** 60-bit token hash derived from the md5 hex prefix — slower than
    * xxhash64 but computable identically in external SQL engines
    * (`('0x' || substr(md5(x),1,15))::BIGINT`), which makes sketches built
    * on it oracle-checkable. Always non-negative (top 4 bits zero).
    */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Raw (non-distinct) word n-grams from a materialized words array —
    * the counting form behind repetition heuristics.
    */
  def ngramsFromWords(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(ws) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    when(size(ws) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Duplicate-n-gram fraction (Gopher-style repetition filter):
    * 1 - distinct grams / total grams. 0 for texts shorter than n words.
    */
  def repetitionRatio(ws: Column, n: Int): Column = {
    val grams = ngramsFromWords(ws, n)
    lit(1.0) - size(array_distinct(grams)).cast("double") /
      greatest(size(grams), lit(1)).cast("double")
  }

  /** Symbol marks per word (another classic junk-text heuristic). */
  def symbolWordRatio(text: Column, ws: Column): Column =
    size(regexp_extract_all(text, lit("[#@%$^*=~|_{}<>]"), lit(0))).cast("double") /
      greatest(size(ws), lit(1)).cast("double")

  /** Set Jaccard similarity of two shingle arrays (assumed distinct). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** PII-redaction patterns, applied in this order (order matters: emails
    * contain URL-ish hosts and digit runs, so they redact first; a pure
    * digit run becomes NUM before the separator-tolerant PHONE pattern can
    * claim it). Kept to RE2-compatible constructs (no lookaround/backrefs)
    * so the identical patterns run in Java's regex (Spark) and RE2-based
    * engines.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^ ]+" -> "<URL>",
    "[0-9]{6,}" -> "<NUM>",
    "\\+?[0-9][0-9 ()+.-]{6,}[0-9]" -> "<PHONE>")

  /** Redact emails / URLs / phone-ish digit runs / long numbers with typed
    * placeholder tokens — the standard pre-training PII scrub, as a chain
    * of codegen'd `regexp_replace`s (one projection, no shuffle).
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, tok)) => regexp_replace(c, pat, tok) }

  /** Canonical whitespace normalization: trim + collapse runs of
    * whitespace to single spaces (pre-tokenization cleanup).
    */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The HTML-stripping regex chain [[extractHtmlText]] folds, in
    * application order — (pattern, replacement) pairs, every pattern
    * RE2-compatible (inline `(?is)` flags, non-greedy `.*?`, NO
    * backreferences — RE2 lacks them, which is why each non-content
    * element gets its own pass instead of one `</\1>` alternation) and
    * every replacement free of `$`/`\` (the replacement-syntax corner
    * that does NOT port between Java regex and RE2 engines), so the
    * identical fold runs as a DuckDB `regexp_replace(..., 'g')` chain.
    *
    * Order matters: (1) script/style/noscript/template BLOCKS go first —
    * their content is code, and the fake tags/comments inside them must
    * never reach later passes; a second pass per tag drops an UNCLOSED
    * block to end-of-document (truncated crawls); (2) the head block
    * (title/meta boilerplate); (3) comments; (4) every remaining tag
    * becomes a space (word boundary, so `a</p><p>b` never fuses);
    * (5) the five standard named entities + `&nbsp;` decode, `&amp;`
    * strictly LAST (decoding it earlier would turn `&amp;lt;` into a
    * second-round `&lt;` — the classic double-decode bug). Numeric
    * character references (`&#x41;`) are left as-is: decoding them needs
    * a codepoint conversion no regex replacement can express, and C4's
    * regex-class extraction accepts the same limitation.
    */
  val HtmlPatterns: Seq[(String, String)] =
    Seq("script", "style", "noscript", "template").flatMap(t => Seq(
      s"(?is)<$t\\b[^>]*>.*?</$t\\s*>" -> " ",
      s"(?is)<$t\\b[^>]*>.*" -> " ")) ++ Seq(
      "(?is)<head\\b[^>]*>.*?</head\\s*>" -> " ",
      "(?s)<!--.*?-->" -> " ",
      "<[^>]*>" -> " ",
      "&nbsp;" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&apos;" -> "'",
      "&amp;" -> "&")

  /** HTML -> text extraction (C4/trafilatura-class boilerplate strip):
    * drop non-content elements, comments and tags, decode the common
    * entities, collapse whitespace — the first stage of ingesting a web
    * crawl, as a chain of codegen'd `regexp_replace`s ([[redactPii]]'s
    * discipline): one projection over the 100 TB scan, no shuffle, no
    * UDF, and the identical chain runs in external SQL engines.
    *
    * NOT idempotent on adversarial input by design: entity decoding can
    * surface literal text that LOOKS like markup (`&lt;b&gt;` correctly
    * becomes the text `<b>`), which a second pass would strip — the same
    * asymmetry every HTML-entity decoder has. Idempotence DOES hold on
    * entity-free input (property-tested), and the chain never throws on
    * arbitrary bytes (fuzz-tested, [[canonicalizeUrl]]'s discipline).
    */
  def extractHtmlText(html: Column): Column =
    normalizeWhitespace(HtmlPatterns.foldLeft(html) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    })

  /** Decode HTML NUMERIC character references (`&#8217;` / `&#x2019;`) —
    * completing [[extractHtmlText]]'s documented limitation (a regex
    * replacement cannot compute digits -> codepoint). Native
    * codegen-fallback expression; invalid references pass through
    * verbatim, reference-free rows return the input buffer untouched.
    * Composition order matters exactly like the named entities: decode
    * numeric refs BEFORE the `&amp;` pass (so `&amp;#65;` correctly
    * surfaces as the literal text `&#65;`, not an `A`) and AFTER the tag
    * strip (so `&#60;b&#62;` surfaces as literal `<b>` text instead of
    * becoming a strippable tag) — [[extractHtmlTextWithRefs]] wires it in
    * at that exact point.
    */
  def decodeNumericRefs(text: Column): Column =
    org.apache.spark.sql.graftnative.NativeColumns.decodeNumericRefs(text)

  /** [[extractHtmlText]] with numeric character references ALSO decoded,
    * spliced into the chain at the only correct point: after every
    * strip/named-entity pass except `&amp;`, which still runs last.
    */
  def extractHtmlTextWithRefs(html: Column): Column = {
    val (pre, amp) = HtmlPatterns.splitAt(HtmlPatterns.length - 1)
    require(amp.head._1 == "&amp;", "the &amp; pass must be last")
    val stripped = pre.foldLeft(html) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    normalizeWhitespace(
      regexp_replace(decodeNumericRefs(stripped), amp.head._1, amp.head._2))
  }

  /** All URL host names in the text (capture group of the same RE2-safe
    * URL pattern [[PiiPatterns]] redacts) — the unit of domain-level
    * corpus statistics (per-domain doc counts feed source weighting and
    * blocklists).
    */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit("https?://([^/ ]+)"), lit(1))

  /** URL canonicalization — the key-normalization step of per-URL corpus
    * dedup and domain statistics (two crawls of one page must collapse to
    * one key): drop the #fragment, drop tracking query params
    * (utm_*, fbclid, gclid, ref) wherever they sit in the query string,
    * clean the dangling ?/& that removal leaves, lowercase the
    * scheme+host ONLY (paths are case-significant), strip a leading
    * `www.`, and strip one trailing slash. A chain of codegen'd
    * `regexp_replace`s over a URL column — one projection, no shuffle.
    *
    * Patterns are RE2-compatible AND avoid group references in
    * replacements (Spark writes `$1`, RE2 engines write `\1` — the one
    * syntax that does NOT port), so the identical chain runs in external
    * SQL engines: host lowering is extract + lower + concat instead of a
    * backreference.
    */
  /** Sentence segmentation: maximal runs of non-terminal characters plus
    * an optional closing [.!?], trimmed, empties dropped — the unit of
    * C4-class sentence rules (Raffel et al. 2020 §2.2 keeps pages with
    * >= 3 sentences and drops lines without terminal punctuation).
    * Extraction-based (`regexp_extract_all`), NOT lookbehind-split, so
    * the identical pattern runs on RE2 engines. A trailing fragment
    * without terminal punctuation is still a sentence (callers test
    * `[.!?]$` for the terminal rule). Pure per-row projection.
    */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]?"), lit(0)), s => trim(s)),
      s => length(s) > 0)

  /** The tracking query params [[canonicalizeUrl]] strips. */
  private val TrackParams = "(utm_[a-z]+|fbclid|gclid|ref)"

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#[^ ]*", "")
    // three anchored passes so `href=x` (no [?&] boundary) is never
    // touched and a removed FIRST param hands its `?` to the next one:
    //  1. &-prefixed tracking params drop with their `&`;
    //  2. a ?-prefixed tracking param followed by another param drops,
    //     the fixed `?` replacement re-anchoring the query string;
    //  3. a ?-prefixed tracking param at the end drops outright.
    val noAmp = regexp_replace(noFrag, s"&$TrackParams=[^&# ]*", "")
    val noFirst = regexp_replace(noAmp, s"\\?$TrackParams=[^&# ]*&", "?")
    val noLone = regexp_replace(noFirst, s"\\?$TrackParams=[^&# ]*$$", "")
    val noDangle = regexp_replace(noLone, "[?&]+$", "")
    val schemeHost = lower(regexp_extract(noDangle, "(?i)^(https?://[^/?#]*)", 1))
    val rest = regexp_replace(noDangle, "(?i)^https?://[^/?#]*", "")
    val lowered = concat(schemeHost, rest)
    // (www\.)+ collapses stacked www prefixes in ONE pass — stripping one
    // layer per call would break idempotence on `www.www.host`
    val noWww = regexp_replace(
      regexp_replace(lowered, "^https://(www\\.)+", "https://"),
      "^http://(www\\.)+", "http://")
    // strip a trailing slash only when a path character precedes it: a
    // bare `scheme://` (empty host) must keep its slashes or a second
    // pass would eat into the scheme — idempotence, property-tested
    when(noWww.rlike("[^/]/$"), noWww.substr(lit(1), length(noWww) - 1))
      .otherwise(noWww)
  }

  /** Sliding-window chunks over a words array: chunk `i` is words
    * `[i*stride, i*stride + size)` joined by single spaces, strides
    * `size - overlap`, and chunks start while any word remains — so the
    * last chunk may be shorter (a trailing chunk of <= `overlap` words is
    * possible; downstream packing handles short tails). The context-length
    * chunking step of a pre-training pipeline, as a pure per-row
    * projection — callers explode the result, so chunking a 100 TB corpus
    * is scan -> generate, no shuffle.
    */
  def chunkWords(ws: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    val nChunks = floor((org.apache.spark.sql.functions.size(ws) + (stride - 1))
      / lit(stride.toDouble)).cast("long")
    when(org.apache.spark.sql.functions.size(ws) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0L), nChunks - 1),
        i => array_join(slice(ws, (i * stride + 1).cast("int"), lit(size)), " ")))
  }
}
