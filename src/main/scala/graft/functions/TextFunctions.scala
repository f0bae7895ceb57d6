package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for large-scale training-data
  * pipelines (token counting, language ID, quality scoring, shingling,
  * fingerprinting). Everything here is composed from codegen'd built-ins —
  * no UDFs — so the whole pipeline stays inside whole-stage codegen and
  * scales embarrassingly parallel (per-row, no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenizer (the corpus is space-delimited; swap the pattern
    * for `\\s+` on noisier text). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token estimate: words plus intra-word punctuation splits —
    * `\\w+|[^\\w\\s]` occurrences, counted without materializing the array. */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))).cast("long")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Per-language stopword hit count (tiny built-in lists; heuristic
    * n-gram-free language ID per SURVEY scale-extension plan). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  def stopwordHits(text: Column, lang: String): Column = {
    val set = stopwords(lang)
    size(filter(split(lower(text), " "), t => t.isInCollection(set)))
      .cast("long")
  }

  /** Argmax language from the four stopword scores; deterministic
    * tie-break by the fixed en > es > de > fr preference order so the
    * DuckDB oracle can reproduce it with the same CASE chain. */
  def predictedLang(en: Column, es: Column, de: Column, fr: Column): Column =
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")

  /** Distinct word-level k-shingles (n-grams) of a token array column.
    * 1-based `element_at` for DuckDB slicing parity. */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))

  /** Winnowing-style document fingerprint: the minimum md5 over all
    * 8-token shingles. Stable across engines (md5 is standard), robust to
    * local edits, and computable per-row with no shuffle — the 100-TB
    * dedup prefilter. Caller must ensure size(toks) >= 8. */
  def minShingleFingerprint(toks: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => md5(concat_ws(" ", slice(toks, i, lit(k))))))

  /** PII patterns + redaction (q47's corpus-hygiene pass). ONE
    * definition shared by the operator, its spec, and callers — pattern
    * drift between operator and test is exactly what a private copy
    * would invite. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiUrl = "https?://[^\\s]+"
  val PiiDigits = "[0-9]{6,}"

  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiUrl, "<URL>"),
      PiiDigits, "<NUM>")

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** First 15 hex chars of md5 as a positive long (fits in 60 bits) —
    * portable numeric hash for bucketing/banding that DuckDB can
    * reproduce with CAST('0x'||substr(md5(x),1,15) AS BIGINT). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Crawl-URL canonicalization (q71) — the cheapest first dedup pass a
    * production crawl runs, BEFORE any content hashing: two fetches of
    * the same resource usually differ only in URL cosmetics. Rules (all
    * pure per-row string ops, zero shuffle, whole-stage codegen'd):
    *   - drop the `#fragment` (never sent to the server);
    *   - lowercase scheme and host; strip one leading `www.`;
    *   - strip the scheme's DEFAULT port only (`:80` for http, `:443`
    *     for https — `:8080`, or `:80` under https, is a real
    *     distinction and survives);
    *   - strip trailing slashes from the path (empty path → `/`);
    *   - split the query on `&`, drop empty and `utm_*` tracking
    *     params, SORT the rest (param order never changes the
    *     resource), re-join.
    * Path case, param case and values are preserved — they ARE
    * significant. Every step is mirrored expression-for-expression in
    * the q71 DuckDB oracle. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authPath = substring_index(rest, "?", 1)
    val rawQuery = when(instr(rest, "?") > 0,
      rest.substr(instr(rest, "?") + 1, length(rest))).otherwise(lit(""))
    val authority = substring_index(authPath, "/", 1)
    val path0 = authPath.substr(length(authority) + 1, length(authPath))
    val authLower = lower(authority)
    val hostRaw = substring_index(authLower, ":", 1)
    val port = when(instr(authLower, ":") > 0,
      authLower.substr(instr(authLower, ":") + 1, length(authLower)))
      .otherwise(lit(""))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val pathStripped = regexp_replace(path0, "/+$", "")
    val path = when(pathStripped === "", "/").otherwise(pathStripped)
    // substring(p,1,4): exact-prefix test DuckDB mirrors verbatim (LIKE
    // 'utm_%' would wildcard the underscore)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => length(p) > 0 && substring(p, 1, 4) =!= "utm_"))
    val queryNorm = array_join(params, "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(queryNorm =!= "", concat(lit("?"), queryNorm)).otherwise(lit("")))
  }
}
