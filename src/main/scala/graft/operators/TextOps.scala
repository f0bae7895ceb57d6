package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table — the per-document
  * feature extraction stage of a training-data pipeline. All queries are
  * pure per-row projections (no shuffle except the final order-by on
  * small/bounded output), so they scale linearly with input splits.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Documents scan for operators whose per-row compute dominates
    * (regex scrub, shingle fingerprints, repetition n-grams, tokenize +
    * explode + md5-per-gram shingling, simhash's md5-per-token
    * signature): floors map parallelism (Tables.spread) so a
    * single-row-group input doesn't pin the whole pass to one core.
    * Light projections (exact whole-text md5 dedup, id-only scans) keep
    * the plain scan — for them the exchange costs more than the compute
    * it spreads. Shared with [[Dedup]]'s near-dup family. */
  private[operators] def docsHeavy(s: SparkSession, dir: String): DataFrame =
    Tables.spreadTable(s, dir, "documents", col("doc_id"))

  // q21 — per-document stats: char/token/distinct counts + uniqueness
  // ratio (exact-integer division → bit-identical doubles in the oracle).
  def docStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      col("lang"),
      length(col("text")).cast("long").as("char_len"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_uniq_tokens"))
      .withColumn("uniq_ratio",
        col("n_uniq_tokens").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))

  // q22 — corpus word frequency: explode + count + top-k. At 100 TB the
  // explode stays map-side; the shuffle carries only (token, partial
  // count) pairs thanks to partial aggregation.
  def wordFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(20)

  // q23 — heuristic language ID via per-language stopword hits with a
  // deterministic argmax (SURVEY scale-extension: language-ID operator).
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(
      col("doc_id"), col("lang"),
      stopwordHits(col("text"), "en").as("en_hits"),
      stopwordHits(col("text"), "es").as("es_hits"),
      stopwordHits(col("text"), "de").as("de_hits"),
      stopwordHits(col("text"), "fr").as("fr_hits"))
    d.withColumn("pred_lang",
        predictedLang(col("en_hits"), col("es_hits"), col("de_hits"), col("fr_hits")))
      .orderBy(col("doc_id"))
  }

  // q24 — quality scoring: length/uniqueness/token-shape gates, the
  // standard pre-training corpus filter. Flag emitted as int for stable
  // cross-engine schema.
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScoreFor(docs(s, dir))

  /** THE quality-gate predicate (q24's `quality_ok`) as a function of
    * the three derived stats — ONE definition shared by the standalone
    * query and the composed pipeline's fused filter, so the gate can't
    * drift between them. */
  private[graft] def qualityOk(nTokens: Column, uniqRatio: Column,
                               meanTokenLen: Column): Column =
    nTokens.between(5L, 500L) &&
      uniqRatio > 0.2 &&
      meanTokenLen.between(2.0, 12.0)

  /** Core of q24, usable on any (doc_id, text) frame — the composed
    * pipeline's stage-1 gate applies [[qualityOk]] over the same derived
    * columns. */
  def qualityScoreFor(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("char_len"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_uniq_tokens"),
      tokenEstimate(col("text")).as("n_tokens_bpeish"))
      .withColumn("mean_token_len",
        (col("char_len") - (col("n_tokens") - lit(1L))).cast("double") / col("n_tokens"))
      .withColumn("uniq_ratio",
        col("n_uniq_tokens").cast("double") / col("n_tokens"))
      .withColumn("quality_ok",
        qualityOk(col("n_tokens"), col("uniq_ratio"), col("mean_token_len")).cast("int"))
      .orderBy(col("doc_id"))

  // q47 — PII scrubbing audit (corpus-hygiene pass): redact emails /
  // URLs / long digit runs, report per-doc match counts + the redacted
  // text's hash (so the oracle verifies the actual rewritten bytes, not
  // just the counts). Pure per-row regex work — shuffle-free, codegen'd.
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    docsHeavy(s, dir).select(
      col("doc_id"),
      piiCount(col("text"), PiiEmail).as("n_emails"),
      piiCount(col("text"), PiiUrl).as("n_urls"),
      piiCount(col("text"), PiiDigits).as("n_digit_runs"),
      md5(piiRedact(col("text"))).as("redacted_hash"))
      .orderBy(col("doc_id"))

  // q48 — repetition scoring (boilerplate/spam signal): the most
  // frequent 3-gram's share of a document's total 3-grams. High values
  // flag template/repeated content — a standard pre-training quality
  // gate alongside q24.
  def repetitionScore(s: SparkSession, dir: String): DataFrame =
    repetitionScoreFor(docsHeavy(s, dir))

  /** Core of q48, usable on any (doc_id, text) frame (specs plant their
    * own repetitive/diverse docs through this same code path). */
  def repetitionScoreFor(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_gram_n"),
           sum(col("n")).as("n_grams"))
      .withColumn("repetition", col("top_gram_n").cast("double") / col("n_grams"))
      .withColumn("repetitive", (col("repetition") > 0.2).cast("int"))
      .orderBy(col("doc_id"))

  // q59 — unigram language-model scoring: fit add-one-smoothed unigram
  // log-probs on the corpus itself, score every document by its mean and
  // minimum token log-prob — the classic cheap LM-based quality filter
  // (docs full of rare junk score low; `min_logp` is the rarest-token
  // surprise). Two corpus scans by design: pass 1 aggregates the
  // vocabulary histogram (vocab-sized ⇒ BROADCAST to the scoring join —
  // no shuffle of the token stream), pass 2 re-explodes and scores.
  // Caching the exploded token stream instead would trade a cheap
  // map-side re-scan for materializing ~N_tokens rows — the wrong trade
  // at 100 TB. Scores round to 6dp: sum order and libm ulps differ
  // across engines.
  def unigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    val t = counts.agg(sum(col("n_tok")).cast("long"), count(lit(1))).head
    val denom = (t.getLong(0) + t.getLong(1)).toDouble
    val logp = log((col("n_tok") + lit(1L)).cast("double") / lit(denom))
    tok.join(broadcast(counts), "token")
      .withColumn("logp", logp)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(min(col("logp")), 6).as("min_logp"))
      .orderBy(col("doc_id"))
  }

  // q30 — winnowing-style fingerprint: min md5 over 8-token shingles,
  // bucketed by the first hex nibble. Per-row, shuffle-free; the bucket
  // column is what a 100-TB pipeline would hash-partition on.
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    docsHeavy(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"),
        minShingleFingerprint(col("t"), 8).as("fingerprint"))
      .withColumn("bucket", substring(col("fingerprint"), 1, 1))
      .orderBy(col("doc_id"))

  // q87 — LINE-LEVEL boilerplate removal (CCNet/RefinedWeb-style): hash
  // each line, count how many distinct documents it appears in, strip
  // lines shared by more than `maxDocs` docs (nav bars, cookie banners,
  // license footers — the template text document-level dedup can't see),
  // and report per-doc retention stats plus the md5 of the RETAINED
  // text, so the oracle certifies the actual surviving bytes.
  def lineDedup(s: SparkSession, dir: String,
                segLen: Int = 10, maxDocs: Int = 1): DataFrame =
    lineDedupFor(docsHeavy(s, dir), segLen, maxDocs)

  /** Lines of a document as non-overlapping `segLen`-token segments
    * with a 0-based line number. The driver corpus is single-line
    * (no '\n' anywhere in `documents.text`), so the declared query uses
    * this fixed segmentation as its line proxy; a real crawl corpus
    * would feed [[lineDedupLines]] `split(text, '\n')` lines through
    * the same (doc_id, line_no, line) contract. Segment count and bounds
    * are all-integer (`(n + segLen − 1) div segLen`), so DuckDB replays
    * the segmentation exactly. Pure per-row explode — no shuffle. */
  private[graft] def docLines(documents: DataFrame, segLen: Int): DataFrame = {
    require(segLen > 0, s"need segLen > 0, got $segLen")
    documents
      .select(col("doc_id"), tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .select(col("doc_id"), col("_t"),
        explode(sequence(lit(0L),
          expr(s"(`_n` + ${segLen - 1}) div $segLen") - 1)).as("line_no"))
      .select(col("doc_id"), col("line_no"),
        concat_ws(" ", slice(col("_t"),
          (col("line_no") * segLen + 1).cast("int"), lit(segLen))).as("line"))
  }

  /** Core of q87 over any (doc_id, text) frame.
    *
    * Two corpus passes by design (q59's trade, not an accident): pass 1
    * aggregates the boilerplate line-hash table; pass 2 re-derives the
    * lines and filters against it. Caching the exploded line stream
    * instead would materialize ~N_token rows to save a map-side
    * re-scan — the wrong trade at 100 TB.
    *
    * Scale shape: the frequency pass shuffles (line_hash, doc_id) pairs
    * — within-partition duplicates collapse in the partial aggregate,
    * so the exchange is bounded by distinct (line, doc) pairs, never
    * raw token volume (the 10× soak gates this ratio). Line identity
    * is the 60-bit [[md5Long]] — an 8-byte shuffle/join key instead of
    * the line bytes. The boilerplate table (lines in > maxDocs docs) is
    * a small fraction of distinct lines, so the pass-2 probe join
    * broadcasts it in practice; the plan degrades to a hash shuffle on
    * the 8-byte key when a pathological corpus makes it large. The
    * retained-text hash is assembled in ONE aggregation via a sorted
    * collect of (line_no, line) structs — bounded by a single document's
    * lines, the same per-group bound every per-doc aggregate carries. */
  def lineDedupFor(documents: DataFrame, segLen: Int = 10,
                   maxDocs: Int = 1): DataFrame =
    lineDedupLines(docLines(documents, segLen), maxDocs)

  /** [[lineDedupFor]] over a caller-supplied (doc_id, line_no, line)
    * frame — the entry a newline-structured corpus calls with its
    * actual `split(text, '\n')` lines. `lines` must be re-derivable
    * (a projection, not a consumed iterator): it is scanned twice, once
    * per pass. */
  def lineDedupLines(lines: DataFrame, maxDocs: Int = 1): DataFrame =
    scrubLines(lines, boilerplateLines(lines, maxDocs))
      .orderBy(col("doc_id"))

  // q93 — [[lineDedupLines]] driven through the REAL newline path. q87
  // gates the scrub rule on the 10-token segment proxy (the driver
  // corpus is single-line); this query first derives a deterministic
  // NEWLINE VIEW of the corpus — every `segLen`-th space becomes '\n'
  // via one regexp_replace, replayed verbatim by the DuckDB oracle —
  // and then runs the exact entry a crawl corpus calls:
  // split(text_nl, '\n') + posexplode → (doc_id, line_no, line) →
  // lineDedupLines. An oracle-green run certifies the newline path
  // itself (posexplode line numbering, blank-line-free splitting, the
  // scrub over genuinely multi-line documents), not just the proxy.
  def lineDedupNewline(s: SparkSession, dir: String, segLen: Int = 7,
                       maxDocs: Int = 1): DataFrame =
    lineDedupLines(newlineLines(docsHeavy(s, dir), segLen), maxDocs)

  /** Deterministic newline view: replace every `segLen`-th space with
    * '\n'. One global regexp_replace — the pattern consumes `segLen`
    * tokens plus the following space and reinserts the tokens with a
    * newline, so non-overlapping left-to-right matching yields exactly
    * ⌈n/segLen⌉ lines of ≤ segLen tokens on a single-spaced corpus
    * (verified equal to [[docLines]]' slice segmentation by spec AND by
    * the dry-run against DuckDB's RE2 with the 'g' flag — Java and RE2
    * agree on this pattern because `[^ ]+` is backtracking-free). */
  private[graft] def newlineView(documents: DataFrame, segLen: Int): DataFrame = {
    require(segLen > 0, s"need segLen > 0, got $segLen")
    documents.select(col("doc_id"),
      regexp_replace(col("text"),
        s"(([^ ]+ ){${segLen - 1}}[^ ]+) ", "$1\n").as("text_nl"))
  }

  /** The (doc_id, line_no, line) frame of [[newlineView]] — the literal
    * `split(text, '\n')` + posexplode a newline corpus feeds
    * [[lineDedupLines]]. Pure per-row explode, no shuffle. */
  private[graft] def newlineLines(documents: DataFrame, segLen: Int): DataFrame =
    newlineView(documents, segLen)
      .select(col("doc_id"),
        posexplode(split(col("text_nl"), "\n")).as(Seq("line_no", "line")))
      .select(col("doc_id"), col("line_no").cast("long").as("line_no"),
        col("line"))

  // q95 — INTRA-document repeated n-gram scrub: remove every token
  // covered by a LATER occurrence of an n-gram already seen in the
  // same document (the exact-substring self-dedup pass of a training
  // pipeline — generated/boilerplate text loops on itself long before
  // it duplicates across documents, which is q87's axis; q48 SCORES
  // repetition, this op CUTS it). First occurrences always survive, so
  // a clean document passes through byte-identical.
  def repeatedGramScrub(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    repeatedGramScrubFor(docsHeavy(s, dir), n)

  /** Core of q95 over any (doc_id, text) frame.
    *
    * Semantics (1-based token positions): gram g_i spans tokens
    * [i, i+n−1]; an occurrence at i is a REPEAT iff the same gram hash
    * occurred at some j < i in the document; removed positions are the
    * union of repeat spans; maximal contiguous removed runs (overlap
    * OR adjacency merges, the q88 sessionize rule with gap n) are the
    * reported spans. Token 1 is never removed (a repeat starts at
    * pos ≥ 2), so the retained text is never empty.
    *
    * Scale shape: positioned gram hashes come from ONE native codegen'd
    * pass per row ([[graft.plans.ShingleHashesMd5]] — 60-bit md5Long
    * values the oracle replays); first-occurrence detection is a
    * (doc_id, gram-hash) partial-agg shuffle — the word-count exchange,
    * 16-byte keys; the span window partitions by doc_id over REPEAT
    * hits only (repetition-volume-proportional, not corpus-
    * proportional); the kept-token anti-join is equi-keyed on
    * (doc_id, pos) against exploded span positions — bounded by removed
    * volume; the final per-doc aggregate is the same sorted-collect
    * bounded by one document that every per-doc reporter uses. */
  def repeatedGramScrubFor(documents: DataFrame, n: Int = 3): DataFrame = {
    require(n > 0, s"need n > 0, got $n")
    graft.plans.ShingleHashesMd5.register(documents.sparkSession)
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("_tk"))
    val grams = toks
      .select(col("doc_id"),
        posexplode(call_function("shingle_hashes_md5", col("_tk"), lit(n)))
          .as(Seq("_p0", "_gh")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"), col("_gh"))
    val firsts = grams.groupBy(col("doc_id"), col("_gh"))
      .agg(min(col("pos")).as("_first"))
    val repeats = grams.join(firsts, Seq("doc_id", "_gh"))
      .filter(col("pos") > col("_first"))
      .select(col("doc_id"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = repeats
      .withColumn("_new", when(lag(col("pos"), 1).over(w).isNull ||
        col("pos") - lag(col("pos"), 1).over(w) > n, 1L).otherwise(0L))
      .withColumn("_span", sum(col("_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("_span"))
      .agg(min(col("pos")).as("_s"), (max(col("pos")) + lit(n - 1)).as("_e"))
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("_s"), col("_e"))).as("_p"))
    val kept = toks
      .select(col("doc_id"), posexplode(col("_tk")).as(Seq("_q0", "_tok")))
      .select(col("doc_id"), (col("_q0") + 1).cast("long").as("_p"), col("_tok"))
      .join(covered, Seq("doc_id", "_p"), "left_anti")
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(md5(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("_p"), col("_tok")))),
        x => x.getField("_tok")))).as("_rh"))
    val spanAgg = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_ns"), sum(col("_e") - col("_s") + 1).as("_nr"))
    documents.select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .join(spanAgg, Seq("doc_id"), "left")
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("_nr"), lit(0L)).as("n_removed_tokens"),
        coalesce(col("_ns"), lit(0L)).as("n_repeat_spans"),
        coalesce(col("_rh"), md5(lit(""))).as("retained_hash"))
      .orderBy(col("doc_id"))
  }

  /** The BOILERPLATE TABLE of a lines frame: one `_lh` (60-bit line
    * hash) row per line appearing in more than `maxDocs` distinct
    * documents — the corpus-frequency pass, and the static artifact a
    * deployment recomputes daily and probes at ingest
    * ([[graft.streaming.LineDedup]]). */
  def boilerplateLines(lines: DataFrame, maxDocs: Int = 1): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    lines
      .select(md5Long(col("line")).as("_lh"), col("doc_id"))
      .distinct()
      .groupBy(col("_lh")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") > maxDocs)
      .select(col("_lh"), lit(1).as("_boiler"))
  }

  /** Scrub a (doc_id, line_no, line) frame against a boilerplate table
    * ([[boilerplateLines]] output): per-doc retention stats + the md5
    * of the retained text. Shared VERBATIM by the batch query and the
    * streaming twin so the scrub rule can't drift between them. No
    * ordering (the batch entry adds the oracle sort; a stream can't
    * sort).
    *
    * Token-count convention: an EMPTY kept line counts 1 token in
    * `n_kept_tokens` — `split("", " ")` is `[""]` engine-wide (q21's
    * tokenCount("") = 1, DuckDB's `len(string_split('', ' '))` = 1),
    * and the oracle replays exactly that. Newline corpora with blank
    * lines inherit the same convention; callers wanting blank lines
    * excluded should filter them before the scrub. */
  def scrubLines(lines: DataFrame, boiler: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    lines
      .withColumn("_lh", md5Long(col("line")))
      .join(boiler, Seq("_lh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_boiler").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("_boiler").isNull,
          size(org.apache.spark.sql.functions.split(col("line"), " "))
            .cast("long")).otherwise(0L)).as("n_kept_tokens"),
        md5(concat_ws(" ", transform(
          sort_array(collect_list(when(col("_boiler").isNull,
            struct(col("line_no"), col("line"))))),
          x => x.getField("line")))).as("retained_hash"))
  }

  // q82 — vocabulary build + OOV audit: the tokenizer-prep op a
  // training pipeline runs before freezing a vocab.
  def vocabOov(s: SparkSession, dir: String, vocabSize: Int = 512): DataFrame =
    vocabOovFor(docs(s, dir), vocabSize)

  /** Build the top-`vocabSize` vocabulary from the TRAIN split's token
    * counts (count desc, token asc — a total order, so the cut is
    * deterministic in any engine) and measure per-source out-of-vocab
    * rates on the held-out TEST split. Splits are q44's hash-mod
    * assignment ([[Sampling.assignSplit]]), so vocab and audit sides
    * can never leak into each other as the corpus grows.
    *
    * Scale shape: the train token count is one partial-agg shuffle (the
    * standard word-count exchange); the vocab cut is TakeOrdered on
    * `vocabSize` rows; the cut vocab BROADCASTS to the eval token
    * stream (never shuffled — at 100 TB the eval side is the big
    * operand and it stays map-side); the per-source rollup is a
    * partial-agg shuffle on the source key. */
  def vocabOovFor(documents: DataFrame, vocabSize: Int = 512): DataFrame = {
    val d = documents.withColumn("_split",
      Sampling.assignSplit(col("doc_id")))
    val vocab = d.filter(col("_split") === "train")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1L).as("_in"))
    d.filter(col("_split") === "test")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
      .orderBy(col("source"))
  }

  // q80 — sliding-window token chunking: the pretraining-prep operator
  // that turns raw documents into model-sized training sequences. The
  // declared params (32/24) are sized to the testdata's ≤99-token docs
  // so the driver gate exercises multi-chunk tiling and the snapped
  // last window, not just the short-doc identity case; a real pipeline
  // runs the same operator at (2048, 1536)-ish.
  def docChunks(s: SparkSession, dir: String,
                maxLen: Int = 32, stride: Int = 24): DataFrame =
    docChunksFor(docsHeavy(s, dir), maxLen, stride)

  /** Split each document into `maxLen`-token windows advancing by
    * `stride` tokens (overlap = maxLen − stride). The LAST window is
    * SNAPPED to the document end (start = n − maxLen) so no trailing
    * tokens are dropped and no degenerate sub-stride tail is emitted:
    * every chunk is exactly maxLen tokens except the single chunk of a
    * short (≤ maxLen) document. Chunk count and starts are all-integer
    * (`(n − maxLen + stride − 1) div stride + 1`), so the DuckDB oracle
    * replays them exactly. Per-row explode — no shuffle; at 100 TB this
    * scales with input splits and output volume is bounded by
    * ~(1/stride + 1/n)× the token stream. The md5 stands in for the
    * chunk payload to keep the dump narrow (a real pipeline writes the
    * token slice itself). */
  def docChunksFor(documents: DataFrame, maxLen: Int = 128,
                   stride: Int = 96): DataFrame =
    docChunksRaw(documents, maxLen, stride)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** [[docChunksFor]] WITHOUT the final oracle sort — the entry for
    * consumers that aggregate the chunks (q81's packer, the soak),
    * where a mid-pipeline global sort would be pure waste. */
  private[graft] def docChunksRaw(documents: DataFrame, maxLen: Int = 128,
                                  stride: Int = 96): DataFrame = {
    require(maxLen > 0 && stride > 0 && stride <= maxLen,
      s"need 0 < stride <= maxLen, got maxLen=$maxLen stride=$stride")
    documents
      .select(col("doc_id"), tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .withColumn("_nc", when(col("_n") <= maxLen, lit(1L))
        .otherwise(expr(s"(`_n` - $maxLen + ${stride - 1}) div $stride") + lit(1L)))
      .select(col("doc_id"), col("_t"), col("_n"), col("_nc"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("chunk_idx"))
      .withColumn("start_tok",
        when(col("chunk_idx") === col("_nc") - 1,
          greatest(col("_n") - maxLen, lit(0L)))
          .otherwise(col("chunk_idx") * stride))
      .withColumn("n_tokens",
        least(lit(maxLen.toLong), col("_n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tokens"),
        md5(concat_ws(" ",
          slice(col("_t"), (col("start_tok") + 1).cast("int"),
            col("n_tokens").cast("int")))).as("chunk_hash"))
  }
}
