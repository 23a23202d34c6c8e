package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star text / dedup operators (SURVEY.md §2.11) — the production
  * (100 TB) variants. The oracle-checked QueryCatalog twins use md5-derived
  * hashes so DuckDB can mirror them; these use xxhash64 (codegen'd, no
  * digest allocation) and are the ones a real pipeline would run.
  *
  * Shuffle budget per operator:
  *  - exactDedup: one shuffle on the digest;
  *  - minHash LSH: explode to (doc × bands) rows, one shuffle on the band
  *    bucket, candidate verify joins shuffle only candidate pairs — never
  *    O(n²);
  *  - simHash: bit votes aggregated map-side first (partial hash agg).
  */
object Text {

  def tokens(text: Column): Column = filter(split(text, " "), t => t =!= "")

  /** Distinct (doc_a < doc_b) pairs of ids sharing a bucket key — the
    * LSH candidate generator. One shuffle on the key; pair fan-out happens
    * inside each bucket.
    *
    * Skew guard: a bucket of n ids would otherwise emit C(n,2) pairs — a
    * boilerplate-heavy corpus where thousands of docs share a band hash
    * turns one task quadratic. Buckets larger than `maxBucketSize` are
    * split into deterministic sorted chunks of that size and pairs are
    * emitted only within a chunk, bounding output at
    * ceil(n/cap) × C(cap,2) ≈ n×cap/2 — linear in n. The recall
    * trade-off (cross-chunk pairs inside an over-cap bucket are dropped)
    * is mitigated in the LSH callers because true near-dups collide on
    * several independent bands, each giving another chance to pair. */
  def bucketPairs(df: DataFrame, keys: Seq[String], idCol: String = "doc_id",
      maxBucketSize: Int = 1000): DataFrame = {
    def chunkPairs(ids: Column): Column = {
      val n = size(ids)
      val nChunks = ceil(n.cast("double") / maxBucketSize).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        c => slice(ids, c * maxBucketSize + 1, lit(maxBucketSize)))
      // a trailing chunk of size 1 must be dropped BEFORE sequence(1, n-1)
      // — sequence(1, 0) counts DOWN in Spark (same trap as `shingles`)
      flatten(transform(filter(chunks, ch => size(ch) >= 2), chunk =>
        flatten(transform(
          sequence(lit(1), size(chunk) - 1),
          i => transform(
            sequence(i + 1, size(chunk)),
            j => struct(
              element_at(chunk, i).as("doc_a"),
              element_at(chunk, j).as("doc_b")))))))
    }
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(chunkPairs(col("ids"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Word n-gram shingles (default 3); empty array for short docs
    * (sequence(1, 0) would count DOWN in Spark, so guard explicitly).
    *
    * `toks` is LET-BOUND via single-element array + transform before the
    * shingle lambda touches it: a lambda variable is a bound value, so a
    * complex argument (e.g. `tokens(text)`) is evaluated once per row.
    * Without the binding, CollapseProject inlines the argument into the
    * lambda body and it re-evaluates per element_at — n re-tokenizations
    * PER SHINGLE, observed as 20 s bench blowups (q55/q56/q58 at sf0.1)
    * before this guard. */
  def shingles(toks: Column, n: Int = 3): Column =
    element_at(
      transform(array(toks), ts =>
        when(size(ts) >= n,
          transform(
            sequence(lit(1), size(ts) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j)): _*)))
          .otherwise(array().cast("array<string>"))),
      1)

  /** MinHash signature as a column expression: `numHashes` xxhash64-seeded
    * minima over shingles. Null for docs with no shingles.
    * NOTE small-data only: nested higher-order lambdas re-evaluate their
    * inlined argument per outer iteration — for corpora use
    * `minHashTable` (explode + codegen'd aggregate form). */
  def minHashSignature(sh: Column, numHashes: Int = 16): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))

  private val MersennePrime31 = 2147483647L

  /** MinHash signatures at scale: one xxhash64 per shingle (codegen'd,
    * evaluated once via explode), `numHashes` affine-seeded minima as plain
    * aggregates, reassembled into (doc_id, sig array<long>). One shuffle. */
  def minHashTable(docs: DataFrame, numHashes: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val M = MersennePrime31
    val shingleRows = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles(col("toks"))).as("sh"))
      .select(col("doc_id"), (pmod(xxhash64(col("sh")), lit(M))).as("h"))
    val minCols = (0 until numHashes).map(seed =>
      min((col("h") * (seed * 2 + 1) + seed * 1000003L) % M).as(s"m$seed"))
    shingleRows
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band digests from a signature: `bands` hashes of `rowsPerBand`
    * consecutive signature slots. */
  def lshBands(sig: Column, bands: Int = 4, rowsPerBand: Int = 4): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_id"),
        xxhash64(b, array_join(transform(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), "|")).as("band_hash")))

  /** Incremental (snapshot-over-snapshot) exact dedup: the re-crawl
    * pattern — keep each incoming doc only if (a) it is the min-id
    * representative of its content within the incoming batch and (b) the
    * content is not already in the prior corpus. Both steps key on a
    * 64-bit content fingerprint: one shuffle for the window, one
    * fingerprint-keyed anti-join (collision odds ~n²/2⁶⁵ — at 10¹¹ docs
    * still ~0.3%-of-one-spurious-drop territory; widen to a 128-bit md5
    * pair if even that matters). At scale, when `prior` is huge but its
    * FINGERPRINT SET is what matters, swap the anti-join for a broadcast
    * Bloom filter ([[graft.functions.BloomFilter]]) — no prior-side
    * shuffle at all, at the cost of a documented false-positive drop
    * rate. */
  def incrementalDedup(
      incoming: DataFrame, prior: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val priorFps = prior.select(xxhash64(col(textCol)).as("__fp")).distinct()
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    incoming
      .withColumn("__fp", xxhash64(col(textCol)))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      .join(priorFps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Per-position n-token span hashes: (doc_id, pos, gh) with 1-based
    * token positions. Each token is xxhash64'd ONCE per row (let-bound,
    * ARCHITECTURE §8), then the n-window combine is a variadic xxhash64
    * over the n token-hash longs — fixed 8n-byte input, order-sensitive,
    * no per-position span STRING ever built (the concat_ws form
    * allocated ~spanBytes garbage per position, 2× the token bytes at
    * n=8, and GC-bound the span queries), and no checked arithmetic
    * (ANSI mode rejects wrapping `*`). Map-side codegen throughout. */
  def spanHashes(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokenHashes = transform(tokens(col(textCol)), t => xxhash64(t))
    val spans = element_at(
      transform(array(tokenHashes), th =>
        when(size(th) >= n,
          transform(
            sequence(lit(1), size(th) - (n - 1)),
            i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*)))
          .otherwise(array().cast("array<long>"))),
      1)
    docs
      .select(col(idCol).as("doc_id"), posexplode(spans))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gh"))
  }

  /** Cross-document repeated-span detection — the exact-substring dedup
    * primitive of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), bounded to token n-grams: emit every
    * (doc, position) whose n-token span also occurs in at least
    * `minDocs - 1` other documents (its removal cut-list is the dedup
    * step; overlapping flagged positions merge into spans downstream).
    * Shape: ONE pass — [[spanHashes]] posexplodes and hashes each span
    * once, then a single exchange on the span hash computes the distinct
    * document count per span as a window pair (dense_rank over doc_id,
    * then its partition max). The previous groupBy + semi-join-back form
    * evaluated the tokenize/shingle/hash subtree TWICE (once per join
    * side — Catalyst cannot reuse the exchange because the two sides
    * shuffle on different keys) and cost three shuffles; this is one
    * evaluation, one shuffle, O(total tokens), never pairwise, keyed on
    * the 64-bit hash rather than span text. */
  def repeatedSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val byGh = Window.partitionBy(col("gh"))
    spanHashes(docs, n, idCol, textCol)
      .withColumn("__dr", dense_rank().over(byGh.orderBy(col("doc_id"))))
      // dense_rank is IntegerType; n_docs keeps the old count() LongType
      .withColumn("n_docs", max(col("__dr")).over(byGh).cast("long"))
      .filter(col("n_docs") >= minDocs)
      .select(col("doc_id"), col("pos"), col("n_docs"))
  }

  /** Merge `repeatedSpans` hits into per-document CUT INTERVALS — the
    * removal step of Lee et al. exact-substring dedup: overlapping or
    * adjacent flagged spans [pos, pos+n) coalesce into one
    * [cut_start, cut_end) interval. Same declarative algebra as
    * `Events.sessionizeBatch` (lag → new-interval flag → running sum →
    * aggregate), applied to token positions instead of timestamps; with
    * uniform span width the previous row's end IS the running max, so a
    * single lag suffices. One shuffle on doc_id, shared by the window
    * passes and the aggregate. */
  def spanCutList(spans: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    spans
      .withColumn("__prev_end", lag(col("pos") + n, 1).over(w))
      .withColumn("__new", when(
        col("__prev_end").isNull || col("pos") > col("__prev_end"), 1L).otherwise(0L))
      .withColumn("cut_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("cut_id"))
      .agg(
        min(col("pos")).as("cut_start"),
        (max(col("pos")) + n).as("cut_end"),
        count(lit(1)).as("n_spans"))
  }

  /** The Lee et al. removal step applied: rewrite each document with every
    * merged cut interval from [[spanCutList]] deleted — the end of the
    * exact-substring-dedup pipeline (flag spans → merge cuts → REWRITE).
    * Removes ALL occurrences of a repeated span (the symmetric variant;
    * keep-one-copy needs only a keeper filter on the span table first).
    *
    * Shape at scale: ONE join — the cut list collapses to a per-doc
    * interval ARRAY (tiny: disjoint merged intervals, a handful per doc),
    * left-joined onto the corpus on doc_id, and the rewrite is then pure
    * map work: an indexed `filter` drops tokens inside any interval and
    * `array_join` reassembles in place. The previous form posexploded
    * every token, range-joined positions against cuts, and rebuilt each
    * document with a collect_list + array_sort aggregate — a full
    * token-stream shuffle whose state was the whole corpus. Now the token
    * stream never leaves its partition; only the interval table moves.
    * Docs whose text tokenizes to nothing, and docs whose every token is
    * cut, vanish (consistent with the tokenize-side pipelines and the
    * previous aggregate form).
    *
    * Positions are 1-based token indexes, `[cut_start, cut_end)` —
    * exactly [[spanCutList]]'s output contract. */
  def applyCutList(docs: DataFrame, cuts: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cutArr = cuts.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("cut_start"), col("cut_end"))).as("__cuts"))
    // exists(null) is null -> coalesce keeps everything for cut-less docs
    val keep = (t: Column, i: Column) => coalesce(
      !exists(col("__cuts"),
        c => (i + 1) >= c.getField("cut_start") && (i + 1) < c.getField("cut_end")),
      lit(true))
    val kept = filter(tokens(col(textCol)), keep)
    docs
      .join(cutArr, docs(idCol) === cutArr("doc_id"), "left")
      // let-bind the filtered array so join/count don't re-run the filter
      .select(docs(idCol).as("doc_id"),
        element_at(transform(array(kept), k => struct(
          array_join(k, " ").as("clean_text"),
          size(k).cast("long").as("n_tokens_kept"))), 1).as("__r"))
      .filter(col("__r.n_tokens_kept") > 0)
      .select(col("doc_id"), col("__r.clean_text").as("clean_text"),
        col("__r.n_tokens_kept").as("n_tokens_kept"))
  }

  /** Benchmark-contamination check — the cross-corpus form of
    * [[repeatedSpans]]: for every training document, how many of its
    * n-token spans also occur ANYWHERE in the reference corpus (the
    * eval/benchmark set), as a count and a fraction. The reference side
    * collapses to its DISTINCT span-hash set before the semi-join, so its
    * size bounds the broadcast/shuffle no matter how big the reference
    * text is; the train side stays O(total tokens). A nonzero
    * `contaminated_frac` is the standard decontamination trigger. */
  def crossCorpusContamination(
      corpus: DataFrame, reference: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = spanHashes(corpus, n, idCol, textCol)
    val refSet = spanHashes(reference, n, idCol, textCol).select("gh").distinct()
    // ONE pass over the train grams: mark hits with a left join against
    // the (unique-keyed, so cardinality-preserving) reference set, then
    // count total and marked in a single doc-keyed aggregate. Two
    // separate aggregates would re-run the tokenize/shingle/explode scan
    // — the dominant cost at the operator's scale target — twice.
    a.join(refSet.withColumn("__hit", lit(1)), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        count(col("__hit")).as("n_contaminated"))
      .select(
        col("doc_id"), col("n_spans"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_spans"))
          .as("contaminated_frac"))
  }

  /** Exact-duplicate groups: one row per distinct content, keeper = min id. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Canonical text for normalization-robust dedup (the CCNet/RefinedWeb
    * move: normalize BEFORE fingerprinting, so case, punctuation, and
    * whitespace variants of the same content collapse to one hash):
    * lowercase → non-alphanumerics to spaces → whitespace runs collapsed
    * → trimmed. Patterns sit in the Java∩RE2 intersection (same contract
    * as [[redactPii]]) so the DuckDB twin reproduces every byte; pure
    * map-side, fingerprint with md5/xxhash64 downstream. Intentionally
    * ASCII-scoped — production multilingual corpora swap in ICU
    * normalization at the same call site. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * Returns (doc_a, doc_b, jaccard >= threshold). */
  def nearDupPairs(
      docs: DataFrame,
      threshold: Double = 0.5,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val base = minHashTable(docs, numHashes)
    val banded = base.select(
      col("doc_id"),
      explode(lshBands(col("sig"), bands, numHashes / bands)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    // bucket-combination form: signatures evaluated once, one groupBy
    // shuffle on the band key; a self-join would recompute them per side
    val pairs = bucketPairs(banded, Seq("band_id", "band_hash"))
    val tokset = docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val jac = size(array_intersect(col("ta.toks"), col("tb.toks"))).cast("double") /
      size(array_union(col("ta.toks"), col("tb.toks")))
    pairs
      .join(tokset.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tokset.as("tb"), col("doc_b") === col("tb.doc_id"))
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** English stopword markers present in the synthetic corpus vocabulary;
    * real deployments swap in per-language stopword lists. */
  val EnglishMarkers: Seq[String] = Seq("the", "a")

  private def markerCount(toks: Column): Column =
    size(filter(toks, t => EnglishMarkers.map(t === _).reduce(_ || _)))

  /** Language-ID heuristic: marker-token ratio → language code or "und".
    * (n-gram frequency profiles are the production upgrade; the operator
    * shape — per-row scoring, no shuffle — is identical.) */
  def langId(text: Column, threshold: Double = 0.05): Column = {
    val toks = tokens(text)
    when(markerCount(toks).cast("double") / size(toks) >= threshold, lit("en"))
      .otherwise(lit("und"))
  }

  /** Quality score 0-100: weighted blend of token count, average word
    * length, and (1 - stopword ratio), clamped. `nChars` avoids re-scanning
    * the string when the table already carries it. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = tokens(text)
    val nt = size(toks).cast("double")
    val stop = markerCount(toks).cast("double")
    val awl = (nChars - (nt - 1)) / nt
    RefFunctions.clamp(
      lit(100.0) * (least(nt / 100, lit(1.0)) * 0.4 +
        least(awl / 6, lit(1.0)) * 0.3 +
        (lit(1.0) - stop / nt) * 0.3), 0.0, 100.0)
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(text, " ")).cast("long")

  /** Vocabulary construction: the `topN` most frequent tokens with rank
    * ids and cumulative corpus coverage — the "how big must the vocab be
    * to cover X% of tokens" curve that sizes a tokenizer, plus the OOV
    * mass (1 - max coverage) it implies.
    *
    * Scale shape: one hash aggregate over the exploded tokens (partial
    * map-side combine collapses the per-partition duplicates, so the
    * shuffle carries ~vocab rows, not ~corpus rows), then a pushed
    * sort+limit (TakeOrderedAndProject — never a full global sort) prunes
    * to `topN` BEFORE the rank/cumsum window runs, so the unpartitioned
    * window only ever sees `topN` rows. The total-token count for the
    * coverage denominator is a 1-row broadcast. Ties break by token text
    * so the vocab is deterministic across runs and engines.
    *
    * Returns (token_id, token, n, coverage): token_id is the 0-based
    * frequency rank, coverage the fraction of ALL token occurrences
    * covered by ranks 0..token_id. */
  def vocabulary(docs: DataFrame, textCol: Column, topN: Int): DataFrame = {
    require(topN > 0, s"vocabulary: topN must be positive, got $topN")
    val counts = docs.select(explode(tokens(textCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(topN)
    val w = Window.orderBy(col("n").desc, col("token").asc)
    top.crossJoin(broadcast(total))
      .select(
        (row_number().over(w) - 1).cast("long").as("token_id"),
        col("token"), col("n"),
        (sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total").cast("double")).as("coverage"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every k-token gram, then keep only each
    * sliding window's MINIMUM hash. The selected fingerprints are a
    * sparse, position-independent signature with a guarantee plain
    * sampling lacks: any shared run of w+k-1 tokens between two documents
    * shares at least one fingerprint. Join two corpora on `fp` for
    * plagiarism/near-copy detection at ~1/w the index size of full k-gram
    * sets ([[spanHashes]] keeps every span; winnowing is the sampled tier
    * for cross-corpus matching where the full index is too big).
    *
    * Pure map-side array algebra, one row per distinct fingerprint per
    * doc. Tokens, gram hashes, and window minima are let-bound through
    * single-element array+transform (ARCHITECTURE §8) so each tier is
    * evaluated once per row, never once per lambda element. Hashes are
    * md5-derived int60s, so the DuckDB twin (q78) reproduces every
    * fingerprint bit-for-bit. Documents shorter than k tokens emit
    * nothing; shorter than k+w-1 emit the single global minimum. */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0 && w > 0, s"winnowFingerprints: k and w must be positive, got k=$k w=$w")
    def gramHash(ts: Column, i: Column): Column =
      conv(substring(md5(concat_ws(" ", slice(ts, i, lit(k)))), 1, 15), 16, 10).cast("long")
    val fps = element_at(transform(array(tokens(col(textCol))), ts =>
      element_at(transform(array(
        when(size(ts) - (k - 1) >= 1,
          transform(sequence(lit(1), size(ts) - (k - 1)), i => gramHash(ts, i)))
          .otherwise(array().cast("array<long>"))), hs =>
        when(size(hs) === 0, array().cast("array<long>"))
          .when(size(hs) < w, array(array_min(hs)))
          .otherwise(array_distinct(
            transform(sequence(lit(1), size(hs) - (w - 1)),
              j => array_min(slice(hs, j, lit(w))))))), 1)), 1)
    docs.select(col(idCol), explode(fps).as("fp"))
  }

  /** Cross-corpus plagiarism/copy detection on winnowing fingerprints:
    * per corpus document, how many of its fingerprints also occur
    * anywhere in `reference` — [[crossCorpusContamination]]'s exact-span
    * question answered from the ~1/w-sized winnowed signature instead of
    * every span (the index you can actually keep when both corpora are
    * large). Matching is semi-join against the DISTINCT reference
    * fingerprint set: one aggregate + one semi join, no pair explosion,
    * and a reference small enough to broadcast stays off the shuffle
    * path entirely. The winnowing guarantee bounds the miss: any shared
    * run of w+k-1 tokens surfaces at least one shared fingerprint. */
  def winnowMatch(corpus: DataFrame, reference: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val c = winnowFingerprints(corpus, k, w, idCol, textCol)
    val refFps = winnowFingerprints(reference, k, w, idCol, textCol)
      .select(col("fp")).distinct()
    // ONE pass over the corpus fingerprints (round-13): the former
    // per-doc-count aggregate + semi-join-count pair evaluated the
    // O(tokens·md5) fingerprint explode TWICE. A left join against the
    // distinct reference set tags each fingerprint row (refFps is
    // distinct, so the join never duplicates), and n_fps / n_matched
    // fall out of a single aggregate: count(1) vs count(non-null tag).
    c.join(refFps.withColumn("__hit", lit(1)), Seq("fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fps"), count(col("__hit")).as("n_matched"))
      .select(
        col(idCol), col("n_fps"), col("n_matched"),
        (col("n_matched").cast("double") /
          col("n_fps").cast("double")).as("matched_frac"))
  }

  /** BPE-ish token estimate: greedy max-4-char letter chunks, max-3-digit
    * number chunks (BPE vocabularies split long numbers), and one token
    * per punctuation/symbol character; whitespace is free. The pattern is
    * valid in both Java regex and RE2, so the DuckDB oracle twin (q26)
    * uses it verbatim. */
  val BpeTokenPattern = "[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** PII redaction patterns — written to the Java∩RE2 common subset (no
    * backrefs, no lookaround, explicit char classes) so the exact same
    * strings drive Spark's codegen'd regexp_replace and the DuckDB oracle
    * twin (q52). URL is replaced FIRST (URLs may embed '@' and digit runs
    * that would otherwise half-match as email/phone), then email, then
    * phone. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9\\- ]{6,}[0-9]"

  /** Scrub emails/URLs/phone numbers to typed placeholder tags. Pure
    * per-row codegen'd string work — no shuffle, scales linearly, and the
    * placeholder tags keep token positions stable for downstream counting. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Gopher-style repetition signal: fraction of word n-grams that are
    * duplicates of an earlier n-gram in the same document
    * (1 - distinct/total; 0.0 for docs too short to have any). Boilerplate
    * and degenerate generations score high. Pure per-row array work — the
    * single `shingles` HOF is used once, so CollapseProject cannot
    * re-evaluate it (the q21 inlining trap needs nested lambdas). */
  def dupNgramFraction(text: Column, n: Int = 3): Column = {
    // Let-binding via single-element array + transform: a lambda variable
    // is a BOUND VALUE, so the shingle array is evaluated exactly once
    // per row despite its three uses below (the naive form rebuilt it per
    // use and re-tokenized per element — a 13 s bench outlier at sf0.1;
    // `shingles` itself binds the token array, see its doc).
    element_at(
      transform(array(shingles(tokens(text), n)), sh =>
        when(size(sh) > 0,
          lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
          .otherwise(lit(0.0))),
      1)
  }

  /** Gopher-style top-token concentration: per doc, the fraction of tokens
    * taken by the single most frequent token (plus the total). Exploded
    * two-level aggregate — both groupBys hash-partition by doc_id, so the
    * second reuses the first's clustering; skew follows document length,
    * which the explode already spreads across partitions. */
  def topTokenStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        (max(col("c")).cast("double") / sum(col("c"))).as("top_tok_frac"),
        sum(col("c")).as("n_toks"))

  /** Quality GATE: compose the corpus-filter signals into a keep/drop
    * decision with the FIRST FAILING RULE named per document — the
    * filter-chain-with-reasons shape curation pipelines report on (how
    * much data each rule costs, what to re-tune). Rules in check order:
    * `too_short`, `too_long` (token count), `repetitive_ngrams`
    * ([[dupNgramFraction]]), `token_concentration` ([[topTokenStats]]).
    * `reason` is null ⟺ `keep`.
    *
    * All thresholds compare single-division doubles (the q53 trick), so
    * the booleans — and therefore the kept corpus — are engine-stable.
    * One doc_id shuffle (the token-stats aggregate); the n-gram signal
    * and the verdict are map-side. */
  def qualityGate(docs: DataFrame,
      minTokens: Long = 5L, maxTokens: Long = 100000L,
      maxDupFrac: Double = 0.05, maxTopFrac: Double = 0.125,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dup = docs.select(
      col(idCol).as("doc_id"), dupNgramFraction(col(textCol), 3).as("dup_frac"))
    topTokenStats(docs, idCol, textCol)
      .join(dup, "doc_id")
      .withColumn("reason", coalesce(
        when(col("n_toks") < minTokens, "too_short"),
        when(col("n_toks") > maxTokens, "too_long"),
        when(col("dup_frac") > maxDupFrac, "repetitive_ngrams"),
        when(col("top_tok_frac") > maxTopFrac, "token_concentration")))
      .select(
        col("doc_id"), col("n_toks"),
        col("reason").isNull.as("keep"), col("reason"))
  }

  /** Bigram language-model scoring — the perplexity-style curation
    * signal: train add-one-smoothed bigram statistics on the corpus
    * itself (one pass), then score every document by its mean token-pair
    * log-probability. Low scores mark text the corpus's own statistics
    * find improbable (boilerplate soup, encoding garbage) — the standard
    * LM-filtering signal, here with the corpus as its own model (no
    * external model files).
    *
    * p(b|a) = (c(a,b)+1) / (c(a·)+V), V = distinct continuation vocab.
    * Shapes: one doc_id window builds the pair stream, the count tables
    * shuffle on gram keys, the 1-row V broadcast-crosses, and the final
    * aggregate shuffles back on doc_id. Nothing is ever all-pairs.
    *
    * Determinism: every per-pair log-prob is rounded to integer
    * MICRO-UNITS before summing, so the per-doc sum is exact integer
    * arithmetic — float summation ORDER (Spark partition order vs any
    * other engine's) cannot perturb the result; the only cross-engine
    * surface is ln() itself on identical doubles, guarded by the final
    * r6 rounding of a division by n. */
  def bigramLmScore(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = docs
      .select(col(idCol).as("doc_id"), posexplode(tokens(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w2"))
      .withColumn("w1", lag(col("w2"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
    // Round-13: c1 and v were pruning-forked re-evaluations of the pair
    // stream — each re-ran the posexplode + lag-window corpus shuffle.
    // Cut the vocab-sized c2 model once per invocation; v over c2 sees
    // exactly the w2 set the pair stream carries. Pair-stream passes:
    // 4 → 2 (model build + scoring join).
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = c2.agg(countDistinct(col("w2")).as("v"))
    pairs
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("logp_micro",
        floor(log((col("c2") + lit(1.0)) / (col("c1") + col("v"))) * 1e6 + 0.5)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("logp_micro")).as("__sum"))
      .select(
        col("doc_id"), col("n_pairs"),
        (floor(col("__sum") / 1e6 / col("n_pairs") * 1e6 + 0.5) / 1e6)
          .as("lm_score"))
  }

  /** 64-bit SimHash per document (token-level, xxhash64 bit votes). */
  def simHash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("hv", xxhash64(col("tok")))
    // round-13: 64 conditional sums in ONE aggregate instead of a 64×
    // row explode through a two-level aggregate — same ±1 vote totals
    // per (doc, bit), same reassembled hash, 64× fewer aggregate rows
    // (the q22 rewrite; measured −30% there at sf0.1).
    val votes = (0 until 64).map(b =>
      sum(when(expr(s"(hv >> $b) & 1") === 1, lit(1)).otherwise(lit(-1)))
        .as(s"s$b"))
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over an undirected edge list: returns
    * (node, component) where `component` is the SMALLEST node id in the
    * node's component — the canonical cluster id for dedup. Only nodes
    * that appear in an edge are returned; callers union isolated nodes
    * back in (see `dedupClusters`).
    *
    * Algorithm: min-label propagation (label := min of own and neighbor
    * labels) plus one pointer-jumping step (label := label(label)) per
    * round, so convergence is O(log diameter) rounds rather than
    * O(diameter). Labels are monotonically non-increasing and always ids
    * of component members, so the fixpoint is exactly the component min.
    * Near-dup clusters have tiny diameters (most are cliques from a
    * shared LSH bucket), so 2-3 rounds is typical.
    *
    * Scale notes: each round is two shuffles (edge join + jump join) over
    * (node, label) pairs — never materializes anything larger than the
    * edge list. `localCheckpoint` after every round cuts the iterative
    * lineage (without it the plan doubles per round and the optimizer
    * re-walks it); on a real cluster prefer `spark.sparkContext
    * .setCheckpointDir` + `.checkpoint()` for fault-tolerant truncation.
    * This is the standard MapReduce CC; Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SOCC'14) is the published
    * large-star/small-star variant with the same O(log n) round bound. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "doc_a",
      dstCol: String = "doc_b",
      maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // (round-13 note: an explode-both-orientations rewrite that reads
    // the edge subtree once measured ~70% SLOWER here at sf0.1 than
    // this two-branch union — the concurrent branches win; kept as-is.)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = labels.isEmpty
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_min"))
        .withColumnRenamed("a", "node")
      // carry the pre-step label through so the convergence check is a
      // filter on the (already checkpointed) frame — not a per-iteration
      // shuffle join back against the previous labels
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("__prev"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      val jumped = stepped.as("x")
        .join(
          stepped.select(col("node").as("jn"), col("label").as("jl")).as("j"),
          col("x.label") === col("j.jn"), "left")
        .select(col("x.node").as("node"), col("x.__prev").as("__prev"),
          coalesce(col("j.jl"), col("x.label")).as("label"))
        .localCheckpoint(true)
      converged = jumped.filter(col("label") =!= col("__prev")).limit(1).count() == 0L
      labels = jumped.drop("__prev")
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.withColumnRenamed("label", "component")
  }

  /** Cluster resolution for a dedup pipeline: candidate pairs (from
    * `nearDupPairs` / `simHashPairs` / exact fingerprints) → one row per
    * document with its cluster id (min doc id of the connected
    * component; singletons cluster with themselves), the cluster size,
    * and whether this document is the canonical keeper. Filtering on
    * `is_keeper` yields the deduplicated corpus. */
  def dedupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val cc = connectedComponents(pairs)
      .withColumnRenamed("node", idCol)
    val labeled = docs.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("cluster_id"))
    // cluster_size as a count window over the SAME key (round-13): the
    // former groupBy+self-join evaluated `labeled` twice (two docs
    // scans + an extra exchange); one cluster_id exchange now serves
    // both the size and any downstream cluster_id window (q167 chains
    // two — guide §2.4's shared-partitioning rule). Same rows, counts,
    // and types (count over an unordered frame = whole partition).
    labeled
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .select(
        col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_keeper"))
  }

  /** SimHash near-dup pairs: band the 64 bits into `bands` chunks, join on
    * any equal chunk (guarantees recall for hamming <= bands-1), verify by
    * exact hamming. */
  def simHashPairs(sim: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val chunks = (0 until bands).map(b => struct(
      lit(b).as("band_id"),
      shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("chunk")))
    val banded = sim.select(
      col("doc_id"), explode(array(chunks: _*)).as("p"))
      .select(col("doc_id"), col("p.band_id"), col("p.chunk"))
    // candidates via bucket combos, then hamming verify by joining the
    // per-doc simhash back (persist `sim` upstream if it is expensive —
    // each join branch re-evaluates its input plan)
    bucketPairs(banded, Seq("band_id", "chunk"))
      .join(sim.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), Seq("doc_a"))
      .join(sim.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** PPJoin candidate pairs — EXACT-recall prefix filtering for the
    * set-similarity join (Chaudhuri/Ganti/Kaushik SSJoin + Xiao et al.
    * PPJoin prefix principle): order each doc's tokens by ascending
    * document frequency, keep only the first n − ⌈t·n⌉ + 1 (the PREFIX);
    * any pair with Jaccard ≥ t MUST share a prefix token, so joining on
    * prefix tokens loses nothing. Rarest-first ordering makes the join
    * keys the LEAST skewed tokens — the candidate blow-up a raw
    * token-join would hit on stopwords cannot happen here.
    *
    * Input: (idCol, toksCol) with toksCol an array of DISTINCT tokens.
    * Output: distinct (doc_a < doc_b) candidate id pairs. Three bounded
    * shuffles: token df, per-doc rank window, candidate distinct.
    *
    * Round 14 adds PPJoin's LENGTH FILTER (Xiao et al. §3; guide §3 join
    * pre-filter): J(A,B) ≥ t ⟹ min(|A|,|B|)/max(|A|,|B|) ≥ t (the
    * intersection is at most the smaller set, the union at least the
    * larger), so candidate pairs failing the size-ratio bound are pruned
    * BEFORE the distinct exchange and the verify join ever see them.
    * Lossless against the downstream verify BY CONSTRUCTION, including
    * at the float boundary: both this filter and the verify compare a
    * correctly-rounded double division against the same threshold, and
    * x = i/u ≤ r = min/max in reals ⟹ rnd(x) ≤ rnd(r) (rounding is
    * monotone) ⟹ any pair the verify keeps (rnd(x) ≥ t) passes here
    * (rnd(r) ≥ t). PpJoinSpec pins recall vs the naive quadratic join;
    * the degenerate-size pruning case is pinned there too. */
  def ppJoinCandidates(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", toksCol: String = "toks"): DataFrame = {
    val tokRows = docs.select(col(idCol).as("__id"),
      size(col(toksCol)).as("__n"), explode(col(toksCol)).as("__tok"))
    val dfTok = tokRows.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val prefixLen =
      (col("__n") - ceil(col("__n") * threshold) + 1).cast("int")
    val prefix = tokRows.join(dfTok, "__tok")
      .withColumn("__rn", row_number().over(Window.partitionBy(col("__id"))
        .orderBy(col("__df").asc, col("__tok").asc)))
      .filter(col("__rn") <= prefixLen)
      .select(col("__id"), col("__n"), col("__tok"))
    prefix.select(col("__id").as("doc_a"), col("__n").as("__na"), col("__tok"))
      .join(prefix.select(col("__id").as("doc_b"), col("__n").as("__nb"),
        col("__tok")), Seq("__tok"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("__na"), col("__nb")).cast("double") /
          greatest(col("__na"), col("__nb")) >= threshold)
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact set-similarity self-join: [[ppJoinCandidates]] then exact
    * Jaccard verification of only the candidates. Row-identical to the
    * naive O(n²) all-pairs join at ANY threshold (prefix filtering is
    * lossless), but the verify join touches candidates, not n²/2 pairs.
    * Output: (doc_a, doc_b, jac) with raw double Jaccard ≥ threshold. */
  def ppJoin(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", toksCol: String = "toks"): DataFrame = {
    val a = docs.select(col(idCol).as("doc_a"), col(toksCol).as("__toks_a"))
    val b = docs.select(col(idCol).as("doc_b"), col(toksCol).as("__toks_b"))
    val jac =
      size(array_intersect(col("__toks_a"), col("__toks_b"))).cast("double") /
        size(array_union(col("__toks_a"), col("__toks_b")))
    ppJoinCandidates(docs, threshold, idCol, toksCol)
      .join(a, "doc_a").join(b, "doc_b")
      .withColumn("jac", jac)
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }
}
