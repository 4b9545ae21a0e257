package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round
import graft.Readout
import graft.functions.tokens

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting.
  *
  * All per-document, embarrassingly parallel Column expressions — at 100 TB
  * these run map-side in whole-stage codegen with zero shuffles (aggregated
  * variants shuffle once on the group key).
  */
object TextAnalysis {

  /** Marker-word tables for the stopword-hit language heuristic. Real
    * pipelines use character n-gram profiles; the engine-level contract is
    * identical — per-language evidence scores + deterministic argmax.
    */
  val languageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  private def markerHits(text: Column, markers: Seq[String]): Column =
    markers.map { m =>
      // count whole-token occurrences of the marker
      size(filter(tokens(text), t => t === m))
    }.reduce(_ + _)

  /** Language ID: per-language marker-hit counts and the argmax label
    * (deterministic tie-break: first language in table order wins).
    */
  def languageScores(text: Column): Seq[(String, Column)] =
    languageMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }

  def detectLanguage(text: Column): Column = {
    val scores = languageScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Quality features: token count, distinct-token ratio, mean token
    * length, alpha ratio, and a composite score in [0,1]. Deterministic,
    * division-safe (nullif guards).
    */
  def qualityFeatures(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val chars = length(text).cast("double")
    val alphaChars = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    Map(
      "n_tokens" -> nTok,
      "distinct_ratio" -> nDistinct / nullif(nTok, lit(0.0d)),
      "mean_token_len" -> (chars - (nTok - 1)) / nullif(nTok, lit(0.0d)),
      "alpha_ratio" -> alphaChars / nullif(chars, lit(0.0d)))
  }

  /** Composite quality score: shorter-than-5-token or low-diversity docs
    * score low. A simple monotone blend, clamped to [0,1].
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lengthTerm = least(f("n_tokens") / lit(50.0d), lit(1.0d))
    val diversity = coalesce(f("distinct_ratio"), lit(0.0d))
    val alpha = coalesce(f("alpha_ratio"), lit(0.0d))
    least(greatest(
      lit(0.4d) * lengthTerm + lit(0.3d) * diversity + lit(0.3d) * alpha,
      lit(0.0d)), lit(1.0d))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and isolated symbols
    * each count as one token (a cheap deterministic proxy for a real
    * tokenizer's token count).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Content fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive bag-of-words fingerprint (rolling-hash analogue that
    * is reproducible in any engine with md5 + sort).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** TF-IDF term weights over a corpus, ratio-form: `(tf / n_tok) *
    * (N / df)` — exact integer ratios in fixed evaluation order, so the
    * scores are bit-reproducible in any engine (a log-scaled idf would pin
    * the comparison to one libm). Three hash aggregates + two equi-joins +
    * a broadcast of the single-row corpus count; no step is ever
    * all-pairs, so the shape holds at corpus scale.
    */
  def tfidf(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.spread(df)
      .select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nTok = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tok"))
    // tf rows are distinct (doc, token) pairs: counting them per token IS
    // the document frequency — no second distinct pass
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = toks.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(nTok, "doc_id").join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"),
        ((col("tf").cast("double") / col("n_tok").cast("double")) *
          (col("n_docs").cast("double") / col("df").cast("double"))).as("score"))
  }

  /** PII patterns (Java-regex and RE2 compatible — no lookarounds, so the
    * same pattern strings run in Spark and DuckDB). Deliberately
    * conservative: emails, dotted-quad IPs, and international-ish phone
    * numbers. Real deployments extend this table; the engine contract
    * (count → replace, one codegen'd map stage, no shuffle) is unchanged.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\+\\d{7,15}\\b", "[PHONE]"))

  /** Count of matches for one PII class. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact every PII class in table order (email before IP before phone,
    * so earlier replacements can't create later false positives).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Word n-gram repetition profile per document: total n-grams, distinct
    * n-grams, the hottest n-gram's count, and its share of all n-grams —
    * the MassiveText/Gopher-style repetition filter signal ("drop docs
    * whose top trigram exceeds 18% of all trigrams"). Docs with fewer than
    * `n` tokens produce no n-grams and are absent from the result.
    *
    * Shape at scale: explode → two hash aggregations keyed by doc, so it
    * shuffles on doc_id only (never on the n-gram), partial-aggregates
    * map-side, and hot n-grams cannot skew a reducer.
    */
  def repetitionStats(df: DataFrame, id: Column, text: Column,
                      n: Int = 3): DataFrame = {
    val perGram = Dedup.spread(df)
      .select(id.as("doc_id"),
        explode(graft.functions.wordShingles(text, n)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).cast("long").as("top_count"))
      .withColumn("top_frac",
        round(col("top_count").cast("double") / col("n_grams").cast("double"), 4))
  }

  /** Corpus-derived vocabulary: the `size` most frequent tokens, ids
    * 1..size assigned in (count desc, token asc) order — deterministic
    * across engines and partitionings. Returns (token, tid). The global
    * window runs over `size` rows, never the corpus.
    */
  def buildVocab(df: DataFrame, text: Column, size: Int): DataFrame = {
    val counts = Dedup.spread(df)
      .select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("token").asc)
      .limit(size)
    counts.withColumn("tid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__cnt").desc, col("token").asc)))
      .select(col("token"), col("tid").cast("long").as("tid"))
  }

  /** Encode every document against a (token, tid) vocabulary: tokens map
    * to their id, out-of-vocabulary tokens to 0, original order preserved.
    * The vocabulary broadcasts (it is vocab-sized, not corpus-sized), so
    * the corpus never shuffles for the lookup; re-assembly aggregates on
    * doc_id only. Returns (doc_id, n_tokens, n_oov, ids).
    */
  def encodeWithVocab(df: DataFrame, id: Column, text: Column,
                      vocab: DataFrame): DataFrame = {
    val positioned = Dedup.spread(df)
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "token")))
    positioned.join(broadcast(vocab), Seq("token"), "left")
      .withColumn("__tid", coalesce(col("tid"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("__tid").as("tid")))),
          x => x.getField("tid")).as("ids"))
  }

  /** Overlapping context-window chunking: cut each document into
    * `window`-token chunks every `stride` tokens (stride < window ⇒
    * overlap) — the RAG/embedding chunking step. Every token is covered;
    * the LAST chunk is the first one reaching the document's end, so no
    * emitted chunk is a pure suffix of its predecessor (a start whose
    * previous chunk already covered the end would duplicate content into
    * the index). Map-side explode, no shuffle.
    * Returns (doc_id, chunk_id, n_chunk_tokens, chunk).
    */
  def chunkWithStride(df: DataFrame, id: Column, text: Column,
                      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = tokens(text)
    df.select(id.as("doc_id"), toks.as("__t"))
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("__t")) - 1, lit(stride)))
          .as("__start"), col("__t"))
      // keep a start only if the PREVIOUS chunk did not already reach the
      // document end (first chunk always kept)
      .filter(col("__start") === 0 ||
        col("__start") - stride + window < size(col("__t")))
      .select(col("doc_id"),
        (col("__start") / stride).cast("long").as("chunk_id"),
        slice(col("__t"), col("__start") + 1, lit(window)).as("__chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk"))
  }

  /** Simpson diversity index over a document's token frequencies:
    * `1 - Σ c_i² / N²` — 0 for a one-token-repeated document, →1 as tokens
    * diversify. Unlike the distinct-token ratio it is frequency-weighted
    * (a doc that is 90% one token scores low even with many rare tokens),
    * and unlike Shannon entropy it needs NO logarithm: every term is an
    * exact integer ratio finished by a single IEEE division, so the score
    * is bit-identical in any engine (the same no-libm contract as the
    * TF-IDF weights above). Two aggregations keyed by doc_id(+token) —
    * skew-free, since the shuffle key is never a global token.
    */
  def simpsonDiversity(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(tokens(text)).as("__tok"))
      .groupBy(col("doc_id"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__c")).as("__sumsq"))
      .select(col("doc_id"), col("n_tokens"),
        (lit(1.0d) - col("__sumsq").cast("double") /
          (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"))

  /** BM25 relevance of each document for a set of query terms, one row per
    * (document, matching term) — the retrieval scorer behind quality-aware
    * corpus curation ("rank documents against a topic's seed terms").
    *
    * `score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with the
    * Robertson idf kept in its RAW rational form
    * `(N - df + 0.5)/(df + 0.5) + 1` — deliberately without the logarithm:
    * `Math.log` and C libms disagree by 1 ulp on ~0.1% of this domain
    * (measured over the full df ∈ [1, 50000] input set), and the log is
    * monotone so per-term ranking is unchanged. Every emitted value is a
    * chain of exact integer→double casts and two-operand IEEE ops —
    * bit-identical across engines, hence oracle-gatable. Summing scores
    * across query terms is left to the caller (a float sum's value depends
    * on accumulation order; rankings per term do not).
    *
    * Scale shape: one explode+count pass shuffles on (doc, term) — only
    * rows whose token IS a query term survive the map side, so shuffle
    * volume is bounded by query-term hits, not corpus tokens. Document
    * lengths take their own count pass (keyed by doc, map-side partials).
    * The per-term doc frequencies and the global (N, avgdl) frame are
    * term-count-sized / single-row and broadcast.
    */
  def bm25Terms(df: DataFrame, id: Column, text: Column,
                terms: Seq[String], k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Terms needs at least one query term")
    // tokens() lowercases the text, so the query terms must be folded the
    // same way — a mixed-case term would otherwise silently never match
    val folded = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val toks = df.select(id.as("doc_id"), explode(tokens(text)).as("__tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n_docs"),
      sum(col("__dl")).as("__tot_tokens"))
    val tf = toks.filter(col("__tok").isin(folded: _*))
      .groupBy(col("doc_id"), col("__tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__tot_tokens").cast("double") /
      col("__n_docs").cast("double")
    val sat = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") /
          col("__avgdl")))
    val idf = (col("__n_docs").cast("double") - col("__df").cast("double") +
      lit(0.5)) / (col("__df").cast("double") + lit(0.5)) + lit(1.0)
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", avgdl)
      .select(col("doc_id"), col("term"), col("tf"),
        (idf * sat).as("bm25"))
  }

  /** Document-level BM25 search: top-`k` documents for a multi-term query,
    * scored as the sum of [[bm25Terms]] per-term contributions. The float
    * sum is made engine-deterministic by pivoting the matched terms into
    * fixed columns and adding them in the query's written order — a
    * left-associated chain of IEEE additions both Spark and the SQL
    * oracle evaluate identically, instead of a `sum()` whose accumulation
    * order the engine chooses. `n_terms` counts how many query terms the
    * document matched (the AND-ness of the hit).
    *
    * Scale shape: per-term scoring is bm25Terms' posting pipeline (tf
    * rows only for matching tokens); the pivot is one aggregation keyed
    * by doc_id over ≤ |terms| rows per document; the final top-k plans as
    * TakeOrdered — no global sort materializes.
    */
  def bm25Search(df: DataFrame, id: Column, text: Column,
                 terms: Seq[String], k: Int = 10, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val folded = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    // pivot columns named by position, not term text — a term containing
    // '.' or '`' must not break column resolution
    def scol(i: Int) = s"__s_$i"
    val idx = folded.indices
    val wide = bm25Terms(df, id, text, terms, k1, b)
      .groupBy(col("doc_id"))
      .agg(max(when(col("term") === folded.head, col("bm25")))
             .as(scol(0)),
        idx.tail.map(i =>
          max(when(col("term") === folded(i), col("bm25"))).as(scol(i))): _*)
    val score = idx.map(i => coalesce(col(scol(i)), lit(0.0)))
      .reduce(_ + _)
    val nTerms = idx.map(i =>
      when(col(scol(i)).isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    wide.select(col("doc_id"), nTerms.as("n_terms"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Gopher-style composite quality rules (the Rae et al. 2021 filter
    * family, restated over whitespace tokens): per-document boolean flags
    * plus the conjunction `keep`. Every ratio is an exact integer→double
    * division, so flags and ratios are bit-identical across engines.
    *
    *  - `words_ok`:    token count within [minWords, maxWords]
    *  - `word_len_ok`: mean token length within [3, 10]
    *  - `alpha_ok`:    > 80% of tokens contain a letter
    *  - `symbol_ok`:   `#`/ellipsis occurrences < 10% of tokens
    *  - `stop_ok`:     at least 2 distinct common-stopword hits
    *
    * Pure per-row Column expressions — map-side, zero shuffles, stays in
    * whole-stage codegen at any corpus size.
    */
  def gopherFlags(df: DataFrame, id: Column, text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  stopwords: Seq[String] = gopherStopwords): DataFrame = {
    require(stopwords.nonEmpty, "stopword presence rule needs a word list")
    val toks = tokens(text)
    val nWords = size(toks)
    val meanLen = length(concat_ws("", toks)).cast("double") /
      nWords.cast("double")
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      nWords.cast("double")
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = (length(text) -
      length(replace(text, lit("..."), lit("")))) / lit(3)
    val symbolRatio = (hashes + ellipses).cast("double") / nWords.cast("double")
    val stopHits = size(array_intersect(toks,
      array(stopwords.map(lit): _*)))
    df.select(id.as("doc_id"), nWords.cast("long").as("n_words"),
        meanLen.as("mean_word_len"), alphaFrac.as("alpha_frac"),
        symbolRatio.as("symbol_ratio"), stopHits.cast("long").as("stop_hits"))
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("word_len_ok",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("alpha_ok", col("alpha_frac") > 0.8)
      .withColumn("symbol_ok", col("symbol_ratio") < 0.1)
      .withColumn("stop_ok", col("stop_hits") >= 2)
      .withColumn("keep", col("words_ok") && col("word_len_ok") &&
        col("alpha_ok") && col("symbol_ok") && col("stop_ok"))
  }

  /** The Gopher rule's "must contain common English words" default list —
    * swap per corpus/language ([[gopherFlags]]'s `stopwords` param): the
    * rule's intent is "contains the corpus' everyday words", and a list
    * foreign to the corpus degenerates into drop-everything.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Full per-document analysis frame over (id, text). */
  def analyze(df: DataFrame, id: Column, text: Column): DataFrame = {
    val f = qualityFeatures(text)
    df.select(
      id.as("doc_id"),
      tokenCount(text).as("n_tokens"),
      subwordCount(text).as("n_subwords"),
      round(f("distinct_ratio"), 4).as("distinct_ratio"),
      round(f("alpha_ratio"), 4).as("alpha_ratio"),
      round(qualityScore(text), 4).as("quality"),
      detectLanguage(text).as("lang_pred"),
      fingerprint(text).as("fingerprint"))
  }

  /** Per-document shingle coverage against a reference corpus: what
    * fraction of a doc's distinct n-gram shingles already appear in the
    * reference — the "how much of this is known content / boilerplate"
    * readout. Decontamination's machinery (q66) pointed at SCORING
    * instead of flagging: thresholding `coverage` recovers a
    * contamination filter, but the ratio itself feeds curation decisions
    * (dedup-adjacent down-weighting, novelty-aware mixing).
    *
    * Scale shape: the reference collapses to DISTINCT shingle hashes
    * (8 bytes/row) once, the corpus posting stream left-joins it on the
    * hash — broadcast when the reference fits, shuffle otherwise, and
    * the bloom-prefilter idiom ([[graft.ops.Dedup.contaminationFlagsBloom]])
    * drops non-matching postings before the shuffle when it doesn't.
    * Docs shorter than `n` tokens have no shingles and are omitted (the
    * empty-evidence row q66 also omits).
    */
  /** Corpus novelty per ingest batch: for each batch (an integer ingest
    * generation — crawl snapshot, source wave, date partition), what
    * fraction of its DISTINCT n-gram shingles was never seen in any
    * EARLIER batch. The freshness curve a continuously-fed training
    * pipeline watches: novelty decaying toward zero means new ingest is
    * re-crawling known content and the marginal data buys nothing.
    *
    * Scale shape: shingles hash to 8 bytes and dedupe per (batch, hash)
    * — one distinct over the posting stream, the only row-grain shuffle.
    * `min(batch)` per hash is a second aggregation ON the deduped frame,
    * and both readouts are COUNTS off those frames (postings per batch;
    * first-appearances per batch), joined batch-to-batch at result size.
    * No posting-to-posting join anywhere — unlike [[coverageScore]],
    * which scores docs and must carry doc ids, batch grain collapses
    * before anything joins.
    *
    * All-integer until the final rounded division. Docs shorter than `n`
    * tokens contribute no shingles (coverageScore's rule); a batch whose
    * docs are all short simply has no row.
    */
  def shingleNovelty(corpus: DataFrame, batch: Column, text: Column,
                     n: Int = 3): DataFrame = {
    import graft.functions.wordShingles
    val post = Dedup.spread(corpus)
      .select(batch.as("batch"), explode(wordShingles(text, n)).as("__s"))
      .select(col("batch"), xxhash64(col("__s")).as("__h"))
      .distinct()
    val perBatch = post.groupBy(col("batch"))
      .agg(count(lit(1)).as("n_shingles"))
    val novel = post.groupBy(col("__h")).agg(min(col("batch")).as("__fb"))
      .groupBy(col("__fb").as("batch")).agg(count(lit(1)).as("n_novel"))
    perBatch.join(novel, Seq("batch"), "left")
      .select(col("batch"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_shingles").cast("double"), 6).as("novelty"))
  }

  def coverageScore(corpus: DataFrame, id: Column, text: Column,
                    reference: DataFrame, refText: Column,
                    n: Int = 3): DataFrame = {
    import graft.functions.wordShingles
    val refSet = Dedup.spread(reference)
      .select(explode(wordShingles(refText, n)).as("__s"))
      .select(xxhash64(col("__s")).as("__h")).distinct()
      .withColumn("__known", lit(1L))
    Dedup.spread(corpus)
      .select(id.as("doc_id"), explode(wordShingles(text, n)).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("__h"))
      .dropDuplicates("doc_id", "__h")
      .join(refSet, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("__known")), lit(0L)).as("n_known"))
      .withColumn("coverage", round(col("n_known").cast("double") /
        col("n_shingles").cast("double"), 6))
  }

  /** Corpus-level token co-occurrence PMI — the word-embedding training
    * signal (word2vec/GloVe consume exactly these document-cooccurrence
    * statistics): for token pairs appearing together in ≥ `minSupport`
    * documents, PMI = ln(n_ab·N / (n_a·n_b)) where n_a/n_b are document
    * frequencies and N the corpus document count. Returns
    * (token_a, token_b, n_ab, n_a, n_b, pmi), token_a < token_b.
    *
    * Scale shape: pairs are generated MAP-SIDE per document (sorted
    * distinct token array, nested `transform` over index sequences —
    * codegen'd, no self-join carrying the corpus through a doc_id
    * shuffle), so the only row-grain shuffles are the pair-count and
    * doc-frequency aggregations, both with map-side combine. The d²/2
    * per-doc blowup is bounded CPU (d = distinct tokens per doc), the
    * right cost to pay locally. Frequency joins are key-shuffles on the
    * already support-filtered pair set — broadcast-free (a corpus
    * vocabulary does not fit in a broadcast at 100 TB).
    *
    * Determinism: counts are exact integers; the PMI ratio goes through
    * the q135 DECIMAL-product idiom before one double division and one
    * `ln` — the identical expression tree the oracle computes, so
    * round-6 output matches across engines.
    */
  def tokenPmi(df: DataFrame, id: Column, text: Column,
               minSupport: Long = 5L): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    val toks = Dedup.spread(df)
      .select(id.as("__id"), array_sort(array_distinct(tokens(text))).as("__tk"))
      .localCheckpoint() // feeds pair explode, doc-freqs, and the N scalar
    val nDocs = toks.count()
    val n = size(col("__tk"))
    // sequence(a, b) DESCENDS when a > b, so guard the short-doc case
    val pairsCol = when(n >= 2,
      flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, n - 1), j =>
          struct(element_at(col("__tk"), i + 1).as("token_a"),
            element_at(col("__tk"), j + 1).as("token_b"))))))
      .otherwise(array().cast("array<struct<token_a:string,token_b:string>>"))
    val pairCounts = toks.select(explode(pairsCol).as("__p"))
      .select(col("__p.token_a"), col("__p.token_b"))
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val docFreq = toks.select(explode(col("__tk")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    pairCounts
      .join(docFreq.select(col("__t").as("token_a"), col("__n").as("n_a")),
        Seq("token_a"))
      .join(docFreq.select(col("__t").as("token_b"), col("__n").as("n_b")),
        Seq("token_b"))
      .select(col("token_a"), col("token_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        log((col("n_ab").cast("decimal(19,0)") * lit(nDocs)).cast("double") /
          (col("n_a").cast("decimal(19,0)") * col("n_b")).cast("double"))
          .as("pmi"))
  }

  /** Skip-gram co-occurrence PMI — [[tokenPmi]]'s POSITIONAL sibling and
    * the literal word2vec training signal: unordered token pairs within
    * a ±`window` token distance, scored as
    * PMI = ln(n_ab·Nt² / (Np·n_a·n_b)) where n_a/n_b are corpus token
    * OCCURRENCE counts, Nt the total token count and Np the total pair
    * count (so n_ab/Np and n_a/Nt are the empirical pair/unigram
    * probabilities). Returns (token_a, token_b, n_ab, n_a, n_b, pmi),
    * token_a ≤ token_b.
    *
    * Scale shape: pairs come from `window` zip_with'd array slices per
    * document — map-side, codegen'd, no positional self-join — then one
    * counting shuffle with map-side combine; the unigram counts are a
    * second one-shuffle aggregation of the same token arrays. Products
    * in the PMI ratio go through DECIMAL(38,0) (exact to 10³⁸, far past
    * any feasible n_ab·Nt²), then one double division and one `ln` —
    * the oracle's identical expression tree.
    */
  def skipgramPmi(df: DataFrame, text: Column, window: Int = 2,
                  minSupport: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    val toks = Dedup.spread(df).select(tokens(text).as("__t"))
      .localCheckpoint() // feeds pair counts, unigram counts, both scalars
    val n = size(col("__t"))
    val pairArrays = (1 to window).map { k =>
      zip_with(
        slice(col("__t"), lit(1), greatest(n - k, lit(0))),
        slice(col("__t"), lit(1 + k), greatest(n - k, lit(0))),
        (a, b) => struct(least(a, b).as("token_a"),
          greatest(a, b).as("token_b")))
    }
    val prs = toks.filter(n >= 2)
      .select(explode(concat(pairArrays: _*)).as("__p"))
      .select(col("__p.token_a"), col("__p.token_b"))
      .localCheckpoint() // counted per pair AND folded to the Np scalar
    val nPairs = prs.count()
    val uni = toks.select(explode(col("__t")).as("__w"))
      .localCheckpoint()
    val nTokens = uni.count()
    val uniCounts = uni.groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val pairCounts = prs.groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairCounts
      .join(uniCounts.select(col("__w").as("token_a"), col("__n").as("n_a")),
        Seq("token_a"))
      .join(uniCounts.select(col("__w").as("token_b"), col("__n").as("n_b")),
        Seq("token_b"))
      .select(col("token_a"), col("token_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        log((col("n_ab").cast("decimal(38,0)") * lit(nTokens) * lit(nTokens))
            .cast("double") /
          (col("n_a").cast("decimal(38,0)") * col("n_b") * lit(nPairs))
            .cast("double")).as("pmi"))
  }

  /** Pairwise corpus-overlap matrix between ingest groups (sources,
    * snapshots, providers): for every group pair WITH AT LEAST ONE SHARED
    * shingle, the count of shared distinct word `n`-gram shingles and the
    * Jaccard overlap of the two shingle sets — the "which of my sources
    * duplicate each other" procurement readout, q156's novelty curve
    * resolved to pairs. Fully-disjoint pairs are NOT emitted (the inner
    * join on shingle drops them); a caller wanting the zero rows
    * full-outer-joins this against the group-pair universe.
    * Returns (group_a, group_b, n_shared, n_a, n_b, jaccard), a < b,
    * n_shared ≥ 1.
    *
    * Scale shape: one distinct (shingle, group) posting build, a
    * self equi-join ON SHINGLE whose per-key fanout is bounded by the
    * GROUP count (≤ |groups| rows per shingle — sources number in the
    * tens, so the join is |postings|·|groups|-bounded by construction,
    * no df-cap needed where containmentPairs at doc grain needs one),
    * and two broadcast joins of the |groups|-row size frame. Jaccard =
    * shared/(n_a + n_b − shared), one integer-fed division.
    */
  def sourceOverlap(df: DataFrame, group: Column, text: Column,
                    n: Int = 3): DataFrame = {
    import graft.functions.wordShingles
    val postings = Dedup.spread(df)
      .select(group.as("__g"), explode(wordShingles(text, n)).as("__s"))
      .distinct()
      .localCheckpoint() // feeds the pair join and the per-group sizes
    val sizes = postings.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val shared = postings.select(col("__s"), col("__g").as("group_a"))
      .join(postings.select(col("__s"), col("__g").as("group_b")), Seq("__s"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("__g").as("group_a"),
        col("__n").as("n_a"))), Seq("group_a"))
      .join(broadcast(sizes.select(col("__g").as("group_b"),
        col("__n").as("n_b"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Per-document Shannon entropy of the token distribution (nats):
    * H = ln(n) − (Σ c·ln c)/n over per-token occurrence counts c — the
    * repetitiveness readout a curation pass reads alongside q73
    * (entropy near 0 = one token dominates; near ln(distinct) = flat).
    * Returns (doc_id, n_tokens, n_distinct, entropy).
    *
    * Determinism: c·ln(c) terms are rounded to 9 decimals and summed in
    * DECIMAL (the q149/q161 round-9 → decimal-sum idiom — the sum is
    * order-independent), then one division and subtraction; ln on small
    * integer counts is the q160-established libm-parity surface.
    * Scale shape: one token explode + per-(doc, token) count + per-doc
    * fold — all map-side-combinable aggregations, no joins.
    */
  def tokenEntropy(df: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.spread(df)
      .select(id.as("doc_id"), explode(tokens(text)).as("__tok"))
      .groupBy(col("doc_id"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("__c").cast("double") * log(col("__c").cast("double")),
          9).cast("decimal(28,12)")).as("__clc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens").cast("double")) -
          col("__clc").cast("double") / col("n_tokens").cast("double"), 6)
          .as("entropy"))

  /** One BPE merge applied to a (doc_id, token-array) frame: every
    * non-overlapping left-to-right occurrence of the adjacent pair
    * (a, b) becomes the single token "a b" — the REWRITE half of a
    * BPE tokenizer-training round ([[SparkEntry]] q151 mines the top
    * pair; q207 drives the full loop). The merged token joins with a
    * space, which no whitespace-split token can contain, so merged
    * tokens never collide with originals and re-merging composes
    * ("a b" + c → "a b c").
    *
    * The fold is a per-row `aggregate` higher-order function carrying
    * (emitted-prefix, pending-token): pending=a followed by b emits the
    * merged token and CLEARS pending — that consume step is what makes
    * "a a a" merge once, not twice (left-to-right non-overlap, the BPE
    * contract). Map-side, no shuffle; the lambda is interpreted (the
    * documented HOF trade-off — acceptable here because the fold is the
    * semantics, not a hot hash loop). The differential oracle replays
    * the identical fold as a per-document linear recursive CTE.
    */
  def bpeMergeOnce(toks: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + " " + b
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val folded = aggregate(
      col("tk"), zero,
      (acc, x) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        val hit = pend === lit(a) && x === lit(b)
        struct(
          when(hit, concat(out, array(lit(merged))))
            .when(pend.isNull, out)
            .otherwise(concat(out, array(pend))).as("out"),
          when(hit, lit(null).cast("string")).otherwise(x).as("pend"))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
    toks.withColumn("tk", folded)
  }

  /** Zipf rank–frequency fit: least-squares slope of ln(freq) on
    * ln(rank) over the corpus unigram distribution — THE one-number
    * language-corpus health check (natural text sits near −1; a slope
    * far off flags synthetic, boilerplate-heavy, or truncated-vocab
    * corpora before training does). Returns one row
    * (n_types, n_tokens, slope, intercept).
    *
    * Determinism: ranks come from the repo's (freq desc, token asc)
    * total order; the four regression sums run the round-9 →
    * decimal-sum idiom (ln terms rounded to 9dp, summed exactly), and
    * slope/intercept are one IEEE tree.
    *
    * Scale shape (round-7 rewrite): NO unpartitioned window — "Zipf-
    * small" vocab is still ~10⁸ types on a 100 TB corpus, and the old
    * global `row_number` serialized it through one task's sort. The rank
    * now comes from [[graft.ops.Eval.globalRank]]'s banded prefix device
    * over (−freq asc, hash(token) asc, token asc): the readout is RANK-
    * MULTISET-invariant within a freq tie (y = ln f is constant there,
    * so Σln r, Σln²r, ln f·Σln r are the only rank terms), which is
    * exactly the contract globalRank keeps under a hashed tie column —
    * and the token itself rides as the in-window extra tiebreaker so
    * even per-row ranks stay the total order's. One vocab aggregation,
    * the banded rank passes, one scalar fold; PlanSpec pins the shape.
    */
  def zipfFit(df: DataFrame, text: Column): DataFrame = {
    val ranked = graft.ops.Eval.globalRank(
        Dedup.spread(df)
          .select(explode(tokens(text)).as("__tok"))
          .groupBy(col("__tok")).agg(count(lit(1)).as("__f")),
        -col("__f"), xxhash64(col("__tok")), col("__tok"))
      .select(log(col("__rank").cast("double")).as("__x"),
        log(col("__f").cast("double")).as("__y"), col("__f"))
    def s9(c: Column) = sum(round(c, 9).cast("decimal(28,12)")).cast("double")
    val n = count(lit(1)).cast("double")
    ranked
      .agg(count(lit(1)).as("n_types"), sum(col("__f")).as("n_tokens"),
        n.as("__n"), s9(col("__x")).as("__sx"), s9(col("__y")).as("__sy"),
        s9(col("__x") * col("__x")).as("__sxx"),
        s9(col("__x") * col("__y")).as("__sxy"))
      .select(col("n_types"), col("n_tokens"),
        Readout.rdz((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("slope"),
        Readout.rdz((col("__sy") - col("__sx") *
            ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
             (col("__n") * col("__sxx") - col("__sx") * col("__sx")))) /
          col("__n"), 6).as("intercept"))
  }

  /** Rare-token scoring — the unigram-LM-proxy curation filter: per
    * document, the fraction of token OCCURRENCES whose corpus-wide
    * frequency share is below 1/`shareDenom` (token is "rare" ⟺
    * f·shareDenom < total occurrences). High rare-ratio documents are
    * OOV-heavy — garbled text, codes, boilerplate IDs — exactly what a
    * perplexity filter drops, without the cross-engine float hazard of a
    * real log-prob (the rarity test is one INTEGER comparison, so the
    * gate is exact and the threshold scales with corpus size instead of
    * breaking on absolute counts). Returns
    * (doc_id, n_tokens, n_rare, rare_ratio).
    *
    * Scale shape: one token explode, one vocab aggregation, one
    * token-grain equi-join (vocab side is Zipf-small — broadcast-able;
    * AQE decides), one per-doc fold. The corpus-total scalar rides in as
    * a broadcast one-row frame, the repo's standard device.
    */
  def rareTokenRatio(df: DataFrame, id: Column, text: Column,
                     shareDenom: Long = 64L): DataFrame = {
    require(shareDenom >= 1L, s"shareDenom must be >= 1, got $shareDenom")
    val toks = Dedup.spread(df)
      .select(id.as("doc_id"), explode(tokens(text)).as("__tok"))
      .localCheckpoint() // feeds vocab counts, the total scalar, the join
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__f"))
    val total = toks.agg(count(lit(1)).as("__total"))
    toks.join(freq, Seq("__tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__f") * lit(shareDenom) < col("__total"), 1L)
          .otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        round(col("n_rare").cast("double") /
          col("n_tokens").cast("double"), 6).as("rare_ratio"))
  }

  /** Corpus-typicality scoring against the corpus' own unigram model —
    * the libm-free proxy for per-document LM likelihood a quality filter
    * ranks on: per document, the MEAN unigram probability of its tokens
    * (`Σ f(t)/N / n_tok` — high = everyday language, low = rare/garbled)
    * and the MINIMUM (the rarest token's probability — the "contains
    * apparently-random strings" tripwire). DELIBERATELY the arithmetic
    * mean of probabilities, not the geometric mean a log-likelihood
    * implies: `log` is banned from gate paths (libm divergence,
    * q106's measurement), and the arithmetic mean ranks typicality with
    * the same intent while staying a pure rational-arithmetic readout.
    * Returns (doc_id, n_tokens, mean_prob, min_prob).
    *
    * Determinism: each probability is one integer-fed IEEE division;
    * per-doc sums ride round-9 → decimal (order-free); min is order-free.
    * Scale shape: one vocab-grain count, one token→frequency join
    * co-partitioned on the token, one doc-grain fold — rareTokenRatio's
    * plan with a probability payload.
    */
  def unigramLmScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.spread(df)
      .select(id.as("doc_id"), explode(tokens(text)).as("__tok"))
      .localCheckpoint() // feeds vocab counts, the total scalar, the join
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__f"))
    val total = toks.agg(count(lit(1)).as("__total"))
    val prob = col("__f").cast("double") / col("__total").cast("double")
    toks.join(freq, Seq("__tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(round(prob, 9).cast("decimal(28,12)")).as("__ps"),
        min(col("__f")).as("__minf"), max(col("__total")).as("__N"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__ps").cast("double") / col("n_tokens").cast("double"), 6)
          .as("mean_prob"),
        round(col("__minf").cast("double") / col("__N").cast("double"), 6)
          .as("min_prob"))
  }

  /** HTML → trimmed visible-text lines: script and style elements are
    * removed whole (content included), every remaining tag becomes a
    * line break, lines are trimmed and empties dropped. RE2-common
    * regexes only (no backreferences, no lookarounds) so the exact
    * pipeline replays in any engine — the crawl-processing front door
    * ahead of every quality/dedup op in this file. Pure per-row map
    * work: no shuffle, codegen'd end to end.
    */
  def htmlVisibleLines(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", "")
    val untag = regexp_replace(noStyle, "<[^>]*>", "\n")
    filter(transform(split(untag, "\n"), x => trim(x)), x => x =!= "")
  }

  /** Boilerplate-stripping main-content extraction over an HTML column —
    * the jusText/trafilatura-shaped rule set reduced to its deterministic
    * core: a visible line is KEPT as content when it has at least
    * `minWords` words and none of the boilerplate tells (link-list pipes,
    * copyright marks) — short nav rows, footers, and "read more" stubs
    * drop; running prose survives. Returns per document the visible-line
    * count, kept-line count, and the extracted main text (kept lines
    * joined by a single space) — the text column every downstream
    * dedup/LM/quality op in this engine would consume. Map-side only.
    */
  def htmlExtract(df: DataFrame, id: Column, html: Column,
                  minWords: Int = 5): DataFrame =
    Dedup.spread(df)
      .select(id.as("doc_id"), htmlVisibleLines(html).as("__vis"))
      .withColumn("__kept", filter(col("__vis"), x =>
        !x.contains("|") && !x.contains("©") &&
          size(split(x, "\\s+")) >= minWords))
      .select(col("doc_id"), size(col("__vis")).as("n_lines"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("main_text"))

  /** CCNet-style bigram-LM typicality scoring — the quality filter one
    * rung above [[unigramLmScore]]: each document is scored by how
    * predictable its word SEQUENCE is under the corpus' own add-one-
    * smoothed bigram model, `p(b|a) = (c(a,b)+1) / (c(a·)+V)`. Garbled
    * or shuffled text has common WORDS in impossible ORDER — exactly
    * what the unigram score cannot see and the bigram mean collapses
    * on; `min_p` is the single-most-surprising transition (the
    * "sentence glued from two documents" tripwire). As with the whole
    * LM family, DELIBERATELY the arithmetic mean of probabilities, not
    * log-perplexity: `log` is banned from gate paths (libm divergence,
    * q106's measurement) and the rational form ranks with the same
    * intent in exactly replayable IEEE arithmetic.
    *
    * Determinism: all counts are exact integers; each probability is
    * one integer-fed IEEE division rounded at 9; per-doc sums ride
    * decimal (order-free); min is order-free.
    * Scale shape: bigrams are a MAP-SIDE `zip_with` over each doc's
    * own token array (no position self-join, no window); the model is
    * one bigram-grain count (c1 derives from c2 — no second corpus
    * pass), scoring is one bigram-grain equi-join + one prefix-grain
    * equi-join (both co-partitioned on their keys) + a broadcast
    * one-row vocabulary scalar, then a doc-grain fold. Documents with
    * fewer than two tokens have no transitions and are excluded.
    * Returns (doc_id, n_bigrams, mean_p, min_p).
    */
  def bigramLmScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val arr = tokens(text)
    val big = Dedup.spread(df)
      .select(id.as("doc_id"), arr.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("doc_id"), col("__bg.w1").as("__w1"),
        col("__bg.w2").as("__w2"))
      .localCheckpoint() // feeds c2, (through it) c1, and the scoring join
    val c2 = big.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c2"))
      .localCheckpoint() // feeds c1 and the join
    val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val vocab = Dedup.spread(df)
      .select(explode(tokens(text)).as("__tok"))
      .agg(countDistinct(col("__tok")).as("__V"))
    val p = round((col("__c2") + lit(1L)).cast("double") /
      (col("__c1") + col("__V")).cast("double"), 9)
    big.join(c2, Seq("__w1", "__w2"))
      .join(c1, Seq("__w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(p.cast("decimal(28,12)")).as("__ps"),
        min(p).as("__minp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__ps").cast("double") /
          col("n_bigrams").cast("double"), 6).as("mean_p"),
        round(col("__minp"), 6).as("min_p"))
  }

  /** DSIR-style importance weights — "which documents LOOK like the
    * target domain": per document, the mean over its tokens of the
    * smoothed unigram-probability RATIO between a target sub-corpus
    * (rows where `target` is true) and the whole corpus,
    * `r(t) = ((f_tgt(t)+1)·(N_all+V)) / ((f_all(t)+1)·(N_tgt+V))`
    * (add-one smoothing over the shared vocabulary V). High importance =
    * the doc's tokens are over-represented in the target domain — the
    * data-selection score DSIR resamples by. DELIBERATELY the arithmetic
    * mean of probability ratios, not the log-likelihood ratio the paper
    * writes: `log` is banned from gate paths (q106's libm measurement,
    * [[unigramLmScore]]'s same trade), and the rational form ranks with
    * the same intent while staying integer-fed IEEE arithmetic any
    * engine replays exactly.
    *
    * Determinism: counts are exact integers; each ratio is a fixed
    * 4-node IEEE tree over integer-valued doubles; per-doc sums ride
    * round-9 → decimal (order-free); readout rounds at 6.
    * Scale shape: one vocab-grain aggregation carrying both counts (the
    * target count is a conditional sum in the SAME pass — no second
    * shuffle), one token→frequency equi-join co-partitioned on the
    * token, one broadcast one-row totals frame, one doc-grain fold —
    * [[unigramLmScore]]'s plan with a second payload column. Returns
    * (doc_id, n_tokens, importance).
    */
  def importanceWeights(df: DataFrame, id: Column, text: Column,
                        target: Column): DataFrame = {
    val toks = Dedup.spread(df)
      .select(id.as("doc_id"),
        when(target, lit(1L)).otherwise(lit(0L)).as("__tgt"),
        explode(tokens(text)).as("__tok"))
      .localCheckpoint() // feeds the vocab counts, the totals, the join
    val freq = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__fa"), sum(col("__tgt")).as("__ft"))
    val tot = freq.agg(sum(col("__fa")).as("__na"),
      sum(col("__ft")).as("__nt"), count(lit(1)).as("__v"))
    val ratio =
      ((col("__ft") + lit(1L)).cast("double") *
        (col("__na") + col("__v")).cast("double")) /
      ((col("__fa") + lit(1L)).cast("double") *
        (col("__nt") + col("__v")).cast("double"))
    toks.join(freq, Seq("__tok"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(round(ratio, 9).cast("decimal(28,12)")).as("__rs"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__rs").cast("double") / col("n_tokens").cast("double"), 6)
          .as("importance"))
  }

  /** Content-defined chunking — sub-document dedup grain: a chunk
    * boundary falls AFTER position i wherever the hash of the last
    * `window` characters lands on 0 mod `modulus` (expected chunk length
    * ≈ modulus; the document end always closes the final chunk). Because
    * boundaries depend only on LOCAL content, an insertion early in a
    * document shifts every byte offset but re-synchronizes the chunk
    * stream right after the edit — the property that lets chunk-grain
    * dedup catch shared boilerplate exact dedup misses (the rsync/LBFS
    * idea at corpus scale). Returns one row per chunk:
    * (doc_id, chunk_idx ∈ 1.., start, chunk_len, chunk_hash).
    *
    * The boundary hash is the repo's md5 position draw over the WINDOWED
    * substring — not a gear/Rabin ROLLING hash: same content-defined
    * semantics, O(len·window) instead of O(len) per document, and — the
    * reason it wins here — exactly replayable by any engine with md5 and
    * substring, so the whole chunk stream is oracle-gateable. A
    * production swap-in of a gear hash changes ONLY the boundary
    * predicate; the row shape and everything downstream stay.
    *
    * Scale shape: one position explode (len rows per doc, map-side), the
    * boundary filter, one per-DOC window (lag over ≤ len/modulus
    * boundary rows — partitioned by doc, the q32 bound), one equi-join
    * back to the text for the chunk hash. Empty/null texts yield zero
    * chunks (the empty law). Characters, not bytes, in both engines.
    */
  def contentChunks(df: DataFrame, id: Column, text: Column,
                    window: Int = 16, modulus: Int = 64): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    import org.apache.spark.sql.expressions.Window
    val base = Dedup.spread(df)
      .select(id.as("doc_id"), text.as("__t"),
        length(text).cast("long").as("__len"))
      .filter(col("__len") > 0L)
      .localCheckpoint() // read by the boundary explode and the hash join
    val bounds = base
      .select(col("doc_id"), col("__len"),
        explode(sequence(lit(window.toLong), col("__len"))).as("__i"))
      .filter(Sampling.hashPos(lit("cdc"),
        col("__t").substr((col("__i") - lit(window - 1)).cast("int"),
          lit(window))) % modulus === 0L)
      .select(col("doc_id"), col("__i"))
      .unionByName(base.select(col("doc_id"), col("__len").as("__i")))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__i").asc)
    bounds
      .withColumn("chunk_idx", row_number().over(w).cast("long"))
      .withColumn("start",
        coalesce(lag(col("__i"), 1).over(w), lit(0L)) + 1L)
      .withColumn("chunk_len", col("__i") - col("start") + 1L)
      .join(base.select(col("doc_id"), col("__t")), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        col("chunk_len"),
        md5(col("__t").substr(col("start").cast("int"),
          col("chunk_len").cast("int")).cast("binary")).as("chunk_hash"))
  }

  /** Luhn-validated payment-card scan — the PII detector the regex
    * family ([[piiRedact]]) cannot express: a 13–19 digit run is only a
    * card NUMBER if its Luhn checksum closes, which cuts the false-
    * positive rate on invoice/order/serial numbers by 10× (only 1 in 10
    * random digit runs pass). Returns one row per DISTINCT candidate
    * digit run per document: (doc_id, run, run_len, luhn_ok).
    *
    * The checksum is pure integer arithmetic replayed identically by
    * any engine: digits from the REVERSED run, odd positions doubled
    * with the classic −9 fold, valid iff the sum ≡ 0 (mod 10).
    *
    * Two contracts hardened in round 8 (an advisor found both; the
    * original gate replayed the same collapse and could not): (1) a
    * run repeated m times in one document is checksummed ONCE — the
    * per-occurrence explode is deduped to (doc, run) grain before the
    * position explode, else the m-fold sum flips validity whenever the
    * single-run sum ≡ k (mod 10) with m·k ≡ 0; (2) formatted card
    * numbers ("4111 1111 1111 1111", dashes likewise) are candidates —
    * a single space/dash BETWEEN digits is collapsed before the run
    * split. The collapse regex `([0-9])[ -]([0-9])` under a global
    * left-to-right non-overlapping scan (identical in Java regex and
    * RE2) closes every separator of multi-digit groups in one pass:
    * each separator keeps an unconsumed digit before it because its
    * group has ≥ 2 digits.
    *
    * Scale shape: one split-explode for candidate runs (map-side), one
    * position explode bounded by 19 digits per run, one run-grain
    * integer fold — no shuffle wider than the (doc, run) grain, no
    * window. Runs arrive via [[Dedup.spread]] so a single-file corpus
    * still fans out.
    */
  def luhnCardScan(df: DataFrame, id: Column, text: Column): DataFrame = {
    val runs = Dedup.spread(df)
      .select(id.as("doc_id"),
        explode(split(
          regexp_replace(text, "([0-9])[ -]([0-9])", "$1$2"),
          "[^0-9]+")).as("run"))
      .filter(length(col("run")).between(13, 19))
      .distinct()
    runs
      .withColumn("__i",
        explode(sequence(lit(0), length(col("run")) - 1)))
      .withColumn("__d",
        reverse(col("run")).substr(col("__i") + 1, lit(1)).cast("int"))
      .groupBy(col("doc_id"), col("run"))
      .agg(sum(when(col("__i") % 2 === 0, col("__d"))
        .otherwise(lit(2) * col("__d") -
          when(col("__d") > 4, 9).otherwise(0))).as("__tot"))
      .select(col("doc_id"), col("run"),
        length(col("run")).as("run_len"),
        (col("__tot") % 10 === 0).as("luhn_ok"))
  }

  /** Flesch reading-ease score, libm-free: 206.835 − 1.015·(words per
    * sentence) − 84.6·(syllable groups per word) — the readability
    * quality signal, with syllables approximated by [aeiouy]+ vowel
    * groups (the standard cheap proxy). Everything is integer counts
    * into two IEEE divisions, so both engines land the same bits;
    * rounded at 4.
    *
    * Counting contracts (identical in the oracle): words = non-empty
    * [a-z0-9]+ runs; sentences = non-blank [.!?]+-delimited segments
    * (min 1 — a fragment is one sentence); vowel groups are counted
    * with the marker device (existing '#' stripped first so original
    * text cannot inflate the count). Map-side expressions only.
    */
  def readability(df: DataFrame, id: Column, text: Column): DataFrame = {
    val words = size(filter(split(lower(text), "[^a-z0-9]+"),
      w => w =!= ""))
    val sents = greatest(
      size(filter(split(text, "[.!?]+"), s => trim(s) =!= "")), lit(1))
    val marked = regexp_replace(
      regexp_replace(lower(text), "#", ""), "[aeiouy]+", "#")
    val syll = length(marked) -
      length(regexp_replace(marked, "#", ""))
    df.select(id.as("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        syll.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(graft.Readout.round(
            lit(206.835d) -
              lit(1.015d) * (col("n_words").cast("double") /
                col("n_sentences").cast("double")) -
              lit(84.6d) * (col("n_syllables").cast("double") /
                col("n_words").cast("double")), 4)))
  }

  /** The mojibake tells [[encodingAnomalies]] counts by default: the
    * classic UTF-8-decoded-as-Latin-1 digraphs (á é ó ú ñ ç read as
    * 'Ã©' etc., smart quotes as 'â€™'/'â€œ') plus the NBSP artifact
    * 'Â '. All BMP characters, so the per-pattern length is the same
    * number in Spark (codepoints) and any replaying engine.
    */
  val MojibakePatterns: Seq[String] =
    Seq("Ã©", "Ã¡", "Ã³", "Ãº", "Ã±", "Ã§", "â€™", "â€œ", "Â ")

  /** Encoding-anomaly audit — the curation dimension every web-crawl
    * cleaner runs alongside language-ID and quality scoring (C4/CCNet
    * drop or repair these documents): per document, counts of U+FFFD
    * replacement characters (a decoder already gave up) and of
    * mojibake digraphs (UTF-8 bytes mis-decoded as Latin-1 — the 'Ã©'
    * family), their ratio over the character count, and a keep/drop
    * flag (ANY replacement char, or ratio above `flagRatio`).
    *
    * Counting is the replace-and-measure device (no regex needed):
    * occurrences(p) = (len(text) − len(replace(text, p, ''))) / len(p)
    * — pure codegen'd string expressions, exact integers, replayable
    * verbatim by any engine with len/replace. Map-side only: no
    * shuffle, no UDF, scales with the scan.
    */
  def encodingAnomalies(df: DataFrame, id: Column, text: Column,
                        flagRatio: Double = 0.001,
                        patterns: Seq[String] = MojibakePatterns)
      : DataFrame = {
    require(flagRatio >= 0.0, s"flagRatio must be >= 0, got $flagRatio")
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    def occurrences(p: String): Column =
      ((length(text) - length(replace(text, lit(p), lit("")))) /
        lit(p.length)).cast("long")
    val nRepl = occurrences("\uFFFD")
    val nMoji = patterns.map(occurrences).reduce(_ + _)
    df.select(id.as("doc_id"), length(text).as("n_chars"),
        nRepl.as("n_repl"), nMoji.as("n_moji"))
      .withColumn("bad_ratio",
        when(col("n_chars") > 0, graft.Readout.round(
          (col("n_repl") + col("n_moji")).cast("double") /
            col("n_chars").cast("double"), 6)).otherwise(lit(0.0d)))
      .withColumn("flagged",
        col("n_repl") > 0L || col("bad_ratio") > lit(flagRatio))
  }
}
