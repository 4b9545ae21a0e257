package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round
import graft.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Five flavors, in increasing fuzziness:
  *  - exact (hash-groupBy)
  *  - n-gram Jaccard (exact set similarity over word shingles)
  *  - MinHash + LSH (approximate Jaccard, scales to 100 TB: candidate
  *    generation is a bucketed equi-join, never an all-pairs product)
  *  - SimHash (Hamming-bucket near-dup)
  *  - embedding-cosine near-dup
  *
  * All are pure DataFrame/Column compositions (no UDFs) so each stays in
  * whole-stage codegen; every pairwise step is blocked/bucketed so the join
  * is an equi-join Catalyst can shuffle-partition by key.
  */
object Dedup {

  /** Spread a (possibly single-partition) input across the cluster before a
    * compute-bound stage. Small dimension-like parquet files arrive as one
    * partition; shingling/hashing them would otherwise run on one core —
    * at 100 TB the same guard keeps decode/hash stages balanced.
    */
  private[ops] def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd builds (and discards) the RDD lineage just to count
    // partitions, but it is the only honest probe: under AQE the physical
    // plan is an AdaptiveSparkPlanExec whose outputPartitioning is
    // UnknownPartitioning(0) before execution, so reading it would claim
    // n=0 and force an unconditional repartition of every input
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism)
    else df
  }

  /** Exact dedup: keep one representative (min of `idCol`) per distinct
    * value of `on`. A single hash aggregate — at scale this is one shuffle
    * on the (hashed) dedup key.
    */
  def exact(df: DataFrame, on: Column, idCol: Column,
            carry: Seq[(String, Column)] = Nil): DataFrame = {
    val aggs = min(idCol).as("keep_id") +:
      carry.map { case (n, c) => min(c).as(n) }
    df.groupBy(on.as("dedup_key"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Exact content-hash dedup: group by md5 of the content column; emit one
    * row per group with the representative id and the group size.
    */
  def exactByHash(df: DataFrame, content: Column, idCol: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Blocked fuzzy entity match (record linkage): near-identical KEY
    * values (names, titles, addresses) paired by edit distance, the
    * canonical-entity step exact dedup can't do. Two stages, the standard
    * blocking recipe: (1) collapse to DISTINCT key grain with occurrence
    * counts — the match decision is per key string, so row-grain
    * duplicates must not multiply the pair space; (2) a self equi-join on
    * `blockKey` (first token, soundex, prefix — caller's choice) with the
    * codegen'd `levenshtein` verify inside the join. Returns
    * (key_a, key_b, dist, n_a, n_b), a < b, dist ≤ maxDist.
    *
    * Scale shape: candidate volume is Σ block² at DISTINCT-KEY grain —
    * typically orders of magnitude below row grain (80 distinct names
    * across 2M rows ⇒ the join touches 80 rows). The verify is a scalar
    * expression in the join condition, so Catalyst evaluates it post-hash-
    * match without materializing rejected pairs. Both engines implement
    * classic unit-cost Levenshtein — integer-exact, no float divergence.
    */
  def fuzzyMatchBlocked(df: DataFrame, key: Column, blockKey: Column,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val keys = df.groupBy(key.as("__key"), blockKey.as("__blk"))
      .agg(count(lit(1)).as("__n"))
    val a = keys.select(col("__blk"), col("__key").as("key_a"),
      col("__n").as("n_a"))
    val b = keys.select(col("__blk"), col("__key").as("key_b"),
      col("__n").as("n_b"))
    a.join(b, Seq("__blk"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("dist"), col("n_a"), col("n_b"))
  }

  /** Exact n-gram Jaccard similarity join, blocked by `blockCols` so the
    * pair space is bounded per block (at 100 TB you always block — by
    * source, language, length band, or an LSH bucket).
    *
    * Returns pairs (id_a < id_b) with their exact shingle-set Jaccard.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        blockCols: Seq[Column], n: Int = 3,
                        minJaccard: Double = 0.0,
                        hashedShingles: Boolean = false): DataFrame = {
    // hashedShingles: carry 64-bit shingle hashes instead of strings
    // through the pairwise join — same jaccard modulo ~1e-14 collisions,
    // several-fold less allocation per candidate pair. Built relationally
    // (explode + codegen'd xxhash64 + collect_set): nested higher-order
    // lambdas are interpreted and ~3x slower.
    val blockKeys = blockCols.indices.map(i => s"__b$i")
    val base =
      if (hashedShingles)
        spread(df).select(
          (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") } :+
            // explode_outer keeps shingle-less docs as an empty set,
            // matching the string path's semantics
            id.as("__id") :+ explode_outer(wordShingles(text, n)).as("__x")): _*)
          .groupBy((blockKeys :+ "__id").map(col): _*)
          // xxhash64(null) is the seed, not null — guard so collect_set
          // skips the explode_outer placeholder and the set stays empty
          .agg(collect_set(when(col("__x").isNotNull,
            xxhash64(col("__x")))).as("__sh"))
      else
        spread(df).select(
          (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") } :+
            id.as("__id") :+ shingleSet(text, n).as("__sh")): _*)
    val a = base.toDF(base.columns.map(_ + "_a").toIndexedSeq: _*)
    val b = base.toDF(base.columns.map(_ + "_b").toIndexedSeq: _*)
    val joinCond = blockKeys.map(k => a(k + "_a") === b(k + "_b"))
      .reduce(_ && _) && (a("__id_a") < b("__id_b"))
    a.join(b, joinCond)
      .select(col("__id_a").as("id_a"), col("__id_b").as("id_b"),
        jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Inverted-index formulation of the exact n-gram Jaccard join: explode
    * shingles, equi-join postings on (block, shingle), count shared shingles
    * per pair, then `jaccard = inter / (|A| + |B| - inter)`.
    *
    * Identical similarity values to [[ngramJaccardPairs]] for every pair
    * with at least one shared shingle (zero-overlap pairs are absent rather
    * than scored 0). Crossover: with small blocks (tens of docs) the dense
    * blocked join is faster; with large blocks the posting join wins —
    * pairs shuffle as (ids, count) instead of two full shingle arrays, and
    * the (block, shingle) key spreads hot blocks across the cluster.
    */
  def ngramJaccardPairsInverted(df: DataFrame, id: Column, text: Column,
                                blockCols: Seq[Column], n: Int = 3,
                                minJaccard: Double = 0.0): DataFrame = {
    val bk = blockCols.indices.map(i => s"__b$i")
    val base = spread(df).select(
      (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") } :+
        id.as("__id") :+ shingleSet(text, n).as("__sh")): _*)
      .filter(size(col("__sh")) > 0)
    val sizes = base.select(col("__id"), size(col("__sh")).as("__n"))
    val postings = base.select(
      (bk.map(col) :+ col("__id") :+ explode(col("__sh")).as("__s")): _*)
    val a = postings.toDF((bk.map(_ + "_k") :+ "id_a" :+ "__s").toIndexedSeq: _*)
    val b = postings.toDF((bk.map(_ + "_k") :+ "id_b" :+ "__s").toIndexedSeq: _*)
    val inter = a.join(b, (bk.map(_ + "_k") :+ "__s").toIndexedSeq)
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast("double") /
          (col("__na") + col("__nb") - col("__inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Split a blocked corpus into (small-block rows, large-block rows) by
    * per-block document count — the routing decision for
    * [[ngramJaccardPairsAuto]], exposed so the switch is testable. Input is
    * normalized to (__b0.., __id, __text); the size join is null-safe so
    * null-keyed blocks route like any other (they produce no pairs either
    * way, but must not vanish from the accounting).
    */
  private[graft] def routeBlocksBySize(df: DataFrame, id: Column, text: Column,
                                       blockCols: Seq[Column],
                                       denseMaxBlock: Long): (DataFrame, DataFrame) = {
    val bk = blockCols.indices.map(i => s"__b$i")
    val keyed = df.select(
      (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") } :+
        id.as("__id") :+ text.as("__text")): _*)
    val sizes = keyed.groupBy(bk.map(col): _*).agg(count(lit(1)).as("__bn"))
      .toDF((bk.map(_ + "_s") :+ "__bn").toIndexedSeq: _*)
    val cond = bk.map(k => keyed(k) <=> col(k + "_s")).reduce(_ && _)
    val flagged = keyed.join(sizes, cond).drop(bk.map(_ + "_s"): _*)
    (flagged.filter(col("__bn") <= denseMaxBlock).drop("__bn"),
      flagged.filter(col("__bn") > denseMaxBlock).drop("__bn"))
  }

  /** Exact n-gram Jaccard pairs with the formulation chosen PER BLOCK from
    * the block's document count: blocks of ≤ `denseMaxBlock` docs take the
    * dense blocked self-join ([[ngramJaccardPairs]] — quadratic in block
    * size but join-local, fastest when the pair space is tiny), larger
    * blocks take the inverted-index posting join
    * ([[ngramJaccardPairsInverted]] — pairs shuffle as (ids, count) instead
    * of two full shingle arrays, and the (block, shingle) key spreads a hot
    * block across the cluster). This closes the documented crossover
    * automatically: one skewed mega-block no longer drags the whole query
    * quadratic, and a corpus of small blocks doesn't pay the posting-join
    * overhead.
    *
    * Returns pairs with POSITIVE jaccard ≥ `minJaccard` (zero-overlap pairs
    * are never emitted — the inverted formulation cannot see them, so the
    * dense branch filters them too for path-independent results).
    */
  def ngramJaccardPairsAuto(df: DataFrame, id: Column, text: Column,
                            blockCols: Seq[Column], n: Int = 3,
                            minJaccard: Double = 0.0,
                            denseMaxBlock: Long = 64): DataFrame = {
    val (small, large) =
      routeBlocksBySize(df, id, text, blockCols, denseMaxBlock)
    val bk = blockCols.indices.map(i => col(s"__b$i"))
    val dense = ngramJaccardPairs(small, col("__id"), col("__text"), bk, n,
      minJaccard, hashedShingles = true)
      .filter(col("jaccard") > 0)
    val inverted = ngramJaccardPairsInverted(large, col("__id"), col("__text"),
      bk, n, minJaccard)
      .select("id_a", "id_b", "jaccard")
    dense.select("id_a", "id_b", "jaccard").union(inverted)
  }

  /** MinHash + LSH near-dup pairs.
    *
    * Pipeline: shingle → k-minhash signature → split into `bands` bands →
    * bucket on (band, hash(band slice)) → equi-join within buckets →
    * distinct candidate pairs → verify with exact Jaccard ≥ `threshold`.
    *
    * The only joins are equi-joins on the band-bucket key, so candidate
    * generation shuffles by bucket and never materializes the O(N²) pair
    * space. Signature computation is embarrassingly parallel.
    */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
                      numHashes: Int = 32, bands: Int = 8,
                      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Signature via explode + hash columns + one fused aggregate: the k
    // hash evaluations stay in whole-stage codegen (higher-order-function
    // lambdas are interpreted and defeat common-subexpression elimination),
    // per-doc minima partial-aggregate map-side, and the same aggregation
    // collects the xxhash64'd shingle set for exact-Jaccard verification —
    // string shingles are never materialized or cached.
    val exploded = spread(df)
      .select(id.as("__id"), explode(wordShingles(text, shingleN)).as("__x"))
    val aggCols = (0 until numHashes).map(k =>
      min(xxhash64(lit(k), col("__x"))).as(s"__m$k")) :+
      collect_set(xxhash64(col("__x"))).as("__hset")
    val sig = exploded.groupBy(col("__id")).agg(aggCols.head, aggCols.tail: _*)
      .cache() // (id, k minima, hashed shingle set) — all longs
    // (id, band, bucket): bucket hashes that band's signature slice
    val banded = sig.select(col("__id"),
      explode(array((0 until bands).map(bd =>
        struct(lit(bd).as("band"),
          hash(((bd * rows) until ((bd + 1) * rows))
            .map(k => col(s"__m$k")): _*).as("bucket"))): _*)).as("bb"))
      .select(col("__id"), col("bb.band"), col("bb.bucket"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verify with exact Jaccard over the hashed sets (equal to string-set
    // jaccard modulo 64-bit collisions). Join 1 streams the cached sig and
    // broadcasts `candidates` — two longs per row, safe to build driver-side.
    // Join 2's build side is `withA`, which carries sh_a (the full hashed
    // shingle set, hundreds of longs per candidate pair): on a dup-heavy
    // corpus the pair list scales with the dup rate and a driver broadcast
    // build of it is the scale-killer, so it takes the config-gated
    // shuffle-hash (GraftConf.pairJoinHint) like every other wide-array
    // build side in this file.
    val withA = sig.select(col("__id").as("id_a"), col("__hset").as("sh_a"))
      .join(broadcast(candidates), Seq("id_a"))
    sig.select(col("__id").as("id_b"), col("__hset").as("sh_b"))
      .join(graft.GraftConf.hintPairJoin(withA), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: flag corpus documents that share at least
    * `minShared` distinct word n-gram shingles with any benchmark document
    * — the "is my training set contaminated with eval data" check every
    * LLM pipeline needs. Returns (doc_id, bench_id, n_shared) with the
    * single WORST-overlap benchmark doc per flagged corpus doc (ties
    * broken by lowest bench id).
    *
    * Shape is the inverted-index posting join: explode both sides to
    * (id, shingle-hash) postings, equi-join on the hash, count per
    * (corpus, benchmark) pair — only pairs that actually share a shingle
    * ever materialize, never the cross product. At 100 TB the benchmark
    * side is small (eval suites) and broadcasts; common-shingle skew
    * spreads over the hash key and collapses in the partial count.
    */
  def contaminationFlags(corpus: DataFrame, corpusId: Column,
                         corpusText: Column, benchmark: DataFrame,
                         benchId: Column, benchText: Column,
                         n: Int = 3, minShared: Long = 3): DataFrame = {
    def postings(df: DataFrame, id: Column, text: Column,
                 idName: String): DataFrame =
      spread(df)
        .select(id.as(idName), explode(wordShingles(text, n)).as("__s"))
        .select(col(idName), xxhash64(col("__s")).as("__h"))
        .dropDuplicates(idName, "__h")
    val ov = postings(corpus, corpusId, corpusText, "doc_id")
      .join(postings(benchmark, benchId, benchText, "bench_id"), "__h")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("n_shared").desc, col("bench_id").asc)
    ov.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("n_shared"))
  }

  /** One-sided containment near-dup pairs: `C(A→B) = |A∩B| / |A|` over
    * word-shingle sets — the measure that catches a document EMBEDDED in a
    * larger one (quote farms, boilerplate wrappers, doc-in-doc crawls),
    * which symmetric Jaccard dilutes toward 0 as the host grows. Emits
    * ordered pairs (id_a = the contained candidate) with
    * `containment >= minContain`.
    *
    * Shingles whose document frequency exceeds `maxDf` are dropped BEFORE
    * pairing, and set sizes are computed over the surviving (informative)
    * shingles, so the measure is exact containment of the df-capped sets.
    * The cap is the scale contract: a boilerplate shingle shared by a
    * million documents would otherwise fan the posting self-join out to
    * 10^12 pairs; capping bounds any shingle's contribution at `maxDf²`
    * while losing only stopword-grade evidence. Every step is an
    * equi-join or hash aggregate on a hash key — no cross product, no
    * skewed shuffle key (postings are spread across the shingle-hash
    * space).
    */
  def containmentPairs(df: DataFrame, id: Column, text: Column,
                       n: Int = 3, minContain: Double = 0.5,
                       maxDf: Long = 1000): DataFrame = {
    require(minContain >= 0.0 && minContain <= 1.0,
      s"minContain must be in [0,1], got $minContain")
    require(maxDf >= 2, s"maxDf must be >= 2 to ever pair, got $maxDf")
    val postings = spread(df)
      .select(id.as("__id"), explode(wordShingles(text, n)).as("__s"))
      .select(col("__id"), xxhash64(col("__s")).as("__h"))
      .dropDuplicates("__id", "__h")
    // df-cap via aggregate + join, NOT a window over __h: the count's
    // map-side partials collapse a hot shingle before the shuffle, and the
    // survivors-only join gives AQE a skew-splittable shape — a window
    // partitioned by __h would funnel the hot shingle's whole posting list
    // into one task's sort, the exact blowup the cap is here to prevent.
    // Cached (two longs per row): sizes + both self-join sides reuse it,
    // otherwise the scan→shingle→hash→dedup chain runs four times.
    val informative = graft.GraftConf.trackCache(postings.join(
      postings.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("__h")),
      "__h"))
    val sizes = informative.groupBy(col("__id").as("id_a"))
      .agg(count(lit(1)).as("size_a"))
    // the self-join's build side is the corpus-sized posting set — never a
    // driver broadcast build (the q21 scale-killer shape); config-gated
    // shuffle-hash like every corpus-sized build side in this file
    val inter = informative.select(col("__id").as("id_a"), col("__h"))
      .join(graft.GraftConf.hintPairJoin(
        informative.select(col("__id").as("id_b"), col("__h"))), "__h")
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter.join(sizes, "id_a")
      .join(sizes.select(col("id_a").as("id_b"), col("size_a").as("size_b")),
        "id_b")
      .withColumn("containment",
        col("n_shared").cast("double") / col("size_a").cast("double"))
      .filter(col("containment") >= minContain)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("size_a"),
        col("size_b"), col("containment"))
  }

  /** [[contaminationFlags]] with a Bloom prefilter on the corpus postings —
    * the variant for when the benchmark side is too large to broadcast
    * into the exact join but its Bloom fits comfortably in memory (a bloom
    * costs ~1.2 bytes/item at 1% fpp vs 8+ for the exact hash set, three
    * orders less than the strings). The corpus posting stream drops every
    * shingle the filter rejects BEFORE the shuffle, so at a ~1% benchmark
    * hit rate the exact join shuffles ~1% of the corpus postings plus the
    * fpp. False positives only re-admit rows the exact equi-join discards
    * anyway, so the output is IDENTICAL to [[contaminationFlags]] — same
    * oracle, same gate.
    *
    * The filter is built by the public `DataFrameStatFunctions.bloomFilter`
    * aggregate (a driver-side sketch merge of per-partition blooms — the
    * one justified driver materialization here, since the artifact is the
    * point) over the xxhash64 posting keys, and probed per-row with
    * Catalyst's own codegen'd `BloomFilterMightContain` — both sides use
    * `putLong`/`mightContainLong` on the same sketch format.
    */
  def contaminationFlagsBloom(corpus: DataFrame, corpusId: Column,
                              corpusText: Column, benchmark: DataFrame,
                              benchId: Column, benchText: Column,
                              n: Int = 3, minShared: Long = 3,
                              expectedBenchShingles: Long = 1000000L,
                              fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    def postings(df: DataFrame, id: Column, text: Column,
                 idName: String): DataFrame =
      spread(df)
        .select(id.as(idName), explode(wordShingles(text, n)).as("__s"))
        .select(col(idName), xxhash64(col("__s")).as("__h"))
        .dropDuplicates(idName, "__h")
    // Cached (two longs per row): the emptiness probe, the bloom build,
    // and the final exact join all reuse it — uncached, the
    // scan→shingle→hash→dedup chain would run three times.
    val bench =
      graft.GraftConf.trackCache(postings(benchmark, benchId, benchText, "bench_id"))
    // Empty benchmark → no bloom (stat.bloomFilter's merge over zero
    // partials yields an unusable filter) and no prefilter needed: the
    // exact join against the empty side is already free and returns the
    // correct empty result.
    val prefilter: DataFrame => DataFrame =
      if (bench.isEmpty) identity
      else {
        val bloom = bench.stat.bloomFilter("__h", expectedBenchShingles, fpp)
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          bos.toByteArray
        }
        _.filter(ColumnBridge.column(BloomFilterMightContain(
          Literal(bytes), ColumnBridge.expression(col("__h")))))
      }
    val ov = prefilter(postings(corpus, corpusId, corpusText, "doc_id"))
      .join(bench, "__h")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("n_shared").desc, col("bench_id").asc)
    ov.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("n_shared"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit i, sum +1/-1 weighted by
    * token-hash bit i, then take the sign. Near-dups share the same simhash
    * (or a low Hamming distance; exact-bucket grouping shown here).
    *
    * Computed with 64 conditional aggregates after an explode — a single
    * shuffle on the doc id; no UDFs.
    */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = spread(df).select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__bit$i")
    }
    val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"__bit$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  /** Portable 64-bit SimHash: identical construction to [[simhash]] but the
    * per-token bits come from the first 64 bits of `md5(token)` (four 16-bit
    * big-endian chunks of the hex digest) instead of xxhash64 — any engine
    * with md5 and integer bit ops reproduces it exactly, which is what makes
    * this variant oracle-checkable (see SparkEntry q23).
    *
    * Output: (doc_id, s0..s3 16-bit chunk values, simhash hex string).
    * Same scale shape as [[simhash]]: explode + one shuffle on the doc id,
    * all expressions codegen'd.
    */
  def simhashPortable(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = spread(df).select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .withColumn("__m", md5(col("tok")))
    val chunks = (0 until 4).map(k =>
      conv(substring(col("__m"), k * 4 + 1, 4), 16, 10).cast("int").as(s"__c$k"))
    val t2 = tok.select(col("doc_id") +: chunks: _*)
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col(s"__c${j / 16}"), j % 16).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$j")
    }
    val sums = t2.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val chunkVals = (0 until 4).map { k =>
      (0 until 16).map(b =>
        when(col(s"__b${k * 16 + b}") > 0, lit(1 << b)).otherwise(lit(0)))
        .reduce(_ + _).cast("int").as(s"s$k")
    }
    sums.select(col("doc_id") +: chunkVals: _*)
      .withColumn("simhash", concat((0 until 4).map(k =>
        lpad(lower(conv(col(s"s$k").cast("string"), 10, 16)), 4, "0")): _*))
  }

  /** Hamming-neighbor pairs over [[simhashPortable]] signatures, via
    * pigeonhole chunk-LSH: a 64-bit simhash split into 4×16-bit chunks —
    * any two signatures within Hamming distance ≤ 3 must agree on at least
    * one whole chunk (3 flipped bits can touch at most 3 chunks). So
    * candidates are an equi-join on (chunk index, chunk value) — shuffled
    * by chunk, never all-pairs — and the exact distance check
    * (`bit_count(xor)` per chunk, summed) filters to `maxHamming`.
    *
    * Recall is EXACT for distance ≤ 3 (pigeonhole guarantee), approximate
    * above it. For a larger budget split into more chunks (d ≤ chunks-1).
    */
  def simhashNeighbors(df: DataFrame, id: Column, text: Column,
                       maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk split guarantees recall only for d <= 3")
    val sh = simhashPortable(df, id, text)
    val banded = sh.select(col("doc_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("ci"), col(s"s$k").as("cv"))): _*)).as("c"))
      .select(col("doc_id"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val a = sh.select(col("doc_id").as("id_a") +:
      (0 until 4).map(k => col(s"s$k").as(s"a$k")): _*)
    val b = sh.select(col("doc_id").as("id_b") +:
      (0 until 4).map(k => col(s"s$k").as(s"b$k")): _*)
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("hamming", (0 until 4).map(k =>
        bit_count(col(s"a$k").bitwiseXOR(col(s"b$k"))).cast("long"))
        .reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Incremental near-dup check: flag documents of an incoming batch that
    * near-duplicate (simhash Hamming ≤ `maxHamming`) an EXISTING corpus,
    * without re-clustering the corpus — the shape of day-2 dedup at 100 TB,
    * where signatures for the corpus side are computed once (or read from a
    * signature store) and each new batch only pays its own hashing plus a
    * banded equi-join into the corpus. Candidate generation is the same
    * 4-chunk pigeonhole as [[simhashNeighbors]] (exact recall for d ≤ 3);
    * the batch side is small by construction, so its banded signatures
    * broadcast and the corpus is never shuffled by the join.
    *
    * Returns one row per MATCHED batch doc: (new_id, match_id, hamming)
    * with the best corpus match (min hamming, ties to min corpus id).
    */
  def incrementalNearDups(batch: DataFrame, batchId: Column, batchText: Column,
                          corpus: DataFrame, corpusId: Column, corpusText: Column,
                          maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk split guarantees recall only for d <= 3")
    val nsh = simhashPortable(batch, batchId, batchText)
    val csh = simhashPortable(corpus, corpusId, corpusText)
    def banded(sh: DataFrame): DataFrame = sh.select(col("doc_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("ci"), col(s"s$k").as("cv"))): _*)).as("c"))
      .select(col("doc_id"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    val cand = banded(nsh).as("x").join(banded(csh).as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    val a = nsh.select(col("doc_id").as("new_id") +:
      (0 until 4).map(k => col(s"s$k").as(s"a$k")): _*)
    val b = csh.select(col("doc_id").as("corpus_id") +:
      (0 until 4).map(k => col(s"s$k").as(s"b$k")): _*)
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("new_id"))
      .orderBy(col("hamming").asc, col("corpus_id").asc)
    cand.join(a, "new_id").join(b, "corpus_id")
      .withColumn("hamming", (0 until 4).map(k =>
        bit_count(col(s"a$k").bitwiseXOR(col(s"b$k"))).cast("long"))
        .reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col("new_id"), col("corpus_id").as("match_id"), col("hamming"))
  }

  /** Passage-level duplication profile: for every document, the fraction
    * of its `window`-token sliding windows that also appear verbatim in
    * ANOTHER document — the exact-substring-duplication signal (boilerplate
    * headers, license blocks, syndicated passages) that document-level
    * near-dup measures miss. Emits (doc_id, n_windows, n_shared, dup_frac)
    * for every doc with at least one full window.
    *
    * Shape: explode windows → hash → count distinct docs per hash → join
    * back on the hash. The shuffle key is the window hash — near-unique by
    * construction, so the aggregation is skew-free; shuffle volume is
    * proportional to corpus token count, which is what any exact
    * substring-level pass costs. Windows are md5-hashed (engine-portable);
    * in-doc repeats are collapsed with array_distinct before the explode.
    */
  def passageDupStats(df: DataFrame, id: Column, text: Column,
                      window: Int = 8): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    // distinct-then-md5 ≡ md5-then-distinct (up to md5 collision), so the
    // shared shingleSet helper covers the whole window construction
    val win = spread(df)
      .select(id.as("doc_id"),
        explode(transform(graft.functions.shingleSet(text, window),
          g => md5(g))).as("h"))
    val byHash = win.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
    win.join(byHash, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("dup_frac",
        round(col("n_shared").cast("double") / col("n_windows").cast("double"), 4))
  }

  /** SimHash dup buckets: groups of documents sharing an identical simhash. */
  def simhashBuckets(df: DataFrame, id: Column, text: Column): DataFrame =
    simhash(df, id, text)
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** Connected components over an undirected pair graph (near-dup edges →
    * dup GROUPS): per round, (1) min-label propagation — every node takes
    * the min of its own label and its neighbors' labels — then (2) pointer
    * jumping — every node re-reads the CURRENT label of the node its label
    * points at (`label ← label(label)`, Shiloach-Vishkin style). Step 1
    * alone needs rounds = graph diameter (a 10k-node near-dup *chain* would
    * need 10k rounds); the jump step doubles the distance a min label has
    * traveled each round, so convergence is O(log component size) — ~10
    * rounds for a 1000-node path, bounded by log of the largest component
    * at any data scale.
    *
    * Per round: one shuffle join (sym edges ⋈ labels) + min-aggregate, one
    * self-join on the label key, and a convergence count — the only driver
    * action. `localCheckpoint` truncates lineage so plans don't compound.
    * Labels are always node ids within the component (propagation moves
    * them only along edges and pointer chains), so the fixpoint label is
    * the component's min id.
    *
    * Returns (id, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, a: String = "id_a",
                          b: String = "id_b", maxIter: Int = 30): DataFrame =
    connectedComponentsWithRounds(edges, a, b, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds it took — the
    * observable the convergence-bound spec pins (log, not diameter).
    */
  def connectedComponentsWithRounds(edges: DataFrame, a: String = "id_a",
                                    b: String = "id_b",
                                    maxIter: Int = 30): (DataFrame, Int) = {
    // pre-shuffled on the per-round neighbor-join key (the r7
    // co-location device, see Graph.checkpointPartitionedBy): rounds
    // shuffle the label frame, never the symmetric edge frame
    val sym = graft.ops.Graph.checkpointPartitionedBy(
      edges.select(col(a).as("src"), col(b).as("dst"))
        .union(edges.select(col(b).as("src"), col(a).as("dst"))),
      col("dst"))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("dl")).as("nl"))
      // carry the round's starting label along as __old: convergence is then
      // a column compare inside the frame being checkpointed anyway, not a
      // separate join-back against the previous labels (which cost one more
      // shuffle plus a full count scan per round)
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // pointer jump: follow the label one hop (label values are node ids,
      // so this is a self-join on the label key; labels only decrease)
      val updated = prop
        .join(prop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), col("__old"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint()
      changed = !updated.filter(col("label") =!= col("__old")).isEmpty
      labels = updated.drop("__old")
      i += 1
    }
    // silent non-convergence would return plausible-but-wrong labels
    if (changed) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(labels still changing) — raise maxIter " +
        "(~log2 of the largest component size)")
    (labels.select(col("id"), col("label").as("component")), i)
  }

  /** Embedding-cosine near-dup pairs, blocked by `blockCols` (e.g. a cluster
    * label or coarse LSH bucket) so the pair space stays linear-ish.
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, vec: Column,
                         blockCols: Seq[Column],
                         minCosine: Double): DataFrame = {
    val base = spread(df).select(
      (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") } :+
        id.as("__id") :+ vec.as("__v")): _*)
    val bk = blockCols.indices.map(i => s"__b$i")
    val a = base.toDF(base.columns.map(_ + "_a").toIndexedSeq: _*)
    val b = base.toDF(base.columns.map(_ + "_b").toIndexedSeq: _*)
    val cond = bk.map(k => a(k + "_a") === b(k + "_b")).reduce(_ && _) &&
      (a("__id_a") < b("__id_b"))
    // shuffle-hash (config-gated via GraftConf, default), not broadcast:
    // the build side carries the wide vector arrays, and a driver-side
    // broadcast build of those is slow and GC-sensitive (intermittently
    // several× the query); the shuffled build is per-partition and
    // parallel. Same lesson as the minhash verify join.
    val scored = a.join(graft.GraftConf.hintPairJoin(b), cond)
      .select(col("__id_a").as("id_a"), col("__id_b").as("id_b"),
        cosine(col("__v_a"), col("__v_b")).as("cosine"))
    // -Infinity means "no threshold": skip the filter entirely, because a
    // SQL comparison would still drop NULL cosines (zero-norm vectors) and
    // float roundings below -1.0 — knnGraph needs every in-block pair
    if (minCosine == Double.NegativeInfinity) scored
    else scored.filter(col("cosine") >= minCosine)
  }

  /** Chunk-overlap near-dup pairs — document similarity at the
    * CONTENT-DEFINED chunk grain ([[graft.ops.TextAnalysis.contentChunks]]):
    * two documents pair when they share ≥ `minShared` distinct chunk
    * contents, scored by Jaccard over their chunk-hash sets. Where
    * word-shingle Jaccard ([[jaccard]]-family) sees every n-gram, chunk
    * overlap sees ~modulus-sized content blocks — the grain that catches
    * documents ASSEMBLED from shared boilerplate (headers, license
    * blocks, templated paragraphs) cheaply, because the posting universe
    * is len/modulus per doc instead of len shingles.
    *
    * Same scale devices as [[containmentPairs]], same reasons: chunk
    * hashes with document frequency > `maxDf` drop BEFORE pairing (a
    * boilerplate chunk in a million docs would fan the self-join to
    * 10¹² pairs; sizes are computed over the surviving sets so the
    * measure is exact Jaccard of the df-capped sets), the df-cap is an
    * aggregate + join (never a window over the hash), the posting
    * self-join build side is config-pinned shuffle-hash. All integer
    * counts; Jaccard is the one integer-fed division. Returns
    * (id_a < id_b, n_shared, size_a, size_b, jaccard).
    */
  def chunkOverlapPairs(df: DataFrame, id: Column, text: Column,
                        window: Int = 16, modulus: Int = 64,
                        minShared: Long = 2, maxDf: Long = 64): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2 to ever pair, got $maxDf")
    val postings = graft.ops.TextAnalysis
      .contentChunks(df, id, text, window, modulus)
      .select(col("doc_id").as("__id"), col("chunk_hash").as("__h"))
      .dropDuplicates("__id", "__h")
    val informative = graft.GraftConf.trackCache(postings.join(
      postings.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("__h")),
      "__h"))
    val sizes = informative.groupBy(col("__id").as("id_a"))
      .agg(count(lit(1)).as("size_a"))
    val inter = informative.select(col("__id").as("id_a"), col("__h"))
      .join(graft.GraftConf.hintPairJoin(
        informative.select(col("__id").as("id_b"), col("__h"))), "__h")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    inter.join(sizes, "id_a")
      .join(sizes.select(col("id_a").as("id_b"), col("size_a").as("size_b")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"), col("size_a"),
        col("size_b"),
        round(col("n_shared").cast("double") /
          (col("size_a") + col("size_b") - col("n_shared")).cast("double"),
          6).as("jaccard"))
  }
}
