package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round
import graft.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    full corpus — one scan, no corpus shuffle; the window top-k runs
  *    per-query.
  *  - LSH-bucketed ANN (random-hyperplane signs): corpus and queries are
  *    bucketed by a deterministic bit signature; search joins only matching
  *    buckets. This is the 100 TB path — candidate generation is an
  *    equi-join on the bucket key instead of a cross product.
  */
object Similarity {

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * @param corpus   (id, vec) corpus side
    * @param queries  (id, vec) query side — expected small; broadcast
    * @param k        neighbors per query
    */
  /** Shared score-and-rank scaffolding: broadcast the prepared query side
    * against the prepared corpus side under `joinCond`, cosine-score, and
    * keep each query's top k. The round-6/id tie-break rule that makes
    * results oracle-checkable lives HERE only.
    */
  private def topKByPredicate(c: DataFrame, q: DataFrame,
                              joinCond: Column, k: Int): DataFrame =
    rankTopK(c.join(broadcast(q), joinCond), k)

  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame =
    topKByPredicate(
      Dedup.spread(corpus).select(corpusId.as("item_id"), corpusVec.as("__cv")),
      queries.select(queryId.as("query_id"), queryVec.as("__qv")),
      col("item_id") =!= col("query_id"), k)

  /** Deterministic sign-bit signature: bit j = (vec[dims(j)] >= 0). With
    * unit-ish random-ish embeddings this is a random-hyperplane LSH where
    * the hyperplanes are the coordinate axes of the chosen dims — fully
    * deterministic, no stored model, reproducible across engines.
    */
  def signBucket(vec: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex.map { case (d, j) =>
      when(element_at(vec, d + 1) >= 0, shiftleft(lit(1), j)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** XOR masks whose buckets lie within Hamming distance `h` of a query's
    * own bucket: the identity, every single bit, every bit pair.
    */
  private def probeMasks(bits: Int, h: Int): Seq[Int] = {
    require(h >= 0 && h <= 2,
      "probeHamming must be 0 (exact bucket), 1, or 2 (flipped-bit probes)")
    Seq(0) ++
      (if (h >= 1) (0 until bits).map(1 << _) else Nil) ++
      (if (h >= 2)
        for { j <- 0 until bits; l <- j + 1 until bits }
          yield (1 << j) | (1 << l)
      else Nil)
  }

  /** Candidate (query, item) pairs from one or more sign-LSH tables, each
    * probed to Hamming distance `probeHamming` (OR-construction: a pair is
    * a candidate if ANY table buckets it together). Candidate generation is
    * one equi-join on (table, bucket): the corpus occupies exactly one
    * bucket per table (a |tables|-way map-side explode — no corpus
    * shuffle), the probe list explodes on the tiny broadcast query side.
    * With a single table the probe buckets are pairwise distinct so no
    * pair repeats and no dedup runs; with several tables the overlap is
    * deduped before scoring so a pair is never scored twice.
    */
  def lshCandidates(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    tables: Seq[Seq[Int]], probeHamming: Int): DataFrame = {
    require(tables.nonEmpty && tables.forall(_.nonEmpty),
      "need at least one non-empty signature-dimension table")
    val c0 = Dedup.spread(corpus)
      .select(corpusId.as("item_id"), corpusVec.as("__cv"))
    val c =
      if (tables.size == 1) c0
        .withColumn("__t", lit(0))
        .withColumn("bucket", signBucket(col("__cv"), tables.head))
      else c0.select(col("item_id"), col("__cv"),
        posexplode(array(tables.map(d => signBucket(col("__cv"), d)): _*))
          .as(Seq("__t", "bucket")))
    val probes = for {
      (dims, ti) <- tables.zipWithIndex
      m <- probeMasks(dims.length, probeHamming)
    } yield struct(lit(ti).as("t"),
      signBucket(col("__qv"), dims).bitwiseXOR(lit(m)).as("b"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .select(col("query_id"), col("__qv"),
        explode(array(probes: _*)).as("__p"))
      .select(col("query_id"), col("__qv"),
        col("__p.t").as("__t"), col("__p.b").as("bucket"))
    val joined = c.join(broadcast(q), Seq("__t", "bucket"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"), col("__qv"), col("__cv"))
    if (tables.size == 1) joined
    else joined.dropDuplicates("query_id", "item_id")
  }

  /** Exact-cosine scoring + per-query top-k over prepared candidate pairs
    * carrying (__qv, __cv). The round-6/id tie-break rule lives here and in
    * [[topKByPredicate]] only.
    */
  private def rankTopK(cands: DataFrame, k: Int): DataFrame = {
    val scored = cands.select(col("query_id"), col("item_id"),
      cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      // round before ranking so float-accumulation noise can't flip the
      // order of effectively-tied neighbors; ids break the remaining ties.
      // The round-6/id tie-break rule that makes results oracle-checkable
      // lives HERE only (brute-force, LSH, IVF and quantized re-rank all
      // route through this).
      .orderBy(round(col("cosine"), 6).desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: only corpus items bucketed with the
    * query (in any table, within the probe radius) are scored. Recall < 1
    * by construction; bucket count 2^|dims| per table.
    *
    * `probeHamming` enables multi-probe: each query also probes every
    * bucket within that Hamming distance of its own (|dims| extra probes at
    * distance 1, C(|dims|,2) more at distance 2) — recovering near-misses
    * where one or two sign bits disagree, the dominant sign-LSH miss mode.
    * `extraTables` adds independent hash tables (OR-construction) on other
    * dimension sets, each probed with the same ladder.
    *
    * Measured on the sf0.01 embeddings (near-random vectors, true top-5
    * neighbors at 60-75° — the hard case; AnnRecallSpec re-measures and
    * BASELINE.md pins the (recall, candidate-fraction) ladder): recall@5
    * 0.04 single-probe → 0.44 at distance 1 → 0.80 at distance 2, for
    * candidate volumes ~3%/19%/50%. On embeddings THIS unstructured,
    * extra sign tables buy recall only near-linearly in volume — when the
    * corpus clusters (the usual 100 TB case), [[ivfTopK]] with `nprobe`
    * is the cheaper recall lever (measured 25× less volume per recall
    * point here); both are shipped and measured.
    */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dims: Seq[Int] = Seq(0, 8, 16, 24, 32),
              probeHamming: Int = 0,
              extraTables: Seq[Seq[Int]] = Nil): DataFrame =
    rankTopK(lshCandidates(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, dims +: extraTables, probeHamming), k)

  /** Deterministic, model-free seed centroids: the minimum-id vector of
    * each label becomes that cell's centroid — (cell, cvec) rows. One
    * window pass; reproducible across engines (no RNG, no trained model),
    * which is what lets the IVF/k-means queries be oracle-checked. Shared
    * by q37/q49/q64 so the seeding rule has exactly one definition.
    */
  def minIdSeeds(df: DataFrame, id: Column, vec: Column,
                 label: Column): DataFrame = {
    val w = Window.partitionBy(label).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(label.as("cell"), vec.as("cvec"))
  }

  /** IVF-style partitioned search: centroids are given (id, vec); each
    * corpus item is assigned to its nearest centroid once (a broadcast
    * join + argmax), and queries probe only their own cell. At 100 TB the
    * assignment is a map-side pass and the probe is an equi-join on cell id.
    */
  def assignToCentroids(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                        centroids: DataFrame, centroidId: Column,
                        centroidVec: Column): DataFrame = {
    val c = corpus.select(corpusId.as("item_id"), asDouble(corpusVec).as("vec"))
    val ce = centroids.select(centroidId.as("cell"), asDouble(centroidVec).as("__cvec"))
    val scored = c.join(broadcast(ce))
      .select(col("item_id"), col("vec"), col("cell"),
        cosine(col("vec"), col("__cvec")).as("__sim"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(round(col("__sim"), 6).desc, col("cell").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("item_id"), col("vec"), col("cell"))
  }

  /** IVF candidate pairs: corpus items are assigned to their nearest
    * centroid once ([[assignToCentroids]]); each query ranks the centroids
    * and probes its `nprobe` nearest cells. Candidate generation is an
    * equi-join on the cell id — the corpus never shuffles, the
    * (queries × nprobe) probe side broadcasts. Multi-probe is the IVF
    * recall lever: a query near a cell boundary recovers neighbors that
    * fell just across it, at a candidate volume of ~nprobe/k_cells of the
    * corpus (vs sign-LSH multi-probe, which on unclustered data pays
    * near-linear volume per recall point — see the numbers on [[lshTopK]]).
    */
  def ivfCandidates(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    centroids: DataFrame, centroidId: Column,
                    centroidVec: Column, queries: DataFrame, queryId: Column,
                    queryVec: Column, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val assigned = assignToCentroids(corpus, corpusId, corpusVec,
      centroids, centroidId, centroidVec)
    val ce = centroids.select(centroidId.as("cell"),
      asDouble(centroidVec).as("__cvec"))
    val qScored = queries.select(queryId.as("query_id"), asDouble(queryVec).as("__qv"))
      .join(broadcast(ce))
      .select(col("query_id"), col("__qv"), col("cell"),
        cosine(col("__qv"), col("__cvec")).as("__sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("__sim"), 6).desc, col("cell").asc)
    val probes = qScored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"), col("__qv"),
        col("vec").as("__cv"))
  }

  /** IVF approximate top-k with `nprobe` probed cells per query. */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              centroids: DataFrame, centroidId: Column, centroidVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, nprobe: Int = 1): DataFrame =
    rankTopK(ivfCandidates(corpus, corpusId, corpusVec, centroids,
      centroidId, centroidVec, queries, queryId, queryVec, nprobe), k)

  /** One k-means refinement step over an assignment produced by
    * [[assignToCentroids]]: the new centroid of each cell is the per-
    * dimension arithmetic mean of its members. Fully relational —
    * `posexplode` the vectors, aggregate by (cell, dim) — so the update is
    * two shuffles regardless of corpus size, and the per-dim sums
    * accumulate in DECIMAL (partition-order-independent, oracle-exact).
    *
    * Returns (cell, pos, avg_val) rows; [[centroidsAsVectors]] rebuilds
    * array form for the next [[assignToCentroids]] round.
    */
  def recomputeCentroids(assigned: DataFrame,
                         cellCol: Column = col("cell"),
                         vecCol: Column = col("vec")): DataFrame =
    assigned
      .select(cellCol.as("cell"), posexplode(asDouble(vecCol)).as(Seq("pos", "val")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("val").cast("decimal(27,8)")).cast("double") /
        count(lit(1))).as("avg_val"))

  /** Rebuild (cell, pos, avg_val) rows into (cell, centroid array) —
    * dimension order restored by sorting the collected (pos, val) structs.
    */
  def centroidsAsVectors(perDim: DataFrame): DataFrame =
    perDim.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("avg_val")))),
        s => s.getField("avg_val")).as("centroid"))

  /** Full k-means refinement loop: `iters` rounds of assign → per-dim mean
    * → rebuild centroid vectors. Per round: one broadcast join + argmax
    * (assignment) and two shuffles (the posexplode aggregate) — independent
    * of corpus size; the centroid relation stays k×dims rows and always
    * broadcasts. The driver loop holds only the round counter — centroids
    * never `collect()` to the driver.
    *
    * Returns (final assignment (item_id, vec, cell), final per-dim centroid
    * rows (cell, pos, avg_val)) — callers aggregate whichever view they
    * need (membership counts, norms, [[centroidsAsVectors]]).
    */
  def kmeansIterations(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                       centroids0: DataFrame, centroidId: Column,
                       centroidVec: Column, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var cent = centroids0.select(centroidId.as("cell"),
      asDouble(centroidVec).as("cvec"))
    var assigned: DataFrame = null
    var perDim: DataFrame = null
    for (i <- 1 to iters) {
      assigned = assignToCentroids(corpus, corpusId, corpusVec,
        cent, col("cell"), col("cvec"))
      perDim = recomputeCentroids(assigned)
      // localCheckpoint the tiny k×dims centroid relation each round: it
      // cuts the lineage chain (without it the final plan nests every
      // previous round's join+window+shuffles, and optimizer/codegen time
      // grows with iters — same reason connectedComponents checkpoints).
      // Skipped after the last round: that centroid set is never read.
      if (i < iters)
        cent = centroidsAsVectors(perDim)
          .select(col("cell"), col("centroid").as("cvec"))
          .localCheckpoint()
    }
    (assigned, perDim)
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * k most cosine-similar corpus vectors with a DIFFERENT label — the
    * negatives that actually teach an embedding model. The label predicate
    * is applied BEFORE ranking (a post-hoc filter on a top-k would lose
    * candidates when the nearest neighbors share the query's label).
    * Same scale contract as [[bruteForceTopK]]: small query side
    * broadcast, corpus never shuffles; swap candidate generation to
    * [[lshTopK]]'s buckets when the query side grows.
    */
  def hardNegatives(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    corpusLabel: Column, queries: DataFrame, queryId: Column,
                    queryVec: Column, queryLabel: Column, k: Int): DataFrame =
    topKByPredicate(
      Dedup.spread(corpus).select(corpusId.as("item_id"),
        corpusVec.as("__cv"), corpusLabel.as("__cl")),
      queries.select(queryId.as("query_id"), queryVec.as("__qv"),
        queryLabel.as("__ql")),
      col("__cl") =!= col("__ql"), k)

  /** Symmetric int8 quantization of an embedding column: per-vector
    * max-abs scaling to [-127, 127] — 4× smaller vectors for ANN candidate
    * generation and signature stores (exact re-ranking can read the full
    * floats for finalists only). Per-row map work, no shuffle; the max
    * element always quantizes to ±127 exactly, a zero vector to all
    * zeros. Returns (vec_id, scale, qvec) where `scale` dequantizes
    * (`x ≈ q * scale`).
    */
  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = asDouble(vec)
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = maxAbs / lit(127.0d)
    val q = when(maxAbs === 0.0d, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => round(x / scale).cast("long")))
    df.select(id.as("vec_id"), scale.as("scale"), q.as("qvec"))
  }

  /** Quantized-shortlist ANN — the memory-bound production shape: score
    * EVERY candidate with the exact integer dot product of the int8
    * vectors (4× less memory traffic than floats — at 10^9+ vectors the
    * candidate sweep is RAM-bandwidth-bound, and that 4× is the knob),
    * shortlist the top `shortlist` per query, then re-rank only the
    * shortlist with full-precision cosine over the ORIGINAL embeddings.
    *
    * Determinism: the shortlist boundary is decided by exact 64-bit
    * integer scores (ties by item id) — no float is involved until the
    * re-rank, whose top-k uses the same rounded-rank rule as
    * [[bruteForceTopK]]. So the output is cross-engine exact even though
    * quantization discards precision: both engines discard IDENTICALLY.
    *
    * Scale shape: the int8 corpus (qvec + scale) is ~1/4 the float
    * corpus and is the ONLY thing the sweep reads; original embeddings
    * are fetched by an equi-join on the shortlist ids — k·|queries| rows,
    * not the corpus.
    */
  def quantizedTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val qc = quantizeInt8(Dedup.spread(corpus), corpusId, corpusVec)
      .select(col("vec_id").as("item_id"), col("qvec").as("__cq"))
    val qq = quantizeInt8(queries, queryId, queryVec)
      .select(col("vec_id").as("query_id"), col("qvec").as("__qq"))
    // Two-phase salted top-N (negativeSamples' pattern): a query's corpus
    // sweep never lands in one task's sort — each (query, salt) bucket
    // keeps its own top `shortlist` (a provable superset of the global
    // winners, since dropping below-bucket-rank rows can't evict a global
    // top row), and the exact global rank runs over <= salts*shortlist
    // survivors per query. Integer scores + id tie-break keep both phases
    // deterministic.
    val salts = 64
    val local = Window.partitionBy(col("query_id"), col("__salt"))
      .orderBy(col("qdot").desc, col("item_id").asc)
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("item_id").asc)
    val short = qc.join(broadcast(qq), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        intDot(col("__qq"), col("__cq")).as("qdot"))
      .withColumn("__salt", pmod(xxhash64(col("item_id")), lit(salts)))
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= shortlist)
      .withColumn("__rn", row_number().over(global))
      .filter(col("__rn") <= shortlist)
      .drop("__salt", "__lr", "__rn")
    val cv = corpus.select(corpusId.as("item_id"), corpusVec.as("__cv"))
    val qv = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("item_id").asc)
    short.join(cv, "item_id").join(broadcast(qv), "query_id")
      .select(col("query_id"), col("item_id"), col("qdot"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
  }

  /** Top-`k` ranking by the exact int8 integer dot product alone (no
    * float re-rank) — [[quantizedTopK]]'s sweep phase as a standalone
    * ranker, the cheap retriever arm a hybrid-fusion stack combines with
    * an exact ranker. Same two-phase salted top-k (a query's corpus sweep
    * never lands in one task's sort) and the same determinism contract:
    * 64-bit integer scores, id tie-break, no floats anywhere. Returns
    * (query_id, item_id, qdot, rank).
    */
  def int8Ranking(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                  queries: DataFrame, queryId: Column, queryVec: Column,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qc = quantizeInt8(Dedup.spread(corpus), corpusId, corpusVec)
      .select(col("vec_id").as("item_id"), col("qvec").as("__cq"))
    val qq = quantizeInt8(queries, queryId, queryVec)
      .select(col("vec_id").as("query_id"), col("qvec").as("__qq"))
    val salts = 64
    val local = Window.partitionBy(col("query_id"), col("__salt"))
      .orderBy(col("qdot").desc, col("item_id").asc)
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("item_id").asc)
    qc.join(broadcast(qq), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        intDot(col("__qq"), col("__cq")).as("qdot"))
      .withColumn("__salt", pmod(xxhash64(col("item_id")), lit(salts)))
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("qdot"), col("rank"))
  }

  /** Reciprocal-rank fusion of two truncated rankings — THE standard
    * hybrid-retrieval combiner (BM25 ⊕ dense, exact ⊕ quantized):
    * score(q, i) = Σ_lists 1/(c + rank), items missing from a list
    * contribute 0, final order per query by fused score. Rank positions
    * are the only inputs — scales of the underlying scores never mix,
    * which is why RRF needs no per-list normalization and survives
    * heterogeneous rankers. Returns (query_id, item_id, rank, rrf_score)
    * with the fused rank ≤ `k`.
    *
    * Inputs are (query_id, item_id, rank) frames — any ranker in this
    * module emits that shape. Scale: one equi-join of two top-m-per-query
    * frames (m·|queries| rows each — list-sized, not corpus-sized) and
    * one per-query window. Determinism: 1/(c+rank) is one IEEE division
    * on integer inputs, the fused sum has exactly two addends (no
    * order-dependence), ranking uses the repo's round-9 + id tie-break.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 1, s"c must be >= 1, got $c")
    val fa = a.select(col("query_id"), col("item_id"),
      col("rank").cast("long").as("__ra"))
    val fb = b.select(col("query_id"), col("item_id"),
      col("rank").cast("long").as("__rb"))
    val score =
      coalesce(lit(1.0d) / (lit(c.toDouble) + col("__ra").cast("double")),
        lit(0.0d)) +
      coalesce(lit(1.0d) / (lit(c.toDouble) + col("__rb").cast("double")),
        lit(0.0d))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("__s"), 9).desc, col("item_id").asc)
    fa.join(fb, Seq("query_id", "item_id"), "outer")
      .withColumn("__s", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("rank"),
        round(col("__s"), 6).as("rrf_score"))
  }

  /** Corpus k-NN graph: every node's top-`k` most-similar neighbors
    * within its block — the input to semantic clustering, graph-based
    * dedup and label propagation. Built from the blocked pairwise
    * cosine join ([[Dedup.cosineNearDupPairs]]: shuffle-hash, never a
    * broadcast of the vector arrays, never a cartesian), symmetrized so
    * both endpoints see the edge, then one per-node rank window.
    *
    * Scale shape: pair volume is Σ block² — the block key must bound it
    * (label here; at corpus scale an IVF cell or LSH bucket). Each pair
    * is scored once and emitted twice; the top-k window partitions by
    * node with the round-6 + id tie-break every ranking in this repo
    * uses.
    */
  def knnGraph(df: DataFrame, id: Column, vec: Column,
               blockCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = Dedup.cosineNearDupPairs(df, id, vec, blockCols,
      minCosine = Double.NegativeInfinity)
    val sym = pairs.select(col("id_a").as("node"), col("id_b").as("nbr"),
        col("cosine"))
      .union(pairs.select(col("id_b").as("node"), col("id_a").as("nbr"),
        col("cosine")))
    val w = Window.partitionBy(col("node"))
      .orderBy(round(col("cosine"), 6).desc, col("nbr").asc)
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Cell-blocked k-NN graph — [[knnGraph]]'s BOUNDED-BLOCK production
    * mode, the 100× lever ARCHITECTURE.md documents: corpus items are
    * assigned to their nearest centroid once ([[assignToCentroids]] — a
    * broadcast join + per-item argmax, map-side at any corpus size), and
    * the pairwise join blocks on the CELL id instead of a fixed partition
    * column. With the centroid count sized to the corpus (cells ≈
    * n / targetCellSize, the per-block size cap), pair volume is
    * Σ cell² ≈ n · targetCellSize — LINEAR in n — where a fixed block key
    * (label, tenant, source) grows Σ block² quadratically as blocks fill
    * (the measured n^1.1 wall shape on the r5 10× run, and worse at
    * 100×).
    *
    * Approximation contract: edges exist only WITHIN cells. On a
    * clustered corpus whose cells recover the clusters (the regime a
    * coarse quantizer exists for), every true neighbor shares its node's
    * cell and the graph EQUALS the fixed-block truth — q211 gates exactly
    * that equality against the cluster-blocked oracle on a derived
    * clustered fixture with the cap live (cells ∝ n); BASELINE.md carries
    * the measured 10× wall. On boundary-heavy data the lost edges are the
    * standard IVF trade — raise targetCellSize, refine centroids
    * ([[kmeansIterations]]), or fall back to [[knnGraph]] with a
    * guaranteed-complete block key.
    *
    * Assignment cost note: the broadcast argmax scores n·C centroid
    * cosines; with C ∝ n/cap that term grows n²/cap and overtakes the
    * pair join at extreme corpus sizes — balance with C ∝ √n (pairs and
    * assignment both n^1.5) or assign hierarchically (√C super-cells
    * then C, the standard two-level IVF quantizer) before that point.
    */
  def knnGraphCells(df: DataFrame, id: Column, vec: Column,
                    centroids: DataFrame, centroidId: Column,
                    centroidVec: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val assigned = assignToCentroids(Dedup.spread(df), id, vec,
      centroids, centroidId, centroidVec)
    knnGraph(assigned, col("item_id"), col("vec"), Seq(col("cell")), k)
  }

  /** Incremental k-NN graph maintenance — the day-2 shape: when a new
    * batch of vectors arrives, only batch×corpus and batch×batch pairs
    * are scored (blocked equi-joins, the corpus NEVER self-joins again),
    * merged with the existing graph's edges, and re-ranked per node. The
    * merge law makes it exact: a corpus node's true top-k over
    * corpus ∪ batch is the top-k of (its old top-k ∪ its new batch
    * edges), because any old edge outside the old top-k is dominated by
    * k kept edges that are still present. [[SparkEntry]] q142 gates the
    * incremental result against the FULL-recompute oracle verbatim —
    * the law itself is the differential test (q83's pattern).
    *
    * `existingEdges` must be a [[knnGraph]] result over `corpus` with the
    * same `k` and block columns. At 100 TB this turns each ingest from
    * Σ corpus-block² back into Σ batch·block — the q74 incremental-dedup
    * economics for the similarity family.
    */
  def knnGraphIncremental(existingEdges: DataFrame, corpus: DataFrame,
                          batch: DataFrame, id: Column, vec: Column,
                          blockCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def keyed(df: DataFrame, suffix: String) = df.select(
      (blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i$suffix") } :+
        id.as(s"__id$suffix") :+ vec.as(s"__v$suffix")): _*)
    val bk = blockCols.indices
    val bSide = keyed(batch, "_n")
    val cSide = keyed(corpus, "_o")
    val cross = bSide.join(graft.GraftConf.hintPairJoin(cSide),
        bk.map(i => col(s"__b${i}_n") === col(s"__b${i}_o")).reduce(_ && _))
      .select(col("__id_n"), col("__id_o"),
        cosine(col("__v_n"), col("__v_o")).as("cosine"))
    val crossSym = cross.select(col("__id_n").as("node"),
        col("__id_o").as("nbr"), col("cosine"))
      .union(cross.select(col("__id_o").as("node"),
        col("__id_n").as("nbr"), col("cosine")))
    val bbPairs = Dedup.cosineNearDupPairs(batch, id, vec, blockCols,
      minCosine = Double.NegativeInfinity)
    val bbSym = bbPairs.select(col("id_a").as("node"), col("id_b").as("nbr"),
        col("cosine"))
      .union(bbPairs.select(col("id_b").as("node"), col("id_a").as("nbr"),
        col("cosine")))
    val w = Window.partitionBy(col("node"))
      .orderBy(round(col("cosine"), 6).desc, col("nbr").asc)
    existingEdges.select(col("node"), col("nbr"), col("cosine"))
      .union(crossSym).union(bbSym)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One GNN-style message-passing layer: each node's aggregated feature
    * is the element-wise MEAN of its k-NN neighbors' embeddings — long
    * form (node, dim, mean) over the first `dims` dimensions. Per-dim
    * sums accumulate in DECIMAL (float→double is exact, double→decimal
    * rounds identically in both engines — the q99 idiom), the mean is
    * the contract's `sum_decimal / count`.
    *
    * Scale shape: the dim explode is a map-side `sequence` Generate
    * (`dims` rows per neighbor edge, a constant factor — the analogue of
    * a feature-matrix tile); one aggregation shuffles on (node, dim).
    * Vectors travel the join once — the explode happens after the
    * neighbor join, not before.
    */
  def neighborMeanFeatures(df: DataFrame, id: Column, vec: Column,
                           blockCols: Seq[Column], k: Int,
                           dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val nbrVecs = df.select(id.as("nbr"), vec.as("__nv"))
    knnGraph(df, id, vec, blockCols, k)
      .join(nbrVecs, "nbr")
      .select(col("node"),
        explode(sequence(lit(1), lit(dims))).as("dim"), col("__nv"))
      .select(col("node"), col("dim"),
        // try_element_at, not element_at: under ANSI (the session default)
        // element_at past the array end THROWS, and the ragged-corpus
        // contract below needs a null there so the per-dim present-value
        // count stays meaningful.
        try_element_at(col("__nv"), col("dim")).cast("double").as("__v"))
      .groupBy(col("node"), col("dim"))
      // count PRESENT values, not rows: a neighbor vector shorter than
      // `dims` yields null at the missing positions (element_at past the
      // end), and dividing by the row count would bias the mean low for
      // ragged corpora. n_nbrs is per-dim for the same reason.
      .agg(count(col("__v")).as("n_nbrs"),
        (sum(col("__v").cast("decimal(28,12)")).cast("double") /
          count(col("__v")).cast("double")).as("mean_v"))
  }

  /** kNN label-disagreement audit (Confident-Learning-style label-error
    * detection, simplified): for each query row, the fraction of its k
    * exact nearest neighbors carrying a DIFFERENT label. A clean label
    * agrees with its semantic neighborhood; disagree_rate ≥ 0.5 (the
    * neighborhood majority votes against the assigned label) flags the
    * row a mislabel suspect — the audit that catches annotation noise
    * before it trains in. Returns (query_id, label, n_nbrs, n_disagree,
    * disagree_rate, suspect).
    *
    * Deliberately UNBLOCKED knn (vs [[knnGraph]], which blocks by label
    * and so can never see a cross-label neighbor): the audit runs over a
    * `queries` SAMPLE against the full corpus — brute-force exact, cost
    * |queries|·|corpus| with the query side broadcast, linear in corpus
    * size. At 100 TB you audit a few thousand rows per label slice, not
    * the full table; rates are one integer ratio, exact.
    */
  def labelDisagreement(corpus: DataFrame, id: Column, vec: Column,
                        label: Column, queries: DataFrame,
                        k: Int): DataFrame = {
    val knn = bruteForceTopK(corpus, id, vec, queries, id, vec, k)
    val lbls = corpus.select(id.as("__lid"), label.as("__lbl"))
    knn
      .join(lbls.select(col("__lid").as("query_id"),
        col("__lbl").as("label")), Seq("query_id"))
      .join(lbls.select(col("__lid").as("item_id"),
        col("__lbl").as("__nlbl")), Seq("item_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_nbrs"),
        sum(when(col("__nlbl") =!= col("label"), 1L).otherwise(0L))
          .as("n_disagree"))
      .select(col("query_id"), col("label"), col("n_nbrs"), col("n_disagree"),
        round(col("n_disagree").cast("double") /
          col("n_nbrs").cast("double"), 6).as("disagree_rate"),
        (col("n_disagree") * 2L >= col("n_nbrs")).as("suspect"))
  }

  /** Maximal Marginal Relevance diversification of a per-query shortlist
    * — the greedy rerank that keeps retrieved context from collapsing
    * into near-duplicates: step t picks
    * `argmax λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)`, so relevance
    * trades off against similarity to what is ALREADY picked. Input is
    * (query_id, item_id, rel, vec) — a shortlist (ANN/brute-force top-N)
    * per query; returns (query_id, rank ∈ 1..k, item_id, score).
    *
    * Determinism (the oracle gate): the argmax orders by the ROUNDED
    * score with negative-zero normalized ([[graft.Readout.rdz]] — a
    * λ·rel ≈ (1−λ)·ms cancellation can land on ±0.0 and engines may
    * order signed zeros differently), ties break on item_id; the
    * max-over-selected is an order-free max of identical cosine trees.
    * A fixed-k oracle unrolls the greedy steps (PageRank's generated-CTE
    * device, with `greatest(...)` standing in for the t-row max).
    *
    * Scale shape: k driver rounds; each is one (query-keyed) join of
    * remaining×selected (≤ shortlist·t rows per query), one
    * (query, item) max aggregation, one query-partitioned rank window —
    * shortlist-sized throughout, never corpus-sized; checkpoints keep
    * round lineage flat.
    */
  def mmrDiversify(shortlist: DataFrame, k: Int,
                   lambda: Double): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"lambda must be in (0, 1], got $lambda")
    var selected: DataFrame = null
    var remaining = shortlist.select(col("query_id"), col("item_id"),
      col("rel"), col("vec")).localCheckpoint()
    for (t <- 1 to k) {
      val base =
        if (t == 1) remaining.withColumn("__ms", lit(0.0d))
        else {
          val ms = remaining
            .join(selected.select(col("query_id"), col("__svec")),
              Seq("query_id"))
            .groupBy(col("query_id"), col("item_id"))
            .agg(max(cosine(col("vec"), col("__svec"))).as("__ms"))
          remaining.join(ms, Seq("query_id", "item_id"))
        }
      val scored = base.withColumn("__score",
        lit(lambda) * col("rel") - lit(1.0 - lambda) * col("__ms"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(graft.Readout.rdz(col("__score"), 6).desc,
          col("item_id").asc)
      val pick = scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("query_id"), col("item_id"), col("vec"), col("__score"))
        .localCheckpoint() // read by the union, the anti-join and round t+1
      val news = pick.select(col("query_id"), lit(t.toLong).as("rank"),
        col("item_id"), col("vec").as("__svec"),
        graft.Readout.rdz(col("__score"), 6).as("score"))
      selected =
        if (selected == null) news.localCheckpoint()
        else selected.unionByName(news).localCheckpoint()
      remaining = remaining
        .join(pick.select(col("query_id"), col("item_id")),
          Seq("query_id", "item_id"), "left_anti")
        .localCheckpoint()
    }
    selected.select(col("query_id"), col("rank"), col("item_id"),
      col("score"))
  }

  /** Density-based clustering (DBSCAN) within blocks: ε-neighbors are
    * pairs with cosine ≥ `minCosine` INSIDE a block
    * ([[graft.ops.Dedup.cosineNearDupPairs]]'s contract — the same
    * label/cell blocking q111's semantic dedup uses, so block choice is
    * the recall knob and the in-block result is exact); a point with ≥
    * `minPts` neighbors INCLUDING ITSELF is a core; clusters are the
    * connected components of the core–core ε-graph; a non-core point
    * with a core neighbor is a border point adopted by the SMALLEST
    * core-cluster id among its core neighbors (standard DBSCAN leaves
    * border adoption order-dependent — the min pin is what makes the
    * result deterministic and differentially testable); everything else
    * is noise. The curation read: cores are dense semantic duplicates/
    * templates, borders their periphery, noise the genuinely diverse
    * tail — the "which documents are boilerplate clusters" signal at
    * embedding grain. Returns (node, role ∈ core|border|noise,
    * cluster — null for noise; cluster ids are min-member core ids).
    *
    * Scale shape: the pair stage is the blocked equi-join (Σ block²,
    * bounded by the block key — cell-block to cap it, q211's lever);
    * everything after is neighbor-list-sized: one count aggregation,
    * CC's pointer-jumping rounds on the core subgraph, one min-fold for
    * borders. Determinism: neighbor counts are integers, the core
    * threshold an integer compare, cluster labels min-ids, border
    * adoption a min — the only float on the gate path is the SAME
    * cosine-vs-threshold compare q111 ships (margin measured there).
    */
  def dbscanBlocks(df: DataFrame, id: Column, vec: Column,
                   blockCols: Seq[Column], minCosine: Double,
                   minPts: Int): DataFrame =
    dbscanTriage(df.select(id.as("node")).distinct(),
      graft.ops.Dedup.cosineNearDupPairs(df, id, vec, blockCols, minCosine),
      minPts)

  /** Bounded-cell DBSCAN — [[dbscanBlocks]]' production mode, the same
    * capped-cell lever [[knnGraphCells]] applies to the kNN graph: points
    * are assigned to their `nprobe` nearest centroids (multi-probe — the
    * ε-recall device), ε-pairs are generated INSIDE cells only, deduped
    * across shared cells, and the identical core/border/noise triage
    * follows. With the centroid count sized to the corpus (cells ≈
    * n / targetCellSize), pair volume is Σ occupancy² ≈ n · nprobe² ·
    * targetCellSize — LINEAR in n — where a fixed block key (label,
    * tenant) grows Σ block² quadratically as blocks fill (q220's measured
    * 19× shuffle at 10× data, the r6 verdict's one remaining superlinear
    * operator; q237 gates this replacement and BASELINE.md carries its
    * 10× row).
    *
    * ε-recall contract: a true ε-pair is recovered iff its endpoints
    * share at least one probed cell. `nprobe = 1` is plain IVF blocking
    * (a pair straddling a cell boundary is lost); `nprobe ≥ 2` lets
    * boundary points co-occupy their runner-up cells — the standard
    * multi-probe trade, recall rising with nprobe at candidate volume
    * nprobe²·cap per point. On a clustered corpus whose cells recover the
    * clusters, every ε-pair is intra-cluster and already intra-cell at
    * nprobe = 1 — q237 gates exactly that equality against the
    * cluster-blocked truth with the cap and the probes live (extra
    * cross-cell candidates MUST die on the ε threshold for the hash to
    * match). Raise `targetCellSize`/`nprobe` or refine centroids
    * ([[kmeansIterations]]) on boundary-heavy data.
    *
    * Determinism: candidate-set membership varies with the probe set, but
    * the RESULT doesn't — every candidate pair faces the same exact
    * cosine-vs-ε compare ([[graft.ops.Dedup.cosineNearDupPairs]]'
    * contract), so extra candidates either are true ε-pairs (kept
    * identically) or fail the threshold; the triage downstream of the
    * pair set is [[dbscanBlocks]]' integer/min arithmetic verbatim.
    */
  def dbscanCells(df: DataFrame, id: Column, vec: Column,
                  centroids: DataFrame, centroidId: Column,
                  centroidVec: Column, minCosine: Double, minPts: Int,
                  nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val occ = assignToCentroidsMulti(Dedup.spread(df), id, vec,
      centroids, centroidId, centroidVec, nprobe)
    // a pair sharing several probed cells surfaces once per shared cell
    // with a BIT-IDENTICAL cosine (same expression tree over the same two
    // vectors), so the id-pair dedup is deterministic
    val pairs = graft.ops.Dedup.cosineNearDupPairs(occ, col("item_id"),
        col("vec"), Seq(col("cell")), minCosine)
      .dropDuplicates("id_a", "id_b")
    dbscanTriage(df.select(id.as("node")).distinct(), pairs, minPts)
  }

  /** SemDeDup-style semantic dedup keep-list — the embedding-space
    * analogue of exact/MinHash dedup: cluster the corpus (the caller's
    * centroids — IVF cells, k-means, or any partitioner), generate
    * cosine-≥-τ near-dup pairs INSIDE capped multi-probe cells only
    * ([[dbscanCells]]' candidate device verbatim), resolve the pair
    * relation to connected components, and keep ONE representative per
    * component (the min id — deterministic, like every dup-group op in
    * [[graft.ops.Dedup]]). Returns one row per input point:
    * (id, dup_group, kept) — `kept = (id = dup_group)`; singletons keep
    * themselves. This is the Abbas et al. SemDeDup recipe re-expressed
    * on the repo's bounded-cell machinery: pair volume is
    * n·nprobe²·cellsize (LINEAR in n), never the corpus self-join the
    * naive τ-threshold scan implies.
    *
    * ε-recall contract and determinism are [[dbscanCells]]': a cross-
    * cell true pair needs a shared probed cell (raise nprobe /refine
    * centroids on boundary-heavy data); every candidate faces the same
    * exact rounded-cosine compare, so extra candidates die identically
    * in any engine. Downstream is integer/min arithmetic only
    * (pointer-jumping CC, O(log) rounds).
    */
  def semanticDedup(df: DataFrame, id: Column, vec: Column,
                    centroids: DataFrame, centroidId: Column,
                    centroidVec: Column, minCosine: Double,
                    nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val occ = assignToCentroidsMulti(Dedup.spread(df), id, vec,
      centroids, centroidId, centroidVec, nprobe)
    val pairs = graft.ops.Dedup.cosineNearDupPairs(occ, col("item_id"),
        col("vec"), Seq(col("cell")), minCosine)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"))
    val comp = graft.ops.Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "node")
    df.select(id.as("node")).distinct()
      .join(comp, Seq("node"), "left")
      .select(col("node").as("id"),
        coalesce(col("component"), col("node")).as("dup_group"))
      .withColumn("kept", (col("id") === col("dup_group")).cast("int"))
  }

  /** Simplified silhouette score per cluster — the cluster-quality
    * readout for the IVF/k-means family (is this clustering SEPARATED,
    * or are its cells arbitrary?): per point, a = cosine distance to its
    * ASSIGNED cell's centroid, b = the smallest distance to any OTHER
    * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; negative s marks a
    * MISFIT (a point whose assigned centroid is not its nearest — zero
    * by construction for argmax assignments, diagnostic for external
    * ones like labels). The "simplified" variant (centroid distances,
    * not all-pairs member distances) is THE form that survives scale:
    * one broadcast of the k×d centroid frame, map-side scoring, one
    * (point, cell) fold — the corpus never self-joins. Returns
    * (cell, n, mean_sil, n_misfit) per assigned cell.
    *
    * Contracts: every assigned cell must have a centroid (a's null
    * propagates loudly into a null mean otherwise); with a single
    * centroid no "other" exists and s is null. Determinism: cosines are
    * rdz-rounded BEFORE any comparison (engines agree on the rounded
    * value; ±0.0 normalized), s is one IEEE tree on rounded inputs, the
    * misfit compare runs on the ROUNDED s, and the mean rides round-9 →
    * DECIMAL (order-free) with an rdz readout (s sums are sign-capable).
    */
  def silhouetteSimplified(assigned: DataFrame, id: Column, vec: Column,
                           cell: Column, centroids: DataFrame,
                           centroidId: Column,
                           centroidVec: Column): DataFrame = {
    val c = Dedup.spread(assigned).select(id.as("__id"),
      asDouble(vec).as("__v"), cell.as("__cell"))
    val ce = centroids.select(centroidId.as("__ccell"),
      asDouble(centroidVec).as("__cv"))
    val scored = c.join(broadcast(ce))
      .select(col("__id"), col("__cell"), col("__ccell"),
        graft.Readout.rdz(cosine(col("__v"), col("__cv")), 6).as("__cos"))
    val per = scored.groupBy(col("__id"), col("__cell"))
      .agg(max(when(col("__ccell") === col("__cell"), col("__cos")))
          .as("__cown"),
        max(when(col("__ccell") =!= col("__cell"), col("__cos")))
          .as("__cbest"))
    val a = lit(1.0d) - col("__cown")
    val b = lit(1.0d) - col("__cbest")
    val s = when(greatest(a, b) <= lit(0.0d), lit(0.0d))
      .otherwise((b - a) / greatest(a, b))
    per.withColumn("__s", graft.Readout.rdz(s, 6))
      .groupBy(col("__cell").as("cell"))
      .agg(count(lit(1)).as("n"),
        graft.Readout.rdz(
          sum(round(col("__s"), 9).cast("decimal(28,12)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_sil"),
        sum(when(col("__s") < 0.0d, 1L).otherwise(0L)).as("n_misfit"))
  }

  /** Multi-probe centroid assignment: each item lands in its `nprobe`
    * nearest cells ([[assignToCentroids]] keeps rank 1 only) —
    * (item_id, vec, cell, probe_rank) rows, nprobe per item. The map-side
    * broadcast-argmax shape is unchanged; output volume is nprobe·n.
    */
  def assignToCentroidsMulti(corpus: DataFrame, corpusId: Column,
                             corpusVec: Column, centroids: DataFrame,
                             centroidId: Column, centroidVec: Column,
                             nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val c = corpus.select(corpusId.as("item_id"), asDouble(corpusVec).as("vec"))
    val ce = centroids.select(centroidId.as("cell"),
      asDouble(centroidVec).as("__cvec"))
    val scored = c.join(broadcast(ce))
      .select(col("item_id"), col("vec"), col("cell"),
        cosine(col("vec"), col("__cvec")).as("__sim"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(round(col("__sim"), 6).desc, col("cell").asc)
    scored.withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nprobe)
      .select(col("item_id"), col("vec"), col("cell"), col("probe_rank"))
  }

  /** The DBSCAN core/border/noise triage over an ε-pair frame
    * (id_a, id_b) — everything downstream of candidate generation, shared
    * verbatim by [[dbscanBlocks]] (fixed-key blocking) and [[dbscanCells]]
    * (capped-cell blocking) so the two modes cannot drift. `universe` is
    * the distinct (node) frame every input point appears in (noise rows
    * are its anti-half). All stages are neighbor-list-sized: one count
    * aggregation, CC's pointer-jumping rounds on the core subgraph, one
    * min-fold for borders.
    *
    * The output carries each node's ε-degree `n_nbrs` (0 for isolated
    * points) — the round-7 strengthening that makes ANY lost or invented
    * ε-pair hash-visible even when the component structure absorbs it (a
    * dropped intra-clique edge changes no role and no min-id cluster
    * label, but always changes two degrees).
    */
  private def dbscanTriage(universe: DataFrame, pairs0: DataFrame,
                           minPts: Int): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    val pairs = pairs0
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // feeds the count, the core graph and the border fold
    val sym = pairs.unionAll(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val counts = sym.groupBy(col("id_a").as("node"))
      .agg(count(lit(1)).as("__nn"))
      .localCheckpoint() // read by the core filter and the degree readout
    val cores = counts
      .filter(col("__nn") + 1L >= minPts.toLong)
      .select(col("node"))
      .localCheckpoint() // read by the core-edge filter and both joins below
    val coreEdges = pairs
      .join(cores.select(col("node").as("id_a")), Seq("id_a"))
      .join(cores.select(col("node").as("id_b")), Seq("id_b"))
    // cluster id = CC component (min member id); a core whose neighbors
    // are all non-core forms its own singleton cluster
    val coreCluster = cores
      .join(graft.ops.Dedup.connectedComponents(coreEdges)
        .withColumnRenamed("id", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node"))
        .as("__comp"))
      .localCheckpoint() // read by the border fold and the final union
    val borders = sym
      .join(coreCluster.select(col("node").as("id_b"), col("__comp")),
        Seq("id_b"))
      .select(col("id_a").as("node"), col("__comp"))
      .join(cores, Seq("node"), "left_anti") // cores are not borders
      .groupBy(col("node")).agg(min(col("__comp")).as("__comp"))
    universe
      .join(coreCluster.withColumn("__role", lit("core")), Seq("node"), "left")
      .join(borders.select(col("node"), col("__comp").as("__bcomp")),
        Seq("node"), "left")
      .join(counts, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__role"),
          when(col("__bcomp").isNotNull, lit("border"))
            .otherwise(lit("noise"))).as("role"),
        coalesce(col("__comp"), col("__bcomp")).as("cluster"),
        coalesce(col("__nn"), lit(0L)).as("n_nbrs"))
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the billion-vector ANN memory story.
  // A d-dim vector is split into m contiguous subvectors; each subspace
  // gets its own tiny codebook (k centroids trained by Lloyd rounds),
  // and a vector is stored as m small integers (its per-subspace nearest
  // centroid). Search never touches the original floats: a query builds
  // an m×k distance table once, and each candidate's approximate
  // distance is m table lookups summed — the asymmetric distance
  // computation (ADC) of Jégou et al., re-expressed relationally.
  // ------------------------------------------------------------------

  /** Exact squared-L2 distance between two equal-length vectors as a
    * DECIMAL fold: each per-dimension squared difference is one IEEE
    * multiply on doubles (bit-identical in any engine), rounded at 9 and
    * summed in decimal — associative, so the fold order can never matter
    * and an oracle's per-dimension GROUP BY sum equals Spark's array
    * fold exactly. The decimal result also makes argmin tie-breaks exact
    * (no round-6 shield needed — compare the decimals, then the id).
    */
  private def l2sqDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => round((x - y) * (x - y), 9)
        .cast("decimal(28,12)")),
      lit(0).cast("decimal(28,12)"),
      // cast each partial back to the accumulator type: decimal addition
      // is exact here (terms are round-9 values, d/m of them), so the
      // cast can never round — it only pins the lambda's return type
      (acc, x) => (acc + x).cast("decimal(28,12)"))

  /** Per-subspace codebooks trained by `lloydRounds` k-means rounds from
    * [[minIdSeeds]]-style deterministic seeds (the min-id vector of each
    * label, sliced per subspace — no RNG, no trained model, so the whole
    * training unrolls into oracle SQL), plus the final PQ code of every
    * vector against the trained books.
    *
    * Scale shape per round: the codebook relation is m·k·(d/m) = k·d tiny
    * rows and always broadcasts; assignment is a broadcast join + a
    * (item, sub)-partitioned argmin window over n·m·k rows (map-side fan,
    * one per-key window pass — never a corpus self-join); the centroid
    * update is one (sub, cell, pos)-grain decimal aggregation. Codes are
    * m small integers per vector — the 4-byte-per-vector regime that
    * makes billion-scale shortlists RAM-resident; the full floats are
    * read again only by the finalist re-rank.
    *
    * Determinism: every distance is [[l2sqDec]]'s exact decimal fold;
    * argmin ties break to the smaller cell id; per-dim means accumulate
    * in DECIMAL — each round is exactly replayable, so the gate checks
    * the real training, not a fixture.
    *
    * At 10⁹+ vectors, train the books on a deterministic sample
    * ([[graft.ops.Sampling.uniformTopKSample]] — k·d rows bound the
    * codebook fit like any k-means) and code the full corpus against
    * the frozen artifact ([[pqCode]] / [[graft.streaming.Streaming
    * .pqCodesMaintain]]): training cost then never scales with the
    * corpus, and coding is embarrassingly parallel map work.
    *
    * @return (codes (item_id, sub, cell), perDim (sub, cell, pos, avg_val),
    *         books (sub, cell, cvec) — the trained codebook arrays the ADC
    *         read path joins against)
    */
  def pqTrain(corpus: DataFrame, id: Column, vec: Column, label: Column,
              m: Int, lloydRounds: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    require(lloydRounds >= 1, s"lloydRounds must be >= 1, got $lloydRounds")
    val subs = subRows(corpus, id, vec, m)
      .localCheckpoint() // read by every assignment round
    // seeds: min-id vector per label, sliced into the same m subspaces
    var books = subRows(minIdSeeds(corpus, id, vec, label)
        .select(col("cell").as("__c"), col("cvec")),
        col("__c"), col("cvec"), m)
      .select(col("sub"), col("item_id").as("cell"), col("subvec").as("cvec"))
    var codes: DataFrame = null
    var perDim: DataFrame = null
    for (r <- 1 to lloydRounds) {
      codes = pqAssign(subs, books)
      perDim = codes.join(subs, Seq("item_id", "sub"))
        .select(col("sub"), col("cell"),
          posexplode(col("subvec")).as(Seq("pos", "val")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg((sum(col("val").cast("decimal(27,8)")).cast("double") /
          count(lit(1))).as("avg_val"))
      books = perDim.groupBy(col("sub"), col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("avg_val")))),
          s => s.getField("avg_val")).as("cvec"))
        .localCheckpoint() // cut the per-round lineage (kmeansIterations' reason)
    }
    // final codes against the trained books
    (pqAssign(subs, books), perDim, books)
  }

  /** Per-subspace quantization-error report — the "how lossy is this
    * index" health readout every PQ deployment monitors (rising error
    * on fresh data = the frozen books have drifted off the corpus and
    * need retraining): for each subspace, the mean and max exact-
    * decimal squared distance between vectors and their assigned
    * codewords. One broadcast join + one m-grain fold.
    */
  def pqQuantizationError(codes: DataFrame, books: DataFrame,
                          corpus: DataFrame, id: Column, vec: Column,
                          m: Int): DataFrame =
    subRows(corpus, id, vec, m)
      .join(codes, Seq("item_id", "sub"))
      .join(broadcast(books), Seq("sub", "cell"))
      .select(col("sub"), l2sqDec(col("subvec"), col("cvec")).as("__d2"))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("__d2")).cast("double") / count(lit(1)), 6)
          .as("mean_sq_err"),
        round(max(col("__d2")).cast("double"), 6).as("max_sq_err"))

  /** The SDC (symmetric distance computation) table: exact-decimal
    * squared distances between every pair of codewords, per subspace —
    * m·k² tiny rows, always broadcast. Where ADC compares a LIVE query
    * vector against codes, SDC compares two CODED vectors without
    * touching floats on either side: approx d²(x, y) = Σ_sub
    * sdc(code_x, code_y) — the table every compressed-domain all-pairs
    * job (near-dup pairing, kNN-graph builds, SemDeDup at 10⁹ vectors)
    * reads instead of the vectors themselves.
    */
  def sdcTable(books: DataFrame): DataFrame =
    books.select(col("sub"), col("cell").as("cell_a"), col("cvec").as("__va"))
      .join(books.select(col("sub"), col("cell").as("cell_b"),
        col("cvec").as("__vb")), Seq("sub"))
      .select(col("sub"), col("cell_a"), col("cell_b"),
        l2sqDec(col("__va"), col("__vb")).as("sdc_d2"))

  /** Compressed-domain closest pairs: candidates are same-coarse-cell
    * pairs (the IVF blocking device — swap in [[dbscanCells]]' capped
    * multi-probe occupancy when cells can run hot), scored ENTIRELY
    * from codes via the broadcast [[sdcTable]] (m lookups per pair, no
    * float reads), global top-k by exact-decimal approximate distance.
    * This is near-dup pairing/SemDeDup's candidate scorer at the
    * 10⁹-vector scale: the pair join carries m small integers per side
    * instead of d floats — 32× less shuffle weight than the exact-
    * cosine pair scan, with the exact re-check applied to survivors
    * only (as [[graft.ops.Dedup.cosineNearDupPairs]] does for LSH
    * candidates).
    *
    * @param assignments (vec_id, cell) coarse blocking cells
    */
  def sdcClosestPairs(codes: DataFrame, books: DataFrame,
                      assignments: DataFrame, k: Int): DataFrame = {
    val sdc = broadcast(sdcTable(books).withColumnRenamed("sub", "__ssub"))
    val a = assignments.select(col("vec_id").as("id_a"),
      col("cell").as("__ccell"))
    val b = assignments.select(col("vec_id").as("id_b"),
      col("cell").as("__ccell"))
    val pairs = a.join(b, Seq("__ccell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val ca = codes.select(col("item_id").as("id_a"), col("sub"),
      col("cell").as("__ca"))
    val cb = codes.select(col("item_id").as("id_b"), col("sub"),
      col("cell").as("__cb"))
    pairs.join(ca, Seq("id_a"))
      .join(cb, Seq("id_b", "sub"))
      .join(sdc, col("sub") === col("__ssub") &&
        col("__ca") === col("cell_a") && col("__cb") === col("cell_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("sdc_d2")).as("__approx"))
      .orderBy(col("__approx").asc, col("id_a").asc, col("id_b").asc)
      .limit(k)
      .select(col("id_a"), col("id_b"),
        round(col("__approx").cast("double"), 6).as("approx_d2"))
  }

  /** Code vectors against a FROZEN codebook — the map-side day-2 path
    * (broadcast books, no training, no state): [[pqTrain]]'s final
    * assignment exposed for incremental code stores and streamed coding
    * ([[graft.streaming.Streaming.pqCodesMaintain]]).
    */
  def pqCode(df: DataFrame, id: Column, vec: Column, books: DataFrame,
             m: Int): DataFrame =
    pqAssign(subRows(df, id, vec, m), books)

  /** Nearest codebook entry per (vector, subspace): broadcast the tiny
    * codebook, exact-decimal distance, argmin with ties to the smaller
    * cell. Returns (item_id, sub, cell). */
  private def pqAssign(subs: DataFrame, books: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_id"), col("sub"))
      .orderBy(col("__d2").asc, col("cell").asc)
    subs.join(broadcast(books), Seq("sub"))
      .select(col("item_id"), col("sub"), col("cell"),
        l2sqDec(col("subvec"), col("cvec")).as("__d2"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("item_id"), col("sub"), col("cell"))
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: the query
    * builds one m×k distance table against the trained codebooks (tiny,
    * broadcast), each coded vector's approximate distance is the decimal
    * sum of its m looked-up cells, and the k best (distance asc, id asc —
    * exact decimal compare) are re-ranked by TRUE cosine against the full
    * floats. This is the production read path at 10⁹ vectors: the scan
    * touches only the m-integer codes + one broadcast table; full
    * vectors are fetched for k finalists only.
    *
    * Returns (rank, item_id, approx_d2, cosine) — rank by the exact
    * re-rank ([[rankTopK]]'s round-6/id rule), approx_d2 the ADC readout
    * that produced the shortlist.
    *
    * `overfetch` is the compressed-domain recall lever: shortlist
    * k·overfetch candidates by ADC, re-rank them all exactly, keep k.
    * Quantization blurs fine distance order, so a true neighbor ranked
    * 14th by ADC is recovered by over-fetch at a tiny re-rank cost —
    * PqSpec measures and pins the ladder (recall@10 on the near-random
    * sf0.001 embeddings, the hard case: 0.5 at 1×, 0.7 at 4×, 0.9 at
    * 16×; clustered production corpora compress far more gracefully).
    */
  def pqAdcTopK(codes: DataFrame, books: DataFrame, corpus: DataFrame,
                id: Column, vec: Column, queryId: Column, k: Int,
                m: Int, overfetch: Int = 1): DataFrame = {
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val q = corpus.filter(id === queryId)
      .select(id.as("query_id"), asDouble(vec).as("__qv"))
    val qsubs = subRows(q, col("query_id"), col("__qv"), m)
      .select(col("item_id").as("query_id"), col("sub"), col("subvec").as("__qs"))
    val dt = qsubs.join(books, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell"),
        l2sqDec(col("__qs"), col("cvec")).as("__dt"))
    val shortlist = codes.join(broadcast(dt), Seq("sub", "cell"))
      .filter(col("item_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(col("__dt")).as("__approx"))
      .orderBy(col("__approx").asc, col("item_id").asc)
      .limit(k * overfetch)
    val exact = shortlist
      .join(Dedup.spread(corpus).select(id.as("item_id"),
        asDouble(vec).as("__cv")), Seq("item_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("item_id"), col("__approx"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("item_id").asc)
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("item_id"),
        round(col("__approx").cast("double"), 6).as("approx_d2"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** IVF-PQ stage 1: assign every vector to its nearest coarse centroid
    * ([[assignToCentroids]]' rule verbatim) and return the RESIDUAL —
    * `vec − coarse_centroid` — per item: (vec_id, residual, cell).
    * On clustered corpora residuals concentrate near zero regardless of
    * where the cell sits in space, so PQ codebooks trained on residuals
    * quantize finer than raw-vector codebooks at the same bit budget —
    * the FAISS IVF-PQ architecture. (On the near-random test embeddings
    * that advantage vanishes and over-fetch is the recovery lever —
    * PqSpec pins the measured ladder: recall@10 0.3 at nprobe=2/1×,
    * 0.9 at nprobe=2/8×.) Broadcast join + one per-item argmax; the
    * residual subtraction is map-side `zip_with`.
    */
  def ivfPqResiduals(corpus: DataFrame, id: Column, vec: Column,
                     centroids: DataFrame, centroidId: Column,
                     centroidVec: Column): DataFrame = {
    val ce = centroids.select(centroidId.as("cell"),
      asDouble(centroidVec).as("__ccv"))
    assignToCentroids(corpus, id, vec, centroids, centroidId, centroidVec)
      .join(broadcast(ce), Seq("cell"))
      .select(col("item_id").as("vec_id"),
        zip_with(col("vec"), col("__ccv"), (a, b) => a - b).as("residual"),
        col("cell"))
  }

  /** IVF-PQ read path: the query probes its `nprobe` nearest coarse
    * cells (the [[ivfCandidates]] rule), builds one PER-PROBED-CELL
    * residual distance table against the residual-trained books (the
    * query's residual differs per cell — that's the "asymmetric" in
    * IVF-ADC), and scores ONLY items coded in a probed cell: candidate
    * volume is the probed cells' population, per-candidate cost m
    * lookups, exact-decimal sums throughout. Shortlist k·overfetch by
    * approximate distance, re-rank by true cosine on the full floats,
    * keep k. This composes the repo's two ANN levers — IVF pruning
    * (which cells to read) and PQ compression (how cheaply to score
    * what's read) — into the architecture that serves 10⁹+ vectors:
    * the scan touches m-byte codes of nprobe/k_cells of the corpus.
    *
    * @param assignments [[ivfPqResiduals]] output (vec_id, residual, cell)
    * @param centroids   the coarse quantizer (cell, cvec)
    */
  def ivfPqAdcTopK(codes: DataFrame, books: DataFrame,
                   assignments: DataFrame, corpus: DataFrame,
                   centroids: DataFrame, id: Column, vec: Column,
                   queryId: Column, k: Int, m: Int, nprobe: Int,
                   overfetch: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val q = corpus.filter(id === queryId)
      .select(id.as("query_id"), asDouble(vec).as("__qv"))
    val ce = centroids.select(col("cell").as("__ccell"),
      asDouble(col("cvec")).as("__ccv"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(round(col("__sim"), 6).desc, col("__ccell").asc)
    val probes = q.join(broadcast(ce))
      .select(col("query_id"), col("__qv"), col("__ccell"), col("__ccv"),
        cosine(col("__qv"), col("__ccv")).as("__sim"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("__ccell"),
        zip_with(col("__qv"), col("__ccv"), (a, b) => a - b).as("__qres"))
    val qs = subRows(probes, col("__ccell"), col("__qres"), m)
      .join(broadcast(probes.select(col("__ccell").as("item_id"),
        col("query_id"))), Seq("item_id"))
      .select(col("item_id").as("__ccell"), col("query_id"), col("sub"),
        col("subvec").as("__qs"))
    val dt = qs.join(books, Seq("sub"))
      .select(col("query_id"), col("__ccell"), col("sub"), col("cell"),
        l2sqDec(col("__qs"), col("cvec")).as("__dt"))
    val shortlist = codes
      .join(assignments.select(col("vec_id").as("item_id"),
        col("cell").as("__ccell")), Seq("item_id"))
      .join(broadcast(dt), Seq("__ccell", "sub", "cell"))
      .filter(col("item_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(col("__dt")).as("__approx"))
      .orderBy(col("__approx").asc, col("item_id").asc)
      .limit(k * overfetch)
    val exact = shortlist
      .join(Dedup.spread(corpus).select(id.as("item_id"),
        asDouble(vec).as("__cv")), Seq("item_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("item_id"), col("__approx"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("item_id").asc)
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("item_id"),
        round(col("__approx").cast("double"), 6).as("approx_d2"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** (id, vec) → (item_id, sub, subvec) contiguous m-split; shared by
    * training, coding, and the query's distance-table build so the slice
    * rule has exactly one definition. */
  private def subRows(df: DataFrame, id: Column, vec: Column,
                      m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val v = asDouble(vec)
    Dedup.spread(df)
      .select(id.as("item_id"), v.as("__v"))
      .withColumn("__dsub", (size(col("__v")) / lit(m)).cast("int"))
      .select(col("item_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("__v"), col("__dsub"))
      .select(col("item_id"), col("sub"),
        slice(col("__v"), col("sub") * col("__dsub") + lit(1),
          col("__dsub")).as("subvec"))
  }
}
