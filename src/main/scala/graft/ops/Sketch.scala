package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

/** Deterministic cardinality sketches — the "how many distincts without
  * a corpus-wide exact groupBy" tools a 100 TB profiling pass runs
  * first. Engine-portable by construction: the hash is the repo's md5
  * position draw, so any engine replays the sketch bit-for-bit (unlike
  * HLL, whose register layout is implementation-private).
  */
object Sketch {

  /** K-minimum-values distinct-count estimate: keep the `k` SMALLEST
    * distinct md5 positions of the value (uniform in [0, 2^32)); with
    * R = kth-smallest / 2^32, the classic unbiased estimator is
    * D̂ = (k−1)/R. Returns one row (n_min, kth_pos, est_distinct);
    * when fewer than `k` distinct positions exist the sketch saw every
    * value and the EXACT count is returned instead.
    *
    * Why KMV and not HyperLogLog: approx_count_distinct's HLL++ sketch
    * is deterministic only within one implementation — no external
    * engine can replay it, so it cannot be differentially gated. KMV
    * over the md5 draw is engine-portable, mergeable (union = take the
    * k smallest of the combined minima — the same property HLL is
    * prized for), and its ±1/√k relative error is the textbook bound.
    *
    * Determinism/exactness: positions are exact integers; the estimate
    * is one double division of exact longs, rounded at the readout.
    * Hash collisions (≈ D²/2³³) merge identically in every engine —
    * the sketch is deterministic even when slightly biased. A null
    * value hashes like any other (one distinct position), documented
    * rather than dropped.
    *
    * Scale shape: one DISTINCT aggregation on the 8-byte position (the
    * only shuffle — map-side partial distinct applies), then a
    * TakeOrdered top-k (per-partition heads, never a global sort) and a
    * k-row fold. At 100 TB the distinct-hash frame is the corpus'
    * distinct cardinality, not its row count; for corpora whose
    * DISTINCT count itself is too big to shuffle, pre-filter
    * `pos < (k · 2³²/expected_lower_bound)` — the threshold keeps every
    * candidate minimum (the standard KMV pushdown) and turns the
    * distinct into a filter-then-distinct over a vanishing fraction.
    */
  def kmvDistinct(df: DataFrame, value: Column, k: Int): DataFrame =
    kmvEstimate(kmvState(df, value, k), k)

  /** The sketch STATE: the k smallest distinct positions, one `__h` row
    * each — the mergeable object ([[kmvMergeStates]]) a streaming
    * maintainer persists per batch. k rows max, kilobytes at any corpus
    * size.
    */
  def kmvState(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    df.select(Sampling.hashPos(lit("kmv"), value).as("__h"))
      .distinct()
      .orderBy(col("__h").asc).limit(k)
  }

  /** The KMV merge law: the sketch of A ∪ B is the k smallest of the
    * two sketches' union — commutative, associative, and duplicate-
    * insensitive (positions are a SET), which is why a stream can fold
    * batches in any arrival order and land on the batch sketch EXACTLY
    * (q243 gates that equality against q240's oracle verbatim).
    */
  def kmvMergeStates(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    a.select(col("__h")).unionByName(b.select(col("__h"))).distinct()
      .orderBy(col("__h").asc).limit(k)
  }

  /** Fold a sketch state to the one-row readout (estimator contract in
    * [[kmvDistinct]]).
    */
  def kmvEstimate(state: DataFrame, k: Int): DataFrame =
    state.agg(count(lit(1)).as("n_min"), max(col("__h")).as("kth_pos"))
      .select(col("n_min"), col("kth_pos"),
        when(col("n_min") < k.toLong, col("n_min").cast("double"))
          .when(col("kth_pos") === 0L, lit(null).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 4294967296.0) /
            col("kth_pos").cast("double"), 4)).as("est_distinct"))

  /** Count-Min sketch STATE over a key column: `depth` independent hash
    * rows (md5 position draws salted `cms0..cms{d-1}`), each mapping the
    * key into `width` buckets; a cell holds the exact count of rows
    * whose key hashed there. Returned as the sparse cell table
    * (r, c, cnt) — zero cells are implicit (the estimator coalesces
    * them), so state size is min(depth·width, depth·distincts) rows.
    *
    * Why CMS next to [[kmvState]]: KMV answers "how many distincts";
    * CMS answers "how often does THIS key occur" in depth·width longs —
    * the frequency complement a 100 TB profiling pass wants without a
    * full-cardinality groupBy shuffle. Engine-portable for the same
    * reason as KMV: the hash is the repo's md5 draw, so any engine
    * rebuilds the cell table bit-for-bit.
    *
    * Scale shape: the groupBy key is (r, c) with at most depth·width
    * distinct values, so map-side partial aggregation bounds the shuffle
    * at depth·width rows PER PARTITION regardless of corpus size — the
    * whole point vs. an exact count on a billion-key column. The
    * per-row explode is d literals wide, map-side, codegen'd.
    *
    * Nulls hash like any value (the `enc` null token), matching
    * [[kmvState]]'s contract. Counts are exact longs — the estimate's
    * one-sided error (over-count only, ≤ 2N/width per row with prob.
    * 1−2⁻ᵈᵉᵖᵗʰ) comes from collisions, never from the arithmetic.
    */
  def cmsState(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20], got $width")
    df.select(posexplode(array((0 until depth).map(r =>
        Sampling.hashPos(lit(s"cms$r"), key) % width): _*))
        .as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The CMS merge law: the sketch of A ⊎ B is the cell-wise SUM of the
    * two sketches — commutative and associative (counters are a vector),
    * so a stream can fold micro-batch sketches in any arrival order and
    * land on the batch sketch EXACTLY. (Unlike KMV the fold is NOT
    * duplicate-insensitive — a redelivered batch double-counts — which
    * is why the streaming maintainer rides the versioned-overwrite
    * protocol that rewrites, never re-adds, a replayed batch.)
    */
  def cmsMergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("c"), col("cnt"))
      .unionByName(b.select(col("r"), col("c"), col("cnt")))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query the sketch for each row of `keys`: the estimate is the
    * MIN over the depth rows of the key's cell (missing cell = 0). The
    * classic one-sided guarantee: est ≥ true count always; est ≤ true +
    * 2N/width with probability 1 − 2⁻ᵈᵉᵖᵗʰ per row.
    *
    * Scale shape: the keys frame explodes to depth rows each and
    * equi-joins the (≤ depth·width)-row state — the state side always
    * broadcasts, so the probe is one map-side hash-join + a keys-grain
    * fold; no shuffle of the corpus ever happens at query time.
    */
  def cmsEstimate(keys: DataFrame, key: Column, state: DataFrame,
                  depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20], got $width")
    keys.select(key.as("key"),
        posexplode(array((0 until depth).map(r =>
          Sampling.hashPos(lit(s"cms$r"), key) % width): _*))
          .as(Seq("r", "c")))
      .join(broadcast(state), Seq("r", "c"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** PER-GROUP KMV — the cardinality PROFILE: distinct-count estimates
    * for every group in one pass ("distinct users per event type",
    * "distinct tokens per language") without a per-group exact distinct
    * shuffle at full cardinality. Same estimator as [[kmvDistinct]],
    * per group; the only window is PARTITIONED BY GROUP over the
    * deduped (group, position) frame — bounded by the group's distinct
    * count, never the corpus (and the [[kmvDistinct]] threshold
    * pushdown applies per group when even that is too big). Returns
    * (group, n_min, kth_pos, est_distinct).
    */
  def kmvDistinctBy(df: DataFrame, group: Column, value: Column,
                    k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    import org.apache.spark.sql.expressions.Window
    val pos = df.select(group.as("group"),
        Sampling.hashPos(lit("kmv"), value).as("__h"))
      .distinct()
    val w = Window.partitionBy(col("group")).orderBy(col("__h").asc)
    pos.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_min"), max(col("__h")).as("kth_pos"))
      .select(col("group"), col("n_min"), col("kth_pos"),
        when(col("n_min") < k.toLong, col("n_min").cast("double"))
          .when(col("kth_pos") === 0L, lit(null).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 4294967296.0) /
            col("kth_pos").cast("double"), 4)).as("est_distinct"))
  }

  /** CMS INNER PRODUCT — equi-join SIZE estimation from two frequency
    * sketches: |A ⋈ B on key| = Σ_v cntA(v)·cntB(v), and the sketch
    * estimate is min over hash rows of Σ_c cntA(r,c)·cntB(r,c) — the
    * classic Count-Min inner-product bound (one-sided: collisions only
    * ADD mass, so est ≥ truth always; excess ≤ ‖A‖₁‖B‖₁/width per row
    * with prob. 1−2⁻ᵈᵉᵖᵗʰ). This is the cardinality-planner read a
    * query optimizer wants before committing to a join order: both
    * sides cost one sketch build (bounded shuffle, see [[cmsState]]),
    * the product costs a ≤ depth·width-row join — the corpora are never
    * co-shuffled to ask "how big would this join be".
    *
    * Determinism: exact integer counts, integer products, integer sums
    * (bounded by n_a·n_b ≤ 2⁶³ for any realistic pair), one integer
    * min — no IEEE arithmetic at all.
    */
  def cmsJoinSizeStates(sa: DataFrame, sb: DataFrame): DataFrame =
    sa.join(sb.select(col("r"), col("c"), col("cnt").as("__cb")),
        Seq("r", "c"))
      .groupBy(col("r")).agg(sum(col("cnt") * col("__cb")).as("__dot"))
      .agg(min(col("__dot")).as("est_join_size"))

  /** [[cmsJoinSizeStates]] from raw key columns. */
  def cmsJoinSize(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                  depth: Int, width: Int): DataFrame =
    cmsJoinSizeStates(cmsState(a, aKey, depth, width),
      cmsState(b, bKey, depth, width))

  /** KMV SET ALGEBRA over two sketches — Jaccard / union / intersection
    * estimates from two [[kmvState]]s, completing the sketch family's
    * algebra (KMV union already exists as [[kmvMergeStates]]; this is
    * the read that makes two-corpus questions — "how much does shard B's
    * vocabulary overlap shard A's?" — answerable from two k-row states
    * without ever co-shuffling the corpora).
    *
    * The classic KMV overlap estimator: let U = the k smallest positions
    * of sa ∪ sb (the union sketch). Every h ∈ U is a uniform draw from
    * the union of the two value sets, and h lands in BOTH sketches iff
    * its value is in the intersection*, so n_both/|U| is an unbiased
    * Jaccard estimate with the usual ±1/√k error.
    * (*both-membership is exact only while each side's sketch is still
    * below its own kth minimum — true for every h ∈ U by construction,
    * since U's positions are ≤ both sides' kth minima or come from the
    * side that contains them.)
    *
    * Readout: (n_union_min, n_both, jaccard_est, est_union,
    * est_intersection). `est_union` follows [[kmvEstimate]]'s contract
    * (exact when the union sketch saw everything); `est_intersection` =
    * jaccard · union, computed from the two already-rounded components
    * so both engines multiply bit-identical doubles.
    *
    * Determinism/scale: every frame here is ≤ k rows (the states), the
    * joins broadcast, and the only corpus-scale work happened when the
    * states were built — the read itself is O(k) on ANY corpus pair.
    */
  def kmvOverlapStates(sa: DataFrame, sb: DataFrame, k: Int): DataFrame = {
    val su = kmvMergeStates(sa, sb, k)
    val flagged = su
      .join(broadcast(sa.select(col("__h").as("__ha"))),
        col("__h") === col("__ha"), "left")
      .join(broadcast(sb.select(col("__h").as("__hb"))),
        col("__h") === col("__hb"), "left")
    flagged.agg(
        count(lit(1)).as("n_union_min"),
        max(col("__h")).as("kth_pos"),
        sum(when(col("__ha").isNotNull && col("__hb").isNotNull, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("n_union_min"), col("n_both"),
        round(col("n_both").cast("double") /
          col("n_union_min").cast("double"), 6).as("jaccard_est"),
        when(col("n_union_min") < k.toLong, col("n_union_min").cast("double"))
          .when(col("kth_pos") === 0L, lit(null).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 4294967296.0) /
            col("kth_pos").cast("double"), 4)).as("est_union"))
      .withColumn("est_intersection",
        round(col("jaccard_est") * col("est_union"), 4))
  }

  /** [[kmvOverlapStates]] from raw value columns: build both k-row
    * sketches (each one distinct-agg + TakeOrdered on its own corpus —
    * embarrassingly parallel, never a joint shuffle) and fold the
    * overlap readout.
    */
  def kmvOverlap(a: DataFrame, aVal: Column, b: DataFrame, bVal: Column,
                 k: Int): DataFrame =
    kmvOverlapStates(kmvState(a, aVal, k), kmvState(b, bVal, k), k)
}
