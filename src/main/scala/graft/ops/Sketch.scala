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
    // r13: project to the key FIRST (shuffle only key bytes), then spread —
    // the depth-way explode + map-side partial agg otherwise runs on the
    // input's partitioning, which for a single-file parquet scan (or a
    // one-file micro-batch) is ONE core. Cell counts are order-free
    // integer sums, so the fold is bit-identical under any partitioning.
    Dedup.spread(df.select(key.as("__cms_key")))
      .select(posexplode(array((0 until depth).map(r =>
        Sampling.hashPos(lit(s"cms$r"), col("__cms_key")) % width): _*))
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

  /** Fixed-bin quantile sketch STATE — the quantile member of the sketch
    * family (KMV = distinct count, CMS = frequency, QBIN = quantiles):
    * ≤ `bins` rows of (bin, n) over the pinned grid
    * `bin = clamp(⌊(x − lo)/w⌋, 0, bins−1)`; out-of-range values clamp
    * into the edge bins, NULLs drop. Mergeable by bin-wise sum
    * ([[qbinMergeStates]] — counters are a vector, the CMS law), so a
    * stream folds micro-batch states in any batching and lands on the
    * batch state EXACTLY. Choose (lo, w, bins) from the value range the
    * way CMS chooses width from key cardinality; the readout's error is
    * ≤ one bin width by construction (spec-pinned).
    *
    * Why fixed bins and not t-digest/KLL: those sketches are
    * deterministic only within one implementation (merge order moves
    * centroids), so no external engine can replay them — the same
    * reason [[kmvState]] replaces HLL. A pinned grid is engine-portable,
    * exactly mergeable, and its error bound is the width you chose.
    *
    * Scale shape: one map-side-combinable aggregation to ≤ bins rows —
    * the shuffle carries bins rows per partition at ANY corpus size.
    */
  def qbinState(df: DataFrame, value: Column, lo: Double, w: Double,
                bins: Int): DataFrame = {
    require(w > 0, s"bin width must be positive, got $w")
    require(bins >= 2 && bins <= (1 << 16),
      s"bins must be in [2, 65536], got $bins")
    Dedup.spread(df)
      .filter(value.isNotNull)
      .select(least(greatest(
          floor((value.cast("double") - lit(lo)) / lit(w)).cast("long"),
          lit(0L)), lit(bins - 1L)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** The QBIN merge law: state(A ⊎ B) = bin-wise sum — commutative,
    * associative, NOT duplicate-insensitive (like [[cmsMergeStates]]),
    * so the streaming maintainer rides the versioned-overwrite protocol.
    */
  def qbinMergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bin"), col("n"))
      .unionByName(b.select(col("bin"), col("n")))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"))

  /** GROUPED quantile-bins state — [[qbinState]] keyed by a group
    * column (the [[kmvDistinctBy]] pattern): ≤ groups·bins rows of
    * (group, bin, n), same pinned grid, same bin-wise-sum merge law
    * per group. The per-stratum distribution table a profiling pass
    * publishes — one map-side-combinable aggregation at any corpus
    * size.
    */
  def qbinStateBy(df: DataFrame, group: Column, value: Column,
                  lo: Double, w: Double, bins: Int): DataFrame = {
    require(w > 0, s"bin width must be positive, got $w")
    require(bins >= 2 && bins <= (1 << 16),
      s"bins must be in [2, 65536], got $bins")
    Dedup.spread(df)
      .filter(value.isNotNull)
      .select(group.as("group"), least(greatest(
          floor((value.cast("double") - lit(lo)) / lit(w)).cast("long"),
          lit(0L)), lit(bins - 1L)).as("bin"))
      .groupBy(col("group"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** The grouped QBIN merge law: state(A ⊎ B) = bin-wise sum PER GROUP —
    * [[qbinMergeStates]] keyed by the group column; commutative,
    * associative, not duplicate-insensitive, so the streamed maintainer
    * ([[graft.streaming.Streaming.qbinMaintainBy]]) rides the
    * versioned-overwrite protocol. A group absent from one side simply
    * carries the other side's rows (union semantics) — the per-group
    * empty law.
    */
  def qbinMergeStatesBy(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("group"), col("bin"), col("n"))
      .unionByName(b.select(col("group"), col("bin"), col("n")))
      .groupBy(col("group"), col("bin"))
      .agg(sum(col("n")).as("n"))

  /** Per-group quantile readout from a [[qbinStateBy]] state — the
    * [[qbinQuantiles]] arithmetic with every stage keyed by `group`:
    * the cumulative count is a (group, bin ≤ bin) triangular broadcast
    * self-join co-keyed on the group (≤ groups·bins² pairs — state
    * grain, not corpus grain), the per-(group, q) pick is a min-struct
    * fold. Groups whose state is empty simply emit no rows (the empty
    * law, per group).
    */
  def qbinQuantilesBy(state: DataFrame, qs: Seq[Double], lo: Double,
                      w: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val st = state.localCheckpoint() // read by totals, cum and the pick
    val tot = st.groupBy(col("group")).agg(sum(col("n")).as("__N"))
    val r2 = st.select(col("group").as("__g2"), col("bin").as("__b2"),
      col("n").as("__n2"))
    val cum = st.join(broadcast(r2),
        col("__g2") === col("group") && col("__b2") <= col("bin"))
      .groupBy(col("group"), col("bin"), col("n"))
      .agg(sum(col("__n2")).as("__c"))
      .withColumn("__cb", col("__c") - col("n"))
    val qframe = st.sparkSession.createDataFrame(
      st.sparkSession.sparkContext.parallelize(
        qs.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType))))
    cum.join(broadcast(tot), Seq("group"))
      .crossJoin(broadcast(qframe))
      .filter(col("__c").cast("double") >= col("q") * col("__N").cast("double"))
      .groupBy(col("group"), col("q"))
      .agg(min(struct(col("bin"), col("n"), col("__cb"), col("__N")))
        .as("__pick"))
      .select(col("group"), col("q"),
        round(lit(lo) + lit(w) * (col("__pick.bin").cast("double") +
          (col("q") * col("__pick.__N").cast("double") -
            col("__pick.__cb").cast("double")) /
          col("__pick.n").cast("double")), 6).as("est"))
      .orderBy("group", "q")
  }

  /** Quantile readout from a QBIN state: for each q, find the first bin
    * whose cumulative count reaches rank q·N and interpolate linearly
    * inside it — `est = lo + w·(bin + (q·N − cum_before)/n_bin)`,
    * rounded at 6 dp. Deterministic cross-engine: counts are exact
    * longs (< 2⁵³, so the double casts are value-preserving) and the
    * interpolation is one fixed-shape IEEE tree both engines evaluate
    * identically. An EMPTY state returns no rows (the empty law).
    *
    * Scale shape: everything operates on the ≤ bins-row state — the
    * cumulative count is a triangular broadcast self-join (≤ bins²
    * pairs, partition-safe; NOT an unpartitioned window, which the
    * mechanical plan sweep rightly bans), and the per-q pick is a
    * min-struct fold over ≤ |qs|·bins candidate rows.
    */
  def qbinQuantiles(state: DataFrame, qs: Seq[Double], lo: Double,
                    w: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val st = state.localCheckpoint() // read by total, cum and the pick
    val tot = st.agg(sum(col("n")).as("__N"))
    val r2 = st.select(col("bin").as("__b2"), col("n").as("__n2"))
    val cum = st.join(broadcast(r2), col("__b2") <= col("bin"))
      .groupBy(col("bin"), col("n"))
      .agg(sum(col("__n2")).as("__c"))
      .withColumn("__cb", col("__c") - col("n"))
    val qframe = st.sparkSession.createDataFrame(
      st.sparkSession.sparkContext.parallelize(
        qs.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType))))
    qframe.crossJoin(broadcast(tot))
      .join(broadcast(cum),
        col("__c").cast("double") >= col("q") * col("__N").cast("double"))
      .groupBy(col("q"))
      .agg(min(struct(col("bin"), col("n"), col("__cb"), col("__N")))
        .as("__pick"))
      .select(col("q"),
        round(lit(lo) + lit(w) * (col("__pick.bin").cast("double") +
          (col("q") * col("__pick.__N").cast("double") -
            col("__pick.__cb").cast("double")) /
          col("__pick.n").cast("double")), 6).as("est"))
      .orderBy("q")
  }
}
