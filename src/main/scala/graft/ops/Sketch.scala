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
}
