package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * All samples are pure functions of (stratum, id): no RNG state, so a
  * sample is reproducible across engines, retries, partitionings, and
  * re-runs — the property that matters when a 100 TB job fails halfway and
  * must produce the SAME sample on retry (Spark's `df.sample` is seeded
  * per-partition and changes under repartitioning). The hash is md5 so any
  * engine with md5 + integer ops draws the identical sample (oracle-checked
  * in SparkEntry q63).
  */
object Sampling {

  /** The row's position in [0, 2^32): first 8 hex chars of
    * md5(stratum|id) — uniform, deterministic, engine-portable.
    */
  private def hashPos(strata: Column, id: Column): Column =
    conv(substring(md5(concat(strata.cast("string"), lit("|"),
      id.cast("string"))), 1, 8), 16, 10).cast("long")

  /** Stratified sample: keep ~`fraction` of rows within every stratum.
    * Because the threshold test is per-row on a uniform hash, strata are
    * sampled independently at the same rate regardless of size — no
    * per-stratum counting pass, no shuffle, fully pushdown-friendly
    * (the filter runs at the scan).
    *
    * Samples NEST: the rows kept at fraction f are a superset of those
    * kept at any f' < f (the hash is fixed; only the threshold moves) —
    * so growing a sample never discards already-processed rows.
    */
  def stratifiedSample(df: DataFrame, strata: Column, id: Column,
                       fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    df.filter(hashPos(strata, id) < (fraction * 4294967296.0).toLong)
  }
}
