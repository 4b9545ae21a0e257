package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

/** Skew-mitigation operators for hot keys at scale.
  *
  * AQE's skew-join splitting handles sort-merge joins automatically, but two
  * shapes still need explicit salting at 100 TB:
  *
  *  - a groupBy where one key holds a large share of all rows (the partial
  *    aggregate helps only when the map-side combine ratio is high — for
  *    high-cardinality aggregation state like `collect_set` it is not);
  *  - a shuffle join whose hot key exceeds what one task can hold even
  *    after AQE splitting (splitting divides the stream side, but every
  *    split still joins the full build side of that key).
  *
  * Both operators are deterministic (salt = hash of a chosen column, not
  * rand()) so re-runs and retried tasks produce identical partitioning —
  * required for exactly-once sinks and for this engine's oracle gate.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of `c` — use a roughly-unique
    * column (an id) so rows of a hot key spread uniformly.
    */
  def saltOf(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  /** Two-phase (salted) aggregation: partial-aggregate by (keys, salt),
    * then final-aggregate by keys. `partial` builds the per-salt
    * accumulator from input columns; `merge` combines the per-salt partials.
    *
    * Example — a skew-proof distinct count. The salt MUST be a function of
    * the counted column (`u`) so each distinct value lands in exactly one
    * salt bucket and the per-bucket distinct counts sum correctly:
    * {{{
    *   saltedAgg(df, Seq(col("k")), saltOf(col("u"), 64),
    *     Seq(count_distinct(col("u")).as("p")),
    *     Seq(sum(col("p")).as("n_distinct")))
    * }}}
    * (For salt-insensitive aggregates — sum/count/min/max — any roughly
    * uniform salt column works.)
    *
    * The first shuffle spreads a hot key over `buckets` reducers; the
    * second shuffles only `buckets` rows per key.
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salt: Column,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val stage1 = df.groupBy(keys :+ salt.as("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys: _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join of a skewed fact side against a dimension too large to
    * broadcast: facts get a deterministic salt from `factSalt`; the dim side
    * is replicated once per salt value (explode of a literal range) so every
    * (key, salt) bucket finds its dim row. The hot key's rows now land on
    * `buckets` different reducers instead of one.
    *
    * Replication cost: |dim| × buckets rows through the dim-side shuffle —
    * pick `buckets` ≈ hot-key rows / target-rows-per-task, and salt only
    * when AQE skew handling is insufficient.
    */
  def saltedJoin(facts: DataFrame, factKey: Column, factSalt: Column,
                 dim: DataFrame, dimKey: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` copies of every unmatched dim
    // row (the dim side is replicated per salt before the join)
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val saltedFacts = facts.withColumn("__salt", factSalt)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFacts.join(saltedDim,
        factKey === dimKey && saltedFacts("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Skew DIAGNOSTICS: the report that decides whether the operators above
    * are needed — per prospective join/aggregation key, the top `k`
    * heaviest values with row count and share of the table. A key whose
    * top value holds ≥ a few percent of 100 TB is a salting candidate; one
    * whose top share is ~1/cardinality is not. Counts are the sufficient
    * statistic (map-side combine), the top-k is a TakeOrdered over the
    * count frame — no full sort, no windows over row-grain data. Share is
    * one IEEE division, rounded; ties break on the value's string form
    * with NULLS LAST (matching the SQL engines' default, so a null key
    * tying at a top-k boundary picks the same row everywhere) and the
    * report is deterministic enough to hash-gate.
    */
  def skewReport(df: DataFrame, key: Column, k: Int = 5): DataFrame =
    skewFinish(keyCounts(df, key), k)

  /** [[skewReport]]'s sufficient statistic: one row count per key. Split
    * out because it is exactly the aggregation a STREAMING skew monitor
    * runs in complete mode (state = one long per key — the same bound as
    * an exact distinct count, and acceptable by construction: the
    * operator diagnoses keys you intend to shuffle on, so if the counts
    * frame doesn't fit in state, the aggregation it's vetting wouldn't
    * fit either); the landed counts then flow through the SAME
    * [[skewFinish]], which is what lets the streamed gate share the
    * batch oracle verbatim (the q150/q147 pattern).
    */
  def keyCounts(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key_value")).agg(count(lit(1)).as("n_rows"))

  /** Finishing fold from a landed counts frame to the ranked report —
    * integer counts in, so batch and streamed paths are bit-identical.
    */
  def skewFinish(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val total = counts.agg(sum(col("n_rows")).as("__tot"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_rows").cast("double") / col("__tot").cast("double"), 6))
      .orderBy(col("n_rows").desc,
        col("key_value").cast("string").asc_nulls_last)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc,
            col("key_value").cast("string").asc_nulls_last)).cast("long"))
      .select(col("rank"), col("key_value"), col("n_rows"), col("share"))
  }
}
