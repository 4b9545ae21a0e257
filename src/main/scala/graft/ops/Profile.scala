package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column statistics in ONE aggregation pass — the
  * "analyze the corpus before you train on it" step (and the statistics a
  * cost-based planner would collect).
  *
  * All columns' stats are computed in a single `agg` over the table, then
  * pivoted to long form with a map-side explode — the table is scanned
  * once no matter how many columns are profiled. Exact distinct counts
  * make the result oracle-checkable; each additional exact-distinct column
  * adds a plan Expand (Spark's multi-distinct rewrite), so at extreme
  * widths switch `exact = false` to HLL (`approx_count_distinct`), which
  * collapses the pass to a plain partial-aggregate.
  */
object Profile {

  /** Long-form profile: one row per profiled column with row/non-null/
    * distinct counts and min/max rendered as strings (numeric min/max are
    * rendered in integer/decimal form by both Spark and DuckDB, so the
    * string form stays comparable across engines).
    */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column"),
          col("__rows").as("n_rows"),
          col(s"__nn_$c").as("n_nonnull"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_val"),
          col(s"__max_$c").as("max_val"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Winsorize: clamp `value` into its stratum's [loQ, hiQ] band — the
    * outlier-capping pass that keeps a handful of absurd feature values
    * (scraped prices, runaway token counts) from dominating a model's
    * normalization. Thresholds are EXACT ORDER STATISTICS (the value at
    * rank ceil(q·n), ties broken by `id`), not interpolated quantiles: an
    * interpolated threshold is an arithmetic blend two engines can
    * disagree on by 1 ulp — and unlike a membership test, a winsorized
    * OUTPUT contains the threshold itself, so it must be a value that
    * exists in the data. Any engine that sorts identically produces the
    * identical clamp (oracle-checked in SparkEntry q98).
    *
    * One window pass per stratum for ranks (the same shuffle the
    * aggregation would need anyway), one single-row-per-stratum broadcast
    * back; the clamp itself is map-side.
    */
  def winsorize(df: DataFrame, strata: Column, value: Column, id: Column,
                loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(0.0 <= loQ && loQ < hiQ && hiQ <= 1.0,
      s"need 0 <= loQ < hiQ <= 1, got $loQ, $hiQ")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(value.asc, id.asc)
    val ranked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(strata)))
    // rank of the q-th order statistic, 1-indexed; q=0 -> first value
    def rankOf(q: Double) =
      greatest(ceil(lit(q) * col("__n")).cast("long"), lit(1L))
    val thr = ranked
      .filter(col("__rn") === rankOf(loQ) || col("__rn") === rankOf(hiQ))
      .groupBy(strata.as("__s"))
      .agg(min(when(col("__rn") === rankOf(loQ), value)).as("__lo"),
        max(when(col("__rn") === rankOf(hiQ), value)).as("__hi"))
    df.join(broadcast(thr), strata <=> col("__s"))
      .withColumn("clamped", least(greatest(value, col("__lo")), col("__hi")))
      .drop("__s", "__lo", "__hi")
  }

  /** Per-group Gini concentration index over a non-negative integer
    * measure: `G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)` with xᵢ ascending —
    * the "how concentrated is this corpus source" inequality readout
    * (0 = uniform, →1 = one giant doc). Rank × measure products are
    * 64-bit exact and accumulate in DECIMAL(38,0) (Σi·x crosses 2^63 at
    * ~10^8 rows × 10^3 measure — well inside this module's scale
    * claims), so the only float operation is the final division —
    * exact, engine-identical. Tie order among
    * equal values cannot change the result (equal xᵢ commute in Σi·xᵢ),
    * but the rank window still tie-breaks on `id` for a fully
    * deterministic plan.
    *
    * Scale shape: one shuffle on the group key; the rank window's
    * per-task sort is per-group (the q32 bound). Groups with Σx = 0
    * return null rather than dividing by zero.
    */
  def giniIndex(df: DataFrame, group: Column, measure: Column,
                id: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g")).orderBy(col("__x").asc,
      col("__id").asc)
    val sums = df
      .select(group.as("__g"), measure.cast("long").as("__x"),
        id.as("__id"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__s0"),
        sum((col("__i") * col("__x")).cast("decimal(38,0)")).as("__s1"))
    sums.select(col("__g"), col("n"),
      when(col("__s0") === 0L, lit(null).cast("double"))
        .otherwise(
          (lit(2.0d) * col("__s1").cast("double") -
            (col("n") + 1L).cast("double") * col("__s0").cast("double")) /
          (col("n").cast("double") * col("__s0").cast("double")))
        .as("gini"))
  }

  /** Ordered top-k list aggregation: per group, the top `k` items by
    * `rank` (descending, ties broken by the item's string form ascending)
    * rendered as one comma-joined string column — the "show me the
    * exemplars per bucket" readout, deterministic enough to hash-gate.
    *
    * `collect_list` alone is partition-order-dependent; the determinism
    * comes from (a) pre-filtering to the top k via a ranked window, then
    * (b) sorting the collected (rank-position, item) structs with
    * `array_sort` BEFORE joining — the collected array's arrival order
    * never reaches the output.
    *
    * Scale shape: the window pass shuffles once on the group key and the
    * per-task sort is per-group; the collect aggregates at most k
    * struct rows per group. k is a small constant — the output row is
    * O(k), never O(group).
    */
  def topKList(df: DataFrame, group: Seq[Column], item: Column,
               rank: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val names = group.indices.map(i => s"__g$i")
    val keyed = df.select(
      group.zip(names).map { case (c, n) => c.as(n) } :+
        item.cast("string").as("__item") :+ rank.as("__rank"): _*)
    val w = Window.partitionBy(names.map(col): _*)
      .orderBy(col("__rank").desc, col("__item").asc)
    keyed.withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n_items"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__item")))),
          x => x.getField("__item")), ",").as("top_items"))
  }
}
