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
}
