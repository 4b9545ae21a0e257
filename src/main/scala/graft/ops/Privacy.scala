package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance re-identification audits — the pre-release checks a
  * dataset owner runs before a corpus (or its metadata) leaves the
  * trust boundary. Both operators quantify linkage risk against a
  * chosen set of quasi-identifier (QI) columns: attributes that are
  * individually innocuous but jointly identifying (the Sweeney
  * zip/birthdate/sex result).
  *
  * Shape at scale: each audit is two chained hash aggregations (row →
  * QI group, group → histogram), both with map-side partial
  * aggregation — one shuffle at QI-group grain, a second at histogram
  * grain (≤ distinct sizes rows). Corpus-linear, no windows, no joins:
  * this runs casually over the full 100 TB table.
  */
object Privacy {

  /** k-anonymity histogram: group rows by the QI tuple, then fold group
    * sizes to (group_size, n_groups, n_rows, at_risk) — `at_risk` marks
    * sizes below `k`, i.e. equivalence classes small enough that a QI
    * match re-identifies a person among fewer than k candidates. The
    * release gate is "no at_risk rows"; the histogram (rather than a
    * bare pass/fail) shows HOW FAR the table is from k-anonymous, which
    * is what decides between suppression and coarser bucketing.
    *
    * NULL QI values group together (Spark's groupBy null semantics,
    * matching SQL GROUP BY) — a null is itself a linkable value.
    */
  def kAnonymityHistogram(df: DataFrame, qi: Seq[Column],
                          k: Int): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("group_size"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk", col("group_size") < k)
      .orderBy("group_size")
  }

  /** l-diversity histogram: per QI group, the number of DISTINCT values
    * of the `sensitive` attribute, folded to (l_distinct, n_groups,
    * n_rows, at_risk) — `at_risk` marks groups below `l`, i.e. classes
    * where a QI match discloses the sensitive value (l = 1: everyone in
    * the class shares it — k-anonymity alone does not prevent this
    * homogeneity attack, which is the whole reason l-diversity exists).
    *
    * NULL sensitive values are NOT counted as a distinct value
    * (count-distinct SQL semantics, identical in any replaying engine):
    * a group whose sensitive attribute is entirely null reads l = 0 —
    * flagged at-risk, which is the conservative direction.
    */
  def lDiversityHistogram(df: DataFrame, qi: Seq[Column],
                          sensitive: Column, l: Int): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column required")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qi: _*)
      .agg(countDistinct(sensitive).as("__l"), count(lit(1)).as("__sz"))
      .groupBy(col("__l").as("l_distinct"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk", col("l_distinct") < l)
      .orderBy("l_distinct")
  }
}
