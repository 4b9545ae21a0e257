package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators over scored/labeled frames — the metrics a
  * training pipeline computes on every filter model, quality classifier
  * and retrieval ranker it ships: calibration bins, ROC-AUC, per-class
  * precision/recall/F1. All rank/count based and oracle-exact; at 100 TB
  * these run over evaluation SAMPLES (the q171 audit contract), so the
  * single-partition rank windows are eval-set-grain by design, never
  * corpus-grain.
  */
object Eval {

  /** Calibration (reliability) bins: rows ranked by `score` into
    * `bins` equal-count buckets (ntile over the score-then-id total
    * order), each reporting its mean score and positive rate — the
    * curve that says whether a quality scorer's numbers MEAN anything
    * (mean_score tracking pos_rate = calibrated; flat pos_rate = the
    * score is noise). Returns (bin, n, mean_score, pos_rate).
    *
    * Determinism: mean scores ride the round-9 → decimal-sum idiom;
    * rates are integer ratios; ntile's quotient-remainder fill is the
    * SQL standard both engines implement over a total order.
    */
  def reliabilityBins(df: DataFrame, id: Column, score: Column,
                      positive: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val w = Window.orderBy(col("__s").asc, col("__id").asc)
    df.select(id.as("__id"), score.as("__s"),
        positive.cast("boolean").as("__p"))
      .withColumn("bin", ntile(bins).over(w).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("__s"), 9).cast("decimal(28,12)")).as("__ss"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))
      .select(col("bin"), col("n"),
        round(col("__ss").cast("double") / col("n").cast("double"), 6)
          .as("mean_score"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** ROC-AUC by the rank-sum (Mann–Whitney) identity with PROPER tied-
    * rank handling: tied scores share the average of their rank range,
    * so AUC counts a tie as half a concordant pair — the textbook
    * estimator, not the row_number() shortcut that silently biases
    * toward the tie-break order. Returns one row (n_pos, n_neg, auc);
    * auc is null when either class is empty.
    *
    * Determinism: average ranks are exact half-integers carried in
    * DECIMAL(38,1); the final expression is one IEEE tree. Scale: one
    * rank window over the eval set + one fold.
    */
  def binaryAuc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val rw = Window.orderBy(col("__s").asc)
    val sw = Window.partitionBy(col("__s"))
    val ranked = base
      .withColumn("__rmin", rank().over(rw).cast("long"))
      .withColumn("__ties", count(lit(1)).over(sw))
      // avg rank = rmin + (ties-1)/2, held exactly as a half-integer
      .withColumn("__ar",
        (lit(2L) * col("__rmin") + col("__ties") - lit(1L))
          .cast("decimal(38,1)") / lit(2))
    ranked.agg(
        sum(when(col("__p"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__p"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__p"), col("__ar"))).as("__sr"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__sr").cast("double") -
              (col("n_pos") * (col("n_pos") + lit(1L))).cast("double") / 2.0d) /
              (col("n_pos") * col("n_neg")).cast("double"), 6)).as("auc"))
  }

  /** Per-class precision / recall / F1 from (actual, predicted) label
    * pairs — the classifier report card. Classes are the UNION of
    * actual and predicted labels (a class the model invents shows up
    * with recall null rather than disappearing). precision = tp/|pred|,
    * recall = tp/|actual|, F1 = 2pr/(p+r); each null when its
    * denominator is zero. Returns
    * (label, n_actual, n_predicted, n_correct, precision, recall, f1).
    *
    * Scale shape: one (actual, predicted) count aggregation — the
    * confusion matrix is the sufficient statistic, |classes|² rows max —
    * then class-grain folds. Rates are integer-fed IEEE divisions.
    */
  def classifierMetrics(df: DataFrame, actual: Column,
                        predicted: Column): DataFrame = {
    val cells = df.select(actual.cast("string").as("__a"),
        predicted.cast("string").as("__p"))
      .groupBy(col("__a"), col("__p")).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // three class-grain folds read it
    val byActual = cells.groupBy(col("__a").as("label"))
      .agg(sum(col("__n")).as("n_actual"))
    val byPred = cells.groupBy(col("__p").as("label"))
      .agg(sum(col("__n")).as("n_predicted"))
    val correct = cells.filter(col("__a") === col("__p"))
      .select(col("__a").as("label"), col("__n").as("n_correct"))
    val p = col("n_correct").cast("double") / col("n_predicted").cast("double")
    val r = col("n_correct").cast("double") / col("n_actual").cast("double")
    byActual.join(byPred, Seq("label"), "full_outer")
      .join(correct, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .select(col("label"), col("n_actual"), col("n_predicted"),
        col("n_correct"),
        when(col("n_predicted") === 0L, lit(null).cast("double"))
          .otherwise(round(p, 6)).as("precision"),
        when(col("n_actual") === 0L, lit(null).cast("double"))
          .otherwise(round(r, 6)).as("recall"),
        when(col("n_predicted") === 0L || col("n_actual") === 0L ||
            col("n_correct") === 0L, lit(null).cast("double"))
          .otherwise(round(lit(2.0d) * p * r / (p + r), 6)).as("f1"))
  }
}
