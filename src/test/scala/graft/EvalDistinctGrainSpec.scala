package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eval

/** Round-6 rewrite gate for [[Eval.binaryAuc]] / [[Eval.reliabilityBins]]:
  * the distinct-grain restatement (banded prefix sum + count-arithmetic
  * ranks) must (a) equal the legacy per-row single-window formulation
  * bit-for-bit on tie-heavy, null-bearing, boundary-straddling data, and
  * (b) plan with NO unpartitioned WindowExec — the r5 verdict's "one task
  * ranks the whole eval set" exposure, now structurally impossible.
  */
class EvalDistinctGrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-round-6 formulations, kept verbatim as the differential
    * reference (they ARE the oracle semantics, q193/q194's SQL twins).
    */
  private def legacyAuc(df: DataFrame, score: Column,
                        positive: Column): DataFrame = {
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val rw = Window.orderBy(col("__s").asc)
    val sw = Window.partitionBy(col("__s"))
    base
      .withColumn("__rmin", rank().over(rw).cast("long"))
      .withColumn("__ties", count(lit(1)).over(sw))
      .withColumn("__ar",
        (lit(2L) * col("__rmin") + col("__ties") - lit(1L))
          .cast("decimal(38,1)") / lit(2))
      .agg(
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

  private def legacyBins(df: DataFrame, id: Column, score: Column,
                         positive: Column, bins: Int): DataFrame = {
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

  /** Tie-heavy fixture: 400 rows over only 37 distinct scores (every bin
    * boundary lands inside a tie group for most bin counts), positives
    * interleaved against the id tie-break, plus a null-score group.
    */
  private lazy val fixture = {
    val rows = (0 until 400).map { i =>
      val s: java.lang.Double =
        if (i % 40 == 7) null else (i % 37).toDouble / 10.0
      (i.toLong, s, (i * 2654435761L % 3) == 0L)
    }
    rows.toDF("id", "score", "label").repartition(7).cache()
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("binaryAuc equals the legacy single-window formulation") {
    assert(rows(Eval.binaryAuc(fixture, col("score"), col("label"))) ===
      rows(legacyAuc(fixture, col("score"), col("label"))))
  }

  test("reliabilityBins equals legacy ntile across bin counts") {
    for (bins <- Seq(2, 7, 10, 399, 401)) {
      assert(
        rows(Eval.reliabilityBins(fixture, col("id"), col("score"),
          col("label"), bins)) ===
        rows(legacyBins(fixture, col("id"), col("score"), col("label"), bins)),
        s"bins=$bins diverged")
    }
  }

  test("averagePrecision: the generalized prefix carries positives — AP on the fixture is finite and in [0,1]") {
    val r = Eval.averagePrecision(fixture.filter(col("score").isNotNull),
        col("score"), col("label"))
      .select("ap").as[Option[Double]].head()
    assert(r.exists(v => v >= 0.0 && v <= 1.0))
  }

  test("averagePrecision / ksStatistic fail LOUDLY on null scores") {
    // r6 ADVICE: a null score used to form its own group and rank
    // nulls-first in Spark but nulls-last in a DuckDB restatement —
    // a silently wrong statistic. The contract is now enforced via
    // raise_error carried through the existing one-row fold.
    val withNull = Seq((Some(0.9), true), (None, false), (Some(0.2), true))
      .toDF("s", "p")
    val e1 = intercept[Exception] {
      graft.ops.Eval.averagePrecision(withNull, $"s", $"p").collect()
    }
    assert(e1.getMessage.contains("null scores are unsupported"))
    val e2 = intercept[Exception] {
      graft.ops.Eval.ksStatistic(withNull, $"s", $"p").collect()
    }
    assert(e2.getMessage.contains("null values are unsupported"))
    // and non-null inputs still compute (the guard costs nothing)
    val clean = Seq((0.9, true), (0.4, false), (0.2, true)).toDF("s", "p")
    assert(!graft.ops.Eval.averagePrecision(clean, $"s", $"p")
      .select("ap").head().isNullAt(0))
  }

  test("no unpartitioned WindowExec in the q193/q194/q215/q225 plans") {
    val helper =
      new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q193_reliability_bins", "q194_auc", "q215_pr_auc",
        "q225_ks_drift")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // finalize the adaptive plan before inspecting it
      val offenders =
        helper.collect(df.queryExecution.executedPlan) {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
      assert(offenders.isEmpty,
        s"$q still ranks in a single task:\n${offenders.mkString("\n")}")
    }
  }
}
