package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

/** Model-evaluation operators over scored/labeled frames — the metrics a
  * training pipeline computes on every filter model, quality classifier
  * and retrieval ranker it ships: calibration bins, ROC-AUC, per-class
  * precision/recall/F1. All rank/count based and oracle-exact.
  *
  * Scale contract (round-6 rewrite): the rank arithmetic runs over the
  * DISTINCT-SCORE sufficient statistic `(score → count, pos_count)`, and
  * the one global prefix sum those ranks need is computed with the
  * winsorize band device — a `percentile_approx` pivot grid splits the
  * score axis into bands, band offsets come from a tiny band×band join,
  * and the only cumulative windows are PARTITIONED (by band, or by score
  * for tie-splitting) — so NO single-partition WindowExec survives in any
  * plan here (PlanSpec pins that), and nothing serializes the eval set
  * through one task even when "the eval set" is a full corpus scoring
  * run. NaN scores are unsupported (filter upstream) — the band
  * assignment, like [[Profile.winsorize]]'s sketch, has no defined rank
  * for NaN.
  */
object Eval {

  /** Attach `__below` — the number of rows with STRICTLY smaller score
    * (nulls ranked first, as one tied group) — to a distinct-score frame
    * carrying (`__s`, `__n` weight). The distributed prefix sum: pivot
    * grid → per-band totals → band offsets via the band×band self-join
    * (band frame ≤ grid+2 rows, broadcast NL) → intra-band running sum
    * partitioned by band. No unpartitioned window; every stage is
    * result- or band-grain except the one partitioned cumulative pass.
    */
  private[ops] def withBelow(perScore: DataFrame,
                             alsoPositives: Boolean = false,
                             groups: Seq[String] = Nil): DataFrame = {
    val grid = 256
    val fracs = (0 to grid).map(_.toDouble / grid)
    val gcols = groups.map(col)
    val pivAgg = percentile_approx(col("__s"),
      lit(fracs.toArray), lit(1000)).as("__piv")
    // band = pivots strictly below the score; null scores (null predicate
    // → element dropped) land in band 0 ahead of the smallest values,
    // where the nulls-first intra-band sort ranks them first. With
    // `groups` set (round-7: the per-stratum form winsorize's in-band
    // selection runs on), every stage keys by the group columns too and
    // the grid is per-group; the group-grain pivot frame joins without a
    // broadcast pin — |groups| × grid cells can exceed driver comfort,
    // AQE decides.
    // group-key joins are NULL-SAFE (<=> , like the bandOff stage):
    // a plain equi-join would silently drop rows whose group key is
    // null while any SQL oracle's GROUP BY retains the null group —
    // a latent gate mismatch and data loss on nullable group columns
    val banded = (if (groups.isEmpty)
        perScore.crossJoin(broadcast(perScore.agg(pivAgg)))
      else {
        val piv = perScore.groupBy(gcols: _*).agg(pivAgg)
          .select(groups.map(g => col(g).as(s"__g_$g")) :+ col("__piv"): _*)
        perScore.join(piv,
            groups.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _))
          .drop(groups.map(g => s"__g_$g"): _*)
      })
      .withColumn("__band", size(filter(col("__piv"), p => p < col("__s"))))
      .drop("__piv")
    val bandTot = banded.groupBy((gcols :+ col("__band")): _*)
      .agg(sum(col("__n")).as("__bt"),
        (if (alsoPositives) sum(col("__np")) else sum(lit(0L))).as("__bp"))
    val aEqB = groups.map(g => col(s"a.$g") <=> col(s"b.$g"))
      .foldLeft(col("a.__band") > col("b.__band"))(_ && _)
    val bandOff = bandTot.alias("a")
      .join((if (groups.isEmpty) broadcast(bandTot.alias("b"))
             else bandTot.alias("b")), aEqB, "left")
      .groupBy((groups.map(g => col(s"a.$g").as(g)) :+
        col("a.__band").as("__band")): _*)
      .agg(coalesce(sum(col("b.__bt")), lit(0L)).as("__boff"),
        coalesce(sum(col("b.__bp")), lit(0L)).as("__poff"))
    val wIntra = Window.partitionBy((gcols :+ col("__band")): _*)
      .orderBy(col("__s").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val offR = bandOff.select(
      groups.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("__band").as("__g_band"), col("__boff"), col("__poff")): _*)
    val joined = banded
      .join(if (groups.isEmpty) broadcast(offR) else offR,
        groups.map(g => col(g) <=> col(s"__g_$g"))
          .foldLeft(col("__band") === col("__g_band"))(_ && _))
      .drop(groups.map(g => s"__g_$g") :+ "__g_band": _*)
      .withColumn("__below",
        col("__boff") + sum(col("__n")).over(wIntra) - col("__n"))
    val withP =
      if (alsoPositives) joined.withColumn("__pbelow",
        col("__poff") + sum(col("__np")).over(wIntra) - col("__np"))
      else joined
    withP.drop("__band", "__boff", "__poff")
  }

  /** Exact 1-indexed global rank of every row under (`value` asc,
    * `tie` asc, `extraTie`... asc) — the [[withBelow]] banded-prefix
    * device extended to ROW grain, so a total-order rank exists in the
    * plan with NO unpartitioned window and NO single-task tie group
    * (round-7: the device q186's ntiles and q182's vocab rank swap onto;
    * before it, a value held by half the corpus serialized through one
    * executor's sort).
    *
    * Two nested bandings, both order-preserving: the strict-below count
    * per distinct value comes from [[withBelow]]'s percentile-grid prefix
    * sum; WITHIN a tied value, rows band by a percentile grid over the
    * NUMERIC `tie` column (monotone in the tie order, so band boundaries
    * respect it), per-(value, band) counts fold to offsets via a
    * band-inequality self-join (equi on the value — per-value ≤ grid²
    * pairs), and the only window is PARTITIONED by (value, band) —
    * bounded by tie-group-size / grid.
    *
    * Contracts: `value` and `tie` must be non-null and NUMERIC (the
    * grids are percentile-based). Per-row rank determinism needs
    * (`value`, `tie`, extraTie...) to be a total order; a non-unique
    * `tie` (e.g. a hash of a string key) still yields the EXACT rank
    * multiset per value group — sufficient for aggregate readouts —
    * with `extraTie` columns restoring per-row determinism inside the
    * window when the caller has a true tiebreaker (q182 passes the token
    * itself). Returns the input columns + `__rank`.
    */
  private[ops] def globalRank(df: DataFrame, value: Column, tie: Column,
                              extraTie: Column*): DataFrame = {
    val base = df.withColumn("__v", value).withColumn("__t", tie)
    val perV = base.groupBy(col("__v").as("__s"))
      .agg(count(lit(1)).as("__n"))
    val below = withBelow(perV).select(col("__s").as("__v"), col("__below"))
    val grid = 256
    val fracs = (0 to grid).map(_.toDouble / grid)
    val tpiv = base.agg(percentile_approx(col("__t"),
      lit(fracs.toArray), lit(1000)).as("__tpiv"))
    val banded = base.crossJoin(broadcast(tpiv))
      .withColumn("__tband", size(filter(col("__tpiv"), p => p < col("__t"))))
      .drop("__tpiv")
    val btot = banded.groupBy(col("__v"), col("__tband"))
      .agg(count(lit(1)).as("__bt"))
    val boff = btot.alias("a")
      .join(btot.alias("b"),
        col("a.__v") === col("b.__v") && col("a.__tband") > col("b.__tband"),
        "left")
      .groupBy(col("a.__v").as("__v"), col("a.__tband").as("__tband"))
      .agg(coalesce(sum(col("b.__bt")), lit(0L)).as("__toff"))
    val wIntra = Window.partitionBy(col("__v"), col("__tband"))
      .orderBy((col("__t").asc +: extraTie.map(_.asc)): _*)
    banded.join(below, Seq("__v"))
      .join(boff, Seq("__v", "__tband"))
      .withColumn("__rank",
        col("__below") + col("__toff") + row_number().over(wIntra))
      .drop("__v", "__t", "__tband", "__toff", "__below")
  }

  /** The SQL-standard ntile fill in closed form over a 1-indexed rank:
    * with `tot` rows and `bins` buckets, the first `tot mod bins` buckets
    * hold q+1 rows (q = tot div bins) — shared by [[reliabilityBins]]'
    * boundary arithmetic and [[Funnel.rfmScores]]' quintiles so the fill
    * rule has one definition. Expects `__tot` in scope; `r` is a SQL
    * expression string for the rank.
    */
  private[ops] def ntileOfRank(r: String, bins: Int): Column = expr(
    s"CASE WHEN $r <= (__tot % $bins) * (__tot DIV $bins + 1) " +
      s"THEN ($r + __tot DIV $bins) DIV (__tot DIV $bins + 1) " +
      s"ELSE (__tot % $bins) + (($r - (__tot % $bins) * (__tot DIV $bins + 1)" +
      s" + __tot DIV $bins - 1) DIV (__tot DIV $bins)) END")

  /** Calibration (reliability) bins: rows ranked by `score` (ties broken
    * by `id`) into `bins` equal-count buckets with ntile's standard
    * quotient-remainder fill (larger buckets first), each reporting its
    * mean score and positive rate — the curve that says whether a
    * quality scorer's numbers MEAN anything (mean_score tracking
    * pos_rate = calibrated; flat pos_rate = the score is noise).
    * Returns (bin, n, mean_score, pos_rate).
    *
    * Plan shape: ntile boundaries are pure count arithmetic over the
    * distinct-score frame (`[[withBelow]]` supplies each score group's
    * rank interval; the bin of a rank is a closed-form expression in
    * (n, bins)), so score groups that sit inside one bin never touch row
    * grain. Only the ≤ bins−1 groups that STRADDLE a boundary resolve
    * their tied rows individually — ranked by a window PARTITIONED BY
    * SCORE (parallel, bounded by the biggest tie group), exactly the
    * rows whose bin genuinely depends on the id tie-break.
    *
    * Determinism: mean scores ride the round-9 → decimal-sum idiom (a
    * whole group contributes count × its rounded score — an exact
    * decimal product); rates are integer ratios; the fill is the SQL
    * standard both engines implement over a total order.
    */
  def reliabilityBins(df: DataFrame, id: Column, score: Column,
                      positive: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val base = df.select(id.as("__id"), score.as("__s"),
      positive.cast("boolean").as("__p"))
    val perScore = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"),
        sum(round(col("__s"), 9).cast("decimal(28,12)")).as("__ssum"))
    val tot = perScore.agg(sum(col("__n")).as("__tot"))
    // ntile fill over N rows: first (N mod bins) buckets hold q+1 rows,
    // q = N div bins — bin(r) in closed form over the 1-indexed rank
    val g = withBelow(perScore).crossJoin(broadcast(tot))
      .withColumn("__q", expr(s"__tot DIV $bins"))
      .withColumn("__rem", col("__tot") % bins)
      .withColumn("__cut", col("__rem") * (col("__q") + lit(1L)))
    def binOf(r: String) = expr(
      s"CASE WHEN $r <= __cut THEN ($r + __q) DIV (__q + 1) " +
        s"ELSE __rem + (($r - __cut + __q - 1) DIV __q) END")
    val spanned = g
      .withColumn("__blo", binOf("__below + 1"))
      .withColumn("__bhi", binOf("__below + __n"))
    val whole = spanned.filter(col("__blo") === col("__bhi"))
      .select(col("__blo").as("bin"), col("__n"),
        col("__ssum").as("__sc"), col("__np"))
    // boundary-straddling tie groups (≤ bins−1 of them): resolve tied
    // rows by the id order, window partitioned by score — parallel
    val strad = spanned.filter(col("__blo") =!= col("__bhi"))
      .select(col("__s").as("__s2"), col("__below"), col("__q"),
        col("__rem"), col("__cut"))
    val wid = Window.partitionBy(col("__s")).orderBy(col("__id").asc)
    val split = base.join(broadcast(strad), col("__s") <=> col("__s2"))
      .withColumn("__r", col("__below") + row_number().over(wid))
      .withColumn("bin", binOf("__r"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__s"), 9).cast("decimal(28,12)")).as("__sc"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))
      .select(col("bin"), col("__n"), col("__sc"), col("__np"))
    whole.unionByName(split)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(sum(col("__n")).as("n"), sum(col("__sc")).as("__ss"),
        sum(col("__np")).as("__npt"))
      .select(col("bin"), col("n"),
        round(col("__ss").cast("double") / col("n").cast("double"), 6)
          .as("mean_score"),
        round(col("__npt").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** ROC-AUC by the rank-sum (Mann–Whitney) identity with PROPER tied-
    * rank handling: tied scores share the average of their rank range,
    * so AUC counts a tie as half a concordant pair — the textbook
    * estimator, not the row_number() shortcut that silently biases
    * toward the tie-break order. Returns one row (n_pos, n_neg, auc);
    * auc is null when either class is empty.
    *
    * Plan shape: the average tied rank is count arithmetic over the
    * distinct-score frame — a score group with `__below` smaller rows
    * and `__n` ties has average rank `__below + (__n+1)/2`, an exact
    * half-integer carried in DECIMAL(38,1) — so the whole computation is
    * one distinct-grain aggregation after [[withBelow]]'s banded prefix
    * sum; no row-grain rank window at all.
    */
  def binaryAuc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val perScore = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))
    // avg rank = below + (n+1)/2 = rmin + (ties-1)/2, the same exact
    // half-integer the per-row rank()/count() windows produced
    val ar = (lit(2L) * col("__below") + col("__n") + lit(1L))
      .cast("decimal(38,1)") / lit(2)
    withBelow(perScore).agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"),
        sum(col("__np").cast("decimal(38,0)") * ar).as("__sr"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__sr").cast("double") -
              (col("n_pos") * (col("n_pos") + lit(1L))).cast("double") / 2.0d) /
              (col("n_pos") * col("n_neg")).cast("double"), 6)).as("auc"))
  }

  /** [[binaryAuc]] PER GROUP — segment-wise model evaluation ("AUC per
    * language / per source / per time slice"), the fairness-and-drift
    * readout an eval pipeline reports beside the global number. One
    * (group, score)-grain aggregation + [[withBelow]]'s banded prefix
    * sum with the group columns in every stage key (grids are
    * per-group; no window is partitioned by less than the group) —
    * all groups in ONE pass, never a per-group re-run. Returns
    * (group, n_pos, n_neg, auc); auc is null where a group lost a
    * class.
    */
  def binaryAucBy(df: DataFrame, group: Column, score: Column,
                  positive: Column): DataFrame = {
    val base = df.select(group.as("__grp"), score.as("__s"),
      positive.cast("boolean").as("__p"))
    val perScore = base.groupBy(col("__grp"), col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))
    val ar = (lit(2L) * col("__below") + col("__n") + lit(1L))
      .cast("decimal(38,1)") / lit(2)
    withBelow(perScore, groups = Seq("__grp"))
      .groupBy(col("__grp").as("group"))
      .agg(sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"),
        sum(col("__np").cast("decimal(38,0)") * ar).as("__sr"))
      .select(col("group"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__sr").cast("double") -
              (col("n_pos") * (col("n_pos") + lit(1L))).cast("double") / 2.0d) /
              (col("n_pos") * col("n_neg")).cast("double"), 6)).as("auc"))
  }

  /** ONE-PASS Poisson-bootstrap confidence spread for ROC-AUC: `reps`
    * independent bootstrap resamples of the scored frame, each AUC'd
    * with [[binaryAuc]]'s exact tied-rank estimator, WITHOUT ever
    * materializing a resample — each replicate's multiset is carried as
    * integer weights (the [[Sampling.bootstrapReplicate]] Poisson(1)
    * draw, salted per replicate), so the whole family costs one
    * map-side ×reps fan-out into ONE (rep, score)-grain aggregation
    * plus [[withBelow]]'s banded prefix sum PARTITIONED BY REP. The
    * corpus is never duplicated, never resampled row-wise, and never
    * sorted globally — this is how you put an error bar on a metric at
    * 100 TB (the naive "draw B resamples and re-run" costs B corpus
    * scans and B shuffles; this costs ~1 of each).
    *
    * Weighted tied-rank correctness: a score group with weighted count
    * n and weighted positive count np in replicate r is EXACTLY n tied
    * copies in the resampled multiset, so avg rank = below + (n+1)/2
    * and the Mann–Whitney identity applies verbatim — the per-rep AUC
    * equals [[binaryAuc]] run on the materialized resample, bit for
    * bit (the spec pins that equality). Zero-weight score groups are
    * dropped (absent from the resample). Returns one row per replicate:
    * (rep, n_pos, n_neg, auc); auc is null when a replicate lost an
    * entire class.
    *
    * Determinism: the Poisson inverse-CDF thresholds are Scala-computed
    * Longs injected identically into both engines
    * ([[Sampling.poissonBounds]]); weights and counts are exact
    * integers; the only IEEE arithmetic is [[binaryAuc]]'s final
    * integer-fed division, rounded at the readout.
    */
  def bootstrapAuc(df: DataFrame, id: Column, score: Column,
                   positive: Column, reps: Int,
                   maxCopies: Int = 8): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps must be in [2, 64], got $reps")
    val bounds = Sampling.poissonBounds(maxCopies)
    val base = df.select(id.cast("string").as("__id"), score.as("__s"),
        positive.cast("boolean").as("__p"))
      .withColumn("__rep", explode(array((0 until reps).map(lit): _*)))
    val h = Sampling.hashPos(
      concat(lit("boot"), col("__rep").cast("string")), col("__id"))
    val w = bounds.map(t => when(h >= t, 1L).otherwise(0L)).reduce(_ + _)
    val perScore = base.withColumn("__w", w)
      .groupBy(col("__rep"), col("__s"))
      .agg(sum(col("__w")).as("__n"),
        sum(when(col("__p"), col("__w")).otherwise(0L)).as("__np"))
      .filter(col("__n") > 0L)
    val ar = (lit(2L) * col("__below") + col("__n") + lit(1L))
      .cast("decimal(38,1)") / lit(2)
    withBelow(perScore, groups = Seq("__rep"))
      .groupBy(col("__rep").as("rep"))
      .agg(sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"),
        sum(col("__np").cast("decimal(38,0)") * ar).as("__sr"))
      .select(col("rep"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__sr").cast("double") -
              (col("n_pos") * (col("n_pos") + lit(1L))).cast("double") / 2.0d) /
              (col("n_pos") * col("n_neg")).cast("double"), 6)).as("auc"))
  }

  /** Fold [[bootstrapAuc]]'s per-replicate frame to the error-bar
    * readout: (n_reps, mean_auc, lo_auc, hi_auc) — mean over the
    * rounded per-rep AUCs (decimal sum, order-free), spread as the
    * replicate min/max (the conservative bootstrap envelope; with
    * reps = B that brackets ≈ a (B−1)/(B+1) interval). Null per-rep
    * AUCs (a replicate that lost a class) are excluded from all three,
    * n_reps counts the non-null ones.
    */
  def bootstrapAucSummary(perRep: DataFrame): DataFrame = perRep
    .filter(col("auc").isNotNull)
    .agg(count(lit(1)).as("n_reps"),
      sum(col("auc").cast("decimal(28,12)")).as("__sa"),
      min(col("auc")).as("lo_auc"), max(col("auc")).as("hi_auc"))
    .select(col("n_reps"),
      round(col("__sa").cast("double") / col("n_reps").cast("double"), 6)
        .as("mean_auc"),
      col("lo_auc"), col("hi_auc"))

  /** Graded ranking metrics per query — AP@k (average precision: the
    * mean of precision-at-each-hit, the MAP constituent) and NDCG@k with
    * binary gains — over a `retrieved` frame (query_id, item_id, rank ≤
    * k) and a `truth` relevance set (query_id, item_id). Returns
    * (query_id, n_returned, hits, ap, ndcg); ap normalizes by
    * min(|truth(q)|, k), ndcg by the ideal DCG of min(|truth(q)|, k)
    * relevant items at the top; both are null when the query has no
    * truth rows.
    *
    * Determinism: the discount table 1/log2(r+1) and its ideal-DCG
    * prefix sums are SCALA-COMPUTED literal doubles injected identically
    * into both engines (the q180 Benford device) — no runtime libm log
    * sits on the gate path; each per-query sum has ≤ k addends and runs
    * round-9 → DECIMAL (order-free); precision terms are integer-fed
    * divisions.
    *
    * Scale shape: one |retrieved|-grain join against truth, one
    * rank-ordered window PARTITIONED BY QUERY (≤ k rows per partition),
    * one per-query fold — list-sized throughout, never corpus-sized.
    */
  def rankingMetrics(retrieved: DataFrame, truth: DataFrame,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val gains = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val idcg = gains.scanLeft(0.0)(_ + _) // prefix sums; index = #relevant
    val gainArr = array(gains.map(lit): _*)
    val idcgArr = array(idcg.map(lit): _*)
    val rel = retrieved
      .select(col("query_id"), col("item_id"), col("rank").cast("long").as("rank"))
      .join(truth.select(col("query_id"), col("item_id"), lit(1L).as("__rel")),
        Seq("query_id", "item_id"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val rSizes = truth.groupBy(col("query_id"))
      .agg(count(lit(1)).as("__r"))
    def dec9(c: Column) = sum(round(c, 9).cast("decimal(28,12)"))
    rel
      .withColumn("__hits_upto", sum(col("__rel")).over(w))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_returned"),
        sum(col("__rel")).as("hits"),
        dec9(when(col("__rel") === 1L,
          col("__hits_upto").cast("double") / col("rank").cast("double"))
          .otherwise(lit(0.0d))).as("__apn"),
        dec9(col("__rel").cast("double") *
          element_at(gainArr, col("rank").cast("int"))).as("__dcg"))
      .join(rSizes, Seq("query_id"), "left")
      .select(col("query_id"), col("n_returned"), col("hits"),
        when(col("__r").isNull, lit(null).cast("double"))
          .otherwise(round(col("__apn").cast("double") /
            least(col("__r"), lit(k.toLong)).cast("double"), 6)).as("ap"),
        when(col("__r").isNull, lit(null).cast("double"))
          .otherwise(round(col("__dcg").cast("double") /
            element_at(idcgArr,
              least(col("__r"), lit(k.toLong)).cast("int") + 1), 6))
          .as("ndcg"))
  }

  /** PR-AUC by the threshold-step (average-precision) identity, tie-aware
    * at DISTINCT-SCORE grain: thresholds sweep the distinct scores
    * descending, and each contributes `(ΔR)·P` with ΔR = the threshold
    * group's positives / total positives and P = precision among all rows
    * at-or-above the threshold — the step-function AP (no trapezoid
    * interpolation), the PR-curve companion to [[binaryAuc]]'s ROC-AUC
    * and the metric that stays informative under heavy class imbalance
    * (a filter model that passes 0.1% of a corpus lives on the PR curve,
    * not the ROC curve). Returns one row (n_pos, n_neg, ap); ap is null
    * when there are no positives. Null scores are unsupported (the
    * descending-threshold sweep has no defined place for them).
    *
    * Plan shape: [[withBelow]]'s banded distributed prefix sum supplies
    * both cumulative counts (rows and positives strictly below), so the
    * whole metric is one distinct-grain aggregation — no unpartitioned
    * window, nothing row-grain. Determinism: every precision/recall term
    * is an integer-fed IEEE tree evaluated identically by any engine;
    * per-threshold contributions ride the round-9 → decimal-sum idiom
    * (order-free), and only the final readout rounds.
    */
  def averagePrecision(df: DataFrame, score: Column,
                       positive: Column): DataFrame = {
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val perScore = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))
    // null scores are declared unsupported above — ENFORCED here
    // (round-7, ADVICE): a null would form its own score group, rank
    // nulls-first in Spark but nulls-last in a DuckDB restatement, and
    // silently shift every prefix count; the one-row readout instead
    // fails loudly via raise_error, carried through the existing
    // aggregate at zero extra passes
    val tot = perScore.agg(sum(col("__n")).as("__tot"),
      sum(col("__np")).as("__pos"),
      sum(when(col("__s").isNull, col("__n")).otherwise(0L)).as("__snull"))
    val g = withBelow(perScore, alsoPositives = true)
      .crossJoin(broadcast(tot))
    // at threshold s: TP = positives at-or-above, retrieved = rows
    // at-or-above — both pure count arithmetic off the prefix sums
    val contrib =
      (col("__np").cast("double") *
        (col("__pos") - col("__pbelow")).cast("double")) /
        (col("__pos").cast("double") *
          (col("__tot") - col("__below")).cast("double"))
    g.agg(max(col("__pos")).as("n_pos"),
        max(col("__tot") - col("__pos")).as("n_neg"),
        max(col("__snull")).as("__snull"),
        sum(round(when(col("__pos") > 0L, contrib).otherwise(lit(0.0d)), 9)
          .cast("decimal(28,12)")).as("__ap"))
      .select(col("n_pos"), col("n_neg"),
        when(col("__snull") > 0L, raise_error(concat(lit(
            "averagePrecision: null scores are unsupported (found "),
            col("__snull"), lit(" rows) — filter them upstream")))
          .cast("double"))
          .when(col("n_pos") === 0L, lit(null).cast("double"))
          .otherwise(round(col("__ap").cast("double"), 6)).as("ap"))
  }

  /** One-row calibration report card: the Brier score (mean squared
    * error of the probability against the 0/1 outcome — the proper
    * scoring rule that punishes confident wrongness) and the Expected
    * Calibration Error (the [[reliabilityBins]] curve folded to one
    * number: Σ n_b·|pos_rate_b − mean_score_b| / N over `bins`
    * equal-count bins). Returns (n, brier, ece). Scores are treated as
    * probabilities (the caller clamps to [0,1] upstream if needed — the
    * arithmetic itself doesn't require it).
    *
    * Determinism: Brier runs ENTIRELY in decimal — round-9 scores cast
    * to DECIMAL(10,9), the squared residual widened to DECIMAL(28,18)
    * per row and summed exactly (order-free; map-side partial aggregation
    * applies, so the pass is corpus-scale-safe), with one IEEE division
    * at the readout. ECE folds the ALREADY-GATED [[reliabilityBins]]
    * output (round-6 rates, ≤ `bins` rows) through the round-9 →
    * decimal-sum idiom, so no engine-ordered float sum exists anywhere.
    */
  def calibrationSummary(df: DataFrame, id: Column, score: Column,
                         positive: Column, bins: Int): DataFrame = {
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val s9 = round(col("__s"), 9).cast("decimal(10,9)")
    val y = when(col("__p"), lit(1)).otherwise(lit(0)).cast("decimal(10,9)")
    val sq = ((s9 - y) * (s9 - y)).cast("decimal(28,18)")
    val brier = base.agg(count(lit(1)).as("n"), sum(sq).as("__bsum"))
    val rb = reliabilityBins(df, id, score, positive, bins)
    val eceTerm = col("n").cast("double") *
      abs(col("pos_rate") - col("mean_score"))
    val ece = rb.agg(
      sum(round(eceTerm, 9).cast("decimal(28,12)")).as("__esum"))
    brier.crossJoin(broadcast(ece))
      .select(col("n"),
        round(col("__bsum").cast("double") / col("n").cast("double"), 6)
          .as("brier"),
        round(col("__esum").cast("double") / col("n").cast("double"), 6)
          .as("ece"))
  }

  /** MERGEABLE calibration state — the streaming-monitor flavor of
    * [[calibrationSummary]]: per FIXED-WIDTH score bin (value bins, not
    * [[reliabilityBins]]' equal-count ntile — value bins are what makes
    * the statistic mergeable: a row's bin depends on its score alone,
    * never on global ranks), the integer/decimal sufficient statistic
    * (n, n_pos, ssum, brier_sum). `brier_sum` accumulates the exact
    * decimal squared residual of the round-9 score, so the GLOBAL Brier
    * is recoverable from state exactly; `ssum`/`n_pos` give per-bin
    * mean-score and pos-rate — the reliability curve a drift monitor
    * watches against a frozen baseline. State is ≤ `bins` rows at ANY
    * corpus size (tighter than the KMV/CMS budgets), and
    * state(A ∪ B) = [[calibMergeStates]](state(A), state(B)) EXACTLY —
    * integer counts and decimal sums on the bin key.
    *
    * Scores outside [0, 1) clamp into the edge bins (the caller's
    * scores are probabilities; clamping keeps the fold total).
    */
  def calibState(df: DataFrame, score: Column, positive: Column,
                 bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val base = df.select(score.as("__s"), positive.cast("boolean").as("__p"))
    val s9 = round(col("__s"), 9).cast("decimal(10,9)")
    val y = when(col("__p"), lit(1)).otherwise(lit(0)).cast("decimal(10,9)")
    base.select(
        least(greatest(floor(col("__s") * bins).cast("long"), lit(0L)),
          lit(bins - 1L)).as("bin"),
        when(col("__p"), 1L).otherwise(0L).as("__pos"),
        s9.cast("decimal(28,12)").as("__s9"),
        ((s9 - y) * (s9 - y)).cast("decimal(28,18)").as("__sq"))
      .groupBy(col("bin"))
      // sums cast back to the declared widths (Spark widens sum results
      // to precision 38) so the state schema is stable across versions
      .agg(count(lit(1)).as("n"), sum(col("__pos")).as("n_pos"),
        sum(col("__s9")).cast("decimal(28,12)").as("ssum"),
        sum(col("__sq")).cast("decimal(28,18)").as("brier_sum"))
  }

  /** Exact merge of two [[calibState]] frames — count/decimal sums on
    * the bin key; associative and commutative.
    */
  def calibMergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("ssum")).cast("decimal(28,12)").as("ssum"),
        sum(col("brier_sum")).cast("decimal(28,18)").as("brier_sum"))

  /** Readout of a maintained [[calibState]]: the per-bin reliability
    * curve (bin, n, mean_score, pos_rate) plus one global brier row is
    * derivable by the caller; this emits the curve — the thing a
    * monitor diffs against its frozen baseline curve.
    */
  def calibStateBins(state: DataFrame): DataFrame =
    state.select(col("bin"), col("n"),
      round(col("ssum").cast("double") / col("n").cast("double"), 6)
        .as("mean_score"),
      round(col("n_pos").cast("double") / col("n").cast("double"), 6)
        .as("pos_rate"))

  /** One-row binary-classifier report card from (predicted, actual)
    * boolean pairs: the confusion counts plus accuracy, balanced
    * accuracy, Youden's J (tpr + tnr − 1, the chance-corrected
    * threshold-quality readout) and the Matthews correlation
    * coefficient — the single-number summary that stays honest under
    * class imbalance where accuracy saturates. Returns (tp, fp, fn, tn,
    * accuracy, balanced_accuracy, youden_j, mcc); balanced/J are null
    * when a CLASS is empty, mcc when any margin is (its denominator
    * factor hits 0).
    *
    * Determinism: the confusion matrix is 4 integers from one
    * aggregation (map-side combinable); `tp·tn − fp·fn` stays exact
    * 64-bit integer arithmetic (products ≤ n² < 2^63); only the
    * denominator's 4-factor product runs in IEEE doubles — the same
    * left-associated tree on both engines — under a correctly-rounded
    * sqrt.
    */
  def binaryCard(df: DataFrame, predicted: Column,
                 actual: Column): DataFrame = {
    val base = df.select(predicted.cast("boolean").as("__pr"),
      actual.cast("boolean").as("__ac"))
    def n(p: Boolean, a: Boolean) =
      sum(when(col("__pr") === p && col("__ac") === a, 1L).otherwise(0L))
    val c = base.agg(n(true, true).as("tp"), n(true, false).as("fp"),
      n(false, true).as("fn"), n(false, false).as("tn"))
    val tpr = col("tp").cast("double") / (col("tp") + col("fn")).cast("double")
    val tnr = col("tn").cast("double") / (col("tn") + col("fp")).cast("double")
    val mccDen = sqrt((col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")).cast("double") *
      (col("tn") + col("fp")).cast("double") *
      (col("tn") + col("fn")).cast("double"))
    val anyZeroMargin = (col("tp") + col("fp")) === 0L ||
      (col("tp") + col("fn")) === 0L || (col("tn") + col("fp")) === 0L ||
      (col("tn") + col("fn")) === 0L
    c.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 6)
        .as("accuracy"),
      when((col("tp") + col("fn")) === 0L || (col("tn") + col("fp")) === 0L,
        lit(null).cast("double"))
        .otherwise(round((tpr + tnr) / lit(2.0d), 6)).as("balanced_accuracy"),
      when((col("tp") + col("fn")) === 0L || (col("tn") + col("fp")) === 0L,
        lit(null).cast("double"))
        .otherwise(graft.Readout.rdz(tpr + tnr - lit(1.0d), 6)).as("youden_j"),
      when(anyZeroMargin, lit(null).cast("double"))
        .otherwise(graft.Readout.rdz(
          (col("tp") * col("tn") - col("fp") * col("fn")).cast("double") /
            mccDen, 6)).as("mcc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: `D = max over observed
    * values of |ECDF_A(v) − ECDF_B(v)|`, the sharpest "did this
    * distribution shift" readout — the rank-based complement to
    * [[Profile.histogramDrift]]'s binned L1 (KS sees a shift histogram
    * bins can hide, and has no bin-edge parameter to tune). Splits rows
    * into cohort A (`inA` true) and B; returns one row
    * (n_a, n_b, ks); null when either cohort is empty. Null values are
    * unsupported (an ECDF has no defined place for them — filter
    * upstream).
    *
    * EXACT, not the asymptotic approximation: ECDFs are integer-count
    * quotients evaluated at distinct-value grain, |difference| and `max`
    * are order-independent IEEE ops — any engine computing the same
    * quotients agrees bitwise, no tolerance needed. Plan shape: one
    * distinct-value aggregation, then [[withBelow]]'s banded distributed
    * prefix sum for both cumulative counts — no unpartitioned window
    * even when the value column has millions of distinct values.
    */
  def ksStatistic(df: DataFrame, value: Column, inA: Column): DataFrame =
    ksFinish(ksCounts(df, value, inA))

  /** The KS sufficient statistic: per distinct value, (rows, cohort-A
    * rows). Runs as a batch aggregation here and as a Complete-mode
    * STREAMING aggregation in `Streaming.ksDriftStream` — state is one
    * (long, long) per distinct value, the same budget as the batch
    * frame (q45/q150's exact-sufficient-statistic device).
    */
  private[graft] def ksCounts(df: DataFrame, value: Column,
                              inA: Column): DataFrame =
    df.select(value.as("__s"), inA.cast("boolean").as("__p"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"))

  /** Fold a [[ksCounts]] frame to the one-row KS readout — shared
    * verbatim by the batch and streamed paths, so the streamed statistic
    * is bit-identical to the batch one by construction.
    */
  private[graft] def ksFinish(perScore: DataFrame): DataFrame = {
    // null values unsupported, ENFORCED (round-7, ADVICE): the same
    // nulls-first-vs-last ECDF hazard as averagePrecision, failed loudly
    // through the existing one-row fold instead of silently diverging
    val tot = perScore.agg(sum(col("__np")).as("__na"),
      sum(col("__n") - col("__np")).as("__nb"),
      sum(when(col("__s").isNull, col("__n")).otherwise(0L)).as("__snull"))
    val g = withBelow(perScore, alsoPositives = true)
      .crossJoin(broadcast(tot))
    // at value v: ECDF_A = (A-rows ≤ v)/n_a, ECDF_B likewise — both
    // cumulative counts fall out of the banded prefix sums
    val cumA = (col("__pbelow") + col("__np")).cast("double") /
      col("__na").cast("double")
    val cumB = ((col("__below") + col("__n")) -
      (col("__pbelow") + col("__np"))).cast("double") /
      col("__nb").cast("double")
    g.agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(col("__snull")).as("__snull"),
        max(when(col("__na") > 0L && col("__nb") > 0L, abs(cumA - cumB)))
          .as("__d"))
      .select(col("n_a"), col("n_b"),
        when(col("__snull") > 0L, raise_error(concat(lit(
            "ksStatistic: null values are unsupported (found "),
            col("__snull"), lit(" rows) — filter them upstream")))
          .cast("double"))
          .when(col("n_a") === 0L || col("n_b") === 0L,
            lit(null).cast("double"))
          .otherwise(round(col("__d"), 6)).as("ks"))
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
