package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

import graft.Readout

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
    * rank ceil(q·n), 1-indexed over the stratum with nulls ranked first —
    * Spark's ascending null order), not interpolated quantiles: an
    * interpolated threshold is an arithmetic blend two engines can
    * disagree on by 1 ulp — and unlike a membership test, a winsorized
    * OUTPUT contains the threshold itself, so it must be a value that
    * exists in the data. Any engine that sorts identically produces the
    * identical clamp (oracle-checked in SparkEntry q98).
    *
    * Scale shape (round-5 rewrite — the r4 audit's one unbounded sort):
    * strata are language/source-grade keys, so a stratum can be a large
    * fraction of a 100 TB table and the original one-`row_number`-window-
    * per-stratum plan serialized that stratum through ONE task's sort.
    * The threshold search is now BANDED EXACT SELECTION:
    *
    *  1. collapse to weighted distinct values — `groupBy(strata, value)`
    *     count: map-side combine, ties and duplicates collapse;
    *  2. one `percentile_approx` grid sketch per stratum (literal
    *     fraction grid — the sketch's rank error is ≤ n/accuracy, its
    *     outputs are REAL data values) brackets each target rank from
    *     both sides, ± one grid step of safety padding;
    *  3. an aggregate counts the rows strictly below each bracket, and
    *     the cumulative-count window then runs ONLY over the in-band
    *     distinct values: per-task sort ≤ ~(2/accuracy + 4·10/accuracy)·n
    *     rows (≈ a few 10⁻³ of the stratum at the default accuracy, and
    *     further collapsed by ties), instead of n.
    *
    * The selected value at cumulative count ≥ target rank is the SAME
    * exact order statistic the full sort produced — WinsorizeScaleSpec
    * pins equality against the single-window reference on tied/null/
    * ragged data, and q98's oracle is unchanged. Ranks count nulls
    * (first); a target rank inside the null prefix yields a null
    * threshold, which `greatest`/`least` then skip — exactly the legacy
    * behavior. Non-numeric (string-ordered) values keep the legacy
    * single-window path: `percentile_approx` is numeric-only, and
    * order-statistic selection over strings is a gate-scale need, not a
    * 100 TB one. NaN caveat: the sketch ranks NaN with Spark's
    * NaN-greatest-double order like the sort does, but feeding NaN
    * thresholds into a clamp is ill-defined regardless of plan — filter
    * NaN upstream.
    */
  def winsorize(df: DataFrame, strata: Column, value: Column, id: Column,
                loQ: Double = 0.05, hiQ: Double = 0.95,
                accuracy: Int = 10000): DataFrame = {
    require(0.0 <= loQ && loQ < hiQ && hiQ <= 1.0,
      s"need 0 <= loQ < hiQ <= 1, got $loQ, $hiQ")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val numeric = df.select(value).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val thr =
      if (numeric) bandedThresholds(df, strata, value, loQ, hiQ, accuracy)
      else legacyThresholds(df, strata, value, id, loQ, hiQ)
    df.join(broadcast(thr), strata <=> col("__s"))
      .withColumn("clamped", least(greatest(value, col("__lo")), col("__hi")))
      .drop("__s", "__lo", "__hi")
  }

  /** The pre-round-5 threshold plan: one full-stratum rank window. Kept
    * for non-numeric values (see [[winsorize]]); identical output.
    */
  private def legacyThresholds(df: DataFrame, strata: Column, value: Column,
                               id: Column, loQ: Double,
                               hiQ: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(value.asc, id.asc)
    val ranked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(strata)))
    def rankOf(q: Double) =
      greatest(ceil(lit(q) * col("__n")).cast("long"), lit(1L))
    ranked
      .filter(col("__rn") === rankOf(loQ) || col("__rn") === rankOf(hiQ))
      .groupBy(strata.as("__s"))
      .agg(min(when(col("__rn") === rankOf(loQ), value)).as("__lo"),
        max(when(col("__rn") === rankOf(hiQ), value)).as("__hi"))
  }

  /** Banded exact selection of the two order statistics (numeric values;
    * contract and bound in [[winsorize]]'s Scaladoc). Returns one row per
    * stratum: (__s, __lo, __hi).
    */
  private def bandedThresholds(df: DataFrame, strata: Column, value: Column,
                               loQ: Double, hiQ: Double,
                               accuracy: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = math.max(accuracy / 10, 100)
    val fracs = (0 to grid).map(_.toDouble / grid)
    // per-stratum row/non-null counts + the pivot sketch, one pass
    val stats = df.groupBy(strata.as("__s")).agg(
      count(lit(1)).as("__n"), count(value).as("__nn"),
      percentile_approx(value, lit(fracs.toArray), lit(accuracy))
        .as("__piv"))
    // target rank over ALL rows (nulls first), then its non-null rank
    def rankOf(q: Double) =
      greatest(ceil(lit(q) * col("__n")).cast("long"), lit(1L))
    def nnRank(r: Column) = r - (col("__n") - col("__nn"))
    // bracket pivots: grid fractions whose sketch-rank bound provably
    // straddles the target, padded one extra grid step each side
    def pivAt(idx: Column) = element_at(col("__piv"),
      greatest(lit(0), least(lit(grid), idx)).cast("int") + 1)
    def bracket(r: Column): (Column, Column) = {
      // all-null stratum: no non-null rank exists — park f at 0 (the
      // brackets go unused; the null-prefix check nulls the threshold)
      // instead of letting r/0 = Inf hit the ANSI long cast
      val f = when(col("__nn") > 0L, r.cast("double") / col("__nn"))
        .otherwise(lit(0.0d))
      val m = lit(1.0 / accuracy)
      (pivAt(floor((f - m) * grid).cast("long") - 1L),
        pivAt(ceil((f + m) * grid).cast("long") + 1L))
    }
    val (loL, loH) = bracket(nnRank(rankOf(loQ)))
    val (hiL, hiH) = bracket(nnRank(rankOf(hiQ)))
    val keyed = stats.select(col("__s"), col("__n"), col("__nn"),
      nnRank(rankOf(loQ)).as("__rlo"), nnRank(rankOf(hiQ)).as("__rhi"),
      loL.as("__lo_l"), loH.as("__lo_h"), hiL.as("__hi_l"), hiH.as("__hi_h"))
    // weighted distinct non-null values, joined to their stratum's brackets
    val cnts = df.groupBy(strata.as("__s2"), value.as("__v"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__v").isNotNull)
      .join(keyed, col("__s2") <=> col("__s"))
    // rows strictly below each bracket — the cumulative offset
    val below = cnts.groupBy(col("__s").as("__s3")).agg(
      coalesce(sum(when(col("__v") < col("__lo_l"), col("__c"))), lit(0L))
        .as("__below_lo"),
      coalesce(sum(when(col("__v") < col("__hi_l"), col("__c"))), lit(0L))
        .as("__below_hi"))
    // exact selection inside each band: first value whose cumulative
    // weighted count reaches the target rank. The cumulative itself runs
    // through the grouped banded-prefix device (round-7): the in-band
    // frame is already ≤ a few 10⁻³ of the stratum, but that is still
    // LINEAR in n, and the old per-stratum window serialized it through
    // one task (unpartitioned outright for a constant stratum — q154's
    // shape); Eval.withBelow sub-bands it so every window is
    // (stratum, band)-partitioned. The stratum rides as a struct so a
    // NULL stratum survives the device's name-equi-joins (struct
    // equality treats null fields as equal — the standard null-safe-join
    // wrap; WinsorizeScaleSpec pins the null-stratum law).
    def select1(lo: String, hi: String, belowCol: String, r: String,
                out: String): DataFrame =
      graft.ops.Eval.withBelow(
          cnts.filter(col("__v") >= col(lo) && col("__v") <= col(hi))
            .select(struct(col("__s")).as("__g"), col("__v").as("__s"),
              col("__c").as("__n"), col(r).as("__r")),
          groups = Seq("__g"))
        .join(below.select(struct(col("__s3")).as("__g"), col(belowCol)),
          Seq("__g"))
        .filter(col(belowCol) + col("__below") + col("__n") >= col("__r"))
        .groupBy(col("__g.__s").as(s"__s_$out"))
        .agg(min(col("__s")).as(out))
    val loThr = select1("__lo_l", "__lo_h", "__below_lo", "__rlo", "__t_lo")
    val hiThr = select1("__hi_l", "__hi_h", "__below_hi", "__rhi", "__t_hi")
    // a target rank inside the null prefix (nnRank <= 0) means the order
    // statistic IS null — match the legacy nulls-first ranking
    keyed
      .join(loThr, col("__s") <=> col("__s___t_lo"), "left")
      .join(hiThr, col("__s") <=> col("__s___t_hi"), "left")
      .select(col("__s"),
        when(col("__rlo") <= 0L, lit(null)).otherwise(col("__t_lo")).as("__lo"),
        when(col("__rhi") <= 0L, lit(null)).otherwise(col("__t_hi")).as("__hi"))
  }

  /** Distribution-drift monitor between two row populations (reference
    * vs current — e.g. last week vs this week): per group, bin `value`
    * into `nBins` fixed-width bins and compute the triangular
    * discrimination statistic `Σ (pᵢ−qᵢ)² / (pᵢ+qᵢ)` over the bin
    * histograms — the training-data health check that catches a feature
    * distribution shifting under the pipeline. Triangular discrimination
    * instead of PSI/KL deliberately: it is RATIONAL (no logarithms — the
    * libm divergence this repo's determinism contract bans from gated
    * outputs), bounded in [0, 2], zero iff the histograms agree, and like
    * PSI it is symmetric-capable and per-bin decomposable.
    *
    * Determinism: per-bin proportions are single IEEE divisions; each
    * bin's term is rounded to 12 dp and summed in DECIMAL(28,14) (exact,
    * order-independent — the q99 idiom for multi-term float sums). A
    * group missing either population entirely is OMITTED (no ±Inf rows);
    * null values are excluded before binning.
    *
    * Scale shape: one count aggregation on (group, bin, side) with
    * map-side partials — the histogram is the sufficient statistic, so
    * shuffle volume is groups × bins regardless of row count; the
    * statistic folds per group. No windows, no sorts.
    */
  def histogramDrift(df: DataFrame, group: Column, value: Column,
                     isCurrent: Column, binWidth: Double,
                     nBins: Int): DataFrame =
    driftFold(binCounts(df, group, value, isCurrent, binWidth, nBins))

  /** [[histogramDrift]]'s sufficient statistic: per (group, bin) counts of
    * the reference (`__na`) and current (`__nb`) populations. Split out
    * because it is a plain incremental aggregation — the STREAMING drift
    * monitor ([[graft.streaming.Streaming.histogramDriftStream]]) runs
    * this same stage as a streaming groupBy and feeds the landed counts
    * to the same [[driftFold]], which is what lets the streamed gate
    * share the batch oracle verbatim.
    */
  /** The one binning rule both drift monitors share: clamp
    * `floor(value / binWidth)` into `[0, nBins)`. Single definition so the
    * single-pair and timeline monitors can never desynchronize on binning
    * semantics.
    */
  private def binOf(value: Column, binWidth: Double, nBins: Int): Column =
    least(greatest(floor(value / lit(binWidth)), lit(0)),
      lit(nBins - 1)).cast("long")

  private[graft] def binCounts(df: DataFrame, group: Column, value: Column,
                               isCurrent: Column, binWidth: Double,
                               nBins: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val bin = binOf(value, binWidth, nBins)
    df.filter(value.isNotNull)
      .select(group.as("__g"), bin.as("__bin"),
        when(isCurrent, lit(1L)).otherwise(lit(0L)).as("__cur"))
      .groupBy(col("__g"), col("__bin"))
      .agg(sum(when(col("__cur") === 1L, lit(1L)).otherwise(lit(0L)))
        .as("__nb"),
        sum(when(col("__cur") === 0L, lit(1L)).otherwise(lit(0L)))
        .as("__na"))
  }

  /** Drift SERIES: [[histogramDrift]] between every pair of consecutive
    * days, per group — the monitoring timeline ("which day did the
    * distribution move") rather than a single two-population readout.
    * Day-d's histogram plays current against day-(d−1)'s reference;
    * first days (no predecessor) and phantom successors drop out through
    * the same missing-side rule as [[histogramDrift]]. Rows whose
    * timestamp is null (or fails date conversion) are excluded up front:
    * a null day has no predecessor or successor, and letting it through
    * the shifted self-join would surface the same histogram twice as two
    * disjoint unmatched sides — a spurious maximum-drift (2.0) row for a
    * day that doesn't exist.
    *
    * Scale shape: ONE (group, day, bin) count aggregation over the rows
    * (map-side combine — the only row-grain pass), then a FULL OUTER
    * self-equi-join of the tiny histogram frame against itself shifted by
    * one day (groups × days × bins rows on each side), and the shared
    * [[driftFold]]. Statistic and determinism contract identical to
    * [[histogramDrift]].
    */
  def driftSeries(df: DataFrame, group: Column, value: Column, time: Column,
                  binWidth: Double, nBins: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val bin = binOf(value, binWidth, nBins)
    val counts = df.filter(value.isNotNull)
      .select(group.as("__gg"), to_date(time).as("__day"), bin.as("__b"))
      .filter(col("__day").isNotNull)
      .groupBy(col("__gg"), col("__day"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val prev = counts.select(col("__gg").as("__gp"),
      date_add(col("__day"), 1).as("__dayp"), col("__b").as("__bp"),
      col("__n").as("__np"))
    val joined = counts.join(prev,
      col("__gg") <=> col("__gp") && col("__day") === col("__dayp") &&
        col("__b") === col("__bp"), "full_outer")
    val binned = joined.select(
      struct(coalesce(col("__gg"), col("__gp")).as("g"),
        coalesce(col("__day"), col("__dayp")).as("day")).as("__g"),
      coalesce(col("__b"), col("__bp")).as("__bin"),
      coalesce(col("__np"), lit(0L)).as("__na"),
      coalesce(col("__n"), lit(0L)).as("__nb"))
    driftFold(binned)
      .select(col("group_key.g").as("group_key"),
        col("group_key.day").as("day"), col("n_bins"), col("n_ref"),
        col("n_cur"), col("drift"))
  }

  /** Fold [[binCounts]]'s histogram into the per-group drift statistic
    * (contract in [[histogramDrift]]'s Scaladoc).
    */
  private[graft] def driftFold(binned: DataFrame): DataFrame = {
    // totals keyed under a fresh name: binned→totals share lineage, and a
    // USING join of a frame with its own aggregate leaves the aggregate's
    // columns ambiguous to string resolution
    val totals = binned.groupBy(col("__g").as("__gt"))
      .agg(sum(col("__na")).as("__ta"), sum(col("__nb")).as("__tb"))
    val p = col("__na").cast("double") / col("__ta").cast("double")
    val q = col("__nb").cast("double") / col("__tb").cast("double")
    val term = when(col("__na") + col("__nb") > 0L,
      (p - q) * (p - q) / (p + q)).otherwise(lit(0.0d))
    binned.join(totals, col("__g") <=> col("__gt"))
      .filter(col("__ta") > 0L && col("__tb") > 0L)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_bins"),
        max(col("__ta")).as("n_ref"), max(col("__tb")).as("n_cur"),
        sum(round(term, 12).cast("decimal(28,14)")).cast("double")
          .as("drift"))
      .select(col("__g").as("group_key"), col("n_bins"), col("n_ref"),
        col("n_cur"), round(col("drift"), 6).as("drift"))
  }

  /** Embedding-column health profile: per group, vector count and the
    * L2-norm distribution (min/max/mean) plus how many vectors are
    * unit-norm within `unitTol` — the sanity pass a similarity pipeline
    * runs before trusting cosine scores (an un-normalized or zeroed
    * vector silently corrupts every downstream kNN/ANN ranking). Null and
    * EMPTY embedding arrays are counted as norm-0 vectors rather than
    * silently dropped — they are precisely the broken vectors the check
    * exists to surface (they pull `min_norm` to 0 and are never
    * unit-norm).
    *
    * Determinism: each squared component is one IEEE multiply
    * (float→double is exact), squares sum in DECIMAL(28,18)
    * (order-independent), `sqrt` of the double total is IEEE-correctly
    * rounded in both engines (the q99 idiom — sqrt is safe, libm logs are
    * not); norms round to 9 dp before the DECIMAL mean sum.
    *
    * Scale shape: the dim explode is a map-side Generate; one aggregation
    * shuffles (group, id) partial sums, one folds per group. No windows.
    */
  def embeddingHealth(df: DataFrame, group: Column, id: Column, vec: Column,
                      unitTol: Double = 0.001): DataFrame = {
    val x = col("__x").cast("double")
    // explode_outer keeps one null-component row for null/empty arrays;
    // the all-null sum coalesces to 0 → norm 0, so those vectors count
    val norms = df
      .select(group.as("__g"), id.as("__id"), explode_outer(vec).as("__x"))
      .groupBy(col("__g"), col("__id"))
      .agg(coalesce(sum((x * x).cast("decimal(28,18)")).cast("double"),
        lit(0.0d)).as("__nsq"))
      .withColumn("__nm", sqrt(col("__nsq")))
    norms.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_vectors"),
        round(min(col("__nm")), 6).as("min_norm"),
        round(max(col("__nm")), 6).as("max_norm"),
        round(sum(round(col("__nm"), 9).cast("decimal(28,12)"))
          .cast("double") / count(lit(1)).cast("double"), 6).as("mean_norm"),
        sum(when(abs(col("__nm") - lit(1.0d)) <= lit(unitTol), lit(1L))
          .otherwise(lit(0L))).as("n_unit"))
      .select(col("__g").as("group_key"), col("n_vectors"), col("min_norm"),
        col("max_norm"), col("mean_norm"), col("n_unit"))
  }

  /** Per-group Gram (uncentered second-moment) matrix of an embedding
    * column: for every group and every dimension pair `i ≤ j`, the exact
    * sum Σ vᵢ·vⱼ over the group's vectors — the input PCA / covariance /
    * whitening needs (centering subtracts the mean outer product, a
    * d-sized correction computable from the same frame). `n_terms`
    * carries the vector count so downstream normalization divides by the
    * population that actually contributed.
    *
    * Scale shape: the d·(d+1)/2 cell products are generated MAP-SIDE per
    * row (nested `transform` over `sequence`, flattened and exploded — a
    * codegen'd Generate, no join, no row-grain shuffle); the only shuffle
    * carries per-partition partial sums over groups × d·(d+1)/2 keys
    * (d = 64 → 2 080 cells), so 100 TB of vectors moves kilobytes per
    * partition. The d² blowup is per-row CPU, the right place for it.
    *
    * Determinism: float components cast to double (exact), one IEEE
    * multiply per cell (engine-identical), sums accumulate in
    * DECIMAL(28,18) — order-free with 10 integer digits of headroom
    * (|vᵢ·vⱼ| ≤ 1 for unit-norm vectors → safe to ~10^10 rows per group;
    * widen the cast alongside any larger corpus claim). Null and empty
    * vectors contribute no cells and are excluded from `n_terms`.
    */
  def gramMatrix(df: DataFrame, group: Column, vec: Column): DataFrame =
    gramSums(df, group, vec)
      .select(col("group_key"), col("i"), col("j"), col("n_terms"),
        Readout.rdz(col("__s").cast("double"), 6).as("s"))

  /** Shared core of [[gramMatrix]] and [[covarianceMatrix]]: per (group,
    * i ≤ j) cell, the contribution count and the UNROUNDED DECIMAL(28,18)
    * sum of products (map-side cell generation — see gramMatrix's scale
    * note). */
  private def gramSums(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val v = col("__v")
    // spread BEFORE the d²-per-row cell explode: embedding parquet
    // arrives as one partition, and without this the whole gram pass —
    // the operator's entire cost — runs on ONE core (the r7 10× probe
    // measured q163 at 83 s/sf1 single-threaded, flat shuffle)
    val cells = Dedup.spread(df).select(group.as("__g"), vec.as("__v"))
      .filter(size(col("__v")) > 0)
      .select(col("__g"), explode(flatten(transform(
        sequence(lit(0), size(v) - 1),
        i => transform(sequence(i, size(v) - 1),
          j => struct(i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(v, i + 1).cast("double") *
              element_at(v, j + 1).cast("double")).as("p")))))).as("__c"))
    cells
      .groupBy(col("__g").as("group_key"), col("__c.i").as("i"),
        col("__c.j").as("j"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__c.p").cast("decimal(28,18)")).as("__s"))
  }

  /** [[gramMatrix]] with DIM-TILED cell generation — the production
    * shape for modern embedding widths. The flat generator materializes
    * an intermediate d·(d+1)/2-struct array PER ROW inside the project:
    * perfect at d = 64 (2 080 cells), but at d = 4096 that is 8.4M
    * structs per row — a per-row allocation cliff long before the
    * shuffle (which only ever carries partial sums) notices. Here each
    * row first fans out over the (d/tile)·(d/tile+1)/2 TILE pairs (a
    * small index array), and only then generates its ≤ tile² cells per
    * fanned row — identical cell set, identical DECIMAL sums, identical
    * output, but the largest transient array is tile² (default 64² =
    * 4 096) regardless of d, and the d² CPU spreads across the fanned
    * rows instead of spiking inside one projection. Same single
    * shuffle of partial sums; no join. q285 gates it cell-for-cell
    * against [[gramMatrix]]'s oracle on a tile that genuinely fans
    * (tile < d), and the 10× table records the d ≥ 512 behavior the
    * flat generator cannot reach.
    */
  def gramMatrixTiled(df: DataFrame, group: Column, vec: Column,
                      tile: Int = 64): DataFrame = {
    require(tile >= 2 && tile <= 1024, s"tile must be in [2, 1024], got $tile")
    val v = col("__v")
    val d = size(v)
    // ceil(d / tile) — Column `/` is DOUBLE division, so cast back (the
    // quotient is exact at any real dim, and sequence() needs integral)
    val nt = ((d + lit(tile) - 1) / lit(tile)).cast("int")
    val tilePairs = flatten(transform(sequence(lit(0), nt - 1),
      bi => transform(sequence(bi, nt - 1),
        bj => struct(bi.as("bi"), bj.as("bj")))))
    val rows = Dedup.spread(df).select(group.as("__g"), vec.as("__v"))
      .filter(size(col("__v")) > 0)
      .select(col("__g"), col("__v"), explode(tilePairs).as("__t"))
    val bi = col("__t.bi")
    val bj = col("__t.bj")
    val cells = rows.select(col("__g"), explode(flatten(transform(
      sequence(bi * tile, least((bi + 1) * tile, d) - 1),
      i => transform(
        sequence(greatest(i, bj * tile), least((bj + 1) * tile, d) - 1),
        j => struct(i.cast("long").as("i"), j.cast("long").as("j"),
          (element_at(v, i + 1).cast("double") *
            element_at(v, j + 1).cast("double")).as("p")))))).as("__c"))
    cells
      .groupBy(col("__g").as("group_key"), col("__c.i").as("i"),
        col("__c.j").as("j"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__c.p").cast("decimal(28,18)")).as("__s"))
      .select(col("group_key"), col("i"), col("j"), col("n_terms"),
        Readout.rdz(col("__s").cast("double"), 6).as("s"))
  }

  /** Per-group POPULATION covariance matrix of an embedding column:
    * cov(i,j) = S_ij/n − (s_i/n_i)(s_j/n_j) — the gram second moment
    * centered by the mean outer product, i.e. exactly what PCA /
    * whitening consumes. Returns (group_key, i, j, n_terms, cov), i ≤ j.
    *
    * Scale shape: the d²-cell gram reuses [[gramMatrix]]'s map-side
    * generation (kilobytes of partial sums per partition); the per-dim
    * sums frame is groups × d rows — broadcast onto the cells, so
    * centering adds NO extra shuffle over the gram itself.
    *
    * Determinism: all sums are exact DECIMAL(28,18); the covariance is
    * two double divisions, one product and one subtraction on exact
    * inputs — the identical expression tree the oracle computes, so
    * round-6 output matches across engines. Under ragged vectors each
    * cell normalizes by ITS contribution count (n_terms, n_i, n_j);
    * with uniform dims these all equal the group's vector count.
    */
  def covarianceMatrix(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val dims = df.select(group.as("__g"), vec.as("__v"))
      .filter(size(col("__v")) > 0)
      .select(col("__g"), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy(col("__g"), col("__i").cast("long").as("__d"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast("double").cast("decimal(28,18)")).as("__m"))
    gramSums(df, group, vec)
      .join(broadcast(dims.select(col("__g").as("group_key"),
        col("__d").as("i"), col("__n").as("__ni"), col("__m").as("__mi"))),
        Seq("group_key", "i"))
      .join(broadcast(dims.select(col("__g").as("group_key"),
        col("__d").as("j"), col("__n").as("__nj"), col("__m").as("__mj"))),
        Seq("group_key", "j"))
      .select(col("group_key"), col("i"), col("j"), col("n_terms"),
        (col("__s").cast("double") / col("n_terms").cast("double") -
          (col("__mi").cast("double") / col("__ni").cast("double")) *
            (col("__mj").cast("double") / col("__nj").cast("double")))
          .as("cov"))
  }

  /** Top principal direction of the per-group SECOND-MOMENT (gram/n-free)
    * matrix by `iters` unrolled power-iteration rounds — the first PCA
    * step, run entirely as joins + aggregates. Starts from the all-ones
    * vector, normalizes after every matvec, and returns one row per
    * (group, dim): the final unit component plus the per-group eigenvalue
    * estimate ‖M·v‖ (v unit ⇒ the Rayleigh-quotient estimate).
    *
    * The matrix entries are exactly [[gramMatrix]]'s round-6 readout `s`
    * (mirrored to full symmetry), so an external engine can replay the
    * identical arithmetic from the same published matrix.
    *
    * Scale shape: the matrix frame is groups × d(d+1)/2 cells — the
    * CORPUS never re-enters after the one gram pass; every iteration
    * joins the d-row vector frame (broadcast) onto the cell frame and
    * aggregates by (group, i): matvec cost d² per group per round,
    * independent of corpus size.
    *
    * Determinism: every matvec/norm SUM runs per-term round-9 →
    * DECIMAL(28,12) (the q149 idiom — addition order cannot matter);
    * divisions and sqrt are correctly-rounded IEEE ops on identical
    * inputs. An oracle unrolling the same `iters` rounds matches the
    * round-6 output bit-for-bit.
    */
  def powerIteration(df: DataFrame, group: Column, vec: Column,
                     iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val upper = gramMatrix(df, group, vec)
      .select(col("group_key"), col("i"), col("j"), col("s"))
    val m = upper.unionAll(upper.filter(col("i") =!= col("j"))
        .select(col("group_key"), col("j").as("i"), col("i").as("j"),
          col("s")))
      .localCheckpoint() // read every iteration; corpus lineage ends here
    def decSum(c: Column) = sum(round(c, 9).cast("decimal(28,12)"))
      .cast("double")
    var v = m.select(col("group_key"), col("i").as("dim")).distinct()
      .withColumn("v", lit(1.0))
    for (_ <- 1 to iters) {
      val w = m.join(broadcast(v.select(col("group_key"),
          col("dim").as("j"), col("v").as("__vj"))), Seq("group_key", "j"))
        .groupBy(col("group_key"), col("i").as("dim"))
        .agg(decSum(col("s") * col("__vj")).as("w"))
      val norms = w.groupBy(col("group_key"))
        .agg(sqrt(decSum(col("w") * col("w"))).as("__nrm"))
      v = w.join(broadcast(norms), Seq("group_key"))
        .select(col("group_key"), col("dim"),
          (col("w") / col("__nrm")).as("v"), col("__nrm"))
    }
    v.select(col("group_key"), col("dim"), col("v").as("component"),
      col("__nrm").as("eigenvalue"))
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
    * return null rather than dividing by zero. If ONE group approaches
    * the full table (a single giant source), this shares the
    * full-stratum-sort exposure [[winsorize]] had — the banded-selection
    * idiom there is the template for that regime (Σi·xᵢ would become a
    * per-band partial with a below-band offset).
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

  /** Per-group feature scaling — min-max and z-score in one pass: the
    * normalization step every feature pipeline runs before training,
    * with the statistics computed DECIMAL-exact so the gate is exact.
    * Returns the input keyed rows plus (minmax, zscore); both null when
    * the group is constant (zero range / zero variance — scaling is
    * undefined, not zero). z-score uses the POPULATION variance
    * (Σv²/n − mean², the q129 moment idiom).
    *
    * Scale shape: one grouped moment aggregation (map-side partials)
    * broadcast back onto the rows — no window, no sort; the row pass is
    * map-side after the join. Moment sums hop through VARCHAR on the
    * oracle side past 53 bits (q99's caveat).
    */
  def featureScale(df: DataFrame, group: Column, id: Column,
                   value: Column, scale: Int = 4): DataFrame = {
    val base = df.select(group.as("group_key"), id.as("id"),
      value.cast(s"decimal(18,$scale)").as("__v"))
    val stats = base.groupBy(col("group_key"))
      .agg(min(col("__v")).cast("double").as("__mn"),
        max(col("__v")).cast("double").as("__mx"),
        count(lit(1)).cast("double").as("__n"),
        sum(col("__v").cast("decimal(38,8)")).cast("double").as("__s"),
        sum((col("__v") * col("__v")).cast("decimal(38,8)")).cast("double")
          .as("__ss"))
    val mean = col("__s") / col("__n")
    val variance = col("__ss") / col("__n") - mean * mean
    val v = col("__v").cast("double")
    base.join(broadcast(stats), Seq("group_key"))
      .select(col("group_key"), col("id"), v.as("value"),
        when(col("__mx") === col("__mn"), lit(null).cast("double"))
          .otherwise(round((v - col("__mn")) / (col("__mx") - col("__mn")),
            6)).as("minmax"),
        when(variance <= 0.0d, lit(null).cast("double"))
          .otherwise(Readout.rdz((v - mean) / sqrt(variance), 6))
          .as("zscore"))
  }

  /** Lag-1 autocorrelation of a per-group DAILY COUNT series: Pearson
    * correlation between consecutive days' counts — the "is today's
    * volume predictive of tomorrow's" seasonality probe, and a pure
    * integer-moment computation (counts are integers, so all five sums
    * are DECIMAL-exact; the q164 assortativity idiom on a time series).
    * Only CONSECUTIVE day pairs correlate (a gap breaks the pair — the
    * honest treatment; zero-fill first via resample if gaps should
    * count as zeros). Returns (group_key, n_pairs, autocorr), null when
    * fewer than 2 pairs or zero variance on either side.
    *
    * Scale shape: one (group, day) count aggregation, one self
    * equi-join on (group, day+1) at day grain, one scalar fold per
    * group.
    */
  def lag1Autocorr(df: DataFrame, group: Column, ts: Column): DataFrame = {
    val daily = df.select(group.as("group_key"),
        to_date(ts.cast("timestamp")).as("__d"))
      .groupBy(col("group_key"), col("__d"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // both sides of the lag join
    val pairs = daily.select(col("group_key"), col("__d"),
        col("__c").as("__x"))
      .join(daily.select(col("group_key"),
        date_sub(col("__d"), 1).as("__d"), col("__c").as("__y")),
        Seq("group_key", "__d"))
    def s(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val n = count(lit(1)).cast("double")
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
      (col("__n") * col("__syy") - col("__sy") * col("__sy")))
    pairs.groupBy(col("group_key"))
      .agg(count(lit(1)).as("n_pairs"), n.as("__n"),
        s(col("__x")).as("__sx"), s(col("__y")).as("__sy"),
        s(col("__x") * col("__x")).as("__sxx"),
        s(col("__y") * col("__y")).as("__syy"),
        s(col("__x") * col("__y")).as("__sxy"))
      .select(col("group_key"), col("n_pairs"),
        when(col("n_pairs") < 2L || den === 0.0d,
          lit(null).cast("double"))
          .otherwise(Readout.rdz(num / den, 6)).as("autocorr"))
  }

  /** Equi-DEPTH histogram: per group, `buckets` value bands holding
    * (approximately) equal row counts, with exact interpolated quantile
    * boundaries — the planner-statistics / data-profile complement of
    * the equi-width histogram (q39) and the row-rank quartiles (q141):
    * boundaries adapt to the distribution, so heavy tails don't empty
    * the top bands. Returns (group_key, bucket, n, min_v, max_v);
    * bucket b covers (boundary_{b-1}, boundary_b], b ∈ 1..buckets.
    *
    * Boundaries are Spark's exact `percentile` ≡ DuckDB `quantile_cont`
    * (the q46 parity idiom; swap percentile_approx at 100 TB per the
    * winsorize note), ROUNDED to 6dp before the comparison: the two
    * engines' interpolation expression trees differ sub-ulp
    * (lower + f·(upper−lower) vs the blend form), and a data value
    * sitting exactly on one engine's boundary flips buckets — found at
    * sf0.1, where a 2dp value equalled one side's unrounded boundary.
    * Fixed-point inputs keep interpolated boundaries near coarse decimal
    * grid points, far from 7th-decimal halves, so round-6 absorbs the
    * ulp noise deterministically. Assignment is 1 + Σ (v > boundary_i).
    * Scale: one exact-percentile aggregation, one broadcast of the
    * |groups|-row boundary frame, one (group, bucket) fold.
    */
  def equiDepthHistogram(df: DataFrame, group: Column, value: Column,
                         buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val base = df.select(group.as("__g"), value.cast("double").as("__v"))
    val bounds = base.groupBy(col("__g"))
      .agg(expr(s"percentile(__v, array(${fracs.mkString(", ")}))")
        .as("__b"))
    val bucket = (1 until buckets)
      .map(i => when(col("__v") > round(element_at(col("__b"), i), 6), 1L)
        .otherwise(0L))
      .reduce(_ + _) + lit(1L)
    base.join(broadcast(bounds), Seq("__g"))
      .withColumn("bucket", bucket)
      .groupBy(col("__g").as("group_key"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__v")), 4).as("min_v"),
        round(max(col("__v")), 4).as("max_v"))
  }

  /** Hierarchical contribution analysis: a measure summed at
    * (parent, child) grain with each child's share of its parent, each
    * parent's share of the total, and the child's rank inside its
    * parent — the drill-down readout every revenue/volume dashboard
    * opens with, as two aggregations and one window. Returns
    * (parent, child, measure, share_of_parent, parent_share, rank_in_parent).
    *
    * `measure` must be fixed-point (cast decimal upstream) so all three
    * sum levels are DECIMAL-exact and order-independent; shares are
    * IEEE divisions of the exact sums (oracle side hops through VARCHAR
    * past 53 bits, the q99 caveat). Scale: one (parent, child) hash
    * aggregation, then everything operates on the group-grain frame;
    * the grand total rides in as a broadcast one-row frame (round-7 —
    * the former `partitionBy(lit(1))` window folded to an unpartitioned
    * one-task pass over the whole group-grain frame).
    */
  def contributionShares(df: DataFrame, parent: Column, child: Column,
                         measure: Column, scale: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(parent.as("parent"), child.as("child"),
        measure.cast(s"decimal(18,$scale)").as("__m"))
      .groupBy(col("parent"), col("child"))
      .agg(sum(col("__m").cast("decimal(38,8)")).as("__cm"))
      .localCheckpoint() // read by the total fold and the windowed result
    val pw = Window.partitionBy(col("parent"))
    val rankW = Window.partitionBy(col("parent"))
      .orderBy(col("__cm").desc, col("child").asc)
    base
      .withColumn("__pm", sum(col("__cm")).over(pw))
      .crossJoin(broadcast(base.agg(sum(col("__cm")).as("__tm"))))
      .select(col("parent"), col("child"),
        col("__cm").cast("double").as("measure"),
        round(col("__cm").cast("double") / col("__pm").cast("double"), 6)
          .as("share_of_parent"),
        round(col("__pm").cast("double") / col("__tm").cast("double"), 6)
          .as("parent_share"),
        row_number().over(rankW).cast("long").as("rank_in_parent"))
  }

  /** 2-D Pareto frontier (skyline), maximizing both dimensions: rows no
    * other row STRICTLY dominates (≥ on both, > on at least one) — the
    * multi-objective curation cut ("highest quality AND highest
    * novelty" without collapsing the two into one weighted score).
    * Equal-(x, y) duplicates are all on the frontier (nothing strictly
    * dominates them). Returns the surviving (id, x, y) rows.
    *
    * The sort-free characterization the implementation uses: with
    * G(x) = max y at the same x and M(x) = max y at any strictly
    * greater x, a row survives iff y = G(x) and y > M(x) (or no greater
    * x exists). Scale shape: one groupBy to distinct-x grain, then M(x)
    * via the BANDED prefix-max (round-7 — the former running-max window
    * serialized the distinct-x frame, score grain but still data-
    * scaling, through one task): a percentile grid over x splits the
    * distinct-x frame into bands, per-band maxima fold to
    * strictly-above-band offsets through a grid²-pair self-join, and
    * the only window is PARTITIONED by band (exclusive running max
    * within it). One equi-join back. All comparisons are on values both
    * engines computed identically — no floats are created here.
    */
  def paretoFrontier2D(df: DataFrame, id: Column, x: Column,
                       y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("id"), x.as("x"), y.as("y"))
    val grid = 256
    val fracs = (0 to grid).map(_.toDouble / grid)
    val gm0 = base.groupBy(col("x")).agg(max(col("y")).as("__gy"))
    val piv = gm0.agg(percentile_approx(col("x"),
      lit(fracs.toArray), lit(1000)).as("__piv"))
    val banded = gm0.crossJoin(broadcast(piv))
      .withColumn("__band", size(filter(col("__piv"), p => p < col("x"))))
      .drop("__piv")
    val bandMax = banded.groupBy(col("__band"))
      .agg(max(col("__gy")).as("__bm"))
    // max over strictly HIGHER bands (x desc order ⇒ larger band first)
    val bandOff = bandMax.alias("a")
      .join(broadcast(bandMax.alias("b")),
        col("a.__band") < col("b.__band"), "left")
      .groupBy(col("a.__band").as("__band"))
      .agg(max(col("b.__bm")).as("__boff"))
    val wIntra = Window.partitionBy(col("__band")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls, so an empty prefix on either level keeps
    // the exact "no greater x" null the survivor predicate relies on
    val gmax = banded.join(broadcast(bandOff), Seq("__band"))
      .withColumn("__m",
        greatest(max(col("__gy")).over(wIntra), col("__boff")))
      .drop("__band", "__boff")
    base.join(broadcast(gmax), Seq("x"))
      .filter(col("y") === col("__gy") &&
        (col("__m").isNull || col("y") > col("__m")))
      .select(col("id"), col("x"), col("y"))
  }

  /** Referential-integrity audit of one FK relation, both directions:
    * orphan children (child key with no parent) AND unreferenced parents
    * (parent row no child points at) — the ETL acceptance check a
    * warehouse load runs before publishing, and the coverage readout
    * ("how much of the dimension does the fact table actually touch").
    * Returns one row: (relation, n_children, n_orphans, orphan_rate,
    * n_parents, n_unreferenced, coverage_rate).
    *
    * Scale shape: one anti-join per direction on the key (shuffle or
    * broadcast per AQE — dimension sides are broadcast-able by nature)
    * plus two count folds; rates are integer-fed divisions. NULL child
    * keys count as orphans (they reference nothing) — the strict-audit
    * convention, stated here because anti-join semantics would silently
    * pass them.
    */
  def referentialAudit(relation: String, children: DataFrame,
                       childKey: Column, parents: DataFrame,
                       parentKey: Column): DataFrame = {
    val c = children.select(childKey.as("__ck"))
    val p = parents.select(parentKey.as("__pk"))
    val orphans = c.join(p, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val unref = p.join(c, col("__pk") === col("__ck"), "left_anti")
      .agg(count(lit(1)).as("n_unreferenced"))
    val nc = c.agg(count(lit(1)).as("n_children"))
    val np = p.agg(count(lit(1)).as("n_parents"))
    nc.crossJoin(broadcast(orphans)).crossJoin(broadcast(np))
      .crossJoin(broadcast(unref))
      .select(lit(relation).as("relation"), col("n_children"),
        col("n_orphans"),
        round(col("n_orphans").cast("double") /
          col("n_children").cast("double"), 6).as("orphan_rate"),
        col("n_parents"), col("n_unreferenced"),
        round((col("n_parents") - col("n_unreferenced")).cast("double") /
          col("n_parents").cast("double"), 6).as("coverage_rate"))
  }

  /** Benford first-significant-digit audit per group: observed digit
    * shares of a positive fixed-point metric column against the Benford
    * expectation log10(1 + 1/d) — the classic fabricated-numbers /
    * broken-upstream-transform smell test. Returns
    * (group_key, digit, n, share, expected, deviation) for digits 1–9.
    *
    * Determinism: the first digit is extracted INTEGER-SIDE — values are
    * scaled to cents (round(v·100), exact for 2-dp fixtures), cast to a
    * string, first character taken — so no runtime log10 sits on the
    * gate path (a 1-ulp log10 divergence at a power-of-10 boundary would
    * flip the digit); the Benford expectations are Scala-computed
    * literals injected identically into both engines. Rows whose scaled
    * cents round below 1 — v ≤ 0 AND sub-cent positives in (0, 0.005),
    * whose first "digit" would be 0 and crash the expectation lookup —
    * are excluded (Benford is undefined there). Scale: one groupBy over
    * (group, digit) — map-side combine, 9 rows per group out.
    */
  def benfordDigits(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expected = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val expCol = element_at(
      array(expected.map(lit): _*), col("digit").cast("int"))
    val totals = Window.partitionBy(col("group_key"))
    val cents = round(value.cast("double") * 100.0d)
    df.filter(cents >= 1.0d)
      .select(group.as("group_key"),
        substring(cents.cast("decimal(38,0)")
          .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("group_key"), col("digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("group_key"), col("digit"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(totals).cast("double"), 6).as("share"),
        round(expCol, 6).as("expected"),
        Readout.rdz(col("n").cast("double") /
          sum(col("n")).over(totals).cast("double") - expCol, 6)
          .as("deviation"))
  }

  /** Per-group simple linear regression (OLS): slope and intercept of
    * `y` on `x` via the five moment sums — the trend detector behind
    * "is value drifting with hour-of-day / day-of-week / position"
    * dashboards, computed in ONE aggregation pass per group (the q99
    * correlation idiom extended to the fit itself). Returns
    * (group_key, n, slope, intercept).
    *
    * Determinism contract: `x` must be integer-valued and `y`
    * fixed-point (≤ `scale` decimals) — then every moment sum is
    * DECIMAL-exact and order-independent, and slope/intercept are one
    * IEEE tree over exactly-represented inputs. Sums hop through VARCHAR
    * on the oracle side when they exceed 53 bits (the q99 caveat — the
    * engine's BigDecimal→double cast is correctly rounded already).
    * Groups where x is constant yield null slope/intercept (vertical
    * fit), not a divide-by-zero.
    */
  def groupOls(df: DataFrame, group: Column, x: Column, y: Column,
               scale: Int = 4): DataFrame = {
    val base = df.select(group.as("__g"),
      x.cast("decimal(18,0)").as("__x"),
      y.cast(s"decimal(18,$scale)").as("__y"))
    def d(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val n = count(lit(1)).cast("double")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) / den
    base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), n.as("__n"),
        d(col("__x")).as("__sx"), d(col("__y")).as("__sy"),
        d(col("__x") * col("__x")).as("__sxx"),
        d(col("__x") * col("__y")).as("__sxy"))
      .select(col("__g").as("group_key"), col("n"),
        when(den === 0.0d, lit(null).cast("double"))
          .otherwise(Readout.rdz(slope, 6)).as("slope"),
        when(den === 0.0d, lit(null).cast("double"))
          .otherwise(Readout.rdz(
            (col("__sy") - col("__sx") * slope) / col("__n"), 6))
          .as("intercept"))
  }

  /** Cohen's kappa between two categorical labelings of the same rows —
    * chance-corrected inter-annotator agreement, the acceptance gate for
    * labeling pipelines (two annotation runs, a model vs a human pass, or
    * two rule versions): po = observed agreement, pe = Σ_c pA(c)·pB(c)
    * expected-by-chance, κ = (po − pe)/(1 − pe). Returns one row
    * (n, n_agree, po, pe, kappa); κ is null when pe = 1 (both raters
    * constant and equal — agreement is vacuous, not perfect).
    *
    * Scale shape: one count aggregation for the agreement cell plus two
    * marginal aggregations joined on category (rows = |categories|,
    * tiny); no row-grain join. Determinism: every input to the formula
    * is an integer count; po/pe/κ are one IEEE expression tree both
    * engines evaluate identically (pe's numerator Σ nA·nB summed
    * DECIMAL-exact before the single division).
    */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val base = df.select(a.cast("string").as("__a"), b.cast("string").as("__b"))
    val totals = base.agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("n_agree"))
    val ma = base.groupBy(col("__a").as("__c")).agg(count(lit(1)).as("__na"))
    val mb = base.groupBy(col("__b").as("__c")).agg(count(lit(1)).as("__nb"))
    val peNum = ma.join(mb, Seq("__c"))
      .agg(coalesce(sum((col("__na") * col("__nb")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__pe_num"))
    val joined = totals.crossJoin(broadcast(peNum))
    val po = col("n_agree").cast("double") / col("n").cast("double")
    val pe = col("__pe_num").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    joined.select(col("n"), col("n_agree"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe === 1.0d, lit(null).cast("double"))
        .otherwise(Readout.rdz((po - pe) / (lit(1.0d) - pe), 6))
        .as("kappa"))
  }

  /** Robust outlier detection via the median absolute deviation: per
    * group, med = median(v), mad = median(|v − med|), outlier ⟺
    * |v − med| > nSigma·mad. The z-score's robust sibling (q129 flags by
    * mean/stddev, which the outliers themselves drag): breakdown point
    * 50%, so a heavy-tailed metric column can't hide its own anomalies.
    * Returns (group_key, med, mad, n, n_outliers, outlier_rate).
    *
    * Both medians are Spark's exact interpolated `percentile` ≡ DuckDB's
    * `quantile_cont` (the q46 parity idiom). Scale shape: two grouped
    * exact-percentile passes plus two broadcast joins of the per-group
    * stats frame (rows = |groups|, tiny by construction); the exact
    * median is the oracle-checkable form — swap `percentile_approx` in
    * at 100 TB exactly as [[winsorize]] documents. mad = 0 (over half
    * the group at the median) degenerates to flagging every v ≠ med —
    * the standard MAD caveat, deterministic, documented not hidden.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  nSigma: Double = 3.0): DataFrame = {
    require(nSigma > 0.0, s"nSigma must be > 0, got $nSigma")
    val base = df.select(group.as("__g"), value.cast("double").as("__v"))
    val med = base.groupBy(col("__g"))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val dev = base.join(broadcast(med), Seq("__g"))
      .withColumn("__ad", abs(col("__v") - col("__med")))
    val stats = dev.groupBy(col("__g"))
      .agg(min(col("__med")).as("med"),
        expr("percentile(__ad, 0.5)").as("mad"),
        count(lit(1)).as("n"))
    dev.join(broadcast(stats.select(col("__g"), col("mad").as("__mad"))),
        Seq("__g"))
      .groupBy(col("__g"))
      .agg(sum(when(col("__ad") > lit(nSigma) * col("__mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .join(stats, Seq("__g"))
      .select(col("__g").as("group_key"), col("med"), col("mad"), col("n"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") /
          col("n").cast("double"), 6).as("outlier_rate"))
  }

  /** Per-group Spearman rank correlation: Pearson's formula over the
    * AVERAGE tied ranks of x and y — the monotone-association readout
    * that, unlike q99's Pearson, ignores the variables' scales and
    * outliers ("does quality rise with length at all", not "linearly").
    * Returns (group_key, n, spearman); null for degenerate groups
    * (n < 2 or a constant variable).
    *
    * Pure-integer rank trick: the DOUBLED average tied rank
    * `2r + ties − 1` (rank() + the tie count) is always an integer, and
    * Spearman is scale-invariant, so every moment sum runs in exact
    * 64-bit/decimal integer arithmetic (q164's device) — the only
    * floats are the final Pearson quotient's identical IEEE tree. Rank
    * windows are PARTITIONED BY GROUP (per-task memory = the largest
    * group, never the corpus).
    */
  def spearmanCorr(df: DataFrame, group: Column, x: Column,
                   y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null x/y pairs are EXCLUDED — pairwise-complete deletion, the
    // standard convention (round-7, ADVICE): ranking nulls instead would
    // diverge silently across engines (Spark windows default NULLS
    // FIRST, DuckDB's NULLS LAST), so the null contract is a filter, not
    // an ordering accident
    val base = df.select(group.as("__g"), x.as("__x"), y.as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def dblRank(c: String) = {
      val rw = Window.partitionBy(col("__g")).orderBy(col(c).asc)
      val tw = Window.partitionBy(col("__g"), col(c))
      lit(2L) * rank().over(rw).cast("long") +
        count(lit(1)).over(tw) - lit(1L)
    }
    val ranked = base
      .withColumn("__rx", dblRank("__x"))
      .withColumn("__ry", dblRank("__y"))
    def s(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val n = count(lit(1)).cast("double")
    ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        n.as("__n"),
        s(col("__rx")).as("__sx"), s(col("__ry")).as("__sy"),
        s(col("__rx") * col("__rx")).as("__sxx"),
        s(col("__ry") * col("__ry")).as("__syy"),
        s(col("__rx") * col("__ry")).as("__sxy"))
      .select(col("__g").as("group_key"), col("n"),
        when(col("n") < 2L ||
            col("__n") * col("__sxx") === col("__sx") * col("__sx") ||
            col("__n") * col("__syy") === col("__sy") * col("__sy"),
          lit(null).cast("double"))
          .otherwise(Readout.rdz(
            (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
              sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
                (col("__n") * col("__syy") - col("__sy") * col("__sy"))), 6))
          .as("spearman"))
  }
}
