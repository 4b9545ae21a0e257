package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

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

  /** Injective encoding of one possibly-null field: NULL → "n", value v →
    * "v<len>:<v>". The length prefix makes the concatenation of two encoded
    * fields unambiguous — a value containing the separator, or one literally
    * equal to a null sentinel, can never alias a different (stratum, id)
    * pair — so distinct pairs always get independent hash draws. NULL maps
    * to its own token (not a sentinel string a real value could equal)
    * because md5(NULL) is NULL and null-keyed rows would otherwise fail
    * every threshold test (sample(1.0) must be the identity).
    */
  private def enc(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("n"))
      .otherwise(concat(lit("v"), length(s).cast("string"), lit(":"), s))
  }

  /** The row's position in [0, 2^32): first 8 hex chars of
    * md5(enc(stratum)|enc(id)) — uniform, deterministic, engine-portable.
    */
  private[ops] def hashPos(strata: Column, id: Column): Column =
    conv(substring(md5(concat(
      enc(strata), lit("|"), enc(id))), 1, 8), 16, 10)
      .cast("long")

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

  /** Bounded uniform sample WITH payload — the deterministic reservoir:
    * keep the `k` rows whose md5 positions (salted "sample") are
    * smallest, ties by id. Functionally a k-row uniform sample that is
    * (a) engine-portable (any engine replays the draw), (b) NESTING
    * (the k'-sample for k' < k is a prefix of the k-sample — the hash is
    * fixed, only the cutoff moves), and (c) MERGEABLE like a KMV sketch
    * with payload: sample(A ⊎ B) = top-k(sample(A) ∪ sample(B)), which
    * is what lets a stream maintain a bounded uniform corpus sample
    * forever at k-row state ([[graft.streaming.Streaming.sampleMaintain]])
    * — the classic reservoir-sampling job, without reservoir sampling's
    * sequential-order dependence. Returns the input columns plus
    * `__pos`. Scale shape: one TakeOrdered top-k (per-partition heads,
    * never a global sort).
    *
    * PRECONDITION: `id` must be UNIQUE. The draw is keyed and
    * tie-broken by `id`; rows sharing an id share a (`__pos`, id) sort
    * key, so which of them survives the cutoff is arbitrary under
    * `limit` — silently breaking the nesting and merge laws the
    * stream-equals-batch gate depends on. Dedupe on id upstream if the
    * key can repeat (as [[graft.ops.Sketch.kmvState]] does implicitly
    * via distinct()).
    */
  def uniformTopKSample(df: DataFrame, id: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
    df.withColumn("__pos", hashPos(lit("sample"), id))
      .orderBy(col("__pos").asc, id.asc)
      .limit(k)
  }

  /** Cap every stratum at `maxRows` rows — the hot-domain downsampler: a
    * training mix that caps each source/domain at N documents keeps one
    * mega-crawl from drowning the rest. Rows are ranked inside the stratum
    * by their md5 hash (ties by id), so which rows survive is deterministic
    * and engine-portable, and strata under the cap pass through untouched.
    *
    * Two-phase exact cap, so a mega-stratum — by definition the hot key
    * being capped — never sorts in one task: phase 1 ranks within
    * (stratum, salt) buckets ([[rankSalts]] of them) and keeps each
    * bucket's `maxRows` smallest hashes; phase 2 takes the exact global
    * top-`maxRows` over the ≤ salts·maxRows survivors per stratum. The
    * global top-k is provably a subset of the union of bucket-local
    * top-k's (any globally-kept row is among its own bucket's k smallest),
    * so the result is identical to the single-window cap while the
    * per-task row count in phase 2 is bounded by salts·maxRows regardless
    * of stratum size.
    */
  def capPerStratum(df: DataFrame, strata: Column, id: Column,
                    maxRows: Int): DataFrame = {
    require(maxRows >= 0, s"maxRows must be >= 0, got $maxRows")
    saltedTopK(df.withColumn("__pos", hashPos(strata, id)),
      Seq(strata), id, maxRows)
      .drop("__pos", "__rank")
  }

  /** Two-phase salted EXACT top-k under (`__pos` asc, `tie` asc) within
    * each `part` group — the one place the subset argument lives: each of
    * the [[rankSalts]] (group, salt) buckets keeps its own top k, and
    * since dropping a row ranked below k IN ITS BUCKET can never evict a
    * row from the global top k (the global top k contains at most k rows
    * of any bucket), the exact global rank over the <= salts*k survivors
    * equals the rank over the full group — while no task ever sorts more
    * than one bucket. Callers add `__pos` first and get `__rank` back.
    */
  private def saltedTopK(df: DataFrame, part: Seq[Column], tie: Column,
                         k: Int): DataFrame = {
    val local = Window.partitionBy((part :+ col("__salt")): _*)
      .orderBy(col("__pos").asc, tie.asc)
    val global = Window.partitionBy(part: _*)
      .orderBy(col("__pos").asc, tie.asc)
    df.withColumn("__salt", pmod(col("__pos"), lit(rankSalts)))
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("__rank", row_number().over(global))
      .filter(col("__rank") <= k)
      .drop("__salt", "__lr")
  }

  /** Per-stratum quantile filter: keep rows whose `score` is at or above
    * the stratum's exact `q`-quantile (linear interpolation) — "drop the
    * worst quartile per language". One aggregation shuffles the scores;
    * the per-stratum thresholds (one row per stratum) broadcast back, so
    * the filter itself adds no shuffle.
    *
    * Cross-engine robustness of the cut: when the two order statistics the
    * quantile interpolates between DIFFER, the threshold lies strictly
    * between two data values, so a 1-ulp interpolation difference between
    * engines cannot flip any row's membership; when they are EQUAL, the
    * interpolation is exactly that value in either engine.
    */
  def keepTopQuantile(df: DataFrame, strata: Column, score: Column,
                      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val thr = df.groupBy(strata.as("__stratum"))
      .agg(percentile(score, lit(q)).as("__thr"))
    df.join(broadcast(thr), strata <=> col("__stratum"))
      .filter(score >= col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Weighted mixture: materialize each row `weight` times — the training
    * mix that upsamples high-value sources (weight 2.5 → every row twice,
    * half the rows a third time) and downsamples or drops others (0.25 →
    * keep a quarter; 0 → drop). The fractional copy is drawn by the same
    * md5 threshold as [[stratifiedSample]], so the mix is a pure function
    * of (stratum, id): reproducible across engines, retries, and
    * partitionings, and the integer part never depends on the hash at all.
    *
    * Output rows carry a `copy` index in [0, copies) so downstream
    * processing can distinguish (and e.g. shuffle) the repeats. Pure
    * map-side explode — no shuffle, no counting pass.
    */
  def weightedMix(df: DataFrame, strata: Column, id: Column,
                  weight: Column): DataFrame = {
    val whole = floor(weight).cast("long")
    val frac = weight - floor(weight)
    val extra = when(
      hashPos(strata, id) < floor(frac * lit(4294967296.0d)).cast("long"), 1L)
      .otherwise(0L)
    df.withColumn("__copies", whole + extra)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Temperature-based source mixing (the multilingual / multi-source
    * rebalancer of large-corpus training runs): a source holding share
    * `p` of the corpus gets sampling weight ∝ `p^alpha`. `alpha = 1`
    * keeps the natural distribution, `alpha = 0` is uniform, and the
    * common middle ground `alpha = 0.5` damps the head without drowning
    * the tail. Returns one row per source with its count, share, and a
    * `mix_weight` normalized so the LARGEST smoothed source is 1.0 —
    * relative weights are what a sampler consumes ([[weightedMix]] takes
    * them directly), and max-normalization keeps every emitted value a
    * pure two-operand IEEE op (count/total division, `sqrt`, one final
    * division), each correctly rounded and therefore bit-identical in
    * any IEEE-754 engine. A sum-normalized probability would instead
    * depend on float accumulation order. `alpha = 0.5` is computed via
    * `sqrt` (correctly rounded by IEEE mandate); other alphas go through
    * `pow`, which libms round differently by ±1 ulp — fine for the
    * sampler, excluded from the oracle gate.
    *
    * Scale shape: one count aggregate over the corpus (map-side partial),
    * then scalar folds over the per-source frame; the corpus total and
    * the max smoothed share ride in as broadcast one-row frames (the
    * repo's standard device — round-7 swapped them in for the former
    * whole-frame windows, so no single-task sort exists even when
    * "sources" are fine-grained domains).
    */
  def temperatureMix(df: DataFrame, source: Column, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("__tot"))
    val smoothed = counts.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_docs").cast("double") / col("__tot").cast("double"))
      .withColumn("__sm",
        if (alpha == 0.5) sqrt(col("share")) else pow(col("share"), alpha))
      .drop("__tot")
      .localCheckpoint() // read by the max fold and the final projection
    val mx = smoothed.agg(max(col("__sm")).as("__mx"))
    smoothed.crossJoin(broadcast(mx))
      .withColumn("mix_weight", col("__sm") / col("__mx"))
      .drop("__sm", "__mx")
  }

  /** Leakage-free train/val/test split: every row is assigned a split by
    * the md5 draw of its GROUP key — the near-dup component from
    * [[graft.ops.Dedup.connectedComponents]], a domain, an author — never
    * its own id, so duplicates and near-duplicates can never straddle the
    * train/eval boundary (the classic eval-contamination bug that makes
    * held-out loss a lie). Rows absent from `groups` are singletons and
    * fall back to their own id as the group key.
    *
    * Split boundaries are computed ONCE on the driver as exact longs over
    * the [0, 2^32) hash space (the last boundary is pinned to 2^32 so
    * float rounding can never orphan the tail); the per-row decision is
    * then pure integer comparison on the [[hashPos]] draw — deterministic
    * across engines, retries, and partitionings, like every sampler here.
    *
    * Scale shape: one equi-join of the corpus with the (much smaller)
    * group map — broadcast when it fits, shuffle otherwise; the split
    * itself is map-side.
    */
  def leakageFreeSplit(df: DataFrame, id: Column, groups: DataFrame,
                       gid: String, gcomp: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0.0), "split weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splitBounds(splits.map(_._2))
    val g = groups.select(col(gid).as("__gid"), col(gcomp).as("__grp"))
    val splitExpr = splits.map(_._1).zip(bounds).init
      .foldLeft(Option.empty[Column]) { case (acc, (name, bd)) =>
        Some(acc.map(_.when(col("__pos") < bd, name))
          .getOrElse(when(col("__pos") < bd, name)))
      }.map(_.otherwise(splits.last._1)).get
    // Mixed-type robustness, both directions: (a) numeric id/group-id
    // pairs join natively (Spark widens to the common numeric type — no
    // cast can fail), and only a string/non-string mismatch joins on
    // string forms, where ANSI's implicit cast would otherwise throw;
    // (b) the singleton fallback adopts the GROUP column's type via
    // try_cast, and an id that cannot adopt it LOSSLESSLY (uncastable
    // string, or a fractional double against integer groups) fails fast
    // with a named error instead of silently collapsing singletons onto
    // the null draw or truncating distinct ids onto one group key. The
    // draw itself hashes the string form — identical whenever the
    // adoption is lossless, well-defined even where it wouldn't be.
    import org.apache.spark.sql.types.StringType
    val grpType = g.schema("__grp").dataType
    val gidType = g.schema("__gid").dataType
    val idType = df.select(id).schema.head.dataType
    val joinCond =
      if (idType == gidType ||
          (idType != StringType && gidType != StringType)) id === col("__gid")
      else id.cast("string") === col("__gid").cast("string")
    val fallback = id.try_cast(grpType)
    val lossy = fallback.isNull || !(fallback.cast(idType) <=> id)
    df.join(g, joinCond, "left")
      .withColumn("group_key",
        when(col("__grp").isNull && id.isNotNull && lossy,
          raise_error(concat(lit("leakageFreeSplit: id "), id.cast("string"),
            lit(s" cannot adopt the group-key type ${grpType.simpleString}"))))
          .otherwise(coalesce(col("__grp"), fallback)))
      // Hash the ACTUAL group key's string form (coalesce(__grp, fallback)),
      // not the raw id's: for a lossless-but-string-divergent adoption
      // (double 5.0 against integer groups → "5" after adoption, "5.0" raw)
      // the draw must follow the adopted key or singletons in the same
      // logical group could straddle splits.
      .withColumn("__pos", hashPos(lit("split"),
        coalesce(col("__grp"), fallback).cast("string")))
      .withColumn("split", splitExpr)
      .drop("__gid", "__grp", "__pos")
  }

  /** Exact long boundaries over [0, 2^32) for cumulative split weights;
    * the final boundary is 2^32 itself, not a float rounding of it.
    */
  private[graft] def splitBounds(weights: Seq[Double]): Seq[Long] = {
    val cum = weights.scanLeft(0.0)(_ + _).tail
    cum.init.map(c => math.floor(c * 4294967296.0d).toLong) :+ 4294967296L
  }

  /** Uniform negative sampling for contrastive training: for every anchor,
    * `k` candidates with a DIFFERENT label, drawn uniformly (without
    * replacement) by ranking candidates under the md5 hash of the
    * (anchor, candidate) pair — the random-negatives complement to
    * Similarity.hardNegatives (which ranks by cosine instead). A pure
    * function of the id pair: the same anchors draw the same negatives
    * across engines, retries, and partitionings.
    *
    * The anchor frame broadcasts (it is the small side by contract, like
    * an ANN query batch), so candidates join map-side; the joined frame
    * then shuffles ONCE for ranking — keyed by (anchor, salt), not anchor
    * alone, so an anchor's full candidate set never lands in a single
    * task: each of the [[rankSalts]] buckets ranks its own k smallest
    * hashes, and the global top-k (provably a subset of the buckets'
    * union) is picked from the ≤ salts·k survivors per anchor. Embedding
    * payloads are untouched and prune out of the scan.
    */
  def negativeSamples(candidates: DataFrame, candId: Column, candLabel: Column,
                      anchors: DataFrame, anchorId: Column, anchorLabel: Column,
                      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val a = anchors.select(anchorId.as("query_id"), anchorLabel.as("__al"))
    val c = candidates.select(candId.as("item_id"), candLabel.as("__cl"))
    val joined = c.join(broadcast(a), col("__cl") =!= col("__al"))
      .withColumn("__pos", hashPos(col("query_id"), col("item_id")))
    saltedTopK(joined, Seq(col("query_id")), col("item_id"), k)
      .select(col("query_id"), col("item_id"),
        col("__rank").cast("long").as("rank"))
  }

  /** Salt fan-out for the bucket-local ranking phase of
    * [[negativeSamples]] and [[capPerStratum]]. */
  private val rankSalts = 64

  /** Deterministic global shuffle + equal-size shard assignment: every row
    * gets its global rank `rn` under md5-hash order (a reproducible random
    * permutation — the pre-training "shuffle the corpus once" step) and a
    * shard id in [0, shards) via exact integer `rn * shards DIV n`, which
    * yields shard sizes within one row of each other.
    *
    * The global rank is computed WITHOUT a one-partition global sort:
    * rows are range-partitioned and sorted by the hash key, the
    * per-partition counts (one long per partition) become cumulative
    * offsets via a window over that tiny frame, and the rank is
    * offset + local row_number. The only globally-ordered structure is
    * the counts frame — the pattern scales to any corpus size. Rank
    * correctness does not depend on where the range sampler places
    * partition boundaries, because offsets come from actual counts.
    */
  def deterministicShards(df: DataFrame, id: Column, shards: Int,
                          numPartitions: Int = 0): DataFrame = {
    require(shards > 0, s"shards must be > 0, got $shards")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // The local position within the sorted range partition is read off
    // monotonically_increasing_id — pid in the high 31 bits, a
    // partition-ordered counter in the low 33 — instead of a
    // Window.partitionBy(pid), which would re-shuffle and re-sort the
    // whole dataset just to number rows it already holds in order.
    // Valid below 2^33 rows per partition (a partition that big is
    // mis-sized long before this overflows).
    val sorted = df.withColumn("__key", hashPos(lit("shard"), id))
      .repartitionByRange(parts, col("__key"), id)
      .sortWithinPartitions(col("__key"), id)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__mid")
    // NO checkpoint anywhere on this lineage: repartitionByRange samples
    // its boundaries with an RDD-id-derived seed, so every part of the
    // final plan MUST read the one shared range exchange (Spark's
    // exchange reuse dedupes the identical subtrees). A localCheckpoint
    // here materializes counts from a FIRST instantiation while the
    // probe side re-instantiates a second with different boundaries —
    // offsets then disagree with locals (measured: duplicate and
    // overflowing rns at sf0.1).
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // one row per partition, and even that frame never sorts in one
    // task: the strict-below offsets come from the banded prefix device
    // (round-7 — a 100k-partition cluster stays distributed), the total
    // from a broadcast one-row fold
    val tot = counts.agg(sum(col("__cnt")).as("__n"))
    val offsets = graft.ops.Eval.withBelow(
        counts.select(col("__pid").as("__s"), col("__cnt").as("__n")))
      .select(col("__s").as("__pid"), col("__below").as("__off"))
      .crossJoin(broadcast(tot))
    sorted.join(broadcast(offsets), Seq("__pid"))
      .withColumn("rn", col("__off") + col("__local"))
      .withColumn("shard", expr(s"CAST((rn * $shards) DIV __n AS BIGINT)"))
      .drop("__key", "__pid", "__local", "__off", "__n")
  }

  /** Curriculum interleave: assign each document a quality tier
    * (fixed-threshold bins of `score`·`tiers`, top clamp) and a GLOBAL
    * training order in which the tiers alternate round-robin —
    * position = (rank_within_tier − 1)·tiers + tier. Positions are
    * strictly ordered but deliberately sparse (a tier that runs out
    * leaves gaps); consumers sort by position, they don't index by it.
    * The curriculum every mixed-quality training run wants — steady
    * quality mixture in every batch prefix — without any global
    * sort by score.
    *
    * Scale shape: tier assignment is a map-side expression (fixed
    * thresholds — NOT ntile, which would funnel the corpus through one
    * window partition); the per-tier rank window partitions by tier,
    * which is the q32 per-group sort bound with `tiers` groups — for
    * huge corpora swap the rank for [[deterministicShards]]' two-phase
    * partition-offset ranking per tier (same output, no per-tier task
    * sort); the oracle law is unchanged.
    *
    * Deterministic: thresholds are one IEEE multiply+floor on the same
    * score expression both engines compute; ranks tie-break on id.
    */
  def curriculumInterleave(df: DataFrame, id: Column, score: Column,
                           tiers: Int = 4): DataFrame = {
    require(tiers >= 2, s"tiers must be >= 2, got $tiers")
    val tier = least(floor(score * tiers).cast("long"), lit(tiers - 1L))
    val w = Window.partitionBy(col("tier")).orderBy(col("doc_id"))
    df.select(id.as("doc_id"), tier.as("tier"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("tier"),
        ((col("__rn") - 1L) * tiers + col("tier")).as("position"))
  }

  /** Largest-remainder (Hamilton) allocation of an integer `total` budget
    * over weighted keys: ideal share = total·w/Σw, every key gets
    * ⌊ideal⌋, and the leftover units go one each to the largest
    * fractional parts (ties on key). Σ alloc == total EXACTLY — the
    * conservation law that makes an integer sampling plan executable
    * (probabilistic rounding leaves a corpus-size-dependent deficit).
    * This is the step between mixture weights ([[temperatureMix]]) and a
    * per-source token-budget plan.
    *
    * Scale shape (round-7 rewrite): runs at KEY grain, but no stage
    * assumes that grain is small — the fractional-part rank comes from
    * [[graft.ops.Eval.withBelow]]'s banded prefix over the NEGATED
    * fraction (asc ≡ frac desc) plus a tie window PARTITIONED by the
    * fraction value ordering key asc (exact (frac desc, key asc) total
    * order; fraction ties are float-coincidence-rare outside degenerate
    * all-equal-weight inputs, and even there the window is per-value,
    * not global), and the base-sum remainder rides in as a broadcast
    * one-row frame. Determinism: Σw goes through the round-9 → DECIMAL
    * idiom (addition order cannot matter); ideal/floor/frac are then one
    * IEEE expression both engines evaluate identically.
    */
  def allocateBudget(df: DataFrame, key: Column, weight: Column,
                     total: Long): DataFrame = {
    require(total >= 0L, s"total must be >= 0, got $total")
    val w = df.select(key.as("key"), weight.cast("double").as("weight"))
    val sumW = w.agg(sum(round(col("weight"), 9).cast("decimal(28,12)"))
      .cast("double").as("__sw"))
    val ideal = lit(total.toDouble) * col("weight") / col("__sw")
    val based = w.crossJoin(broadcast(sumW))
      .select(col("key"), col("weight"), ideal.as("ideal"))
      .withColumn("__base", floor(col("ideal")).cast("long"))
      .withColumn("__frac", col("ideal") - col("__base"))
      .localCheckpoint() // read by the rem fold, the rank device, the result
    val rem = based.agg((lit(total) - sum(col("__base"))).as("__rem"))
    val perFrac = based.groupBy((-col("__frac")).as("__s"))
      .agg(count(lit(1)).as("__n"))
    val wTie = Window.partitionBy(col("__frac")).orderBy(col("key").asc)
    based
      .join(graft.ops.Eval.withBelow(perFrac)
        .select((-col("__s")).as("__frac"), col("__below")), Seq("__frac"))
      .withColumn("__rank",
        (col("__below") + row_number().over(wTie)).cast("long"))
      .crossJoin(broadcast(rem))
      .select(col("key"), col("weight"), col("ideal"),
        (col("__base") +
          when(col("__rank") <= col("__rem"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Token-budget epoch plan — the mixture-planning readout a training
    * run is configured FROM: per source, the exact token count and
    * natural share, the α=0.5 temperature weight ([[temperatureMix]]'s
    * damping over TOKEN shares rather than doc counts — a token budget
    * is what a run actually spends), the largest-remainder token
    * allocation ([[allocateBudget]] — Σ alloc ≡ budget exactly), and
    * `epochs = alloc / tokens`: >1 means the source REPEATS under the
    * mix (boosted tail), <1 it is subsampled (damped head). Returns
    * (source, n_tokens, share, mix_weight, alloc_tokens, epochs).
    *
    * Determinism: token counts are exact integers; share and the
    * epoch ratio are integer-fed IEEE divisions; √share is correctly
    * rounded by IEEE mandate; the allocation is [[allocateBudget]]'s
    * integer law. Scale shape: one map-side token count + source-grain
    * folds with broadcast one-row totals — the corpus is read once.
    */
  def epochPlan(df: DataFrame, source: Column, text: Column,
                tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0L, s"tokenBudget must be >= 0, got $tokenBudget")
    val perSource = df
      .select(source.as("source"),
        size(graft.functions.tokens(text)).cast("long").as("__nt"))
      .groupBy(col("source")).agg(sum(col("__nt")).as("n_tokens"))
      .localCheckpoint() // read by the total fold, the weights, the result
    val tot = perSource.agg(sum(col("n_tokens")).as("__tot"))
    val shared = perSource.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_tokens").cast("double") / col("__tot").cast("double"))
      .withColumn("__sm", sqrt(col("share")))
      .drop("__tot")
      .localCheckpoint() // read by the max fold and the weight projection
    val mx = shared.agg(max(col("__sm")).as("__mx"))
    val weighted = shared.crossJoin(broadcast(mx))
      .withColumn("mix_weight", col("__sm") / col("__mx"))
      .drop("__sm", "__mx")
    weighted
      .join(allocateBudget(weighted, col("source"), col("mix_weight"),
          tokenBudget)
          .select(col("key").as("source"), col("alloc").as("alloc_tokens")),
        Seq("source"))
      .select(col("source"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("mix_weight"), 6).as("mix_weight"),
        col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** Group-aware k-fold assignment: every row whose `group` matches lands
    * in the same fold, so k-fold cross-validation never leaks a group
    * (near-dup cluster, source domain, user) across a train/eval
    * boundary — [[leakageFreeSplit]]'s law generalized from one named
    * split to k interchangeable folds. Returns the input plus
    * `fold ∈ [0, k)`.
    *
    * Purely integer: fold = ⌊hash·k / 2^32⌋ over the md5 draw in
    * [0, 2^32) — exact, uniform (each fold owns an equal-width hash
    * interval up to the unavoidable ±1 granularity of 2^32/k),
    * deterministic across engines/retries/partitionings, and CONSISTENT
    * with itself as data grows: a group's fold never changes when other
    * groups arrive. Map-side only — no shuffle, no counting pass.
    */
  def groupKFold(df: DataFrame, group: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 1024, s"k must be in [2, 1024], got $k")
    df.withColumn("fold",
      shiftright(hashPos(lit("fold"), group.cast("string")) * k, 32))
  }

  /** Deterministic Poisson bootstrap: each row receives
    * `copies ~ Poisson(1)` replicas — the standard distributed bootstrap
    * resample (sampling WITH replacement without any global shuffle or
    * counting pass: at corpus scale the multinomial row-draw degenerates
    * to independent Poisson(1) counts per row). The draw inverts the
    * Poisson CDF on the row's md5 position: thresholds
    * `⌊P(X ≤ k)·2^32⌋` are Scala-computed Longs injected identically
    * into both engines ([[splitBounds]]'s device), so the copy count is
    * a pure integer compare — deterministic across engines, retries and
    * partitionings, and STABLE as the corpus grows (a row's replica
    * count never changes when other rows arrive). Tail mass beyond
    * `maxCopies` lumps into `maxCopies`. Returns the input with a
    * `copy ∈ [0, copies)` index, rows with zero copies dropped —
    * map-side explode only, E[output] = input size.
    */
  def bootstrapReplicate(df: DataFrame, id: Column,
                         maxCopies: Int = 8): DataFrame = {
    val bounds = poissonBounds(maxCopies)
    val h = hashPos(lit("boot"), id.cast("string"))
    val copies = bounds.map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0L)
      .withColumn("copy",
        explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Cumulative-Poisson(1) thresholds over [0, 2^32) for `k = 0 ..
    * maxCopies−1`, exposed so oracle generators inject the IDENTICAL
    * Longs. copies(h) = #{k : h ≥ T_k}.
    */
  private[graft] def poissonBounds(maxCopies: Int): Seq[Long] = {
    require(maxCopies >= 1 && maxCopies <= 32,
      s"maxCopies must be in [1, 32], got $maxCopies")
    val pmf = (1 until maxCopies).scanLeft(math.exp(-1.0))((p, k) => p / k)
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    cdf.map(c => math.floor(c * 4294967296.0d).toLong)
  }
}
