package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph compute beyond connected components: PageRank as
  * relational joins + aggregates — the "importance over a link graph"
  * signal a corpus pipeline uses to weight crawled documents.
  *
  * Each iteration is one equi-join (ranks onto edges by source) and one
  * aggregation (contributions by destination): the same two-shuffle shape
  * per round at any scale, no driver-side state, `localCheckpoint` per
  * round to keep lineage flat (as in Dedup.connectedComponents).
  *
  * Cross-engine determinism (the oracle gate): per-edge contributions are
  * IEEE double divisions (exact), SUMMED via DECIMAL(28,18) — exact and
  * partition-order-independent — and the damping blend is the identical
  * double expression both sides. Any engine computing the same unrolled
  * iterations matches bit-for-bit (SparkEntry q101 pins 2 iterations).
  */
object Graph {

  /** Release the block-manager storage of a frame PRODUCED BY
    * `localCheckpoint()`. `Dataset.unpersist` cannot do this — a local
    * checkpoint's blocks live on the internal RDD captured in the plan's
    * root `LogicalRDD`, not in the cache manager — so convergence loops
    * that checkpoint per round would otherwise retain every superseded
    * round's blocks for the life of the session (round-7, ADVICE on
    * [[hits]]). Deliberately matches ONLY a checkpoint ROOT: collecting
    * LogicalRDD leaves deeper in the plan would release frames the
    * caller still reads (e.g. a shared `nodes` checkpoint under a
    * derived frame).
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Checkpoint `df` PRE-SHUFFLED on `key`, keeping the partitioning
    * VISIBLE to later plans: every subsequent equi-join on that key
    * reads the checkpoint blocks in place instead of re-shuffling the
    * whole frame once per round — the co-location device that turns an
    * iterative operator's per-round shuffle from edge-sized to
    * frontier-sized (round-7; the 10× probe measured q227 BFS at 34×
    * shuffle growth and q138 LPA at 19× from exactly this).
    *
    * AQE must be OFF while the checkpoint materializes: under AQE the
    * captured plan is an AdaptiveSparkPlanExec whose outputPartitioning
    * is UnknownPartitioning until finalized, so the LogicalRDD records
    * no partitioning and the co-location is silently lost (probed —
    * with the toggle, EnsureRequirements adds NO exchange on this side).
    * The toggle is scoped to this one eager action; partition count is
    * the session's shuffle-partition conf, which is also what the later
    * joins require, so the partitioning always satisfies their
    * distribution.
    *
    * SIZE-AWARE (measured, not guessed): below the session's
    * autoBroadcastJoinThreshold the frame checkpoints PLAIN — a
    * pre-partitioned LogicalRDD never becomes an AQE query stage, so
    * AQE loses its runtime-broadcast option and every round pays an
    * avoidable sort (measured: q220's CC regressed 2× at sf0.1 when
    * small core graphs were co-located); broadcast-sized frames get
    * zero-shuffle rounds from AQE anyway. At and above the threshold —
    * where AQE would shuffle the frame per round — the co-location
    * applies. The actual materialized bytes come from the checkpoint's
    * own storage info, so the decision needs no stats guesswork.
    */
  private[ops] def checkpointPartitionedBy(df: DataFrame,
                                           key: Column): DataFrame = {
    val s = df.sparkSession
    // r13: when the caller hands us a frame that IS already a checkpoint
    // root (hits() co-locates the same checkpointed edge frame twice, once
    // per direction), its materialized bytes are already known — skip the
    // redundant plain re-materialization and never release the caller's
    // blocks (they may be shared).
    val preMaterialized = storageBytes(df) != Long.MaxValue
    val plain = if (preMaterialized) df else df.localCheckpoint()
    val thresh =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        s.conf.get("spark.sql.autoBroadcastJoinThreshold", "64m"))
      catch { case scala.util.control.NonFatal(_) => -1L }
    if (thresh >= 0L && storageBytes(plain) <= thresh) plain
    else {
      val aqeKey = "spark.sql.adaptive.enabled"
      val prev = s.conf.get(aqeKey)
      s.conf.set(aqeKey, "false")
      val out =
        try plain.repartition(key).localCheckpoint()
        finally s.conf.set(aqeKey, prev)
      if (!preMaterialized)
        releaseCheckpoint(plain) // superseded by the partitioned copy
      out
    }
  }

  /** Materialized bytes of a localCheckpoint result, read from the block
    * manager (memory + disk of the captured RDD); Long.MaxValue when the
    * frame is not a checkpoint root or not tracked — callers treat
    * unknown as "large".
    */
  private def storageBytes(df: DataFrame): Long =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize).getOrElse(Long.MaxValue)
      case _ => Long.MaxValue
    }

  /** `iters` PageRank rounds over directed `edges` (duplicate edges are
    * collapsed). Returns (node, rank).
    *
    * Dangling nodes (no out-edges): by default their mass leaks — the
    * standard simplification when ranks are only relative weights. With
    * `redistributeDangling = true`, each round's dangling mass is summed
    * (DECIMAL — exact) and spread uniformly over all nodes before damping,
    * so total rank stays exactly 1 at every round (spec-pinned). The
    * per-round scalar rides in as a broadcast one-row frame, not driver
    * state.
    *
    * `tol > 0` adds a convergence stop: iteration ends early once
    * `max |rank − rank'| < tol` — so `iters` becomes a CAP instead of the
    * only control. The check is one scalar read per round off the already-
    * checkpointed frame (the same price connectedComponents pays); leave
    * `tol = 0` for oracle-gated runs that must unroll a fixed count.
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int, damping: Double = 0.85,
               redistributeDangling: Boolean = false,
               tol: Double = 0.0): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(tol >= 0.0, s"tol must be >= 0, got $tol")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val nNodes = nodes.count()
    // empty graph: no nodes to rank — return the empty (node, rank) frame
    // rather than dividing the initial mass by zero under ANSI mode
    if (nNodes == 0L) return nodes.withColumn("rank", lit(0.0d))
    val n = lit(nNodes.toDouble)
    val base = lit(1.0d - damping) / n
    val init = nodes.withColumn("rank", lit(1.0d) / n)
    val blend: (Column, Column) => Column =
      if (!redistributeDangling) (inMass, _) => base + lit(damping) * inMass
      else (inMass, dmass) =>
        base + lit(damping) * (inMass + dmass / n)
    iterate(nodes, e, outDeg, init, iters, tol,
      needDangling = redistributeDangling, blend)
  }

  /** Personalized PageRank (random walk with restart): the teleport vector
    * concentrates on `seeds` instead of spreading uniformly — "importance
    * RELATIVE TO a trusted set", the quality-propagation signal a corpus
    * pipeline uses to extend a small curated seed set over a link graph.
    * Dangling mass restarts at the seeds (the canonical RWR closure), so
    * total rank is exactly 1 every round:
    *
    * `rank'(v) = (1-d)·p(v) + d·(in_mass(v) + dangling_mass·p(v))`,
    * `p = 1/|seeds|` on seeds and 0 elsewhere; `rank0 = p`.
    *
    * Same per-round shape and determinism contract as [[pageRank]]
    * (decimal-exact sums, one join + one aggregation per round, per-round
    * lineage checkpoint, dangling scalar rides as a broadcast one-row
    * frame). Seeds outside the edge set are legal teleport targets and
    * join the node universe.
    */
  def personalizedPageRank(edges: DataFrame, src: Column, dst: Column,
                           seeds: DataFrame, seed: Column,
                           iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint()
    val sd = seeds.select(seed.as("node")).distinct().localCheckpoint()
    val nSeeds = sd.count()
    // empty seed set: the walk teleports nowhere — every rank is 0, so
    // return the empty frame rather than dividing by |seeds| (the
    // empty-delta law every operator here obeys)
    if (nSeeds == 0L) return sd.withColumn("rank", lit(0.0d))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(sd.select(col("node"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val pOf = nodes.join(sd.withColumn("__is", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__is") === 1, lit(1.0d / nSeeds))
          .otherwise(lit(0.0d)).as("__p"))
      .localCheckpoint()
    val init = pOf.select(col("node"), col("__p").as("rank"))
    iterate(pOf, e, outDeg, init, iters, tol = 0.0, needDangling = true,
      (inMass, dmass) =>
        lit(1.0d - damping) * col("__p") +
          lit(damping) * (inMass + dmass * col("__p")))
      .select(col("node"), col("rank"))
  }

  /** Weighted PageRank: [[pageRank]] where each edge carries an INTEGER
    * weight and a node's rank splits across out-edges proportionally —
    * contrib(u→v) = rank(u)·w(u,v)/Σw(u,·). The corpus-graph form where
    * link multiplicity matters (shipment volume, citation count, shared-
    * shingle count); duplicate (src, dst) edges COMBINE by summing their
    * weights, rather than collapsing as unweighted pageRank does.
    *
    * The integer-weight contract is what keeps the oracle gate exact:
    * weight sums are 64-bit-integer arithmetic (order-independent — a
    * float weight column would make Σw(u,·) partition-order-dependent),
    * and the per-edge contrib is a two-op IEEE tree on exactly-
    * represented inputs, decimal-summed per destination like the
    * unweighted rounds. Weights must be positive (a zero out-weight sum
    * would divide by zero; filter first). Same per-round shape and
    * dangling-leak simplification as [[pageRank]]'s default.
    */
  def weightedPageRank(edges: DataFrame, src: Column, dst: Column,
                       weight: Column, iters: Int,
                       damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst"),
        weight.cast("long").as("__w"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("__w")).as("__w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val outW = e.groupBy(col("src").as("node"))
      .agg(sum(col("__w")).cast("double").as("outdeg"))
    val nNodes = nodes.count()
    if (nNodes == 0L) return nodes.withColumn("rank", lit(0.0d))
    val n = lit(nNodes.toDouble)
    val base = lit(1.0d - damping) / n
    val init = nodes.withColumn("rank", lit(1.0d) / n)
    iterate(nodes, e, outW, init, iters, tol = 0.0, needDangling = false,
      (inMass, _) => base + lit(damping) * inMass, weighted = true)
  }

  /** Synchronous label propagation (community detection): every node
    * starts in its own community (label = its own id) and each round
    * adopts the most frequent label among its in-neighbors — ties broken
    * by the smallest label, nodes with no in-edges keep their label. The
    * deterministic tie-break makes the fixed-iteration unrolling
    * bit-reproducible in any engine (integer counts + min — no floats at
    * all), which is what the oracle gate needs; classic async LPA is
    * order-dependent by construction and cannot be differentially tested.
    *
    * Scale shape per round — exactly CC/PageRank's two-shuffle recipe:
    * one equi-join (labels onto edges by source), one (dst, label) count
    * aggregation, one per-node argmax window (partition sizes bounded by
    * a node's distinct in-labels ≤ in-degree), then a lineage
    * checkpoint. Driver state is nil beyond the per-round scalar reads.
    *
    * `stopOnFixpoint = false` (default) unrolls exactly `iters` rounds —
    * what the oracle gate differentially tests. With
    * `stopOnFixpoint = true`, `iters` becomes a CAP (mirroring
    * [[pageRank]]'s `tol` mechanics): iteration ends the first round no
    * label changes — LPA's natural fixpoint, after which every further
    * round is the identity. Synchronous LPA can also OSCILLATE instead of
    * converging (the classic period-2 flip on bipartite-like structure:
    * each side adopts the other's label forever); that state would never
    * hit the fixpoint and a fixed-round run would silently return
    * whichever phase round `iters` lands on, so the stop-enabled path
    * DETECTS it — labels equal to the state two rounds back but not to
    * the last round — and throws instead of returning an arbitrary
    * phase. Longer cycles (period ≥ 3) can't be caught by that one-step
    * lookback, so the stop-enabled path ALSO throws if the iteration cap
    * is exhausted without reaching a fixpoint: with the stop enabled the
    * operator either returns a true fixpoint or throws, never an
    * arbitrary phase (raise `iters` if the graph is genuinely
    * slow-converging). Both checks are one count read per round off the
    * already-checkpointed frame (the price pageRank's `tol` pays).
    */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
                       iters: Int,
                       stopOnFixpoint: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // pre-shuffled on the per-round vote-join key (the r7 co-location
    // device): each round shuffles labels and votes, never the edges
    val e = checkpointPartitionedBy(
      edges.select(src.as("src"), dst.as("dst")).distinct(), col("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    var prev2: DataFrame = null
    def nDiffering(a: DataFrame, b: DataFrame): Long =
      a.join(b.select(col("node"), col("label").as("__cmp")), Seq("node"))
        .filter(col("label") =!= col("__cmp")).count()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // r14: the per-dst argmax is a MIN over (−count, label) structs —
      // lexicographic struct ordering reproduces (count DESC, label ASC)
      // exactly on the unique (dst,label) count rows, and min is a
      // DeclarativeAggregate with map-side partials, so the second
      // aggregation replaces the old row_number window's full sort of
      // every vote row (guide §1.2 step 2; counts ≥ 1 so −count cannot
      // overflow). Same winner per dst, bit-for-bit.
      val votes = labels.join(e, col("node") === col("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
          .as("__b"))
        .select(col("dst").as("node"), col("__b").getField("l").as("__new"))
      val next = labels.join(votes, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint()
      if (stopOnFixpoint) {
        if (nDiffering(next, labels) == 0L) converged = true
        else if (prev2 != null && nDiffering(next, prev2) == 0L)
          throw new IllegalStateException(
            s"labelPropagation: period-2 oscillation detected at round ${it + 1} " +
              "(labels returned to the state two rounds back without reaching " +
              "a fixpoint); synchronous LPA cannot converge on this graph — " +
              "break the symmetry (e.g. add self-loops) or use the fixed-" +
              "iteration mode deliberately")
      }
      prev2 = labels
      labels = next
      it += 1
    }
    if (stopOnFixpoint && it == iters && !converged && iters > 0)
      throw new IllegalStateException(
        s"labelPropagation: no fixpoint within the $iters-round cap " +
          "(slow convergence or a period>=3 oscillation the two-round " +
          "lookback cannot distinguish); raise iters or use the fixed-" +
          "iteration mode deliberately")
    labels
  }

  /** The shared iteration core both public entry points drive: per round,
    * one contrib join (ranks onto edges by source, divided by out-degree),
    * one DECIMAL-exact aggregation by destination, an optional
    * DECIMAL-exact dangling-mass scalar (broadcast one-row frame), the
    * caller's blend expression, and a lineage checkpoint; `tol > 0` adds
    * the convergence stop. The numeric/determinism contract lives here
    * ONCE — callers only choose the teleport/blend formula, which must
    * mirror their oracle's expression tree exactly.
    */
  private def iterate(nodes: DataFrame, e: DataFrame, outDeg: DataFrame,
                      init: DataFrame, iters: Int, tol: Double,
                      needDangling: Boolean,
                      blend: (Column, Column) => Column,
                      weighted: Boolean = false): DataFrame = {
    var ranks = init
    var it = 0
    var converged = false
    // out-degrees never change across rounds but feed two joins per round
    // (contrib + dangling anti) — materialize the aggregation once instead
    // of re-shuffling the edge frame for it every use
    val od = if (iters > 0) outDeg.localCheckpoint() else outDeg
    // the edge frame feeds the contrib join on src EVERY round —
    // pre-shuffle it once (r7 co-location device) so rounds shuffle only
    // the rank frame and the per-dst aggregation. r13: the out-degree
    // rides ON the edge row (attached once, here), so each round is ONE
    // equi-join instead of ranks⋈od⋈edges — the od side never changes,
    // re-joining it every round was a per-round broadcast+join for a
    // value computable at setup (guide §2.4). The per-edge arithmetic
    // tree is unchanged (rank·w/outdeg on the same doubles), so ranks
    // are bit-identical.
    val ep =
      if (iters > 0)
        checkpointPartitionedBy(
          e.join(od, col("src") === col("node")).drop("node"), col("src"))
      else e
    // weighted: e carries integer edge weight __w and outdeg holds the
    // integer out-weight sum — contrib is (rank·w)/outw, the identical
    // two-op IEEE tree the oracle unrolls
    val contribOf: Column =
      if (weighted) (col("rank") * col("__w")) / col("outdeg")
      else col("rank") / col("outdeg")
    while (it < iters && !converged) {
      val contrib = ranks
        .join(ep, col("node") === col("src"))
        .select(col("dst"), contribOf.as("c"))
      val summed = contrib.groupBy(col("dst").as("node"))
        .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("in_mass"))
      val inMass = coalesce(col("in_mass"), lit(0.0d))
      val joined = nodes.join(summed, Seq("node"), "left")
      val next =
        if (!needDangling)
          joined.select(col("node"), blend(inMass, lit(0.0d)).as("rank"))
        else {
          // dangling mass, summed exactly; one row, broadcast back in
          val dangling = ranks.join(od, Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank").cast("decimal(28,18)")),
              lit(0).cast("decimal(28,18)")).cast("double").as("__dmass"))
          joined.crossJoin(broadcast(dangling))
            .select(col("node"), blend(inMass, col("__dmass")).as("rank"))
        }
      val checkpointed = next.localCheckpoint()
      if (tol > 0.0) {
        val delta = checkpointed
          .join(ranks.select(col("node"), col("rank").as("__prev")), Seq("node"))
          .agg(max(abs(col("rank") - col("__prev"))).as("d"))
          .first().getDouble(0)
        converged = delta < tol
      }
      ranks = checkpointed
      it += 1
    }
    ranks
  }

  /** k-core of the UNDIRECTED view of `edges` (direction, duplicates and
    * self-loops collapsed): the maximal subgraph where every node keeps
    * degree ≥ k, computed by the standard peel — drop nodes under degree
    * k, recompute degrees, repeat to fixpoint. The densest-cohesion
    * readout a corpus graph has: the k-core of a kNN graph is the set of
    * documents whose semantic neighborhoods are MUTUALLY dense (candidate
    * over-represented clusters), while peeled nodes are periphery.
    * Returns (node, core_degree) — degree measured INSIDE the core.
    *
    * Scale shape per round: two equi-joins (edges onto the live-node set
    * by each endpoint) + one degree aggregation + a lineage checkpoint —
    * CC/PageRank's recipe, no driver state beyond the per-round count.
    * Rounds are data-bounded, not log-bounded (a path graph peels one
    * node per round in the worst case), so `maxRounds` is a hard cap and
    * exhausting it THROWS rather than returning a half-peeled subgraph —
    * the non-convergence contract connectedComponents pins. Convergence
    * is count equality: the live set only shrinks, so |next| = |live| ⟺
    * next = live, one cheap scalar per round.
    *
    * Determinism: degrees are integer counts and the peel order is
    * irrelevant to the fixpoint (k-core is unique — peeling is
    * confluent), so any engine unrolling ≥ the convergence round count
    * matches exactly; rounds past the fixpoint are the identity, which
    * is what lets a fixed-unroll oracle gate the early-stopping engine.
    */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
            maxRounds: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // r14: co-locate the undirected edge frame on `a` (the r7 device):
    // the live-node set is a stats-less checkpoint root, so the per-round
    // `a`-join planned as a full shuffle of the EDGE frame every round
    // (QProf: 42 shuffle-write-bound stages, 178 MB shuffled per bench
    // run). Pre-shuffled once, rounds shuffle only the live set and the
    // b-join's surviving edges (guide §2.4). Built in ONE pass: the
    // repartition(a) runs BEFORE the distinct — HashPartitioning(a)
    // satisfies the (a,b) dedup's clustered distribution, so the
    // distinct adds no second exchange and exactly one copy of the edge
    // frame is ever materialized (a checkpoint-then-repartition-then-
    // checkpoint would transiently hold TWO copies: it OOMed the 8 GB
    // spill probe at 100×). AQE must be off while the checkpoint
    // materializes or the captured partitioning is lost (the
    // checkpointPartitionedBy contract).
    val s = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = s.conf.get(aqeKey)
    s.conf.set(aqeKey, "false")
    val und =
      try edges
        .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
        .filter(col("a") =!= col("b"))
        .repartition(col("a"))
        .distinct()
        .localCheckpoint() // re-joined every peel round: scan once
      finally s.conf.set(aqeKey, prevAqe)
    def degreesAmong(live: DataFrame): DataFrame = {
      val e = und
        .join(live.select(col("node").as("a")), Seq("a"))
        .join(live.select(col("node").as("b")), Seq("b"))
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_degree"))
    }
    var live = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
      .localCheckpoint()
    var n = live.count()
    var it = 0
    var converged = n == 0L
    while (it < maxRounds && !converged) {
      val next = degreesAmong(live)
        .filter(col("core_degree") >= k).select(col("node"))
        .localCheckpoint()
      val m = next.count()
      converged = m == n || m == 0L
      live = next
      n = m
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore: still peeling after $maxRounds rounds (live=$n); " +
          "raise maxRounds — returning a half-peeled subgraph would be " +
          "silently wrong")
    // fixpoint: degrees within the surviving set ARE the core degrees
    degreesAmong(live)
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * UNDIRECTED view of `edges` (direction and duplicates are collapsed;
    * self-loops dropped). Returns (node, degree, n_triangles, clustering)
    * where clustering = 2T / (deg·(deg−1)), 0.0 for degree-1 nodes —
    * the corpus-graph cohesion readout (how clique-ish are the semantic
    * neighborhoods a kNN graph induces).
    *
    * Scale shape — the degree-ordered wedge join ("node-iterator++"):
    * each edge is oriented from its lower (degree, id) endpoint to the
    * higher, which bounds every node's OUT-degree by O(√m) on any graph,
    * so the wedge self-join (out-neighbors × out-neighbors per node)
    * never explodes on hubs — the unordered variant is quadratic in the
    * max degree, this one in the √m-bounded orientation out-degree. Three
    * shuffles total (degree agg, wedge join, closing edge join), all on
    * (node) or (pair) keys, broadcast-free, skew-tolerant under AQE. The
    * orientation changes WHICH joins run, not the answer: the triangle
    * set is orientation-invariant, so an oracle using plain id-order
    * (a<b<c) joins must agree exactly.
    *
    * Counts are exact integers — bit-identical across engines by
    * construction; clustering is one double division rounded by the
    * caller.
    */
  def triangleCounts(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // consumed by 3 joins + degrees: scan once
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("__db")), "b")
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("a") < col("b"))
    // oriented edge u→v with v's (deg, id) carried for the wedge order
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dv"))
      .localCheckpoint() // wedge join reads it twice, closing join once
    val x = oriented.select(col("u"), col("v").as("__v"),
      col("__dv").as("__dvv"))
    val y = oriented.select(col("u"), col("v").as("__w"),
      col("__dv").as("__dw"))
    val wedges = x.join(y, Seq("u"))
      .filter(col("__dvv") < col("__dw") ||
        (col("__dvv") === col("__dw") && col("__v") < col("__w")))
      .select(col("u"), col("__v"), col("__w"))
    val tri = wedges.join(
      oriented.select(col("u").as("__v"), col("v").as("__w")),
      Seq("__v", "__w"))
    val perNode = tri
      .select(explode(array(col("u"), col("__v"), col("__w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
            lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
              (col("degree").cast("double") * (col("degree") - lit(1)).cast("double")))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Exact 2-hop reach per node over the UNDIRECTED view of `edges`:
    * n1 = direct neighbors, n2 = nodes at distance exactly 2 (reachable
    * through a neighbor, not a neighbor themselves, not self) — the
    * bounded-radius closeness readout ("how much of the graph does a
    * node see in two steps") that full closeness centrality needs a
    * whole BFS per node for. Returns (node, n1, n2, reach_x2) with
    * reach_x2 = 2·n1 + n2 — the harmonic-closeness-within-2 numerator
    * kept as an INTEGER (distance-1 nodes weigh 1, distance-2 nodes ½,
    * everything ×2) so the gate needs no floats at all.
    *
    * Scale shape: the wedge join's pair volume is Σ deg(mid)² — the
    * same hub-sensitive bound triangleCounts documents, tamed there by
    * orientation; here the 2-hop SET is the answer so orientation can't
    * help, and the operator is honest about it: run it on bounded-degree
    * graphs (kNN graphs by construction) or cap degrees upstream. Three
    * shuffles: symmetrize+distinct, wedge join, anti-join + fold.
    */
  def twoHopReach(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val sym = und.select(col("a").as("x"), col("b").as("y"))
      .unionAll(und.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint() // wedge legs + 1-hop exclusion all read it
    val deg = sym.groupBy(col("x").as("node")).agg(count(lit(1)).as("n1"))
    val twoHop = sym.select(col("x").as("a0"), col("y").as("m"))
      .join(sym.select(col("x").as("m"), col("y").as("b0")), Seq("m"))
      .filter(col("a0") =!= col("b0"))
      .select(col("a0"), col("b0")).distinct()
      .join(sym.select(col("x").as("a0"), col("y").as("b0")),
        Seq("a0", "b0"), "left_anti")
    val n2 = twoHop.groupBy(col("a0").as("node"))
      .agg(count(lit(1)).as("n2"))
    deg.join(n2, Seq("node"), "left")
      .select(col("node"), col("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        (lit(2L) * col("n1") + coalesce(col("n2"), lit(0L))).as("reach_x2"))
  }

  /** Degree assortativity of the UNDIRECTED view of `edges`: the Pearson
    * correlation between the degrees at the two ends of every edge (both
    * orientations counted, the standard symmetric formulation). Positive =
    * hubs attach to hubs (a social-graph signature); negative = hubs glue
    * low-degree periphery together (typical of kNN graphs with hub
    * vectors). Returns one row (n_edges = directed count 2m,
    * assortativity).
    *
    * Scale shape: two shuffles (degree agg, degree-onto-edge joins) and a
    * scalar fold. Determinism: degrees are integers, so all five moment
    * sums are DECIMAL(38,0)-exact and cast to double losslessly (they sit
    * far under 2^53 at any feasible edge count); the final expression is
    * one IEEE tree both engines evaluate identically — the q99 moment-
    * correlation idiom with the decimal-noise concerns removed.
    */
  def degreeAssortativity(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // degree agg + two orientation scans
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val sym = und.select(col("a").as("__x"), col("b").as("__y"))
      .unionAll(und.select(col("b").as("__x"), col("a").as("__y")))
    val d = sym
      .join(deg.select(col("node").as("__x"), col("degree").as("__dx")), "__x")
      .join(deg.select(col("node").as("__y"), col("degree").as("__dy")), "__y")
    val n = count(lit(1)).cast("double")
    def s(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    d.agg(count(lit(1)).as("n_edges"),
        n.as("__n"),
        s(col("__dx")).as("__sx"), s(col("__dy")).as("__sy"),
        s(col("__dx") * col("__dx")).as("__sxx"),
        s(col("__dy") * col("__dy")).as("__syy"),
        s(col("__dx") * col("__dy")).as("__sxy"))
      .select(col("n_edges"),
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
            (col("__n") * col("__syy") - col("__sy") * col("__sy"))))
          .as("assortativity"))
  }

  /** HITS (hubs & authorities), max-normalized: per round,
    * `auth_raw(v) = Σ_{u→v} hub(u)`, `auth = auth_raw / max(auth_raw)`,
    * then `hub_raw(u) = Σ_{u→v} auth(v)`, `hub = hub_raw / max(hub_raw)`;
    * `hub₀ = 1`. Max-normalization (Kleinberg's convergence argument
    * works for any norm) keeps the gate path sqrt-free: `max` over
    * doubles is order-independent, and the per-node divide is one IEEE
    * op — where an L2 norm would put an engine-ordered Σx² under a sqrt.
    * On a directed link/citation graph hubs are the curators (pages that
    * point at good content) and authorities the content — the two-sided
    * importance signal PageRank's single score conflates. Returns
    * (node, hub, auth); sink nodes keep hub 0, source nodes auth 0.
    *
    * Per-round shape: two equi-joins + two aggregations (one per
    * direction) + two one-row max frames broadcast back — PageRank's
    * recipe doubled, `localCheckpoint` per round to keep lineage flat.
    * Determinism: mass sums ride the DECIMAL(28,18)-exact idiom; the
    * normalize is `coalesce(mass, 0) / max` — identical IEEE trees both
    * engines, so a fixed-unroll oracle matches bit-for-bit.
    */
  def hits(edges: DataFrame, src: Column, dst: Column,
           iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint()
    // empty graph: nothing to rank — return the empty (node, hub, auth)
    // frame rather than dividing by a zero max (the empty-delta law
    // every operator here obeys; EmptyInputSpec enforces it)
    if (e.limit(1).count() == 0)
      return e.select(col("src").as("node"))
        .withColumn("hub", lit(0.0d)).withColumn("auth", lit(0.0d))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // the two halves join the edge frame on OPPOSITE keys every round —
    // one pre-shuffled copy per key (r7 co-location device): rounds
    // shuffle score frames only, never the edges
    val eBy = Map(
      "src" -> checkpointPartitionedBy(e, col("src")),
      "dst" -> checkpointPartitionedBy(e, col("dst")))
    // r14: normalization is LAZY — each round materializes only the raw
    // mass frame (node, __m); the divide-by-max happens per row inside
    // the NEXT round's contribution join (or the final readout) instead
    // of writing a second normalized checkpoint per half. The per-row
    // division is the identical IEEE expression on the identical doubles,
    // and a zero-mass node (absent from raw, present as an explicit 0.0
    // in the old normalized frame) contributes exactly 0 to every
    // decimal sum — so the masses, maxes and final scores are
    // bit-identical while per-round materializations drop 4 → 2 and the
    // per-round nodes-join disappears (guide §1.2 step 1).
    def normalized(raw: DataFrame): DataFrame =
      raw.crossJoin(broadcast(raw.agg(max(col("__m")).as("__mx"))))
        .select(col("node"), (col("__m") / col("__mx")).as("__v"))
    // checkpoint the mass frame: BOTH the max and the normalize read it,
    // and without the cut the max recomputes the whole join+agg — the
    // one super-linear wall term the 10× scale-up measured (14× → ~8×)
    def rawHalf(scores: DataFrame, joinSide: String,
                groupSide: String): DataFrame =
      scores.join(eBy(joinSide), col("node") === col(joinSide))
        .groupBy(col(groupSide).as("node"))
        .agg(sum(col("__v").cast("decimal(28,18)")).cast("double").as("__m"))
        .localCheckpoint()
    var hubRaw: DataFrame = null
    var authRaw: DataFrame = null
    var it = 0
    while (it < iters) {
      val hubScores =
        if (hubRaw == null) nodes.withColumn("__v", lit(1.0d))
        else normalized(hubRaw)
      val nextAuth = rawHalf(hubScores, "src", "dst")
      val nextHub = rawHalf(normalized(nextAuth), "dst", "src")
      // both new halves are materialized; the superseded round's frames
      // are never read again (the final readout uses only the LAST pair)
      // — releasing keeps retained storage flat at ~2 frames however
      // many iterations run. NEVER release the frames just produced: a
      // localCheckpoint's blocks are its ONLY copy (lineage truncated).
      if (authRaw != null) releaseCheckpoint(authRaw)
      if (hubRaw != null) releaseCheckpoint(hubRaw)
      authRaw = nextAuth
      hubRaw = nextHub
      it += 1
    }
    // readout: normalize each half over ALL nodes (zero-mass nodes get
    // the explicit 0.0 the old per-round normalized frames carried)
    def readout(raw: DataFrame, as: String): DataFrame =
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(raw.agg(max(col("__m")).as("__mx"))))
        .select(col("node"),
          (coalesce(col("__m"), lit(0.0d)) / col("__mx")).as(as))
    readout(hubRaw, "hub").join(readout(authRaw, "auth"), Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
  }

  /** Multi-source BFS: hop distance from the nearest seed, following
    * directed edges, capped at `maxDepth` — the crawl-depth / curation-
    * distance signal ("how many links from the trusted set is this
    * document"). Returns (node, dist) for every node within reach;
    * unreached nodes are absent (join with the universe and
    * coalesce(dist, ∞-sentinel) downstream if needed).
    *
    * Per round: one equi-join (frontier onto edges) + one left-anti
    * against the visited set + a lineage checkpoint — CC's recipe with
    * sets instead of labels. Rounds stop early when a frontier empties
    * (one cheap scalar per round, like kCore's convergence count).
    * All-integer and confluent (BFS layers ARE min distances, whatever
    * the discovery order), so a fixed-unroll recursive oracle matches
    * exactly; a `maxDepth` large enough to exhaust the graph makes the
    * early stop unobservable, which is what lets the capped oracle gate
    * the early-stopping engine.
    */
  def bfsDistances(edges: DataFrame, src: Column, dst: Column,
                   seeds: DataFrame, seed: Column,
                   maxDepth: Int): DataFrame = {
    require(maxDepth >= 0 && maxDepth <= 64,
      s"maxDepth must be in [0, 64], got $maxDepth")
    // pre-shuffled on the per-hop join key: each hop shuffles only the
    // frontier, never the edge frame (the r7 co-location device)
    val e = checkpointPartitionedBy(
      edges.select(src.as("src"), dst.as("dst")).distinct(), col("src"))
    var visited = seeds.select(seed.as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && frontier.limit(1).count() > 0) {
      depth += 1
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .localCheckpoint()
      // r14: `visited` stays a LAZY union of the per-hop checkpoint
      // roots — each hop already materialized exactly once as `next`,
      // so re-materializing the whole accumulated set every round was
      // an O(V) write per hop for rows that already sit in block
      // storage (guide §5). The anti-join reads the same rows either
      // way; hop counts are bounded by maxDepth ≤ 64, so the union
      // plan stays shallow.
      visited = visited.unionByName(next)
      frontier = next
    }
    visited
  }
}
