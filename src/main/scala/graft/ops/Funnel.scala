package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round

/** N-stage ordered funnel over an event log: for users who performed
  * stage 0 < stage 1 < ... < stage N-1 strictly in event-time order, the
  * earliest completion time of every stage (the frontier is greedy:
  * each stage's time is the minimum event time strictly after the
  * previous stage's chosen time — for "earliest full completion"
  * semantics greedy IS optimal, since taking any later stage-k time only
  * shrinks the set of valid stage-k+1 events).
  *
  * Each stage adds one type-pruned aggregation joined to the previous
  * frontier, everything keyed by the user column: N aggregations + N-1
  * equi-joins, no window over the full event stream, each stage's
  * event-type predicate pushed to its scan. The 3-stage specialization
  * is oracle-gated as q95/q97; the general form as q102 (4 stages, with
  * a generated oracle CTE chain).
  */
object Funnel {

  def funnel(events: DataFrame, user: Column, ts: Column, typ: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct: $stages")
    def tcol(i: Int) = s"t_${stages(i)}"
    val first = events.filter(typ === stages.head)
      .groupBy(user.as("user_id"))
      .agg(min(ts).as(tcol(0)))
    stages.indices.drop(1).foldLeft(first) { (frontier, i) =>
      val carried = (0 until i).map(tcol)
      events.filter(typ === stages(i))
        .select(user.as("user_id"), ts.as("__ts"))
        .join(frontier, "user_id")
        .filter(col("__ts") > col(tcol(i - 1)))
        .groupBy(col("user_id") +: carried.map(col): _*)
        .agg(min(col("__ts")).as(tcol(i)))
    }
  }

  /** Weekly cohort retention matrix: users are assigned to the cohort of
    * their first active week (Monday-truncated), and each (cohort,
    * week-offset) cell counts how many of that cohort were active again
    * `week_offset` weeks later. The classic product-analytics read over an
    * event log — the reference's BI-cube source is exactly this kind of
    * materialization, one level up.
    *
    * Scale shape: the raw stream is first collapsed to distinct
    * (user, week) pairs — one shuffle on user_id that every later step
    * reuses (the cohort-assignment aggregation and the assignment join
    * are both keyed by user_id, so they co-partition with no further
    * exchange). The final matrix aggregation shuffles only
    * |active user-weeks| rows on a key with at most |weeks|² distinct
    * values, and cohort sizes join back via broadcast (one row per
    * cohort week). Every number is integer or an exact IEEE quotient of
    * integers — no float accumulation.
    */
  def cohortRetention(events: DataFrame, user: Column,
                      ts: Column): DataFrame = {
    val weeks = events
      .select(user.as("user_id"),
        date_trunc("week", ts).cast("date").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val cells = weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / lit(7))
          .cast("long").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 4).as("retention"))
  }

  /** Market-basket co-occurrence with lift: for every unordered item pair
    * appearing together in at least `minSupport` baskets, the pair count,
    * both item supports, and the lift
    * `(n_ab · n_baskets) / (n_a · n_b)` — association strength corrected
    * for item popularity. The count products accumulate in DECIMAL(38,0)
    * (two basket-scale counts multiplied can cross 2^63); the one float
    * operation is the final division (exact, engine-identical).
    *
    * Scale shape: baskets collapse to distinct (basket, item) once; the
    * pair space is a SELF EQUI-JOIN on the basket key (co-partitioned,
    * never a cartesian), so per-task work is Σ(basket size²) bounded by
    * the largest basket — document-scale baskets need a basket-size cap
    * upstream, retail/order-scale baskets (tens of items) don't. Item
    * supports join back via broadcast only when the item universe is
    * broadcast-sized; the default is a plain shuffle join keyed by item.
    */
  def coOccurrence(df: DataFrame, basket: Column, item: Column,
                   minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    // the distinct frame feeds four consumers (both pair-join sides, the
    // supports, the basket count) — materialize it once instead of
    // re-running the distinct shuffle per consumer
    val items = df.select(basket.as("__b"), item.as("__i")).distinct()
      .localCheckpoint()
    val nBaskets = items.groupBy(col("__b")).agg(lit(1))
      .count() // one scalar action: the lift normalizer
    val supports = items.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(supports.select(col("__i").as("item_a"), col("__n").as("n_a")),
        Seq("item_a"))
      .join(supports.select(col("__i").as("item_b"), col("__n").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        ((col("n_ab").cast("decimal(19,0)") * lit(nBaskets)).cast("double") /
          (col("n_a").cast("decimal(19,0)") * col("n_b")).cast("double"))
          .as("lift"))
  }

  /** First-order transition counts over a per-user event sequence: for
    * every consecutive (previous type → type) pair, the count and the
    * row-normalized transition probability. `order` must make the
    * per-user sequence deterministic (e.g. ts then event_id).
    *
    * Scale shape: one window pass partitioned by user (per-task memory
    * bounded by the busiest single user, same bound q32's sessionization
    * already lives with), then an aggregation on the (from, to) pair —
    * a key space of |event types|², tiny by construction. The
    * probability is an exact IEEE quotient of the two integer counts.
    */
  def transitions(events: DataFrame, user: Column, typ: Column,
                  order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "transitions needs a deterministic ordering")
    val byUser = Window.partitionBy(col("__u")).orderBy(order: _*)
    val norm = Window.partitionBy(col("from_type"))
    events.select(user.as("__u") +: typ.as("__t") +: order: _*)
      .withColumn("__prev", lag(col("__t"), 1).over(byUser))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col("__t").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(norm).cast("double"), 4))
  }

  /** Top-`k` frequent item TRIPLES by basket co-occurrence — the
    * apriori level-3 step above [[coOccurrence]]'s pairs: which three
    * items travel together, the input to bundle recommendations and
    * cross-category curation. Returns (rank, item_a, item_b, item_c, n)
    * with a < b < c and the (count desc, triple asc) total order.
    *
    * Scale shape: candidate triples are generated by two basket
    * equi-joins over the DISTINCT (basket, item) frame — volume is
    * Σ C(basket_size, 3), bounded by the basket-size cube, never by the
    * item vocabulary (the frequent-itemset explosion lives in wide
    * baskets; cap or sample those upstream, exactly as the pair operator
    * documents for Σ block²). Counts are map-side-combinable; the top-k
    * is a TakeOrdered. All integers.
    */
  def frequentItemTriples(df: DataFrame, basket: Column, item: Column,
                          k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val items = df.select(basket.as("__b"), item.as("__i")).distinct()
      .localCheckpoint() // three join legs read it
    val rankW = Window.orderBy(col("n").desc, col("item_a").asc,
      col("item_b").asc, col("item_c").asc)
    items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .join(items.select(col("__b"), col("__i").as("item_c")), Seq("__b"))
      .filter(col("item_b") < col("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item_a").asc, col("item_b").asc,
        col("item_c").asc)
      .limit(k)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col("rank"), col("item_a"), col("item_b"), col("item_c"),
        col("n"))
  }

  /** RFM scoring — the classic behavioral segmentation: per user,
    * recency (days since last event, against the corpus max date),
    * frequency (event count) and monetary (exact decimal value sum),
    * each bucketed 1–5 by `ntile` so 5 = most recent / most frequent /
    * highest value, concatenated to the "545"-style segment code.
    * Returns (user, recency_days, frequency, monetary, r, f, m, rfm).
    *
    * Determinism: every quintile orders by the metric THEN the user id —
    * total order, so bucket boundaries are reproducible across engines,
    * and the fill is ntile's SQL-standard quotient-remainder rule
    * ([[graft.ops.Eval.ntileOfRank]]'s closed form over the exact rank).
    *
    * Scale shape (round-7 rewrite): NO unpartitioned window — the naive
    * three `ntile(5) OVER (ORDER BY …)` calls serialized the whole user
    * table through one executor's sort; each quintile now derives from
    * [[graft.ops.Eval.globalRank]]'s banded-prefix exact rank (value-
    * grain prefix via the percentile-grid device + user-id-banded tie
    * resolution, every window PARTITIONED — q98/q203's selection device
    * at row grain; PlanSpec pins the plan shape) and the ntile fill is
    * closed-form count arithmetic over that rank. Three user-grain rank
    * passes + three user-keyed equi-joins back onto the metric frame.
    */
  def rfmScores(events: DataFrame, user: Column, ts: Column,
                value: Column): DataFrame = {
    val perUser = events
      .select(user.as("user_id"), ts.as("__ts"),
        value.cast("decimal(18,4)").as("__v"))
      .groupBy(col("user_id"))
      .agg(max(col("__ts")).as("__last"), count(lit(1)).as("frequency"),
        sum(col("__v")).cast("double").as("monetary"))
    val corpusMax = perUser.agg(max(col("__last")).as("__cmax"))
    val tot = perUser.agg(count(lit(1)).as("__tot"))
    val metrics = perUser.crossJoin(broadcast(corpusMax))
      .select(col("user_id"),
        datediff(col("__cmax").cast("date"), col("__last").cast("date"))
          .cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
      .localCheckpoint() // read by three rank passes + the final joins
    // quintile of one metric: exact banded rank under (value asc, user
    // asc), then the closed-form ntile fill — `asc` negates for the
    // recency DESC order (exact for longs)
    def tile(valueAsc: Column, out: String): DataFrame =
      graft.ops.Eval.globalRank(
          metrics.select(col("user_id"), valueAsc.as("__m")),
          col("__m"), col("user_id"))
        .crossJoin(broadcast(tot))
        .select(col("user_id"),
          graft.ops.Eval.ntileOfRank("__rank", 5).cast("long").as(out))
    metrics
      .join(tile(-col("recency_days"), "r"), Seq("user_id"))
      .join(tile(col("frequency").cast("long"), "f"), Seq("user_id"))
      .join(tile(col("monetary"), "m"), Seq("user_id"))
      .withColumn("rfm", concat(col("r"), col("f"), col("m")))
      .select("user_id", "recency_days", "frequency", "monetary",
        "r", "f", "m", "rfm")
  }

  /** Multi-touch LINEAR attribution: each conversion's value splits
    * equally across the user's touch events in the preceding
    * `windowDays` (the standard linear model — last-touch is q41's
    * as-of join; this is its fair-share sibling), rolled up to
    * (user, touch-day) grain: which days' touches earned the credit.
    * Conversions with no in-window touch carry no credit (they surface
    * in [[survivalCurve]]/q134, not here). Returns
    * (user, day, n_touches, credit_cents).
    *
    * The split is q168's INTEGER largest-remainder allocation, not a
    * float division: the conversion's value in cents divides as
    * base = c div n to every touch, and the first c mod n touches in
    * deterministic (time, id) order take one extra cent — so
    * Σ credits ≡ the conversion's cents EXACTLY (the conservation law)
    * and the result is bit-identical in any engine. The v/n float form
    * was tried and measurably diverged: money splits land on exact
    * rounding-boundary sums, and the engines' round(double, k) and
    * double→decimal conversions disagree sub-ulp — rational-valued
    * money math belongs in integers (the q168 lesson, re-learned).
    *
    * Scale shape: one user equi-join with the range predicate inside it
    * (per-user pair volume = touches × conversions, the q42 bound), a
    * per-conversion count + rank window (partition = one conversion's
    * touches), and a (user, day) fold.
    */
  def linearAttribution(events: DataFrame, user: Column, typ: Column,
                        ts: Column, id: Column, value: Column,
                        touchType: String, convType: String,
                        windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val winUs = windowDays * 86400L * 1000000L
    val conv = events.filter(typ === convType)
      .select(user.as("__u"), id.as("__pid"),
        unix_micros(ts.cast("timestamp")).as("__pt"),
        round(value.cast("double") * 100.0d).cast("long").as("__c"))
    val touch = events.filter(typ === touchType)
      .select(user.as("__tu"), id.as("__tid"),
        unix_micros(ts.cast("timestamp")).as("__ct"))
    val perConv = Window.partitionBy(col("__pid"))
    // the extra-cent order must be TOTAL: same-microsecond touches are
    // real, so the touch id breaks the tie
    val orderW = Window.partitionBy(col("__pid"))
      .orderBy(col("__ct").asc, col("__tid").asc)
    conv.join(touch,
        col("__tu") === col("__u") &&
          col("__ct") >= col("__pt") - lit(winUs) &&
          col("__ct") < col("__pt"))
      .withColumn("__n", count(lit(1)).over(perConv))
      .withColumn("__rn", row_number().over(orderW))
      .withColumn("__credit",
        expr("__c div __n") +
          when(col("__rn") <= expr("__c % __n"), 1L).otherwise(0L))
      .groupBy(col("__u").as("user_id"),
        to_date(timestamp_micros(col("__ct"))).as("day"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("__credit")).as("credit_cents"))
  }

  /** Discrete conversion-survival curve: for each day offset 0..`horizon`
    * after a user's first `startType` event, the fraction of the cohort
    * that has NOT yet fired `convType` — the time-to-convert complement
    * of q134's summary stats, one row per day. No censoring model: the
    * fixture observes every user over the full window, so survival is
    * the plain integer ratio (cohort − converted-by-day)/cohort.
    * Returns (day, n_cohort, n_converted, survival), survival
    * monotonically non-increasing.
    *
    * Scale shape: two per-user min aggregations (type predicates pushed
    * to the scans), one per-gap-day count, and a `horizon`-row day frame
    * joined with a cumulative window — everything after the user grain
    * is day-grain. All integers until the final division.
    */
  def survivalCurve(events: DataFrame, user: Column, typ: Column,
                    ts: Column, startType: String, convType: String,
                    horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    val starts = events.filter(typ === startType)
      .groupBy(user.as("__u")).agg(min(ts).as("__t0"))
    val convs = events.filter(typ === convType)
      .select(user.as("__cu"), ts.as("__tc"))
    // the >= t0 condition lives IN the left join, not a post-filter: a
    // user whose conversions all precede t0 must stay in the cohort with
    // a null conversion, not vanish from the denominator
    val gaps = starts.join(convs,
        col("__cu") === col("__u") && col("__tc") >= col("__t0"), "left")
      .groupBy(col("__u"), col("__t0"))
      .agg(min(col("__tc")).as("__tconv"))
      .select(datediff(col("__tconv").cast("date"), col("__t0").cast("date"))
        .cast("long").as("__gap"))
    val cohort = gaps.agg(count(lit(1)).as("__n"))
    val byGap = gaps.filter(col("__gap").isNotNull)
      .groupBy(col("__gap")).agg(count(lit(1)).as("__c"))
    val days = starts.sparkSession.range(0, horizonDays + 1L)
      .toDF("day")
    // cumulative conversions by day: a gap-inequality aggregation join
    // against the horizon-row literal day frame (≤ horizon·|gaps ≤
    // horizon| pairs — both horizon-bounded), not a running-sum window;
    // integer sums, so the join's order-freedom costs nothing (round-7:
    // the former global-ORDER window was the plan's one single-task sort)
    days.join(byGap.filter(col("__gap") <= horizonDays),
        col("__gap") <= col("day"), "left")
      .groupBy(col("day"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_converted"))
      .crossJoin(broadcast(cohort))
      .select(col("day"), col("__n").as("n_cohort"), col("n_converted"),
        round((col("__n") - col("n_converted")).cast("double") /
          col("__n").cast("double"), 6).as("survival"))
      .orderBy("day")
  }

  /** Top-`k` consecutive step `n`-grams across all per-user sequences —
    * [[transitions]]' higher-order sibling: "view→click→purchase"-style
    * frequent paths, the behavioral motifs funnel DESIGN starts from
    * (transitions tell you the next step; path n-grams tell you which
    * whole corridors carry the traffic). Returns (rank, path, n) with
    * path the "a>b>c" joined string.
    *
    * Scale shape: one window pass partitioned by user (n−1 `lead`s in a
    * single Window node — per-task memory bounded by the busiest user,
    * q32's bound), counts map-side combine, the top-k is a TakeOrdered.
    * All integers; ties break on the path string.
    */
  def pathNgrams(events: DataFrame, user: Column, typ: Column,
                 order: Seq[Column], n: Int, k: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    require(order.nonEmpty, "pathNgrams needs a deterministic ordering")
    val byUser = Window.partitionBy(col("__u")).orderBy(order: _*)
    val steps = col("__t") +: (1 until n).map(i =>
      lead(col("__t"), i).over(byUser))
    val rankW = Window.orderBy(col("n").desc, col("path").asc)
    events.select(user.as("__u") +: typ.as("__t") +: order: _*)
      .withColumn("__path", concat_ws(">", steps: _*))
      // a full n-gram has exactly n-1 separators; shorter tails (lead
      // past the user's last event yields null, which concat_ws skips)
      // must not count
      .filter(length(col("__path")) - length(regexp_replace(col("__path"),
        ">", "")) === n - 1)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col("rank"), col("path"), col("n"))
  }
}
