package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, Similarity}

/** Deterministic sampling + iterative k-means: the properties that make
  * them safe at scale — reproducibility under re-execution, nesting across
  * fractions, per-stratum rate, and loop-step consistency.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("stratifiedSample is deterministic and hits the rate per stratum") {
    val s1 = Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "same inputs must draw the same sample")
    // per-stratum rate: each language sampled near 25% (binomial tolerance)
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.25)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      val rate = sampled.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(rate - 0.25) < 0.12, s"$lang rate $rate off 0.25")
    }
  }

  test("stratifiedSample nests: smaller fractions are subsets of larger") {
    val small = Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val large = Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large),
      "growing the fraction must only ADD rows, never swap them")
    assert(Sampling.stratifiedSample(docs, $"lang", $"doc_id", 0.0).count() === 0)
    assert(Sampling.stratifiedSample(docs, $"lang", $"doc_id", 1.0).count()
      === docs.count())
  }

  test("capPerStratum caps hot strata, passes small ones, deterministically") {
    val capped = Sampling.capPerStratum(docs, $"source", $"doc_id", 10)
    val bySource = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // every source has 25 docs at sf0.01 — all must be cut to exactly 10
    assert(bySource.values.toSet === Set(10L))
    val again = Sampling.capPerStratum(docs, $"source", $"doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(capped.select("doc_id").as[Long].collect().toSet === again)
    // strata already under the cap pass through untouched
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "src")
    assert(Sampling.capPerStratum(tiny, $"src", $"doc_id", 10).count() === 3)
  }

  test("capPerStratum: mega-stratum matches the single-window cap, salted plan") {
    import org.apache.spark.sql.expressions.Window
    // one hot stratum (5000 rows, 500x the cap) + one under the cap
    val mega = spark.range(5000)
      .select(($"id" + 100L).as("doc_id"), lit("hot").as("src"))
      .union(spark.range(5).select($"id".as("doc_id"), lit("cold").as("src")))
    val capped = Sampling.capPerStratum(mega, $"src", $"doc_id", 7)
    // reference: the plain single-window cap, hash replicated from hashPos
    def enc(c: org.apache.spark.sql.Column) = {
      val s = c.cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(lit("v"), length(s).cast("string"), lit(":"), s))
    }
    val pos = conv(substring(md5(concat(
      enc($"src"), lit("|"), enc($"doc_id"))), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy($"src").orderBy(pos.asc, $"doc_id".asc)
    val expected = mega.withColumn("__r", row_number().over(w))
      .filter($"__r" <= 7).drop("__r")
      .as[(Long, String)].collect().toSet
    assert(capped.as[(Long, String)].collect().toSet === expected,
      "two-phase salted cap must equal the exact single-window cap")
    // plan pin: phase 1 ranks inside (stratum, salt) buckets, so no task
    // ever sorts the full mega-stratum
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      "cap must rank bucket-locally over (stratum, __salt) first")
  }

  test("hashPos encoding is injective: null/sentinel and separator collisions") {
    // pre-fix, stratum NULL and the literal string "__null__" drew the SAME
    // sample; an injective encoding must draw independent ones
    val ids = spark.range(1000).select($"id".as("doc_id"))
    val asNull = ids.withColumn("s", lit(null).cast("string"))
    val asSentinel = ids.withColumn("s", lit("__null__"))
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratifiedSample(df, $"s", $"doc_id", 0.5)
        .select("doc_id").as[Long].collect().toSet
    assert(kept(asNull) !== kept(asSentinel),
      "NULL stratum must not hash like the string '__null__'")
    // ("a|", "b") vs ("a", "|b"): same concatenation pre-fix; length
    // prefixes must separate them
    val p1 = ids.withColumn("s", lit("a|")).withColumn("doc_id",
      concat(lit("b"), $"doc_id".cast("string")))
    val p2 = ids.withColumn("s", lit("a")).withColumn("doc_id",
      concat(lit("|b"), $"doc_id".cast("string")))
    def keptS(df: org.apache.spark.sql.DataFrame): Set[String] =
      Sampling.stratifiedSample(df, $"s", $"doc_id", 0.5)
        .select("doc_id").as[String].collect().toSet
    assert(keptS(p1) !== keptS(p2),
      "values containing the separator must not alias other (stratum,id) pairs")
    // null id rows still pass the identity law
    val nullId = spark.range(3).select(lit(null).cast("string").as("doc_id"),
      lit("x").as("s"))
    assert(Sampling.stratifiedSample(nullId, $"s", $"doc_id", 1.0).count() === 3)
  }

  test("keepTopQuantile keeps ~(1-q) per stratum and never beats the best row") {
    val scored = docs.select($"doc_id", $"lang",
      round(graft.ops.TextAnalysis.qualityScore($"text"), 4).as("quality"))
    val kept = Sampling.keepTopQuantile(scored, $"lang", $"quality", 0.25)
    val totals = scored.groupBy("lang").count().as[(String, Long)].collect().toMap
    val keptBy = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      val rate = keptBy.getOrElse(lang, 0L).toDouble / n
      // >= because ties AT the quantile are kept; quantized scores tie often
      assert(rate >= 0.70 && rate <= 0.90, s"$lang kept rate $rate off ~0.75")
    }
    // the best-scored row of every stratum always survives
    val best = scored.groupBy("lang").agg(max($"quality").as("q"))
      .as[(String, Double)].collect().toMap
    val keptBest = kept.groupBy("lang").agg(max($"quality").as("q"))
      .as[(String, Double)].collect().toMap
    assert(best === keptBest)
  }

  test("deterministicShards: balanced permutation, stable across partitioning") {
    val ids = docs.select("doc_id")
    val sh = Sampling.deterministicShards(ids, $"doc_id", shards = 8)
    val n = ids.count()
    // rn is a permutation of [0, n)
    assert(sh.select("rn").as[Long].collect().toSet === (0L until n).toSet)
    // shard sizes within one row of each other
    val sizes = sh.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet === (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1,
      s"shard sizes must be near-equal, got $sizes")
    // the rank does not depend on how many range partitions computed it
    val few = Sampling.deterministicShards(ids, $"doc_id", 8, numPartitions = 2)
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val many = Sampling.deterministicShards(ids, $"doc_id", 8, numPartitions = 17)
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    assert(few === many,
      "global rank must be a pure function of the data, not the partitioning")
  }

  test("weightedMix: integer weights are exact, fractional rate holds, drop drops") {
    // weight 1.0 is the identity (one copy of every row, no hash involved)
    val one = Sampling.weightedMix(docs, $"lang", $"doc_id", lit(1.0d))
    assert(one.count() === docs.count())
    assert(one.select(max($"copy")).head().getLong(0) === 0L)
    // weight 2.0 duplicates exactly
    assert(Sampling.weightedMix(docs, $"lang", $"doc_id", lit(2.0d)).count()
      === 2 * docs.count())
    // weight 0 drops everything
    assert(Sampling.weightedMix(docs, $"lang", $"doc_id", lit(0.0d)).count() === 0)
    // fractional part lands near the rate, and the draw is deterministic
    val a = Sampling.weightedMix(docs, $"lang", $"doc_id", lit(1.5d))
    val rate = (a.count() - docs.count()).toDouble / docs.count()
    assert(math.abs(rate - 0.5) < 0.1, s"extra-copy rate $rate off 0.5")
    val b = Sampling.weightedMix(docs, $"lang", $"doc_id", lit(1.5d))
    assert(a.select("doc_id", "copy").as[(Long, Long)].collect().sorted.toSeq
      === b.select("doc_id", "copy").as[(Long, Long)].collect().sorted.toSeq)
  }

  test("negativeSamples: k per anchor, label-disjoint, partition-invariant") {
    val cands = (1L to 500L).map(i => (i, (i % 7).toInt)).toDF("id", "lab")
    val anchors = (1L to 4L).map(i => (i, (i % 7).toInt)).toDF("id", "lab")
    def draw(c: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSamples(c, col("id"), col("lab"),
        anchors, col("id"), col("lab"), k = 5)
        .as[(Long, Long, Long)].collect().toSet
    val s = draw(cands)
    assert(s.size === 20) // 4 anchors x 5 negatives
    val labOf = (1L to 500L).map(i => i -> (i % 7)).toMap
    s.foreach { case (q, item, _) =>
      assert(labOf(item) !== labOf(q), s"same-label negative $item for $q")
    }
    // deterministic: the draw is a pure function of the id pair, so
    // repartitioning the candidate side cannot change it
    assert(draw(cands.repartition(13)) === s)
  }

  test("negativeSamples draws uniformly: label mix tracks the candidate pool") {
    // 1000 anchors of label 0 draw 5 negatives each from candidates
    // labeled 1/2/3 in 60/30/10 proportions; the 5000 draws' label mix
    // must track the pool (md5 positions are uniform, so each draw is a
    // uniform pick without replacement among the anchor's candidates)
    val cands = (1L to 1000L).map { i =>
      val lab = if (i <= 600) 1 else if (i <= 900) 2 else 3
      (i, lab)
    }.toDF("id", "lab")
    val anchors = (10001L to 11000L).map(i => (i, 0)).toDF("id", "lab")
    val drawn = Sampling.negativeSamples(cands, col("id"), col("lab"),
      anchors, col("id"), col("lab"), k = 5)
      .join(cands.select(col("id").as("item_id"), col("lab")), "item_id")
      .groupBy("lab").count().as[(Int, Long)].collect().toMap
    assert(drawn.values.sum === 5000L)
    assert(math.abs(drawn(1) / 5000.0 - 0.6) < 0.05, s"label 1: ${drawn(1)}")
    assert(math.abs(drawn(2) / 5000.0 - 0.3) < 0.05, s"label 2: ${drawn(2)}")
    assert(math.abs(drawn(3) / 5000.0 - 0.1) < 0.05, s"label 3: ${drawn(3)}")
  }

  test("kmeansIterations(1) matches the single-step composition") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val seeds = Similarity.minIdSeeds(
      e, col("vec_id"), col("embedding"), col("label"))
    val (assigned1, perDim1) = Similarity.kmeansIterations(
      e, col("vec_id"), col("embedding"), seeds, col("cell"), col("cvec"), 1)
    val direct = Similarity.recomputeCentroids(Similarity.assignToCentroids(
      e, col("vec_id"), col("embedding"), seeds, col("cell"), col("cvec")))
    val a = perDim1.orderBy("cell", "pos")
      .as[(String, Int, Double)].collect().toSeq
    val b = direct.orderBy("cell", "pos")
      .as[(String, Int, Double)].collect().toSeq
    assert(a === b)
    assert(assigned1.count() === e.count())
  }

  test("second k-means iteration actually moves assignments on real data") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val seeds = Similarity.minIdSeeds(
      e, col("vec_id"), col("embedding"), col("label"))
    def members(iters: Int): Map[String, Long] = {
      val (assigned, _) = Similarity.kmeansIterations(
        e, col("vec_id"), col("embedding"), seeds, col("cell"), col("cvec"), iters)
      assigned.groupBy("cell").count().as[(String, Long)].collect().toMap
    }
    val m1 = members(1)
    val m2 = members(2)
    assert(m1.values.sum === m2.values.sum, "every vector stays assigned")
    assert(m1 !== m2,
      "recomputed centroids should reassign at least one vector at sf0.01")
  }

  test("leakageFreeSplit: groups never straddle, tail never orphaned") {
    // 1000 docs; docs 0-99 form 10 groups of 10, the rest are singletons
    val docs = (0L until 1000L).toDF("id")
    val groups = (0L until 100L).map(i => (i, i / 10L)).toDF("gid", "comp")
    val out = graft.ops.Sampling.leakageFreeSplit(
      docs, $"id", groups, "gid", "comp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"group_key", $"split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 1000) // every row assigned exactly once
    // same group -> same split, always
    out.filter(_._1 < 100).groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length === 1)
    }
    // singletons fall back to their own id as group key
    out.filter(_._1 >= 100).foreach { case (id, g, _) => assert(g === id) }
    // rates: ~80/10/10 over ~910 effective groups (binomial, wide margin)
    val n = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(n("train") > 700 && n("val") > 40 && n("test") > 40)
    // boundary exactness: the last bound is 2^32 itself, so no draw can
    // ever fall past the final split
    assert(graft.ops.Sampling.splitBounds(Seq(0.8, 0.1, 0.1)).last ===
      4294967296L)
    // determinism across repartitioning
    val again = graft.ops.Sampling.leakageFreeSplit(
      docs.repartition(7), $"id", groups, "gid", "comp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { case (id, _, s) => assert(again(id) === s) }
    // STRING group keys: the singleton fallback adopts the group type
    // instead of coercing the group to the id's type (which would throw
    // under ANSI on the first non-numeric group)
    val sg = Seq((1L, "domA"), (2L, "domA")).toDF("gid", "dom")
    val sOut = graft.ops.Sampling.leakageFreeSplit(
      (1L to 3L).toDF("id"), $"id", sg, "gid", "dom",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select($"id", $"group_key", $"split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(sOut.filter(_._1 <= 2).map(_._2).toSet === Set("domA"))
    assert(sOut.filter(_._1 <= 2).map(_._3).distinct.length === 1)
    assert(sOut.find(_._1 == 3L).get._2 === "3") // singleton: id as string
    // the REVERSE mismatch (numeric groups, uncastable string id) must
    // fail fast, not collapse every singleton onto the null hash draw
    val numericGroups = Seq((1L, 10L)).toDF("gid", "comp")
    val err = intercept[Exception] {
      Seq("doc-1", "doc-2").toDF("id").select($"id")
        .transform(d => graft.ops.Sampling.leakageFreeSplit(
          d, $"id", numericGroups, "gid", "comp",
          Seq("train" -> 0.5, "test" -> 0.5)))
        .collect()
    }
    assert(err.getMessage.contains("cannot adopt the group-key type") ||
      Option(err.getCause).exists(
        _.getMessage.contains("cannot adopt the group-key type")),
      s"expected the fail-fast message, got: ${err.getMessage}")
  }

  test("temperatureMix: alpha=1 is natural, alpha=0 uniform, 0.5 damps head") {
    // 80/16/4 split across three sources
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (1 to 16).map(i => (100L + i, "mid")) ++
      (1 to 4).map(i => (200L + i, "small")))
      .toDF("id", "source")
    def weights(alpha: Double): Map[String, Double] =
      graft.ops.Sampling.temperatureMix(df, $"source", alpha)
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Double]("mix_weight")).toMap
    val natural = weights(1.0)
    // bit-exact against the operator's own op chain: share = n/total,
    // weight = share/maxShare (NOT the algebraic n/maxN — IEEE division
    // doesn't cancel the common denominator)
    assert(natural("big") === 1.0)
    assert(natural("mid") === (16.0 / 100.0) / (80.0 / 100.0))
    assert(natural("small") === (4.0 / 100.0) / (80.0 / 100.0))
    val uniform = weights(0.0)
    assert(uniform.values.forall(_ === 1.0))
    val damped = weights(0.5)
    assert(damped("big") === 1.0)
    // sqrt damping: between natural and uniform, strictly ordered
    assert(damped("mid") > natural("mid") && damped("mid") < 1.0)
    assert(damped("small") > natural("small") &&
      damped("small") < damped("mid"))
    // shares always sum to 1 regardless of alpha (exact integer ratios)
    val shares = graft.ops.Sampling.temperatureMix(df, $"source", 0.5)
      .collect().map(_.getAs[Double]("share"))
    assert(shares.sum === 1.0)
  }
}
