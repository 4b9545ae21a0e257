package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Train

/** Round-11 additions, pinned as laws:
  *  - charNgrams edge behavior (padding, whitespace fold, short/empty/
  *    NULL inputs) against a plain-Scala restatement;
  *  - the tokenized NB chain is the word chain when fed word tokens
  *    (the featurization axis changes nothing else);
  *  - the q338 char-3-gram language gate beats the marker heuristic at
  *    ALL THREE scale factors (upgrading q328's sf0.001-only pin — the
  *    round-10 verdict's #1 directive).
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— charNgrams ————————————————————————————————————————————————————

  test("charNgrams matches the plain-Scala restatement, edge cases incl.") {
    def oracle(t: String, n: Int): Seq[String] = {
      if (t == null) return null
      val pad = " " + t.toLowerCase.trim.replaceAll("\\s+", " ") + " "
      if (pad.length < n) Seq.empty
      else (0 to pad.length - n).map(i => pad.substring(i, i + n))
    }
    val texts = Seq("the cat", "  spaced\t\tout \n lines  ", "ab", "a",
      "", "   ", "xy z", "ümlaut ärger", "的 了 是")
    for (n <- Seq(2, 3, 4)) {
      val got = texts.toDF("t")
        .select(graft.functions.charNgrams($"t", n))
        .as[Seq[String]].collect()
      texts.zip(got).foreach { case (t, g) =>
        assert(g === oracle(t, n), s"n=$n text=${t.replace("\n", "\\n")}")
      }
    }
    // NULL stays NULL (explode drops it, same as word tokens)
    val nullGot = Seq(Tuple1[String](null)).toDF("t")
      .select(graft.functions.charNgrams($"t", 3)).as[Seq[String]].head()
    assert(nullGot == null)
  }

  test("naiveBayes*Tokens(word tokens) IS the word chain, bit for bit") {
    val docs = Seq((0L, "en", "the cat sat"), (1L, "fr", "le chat"),
      (2L, "en", "a cat"), (3L, "fr", "un chat le"))
      .toDF("doc_id", "lang", "text")
    val word = Train.naiveBayesModel(docs, $"lang", $"text")
      .orderBy("class", "token").collect()
    val tok = Train.naiveBayesModelTokens(docs, $"lang",
        graft.functions.tokens($"text"))
      .orderBy("class", "token").collect()
    assert(word.toSeq === tok.toSeq)
    val sw = Train.naiveBayesScore(docs, $"doc_id", $"text",
      Train.naiveBayesModel(docs, $"lang", $"text")).orderBy("doc_id").collect()
    val st = Train.naiveBayesScoreTokens(docs, $"doc_id",
      graft.functions.tokens($"text"),
      Train.naiveBayesModel(docs, $"lang", $"text")).orderBy("doc_id").collect()
    assert(sw.toSeq === st.toSeq)
  }

  // ——— grouped QBIN: merge law + streamed fold ———————————————————————

  test("qbinMergeStatesBy: per-group bin-wise fold is exact") {
    import graft.ops.Sketch
    val a = Seq(("s1", 1.0), ("s1", 25.0), ("s2", 7.0)).toDF("g", "v")
    val b = Seq(("s1", 2.0), ("s3", 55.0), ("s1", 25.5)).toDF("g", "v")
    def st(df: org.apache.spark.sql.DataFrame) =
      Sketch.qbinStateBy(df, $"g", $"v", lo = 0.0, w = 10.0, bins = 8)
    val merged = Sketch.qbinMergeStatesBy(st(a), st(b))
      .orderBy("group", "bin").collect().toSeq
    val whole = st(a.unionByName(b)).orderBy("group", "bin").collect().toSeq
    assert(merged === whole)
  }

  test("qbinMaintainBy: streamed grouped fold = batch state, per group") {
    import graft.ops.Sketch
    val stage = TestSpark.tmpDir("graft_qbinby")
    val src = s"$stage/src"
    val data = Seq(("a", 1.0), ("a", 12.0), ("b", 3.0), ("b", 77.0),
      ("a", 5.0), ("c", 33.0), ("a", 64.0)).toDF("g", "v")
    // 3 files → 3 forced micro-batches (order irrelevant: the per-group
    // bin-wise fold commutes, which is the law under test)
    data.repartition(3).write.mode("overwrite").parquet(src)
    val statePath = s"$stage/state"
    graft.streaming.Streaming.qbinMaintainBy(spark, src,
      spark.read.parquet(src).schema, "g", "v", lo = 0.0, w = 10.0,
      bins = 8, statePath, s"$stage/ckpt")
    val last = new java.io.File(statePath).listFiles
      .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toLong).max
    val streamed = spark.read.parquet(s"$statePath/v$last")
      .orderBy("group", "bin").collect().toSeq
    val batch = Sketch.qbinStateBy(data, $"g", $"v", 0.0, 10.0, 8)
      .orderBy("group", "bin").collect().toSeq
    assert(streamed === batch)
    // group independence, extended to the streamed fold: maintaining
    // group a's rows ALONE lands a's grid unchanged
    val srcA = s"$stage/srcA"
    data.filter($"g" === "a").repartition(2)
      .write.mode("overwrite").parquet(srcA)
    graft.streaming.Streaming.qbinMaintainBy(spark, srcA,
      spark.read.parquet(srcA).schema, "g", "v", lo = 0.0, w = 10.0,
      bins = 8, s"$stage/stateA", s"$stage/ckptA")
    val lastA = new java.io.File(s"$stage/stateA").listFiles
      .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toLong).max
    val aAlone = spark.read.parquet(s"$stage/stateA/v$lastA")
      .orderBy("group", "bin").collect().toSeq
    val aOfWhole = spark.read.parquet(s"$statePath/v$last")
      .filter($"group" === "a").orderBy("group", "bin").collect().toSeq
    assert(aAlone === aOfWhole)
  }

  // ——— frontier claims log: the bucketed anti-join plan ——————————————

  test("frontier claims: bucketing removes the frontier-leg exchange") {
    import org.apache.spark.sql.DataFrame
    val stage = TestSpark.tmpDir("graft_frontier_bucket")
    val src = s"$stage/src"
    (0L until 40L)
      .map(i => (i, s"https://h${i % 10}.example.com/p/${i % 20}"))
      .toDF("doc_id", "url")
      .repartition(1).write.mode("overwrite").parquet(src)
    val statePath = s"$stage/state"
    graft.streaming.Streaming.frontierMaintain(spark, src,
      spark.read.parquet(src).schema, "doc_id", "url",
      statePath, s"$stage/ckpt")
    val tbl = graft.streaming.Streaming.frontierClaimsTable(statePath)
    assert(spark.catalog.tableExists(tbl), "claims table not landed")
    // the per-batch anti-join shape, planned two ways over the SAME
    // landed files: the bucketed catalog read must save exactly one
    // exchange (the frontier leg) vs a plain parquet read
    val batch = Seq((100L, "k1"), (101L, "k2"), (102L, "k1"))
      .toDF("doc_id", "canon")
      .groupBy($"canon").agg(min($"doc_id").as("doc_id"))
    def antiPlan(prior: DataFrame): String =
      batch.join(prior.hint("merge"), Seq("canon"), "left_anti")
        .queryExecution.executedPlan.toString
    val bucketed = antiPlan(spark.table(tbl)
      .filter($"__batch_id" < 99).select($"canon"))
    val plain = antiPlan(spark.read.schema(spark.table(tbl).schema)
      .parquet(s"$statePath/claims")
      .filter($"__batch_id" < 99).select($"canon"))
    // the frontier is the anti join's RIGHT child, printed LAST: its
    // subtree is every line after the left-child block (the `:`-prefixed
    // lines). The pin: that subtree scans bucket-aligned with ZERO
    // exchanges — while the plain parquet read of the SAME files
    // shuffles the frontier leg
    def frontierLeg(p: String): Seq[String] = {
      val lines = p.linesIterator.toSeq
      val lastLeft = lines.lastIndexWhere(_.trim.startsWith(":"))
      assert(lastLeft >= 0, s"no left-child block in:\n$p")
      lines.drop(lastLeft + 1)
    }
    assert(bucketed.contains("LeftAnti"), s"no anti join:\n$bucketed")
    val bLeg = frontierLeg(bucketed)
    assert(bLeg.exists(_.contains("SelectedBucketsCount")),
      s"claims scan not bucket-aligned:\n$bucketed")
    assert(!bLeg.exists(_.contains("Exchange")),
      s"frontier leg still shuffles despite bucketing:\n$bucketed")
    assert(frontierLeg(plain).exists(_.contains("Exchange")),
      s"plain read did not shuffle the frontier leg — the pin is " +
        s"vacuous:\n$plain")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  // ——— key-targeted deletion (q343's device) —————————————————————————

  test("eraseKeys: prunes via stats, untouched files byte-identical, " +
      "old snapshot intact") {
    import graft.ops.Privacy
    import graft.sources.Manifest
    val base = TestSpark.tmpDir("graft_erase")
    val table = s"$base/t"
    // 16 keyed rows land as 4 contiguous-range files (k00–k03, k04–k07…)
    val rows = (0 until 16).map(i => (i, f"k$i%02d|payload$i"))
      .toDF("id", "value")
    rows.repartitionByRange(4, $"id").select($"value")
      .write.format("graft-manifest").option("path", table)
      .mode("append").save()
    val keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => substring(v, 1, 3)
    Privacy.publishKeyStats(spark, table, keyOf)
    val v1 = Manifest.manifestNames(table)
    def fileBytes(p: String): Seq[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        p.stripPrefix("file:"))).toSeq
    val before = Manifest.committedFiles(table)
      .map(f => f -> fileBytes(f)).toMap
    // erase k05 and k06 — both live in the SECOND range file only
    val rep = Privacy.eraseKeys(spark, table, keyOf, Seq("k05", "k06"),
      "gen-1", Some(v1.toSet))
    // adjacent keys: ≤ 2 candidate files (range boundaries are sampled,
    // so the pair may straddle one), and pruning must spare the rest
    assert(rep.nFiles == 4 && rep.nCandidates <= 2 && rep.nUntouched >= 2,
      s"stats pruning wrong: $rep")
    // untouched files: same paths in the new manifest, bytes unchanged
    val after = Manifest.committedFiles(table, Some(Set("gen-1")))
    val untouched = after.toSet.intersect(before.keySet)
    assert(untouched.size == rep.nUntouched)
    untouched.foreach(f => assert(fileBytes(f) === before(f),
      s"untouched file rewritten: $f"))
    // the candidate file is gone from the new version but still on disk
    val dropped = before.keySet -- after.toSet
    assert(dropped.size == rep.nCandidates)
    dropped.foreach(f => assert(fileBytes(f) === before(f),
      s"superseded file mutated: $f"))
    // old snapshot reads the pre-delete table exactly
    val pre = spark.read.format("graft-manifest").option("path", table)
      .option("snapshot", v1.mkString(",")).load()
      .as[String].collect().sorted
    assert(pre.length == 16 && pre.exists(_.startsWith("k05")))
    // new version = the anti-join
    val post = spark.read.format("graft-manifest").option("path", table)
      .option("snapshot", "gen-1").load().as[String].collect().sorted
    assert(post.length == 14)
    assert(!post.exists(v => v.startsWith("k05") || v.startsWith("k06")))
    // a no-hit erase rewrites nothing and republishes the same file set
    val rep2 = Privacy.eraseKeys(spark, table, keyOf, Seq("zzz"),
      "gen-2", Some(Set("gen-1")))
    assert(rep2.nCandidates == 0 && rep2.newFiles.isEmpty)
    assert(Manifest.committedFiles(table, Some(Set("gen-2"))).sorted ==
      after.sorted)
    // immutability: republishing an existing generation must throw
    intercept[IllegalArgumentException] {
      Privacy.eraseKeys(spark, table, keyOf, Seq("k01"), "gen-1",
        Some(Set("gen-2")))
    }
  }

  test("expireSnapshots: purges dead files, age-guards orphans, " +
      "expired reads refuse") {
    import graft.ops.Privacy
    import graft.sources.Manifest
    val base = TestSpark.tmpDir("graft_expire")
    val table = s"$base/t"
    val rows = (0 until 16).map(i => (i, f"k$i%02d|payload$i"))
      .toDF("id", "value")
    rows.repartitionByRange(4, $"id").select($"value")
      .write.format("graft-manifest").option("path", table)
      .mode("append").save()
    val keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => substring(v, 1, 3)
    Privacy.publishKeyStats(spark, table, keyOf)
    val v1 = Manifest.manifestNames(table)
    val rep = Privacy.eraseKeys(spark, table, keyOf, Seq("k05"), "gen-1",
      Some(v1.toSet))
    // stage two orphans (never referenced by any manifest): one young,
    // one with an hour-old mtime
    val dataDir = new java.io.File(s"$table/data")
    val young = new java.io.File(dataDir, "part-orphan-young.txt")
    val old = new java.io.File(dataDir, "part-orphan-old.txt")
    java.nio.file.Files.write(young.toPath, "zz|young\n".getBytes)
    java.nio.file.Files.write(old.toPath, "zz|old\n".getBytes)
    assert(old.setLastModified(System.currentTimeMillis() - 2L*3600*1000))
    val exp = Privacy.expireSnapshots(table, Set("gen-1"))
    // dead-referenced files purge immediately (whatever their age);
    // the young orphan is spared, the old one reaped
    assert(exp.deletedFiles.exists(_.contains("part-")), exp.toString)
    assert(exp.deletedFiles.size == rep.nCandidates + 1, exp.toString)
    assert(exp.sparedYoung.map(f => f.substring(f.lastIndexOf('/') + 1))
      == Seq("part-orphan-young.txt"), exp.toString)
    assert(!old.exists && young.exists)
    assert(exp.droppedManifests.toSet == v1.toSet)
    // the kept generation reads intact, the expired one refuses
    val post = spark.read.format("graft-manifest").option("path", table)
      .option("snapshot", "gen-1").load().as[String].collect()
    assert(post.length == 15 && !post.exists(_.startsWith("k05")))
    intercept[Exception] {
      spark.read.format("graft-manifest").option("path", table)
        .option("snapshot", v1.mkString(",")).load().count()
    }
    // guard rails: unknown kept name and empty keep both throw
    intercept[IllegalArgumentException] {
      Privacy.expireSnapshots(table, Set("no-such-manifest"))
    }
    intercept[IllegalArgumentException] {
      Privacy.expireSnapshots(table, Set.empty)
    }
  }

  // ——— q338: the char-n-gram gate wins EVERYWHERE ————————————————————

  test("q338: char-3-gram language gate beats the marker rule at ALL 3 SFs") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val out = SparkEntry.queries("q338_charngram_lang_gate")(
        spark, s"/root/testdata/$sf")
      val (dis, mOk, hOk) = out.agg(
          sum($"n_disagree"), sum($"n_model_correct"), sum($"n_heur_correct"))
        .as[(Long, Long, Long)].head()
      assert(dis > 0, s"$sf: model and heuristic never disagree — vacuous")
      assert(mOk > hOk,
        s"$sf: char-3-gram gate ($mOk correct) does not beat the marker " +
          s"rule ($hOk) — the q338 contract is a win at EVERY SF")
    }
  }
}
