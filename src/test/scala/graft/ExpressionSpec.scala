package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{cosine, cosineCompositional, intDot, intDotCompositional, keywordCounts, keywordCountsCompositional, registerAll}

class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pairs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(-0.5f, 0.25f, 0.125f), Array(0.5f, -0.25f, 0.7f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm -> null
    (Array(1.0f), Array(1.0f))).toDF("a", "b")

  test("codegen'd cosine is bit-identical to the compositional formulation") {
    val out = pairs.select(
      cosine($"a", $"b").as("fast"),
      cosineCompositional($"a", $"b").as("ref")).collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("codegen'd cosine agrees on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val x = e.select($"vec_id".as("ia"), $"embedding".as("a"))
    val y = e.select($"vec_id".as("ib"), $"embedding".as("b"))
    val mism = x.join(y, $"ia" < $"ib")
      .select(cosine($"a", $"b").as("fast"),
        cosineCompositional($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(mism.count() === 0)
  }

  test("cosine_similarity is callable from SQL after registration") {
    registerAll(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }

  test("null inputs and zero norms yield null, not errors") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine($"a", $"b")).head().isNullAt(0))
  }

  test("codegen'd jaccard is bit-identical to the set-ops formulation") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")), // duplicates ignored
      (Seq("x"), Seq("y")),
      (Seq.empty[String], Seq.empty[String]), // empty union -> null
      (Seq("a b", "c"), Seq("a", "b c"))).toDF("a", "b")
    val out = df.select(
      graft.functions.jaccard($"a", $"b").as("fast"),
      graft.functions.jaccardCompositional($"a", $"b").as("ref")).collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("typed MinHash Aggregator matches the Column-expression signature") {
    import graft.functions.{minhashSignature, shingleSet, MinHashSignatureAgg}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines process distributed relational queries")).toDF("doc_id", "text")
    // Column-expression path (minhashSignature hashes the shingles itself)
    val viaExpr = docs
      .select($"doc_id", minhashSignature(shingleSet($"text"), 8).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    // typed Aggregator path over exploded element hashes
    val hashes = docs
      .select($"doc_id", explode(shingleSet($"text")).as("sh"))
      .select($"doc_id", xxhash64($"sh").as("h"))
      .as[(Long, Long)]
    val viaAgg = hashes.groupByKey(_._1)
      .agg(new MinHashSignatureAgg(8).toColumn)
      .collect().toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaExpr.foreach { case (id, sig) =>
      assert(sig.toSeq === viaAgg(id).toSeq, s"signature mismatch for doc $id")
    }
    assert(MinHashSignatureAgg.estimateJaccard(viaAgg(1L), viaAgg(1L)) === 1.0)
  }

  test("nfc_normalize composes decomposed forms, idempotently, null-safely") {
    import graft.functions.nfcNormalize
    val decomposedCafe = "cafe\u0301"            // e + combining acute
    val composedCafe = "caf\u00e9"               // precomposed
    val decomposedA = "A\u030angstro\u0308m"    // A+ring, o+diaeresis
    val composedA = "\u00c5ngstr\u00f6m"
    val rows = Seq(
      Some(decomposedCafe),
      Some(composedCafe),    // already composed: unchanged
      Some(decomposedA),
      Some("plain ascii 123"),
      Some(""),
      None).toDF("s")
    val out = rows.select($"s", nfcNormalize($"s").as("n"),
      nfcNormalize(nfcNormalize($"s")).as("nn")).collect()
    val byIdx = out.map(r =>
      (Option(r.getString(0)), Option(r.getString(1)), Option(r.getString(2))))
    assert(byIdx(0)._2 === Some(composedCafe))
    assert(byIdx(1)._2 === Some(composedCafe))
    assert(byIdx(2)._2 === Some(composedA))
    assert(byIdx(3)._2 === Some("plain ascii 123"))
    assert(byIdx(4)._2 === Some(""))
    assert(byIdx(5)._2 === None, "null must stay null")
    byIdx.foreach { case (_, n, nn) =>
      assert(n === nn, "NFC must be idempotent")
    }
    // both mixed forms normalize to the same value -> equality after NFC
    assert(rows.filter(nfcNormalize($"s") === lit(composedCafe)).count() === 2)
    registerAll(spark)
    assert(spark.sql(
      s"SELECT nfc_normalize('$decomposedCafe') = '$composedCafe' AS eq")
      .head().getBoolean(0))
  }

  test("codegen'd jaccard agrees on real document shingles") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(40)
      .select($"doc_id", graft.functions.shingleSet($"text").as("sh"))
    val x = d.select($"doc_id".as("ia"), $"sh".as("a"))
    val y = d.select($"doc_id".as("ib"), $"sh".as("b"))
    val mism = x.join(y, $"ia" < $"ib")
      .select(graft.functions.jaccard($"a", $"b").as("fast"),
        graft.functions.jaccardCompositional($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(mism.count() === 0)
  }

  test("codegen'd int dot is exact and bit-identical to the HOF formulation") {
    val ip = Seq(
      (Array(127L, -127L, 64L), Array(127L, 127L, -3L)),
      (Array(0L, 0L), Array(5L, -5L)),
      (Array(1L, 2L, 3L, 4L), Array(4L, 3L, 2L, 1L))).toDF("a", "b")
    val out = ip.select(intDot($"a", $"b").as("fast"),
      intDotCompositional($"a", $"b").as("ref")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // hand value: 127*127 - 127*127 + 64*-3 = -192
    assert(out(0).getLong(0) === -192L)
    // null array -> null, never an error
    val n = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b").select(intDot($"a", $"b")).collect()
    assert(n(0).isNullAt(0))
    // exactness where a float dot would round: 2^53 + 1 is representable
    // as a long product sum but not as a double
    val big = Seq((Array((1L << 53) + 1L, 1L), Array(1L, 0L)))
      .toDF("a", "b").select(intDot($"a", $"b")).collect()
    assert(big(0).getLong(0) === (1L << 53) + 1L)
    // SQL registration
    registerAll(spark)
    assert(spark.sql(
      "SELECT int_dot_product(array(2L, 3L), array(4L, 5L)) AS d")
      .head().getLong(0) === 23L)
  }

  test("codegen'd keyword counts are bit-identical to regexp_count") {
    val kws = Seq("win", "window", "scan", "batch batch", "aa")
    val df = Seq(
      "window window win",          // win inside window counts; 3/2/0/0/0
      "batch batch batch",          // phrase non-overlap: 1, not 2
      "aaaa",                       // aa non-overlap: 2, not 3
      "scan the window scan scan",  // plain hits
      "",                           // empty text: all zeros
      "no hits here at all")
      .toDF("t")
    val out = df.select(keywordCounts($"t", kws).as("fast"),
      keywordCountsCompositional($"t", kws).as("ref")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // hand values for the tricky rows
    assert(out(0).getSeq[Long](0) === Seq(3L, 2L, 0L, 0L, 0L))
    assert(out(1).getSeq[Long](0) === Seq(0L, 0L, 0L, 1L, 0L))
    assert(out(2).getSeq[Long](0) === Seq(0L, 0L, 0L, 0L, 2L))
    // null text → null array, never an error
    val n = Seq(Option.empty[String]).toDF("t")
      .select(keywordCounts($"t", kws)).collect()
    assert(n(0).isNullAt(0))
    // SQL registration: literal-array keyword list, automaton at plan time
    registerAll(spark)
    assert(spark.sql(
      "SELECT keyword_counts('window win', array('win', 'window')) AS c")
      .head().getSeq[Long](0) === Seq(2L, 1L))
  }
}