package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Profile}

/** Hand-checked laws for the round-6 batch-E operators: the binary
  * report card, Spearman rank correlation, and the ORC round-trip. */
class Round6eOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— binaryCard ————————————————————————————————————————————————————

  test("binaryCard: hand-computed confusion and metrics") {
    // tp=2, fp=1, fn=1, tn=4: acc 6/8; tpr 2/3, tnr 4/5
    val df = Seq((true, true), (true, true), (true, false), (false, true),
      (false, false), (false, false), (false, false), (false, false))
      .toDF("pred", "act")
    val r = Eval.binaryCard(df, $"pred", $"act").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 1L, 4L)))
    assert(r.getDouble(4) === 0.75)
    assert(math.abs(r.getDouble(5) - (2.0 / 3 + 4.0 / 5) / 2) < 1e-6)
    assert(math.abs(r.getDouble(6) - (2.0 / 3 + 4.0 / 5 - 1)) < 1e-6)
    // mcc = (2·4 − 1·1)/sqrt(3·3·5·5) = 7/15
    assert(math.abs(r.getDouble(7) - 7.0 / 15.0) < 1e-6)
  }

  test("binaryCard: a single-class actual gives accuracy but null balanced/J/mcc") {
    val df = Seq((true, true), (false, true)).toDF("pred", "act")
    val r = Eval.binaryCard(df, $"pred", $"act").head()
    assert(r.getDouble(4) === 0.5)
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  // ——— spearmanCorr ——————————————————————————————————————————————————

  test("spearmanCorr: a nonlinear monotone relation scores exactly 1") {
    // y = x³ is monotone but nonlinear: Pearson < 1, Spearman = 1
    val df = (1 to 20).map(i => ("g", i.toDouble, math.pow(i, 3)))
      .toDF("g", "x", "y")
    val r = Profile.spearmanCorr(df, $"g", $"x", $"y")
      .select("spearman").as[Option[Double]].head()
    assert(r === Some(1.0))
  }

  test("spearmanCorr: reversed order scores −1; ties use average ranks") {
    val rev = (1 to 10).map(i => ("g", i.toDouble, -i.toDouble))
      .toDF("g", "x", "y")
    assert(Profile.spearmanCorr(rev, $"g", $"x", $"y")
      .select("spearman").as[Option[Double]].head() === Some(-1.0))
    // tie-aware worked example: x = (1,2,2,3), y = (1,2,3,4):
    // rx = (1, 2.5, 2.5, 4), ry = (1,2,3,4) → ρ = 0.9486832980505138 →
    // round6 0.948683
    val tied = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 2.0, 3.0),
      ("g", 3.0, 4.0)).toDF("g", "x", "y")
    val r = Profile.spearmanCorr(tied, $"g", $"x", $"y")
      .select("spearman").as[Option[Double]].head()
    assert(math.abs(r.get - 0.948683) < 1e-6)
  }

  test("spearmanCorr: constant variable → null; groups independent") {
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0),
      ("b", 1.0, 1.0), ("b", 2.0, 2.0)).toDF("g", "x", "y")
    val m = Profile.spearmanCorr(df, $"g", $"x", $"y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m("a") === None && m("b") === Some(1.0))
  }

  test("spearmanCorr: null x/y pairs are excluded (pairwise-complete)") {
    // a null pair must not rank (Spark NULLS FIRST vs DuckDB NULLS LAST
    // would diverge silently); it is dropped, so the remaining perfect
    // monotone pairs score exactly 1 and n counts only complete pairs
    val df = Seq(("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(4.0)),
      ("a", None, Some(9.9)), ("a", Some(3.0), None),
      ("a", Some(3.5), Some(9.0))).toDF("g", "x", "y")
    val r = Profile.spearmanCorr(df, $"g", $"x", $"y")
      .select("n", "spearman").as[(Long, Option[Double])].head()
    assert(r === ((3L, Some(1.0))))
  }

  // ——— ORC round-trip ————————————————————————————————————————————————

  test("ORC write -> read preserves schema and values, doubles included") {
    val dir = TestSpark.tmpDir("graft_orc")
    val df = Seq((1L, "x", 0.1), (2L, "y", 1.0 / 3.0), (3L, null, -0.0))
      .toDF("id", "s", "v")
    graft.sinks.Sinks.orcWrite(df, s"$dir/t")
    val back = graft.ingest.Ingest.orc(spark, s"$dir/t")
    // file sources relax nullable=false on read — names and types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }
}
