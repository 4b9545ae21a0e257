package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Laws for the round-8 BPE rewrite: the deep native encoder
  * ([[graft.functions.BpeEncode]]) must be bit-identical to the
  * learn-order literal replace chain ([[Bpe.encodeSpaced]]) on ANY
  * table — it is an exact chain simulation, not the classic
  * lowest-rank-first loop (which the q283 gate proved diverges on
  * trained tables when a token string forms via two compositions at
  * different ranks).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side replica of the trainer's chain semantics (exact
    * integer counts, (count desc, l, r) argmax, greedy left-to-right
    * merge) — builds a REAL trained table in milliseconds for the
    * equivalence law below.
    */
  private def miniTrain(words: Map[String, Long], iters: Int)
      : Seq[(String, String)] = {
    var voc = words.map { case (w, c) => (w.map(_.toString).toList, c) }.toList
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    var dry = false
    while (it < iters && !dry) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      voc.foreach { case (toks, c) =>
        toks.zip(toks.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val cand = pc.filter(_._2 >= 2L)
      if (cand.isEmpty) dry = true
      else {
        val ((l, r), _) = cand.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r))
        voc = voc.map { case (toks, c) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += toks(i); i += 1 }
          }
          (b.toList, c)
        }
        it += 1
      }
    }
    out.toSeq
  }

  private def seededWords(n: Int): Map[String, Long] = {
    val rng = new scala.util.Random(8675309L)
    (0 until n).map { _ =>
      val w = (0 until 8).map(_ => "0123456789abcdef"(rng.nextInt(16)))
        .mkString
      w -> (1L + rng.nextInt(5))
    }.toMap
  }

  /** The literal replace chain as an independent driver-side
    * reimplementation (Java String.replace is the same left-to-right
    * non-overlapping literal scan as Spark's `replace`) — deeper tables
    * than Catalyst can hold: a 300-node column tree already overflows
    * the analyzer stack when other suites have run first, which is
    * precisely why [[Bpe.encode]] exists.
    */
  private def chainEncode(word: String, table: Seq[(String, String)])
      : Seq[String] = {
    val spaced = " " + word.flatMap(c => s" $c ") + " "
    val out = table.foldLeft(spaced) { case (acc, (l, r)) =>
      acc.replace(s" $l  $r ", s" ${l + r} ")
    }
    out.trim.split("  ").toSeq
  }

  test("encode == the literal chain on a 300-merge trained table") {
    val words = seededWords(1200)
    val table = miniTrain(words, 300)
    assert(table.length === 300, s"vocab dried at ${table.length} merges")
    val expected = words.keys.toSeq.sorted.map(w => (w, chainEncode(w, table)))
    val got = words.keys.toSeq.toDF("w")
      .select($"w", Bpe.encode($"w", table).as("fast"))
      .as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("encode == encodeSpaced on the duplicate-pair table") {
    // a pair can appear at TWO ranks (the trainer re-learns a pair when
    // later merges re-create its occurrences) — the compiled table maps
    // pair → rank LIST, and both encoders must agree
    val table = Seq("a" -> "b", "ab" -> "a", "a" -> "b")
    val df = Seq("ababab", "aab", "abab", "ba").toDF("w")
    val rows = df.select($"w",
        Bpe.encode($"w", table).as("fast"),
        Bpe.encodeSpaced($"w", table).as("chain"))
      .as[(String, Seq[String], Seq[String])].collect()
    rows.foreach { case (w, f, c) => assert(f === c, s"word $w") }
  }

  test("encode matches the pinned-table chain on real document words") {
    val pinned = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t",
      "s" -> "t")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs
      .select(explode(split(lower($"text"), "[^a-z0-9]+")).as("w"))
      .filter($"w" =!= "").distinct()
    val diff = words.select(
        Bpe.encode($"w", pinned).as("fast"),
        Bpe.encodeSpaced($"w", pinned).as("chain"))
      .filter($"fast" =!= $"chain").count()
    assert(diff === 0L)
  }

  test("bpeMerges compaction boundary is seam-free (compactEvery=2 == 16)") {
    // the incremental trainer's compaction must be invisible: train the
    // same vocab with pathological (every-2-rounds) and default folding
    val words = Seq(("abcdabcd", 4L), ("abcdx", 3L), ("xyzw", 2L),
      ("wxyz", 2L), ("abab", 5L)).toDF("word", "cnt")
    val a = Bpe.bpeMerges(words, $"word", $"cnt", iters = 12,
      compactEvery = 2).collect().map(_.toSeq).toList
    val b = Bpe.bpeMerges(words, $"word", $"cnt", iters = 12,
      compactEvery = 16).collect().map(_.toSeq).toList
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("BpeEncode rejects non-alphabet merge tokens eagerly") {
    val ex = intercept[IllegalArgumentException] {
      Bpe.encode(lit("abc"), Seq("a" -> "B"))
    }
    assert(ex.getMessage.contains("[a-z0-9]+"))
  }
}
