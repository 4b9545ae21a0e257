package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer TRAINING — the other trainable artifact of a
  * data pipeline beside [[Train]]'s quality probe: learn the merge
  * table from the corpus itself, inside the engine, so tokenizer
  * vocabulary induction runs where the corpus lives.
  *
  * The classic algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): start from
  * characters, repeatedly count adjacent symbol pairs ACROSS THE WORD
  * VOCABULARY (weighted by word frequency — never the raw corpus) and
  * merge the most frequent pair everywhere. The word-count table is the
  * sufficient statistic: Zipf-small relative to tokens, so each
  * iteration is a vocab-grain aggregation no matter how big the corpus
  * that produced it — the one corpus-scale pass is the initial word
  * count.
  *
  * Representation: a word is its SPACED form "␣␣c1␣␣c2␣␣…␣␣cN␣␣" —
  * tokens separated (and bounded) by double spaces. A merge of pair
  * (l, r) is then the literal string replacement "␣l␣␣r␣" → "␣lr␣",
  * whose left-to-right non-overlapping scan IS greedy BPE application
  * (overlaps like "a a a" merge the leftmost pair only, because the
  * match consumes one space of the next boundary) — one engine-portable
  * primitive both Spark's `replace` and any SQL engine's `replace`
  * execute identically, which is what makes a fixed-iteration trainer
  * run differentially gateable.
  *
  * Determinism: pair counts are exact integer sums; the winning pair is
  * (max count, then lexicographically smallest left, then right) — a
  * total order, so ties cannot make two engines learn different
  * tokenizers. Tokens must stay space-free: [[wordCounts]] restricts
  * the alphabet to [a-z0-9]+.
  */
object Bpe {

  /** The corpus-scale pass: lowercase [a-z0-9]+ word frequencies. One
    * explode + one groupBy; everything downstream is vocab-grain.
    */
  def wordCounts(df: DataFrame, text: Column): DataFrame = df
    .select(explode(split(lower(text), "[^a-z0-9]+")).as("word"))
    .filter(col("word") =!= "")
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word column in spaced form: "  c  h  a  r  s  ". */
  private def spaced(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", " $1 "), lit(" "))

  /** Adjacent-pair frame (l, r, weighted count) of a spaced vocab. Every
    * adjacent position counts (runs like "aaa" contribute both (a,a)
    * positions) — the standard counting rule; only the MERGE is
    * greedy-non-overlapping.
    */
  private def pairCounts(voc: DataFrame): DataFrame = {
    val toks = voc.select(col("__n"),
      split(trim(col("__w")), "  ").as("__t"))
    toks
      .select(col("__n"),
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("__a"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("__b"))
      .select(col("__n"),
        explode(arrays_zip(col("__a"), col("__b"))).as("__pr"))
      .select(col("__n"), col("__pr").getField("__a").as("__l"),
        col("__pr").getField("__b").as("__r"))
      .groupBy(col("__l"), col("__r")).agg(sum(col("__n")).as("__c"))
  }

  /** Train `iters` merges over a (word, count) vocabulary. Returns the
    * merge table (ord, left, right, merged, pair_count) in learn order —
    * the tokenizer artifact [[encodeSpaced]] applies. The driver holds
    * only the per-round winning pair (the iterative-driver scalar
    * pattern); each round is one vocab-grain pair aggregation + a
    * TakeOrdered(1) + one map-side replace, with a localCheckpoint to
    * stop lineage (and re-tokenization) growing with rounds. Stops
    * early when no pair occurs twice.
    */
  def bpeMerges(words: DataFrame, word: Column, cnt: Column,
                iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    val s = words.sparkSession
    import s.implicits._
    var voc = words
      .select(spaced(word).as("__w"), cnt.cast("long").as("__n"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var it = 0
    var dry = false
    while (it < iters && !dry) {
      val top = pairCounts(voc).filter(col("__c") >= 2L)
        .orderBy(col("__c").desc, col("__l").asc, col("__r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
          s"tokens must be space-free [a-z0-9]+, got '$l'/'$r'")
        learned += ((it, l, r, l + r, c))
        val next = voc.withColumn("__w",
            replace(col("__w"), lit(s" $l  $r "), lit(s" ${l + r} ")))
          .localCheckpoint()
        voc.unpersist()
        voc = next
        it += 1
      }
    }
    learned.toSeq.toDF("ord", "left", "right", "merged", "pair_count")
  }

  /** Apply a FIXED merge table (the shipped tokenizer artifact) to a
    * WORD column ([a-z0-9]+ — tokenize/normalize upstream): spaced-form
    * replaces in learn order — one map-side expression chain, codegen'd,
    * zero shuffles; the corpus-scale serving leg. Returns the token
    * ARRAY column.
    */
  def encodeSpaced(word: Column, merges: Seq[(String, String)]): Column = {
    merges.foreach { case (l, r) =>
      require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
        s"merge tokens must be [a-z0-9]+, got '$l'/'$r'")
    }
    val folded = merges.foldLeft(spaced(word)) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l  $r "), lit(s" ${l + r} "))
    }
    split(trim(folded), "  ")
  }
}
