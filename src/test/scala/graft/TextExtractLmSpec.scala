package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Behavioral laws for the round-8 text front-door ops: HTML
  * main-content extraction (the crawl-processing lane ahead of every
  * quality/dedup op) and bigram-LM typicality (the CCNet-style
  * perplexity-filter analogue). The oracle gates (q292/q293) pin
  * cross-engine equality; these pin the SEMANTICS on crafted fixtures
  * where the right answer is known by hand.
  */
class TextExtractLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("htmlExtract: boilerplate drops, prose survives verbatim") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red }</style></head><body>" +
      "<nav>Home | About</nav>" +
      "<p>the quick brown fox jumps over the lazy dog</p>" +
      "<div>read more</div>" +
      "<script>var pipes = '| | |'; // invisible</script>" +
      "<footer>© corp</footer></body></html>"
    val df = Seq((1L, html)).toDF("id", "html")
    val out = TextAnalysis.htmlExtract(df, col("id"), col("html"))
      .collect().head
    assert(out.getAs[String]("main_text") ===
      "the quick brown fox jumps over the lazy dog")
    assert(out.getAs[Int]("n_kept") === 1)
    // visible lines: title, nav, prose, stub, footer — script/style gone
    assert(out.getAs[Int]("n_lines") === 5)
  }

  test("htmlExtract: script/style content never leaks, even with tags inside strings") {
    val html = "<body><script>var a = 1;</script><style>.x{}</style>" +
      "<p>alpha beta gamma delta epsilon zeta</p></body>"
    val out = TextAnalysis.htmlExtract(
      Seq((1L, html)).toDF("id", "html"), col("id"), col("html"))
      .collect().head
    assert(out.getAs[String]("main_text") ===
      "alpha beta gamma delta epsilon zeta")
    assert(!out.getAs[String]("main_text").contains("var a"))
  }

  test("bigramLmScore: common transitions score above unique ones; short docs excluded") {
    // "a b" appears 3x as a transition; "x y"/"y z" once each
    val docs = Seq(
      (1L, "a b a b a b"), // all transitions common-ish
      (2L, "x y z"),       // unique transitions
      (3L, "solo")         // 1 token — no transitions, excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L), "single-token doc must be excluded")
    assert(out(1L).getAs[Long]("n_bigrams") === 5L)
    assert(out(2L).getAs[Long]("n_bigrams") === 2L)
    assert(out(1L).getAs[Double]("mean_p") > out(2L).getAs[Double]("mean_p"),
      "repeated transitions must score more typical than unique ones")
    assert(out(1L).getAs[Double]("min_p") > 0.0)
  }

  test("bigramLmScore: n_bigrams = n_tokens - 1 on every scored doc") {
    val docs = Seq((1L, "one two three four"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(out(1L) === 3L)
    assert(out(2L) === 1L)
  }
}
