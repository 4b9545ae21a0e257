package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the dedup / similarity / text ops.
  *
  * Everything here composes built-in (codegen'd) higher-order functions —
  * no UDFs — so the expressions stay inside whole-stage codegen and
  * Catalyst can prune/push around them.
  */
package object functions {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Bind `value` to a lambda variable and build the result with
    * [[mk]] — the per-row let-binding for expressions consumed INSIDE a
    * higher-order-function lambda. Spark's HOFs are interpreted
    * (CodegenFallback) and a lambda body is re-evaluated PER ELEMENT,
    * so an expensive subtree captured from outside the lambda (a regex
    * fold, a tokenizer split) would otherwise re-run once per output
    * element instead of once per row — measured 2-3× on the char-gram
    * and shingle lanes (OPTIMIZATION_r13.md). `flatten ∘ transform`
    * over a one-element array is the identity wrapper that makes the
    * binding; same values, same nulls (flatten propagates a null
    * element as a null result, matching the unbound form's
    * null-in-null-out).
    */
  private def bindOnce(value: Column, mk: Column => Column): Column =
    flatten(transform(array(value), mk))

  /** Word n-gram shingles: `["a b c", "b c d", ...]` for n=3. Returns an
    * empty array when the document is shorter than n tokens.
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    bindOnce(tokens(text), toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Character n-grams over a space-padded single-space fold of the
    * lowercased text — the standard language-ID featurization (Cavnar &
    * Trenkle 1994; fastText's `-minn/-maxn` subwords): for n = 3,
    * `"the cat"` → `[" th", "the", "he ", "e c", " ca", "cat", "at "]`.
    * The whitespace fold makes grams layout-independent (tabs, newlines
    * and space runs all read as one boundary) and the padding gives
    * word-initial/-final grams their own identity — exactly the
    * sub-word boundary evidence that separates languages sharing a
    * vocabulary, where word unigrams carry none (q328's diagnosed
    * weakness; q338 gates the fix). Empty or all-whitespace text yields
    * an empty array; NULL text stays NULL. The guard matters: Spark's
    * `sequence(1, k)` DESCENDS for k < 1 rather than returning empty.
    * Pure codegen'd built-ins (regexp_replace/sequence/transform/
    * substr) — map-side, shuffle-free, no UDF.
    */
  def charNgrams(text: Column, n: Int = 3): Column = {
    require(n >= 1 && n <= 16, s"char n-gram width must be in [1,16], got $n")
    val pad = concat(lit(" "),
      regexp_replace(trim(lower(text)), "\\s+", " "), lit(" "))
    // the whitespace-fold regex is bound per ROW (bindOnce) — captured
    // directly in the transform lambda it would re-run per gram position
    when(text.isNull, lit(null).cast("array<string>"))
      .otherwise(bindOnce(pad, p =>
        when(length(p) >= n,
          transform(sequence(lit(1), length(p) - lit(n - 1)),
            i => p.substr(i, lit(n))))
          .otherwise(array().cast("array<string>"))))
  }

  /** Distinct shingle set (order-insensitive) for set-similarity measures. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(wordShingles(text, n))

  /** Shingle set hashed to 64-bit values. Set-similarity over the hashes
    * equals similarity over the strings up to xxhash64 collisions
    * (~1e-14 per pair) while shrinking pairwise-join rows several-fold —
    * the preferred representation for pairwise similarity at scale.
    */
  def hashedShingleSet(text: Column, n: Int = 3): Column =
    transform(shingleSet(text, n), s => xxhash64(s))

  /** Jaccard similarity of two string-array columns via the codegen'd
    * [[JaccardSimilarity]] expression (single pass, no intermediate arrays;
    * bit-identical to [[jaccardCompositional]]).
    */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Built-ins-only Jaccard (set ops) — kept for differential testing. */
  def jaccardCompositional(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    inter / nullif(union, lit(0.0d))
  }

  /** Cast a float array to double for stable numeric accumulation. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two numeric array columns, accumulated in double,
    * left-to-right (deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)

  /** L2 norm of a numeric array column. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity via the codegen'd [[CosineSimilarity]] expression
    * (one fused loop; bit-identical to [[cosineCompositional]]). Null when
    * either side has zero norm.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Built-ins-only cosine (aggregate over zip_with) — the formulation the
    * custom expression must agree with; kept for differential testing.
    */
  def cosineCompositional(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0d))

  /** EXACT integer dot product of two integral array columns via the
    * codegen'd [[IntDotProduct]] expression — the int8-quantized candidate
    * scorer (no rounding, no accumulation-order sensitivity).
    */
  def intDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IntDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Built-ins-only integer dot (aggregate over zip_with) — the
    * formulation [[intDot]] must agree with; kept for differential
    * testing. Operands widen to long BEFORE multiplying (as the codegen'd
    * expression does), so int/short arrays don't overflow in 32-bit.
    * zip_with null-pads unequal lengths (sum goes null) where [[intDot]]
    * stops at the shorter array — equal-length inputs only.
    */
  def intDotCompositional(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Unicode NFC normalization via the codegen'd [[NfcNormalize]]
    * expression — run before any byte-wise compare/hash over mixed-form
    * text (see the expression's Scaladoc).
    */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }

  /** Per-keyword occurrence counts (`array<bigint>`, keyword order) via
    * the codegen'd Aho–Corasick [[KeywordCounts]] expression — one text
    * pass for ANY list size (see the expression's Scaladoc).
    */
  def keywordCounts(text: Column, keywords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KeywordCounts(ColumnBridge.expression(text), keywords))
  }

  /** Built-ins-only twin of [[keywordCounts]] — one `regexp_count` per
    * keyword (N text passes) — the formulation the automaton must agree
    * with bit-for-bit; kept for differential testing.
    */
  def keywordCountsCompositional(text: Column,
                                 keywords: Seq[String]): Column =
    array(keywords.map(k =>
      regexp_count(text, lit(java.util.regex.Pattern.quote(k)))
        .cast("long")): _*)

  /** Register the engine's SQL-callable functions on a session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_similarity", exprs => JaccardSimilarity(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot_product", exprs => IntDotProduct(exprs(0), exprs(1)),
      "scala_udf")
    // keyword list must be a FOLDABLE array of string literals — the
    // automaton is built at plan time, not per row
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "keyword_counts", { exprs =>
        // a NULL element must raise the same clean plan-time error the
        // non-foldable path gets, not an NPE out of .toString
        def str(v: Any): String = {
          if (v == null) throw new IllegalArgumentException(
            "keyword_counts needs a foldable string-array keyword list " +
              "(found a NULL element)")
          v.toString
        }
        val kws = exprs(1) match {
          case a: org.apache.spark.sql.catalyst.expressions.CreateArray
              if a.children.forall(_.foldable) =>
            a.children.map(c => str(c.eval(null)))
          case l if l.foldable && l.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType] =>
            val arr = l.eval(null) // a NULL array literal fails cleanly too
            if (arr == null) str(null)
            arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(org.apache.spark.sql.types.StringType)
              .map(str).toSeq
          case other => throw new IllegalArgumentException(
            s"keyword_counts needs a foldable string-array keyword list, got $other")
        }
        KeywordCounts(exprs(0), kws)
      }, "scala_udf")
  }

  /** Deterministic per-seed MinHash value over an array of 64-bit element
    * hashes: `min(xxhash64(seed, h))` — re-hashing with a seed column keeps
    * the family inside codegen'd hashing (no bigint arithmetic, so it is
    * ANSI-mode safe; a multiplicative family would overflow-throw).
    */
  def minhash(elementHashes: Column, seed: Int): Column =
    coalesce(
      array_min(transform(elementHashes, h => xxhash64(lit(seed), h))),
      lit(Long.MaxValue))

  /** MinHash signature: array of `k` minhashes over a shingle array. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hashes = transform(shingles, s => xxhash64(s))
    array((0 until k).map(seed => minhash(hashes, seed)): _*)
  }
}
