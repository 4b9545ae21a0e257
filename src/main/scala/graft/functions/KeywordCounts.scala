package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton over UTF-16 chars: ONE pass over
  * the text finds every occurrence of every keyword simultaneously —
  * the device that makes a 10 000-term blocklist cost the same scan as a
  * 10-term one (N chained `LIKE`s re-scan the text N times; a regex
  * alternation backtracks). Match semantics per keyword are LEFTMOST
  * NON-OVERLAPPING (the `regexp_count`/RE2 convention, so a replaying
  * engine computes the identical counts keyword-by-keyword): matches of
  * the same keyword may not overlap each other; matches of DIFFERENT
  * keywords are independent ("win" counts inside "window").
  *
  * Built once per JVM from the keyword list (the expression keeps only
  * the list and rebuilds lazily after serialization); matching allocates
  * one long[] of keyword-count cells per row.
  */
final class AhoCorasick(keywords: Seq[String]) extends Serializable {
  require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
    "keywords must be non-empty strings")
  private val k = keywords.length
  private val lens = keywords.map(_.length).toArray

  // trie + fail links + merged output lists, built eagerly
  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outs = mutable.ArrayBuffer(List.empty[Int])
  keywords.zipWithIndex.foreach { case (w, i) =>
    var node = 0
    w.foreach { c =>
      node = children(node).getOrElseUpdate(c, {
        children += mutable.HashMap.empty[Char, Int]
        outs += Nil
        children.length - 1
      })
    }
    outs(node) = i :: outs(node)
  }
  private val fail = Array.fill(children.length)(0)
  private val queue = mutable.Queue.empty[Int]
  children(0).valuesIterator.foreach(queue.enqueue(_))
  while (queue.nonEmpty) {
    val v = queue.dequeue()
    children(v).foreach { case (c, u) =>
      var f = fail(v)
      while (f != 0 && !children(f).contains(c)) f = fail(f)
      fail(u) = children(f).get(c).filter(_ != u).getOrElse(0)
      outs(u) = outs(u) ++ outs(fail(u))
      queue.enqueue(u)
    }
  }
  private val childArr = children.map(_.toMap).toArray
  private val outArr = outs.map(_.toArray).toArray

  /** Per-keyword leftmost non-overlapping occurrence counts. */
  def counts(s: String): Array[Long] = {
    val cnt = new Array[Long](k)
    val nextAllowed = new Array[Int](k)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      while (state != 0 && !childArr(state).contains(c)) state = fail(state)
      state = childArr(state).getOrElse(c, 0)
      val out = outArr(state)
      var j = 0
      while (j < out.length) {
        val kw = out(j)
        val start = i - lens(kw) + 1
        if (start >= nextAllowed(kw)) {
          cnt(kw) += 1L
          nextAllowed(kw) = start + lens(kw)
        }
        j += 1
      }
      i += 1
    }
    cnt
  }
}

/** Codegen'd multi-keyword occurrence counter: `array<bigint>` of
  * per-keyword counts in keyword order, from ONE automaton pass over the
  * text ([[AhoCorasick]]). The blocklist/safety-wordlist scorer at
  * corpus scale — composes downstream with plain array functions
  * (`aggregate` for total hits, `zip_with` against a weight array for a
  * risk score), all inside whole-stage codegen.
  *
  * Differential contract: element i equals
  * `regexp_count(text, quote(keywords(i)))` — leftmost non-overlapping
  * per keyword — which is how the oracle replays it engine-portably
  * (q320) and how the compositional twin is built (ExpressionSpec
  * bit-identity). Null text → null array.
  */
case class KeywordCounts(child: Expression, keywords: Seq[String])
    extends UnaryExpression {

  require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
    "keywords must be non-empty strings")

  @transient private lazy val automaton = new AhoCorasick(keywords)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "keyword_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  /** Public for generated code (the codegen references `this`). */
  def countsOf(s: UTF8String): ArrayData =
    new GenericArrayData(automaton.counts(s.toString))

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kwScan", this,
      classOf[KeywordCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countsOf($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): KeywordCounts = copy(child = newChild)
}
