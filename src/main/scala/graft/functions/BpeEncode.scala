package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval helper — a plain object so generated Java can call it as
  * static methods, with the compiled merge table passed as a plan
  * reference object.
  */
object BpeCodec {

  /** A compiled merge table: pair → SORTED array of the ranks at which
    * that pair appears. A pair can legitimately appear at SEVERAL ranks
    * — the trainer re-learns a pair when later merges re-create its
    * occurrences — so the value is a rank list, not a single rank. Keys
    * are `l + " " + r` (tokens are space-free by contract, so the
    * single space is a safe separator). Serializable: the table ships
    * inside the plan — one copy per plan, NOT per row or per task.
    */
  final class Table(val ranks: java.util.HashMap[String, Array[Int]])
    extends Serializable

  def compile(merges: Seq[(String, String)]): Table = {
    val tmp = new java.util.HashMap[String, java.util.ArrayList[Int]]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      tmp.computeIfAbsent(l + " " + r,
        _ => new java.util.ArrayList[Int]()).add(i)
    }
    val m = new java.util.HashMap[String, Array[Int]](tmp.size * 2)
    tmp.forEach { (k, v) =>
      val a = new Array[Int](v.size)
      var i = 0
      while (i < a.length) { a(i) = v.get(i); i += 1 } // insertion order = sorted
      m.put(k, a)
    }
    new Table(m)
  }

  /** Smallest rank ≥ pos in a sorted rank array, or Int.MaxValue. */
  private def ceilRank(ranks: Array[Int], pos: Int): Int = {
    var lo = 0
    var hi = ranks.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ranks(mid) < pos) lo = mid + 1 else hi = mid
    }
    if (lo < ranks.length) ranks(lo) else Int.MaxValue
  }

  /** EXACT simulation of the learn-order replace chain
    * ([[graft.ops.Bpe.encodeSpaced]]) at K-independent cost: instead of
    * executing all K passes, jump the pass pointer straight to the
    * smallest rank ≥ pos whose pair is PRESENT in the current token
    * list (every skipped pass is a no-op by construction), execute that
    * one pass greedily left-to-right (merge, then continue AFTER the
    * merged token — literal `replace` semantics), and advance the
    * pointer past it. This is a simulation, not a reformulation: no
    * assumption about the table is needed — in particular NOT the
    * "rank-consistency" that the classic lowest-rank-first encode
    * relies on, which a genuinely trained table can violate when the
    * same token string forms via two compositions at different ranks
    * (found by the q283 gate: lowest-rank-first then applies an early
    * pair the chain's pass had already gone past, and the encodes
    * diverge).
    *
    * Cost per word: O(passes · len + len · log K) with passes ≤ len —
    * independent of table depth, vs the chain's O(K · len).
    */
  def encode(word: UTF8String, table: Table): GenericArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val toks = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { toks.add(String.valueOf(s.charAt(i))); i += 1 }
    val ranks = table.ranks
    var pos = 0
    var done = false
    while (!done && toks.size > 1) {
      // the next pass that changes the word: min over present pairs of
      // (smallest rank ≥ pos)
      var best = Int.MaxValue
      var j = 0
      val m = toks.size - 1
      while (j < m) {
        val ra = ranks.get(toks.get(j) + " " + toks.get(j + 1))
        if (ra != null) {
          val r = ceilRank(ra, pos)
          if (r < best) best = r
        }
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one greedy left-to-right pass of the rank-`best` pair
        val key = {
          // recover the pair at rank `best` from the present pairs
          var k = 0
          var found: String = null
          while (found == null && k < m) {
            val kk = toks.get(k) + " " + toks.get(k + 1)
            val ra = ranks.get(kk)
            if (ra != null && ceilRank(ra, pos) == best) found = kk
            k += 1
          }
          found
        }
        val sp = key.indexOf(' ')
        val l = key.substring(0, sp)
        val r = key.substring(sp + 1)
        var p = 0
        while (p < toks.size - 1) {
          if (toks.get(p) == l && toks.get(p + 1) == r) {
            toks.set(p, l + r)
            toks.remove(p + 1)
          }
          p += 1
        }
        pos = best + 1
      }
    }
    val out = new Array[Any](toks.size)
    var k = 0
    while (k < toks.size) {
      out(k) = UTF8String.fromString(toks.get(k)); k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native BPE encode with the WHOLE merge table inside ONE expression —
  * the production serving leg for deep tokenizer artifacts.
  *
  * [[graft.ops.Bpe.encodeSpaced]] builds one `replace` node per merge:
  * perfect for the differential gate (a SQL oracle replays the chain
  * literally) and fine to a few hundred merges, but a production
  * artifact has 30k+ merges and a 30k-deep expression tree breaks
  * codegen (method size limits, compile time) before it breaks
  * correctness. This expression holds the table as ONE plan-level
  * reference object and encodes each word by EXACTLY simulating the
  * learn-order replace chain with a pass pointer — see
  * [[BpeCodec.encode]] for the algorithm and for why the classic
  * lowest-rank-first loop would be subtly wrong. q283 gates it against
  * an oracle that replays the training chain itself; [[graft.BpeSpec]]
  * pins bit-identity against the literal chain at 300 merges.
  *
  * Null word → null. Codegen: one static call via a reference object —
  * the expression stays inside whole-stage codegen like [[NfcNormalize]].
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  @transient private lazy val table = BpeCodec.compile(merges)

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeCodec.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCodec.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Factory: validates the token alphabet eagerly (space-free
    * [a-z0-9]+ — the separator-safety contract) and wraps the
    * expression. Any table shape is otherwise legal: the encode is an
    * exact chain simulation, so duplicate pairs and cross-composed
    * token strings are handled, not assumed away.
    */
  def of(word: Column, merges: Seq[(String, String)]): Column = {
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
        s"merge tokens must be [a-z0-9]+, got '$l'/'$r' at rank $i")
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), merges))
  }
}
