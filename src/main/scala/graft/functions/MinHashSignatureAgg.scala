package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a k-wide MinHash signature from a group of
  * element hashes (e.g. `xxhash64(shingle)` rows after an explode).
  *
  * Same hash family as [[graft.functions.minhash]] — per-seed
  * `xxhash64(seed, h)` — reproduced here through Spark's XXH64 primitives,
  * so the typed path and the Column-expression path produce identical
  * signatures (asserted in ExpressionSpec).
  *
  * Usage (typed API):
  * {{{
  *   val sigs = shingleHashes                       // Dataset[(Long, Long)]
  *     .groupByKey(_._1)
  *     .agg(new MinHashSignatureAgg(16).toColumn)
  * }}}
  *
  * The buffer is a fixed-width Array[Long]; merge is elementwise min, so
  * the aggregation is commutative + associative → map-side partials work.
  */
class MinHashSignatureAgg(numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  // per-seed intermediate of Spark's xxhash64(lit(seed), h): the literal is
  // folded into the running seed first, then the element hash is chained
  private val seeds = Array.tabulate(numHashes)(k =>
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L))

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val h = in._2
    var k = 0
    while (k < numHashes) {
      val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, seeds(k))
      if (v < buf(k)) buf(k) = v
      k += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Estimated Jaccard from two MinHash signatures (fraction of agreeing
  * positions) — companion to [[MinHashSignatureAgg]] for signature-level
  * similarity without the original shingle sets.
  */
object MinHashSignatureAgg {
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "signature widths differ")
    if (a.isEmpty) return 0.0
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }
}
