package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd Jaccard similarity of two atomic-type array columns, treating
  * each side as a set (duplicates ignored — same semantics as
  * `size(array_intersect(a,b)) / size(array_union(a,b))`, and bit-identical
  * to that formulation since both reduce to the same integer division).
  *
  * One pass, one hash set per side, no intermediate array materialization —
  * on pairwise-similarity joins this replaces two O(n+m) array builds plus
  * two size scans per candidate pair.
  *
  * Null array → null; empty union → null (divide-by-zero guard); null
  * elements are ignored (matching array_intersect/array_union, which treat
  * null elements as regular values only when present in both — the engine's
  * shingle arrays never contain nulls).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_similarity"

  private def isAtomic(t: DataType): Boolean = t match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         BooleanType | DoubleType | FloatType | DateType | TimestampType => true
    case _ => false
  }

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t, _) if isAtomic(t) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same atomic type, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  @transient private lazy val et: DataType = elemType(left).get

  private def elem(a: ArrayData, i: Int): Any = et match {
    case StringType => a.getUTF8String(i)
    case LongType => java.lang.Long.valueOf(a.getLong(i))
    case IntegerType => java.lang.Integer.valueOf(a.getInt(i))
    case _ => a.get(i, et)
  }

  /** Shared by eval and the generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val seen = new java.util.HashSet[Any]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) seen.add(elem(a, i))
      i += 1
    }
    val na = seen.size()
    var inter = 0
    var nb = 0
    val seenB = new java.util.HashSet[Any]()
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val v = elem(b, i)
        if (seenB.add(v)) {
          nb += 1
          if (seen.contains(v)) inter += 1
        }
      }
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) null
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("jaccardExpr", this, classOf[JaccardSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val result = ctx.freshName("jac")
      s"""
         |java.lang.Double $result = $expr.compute($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}
