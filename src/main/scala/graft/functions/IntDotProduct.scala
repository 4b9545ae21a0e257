package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd EXACT integer dot product over two integral array columns —
  * the scorer for int8-quantized candidate generation
  * ([[graft.ops.Similarity.quantizedTopK]]). Every product and the running
  * sum are 64-bit integer operations: no rounding, no accumulation-order
  * sensitivity, so the score is bit-identical in any engine — unlike a
  * float dot, it can gate exact oracle comparisons and break ranking ties
  * without a rounding mask.
  *
  * Range contract: with int8-quantized inputs (|x| ≤ 127) the sum is
  * bounded by 127² · dims — overflow needs dims > 5.7e14, far past any
  * embedding width; inputs wider than int8 remain the caller's
  * responsibility.
  *
  * Null semantics: null input array → null; null *elements* read as 0.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot_product"

  private def integral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t, _) if integral(t) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral array inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private lazy val leftType = elementType(left).get
  private lazy val rightType = elementType(right).get

  private def get(a: ArrayData, i: Int, t: DataType): Long = t match {
    case LongType => a.getLong(i)
    case IntegerType => a.getInt(i).toLong
    case ShortType => a.getShort(i).toLong
    case ByteType => a.getByte(i).toLong
    case _ => a.get(i, t).asInstanceOf[Number].longValue()
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += get(a, i, leftType) * get(b, i, rightType)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  private def getterJava(t: DataType): String = t match {
    case LongType => "getLong"
    case IntegerType => "getInt"
    case ShortType => "getShort"
    case ByteType => "getByte"
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ga = getterJava(leftType)
    val gb = getterJava(rightType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.$ga($i) * (long) $b.$gb($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
