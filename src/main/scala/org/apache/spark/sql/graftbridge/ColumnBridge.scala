package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (needed to expose
  * a custom Catalyst expression as a user-facing Column in Spark 4, where
  * Column wraps a ColumnNode rather than an Expression).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge from a user-facing predicate Column to a small neutral AST the
  * lake planner ([[graft.sources.Lake]]) can evaluate against per-file
  * column stats. In Spark 4 a Column wraps a ColumnNode tree
  * (`org.apache.spark.sql.internal`) whose comparison nodes are
  * by-NAME UnresolvedFunctions ("=", "<", "in", …) — this walks that
  * tree, folding literals (and casts-of-literals, e.g. the
  * `lit("1996-01-01").cast("timestamp")` idiom, evaluated under the
  * session time zone) to Catalyst-internal values. Anything outside the
  * translatable core maps to [[PredBridge.Opaque]], which the consumer
  * must treat as "cannot prune" — inclusive semantics stay safe by
  * construction.
  */
object PredBridge {
  import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, Literal => CLit}
  import org.apache.spark.sql.{internal => n}
  import org.apache.spark.sql.types.DataType

  sealed trait Node
  case class Fn(name: String, args: Seq[Node]) extends Node
  case class Attr(name: String) extends Node
  /** `value` is the CATALYST-INTERNAL representation (UTF8String for
    * strings, Long micros for timestamps, Int days for dates).
    */
  case class Lit(value: Any, dataType: DataType) extends Node
  case object Opaque extends Node

  def tree(c: Column): Node = walk(c.node)

  /** A catalyst literal for a plain Scala value — type inference
    * included (the erasure-candidacy entry point).
    */
  def litNode(v: Any): Lit = {
    val l = CLit(v)
    Lit(l.value, l.dataType)
  }

  private def walk(node: n.ColumnNode): Node = node match {
    case f: n.UnresolvedFunction if !f.isDistinct =>
      Fn(f.functionName, f.arguments.map(walk))
    case a: n.UnresolvedAttribute => Attr(a.nameParts.mkString("."))
    case other => fold(other).getOrElse(Opaque)
  }

  /** Fold a literal-valued subtree (literal, or cast-of-literal chains)
    * to its catalyst value. ANSI cast failures and un-foldable shapes
    * yield None.
    */
  private def fold(node: n.ColumnNode): Option[Lit] = node match {
    case l: n.Literal =>
      scala.util.Try {
        val cl = l.dataType.map(dt => CLit.create(l.value, dt))
          .getOrElse(CLit(l.value))
        Lit(cl.value, cl.dataType)
      }.toOption
    case c: n.Cast =>
      fold(c.child).flatMap { chl =>
        scala.util.Try {
          val zone = org.apache.spark.sql.internal.SQLConf.get
            .sessionLocalTimeZone
          val cast = CCast(CLit.create(chl.value, chl.dataType),
            c.dataType, Option(zone))
          Lit(cast.eval(null), cast.dataType)
        }.toOption
      }
    case _ => None
  }
}
