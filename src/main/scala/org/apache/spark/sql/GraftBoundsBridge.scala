package org.apache.spark.sql

import graft.catalog.{ColBounds, DataFileEntry, Manifests}
import org.apache.spark.sql.internal.{ColumnNode, UnresolvedFunction, UnresolvedAttribute, Literal => NodeLit}

/** Conservative bounds evaluator over the Spark 4 unified Column API's
  * node tree: `col("a") === 1` builds `UnresolvedFunction("=", attr,
  * literal)` — NOT a catalyst `EqualTo` — and the node classes are
  * `private[sql]`, so the walker lives in this package (the same
  * extension-point pattern as [[GraftSqlBridge]]). SQL-text conditions
  * (`functions.expr(...)`) arrive as an ExpressionColumnNode wrapping a
  * parsed catalyst tree and route to [[Manifests.mayMatch]].
  *
  * Contract mirrors [[Manifests.mayMatch]]: TRUE unless the entry's
  * bounds PROVE no row of the file can satisfy the predicate; any
  * unrecognized shape keeps the file.
  */
object GraftBoundsBridge {

  def mayMatchColumn(c: Column, entry: DataFileEntry): Boolean =
    mayMatchNode(c.node, entry)

  /** `functions.expr("…")` builds a LAZY [[internal.SqlExpression]] node
    * (text, unparsed until plan attachment) — parse it here so SQL-text
    * conditions prune exactly like Column-built ones. Unparseable text
    * keeps every file (the conservative default).
    */
  private def parsedSql(s: internal.SqlExpression)
    : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    try Some(org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s.expression))
    catch { case scala.util.control.NonFatal(_) => None }

  private def mayMatchNode(node: ColumnNode, entry: DataFileEntry): Boolean =
    node match {
      case e: classic.ExpressionColumnNode =>
        Manifests.mayMatch(e.expression, entry)
      case s: internal.SqlExpression =>
        parsedSql(s).forall(Manifests.mayMatch(_, entry))
      case l: NodeLit => l.value match {
        case b: Boolean => b
        case _ => true
      }
      case f: UnresolvedFunction =>
        val args = f.arguments
        def bin(cmp: (ColBounds, Any) => Boolean): Boolean = args match {
          case Seq(a, l: NodeLit) =>
            nodeColBounds(a, entry).forall(cb =>
              Manifests.nodeLiteralIn(cb, l.value).forall(v => cmp(cb, v)))
          case _ => true
        }
        def binRev(cmp: (ColBounds, Any) => Boolean): Boolean = args match {
          case Seq(l: NodeLit, a) =>
            nodeColBounds(a, entry).forall(cb =>
              Manifests.nodeLiteralIn(cb, l.value).forall(v => cmp(cb, v)))
          case _ => true
        }
        f.functionName match {
          case "and" => args.forall(mayMatchNode(_, entry))
          case "or"  => args.exists(mayMatchNode(_, entry))
          case "coalesce" if args.length == 2 => args(1) match {
            case l: NodeLit if l.value == false => mayMatchNode(args(0), entry)
            case _ => true
          }
          case "=" | "==" | "<=>" =>
            bin(Manifests.eqContains(_, _, entry)) &&
              binRev(Manifests.eqContains(_, _, entry))
          case ">"  => bin(Manifests.boundAbove(_, _, strict = true)) &&
            binRev(Manifests.boundBelow(_, _, strict = true))
          case ">=" => bin(Manifests.boundAbove(_, _, strict = false)) &&
            binRev(Manifests.boundBelow(_, _, strict = false))
          case "<"  => bin(Manifests.boundBelow(_, _, strict = true)) &&
            binRev(Manifests.boundAbove(_, _, strict = true))
          case "<=" => bin(Manifests.boundBelow(_, _, strict = false)) &&
            binRev(Manifests.boundAbove(_, _, strict = false))
          case "in" if args.length >= 2 && args.tail.forall(_.isInstanceOf[NodeLit]) =>
            nodeColBounds(args.head, entry).forall(cb =>
              args.tail.exists {
                case l: NodeLit =>
                  Manifests.nodeLiteralIn(cb, l.value)
                    .forall(v => Manifests.eqContains(cb, v, entry))
                case _ => true
              })
          case "isNull" | "isnull" => args match {
            case Seq(a) => nodeColBounds(a, entry).forall(_.nulls != 0L)
            case _ => true
          }
          case "isNotNull" | "isnotnull" => args match {
            case Seq(a) => nodeColBounds(a, entry).forall(cb =>
              cb.nulls < 0 || cb.nulls < entry.rows || cb.min != null)
            case _ => true
          }
          case _ => true
        }
      case _ => true
    }

  /** Single-part attribute names ONLY — a multi-part reference
    * (`t.col`, nested `meta.ts`) must never bind by its last part: it
    * could alias a different top-level column and (in the mustMatch
    * walker) yield a false totality proof that drops live rows. See
    * Manifests.colName for the same rule on the catalyst side.
    */
  private def nodeColBounds(n: ColumnNode, entry: DataFileEntry): Option[ColBounds] =
    n match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Manifests.boundsFor(entry, a.nameParts.head)
      case _ => None
    }

  /** Dual of [[mayMatchColumn]] (see [[Manifests.mustMatch]] for the
    * proof rules): TRUE only when bounds PROVE every row of the file
    * satisfies the predicate. Default FALSE for any unrecognized shape.
    */
  def mustMatchColumn(c: Column, entry: DataFileEntry): Boolean =
    mustMatchNode(c.node, entry)

  private def mustMatchNode(node: ColumnNode, entry: DataFileEntry): Boolean =
    node match {
      case e: classic.ExpressionColumnNode =>
        Manifests.mustMatch(e.expression, entry)
      case s: internal.SqlExpression =>
        parsedSql(s).exists(Manifests.mustMatch(_, entry))
      case l: NodeLit => l.value == true
      case f: UnresolvedFunction =>
        val args = f.arguments
        def tot(check: (ColBounds, Any, Any) => Boolean): Boolean = args match {
          case Seq(a, l: NodeLit) if l.value != null =>
            nodeColBounds(a, entry).exists(cb =>
              Manifests.totalityGate(cb) &&
                Manifests.nodeLiteralIn(cb, l.value).exists(v => check(cb, v, entry)))
          case _ => false
        }
        def totRev(check: (ColBounds, Any, Any) => Boolean): Boolean = args match {
          case Seq(l: NodeLit, a) if l.value != null =>
            nodeColBounds(a, entry).exists(cb =>
              Manifests.totalityGate(cb) &&
                Manifests.nodeLiteralIn(cb, l.value).exists(v => check(cb, v, entry)))
          case _ => false
        }
        f.functionName match {
          case "and" => args.nonEmpty && args.forall(mustMatchNode(_, entry))
          case "or"  => args.exists(mustMatchNode(_, entry))
          case "coalesce" if args.length == 2 => args(1) match {
            case l: NodeLit if l.value == false => mustMatchNode(args(0), entry)
            case _ => false
          }
          case "=" | "==" =>
            tot((cb, v, _) => Manifests.allWithin(cb, v, v)) ||
              totRev((cb, v, _) => Manifests.allWithin(cb, v, v))
          case ">"  => tot((cb, v, _) => Manifests.minCmp(cb, v) > 0) ||
            totRev((cb, v, _) => Manifests.maxCmp(cb, v) < 0)
          case ">=" => tot((cb, v, _) => Manifests.minCmp(cb, v) >= 0) ||
            totRev((cb, v, _) => Manifests.maxCmp(cb, v) <= 0)
          case "<"  => tot((cb, v, _) => Manifests.maxCmp(cb, v) < 0) ||
            totRev((cb, v, _) => Manifests.minCmp(cb, v) > 0)
          case "<=" => tot((cb, v, _) => Manifests.maxCmp(cb, v) <= 0) ||
            totRev((cb, v, _) => Manifests.minCmp(cb, v) >= 0)
          case "isNotNull" | "isnotnull" => args match {
            case Seq(a) => nodeColBounds(a, entry).exists(_.nulls == 0L)
            case _ => false
          }
          case "isNull" | "isnull" => args match {
            case Seq(a) => nodeColBounds(a, entry).exists(cb =>
              cb.nulls >= 0 && cb.nulls == entry.rows)
            case _ => false
          }
          case _ => false
        }
      case _ => false
    }

  /** TOP-LEVEL conjunct equality comparisons `(column, user-space value)`
    * of a predicate — what partition-transform projection may strengthen
    * (an equality under an OR is NOT returned: augmenting from it would
    * over-prune). Values normalize to user space (UTF8String → String,
    * date days → LocalDate, timestamp micros → Instant) so transform
    * `deriveValue` implementations see one representation.
    */
  def conjunctEqualities(c: Column): Seq[(String, Any)] = nodeConj(c.node)

  /** [[conjunctEqualities]] over an already-resolved catalyst predicate —
    * what a FileIndex receives as pushed-down data filters.
    */
  def conjunctEqualitiesExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[(String, Any)] =
    catalystConj(e)

  private def nodeConj(n: ColumnNode): Seq[(String, Any)] = n match {
    case f: UnresolvedFunction => f.functionName match {
      case "and" => f.arguments.flatMap(nodeConj)
      case "coalesce" if f.arguments.length == 2 => f.arguments(1) match {
        case l: NodeLit if l.value == false => nodeConj(f.arguments(0))
        case _ => Nil
      }
      case "=" | "==" => f.arguments match {
        // single-part names only: a nested/qualified reference binding by
        // its last part could augment partition pruning from the WRONG
        // column (same hazard as nodeColBounds)
        case Seq(a: UnresolvedAttribute, l: NodeLit)
            if l.value != null && a.nameParts.length == 1 =>
          Seq((a.nameParts.head, l.value))
        case Seq(l: NodeLit, a: UnresolvedAttribute)
            if l.value != null && a.nameParts.length == 1 =>
          Seq((a.nameParts.head, l.value))
        case _ => Nil
      }
      case _ => Nil
    }
    case e: classic.ExpressionColumnNode => catalystConj(e.expression)
    case s: internal.SqlExpression => parsedSql(s).map(catalystConj).getOrElse(Nil)
    case _ => Nil
  }

  private def catalystConj(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[(String, Any)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => CatAttr}
    def name(x: Expression): Option[String] = x match {
      case a: CatAttr if a.nameParts.length == 1 => Some(a.nameParts.head)
      case a: AttributeReference  => Some(a.name)
      case _ => None
    }
    def user(v: Any, dt: org.apache.spark.sql.types.DataType): Any = (v, dt) match {
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case (days: Int, org.apache.spark.sql.types.DateType) =>
        java.time.LocalDate.ofEpochDay(days.toLong)
      case (micros: Long, org.apache.spark.sql.types.TimestampType |
                          org.apache.spark.sql.types.TimestampNTZType) =>
        java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(micros, 1000000L),
          java.lang.Math.floorMod(micros, 1000000L) * 1000L)
      case (other, _) => other
    }
    e match {
      case And(l, r) => catalystConj(l) ++ catalystConj(r)
      case Coalesce(Seq(x, Literal.FalseLiteral)) => catalystConj(x)
      case EqualTo(a, Literal(v, dt)) if v != null =>
        name(a).map(n => (n, user(v, dt))).toSeq
      case EqualTo(Literal(v, dt), a) if v != null =>
        name(a).map(n => (n, user(v, dt))).toSeq
      case _ => Nil
    }
  }
}
