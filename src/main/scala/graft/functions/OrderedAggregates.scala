package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** First/last value by a two-part (ts, tie) order, as a HASH-AGGREGABLE
  * declarative aggregate.
  *
  * Spark's own `min_by(value, struct(ts, tie))` is semantically identical
  * but keeps the struct in its aggregation buffer, and a non-primitive
  * buffer field disqualifies the whole aggregate from `HashAggregateExec`
  * — the plan silently degrades to `SortAggregate`, inserting a
  * per-partition sort by group key that an OHLC rollup over 100 TB of
  * events would pay on every partial pass. This expression flattens the
  * buffer to four mutable primitives (set flag, ts, tie, value), so the
  * candle aggregate stays in the same whole-stage-codegen'd hash aggregate
  * as its `min`/`max`/`sum` neighbours (pinned by `PlanSpec`'s q73 test).
  *
  * Ordering: lexicographic on (ts, tie), both compared with Catalyst's
  * native comparisons — any orderable primitive type works (long millis,
  * TIMESTAMP, double). Rows whose ts or tie is NULL are ignored, like
  * `min_by`'s null-ordering rows. Ties beyond (ts, tie) cannot occur when
  * `tie` is unique; if it is not, the first-encountered row wins, which is
  * only deterministic for a total (ts, tie) order — same contract as the
  * rest of the engine. */
case class ExtremumByOrd(
    value: Expression,
    ts: Expression,
    tie: Expression,
    last: Boolean)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value, ts, tie)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType
  override def prettyName: String = if (last) "last_by_ord" else "first_by_ord"

  // update/merge expressions are only bound at physical planning, so an
  // unorderable order column would otherwise surface as a planner error —
  // check here to fail at ANALYSIS time like the other graft expressions
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    Seq("ts" -> ts, "tie" -> tie).collectFirst {
      case (name, e) if !RowOrdering.isOrderable(e.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName order column '$name' has unorderable type ${e.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  private lazy val bSet = AttributeReference("bSet", BooleanType, nullable = false)()
  private lazy val bTs = AttributeReference("bTs", ts.dataType)()
  private lazy val bTie = AttributeReference("bTie", tie.dataType)()
  private lazy val bVal = AttributeReference("bVal", value.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bSet, bTs, bTie, bVal)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(false),
    Literal.create(null, ts.dataType),
    Literal.create(null, tie.dataType),
    Literal.create(null, value.dataType))

  /** (nTs, nTie) should replace the (oSet, oTs, oTie) buffer. */
  private def beats(nTs: Expression, nTie: Expression,
      oSet: Expression, oTs: Expression, oTie: Expression): Expression = {
    val cmp =
      if (last) Or(GreaterThan(nTs, oTs), And(EqualTo(nTs, oTs), GreaterThan(nTie, oTie)))
      else Or(LessThan(nTs, oTs), And(EqualTo(nTs, oTs), LessThan(nTie, oTie)))
    Or(Not(oSet), cmp)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(And(IsNotNull(ts), IsNotNull(tie)),
      beats(ts, tie, bSet, bTs, bTie))
    Seq(
      If(take, Literal(true), bSet),
      If(take, ts, bTs),
      If(take, tie, bTie),
      If(take, value, bVal))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(bSet.right,
      beats(bTs.right, bTie.right, bSet.left, bTs.left, bTie.left))
    Seq(
      Or(bSet.left, bSet.right),
      If(take, bTs.right, bTs.left),
      If(take, bTie.right, bTie.left),
      If(take, bVal.right, bVal.left))
  }

  override lazy val evaluateExpression: Expression = bVal

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtremumByOrd =
    copy(value = newChildren(0), ts = newChildren(1), tie = newChildren(2))
}

/** Column-API entry points for the ordered-extremum aggregates. */
object OrderedAggregates {
  /** Value of the row with the smallest (ts, tie) — "open". */
  def firstByOrd(value: Column, ts: Column, tie: Column): Column =
    Bridge.column(ExtremumByOrd(Bridge.expression(value),
      Bridge.expression(ts), Bridge.expression(tie), last = false)
      .toAggregateExpression())

  /** Value of the row with the largest (ts, tie) — "close". */
  def lastByOrd(value: Column, ts: Column, tie: Column): Column =
    Bridge.column(ExtremumByOrd(Bridge.expression(value),
      Bridge.expression(ts), Bridge.expression(tie), last = true)
      .toAggregateExpression())
}
