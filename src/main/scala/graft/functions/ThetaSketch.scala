package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.{Bridge, GraftExpectsInputTypes}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch aggregation state: raw updates accumulate in an
  * [[UpdateSketch]]; the first merge promotes to a [[SetOperation]] Union.
  * Spark's TypedImperativeAggregate contract keeps the two phases disjoint
  * (update() only ever runs on buffers born from createAggregationBuffer;
  * deserialized buffers only ever feed merge()), so one small mutable
  * holder covers both. */
private[functions] final class ThetaBuf(val lgK: Int) {
  private var upd: UpdateSketch = null
  private var uni: org.apache.datasketches.theta.Union = null
  private var payload: Sketch = null // deserialized compact, merge input only

  def update(s: UTF8String): Unit = {
    if (upd == null)
      upd = UpdateSketch.builder().setLogNominalEntries(lgK).build()
    // hash the UTF-8 bytes (same content hash as update(String))
    upd.update(s.getBytes)
  }

  def absorb(other: ThetaBuf): Unit = {
    if (uni == null) {
      uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      if (upd != null) { uni.union(upd.compact(true, null)); upd = null }
      if (payload != null) { uni.union(payload); payload = null }
    }
    uni.union(other.result)
  }

  private[functions] def setPayload(s: Sketch): Unit = { payload = s }

  /** Canonical (ordered, on-heap) compact form of the current state. */
  def result: CompactSketch = {
    if (uni != null) {
      if (upd != null) { uni.union(upd.compact(true, null)); upd = null }
      uni.getResult(true, null)
    } else if (upd != null) upd.compact(true, null)
    else if (payload != null) payload.compact(true, null)
    else UpdateSketch.builder().setLogNominalEntries(lgK).build()
      .compact(true, null)
  }
}

private[functions] object ThetaBuf {
  def fromBytes(lgK: Int, bytes: Array[Byte]): ThetaBuf = {
    val b = new ThetaBuf(lgK)
    b.setPayload(Sketches.heapifySketch(Memory.wrap(bytes)))
    b
  }
}

/** Theta distinct-counting sketch of a string column — the KMV
  * generalization HLL cannot match where it counts most: theta sketches
  * close under UNION, INTERSECTION, and DIFFERENCE with per-result error
  * bounds, so retained/new/churned audiences come from real set operators
  * instead of inclusion–exclusion error stacking. Below 2^lgK distinct
  * members the sketch is in EXACT mode (every hash retained — estimates
  * are exact counts), which is also what makes the spec against the exact
  * q119 meaningful. Mergeable, insertion-order-independent (the retained
  * set is the k smallest hashes — a pure set property), partial+final
  * hash-aggregated like any native aggregate. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuf] with GraftExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def expectedInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): ThetaBuf = new ThetaBuf(lgK)
  override def update(b: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String])
    b
  }
  override def merge(b: ThetaBuf, other: ThetaBuf): ThetaBuf = {
    b.absorb(other); b
  }
  override def eval(b: ThetaBuf): Any = b.result.toByteArray
  override def serialize(b: ThetaBuf): Array[Byte] = b.result.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaBuf =
    ThetaBuf.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0))
}

/** Rounded distinct estimate of a serialized theta sketch. Interpreted
  * eval (CodegenFallback) by design: these run at SKETCH granularity —
  * one row per (key, period) blob, never per event. */
case class ThetaEstimate(child: Expression) extends UnaryExpression
    with GraftExpectsInputTypes with CodegenFallback {
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(v: Any): Any =
    Math.round(Sketches.heapifySketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Binary theta set operation over two serialized sketches → serialized
  * compact result. `op`: 0 = union, 1 = intersection, 2 = A-and-not-B. */
case class ThetaSetOp(left: Expression, right: Expression, op: Int, lgK: Int)
    extends BinaryExpression with GraftExpectsInputTypes with CodegenFallback {
  require(op >= 0 && op <= 2, s"op must be 0 (union), 1 (intersect), 2 (anotb); got $op")
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    op match { case 0 => "theta_union"; case 1 => "theta_intersect"; case _ => "theta_anotb" }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketches.heapifySketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketches.heapifySketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    val out: CompactSketch = op match {
      case 0 => SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        .union(a, b, true, null)
      case 1 => SetOperation.builder().buildIntersection().intersect(a, b)
      case _ =>
        val an = SetOperation.builder().buildANotB()
        an.setA(a); an.notB(b); an.getResult(true)
    }
    out.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the theta-sketch family. */
object ThetaSketches {
  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK).toAggregateExpression())
  def theta_estimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))
  def theta_union(a: Column, b: Column, lgK: Int = 12): Column =
    Bridge.column(ThetaSetOp(Bridge.expression(a), Bridge.expression(b), 0, lgK))
  def theta_intersect(a: Column, b: Column): Column =
    Bridge.column(ThetaSetOp(Bridge.expression(a), Bridge.expression(b), 1, 12))
  def theta_anotb(a: Column, b: Column): Column =
    Bridge.column(ThetaSetOp(Bridge.expression(a), Bridge.expression(b), 2, 12))
}
