package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native vector kernels for the similarity-search operators. The zip_with/
  * aggregate higher-order chains are interpreted per element; these run one
  * compiled loop per row and keep bit-identical double math (sequential
  * left-fold sums, floats widened to double — same as the HOF versions,
  * proven in SimilarityOpsSpec). */
object VectorKernel {

  /** Cosine similarity of two float arrays in double precision. Mismatched
    * lengths fold over the common prefix (never reads past either array). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Cosine of a float array against a prepared double centroid row. */
  private def cosineAgainst(emb: ArrayData, cent: Array[Double]): Double = {
    val n = math.min(emb.numElements(), cent.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = emb.getFloat(i).toDouble
      val y = cent(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** IVF assignment kernel: ids of the `nProbe` centroids nearest to `emb`
    * by cosine, ordered sim-desc with index-asc tie-break — one compiled
    * pass, replacing the corpus×centroids cross join + global window. */
  def nearestCentroids(emb: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData = {
    val k = cents.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) { sims(c) = cosineAgainst(emb, cents(c)); c += 1 }
    val keep = math.min(nProbe, k)
    val out = new Array[Int](keep)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < keep) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < k) {
        // NaN sims (zero vectors) rank last; ties keep the smaller index
        if (!taken(c) && (best == -1 || sims(c) > bestSim)) { best = c; bestSim = sims(c) }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Random-hyperplane signature: nBits sign bits of deterministic
    * pseudo-random projections. Plane component (bit, dim) replicates the
    * Column formula `(pmod(xxhash64(bit, dim), 1000003)/500001.5) - 1` —
    * xxhash64 folds seed 42 → int bit → int dim. */
  def rhpSig(emb: ArrayData, nBits: Int): Long = {
    val n = emb.numElements()
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val seedB = XXH64.hashInt(b, 42L)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val h = XXH64.hashInt(d, seedB)
        val plane = Math.floorMod(h, 1000003L).toDouble / 500001.5 - 1.0
        proj += emb.getFloat(d).toDouble * plane
        d += 1
      }
      if (proj > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class CosineSimF(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.graft.GraftExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def expectedInputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernel.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimF =
    copy(left = l, right = r)
}

case class NearestCentroids(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with org.apache.spark.sql.graft.GraftExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
  override def expectedInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorKernel.nearestCentroids(v.asInstanceOf[ArrayData], cents, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernel.nearestCentroids($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

case class RhpSig(child: Expression, nBits: Int) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def expectedInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorKernel.rhpSig(v.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernel.rhpSig($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)
}

object vector {
  import org.apache.spark.sql.graft.Bridge
  /** Cosine similarity of two float-array columns (double math). */
  def cosine_f(a: Column, b: Column): Column =
    Bridge.column(CosineSimF(Bridge.expression(a), Bridge.expression(b)))
  /** Random-hyperplane LSH signature of a float-array column. */
  def rhp_sig(c: Column, nBits: Int): Column =
    Bridge.column(RhpSig(Bridge.expression(c), nBits))
  /** Ids of the nProbe nearest centroids (cosine desc, index-asc ties). */
  def nearest_centroids(c: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(c), cents, nProbe))
}
