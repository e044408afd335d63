package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH bucket ids of a vector in ONE expression
  * node: element `t` of the result is table t's bucket — the sign bits of
  * `planes` signed projections packed into an int (bit p set iff
  * Σ_d v[d]·sign(t,p,d) ≥ 0).
  *
  * Exists for PLAN size, not per-row speed: the compositional form
  * (tables × planes separate [[DotProduct]] folds against literal ±1
  * weight arrays) builds an expression tree of tables·planes·dims nodes —
  * 8 192 at the production 16×8×64 operating point — whose whole-stage
  * codegen alone costs ~1.4 s per fresh JVM before any row moves, and
  * which grows linearly with the recall configuration. This node is O(1)
  * plan size at any (tables, planes, dims); the per-row work is identical.
  *
  * Semantics are bit-for-bit those of the compositional form: each
  * element widens to double and accumulates LEFT-TO-RIGHT (IEEE
  * sequential fold), signs come from the same splitmix64 mix of
  * (table, plane, dim) — [[HyperplaneBuckets.planeSign]] is the single
  * source of truth that `Similarity.planeSigns` also exposes to the
  * differential oracle as literal SQL weight arrays. CodegenFallback like
  * [[SimHash64]]: one interpreted call per row against tables·planes·dims
  * fused multiply-adds keeps the surrounding stage codegen'd while the
  * expression itself never inflates a generated method.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int,
                             dims: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val signs = HyperplaneBuckets.signMatrix(tables, planes, dims)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dims
        var acc = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          acc += x * signs(base + d)
          d += 1
        }
        if (acc >= 0) bucket |= 1 << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {

  /** Deterministic ±1 hyperplane weight: splitmix64-style mix of the
    * (table, plane, dim) triple — stable across JVMs and sessions. */
  def planeSign(table: Int, plane: Int, dim: Int): Int = {
    var z = table.toLong * 0x9e3779b97f4a7c15L + plane.toLong * 0xbf58476d1ce4e5b9L +
      dim.toLong * 0x94d049bb133111ebL + 0x2545f4914f6cdd1dL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1 else -1
  }

  /** Flat sign matrix indexed (t·planes + p)·dims + d, memoized per
    * configuration (computed at most once per JVM per config — a few KB). */
  private val matrices =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private[functions] def signMatrix(tables: Int, planes: Int, dims: Int): Array[Double] =
    matrices.computeIfAbsent((tables, planes, dims), { key =>
      val (t, p, d) = key
      val m = new Array[Double](t * p * d)
      var i = 0
      var ti = 0
      while (ti < t) {
        var pi = 0
        while (pi < p) {
          var di = 0
          while (di < d) {
            m(i) = planeSign(ti, pi, di).toDouble
            i += 1
            di += 1
          }
          pi += 1
        }
        ti += 1
      }
      m
    })

  /** Column API: `hyperplaneBuckets($"vec", tables, planes, dims)` —
    * array of per-table bucket ids (index = table). */
  def hyperplaneBuckets(c: Column, tables: Int, planes: Int, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(c), tables, planes, dims))
  }
}
