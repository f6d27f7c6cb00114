package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<double>`
  * columns, with `doGenCode` so they run INSIDE whole-stage codegen.
  *
  * Why these exist: Spark's higher-order functions (`transform` /
  * `zip_with` / `aggregate`) are interpreted per row — a lambda closure
  * evaluates per element outside codegen, measured ~10x slower than a
  * compiled loop on this repo's embedding workloads (see README and the
  * round-1 bench: the two slowest queries were exactly the two HOF plans).
  * A tight generated `for` loop over `ArrayData` is the Spark-idiomatic
  * scale path for per-row O(dim) kernels: no shuffle, no UDF boxing, no
  * closure dispatch.
  *
  * Numeric parity: each loop accumulates left-to-right exactly like the
  * sequential `aggregate` folds it replaces, so results are bit-identical
  * to the round-1 HOF forms (same IEEE op order).
  */
object VectorExpressions {

  /** Shared input check: every child must be array<elem> (nullability
    * ignored). `AbstractDataType`/`ExpectsInputTypes` are private[sql] in
    * Spark 4, so the check is spelled out here. */
  private def checkArrays(e: Expression, elem: DataType,
                          children: Expression*): TypeCheckResult = {
    val bad = children.find {
      c => !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != elem
    }
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"${e.prettyName} expects array<${elem.simpleString}> inputs, " +
          s"got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Dot product of two array<double> columns. Sequential accumulation —
    * deterministic summation order. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, DoubleType, left, right)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
        final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity in ONE pass: dot, |a|^2 and |b|^2 accumulate in the
    * same loop (the three-fold HOF form scanned both arrays three times). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, DoubleType, left, right)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        d += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val d = ctx.freshName("d"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
        final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $d = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $xv = $x.getDouble($i);
          final double $yv = $y.getDouble($i);
          $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        ${ev.value} =
          $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane LSH bucket id: bit p of the result = sign of the
    * projection onto plane p, planes derived deterministically as
    * sin(k + 1) over the flattened (plane, component) index — identical
    * to the round-1 column form, now a single generated nested loop with
    * the plane table precomputed once on the driver and shipped as a
    * codegen reference object (the HOF form recomputed sin per element
    * per row). */
  case class LshBucket(child: Expression, dim: Int, nPlanes: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, DoubleType, child)
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_lsh_bucket"

    private lazy val planes: Array[Double] =
      Array.tabulate(nPlanes * dim)(k => math.sin(k + 1.0))

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      var bucket = 0L; var p = 0
      while (p < nPlanes) {
        var proj = 0.0; var j = 0
        while (j < n) { proj += v.getDouble(j) * planes(p * dim + j); j += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val p = ctx.freshName("p")
        val j = ctx.freshName("j"); val proj = ctx.freshName("proj")
        val bucket = ctx.freshName("bucket")
        s"""
        final int $n = java.lang.Math.min($v.numElements(), $dim);
        long $bucket = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          double $proj = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            $proj += $v.getDouble($j) * $tbl[$p * $dim + $j];
          }
          if ($proj >= 0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
        """
      })
    }

    override protected def withNewChildInternal(
        newChild: Expression): LshBucket = copy(child = newChild)
  }

  /** Johnson–Lindenstrauss projection onto `rDim` fixed pseudo-random
    * directions: out[r] = Σ_i v[i]·sin(r·dim + i + 1) — the direction
    * family of [[LshBucket]] (direction r = plane r), precomputed once
    * on the driver and shipped as a codegen reference object. Replaces
    * the per-direction `aggregate(zip_with(...))` HOF form, which ran
    * rDim interpreted element-wise folds per row in the scan-riding hot
    * path (~10x the compiled loop; the module's standing measurement).
    * Accumulation is left-to-right per direction — bit-identical to the
    * sequential HOF fold it replaces. Inputs shorter than `dim`
    * truncate the sum at the input length (the DotProduct min-length
    * rule; well-formed corpora always carry exactly `dim`). */
  case class RandomProject(child: Expression, dim: Int, rDim: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, DoubleType, child)
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_random_project"

    private lazy val dirs: Array[Double] =
      Array.tabulate(rDim * dim)(k => math.sin(k + 1.0))

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      val out = new Array[Double](rDim)
      var r = 0
      while (r < rDim) {
        var s = 0.0; var i = 0
        while (i < n) { s += v.getDouble(i) * dirs(r * dim + i); i += 1 }
        out(r) = s; r += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("rpDirs", dirs, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val r = ctx.freshName("r")
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val out = ctx.freshName("out")
        s"""
        final int $n = java.lang.Math.min($v.numElements(), $dim);
        final double[] $out = new double[$rDim];
        for (int $r = 0; $r < $rDim; $r++) {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += $v.getDouble($i) * $tbl[$r * $dim + $i];
          }
          $out[$r] = $s;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    }

    override protected def withNewChildInternal(
        newChild: Expression): RandomProject = copy(child = newChild)
  }

  /** Householder reflection of an array<double> vector:
    * out = v − (2·(u·v)/(u·u))·u for a FIXED reflection vector `u`
    * (driver-computed, shipped once as a codegen reference object).
    * An orthogonal transform — pairwise L2 distances are preserved to
    * fp round-off — used as the OPQ-lite rotation that maps the corpus'
    * top principal direction onto the first coordinate axis before the
    * PQ subspace split (Gé et al. 2013 "Optimized Product
    * Quantization" motivates rotating before quantizing; with the
    * repo's single staged PCA direction the one-reflection alignment is
    * the expressible slice of that idea). Empty `u` (the
    * already-aligned degenerate case) makes this the identity.
    * Accumulation and subtraction are left-to-right per element —
    * deterministic, interpreted/codegen identical. */
  case class HouseholderRotate(child: Expression, u: Array[Double])
      extends UnaryExpression {
    // uu is embedded into the generated Java as a text literal — a
    // NaN/Infinity component would interpolate as 'NaND'/'InfinityD'
    // and fail Janino at runtime, far from the bad input. Reject the
    // vector at construction instead (a reflection vector is driver
    // fit output; a non-finite component is always an upstream bug).
    require(u.forall(java.lang.Double.isFinite),
      "HouseholderRotate: reflection vector must be finite")
    // ...and the SUM of squares can overflow for extreme finite
    // magnitudes. Guarding here (not in doGenCode) keeps interpreted
    // and codegen evaluation consistent: unguarded, nullSafeEval would
    // silently compute with uu = Infinity (all-NaN rotations) while
    // codegen failed loudly at Janino — violating the expression's own
    // interpreted/codegen-identical contract.
    require(java.lang.Double.isFinite(uu),
      "HouseholderRotate: |u|^2 overflows double")
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, DoubleType, child)
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_householder"

    // value-equality over the reflection vector so two identical
    // rotations canonicalize together (the PqEncodeSig rule)
    override def equals(o: Any): Boolean = o match {
      case h: HouseholderRotate =>
        (h.child == child) && java.util.Arrays.equals(h.u, u)
      case _ => false
    }
    override def hashCode(): Int =
      31 * child.hashCode() + java.util.Arrays.hashCode(u)

    private lazy val uu: Double = { // left-to-right, like the codegen loop
      var s = 0.0; var i = 0
      while (i < u.length) { s += u(i) * u(i); i += 1 }
      s
    }

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      if (u.length == 0 || uu == 0.0) return v.copy()
      val m = math.min(n, u.length)
      var s = 0.0; var i = 0
      while (i < m) { s += u(i) * v.getDouble(i); i += 1 }
      val c = 2.0 * s / uu
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = if (i < m) v.getDouble(i) - c * u(i) else v.getDouble(i)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("houseU", u, "double[]")
      val uuRef = uu // finite by the constructor requires — safe to
      // embed as a JVM double literal via string interp below
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val c = ctx.freshName("c"); val out = ctx.freshName("out")
        s"""
        final int $n = $v.numElements();
        final int $m = java.lang.Math.min($n, $tbl.length);
        final double[] $out = new double[$n];
        if ($tbl.length == 0 || ${uuRef}D == 0.0D) {
          for (int $i = 0; $i < $n; $i++) $out[$i] = $v.getDouble($i);
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $m; $i++) {
            $s += $tbl[$i] * $v.getDouble($i);
          }
          final double $c = 2.0D * $s / ${uuRef}D;
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = $i < $m
              ? $v.getDouble($i) - $c * $tbl[$i] : $v.getDouble($i);
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    }

    override protected def withNewChildInternal(
        newChild: Expression): HouseholderRotate = copy(child = newChild)
  }

  /** Count of positions where two array<long> columns hold equal values
    * (over the shorter length) — the MinHash signature-agreement kernel.
    * Replaces `size(filter(zip_with(a, b, _ === _), identity))`, which
    * materialized an intermediate boolean array per pair in interpreted
    * mode. */
  case class ArrayEqCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays(this, LongType, left, right)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "array_eq_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var c = 0; var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
      c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
        final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        int $c = 0;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.getLong($i) == $y.getLong($i)) $c++;
        }
        ${ev.value} = $c;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArrayEqCount =
      copy(left = newLeft, right = newRight)
  }
}
