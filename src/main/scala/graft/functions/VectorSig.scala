package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Matrix-form vector expressions for the ANN family.
  *
  * Why matrix-form instead of N per-plane/per-centroid `dot_product`
  * columns: an expression tree with dozens of separate literal-array
  * dots generates code past the whole-stage-codegen size limit, so the
  * stage (a `GenerateExec` for the explode) falls back to INTERPRETED
  * tree evaluation — where every dot re-evaluates its own
  * `cast(embedding as array<double>)`, allocating a boxed 64-element
  * array per dot per row (~1 ms/row measured at sf0.1). One expression
  * holding the whole matrix does all the math in a single primitive
  * loop: interpreted eval is already tight JVM code, and the generated
  * code is one static call, so whole-stage codegen never bails.
  *
  * Both expressions take the matrix as a FOLDABLE array<array<double>>
  * literal child (evaluated once per JVM into primitive rows), keeping
  * them registrable as plain SQL functions.
  */
abstract class MatrixVectorExpression extends TernaryExpression {
  def vec: Expression
  def matrixExpr: Expression

  override def first: Expression = vec
  override def second: Expression = matrixExpr

  /** Matrix rows as primitive arrays; computed once per JVM. */
  @transient protected lazy val matrix: Array[Array[Double]] = {
    val ad = matrixExpr.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  protected def checkVecAndMatrix(): TypeCheckResult =
    (vec.dataType, matrixExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if matrixExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable array<array<double>>, int)")
    }
}

/** `hp_signatures(vec, planes, planesPerTable)` — all LSH hyperplane
  * bucket signatures in one pass. `planes` holds every table's planes
  * concatenated (tables × planesPerTable rows); returns one long bucket
  * per table: bit p of table t's bucket is set iff
  * dot(vec, planes[t*planesPerTable + p]) > 0.
  */
case class HyperplaneSignatures(vec: Expression, matrixExpr: Expression,
    planesPerTableExpr: Expression) extends MatrixVectorExpression {

  override def third: Expression = planesPerTableExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hp_signatures"

  @transient private lazy val planesPerTable: Int =
    planesPerTableExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecAndMatrix() match {
      case TypeCheckResult.TypeCheckSuccess
          if planesPerTableExpr.dataType == IntegerType &&
            planesPerTableExpr.foldable => TypeCheckResult.TypeCheckSuccess
      case TypeCheckResult.TypeCheckSuccess => TypeCheckResult.TypeCheckFailure(
        s"$prettyName third argument must be a foldable int")
      case f => f
    }

  def computeSigs(input: ArrayData): ArrayData = {
    val v = input.toDoubleArray()
    val tables = matrix.length / planesPerTable
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = matrix(t * planesPerTable + p)
        val n = math.min(v.length, plane.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v(i) * plane(i); i += 1 }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, m: Any, p: Any): Any =
    computeSigs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpSigs", this, classOf[HyperplaneSignatures].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $ref.computeSigs($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HyperplaneSignatures =
    copy(vec = newFirst, matrixExpr = newSecond, planesPerTableExpr = newThird)
}

/** `hp_probes(vec, planes, planesPerTable, nprobes)` — multi-probe LSH
  * bucket candidates: for each table, the base signature plus the
  * `nprobes - 1` signatures with the lowest-|margin| single bit flipped
  * (the planes the vector sits closest to — the buckets a true neighbor
  * most likely fell into; Lv et al.'s multi-probe LSH, single-bit
  * perturbations). Output length = tables × nprobes, ordered
  * [t0 base, t0 flip1, …, t1 base, …]: `pos div nprobes` is the table
  * id. With `nprobes = 1` this is exactly [[HyperplaneSignatures]].
  *
  * Why: at lake scale the plane count must grow with n to keep buckets
  * small (≈ log2(n/bucket)), which drives per-table collision
  * probability p^planes toward zero. Probing q buckets per table buys
  * back ≈ q tables' worth of recall at one table's signature cost —
  * the table count stops growing unboundedly with n.
  */
case class HyperplaneProbes(vec: Expression, matrixExpr: Expression,
    planesPerTableExpr: Expression, nprobesExpr: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = matrixExpr
  override def third: Expression = planesPerTableExpr
  override def fourth: Expression = nprobesExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hp_probes"

  @transient private lazy val matrix: Array[Array[Double]] = {
    val ad = matrixExpr.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val planesPerTable: Int =
    planesPerTableExpr.eval().asInstanceOf[Int]
  @transient private lazy val nprobes: Int =
    nprobesExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, matrixExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if matrixExpr.foldable &&
            planesPerTableExpr.dataType == IntegerType &&
            planesPerTableExpr.foldable &&
            nprobesExpr.dataType == IntegerType && nprobesExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable array<array<double>>, " +
          "foldable int, foldable int)")
    }

  def computeProbes(input: ArrayData): ArrayData = {
    val v = input.toDoubleArray()
    val tables = matrix.length / planesPerTable
    // base bucket + at most one flip per plane
    val q = math.max(1, math.min(nprobes, planesPerTable + 1))
    val out = new Array[Long](tables * q)
    val dots = new Array[Double](planesPerTable)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = matrix(t * planesPerTable + p)
        val n = math.min(v.length, plane.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v(i) * plane(i); i += 1 }
        dots(p) = s
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      out(t * q) = sig
      // q-1 smallest-|dot| planes by repeated scan (q is tiny)
      val used = new Array[Boolean](planesPerTable)
      var j = 1
      while (j < q) {
        var best = -1
        var bestAbs = Double.MaxValue
        var p2 = 0
        while (p2 < planesPerTable) {
          if (!used(p2) && math.abs(dots(p2)) < bestAbs) {
            bestAbs = math.abs(dots(p2)); best = p2
          }
          p2 += 1
        }
        used(best) = true
        out(t * q + j) = sig ^ (1L << best)
        j += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    computeProbes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpProbes", this, classOf[HyperplaneProbes].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => s"${ev.value} = $ref.computeProbes($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): HyperplaneProbes =
    copy(vec = newFirst, matrixExpr = newSecond,
      planesPerTableExpr = newThird, nprobesExpr = newFourth)
}

/** `nearest_cells(vec, centroids, nprobe)` — indices of the `nprobe`
  * centroids with the highest dot product against `vec`, best first
  * (ties → smaller index, so with centroids ordered by id the ranking
  * is deterministic). Index 0..nlist-1 IS the cell id downstream; the
  * whole scoring is one primitive loop per row — the broadcast-argmax
  * replacement for a crossJoin + row_number() window (two full shuffles
  * of n×nlist rows).
  */
case class NearestCells(vec: Expression, matrixExpr: Expression,
    nprobeExpr: Expression) extends MatrixVectorExpression {

  override def third: Expression = nprobeExpr
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val nprobe: Int = nprobeExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecAndMatrix() match {
      case TypeCheckResult.TypeCheckSuccess
          if nprobeExpr.dataType == IntegerType && nprobeExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case TypeCheckResult.TypeCheckSuccess => TypeCheckResult.TypeCheckFailure(
        s"$prettyName third argument must be a foldable int")
      case f => f
    }

  def computeCells(input: ArrayData): ArrayData = {
    val v = input.toDoubleArray()
    val k = math.min(nprobe, matrix.length)
    // top-k selection over nlist scores: nprobe is tiny (<=8), so an
    // insertion pass beats building/sorting the full score array.
    val bestSim = new Array[Double](k)
    val bestIdx = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val n = math.min(v.length, cent.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i) * cent(i); i += 1 }
      // find insertion point (sim desc, idx asc); idx asc is automatic
      // because candidates arrive in ascending index order and we only
      // displace on strictly-greater sim.
      if (filled < k || s > bestSim(k - 1)) {
        var pos = math.min(filled, k - 1)
        while (pos > 0 && s > bestSim(pos - 1)) {
          bestSim(pos) = bestSim(pos - 1)
          bestIdx(pos) = bestIdx(pos - 1)
          pos -= 1
        }
        bestSim(pos) = s
        bestIdx(pos) = c
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestIdx, filled))
  }

  override protected def nullSafeEval(v: Any, m: Any, p: Any): Any =
    computeCells(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $ref.computeCells($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCells =
    copy(vec = newFirst, matrixExpr = newSecond, nprobeExpr = newThird)
}

/** `nearest_cells_col(vec, matrixCol, nprobe)` — [[NearestCells]] against
  * a PER-ROW matrix column instead of a foldable plan literal.
  *
  * This is the level-2 scorer of hierarchical IVF: the full sub-centroid
  * model is Θ(n/targetCell) rows — too big to broadcast as a literal at
  * lake scale — so it stays a distributed table keyed by coarse cell and
  * JOINS to the vectors; each row then scores only its own coarse cell's
  * sub-matrix. Scoring reads the matrix through ArrayData accessors (no
  * per-row primitive materialization); cost per row is the same
  * O(cells × dim) loop as the foldable form.
  */
case class NearestCellsCol(vec: Expression, matrixExpr: Expression,
    nprobeExpr: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = matrixExpr
  override def third: Expression = nprobeExpr
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells_col"

  @transient private lazy val nprobe: Int = nprobeExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, matrixExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if nprobeExpr.dataType == IntegerType && nprobeExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>, foldable int)")
    }

  def computeCells(input: ArrayData, m: ArrayData): ArrayData = {
    val v = input.toDoubleArray()
    val ncells = m.numElements()
    val k = math.min(nprobe, ncells)
    val bestSim = new Array[Double](k)
    val bestIdx = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < ncells) {
      val cent = m.getArray(c)
      val n = math.min(v.length, cent.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i) * cent.getDouble(i); i += 1 }
      if (filled < k || s > bestSim(k - 1)) {
        var pos = math.min(filled, k - 1)
        while (pos > 0 && s > bestSim(pos - 1)) {
          bestSim(pos) = bestSim(pos - 1)
          bestIdx(pos) = bestIdx(pos - 1)
          pos -= 1
        }
        bestSim(pos) = s
        bestIdx(pos) = c
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestIdx, filled))
  }

  override protected def nullSafeEval(v: Any, m: Any, p: Any): Any =
    computeCells(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsCol", this, classOf[NearestCellsCol].getName)
    nullSafeCodeGen(ctx, ev, (v, m, _) => s"${ev.value} = $ref.computeCells($v, $m);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellsCol =
    copy(vec = newFirst, matrixExpr = newSecond, nprobeExpr = newThird)
}
