package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Input-type guards for the fused kernels: the definitional Column formulations accepted any
  * numeric element type through SQL widening, but the kernels read raw array slots — an int
  * array through getDouble would be silently-wrong bytes, so reject non-float/double elements
  * at ANALYSIS time instead of computing garbage.
  */
private[functions] object KernelTypeCheck {
  def vector(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float> or array<double> input, got ${other.catalogString}" +
        " (cast the elements explicitly; integer arrays are not supported by the fused kernel)")
  }
  def elem(name: String, dt: DataType, want: DataType): TypeCheckResult = dt match {
    case ArrayType(e, _) if e == want => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<${want.catalogString}> input, got ${other.catalogString}")
  }
}

/** Single-pass MinHash signature kernel.
  *
  * The Column formulation — `array((0 until k).map(i => array_min(transform(h48s, affine_i))))` —
  * is a performance trap at the other end of the pipeline from the r03 shingle fix:
  * higher-order functions (`transform`/`array_min` lambdas) do NOT participate in whole-stage
  * codegen; each of the k passes walks the shingle array through interpreted, boxed evaluation
  * and allocates an intermediate array. Measured at sf0.1: the 32-pass signature was ~4 s of
  * q09's ~5 s warm runtime — ~430 ns per (shingle, permutation) op. This kernel computes all k
  * running minima in ONE unboxed pass (plain JVM loops, ~2 ns/op), invoked from a codegen'd
  * Catalyst expression so rows never leave the generated pipeline.
  */
object Minhash {

  /** Max supported signature width (size of the precomputed affine-family tables). */
  val MaxK = 4096
  // affine family tables, shared with the SQL-portable definition in [[Dedup]]
  private lazy val As: Array[Long] = Array.tabulate(MaxK)(Dedup.affineA)
  private lazy val Bs: Array[Long] = Array.tabulate(MaxK)(Dedup.affineB)

  /** sig[i] = min over non-null h of (h·a_i + b_i) mod 2^48 — identical semantics to
    * `array_min(transform(h48s, h => (h * affineA(i) + affineB(i)) % AffineMod))` per i,
    * including null-element skipping and the all-null/empty → null-elements edge.
    */
  def affineSignature(md48s: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"minhash k=$k exceeds $MaxK")
    val n = md48s.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!md48s.isNullAt(j)) {
        seen = true
        val h = md48s.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * As(i) + Bs(i)) % Dedup.AffineMod
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k)) // nulls, as array_min over empty yields
    else new GenericArrayData(sig)
  }
}

/** Codegen'd Catalyst expression: `affine_minhash_sig(h48s: array<long>): array<long>` (length k).
  * On the q09/near-dup hot path — see [[Minhash]] for why this is an expression, not Columns.
  */
case class AffineMinhashSig(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    // validate k at ANALYSIS time like every other input guard — the execution-time require
    // inside the kernel would fail mid-job on e.g. minhash_sig(h, 5000) from SQL
    if (k <= 0 || k > Minhash.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects 0 < k <= ${Minhash.MaxK}, got $k")
    else KernelTypeCheck.elem(prettyName, child.dataType, LongType)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "affine_minhash_sig"
  override protected def nullSafeEval(arr: Any): Any =
    Minhash.affineSignature(arr.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Minhash.affineSignature($c, $k)")
  override protected def withNewChildInternal(c: Expression): AffineMinhashSig = copy(child = c)
}

/** Single-pass hyperplane-sketch kernel: all `tables × planes` sign bits in one walk over the
  * vector. The Column formulation — one `aggregate(zip_with(...))` per (table, plane) — is the
  * same interpreted-HOF trap as the minhash signature (tables × planes passes per row, boxed).
  * Bit-exact with it: dots accumulate in ascending-dimension order, a null element nulls the
  * whole dot (no bit), and the sign factors are the shared [[Similarity.planeSign]] LCG family.
  */
object Hyperplanes {
  /** null when the vector width differs from `dims` — truncating with min(dims, n) silently
    * computed a partial dot, diverging from the library entry points' checkedDims guard; the
    * raw SQL surface (lsh_buckets) needs the same protection, and null (→ zero exploded rows)
    * is the observable, non-corrupting outcome.
    */
  def sketchAll(vec: ArrayData, isFloat: Boolean, tables: Int, planes: Int,
      dims: Int): Any = {
    if (vec.numElements() != dims) return null
    val n = dims
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var anyNull = false
        var d = 0
        while (d < n) {
          if (vec.isNullAt(d)) anyNull = true
          else {
            val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
            dot += x * Similarity.planeSign(t, p, d)
          }
          d += 1
        }
        if (!anyNull && dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Single-pass cosine kernel: dot and both squared norms in one walk over the two vectors.
  * The `aggregate(zip_with(...))` Column formulation walks each pair THREE times interpreted
  * (dot + two norms) — measured as the dominant cost of the ANN re-rank stages once sketching
  * was fused. Mirrors the HOF semantics: ascending-dimension accumulation order, and any null
  * element or length mismatch → null result (zip_with pads with nulls → null sum).
  */
object CosineKernel {
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var d = 0
    while (d < n) {
      if (a.isNullAt(d) || b.isNullAt(d)) return null
      val x = if (aFloat) a.getFloat(d).toDouble else a.getDouble(d)
      val y = if (bFloat) b.getFloat(d).toDouble else b.getDouble(d)
      dot += x * y
      na += x * x
      nb += y * y
      d += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Codegen'd Catalyst expression: cosine similarity of two float/double vectors, one walk. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelTypeCheck.vector(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else KernelTypeCheck.vector(prettyName, right.dataType)
  }
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left); val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""Object $tmp = graft.functions.CosineKernel.cosine($a, $lf, $b, $rf);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $tmp; }
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Single-pass SimHash kernel over pre-md5'd shingles: one walk per digest instead of the
  * 64 interpreted per-bit aggregates of the Column formulation. Bit i's vote per shingle is
  * bit (i%4) of hex digit (i/4) of its digest — identical to `Dedup.simhashFromMd5`'s
  * definition, including the null/short-digest → fingerprint-0 edge (a null vote stream fails
  * every `votes > 0` test, so every bit stays clear).
  */
object Simhash {
  def fromMd5(md5s: ArrayData): Long = {
    val n = md5s.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (md5s.isNullAt(j)) return 0L
      val s = md5s.getUTF8String(j)
      if (s.numBytes() < 16) return 0L
      var i = 0
      while (i < 64) {
        val c = s.getByte(i / 4).toChar
        val digit = if (c <= '9') c - '0' else c - 'a' + 10
        votes(i) += (((digit >> (i % 4)) & 1) << 1) - 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) fp |= 1L << i; i += 1 }
    fp
  }
}

/** Codegen'd Catalyst expression: 64-bit SimHash of an md5-hex-digest array, one walk. */
case class SimhashFromMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.elem(prettyName, child.dataType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_md5"
  override protected def nullSafeEval(arr: Any): Any =
    Simhash.fromMd5(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash.fromMd5($c)")
  override protected def withNewChildInternal(c: Expression): SimhashFromMd5 = copy(child = c)
}

/** Single-pass IVF coarse-quantizer kernel: all `cells` centroid dots in one vector walk, then
  * argmax / top-P selection (ties → smaller cell id) — replacing one interpreted
  * `aggregate(zip_with(...))` per centroid. Dots accumulate in ascending-dimension order, so
  * cell choices are bit-identical to the definitional Column formulation on non-null vectors;
  * a null element nulls every dot there, so here the whole result is null.
  */
object IvfQuantizer {
  /** top-`probes` cell ids by (dot desc, cell asc), best-first; null on any null element OR a
    * vector width differing from `dims` (see [[Hyperplanes.sketchAll]] — no silent truncation).
    */
  def probes(vec: ArrayData, isFloat: Boolean, cells: Int, dims: Int, probes: Int): Any =
    probesWith(vec, isFloat, cells, dims, probes, null)

  /** [[probes]] against an explicit row-major `[cells][dims]` centroid matrix — the TRAINED
    * quantizer path ([[Similarity.trainIvfCentroids]]); `centroids = null` → the deterministic
    * LCG family (the SQL-oracle variant).
    *
    * Selection rule: the LCG family ranks by raw dot product (the SQL-reproducible oracle
    * definition). TRAINED centroids rank by `dot(x, c) − ½‖c‖²` — exactly argmin ‖x − c‖², the
    * objective k-means trained for. Raw dot against unequal-norm trained centroids would pile
    * every vector into the largest-norm cell (two collinear clusters at radii 1 and 3 both
    * prefer the radius-3 centroid by dot), emptying cells and breaking the partition.
    */
  def probesWith(vec: ArrayData, isFloat: Boolean, cells: Int, dims: Int, probes: Int,
      centroids: Array[Double]): Any =
    probesWith(vec, isFloat, cells, dims, probes, centroids,
      if (centroids == null) null else halfNorms(centroids, cells, dims))

  /** ½‖c‖² per cell — the L2 bias the trained selection subtracts; computed ONCE per plan by
    * [[IvfProbeCellsExpr]] and shipped alongside the matrix (per-row recompute would be
    * O(cells·dims) each).
    */
  def halfNorms(centroids: Array[Double], cells: Int, dims: Int): Array[Double] = {
    val out = new Array[Double](cells)
    var c = 0
    while (c < cells) {
      var nrm = 0.0
      var d = 0
      while (d < dims) { val v = centroids(c * dims + d); nrm += v * v; d += 1 }
      out(c) = 0.5 * nrm
      c += 1
    }
    out
  }

  def probesWith(vec: ArrayData, isFloat: Boolean, cells: Int, dims: Int, probes: Int,
      centroids: Array[Double], bias: Array[Double]): Any = {
    if (vec.numElements() != dims) return null
    val n = dims
    val dots = new Array[Double](cells)
    var d = 0
    while (d < n) {
      if (vec.isNullAt(d)) return null
      val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
      var c = 0
      if (centroids == null) {
        while (c < cells) { dots(c) += x * Similarity.ivfCentroid(c, d); c += 1 }
      } else {
        while (c < cells) { dots(c) += x * centroids(c * dims + d); c += 1 }
      }
      d += 1
    }
    if (bias != null) {
      var c = 0
      while (c < cells) { dots(c) -= bias(c); c += 1 }
    }
    val p = math.min(probes, cells)
    val out = new Array[Int](p)
    val taken = new Array[Boolean](cells)
    var i = 0
    while (i < p) {
      var best = -1
      var c = 0
      while (c < cells) {
        if (!taken(c) && (best < 0 || dots(c) > dots(best))) best = c // ties keep smaller c
        c += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd Catalyst expression: the `probes` nearest IVF cells of a vector, best-first
  * (array<int>; pass probes = 1 and take element 0 for plain cell assignment).
  *
  * `trained` = row-major `[cells][dims]` k-means centroid matrix (value-equal Seq so plan
  * canonicalization works); None → the deterministic LCG centroid family (the SQL-reproducible
  * oracle variant). The matrix rides the serialized plan as a codegen reference object — at the
  * production shape (≤4096 cells × ≤4096 dims of doubles) that is a broadcast-sized constant,
  * not a per-row cost.
  */
case class IvfProbeCellsExpr(child: Expression, cells: Int, dims: Int, probes: Int,
    trained: Option[Seq[Double]] = None) extends UnaryExpression {
  @transient private lazy val centroidArr: Array[Double] = trained.map(_.toArray).orNull
  @transient private lazy val biasArr: Array[Double] = // ½‖c‖² — computed once, not per row
    if (centroidArr == null) null else IvfQuantizer.halfNorms(centroidArr, cells, dims)
  override def checkInputDataTypes(): TypeCheckResult =
    if (trained.exists(_.length != cells * dims))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName trained centroid matrix must have cells*dims = ${cells * dims} entries, " +
          s"got ${trained.get.length}")
    else KernelTypeCheck.vector(prettyName, child.dataType)
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probe_cells"
  override protected def nullSafeEval(arr: Any): Any =
    IvfQuantizer.probesWith(arr.asInstanceOf[ArrayData], isFloat, cells, dims, probes,
      centroidArr, biasArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    val cref =
      if (centroidArr == null) "(double[]) null"
      else ctx.addReferenceObj("ivfCentroids", centroidArr, "double[]")
    val bref =
      if (biasArr == null) "(double[]) null"
      else ctx.addReferenceObj("ivfBias", biasArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ivfTmp")
      s"""Object $tmp = graft.functions.IvfQuantizer.probesWith($c, $f, $cells, $dims, $probes, $cref, $bref);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
         |""".stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): IvfProbeCellsExpr = copy(child = c)
}

/** Codegen'd Catalyst expression: per-table LSH buckets of a float/double vector, one array walk.
  * Output: array<long> of length `tables` (index = table id). See [[Hyperplanes]].
  */
case class HyperplaneSketchAll(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.vector(prettyName, child.dataType)
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // dims-mismatched vectors → null, not a truncated sketch
  override def prettyName: String = "hyperplane_sketch_all"
  override protected def nullSafeEval(arr: Any): Any =
    Hyperplanes.sketchAll(arr.asInstanceOf[ArrayData], isFloat, tables, planes, dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("hpTmp")
      s"""Object $tmp = graft.functions.Hyperplanes.sketchAll($c, $f, $tables, $planes, $dims);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
         |""".stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSketchAll = copy(child = c)
}
