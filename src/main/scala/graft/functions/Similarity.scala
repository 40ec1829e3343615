package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search: brute-force cosine top-k (the exact baseline) and a
  * random-hyperplane-LSH bucketed variant (the 100-TB path: candidates only meet inside a bucket,
  * so the cross product never materializes). Vector math is `zip_with`/`aggregate` column
  * expressions — codegen'd, no UDFs.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — evaluated by the fused single-pass [[CosineSim]] kernel (the
    * `dot/(norm·norm)` HOF composition walks the pair three times, interpreted; this was the
    * dominant re-rank cost once sketching was fused). [[cosineDefinitional]] is the spec oracle.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(CosineSim(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  private[functions] def cosineDefinitional(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query row. `items`/`queries` need (id, vec) columns; queries
    * are broadcast (small side), so this is a map-side cross product + per-query top-k window —
    * no all-pairs shuffle.
    */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val scored = items.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("vec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane family: sign(t, p, d) from a 31-bit LCG — plain integer
    * arithmetic, so the identical formula runs inside the DuckDB oracle, and the planes
    * materialize ONCE as literal arrays. r01 hashed (plane, dim) per ROW per DIM (xxhash64 on the
    * hot path); literal planes cost k·dims multiply-adds per row and nothing else.
    */
  def planeSign(table: Int, plane: Int, dim: Int): Double = {
    val h = (1103515245L * (table * 521 + plane * 67 + dim) + 12345L) % 2147483648L
    if (((h >> 14) & 1L) == 1L) 1.0 else -1.0
  }

  private def litPlane(t: Int, p: Int, dims: Int): Column =
    array((0 until dims).map(d => lit(planeSign(t, p, d))): _*)

  /** Fail loudly on an embedding-width mismatch: zip_with pads the shorter side with nulls, so a
    * wrong `dims` would null the dot product, collapse every row into bucket 0 and silently turn
    * the index into a full cross product.
    */
  private def checkedDims(op: String, vec: Column, dims: Int): Column =
    when(size(vec) =!= dims, raise_error(concat(
      lit(s"$op: expected $dims-dim vectors, got "), size(vec).cast("string"))))
      .otherwise(vec)

  /** LSH bucket of `vec` for table `t`: bit p = sign of <vec, plane(t, p)>.
    * Definitional HOF formulation — kept as the spec oracle; hot paths use
    * [[hyperplaneSketchAll]] (one fused codegen'd pass for every table).
    */
  def hyperplaneSketch(vec: Column, planes: Int, dims: Int, t: Int = 0): Column =
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, litPlane(t, p, dims), (x, s) => x.cast("double") * s), lit(0.0), _ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** All `tables` LSH buckets of `vec` in ONE fused pass (array<long>, index = table id) —
    * see [[graft.functions.Hyperplanes]] for why this is a codegen'd expression, not Columns.
    */
  def hyperplaneSketchAll(vec: Column, planes: Int, tables: Int, dims: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HyperplaneSketchAll(org.apache.spark.sql.GraftSqlBridge.expression(vec),
        tables, planes, dims))

  /** Approximate top-k: candidates = pairs sharing an LSH bucket (multi-probe over `tables`
    * independent sketches), then exact cosine re-rank within candidates. `dims` must match the
    * embedding width (planes are compile-time literals).
    */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, planes: Int, tables: Int,
      dims: Int = 64): DataFrame = {
    def sketched(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.select(col("id").as(idName), col("vec").as(vecName)) // rename first (no lateral aliases)
        .withColumn(vecName, checkedDims("lshTopK", col(vecName), dims))
        .select(col(idName), col(vecName),
          posexplode(hyperplaneSketchAll(col(vecName), planes, tables, dims)))
        .select(col(idName), col(vecName), col("pos").as("table"), col("col").as("bucket"))
    val it = sketched(items, "neighbor_id", "vec")
    val qs = sketched(queries, "query_id", "qvec")
    // the candidate dedup shuffles (query_id, neighbor_id) ONLY — vectors re-attach by id after,
    // exactly like lshPairs; dragging two float arrays through the distinct was pure shuffle width
    val candIds = it.select("neighbor_id", "table", "bucket")
      .join(broadcast(qs.select("query_id", "table", "bucket")), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    val cands = candIds
      .join(items.select(col("id").as("neighbor_id"), col("vec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec"))),
        Seq("query_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.select(col("query_id"), col("neighbor_id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic coarse-quantizer centroid component in [-1, 1] — same LCG discipline as
    * [[planeSign]]: plain integer arithmetic, reproducible in ANSI SQL, materialized ONCE as
    * literal arrays (no per-row hashing). A trained k-means would drop into the same structure.
    */
  def ivfCentroid(cell: Int, dim: Int): Double = {
    val h = (1103515245L * (cell * 131 + dim * 17 + 5) + 12345L) % 2147483648L
    ((h >> 7) & 1023L) / 511.5 - 1.0
  }

  private def litCentroid(c: Int, dims: Int): Column =
    array((0 until dims).map(d => lit(ivfCentroid(c, d))): _*)

  /** (dot, -cell) structs for every centroid — struct ordering makes argmax/top-P tie-break on
    * the SMALLER cell id for free.
    */
  private def centroidScores(vec: Column, cells: Int, dims: Int): Column =
    array((0 until cells).map { c =>
      val dot = aggregate(zip_with(vec, litCentroid(c, dims), (x, s) => x.cast("double") * s),
        lit(0.0), _ + _)
      struct(dot.as("d"), lit(-c).as("nc"))
    }: _*)

  /** IVF cell of `vec`: argmax-dot coarse centroid (ties → smaller cell id). Evaluated by the
    * fused single-pass [[IvfProbeCellsExpr]] kernel (see [[graft.functions.IvfQuantizer]]);
    * the definitional variants below are the spec oracles.
    *
    * `centroids` = trained row-major matrix from [[trainIvfCentroids]]; None → LCG family.
    */
  def ivfCell(vec: Column, cells: Int, dims: Int,
      centroids: Option[Array[Double]] = None): Column =
    element_at(ivfProbeCells(vec, cells, 1, dims, centroids), 1)

  /** The `probes` nearest cells of `vec`, best-first. */
  def ivfProbeCells(vec: Column, cells: Int, probes: Int, dims: Int,
      centroids: Option[Array[Double]] = None): Column =
    org.apache.spark.sql.GraftSqlBridge.column(IvfProbeCellsExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(vec), cells, dims, probes,
      centroids.map(_.toSeq)))

  /** TRAINED coarse quantizer: sampled k-means++ / Lloyd's, dropping into the same
    * [[IvfProbeCellsExpr]] seam as the LCG family (which stays the SQL-oracle variant).
    *
    * Scale shape (the Faiss-style discipline, public design): IVF training never needs the full
    * corpus — a bounded deterministic sample (`sampleN` rows, ordered by id so reruns see the
    * same set) is collected once, and Lloyd's runs driver-side on that sample (sampleN × dims
    * doubles; 64k × 1k = ~0.5 GB worst case, far below driver heap). The resulting matrix ships
    * to executors as one plan constant. Empty clusters reseed to the point farthest from its
    * center (standard repair).
    *
    * @return row-major `[cells][dims]` centroid matrix for [[ivfTopK]]'s `centroids` parameter
    */
  def trainIvfCentroids(items: DataFrame, cells: Int, dims: Int, iters: Int = 10,
      sampleN: Int = 16384, seed: Long = 42L): Array[Double] = {
    val sample: Array[Array[Double]] = items
      .select(col("id"), checkedDims("trainIvfCentroids", col("vec"), dims).as("vec"))
      .orderBy(col("id")).limit(sampleN)
      .select(col("vec").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "trainIvfCentroids: no vectors to train on")
    val rnd = new scala.util.Random(seed)
    @inline def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var d = 0
      while (d < dims) { val t = a(d) - b(d); s += t * t; d += 1 }
      s
    }
    // k-means++ seeding: first center uniform, then D²-weighted
    val centers = Array.ofDim[Double](cells, dims)
    centers(0) = sample(rnd.nextInt(sample.length)).clone()
    val minD2 = Array.fill(sample.length)(Double.MaxValue)
    var c = 1
    while (c < cells) {
      var i = 0
      while (i < sample.length) {
        val d2 = dist2(sample(i), centers(c - 1))
        if (d2 < minD2(i)) minD2(i) = d2
        i += 1
      }
      val total = minD2.sum
      var pick = 0
      if (total > 0) {
        var r = rnd.nextDouble() * total
        while (pick < sample.length - 1 && r > minD2(pick)) { r -= minD2(pick); pick += 1 }
      } else pick = rnd.nextInt(sample.length) // all points identical: any seed works
      centers(c) = sample(pick).clone()
      c += 1
    }
    // Lloyd's iterations
    val assign = new Array[Int](sample.length)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < sample.length) {
        var best = 0; var bestD = Double.MaxValue
        var k = 0
        while (k < cells) {
          val d2 = dist2(sample(i), centers(k))
          if (d2 < bestD) { bestD = d2; best = k }
          k += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](cells, dims)
      val counts = new Array[Int](cells)
      i = 0
      while (i < sample.length) {
        val k = assign(i); counts(k) += 1
        var d = 0
        while (d < dims) { sums(k)(d) += sample(i)(d); d += 1 }
        i += 1
      }
      var k = 0
      while (k < cells) {
        if (counts(k) > 0) {
          var d = 0
          while (d < dims) { centers(k)(d) = sums(k)(d) / counts(k); d += 1 }
        } else {
          // empty cluster: reseed to the sample point farthest from its assigned center, then
          // RE-ASSIGN that point to this cell — without the update, two clusters empty in the
          // same iteration both clone the identical farthest point (duplicate centroids that
          // re-empty forever)
          var far = 0; var farD = -1.0
          var j = 0
          while (j < sample.length) {
            val d2 = dist2(sample(j), centers(assign(j)))
            if (d2 > farD) { farD = d2; far = j }
            j += 1
          }
          centers(k) = sample(far).clone()
          assign(far) = k
        }
        k += 1
      }
      it += 1
    }
    val flat = new Array[Double](cells * dims)
    c = 0
    while (c < cells) { System.arraycopy(centers(c), 0, flat, c * dims, dims); c += 1 }
    flat
  }

  private[functions] def ivfCellDefinitional(vec: Column, cells: Int, dims: Int): Column =
    -array_max(centroidScores(vec, cells, dims)).getField("nc")

  private[functions] def ivfProbeCellsDefinitional(
      vec: Column, cells: Int, probes: Int, dims: Int): Column =
    transform(slice(reverse(array_sort(centroidScores(vec, cells, dims))), 1, probes),
      s => -s.getField("nc"))

  /** IVF (inverted-file) approximate top-k — the posting-list alternative to [[lshTopK]]'s
    * multi-table sketch: every item lands in exactly ONE cell (its nearest coarse centroid), a
    * query probes only its `probes` nearest cells, and candidates re-rank with exact cosine.
    *
    * Scale shape: cell assignment is a map-side column expression over literal centroids; the
    * only join is broadcast (query side small); because items are single-cell and probe lists
    * are distinct, candidate pairs are unique BY CONSTRUCTION — no dedup shuffle at all (LSH
    * needs one). Cells above `maxCell` members are dropped before pairing, bounding a
    * degenerate quantizer's hot list exactly like the LSH hot-bucket cap.
    */
  def ivfTopK(items: DataFrame, queries: DataFrame, k: Int, cells: Int, probes: Int,
      dims: Int = 64, maxCell: Int = 65536,
      centroids: Option[Array[Double]] = None): DataFrame = {
    val it = items.select(col("id").as("neighbor_id"),
        checkedDims("ivfTopK", col("vec"), dims).as("vec"))
      .withColumn("cell", ivfCell(col("vec"), cells, dims, centroids))
    val capped = it
      .withColumn("_cn", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("_cn") <= maxCell).drop("_cn")
    val qs = queries.select(col("id").as("query_id"),
        checkedDims("ivfTopK", col("vec"), dims).as("qvec"))
      .withColumn("cell", explode(ivfProbeCells(col("qvec"), cells, probes, dims, centroids)))
    val cands = capped.join(broadcast(qs), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.select(col("query_id"), col("neighbor_id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Item×item near-duplicate pairs — the symmetric self-join mode [[lshTopK]] lacks (its query
    * side must broadcast; embedding-level dedup at 10^12 rows has no small side). Same shape as
    * [[graft.functions.Dedup.minhashLshPairs]]:
    *
    *  - every item sketched into `tables` hyperplane buckets (one explode, no per-row hashing —
    *    planes are literals);
    *  - candidates meet ONLY inside a (table, bucket) group: the ids-only self-join is the single
    *    shuffle, and the cross product never materializes;
    *  - hot buckets above `maxBucket` members are dropped before pairing (a degenerate bucket —
    *    e.g. the all-zeros region — would otherwise go quadratic);
    *  - distinct candidate pairs re-attach vectors by id and are verified with exact cosine
    *    ≥ `minCosX1e4`.
    *
    * `items` needs (id, vec) columns; returns (id_a, id_b, cos_x1e4), id_a < id_b.
    */
  def lshPairs(items: DataFrame, planes: Int, tables: Int, minCosX1e4: Long,
      dims: Int = 64, maxBucket: Int = 1024): DataFrame = {
    val checked = items.select(col("id"), col("vec"))
      .withColumn("vec", checkedDims("lshPairs", col("vec"), dims))
    val sk = checked
      .select(col("id"), posexplode(hyperplaneSketchAll(col("vec"), planes, tables, dims)))
      .select(col("id"), col("pos").as("table"), col("col").as("bucket")) // ids only past here
    val capped = sk
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy(col("table"), col("bucket"))))
      .filter(col("_bn") <= maxBucket)
    val pairs = capped.select(col("id").as("id_a"), col("table"), col("bucket"))
      .join(capped.select(col("id").as("id_b"), col("table"), col("bucket")), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(checked.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(checked.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")) * 10000).cast("long").as("cos_x1e4"))
      .filter(col("cos_x1e4") >= minCosX1e4)
  }
}
