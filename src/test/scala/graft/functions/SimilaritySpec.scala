package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dims = 8

  /** deterministic pseudo-random float vectors */
  private def vec(id: Long): Array[Float] =
    Array.tabulate(dims)(d => (((id * 31 + d * 17 + 7) % 19).toFloat - 9f) / 9f)

  test("lshTopK: a positively-scaled twin shares every bucket and ranks first with cos=1") {
    import spark.implicits._
    val items = (0L until 40L).map(i => (i, vec(i))).toDF("id", "vec")
    // query 1000+q is item q scaled by 2: same hyperplane signs in every table → always a
    // candidate; cosine exactly 1 → must be rank 1
    val queries = (0L until 3L).map(q => (1000L + q, vec(q).map(_ * 2f))).toDF("id", "vec")
    val top = Similarity.lshTopK(items, queries, k = 3, planes = 4, tables = 6, dims = dims)
      .filter(col("rank") === 1).collect()
    assert(top.length === 3)
    top.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 1000L)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    }
  }

  test("fused hyperplane sketch == definitional per-(table,plane) HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // float vectors (the embeddings shape) and double vectors (the lshPairs transform shape)
    val fdf = (0 until 100).map(i => (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec").persist()
    val ddf = (0 until 100).map(i => (i.toLong, Array.fill(dims)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "vec").persist()
    for (df <- Seq(fdf, ddf); tables <- Seq(1, 6); planes <- Seq(4, 8)) {
      val fused = df.select(col("id"),
        Similarity.hyperplaneSketchAll(col("vec"), planes, tables, dims).as("b"))
        .orderBy("id").collect().map(_.getSeq[Long](1))
      val defn = df.select(col("id") +:
          (0 until tables).map(t => Similarity.hyperplaneSketch(col("vec"), planes, dims, t)): _*)
        .orderBy("id").collect().map(r => (1 to tables).map(r.getLong))
      fused.zip(defn).foreach { case (f, d) => assert(f === d, s"tables=$tables planes=$planes") }
    }
    fdf.unpersist(); ddf.unpersist()
  }

  test("fused cosine == definitional dot/(norm·norm) composition (float, double, null edges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1), Array.fill(dims)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b").persist()
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = df.select(Similarity.cosineDefinitional(col("a"), col("b"))).collect().map(_.getDouble(0))
    got.zip(want).foreach { case (g, w) => assert(g === w, "must be bit-identical (same fold order)") }
    // length mismatch and null elements → null, like zip_with's null padding
    val edge = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f, 3f)),
      (2L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f))).toDF("id", "a", "b")
    assert(edge.select(Similarity.cosine(col("a"), col("b"))).collect().forall(_.isNullAt(0)))
    df.unpersist()
  }

  test("ivfTopK: one cell per item; a scaled twin shares the cell and ranks first with cos=1") {
    import spark.implicits._
    val items = (0L until 50L).map(i => (i, vec(i))).toDF("id", "vec")
    // positive scaling preserves the argmax-dot cell, and a query's first probe IS its own cell,
    // so the twin is always a candidate and must rank 1 with cosine exactly 1
    val queries = (0L until 3L).map(q => (1000L + q, vec(q).map(_ * 3f))).toDF("id", "vec")
    val top = Similarity.ivfTopK(items, queries, k = 3, cells = 8, probes = 2, dims = dims)
      .filter(col("rank") === 1).collect()
    assert(top.length === 3)
    top.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 1000L)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    }
    // the quantizer actually partitions (items spread over >1 cell on this data)
    val cellCount = items.select(Similarity.ivfCell(col("vec"), 8, dims).as("cell"))
      .distinct().count()
    assert(cellCount > 1)
  }

  test("fused IVF quantizer == definitional argmax/top-P composition (float and double)") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val fdf = (0 until 150).map(i => (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec").persist()
    val ddf = (0 until 150).map(i => (i.toLong, Array.fill(dims)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "vec").persist()
    for (df <- Seq(fdf, ddf); cells <- Seq(4, 16); probes <- Seq(1, 3)) {
      val got = df.select(col("id"),
        Similarity.ivfProbeCells(col("vec"), cells, probes, dims).as("p"),
        Similarity.ivfCell(col("vec"), cells, dims).as("c")).orderBy("id").collect()
      val want = df.select(col("id"),
        Similarity.ivfProbeCellsDefinitional(col("vec"), cells, probes, dims).as("p"),
        Similarity.ivfCellDefinitional(col("vec"), cells, dims).as("c")).orderBy("id").collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getSeq[Int](1) === w.getSeq[Int](1), s"cells=$cells probes=$probes")
        assert(g.getInt(2) === w.getInt(2))
      }
    }
    fdf.unpersist(); ddf.unpersist()
  }

  test("trained IVF quantizer: recall >= LCG-centroid recall at equal probe count") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // a separable 8-cluster mixture: items/queries = cluster center + small noise. A TRAINED
    // 8-cell quantizer should recover the clusters (probes=1 ≈ perfect recall); the LCG family
    // is data-blind, so this is exactly where training must pay.
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextDouble() * 4 - 2))
    val items = (0L until 400L).map { i =>
      (i, centers((i % 8).toInt).map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("id", "vec").persist()
    val queries = (0L until 40L).map { q =>
      (1000L + q, centers((q % 8).toInt).map(v => (v + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("id", "vec").persist()
    val k = 10
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.filter(col("rank") <= k).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = resultSet(Similarity.bruteForceTopK(items, queries, k))
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      (truth & resultSet(res)).size.toDouble / truth.size
    val lcg = recall(Similarity.ivfTopK(items, queries, k, cells = 8, probes = 1, dims = dims))
    val matrix = Similarity.trainIvfCentroids(items, cells = 8, dims = dims,
      iters = 10, sampleN = 400, seed = 5L)
    val trained = recall(Similarity.ivfTopK(items, queries, k, cells = 8, probes = 1,
      dims = dims, centroids = Some(matrix)))
    assert(trained >= lcg, s"trained recall $trained < LCG recall $lcg")
    assert(trained > 0.9, s"trained quantizer should nail a separable mixture (recall=$trained)")
    items.unpersist(); queries.unpersist(); ()
  }

  test("trained IVF ranks by nearest-centroid, not raw dot: unequal-norm clusters stay partitioned") {
    import spark.implicits._
    // two clusters COLLINEAR with the origin at radii 1 and 3: raw dot against trained centroids
    // would send BOTH clusters to the radius-3 centroid (dot(x, c_far) > dot(x, c_near) for every
    // x on the ray), emptying the near cell; the L2 rule (dot − ½‖c‖²) keeps them apart
    val rnd = new scala.util.Random(101)
    val dir = Array.fill(dims)(rnd.nextDouble() + 0.1)
    val nrm = math.sqrt(dir.map(d => d * d).sum)
    val unit = dir.map(d => (d / nrm).toFloat)
    def pt(radius: Double): Array[Float] =
      unit.map(u => (u * radius + rnd.nextGaussian() * 0.02).toFloat)
    val items = (0L until 200L).map(i => (i, pt(if (i % 2 == 0) 1.0 else 3.0)))
      .toDF("id", "vec").persist()
    val matrix = Similarity.trainIvfCentroids(items, cells = 2, dims = dims,
      iters = 10, sampleN = 200, seed = 7L)
    val cellsUsed = items.select(
      Similarity.ivfCell(col("vec"), 2, dims, Some(matrix)).as("cell"))
      .groupBy("cell").count().collect()
    assert(cellsUsed.length === 2, s"both trained cells must be occupied: ${cellsUsed.toSeq}")
    // and each cell holds one radius class (the trained Voronoi partition)
    val byClass = items.select((col("id") % 2).as("cls"),
      Similarity.ivfCell(col("vec"), 2, dims, Some(matrix)).as("cell"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(byClass.size === 2, s"each radius class must map to exactly one cell: $byClass")
    items.unpersist(); ()
  }

  test("lshTopK candidate dedup shuffles ids only — no vector payload in any aggregate") {
    import spark.implicits._
    val items = (0L until 20L).map(i => (i, vec(i))).toDF("id", "vec")
    val queries = (0L until 2L).map(q => (100L + q, vec(q))).toDF("id", "vec")
    val plan = Similarity.lshTopK(items, queries, k = 2, planes = 4, tables = 2, dims = dims)
      .queryExecution.executedPlan.toString
    // the only aggregate in this plan is the candidate-pair distinct; its grouping keys (and
    // therefore its exchange) must not carry the float arrays
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty, "expected the candidate distinct to plan as a HashAggregate")
    aggLines.foreach(l => assert(!l.contains("vec"), s"vector payload in dedup aggregate: $l"))
  }
}
