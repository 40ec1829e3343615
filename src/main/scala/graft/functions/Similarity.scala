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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Random-hyperplane LSH sketch: bit p = sign of <vec, plane_p>, planes ±1-valued from a
    * deterministic hash of (plane, dim). Vectors close in cosine share sketch prefixes/buckets.
    */
  /** signed projection of `vec` onto the ±1-valued pseudo-random plane indexed by `p`. */
  private def planeDot(vec: Column, p: Column): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") *
          when(shiftright(xxhash64(p, d), 7).bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)),
      lit(0.0), _ + _)

  def hyperplaneSketch(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => acc.bitwiseOR(
        when(planeDot(vec, p) > 0, Dedup.shl(lit(1L), p)).otherwise(lit(0L))))

  /** Approximate top-k: candidates = pairs sharing an LSH bucket (multi-probe over `tables`
    * independent sketches), then exact cosine re-rank within candidates.
    */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, planes: Int, tables: Int): DataFrame = {
    def sketched(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.select(col("id").as(idName), col("vec").as(vecName)) // rename first (no lateral aliases)
        .withColumn("sk", explode(transform(sequence(lit(0), lit(tables - 1)),
          t => struct(t.as("table"),
            // per-table sketch: offset the plane index space so tables are independent
            aggregate(sequence(t * planes, (t + 1) * planes - 1), lit(0L),
              (acc, p) => acc.bitwiseOR(
                when(planeDot(col(vecName), p) > 0, Dedup.shl(lit(1L), p % planes))
                  .otherwise(lit(0L)))).as("bucket")))))
        .select(col(idName), col(vecName), col("sk.table"), col("sk.bucket"))
    val it = sketched(items, "neighbor_id", "vec")
    val qs = sketched(queries, "query_id", "qvec")
    val cands = it.join(broadcast(qs), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("vec"), col("qvec"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.select(col("query_id"), col("neighbor_id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
