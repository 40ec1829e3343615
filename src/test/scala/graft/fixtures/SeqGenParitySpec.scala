package graft.fixtures

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused [[graft.functions.TokenStream]] kernel must be BIT-IDENTICAL to the definitional
  * HOF formulation it replaced — the fixture content is oracle-pinned (every engine query's
  * DuckDB hash is computed over tables this generator synthesizes), so any drift here is a
  * correctness regression, not a perf detail.
  */
class SeqGenParitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def definitional(idCol: org.apache.spark.sql.Column,
      countCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(1), countCol), i => pmod(hash(idCol, i), lit(50304)))

  test("token_stream == transform(sequence(1,c), i => pmod(hash(id,i),50304)) bit-for-bit") {
    val ids = Seq(0L, 1L, 2L, 17L, -5L, Long.MaxValue, Long.MinValue, 999999999L)
    val counts = Seq(1, 2, 3, 16, 100, 2048)
    val df = ids.flatMap(i => counts.map(c => (i, c))).toDF("id", "c")
    val got = df.select(col("id"), col("c"),
      org.apache.spark.sql.GraftSqlBridge.column(graft.functions.TokenStream(
        org.apache.spark.sql.GraftSqlBridge.expression(col("id")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("c")))).as("fused"),
      definitional(col("id"), col("c")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](2) == r.getSeq[Int](3),
        s"mismatch for id=${r.getLong(0)} c=${r.getInt(1)}")
    }
  }

  test("token_stream matches sequence's descending edge for count < 1") {
    val df = Seq((7L, 0), (7L, -3), (42L, -1)).toDF("id", "c")
    val got = df.select(
      org.apache.spark.sql.GraftSqlBridge.column(graft.functions.TokenStream(
        org.apache.spark.sql.GraftSqlBridge.expression(col("id")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("c")))).as("fused"),
      definitional(col("id"), col("c")).as("ref"))
      .collect()
    got.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("token_stream propagates null id / null count") {
    val df = Seq((Some(1L), None: Option[Int]), (None: Option[Long], Some(5)))
      .toDF("id", "c")
    val got = df.select(
      org.apache.spark.sql.GraftSqlBridge.column(graft.functions.TokenStream(
        org.apache.spark.sql.GraftSqlBridge.expression(col("id")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("c")))).as("fused"))
      .collect()
    got.foreach(r => assert(r.isNullAt(0)))
  }

  test("generated table content is unchanged by the fused kernel (content-hash pin)") {
    // the whole-table content hash the engine oracles rely on: any kernel drift shows here.
    // Pinned against the value the PRE-fusion generator produced for this exact fixture.
    val h = SeqGen.table(spark, 500, parts = 4)
      .agg(coalesce(expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))"), lit(0L)))
      .as[Long].head()
    val hDefinitional = {
      val id = col("id")
      def u(salt: Int) = (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)
      val nTok = when(u(1) < 0.7, (lit(16) + u(2) * 2032).cast("int"))
        .otherwise((lit(16) + pow(u(2), 4.0) * 8176).cast("int"))
      val srcIdx = least((pow(u(3), 3.0) * 20).cast("int"), lit(19))
      spark.range(0, 500, 1, 4).toDF("id").select(
        format_string("doc-%010d", id).as("doc_id"),
        transform(sequence(lit(1), nTok), i => pmod(hash(id, i), lit(50304))).as("tokens"),
        nTok.as("n_tok"),
        concat(lit("src"), srcIdx).as("source"))
        .agg(coalesce(expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))"), lit(0L)))
        .as[Long].head()
    }
    assert(h == hDefinitional)
  }
}
