package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.{FileMeta, SeqIO, SeqTable}

/** Deterministic synthetic tokenized-sequence tables (FIXTURES.md §1) — generated entirely with
  * codegen'd column expressions off `spark.range`, so fixture generation itself scales: no driver
  * loops, no RNG state, reproducible at any parallelism (row i's content is a pure function of i).
  *
  *  - n_tok: 70% uniform [16, 2048], 30% power-law tail to 8192 (non-uniform bin occupancy)
  *  - source: skewed over nSources values (Zipf-ish; src0 dominates) — exercises salting
  *  - tokens: per-row hash stream, values in [0, 50304)
  */
object SeqGen {

  def table(spark: SparkSession, n: Long, nSources: Int = 20, parts: Int = 32,
      tokensScale: Double = 1.0): DataFrame =
    payloadFor(spark.range(0, n, 1, parts).toDF("id"), nSources, tokensScale)

  /** Row content as a pure function of the `id` column (any bijective id source gives the same
    * table CONTENT regardless of how ids are laid out across partitions).
    */
  private def payloadFor(ids: DataFrame, nSources: Int, tokensScale: Double): DataFrame = {
    val id = col("id")
    // independent per-row uniforms in [0,1) from distinct hash channels
    def u(salt: Int) = (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)
    val nTok = when(u(1) < 0.7, (lit(16) + u(2) * 2032).cast("int"))
      .otherwise((lit(16) + pow(u(2), 4.0) * 8176).cast("int"))
    val srcIdx = least((pow(u(3), 3.0) * nSources).cast("int"), lit(nSources - 1))
    // token_stream == transform(sequence(1, c), i => pmod(hash(id, i), 50304)) bit-for-bit
    // (SeqGenParitySpec), but fused into one codegen'd pass — the HOF formulation is interpreted
    // per element (ArrayTransform is CodegenFallback) and was ~5 s of the 9 s ingest bench row
    val tokens = org.apache.spark.sql.GraftSqlBridge.column(graft.functions.TokenStream(
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      org.apache.spark.sql.GraftSqlBridge.expression((nTok * tokensScale).cast("int"))))
    ids.select(
      format_string("doc-%010d", id).as("doc_id"),
      tokens.as("tokens"),
      nTok.as("n_tok"),
      concat(lit("src"), srcIdx).as("source"))
  }

  /** A multiplier `a` with gcd(a, n) = 1 near the golden-ratio fraction of n, capped so that
    * `a * (n-1)` cannot overflow a Long — `slot -> (a*slot + b) mod n` is then a bijection on
    * [0, n) computable inside codegen.
    */
  private def affineCoprime(n: Long): Long = {
    val cap = Long.MaxValue / math.max(1L, n)
    var a = math.max(1L, math.min((n * 0.6180339887).toLong | 1L, cap))
    // the overflow cap can land on an EVEN a; keep a odd or `a -= 2` against an even n never
    // reaches gcd 1 (the loop then terminates at worst at a = 1, coprime with everything)
    if ((a & 1) == 0) a -= 1
    while (a > 1 && BigInt(a).gcd(BigInt(n)) != BigInt(1)) a -= 2
    math.max(1L, a)
  }

  /** T-frag: write `n` rows as ~`nFiles` deliberately tiny files with sources and lengths
    * interleaved across every file (each file's doc ids form a golden-ratio-stride progression
    * spanning the whole key space, and sources/lengths are hash-derived from the id) — maximal
    * fragmentation, the compaction planner's worst case.
    */
  def fragmentedTable(spark: SparkSession, dir: String, n: Long, nFiles: Int,
      nSources: Int = 20): (SeqTable, Seq[FileMeta]) = {
    val t = SeqTable.create(dir)
    // Shuffle-free scatter: each output file is one generator partition of SLOTS, and the affine
    // bijection slot -> (a*slot + b) mod n spreads every file's doc ids evenly over the whole
    // key space — the same full-span fragmentation `repartition(nFiles, doc_id)` produced, but
    // the multi-KB token payloads are generated IN the writing task instead of moving through a
    // shuffle (at bench scale that shuffle was ~1 GB, half of m_ingest).
    val a = affineCoprime(n)
    val ids = spark.range(0, n, 1, nFiles).select(pmod(col("id") * a + 17L, lit(n)).as("id"))
    val df = payloadFor(ids, nSources, tokensScale = 1.0)
    val metas = SeqIO.writeFiles(spark, t, df)
    t.commit("append", metas, Set.empty)
    (t, metas)
  }

  /** T-merge: a change set against a table of `n` rows — half updates (existing ids, new tokens),
    * half inserts (new ids), plus `deletes` deletions of existing ids.
    *
    * Duplicate keys (hash collisions across the three sub-sets) are resolved with a DETERMINISTIC
    * tie-break — `dropDuplicates` keeps whichever row it meets first, which varies between
    * re-executions of the same plan (spill/partition order), breaking lazy-DataFrame oracles.
    */
  def changeSet(spark: SparkSession, n: Long, changes: Long, deletes: Long = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val upd = table(spark, changes / 2, parts = 8)
      .withColumn("doc_id", format_string("doc-%010d", (xxhash64(col("doc_id")) % n + n) % n))
      .withColumn("tokens", transform(col("tokens"), t => t + 1)) // visibly-new payload
      .withColumn("_op", lit("U"))
    val ins = table(spark, changes - changes / 2, parts = 8)
      .withColumn("doc_id", format_string("new-%010d", xxhash64(col("doc_id")).bitwiseAND(lit(Long.MaxValue))))
      .withColumn("_op", lit("U"))
    val del = table(spark, deletes, parts = 4)
      .withColumn("doc_id", format_string("doc-%010d", (xxhash64(col("doc_id"), lit(7)) % n + n) % n))
      .withColumn("_op", lit("D"))
    val all = upd.unionByName(ins).unionByName(if (deletes > 0) del else del.limit(0))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("_op"), xxhash64(col("tokens")), col("n_tok"), col("source"))
    all.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
