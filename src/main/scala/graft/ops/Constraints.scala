package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.{SeqIO, SeqTable, Snapshot}

/** CHECK constraints — write-time data-quality gates (the Delta Lake table-constraint model,
  * public design). A constraint is a SQL predicate stored as the table property
  * `constraint.<name>` (carried forward by every commit, versioned like schema); every
  * physical row write ([[SeqIO.writeFiles]], the single write boundary: appends, staged
  * batches, streams, merge upserts, DML rewrites, branch appends, CDC mirrors) evaluates it
  * per row inside the write scan's codegen and FAILS THE WRITE LOUDLY on the first violating
  * row. ANSI CHECK semantics: a NULL predicate passes (so constraints over evolved columns
  * admit pre-evolution null-filled rows); only FALSE violates.
  *
  * Adding a constraint validates the EXISTING table first (one scan, counted violations in the
  * refusal message) — after `add` returns, the invariant "every live row satisfies every
  * constraint" holds and writes keep it.
  */
object Constraints {

  val PropPrefix = "constraint."

  /** The snapshot's constraints: name → SQL predicate. */
  def of(snap: Snapshot): Map[String, String] =
    snap.properties.collect {
      case (k, v) if k.startsWith(PropPrefix) => k.stripPrefix(PropPrefix) -> v
    }

  /** Add `name CHECK (predicateSql)` — refused if the name exists, the predicate does not
    * parse/resolve against the current schema, or any EXISTING row violates it.
    */
  def add(spark: SparkSession, table: SeqTable, name: String, predicateSql: String,
      maxAttempts: Int = 5): Snapshot = {
    require(name.matches("[A-Za-z][A-Za-z0-9_-]*"), s"constraint name '$name' must be a word")
    val key = PropPrefix + name
    val p = expr(predicateSql) // parse errors surface here
    var attempt = 0
    while (true) {
      attempt += 1
      val snap = table.currentSnapshot()
      require(!snap.properties.contains(key), s"constraint '$name' already exists")
      // existing data must satisfy the invariant the constraint promises — else reads and writes
      // would disagree about what the table guarantees (Delta's ADD CONSTRAINT validation)
      val violations = SeqIO.readWithDeletes(spark, table, snap, table.liveFilesNarrow(snap))
        .filter(!coalesce(p.cast("boolean"), lit(true))) // NULL passes (ANSI CHECK)
        .count()
      require(violations == 0L,
        s"addConstraint($name): $violations existing rows violate ($predicateSql) — refused")
      // PINNED at the validated snapshot (expectedBase): a writer that read the table before the
      // constraint landed can commit violating rows in the validate→commit window — rebasing over
      // such a commit would publish a constraint the live data already breaks. On conflict,
      // re-validate against the new head and retry. The absent-property fence still guards the
      // same-name race.
      try {
        return table.commit("add-constraint", Nil, Set.empty,
          Map("constraint" -> s"$name CHECK ($predicateSql)"),
          propertyUpdates = Map(key -> predicateSql),
          requireAbsentProperties = Seq(key),
          expectedBase = Some(snap.version))
      } catch {
        case e: table.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drop a constraint (metadata-only). */
  def drop(table: SeqTable, name: String): Snapshot = {
    val key = PropPrefix + name
    require(table.currentSnapshot().properties.contains(key), s"no constraint '$name'")
    table.commit("drop-constraint", Nil, Set.empty,
      Map("constraint" -> s"drop $name"),
      propertyRemovals = Set(key))
  }

  /** Wrap `df` so that writing it evaluates every constraint per row and throws on the first
    * violation — a filter whose else-branch raises, so Catalyst can neither prune it nor
    * reorder it out of the write plan; the predicate itself stays codegen'd.
    */
  def enforced(df: org.apache.spark.sql.DataFrame,
      constraints: Map[String, String]): org.apache.spark.sql.DataFrame =
    constraints.toSeq.sortBy(_._1).foldLeft(df) { case (d, (name, predSql)) =>
      val p = expr(predSql).cast("boolean")
      d.filter(
        when(coalesce(p, lit(true)), lit(true)) // NULL passes (ANSI CHECK)
          .otherwise(raise_error(concat(
            lit(s"CHECK constraint '$name' violated: ($predSql) by row doc_id="),
            coalesce(col("doc_id").cast("string"), lit("null")))).cast("boolean")))
    }
}
