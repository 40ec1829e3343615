package graft.state

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.Serialization

/** One event in the maintenance lineage log. */
final case class StateEvent(
    event: String, // CYCLE_START | TASK_PLANNED | TASK_COMMITTED | CYCLE_END
    cycle: Long,
    taskId: Int, // -1 for cycle-level events
    baseVersion: Long, // snapshot the cycle planned against
    snapshotVersion: Long, // version a TASK_COMMITTED produced (-1 otherwise)
    region: Seq[Int], // (x, y, w) of the task region, empty for cycle events
    files: Seq[String],
    metrics: Map[String, String],
    ts: Long)

/** Append-only, fsync'd JSON-lines driver state — the engine's resume-after-failure checkpoint,
  * replacing the reference's `buffer.tmp` query-result cache
  * (`/root/reference/src/main/scala/SDL/main/main.java:50-58,244-247`) with per-task lineage.
  *
  * Exactly-once task execution across crashes: a task's commit carries `(cycle, taskId)` in its
  * snapshot summary, so on resume a task is treated as done if EITHER the log has its
  * TASK_COMMITTED event OR some snapshot after the cycle's base version carries its id (covering a
  * crash in the window between commit and log append).
  */
final class Checkpoint(dir: String) {
  import Checkpoint.formats
  private val path = Paths.get(dir, "maintenance-log.jsonl")
  Files.createDirectories(Paths.get(dir))
  // reclaim temp files stranded by a crash between createTempFile and the atomic move (heal /
  // planner-state writes) — nothing else ever deletes them
  locally {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      n.startsWith(".tmp-log") || n.startsWith(".tmp-pstate")
    }.foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  def append(e: StateEvent): Unit = {
    healTornTail()
    val ch = Files.newByteChannel(path,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND, StandardOpenOption.SYNC)
    try ch.write(java.nio.ByteBuffer.wrap((Serialization.write(e) + "\n").getBytes("UTF-8")))
    finally ch.close()
  }

  /** A crash can tear the previous append: appending straight onto an unterminated tail would
    * merge two events into one line, which later reads mis-parse (or, if the tail is a partial
    * object, turn it into MID-file corruption once more lines follow). Before appending: if the
    * tail parses as a complete event, just terminate its line; if it is a torn partial, drop it
    * (those bytes never fully landed, so that event never happened). Single-writer log, so the
    * atomic rewrite cannot race another appender.
    */
  private def healTornTail(): Unit = {
    if (!Files.exists(path) || Files.size(path) == 0) return
    val lastByte = {
      val ch = Files.newByteChannel(path, StandardOpenOption.READ)
      try {
        val buf = java.nio.ByteBuffer.allocate(1)
        ch.position(Files.size(path) - 1)
        ch.read(buf)
        buf.get(0)
      } finally ch.close()
    }
    if (lastByte == '\n'.toByte) return
    val bytes = Files.readAllBytes(path)
    var idx = bytes.length - 1
    while (idx >= 0 && bytes(idx) != '\n'.toByte) idx -= 1
    val tail = new String(bytes, idx + 1, bytes.length - idx - 1, "UTF-8")
    val healed =
      try { Serialization.read[StateEvent](tail); bytes ++ "\n".getBytes("UTF-8") }
      catch { case _: Exception => java.util.Arrays.copyOfRange(bytes, 0, idx + 1) }
    val tmp = Files.createTempFile(Paths.get(dir), ".tmp-log", ".jsonl")
    Files.write(tmp, healed, StandardOpenOption.SYNC)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** All logged events. A malformed FINAL line is dropped, not fatal: a crash can tear the last
    * append mid-write (even with SYNC, the byte write is not atomic on power loss), and an event
    * whose bytes never fully landed never happened — resume must not be bricked by it. Malformed
    * EARLIER lines are real corruption and still throw loudly.
    */
  def events(): Seq[StateEvent] =
    if (!Files.exists(path)) Nil
    else {
      val lines = Files.readAllLines(path).asScala.toVector.filter(_.nonEmpty)
      lines.zipWithIndex.flatMap { case (l, i) =>
        try Some(Serialization.read[StateEvent](l))
        catch {
          case _: Exception if i == lines.size - 1 => None // torn tail from a mid-append crash
          case e: Exception =>
            throw new IllegalStateException(s"corrupt checkpoint line ${i + 1} of $path", e)
        }
      }
    }

  def lastCycle(): Long = events().map(_.cycle).maxOption.getOrElse(0L)

  /** The unfinished cycle to resume, if any: started but not ended. */
  def openCycle(): Option[Seq[StateEvent]] = {
    val ev = events()
    val started = ev.filter(_.event == "CYCLE_START").map(_.cycle)
    val ended = ev.filter(_.event == "CYCLE_END").map(_.cycle).toSet
    started.filterNot(ended).maxOption.map(c => ev.filter(_.cycle == c))
  }

  // ---- cached incremental-planner state (JSON cannot hold +Infinity → -1 sentinel) ----

  import Checkpoint.{NodeEntry, StateFile}
  private val statePath = Paths.get(dir, "planner-state.json")

  def savePlannerState(st: graft.planner.PlannerState): Unit = {
    val dto = StateFile(st.kPrime, st.baseVersion, st.nodes.toList.map { case (n, r) =>
      NodeEntry(n, r.candidates.toList, r.exhausted,
        if (r.minEmitted.isPosInfinity) -1.0 else r.minEmitted)
    })
    val tmp = Files.createTempFile(Paths.get(dir), ".tmp-pstate", ".json")
    Files.writeString(tmp, Serialization.write(dto))
    Files.move(tmp, statePath, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def loadPlannerState(): Option[graft.planner.PlannerState] =
    if (!Files.exists(statePath)) None
    else {
      val dto = Serialization.read[StateFile](Files.readString(statePath))
      Some(graft.planner.PlannerState(dto.kPrime, dto.baseVersion,
        dto.nodes.map(e => e.node -> graft.planner.NodeResult(
          e.candidates.toVector, e.exhausted,
          if (e.minEmitted == -1.0) Double.PositiveInfinity else e.minEmitted)).toMap))
    }
}

object Checkpoint {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  // top-level (no $outer) so json4s can reflectively construct them
  private[state] final case class NodeEntry(node: Int, candidates: List[graft.planner.Region],
      exhausted: Boolean, minEmitted: Double)
  private[state] final case class StateFile(kPrime: Int, baseVersion: Long, nodes: List[NodeEntry])
}
