package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.table.Dv

/** Property-style tests (seeded random, 200 trials) for the deletion-vector run codec —
  * encode/decode/contains/union against a plain Set oracle over adversarial position sets
  * (sparse scatter, dense ranges, mixtures).
  */
class DvCodecSpec extends AnyFunSuite {

  private def randomPositions(rnd: scala.util.Random): Array[Long] = {
    val scatter = Array.fill(rnd.nextInt(200))(rnd.nextLong(5000L))
    val ranges = Array.fill(rnd.nextInt(10)) {
      val s = rnd.nextLong(5000L)
      s until (s + 1 + rnd.nextInt(64))
    }.flatten
    (scatter ++ ranges).distinct.sorted
  }

  test("fromPositions → encode → decode roundtrip; contains matches Set") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val positions = randomPositions(rnd)
      val runs = Dv.fromPositions(positions)
      val decoded = Dv.decode(Dv.encode(runs))
      assert(decoded.toSeq == runs.toSeq)
      assert(Dv.cardinality(runs) == positions.length)
      val set = positions.toSet
      val probes = (positions.toSeq ++ positions.map(_ + 1) ++ positions.map(_ - 1) ++
        Seq(0L, 1L, 5064L, Long.MaxValue / 2)).filter(_ >= 0)
      probes.foreach(p => assert(Dv.contains(runs, p) == set.contains(p), s"contains($p)"))
      assert(Dv.positionsIterator(runs).toSeq == positions.toSeq)
    }
  }

  test("fromPositions tolerates duplicates, rejects unsorted") {
    assert(Dv.fromPositions(Array(1L, 1L, 2L, 5L, 5L)).toSeq == Seq(1L, 3L, 5L, 6L))
    intercept[IllegalArgumentException](Dv.fromPositions(Array(5L, 1L)))
  }

  test("unionRuns matches Set union") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val (a, b) = (randomPositions(rnd), randomPositions(rnd))
      val u = Dv.unionRuns(Dv.fromPositions(a), Dv.fromPositions(b))
      assert(Dv.positionsIterator(u).toSeq == (a.toSet ++ b.toSet).toSeq.sorted)
      // normalized: strictly increasing, non-adjacent, non-empty runs
      (0 until u.length by 2).foreach { i =>
        assert(u(i) < u(i + 1))
        if (i + 2 < u.length) assert(u(i + 1) < u(i + 2))
      }
    }
  }

  test("empty and singleton edges") {
    assert(Dv.fromPositions(Array.empty[Long]).isEmpty)
    assert(Dv.decode(Dv.encode(Array.empty[Long])).isEmpty)
    assert(!Dv.contains(Array.empty[Long], 0L))
    val one = Dv.fromPositions(Array(7L))
    assert(one.toSeq == Seq(7L, 8L))
    assert(Dv.contains(one, 7L) && !Dv.contains(one, 6L) && !Dv.contains(one, 8L))
    assert(Dv.unionRuns(Array.empty[Long], one).toSeq == one.toSeq)
  }

  test("manifest line roundtrip") {
    val runs = Dv.fromPositions(Array(0L, 1L, 2L, 100L, 1000000000000L))
    val line = Dv.formatLine("part-00001-abc.parquet", runs)
    val (bn, card, bytes) = Dv.parseLine(line)
    assert(bn == "part-00001-abc.parquet")
    assert(card == 5L)
    assert(Dv.decode(bytes).toSeq == runs.toSeq)
    assert(Dv.parseLineHeader(line) == (("part-00001-abc.parquet", 5L)))
    intercept[IllegalArgumentException](Dv.parseLine("no-tabs-here"))
  }
}
