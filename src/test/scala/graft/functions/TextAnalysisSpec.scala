package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rareWordRatio is exact under Zipf skew (one word dominating the join key)") {
    import spark.implicits._
    // the q42 watch item: the words⋈vocab join key is Zipf-distributed at corpus scale — a
    // single hot word ('the' here, in EVERY position of half the corpus) must neither crash the
    // skew-handled shuffle join nor perturb the counts
    val n = 2000
    val docs = (0 until n).map { i =>
      val text =
        if (i % 2 == 0) Seq.fill(50)("the").mkString(" ") // hot key: 50k instances of one word
        else s"the unique$i word$i" // 1 hot + 2 singleton words
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.rareWordRatio(docs, minCount = 100L)
      .orderBy("doc_id").collect()
    assert(out.length === n)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 2 == 0) {
        assert(r.getAs[Long]("n_words") === 50L)
        assert(r.getAs[Long]("n_rare") === 0L) // 'the' count ≫ minCount
        assert(r.getAs[Long]("rare_x1e4") === 0L)
      } else {
        assert(r.getAs[Long]("n_words") === 3L)
        assert(r.getAs[Long]("n_rare") === 2L) // the two singletons are rare, 'the' is not
        assert(r.getAs[Long]("rare_x1e4") === math.round(2.0 * 10000 / 3))
      }
    }
    // structural check, not just observed behavior: the word-key join must be the LeftSemi probe
    // of per-(doc, word) COUNTS against the RARE vocab slice — matched keys bounded by minCount,
    // probe rows for the head bounded at one per containing doc — never a full words⋈vocab join
    // that puts every OCCURRENCE of the Zipf head on one partition
    val optimized = TextAnalysis.rareWordRatio(docs, 100L).queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), s"expected the rare-tail semi-join in:\n$optimized")
  }
}
