package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data pipelines — language ID, quality scoring, token
  * counting, document fingerprinting. All pure `functions._` compositions (codegen'd, no UDFs),
  * each with an exact ANSI-SQL twin for the DuckDB oracle (SparkEntry.oracleSql).
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, single digits, single punctuation marks. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Punctuation character ratio ×10000 as bigint (exact cross-engine compare). */
  def punctRatioX1e4(text: Column): Column =
    round(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
      / length(text) * 10000).cast("long")

  /** Mean word length ×10000 as bigint. */
  def meanWordLenX1e4(text: Column): Column =
    round(length(regexp_replace(trim(text), "\\s+", "")).cast("double")
      / wsTokenCount(text) * 10000).cast("long")

  /** Occurrences of ` word ` in ` lower(text) ` via replace-counting (portable to ANSI SQL). */
  def phraseCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val needle = s" $word "
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(needle), "")))
      / needle.length).cast("long")
  }

  /** Stopword-hit language scores; deterministic argmax (alphabetical tie-break). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangStopwords.map { case (lang, ws) =>
      lang -> ws.map(phraseCount(text, _)).reduce(_ + _)
    }

  /** Predicted language: the alphabetically-first language with the max stopword hits. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Simple quality score ×10000 (bigint): alpha-char ratio minus excess-punctuation penalty. */
  def qualityX1e4(text: Column): Column = {
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / length(text)
    round((alpha - punct * lit(2.0)) * 10000).cast("long")
  }

  /** Document fingerprint: md5 over the first 8 normalized words (prefix fingerprinting). */
  def fingerprint(text: Column): Column = {
    val words = split(trim(lower(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))), "\\s+")
    md5(concat_ws(" ", slice(words, 1, 8)))
  }

  /** Normalized text for exact dedup: lowercase, strip non-alnum, collapse whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))), "\\s+", " ")

  /** Corpus-relative rarity: per document, the fraction of whitespace tokens whose CORPUS
    * frequency is below `minCount` (×10000 as bigint). Unlike the per-row quality columns above,
    * this needs a corpus-wide aggregate — the quality signal a single row can't compute.
    *
    * Scale shape, built around where Zipf skew can and cannot hurt:
    *  - every aggregate keyed on `w` is safe regardless of skew — partial (map-side) aggregation
    *    collapses the head word to one row per task before its exchange;
    *  - the one skew-VULNERABLE exchange is the word-key JOIN. Everything routed through it is
    *    first collapsed to (doc_id, w, c) — keyed on (doc_id, w), a skew-free exchange — so the
    *    probe side carries at most ONE row per document for the head word (not one per
    *    occurrence), and it joins only the RARE slice of the vocabulary (cnt < minCount), so a
    *    matched key contributes < minCount rows of output by definition. The residual probe
    *    imbalance (head word present in many docs) is the AQE-skew-split case, at 1/avg-tf the
    *    volume a naive words⋈vocab join would put there.
    * Token payloads never move — only (doc_id, word, count) triples.
    *
    * `df` needs (doc_id, text); returns (doc_id, n_words, n_rare, rare_x1e4).
    */
  def rareWordRatio(df: org.apache.spark.sql.DataFrame, minCount: Long): org.apache.spark.sql.DataFrame = {
    val words = df.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val docWord = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val rareVocab = docWord.groupBy("w").agg(sum("c").as("cnt"))
      .filter(col("cnt") < minCount).select("w")
    val perDocRare = docWord.join(rareVocab, Seq("w"), "left_semi")
      .groupBy("doc_id").agg(sum("c").as("n_rare"))
    // both sides are doc_id aggregates → hash-partitioned alike, so this join adds no exchange
    docWord.groupBy("doc_id").agg(sum("c").as("n_words"))
      .join(perDocRare, Seq("doc_id"), "left")
      .withColumn("n_rare", coalesce(col("n_rare"), lit(0L)))
      .withColumn("rare_x1e4", // (rare·10⁴)/n order matches the SQL twin bit-for-bit
        round(col("n_rare").cast("double") * 10000 / col("n_words")).cast("long"))
  }
}
