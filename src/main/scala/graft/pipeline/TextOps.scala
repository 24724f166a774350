package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID, fingerprinting, shingling.
  *
  * Narrow per-row transforms, zero shuffle — embarrassingly parallel at
  * 100 TB. Catalyst column expressions except where a scalar pass is
  * strictly faster (see [[shingles]]).
  *
  * Numeric outputs are integers (counts / milli-scaled floors) so results
  * are bit-exact across engines (oracle-friendly) — no float drift.
  */
object TextOps {

  /** Whitespace tokenization; empty/blank text → empty array. */
  def words(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-style pre-tokenizer count: the GPT-2 pre-tokenization shape
    * (optional leading space + letter run | digit run | punctuation run)
    * without the lookahead clause — RE2-compatible, so the same pattern
    * runs verbatim in DuckDB and the token counts are cross-engine
    * exact. Approximates subword-tokenizer budget far better than
    * whitespace splitting on punctuation-dense text. Narrow, codegen.
    */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"

  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(words(text)))

  /** Word n-gram shingles (space-joined); fewer than n words → empty.
    *
    * Scalar sliding window over the tokenized array: the Column
    * formulation (`transform(sequence(...), i -> element_at(ws, i+k))`)
    * embeds the whole `split` subtree inside the lambda, so the regex
    * tokenization re-ran per element — O(words²) per row, measured as the
    * dominant cost of every shingle-based operator.
    */
  def shingles(text: Column, n: Int): Column = shinglesUdf(words(text), lit(n))

  private val shinglesUdf = udf { (ws: Seq[String], n: Int) =>
    if (ws == null || ws.size < n) Seq.empty[String]
    else ws.iterator.sliding(n).withPartial(false).map(_.mkString(" ")).toSeq
  }

  /** Document fingerprint: md5 of whitespace-collapsed lowercased text.
    * (Content-defined exact-dup key; analog of the reference's
    * block-digest identity, src/digest.rs — but normalized for text.)
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Stopword hits for a fixed word list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "los")
  val DeStop: Seq[String] = Seq("der", "die", "und", "das", "ist", "von", "ein")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "de", "un", "est")

  /** N-gram/stopword language-ID heuristic. Deterministic argmax with fixed
    * tiebreak order en > es > de > fr > und. Returns struct of per-language
    * hit counts + predicted label.
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, EnStop)
    val es = stopwordHits(text, EsStop)
    val de = stopwordHits(text, DeStop)
    val fr = stopwordHits(text, FrStop)
    val pred = when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
    struct(en.as("c_en"), es.as("c_es"), de.as("c_de"), fr.as("c_fr"), pred.as("lang_pred"))
  }

  /** Quality score components + milli-scaled composite:
    * 500 * stopword_ratio + 500 * unique_ratio, floored to a long.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val uniq = distinctTokenCount(text)
    val stops = stopwordHits(text, EnStop)
    val qMilli = when(n === 0, lit(0L)).otherwise(
      floor(lit(500.0) * stops / n + lit(500.0) * uniq / n).cast("long"))
    struct(n.as("n_tokens"), uniq.as("n_unique"), stops.as("n_stop"),
      punctCount(text).as("n_punct"), qMilli.as("quality_milli"))
  }
}
