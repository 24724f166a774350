package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB): every variant is shuffle-minimal —
  *   - exact dedupe is one hash-partitioned groupBy on a 16-byte key;
  *   - MinHash signatures are narrow per-row transforms; the LSH
  *     candidate join shuffles only (band_key, doc_id, signature), never
  *     the document text;
  *   - SimHash is one explode + partial-aggregated groupBy (map-side
  *     combine keeps the shuffle at one row per (doc, nothing) — the 16
  *     bit-sums ride in a single aggregation buffer);
  *   - verification joins carry pre-tokenized word sets, not raw text.
  */
object Dedup {

  /** Exact dedupe: group by content hash, keep the smallest id.
    * Returns (fingerprint, keeper_id, n_copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each salt i, the lexicographic min of
    * md5(i + "|" + shingle) over the document's word-3-gram shingles.
    * Null signature when the doc has no shingle (shorter than 3 words).
    */
  def minhashSig(text: Column, numHashes: Int): Column = {
    val sh = TextOps.shingles(text, 3)
    struct((0 until numHashes).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i|"), s)))).as(s"mh$i")
    }: _*)
  }

  /** MinHash + LSH near-dup candidate pairs, exact-Jaccard-confirmed.
    *
    * 1. signature per doc (narrow);
    * 2. band key = concat of the band's minhashes;
    * 3. self-join on band key (candidates only — this is the LSH bucket
    *    join; at scale the join input is tiny: (band_key, id, words));
    * 4. exact word-set Jaccard confirm ≥ threshold (milli-scaled).
    *
    * Returns (id_a, id_b, jaccard_milli) with id_a < id_b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 jaccardMilliThreshold: Long): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      array_distinct(TextOps.words(col(textCol))).as("wset"),
      minhashSig(col(textCol), 4).as("sig"))
      .withColumn("band", concat(col("sig.mh0"), col("sig.mh1")))
      .where(col("sig.mh0").isNotNull)
    val a = sig.select(col("band"), col("id").as("id_a"), col("wset").as("w_a"))
    val b = sig.select(col("band"), col("id").as("id_b"), col("wset").as("w_b"))
    val inter = size(array_intersect(col("w_a"), col("w_b")))
    val union = size(array_distinct(concat(col("w_a"), col("w_b"))))
    a.join(b, Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(lit(1000.0) * inter / union).cast("long").as("jaccard_milli"))
      .where(col("jaccard_milli") >= jaccardMilliThreshold)
      .distinct()
  }

  /** SimHash (16-bit): bit j is set when, summed over all tokens, the top
    * bit of hex nibble j of md5(token) leans 1 (+1/-1 vote, strict > 0).
    * Explode + groupBy with map-side partial aggregation — one shuffle row
    * per doc.
    */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f").map(_.asInstanceOf[Any])
    val exploded = df
      .select(col(idCol).as("id"), explode(TextOps.words(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val sums = (0 until 16).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin(hi: _*), 1).otherwise(-1)).as(s"s$j")
    }
    exploded.groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 16).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** N-gram Jaccard profile per document: shingle counts (total + distinct)
    * — the per-doc half of n-gram Jaccard similarity; pairwise confirm is
    * [[minhashLsh]]'s step 4.
    */
  def ngramProfile(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = TextOps.shingles(col(textCol), n)
    df.select(col(idCol).as("id"),
      size(sh).as("n_shingles"),
      size(array_distinct(sh)).as("n_distinct_shingles"))
  }
}
