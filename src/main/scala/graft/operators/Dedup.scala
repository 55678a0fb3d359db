package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY §2.3):
  * exact (hash groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * 100 TB design: nothing here ever does an unbucketed pairwise compare.
  * - exact dedup is a single hash-shuffle on the content hash;
  * - MinHash/LSH shuffles once on (band, key) — candidate pairs only form
  *   inside a bucket, so the quadratic blowup is bounded by bucket size
  *   (salt or raise band count if a bucket ever gets hot);
  * - SimHash pairs join on signature bytes (hamming-ball probing);
  * - verification (true Jaccard) runs only on the candidate pairs.
  * No driver-side collection anywhere.
  */
object Dedup {

  /** Exact dedup on a content hash: one row per distinct content with the
    * smallest id as the deterministic survivor plus the duplicate count.
    * Single shuffle on the hash; at scale this is the cheapest possible
    * formulation (partial min/count combine map-side). */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Candidate near-dup pairs via MinHash + LSH banding over `k`-token
    * shingles, verified with true set-Jaccard.
    *
    * Pipeline: shingle → `numHashes` md5-min signature → `numBands` band
    * keys → shuffle on (band, key) → pairs within buckets (id_a < id_b,
    * distinct across bands) → join signatures back → Jaccard filter.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, numBands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val toks = TextOps.tokens(col(textCol))
    val sh = df.select(col(idCol).as("doc_id"), TextOps.shingles(toks).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("mh", TextOps.minhashSignature(col("shingles"), numHashes))
    val bands = sh.select(col("doc_id"), posexplode(
      array((0 until numBands).map { b =>
        concat_ws("|", (0 until rowsPerBand).map(r => col("mh")(b * rowsPerBand + r)): _*)
      }: _*)).as(Seq("band", "bkey")))
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairs
      .join(sh.select(col("doc_id"), col("shingles").as("sh_a")), col("id_a") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("shingles").as("sh_b")), col("id_b") === col("doc_id")).drop("doc_id")
      .select(col("id_a"), col("id_b"),
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash signatures: (id, simhash16). Near-dups share (or almost
    * share) signatures; identical-signature buckets are exact-bucket
    * groupBy — no pairwise work. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextOps.simhash16(TextOps.tokens(col(textCol))).as("simhash"))

  /** n-gram Jaccard pairs within a pre-existing bucket column (e.g. a
    * source/category): quadratic only inside buckets. */
  def jaccardPairsWithinBucket(df: DataFrame, idCol: String, textCol: String,
      bucketCol: String, threshold: Double): DataFrame = {
    val sh = df.select(col(bucketCol).as("bucket"), col(idCol).as("doc_id"),
      TextOps.shingles(TextOps.tokens(col(textCol))).as("shingles"))
      .filter(size(col("shingles")) > 0)
    sh.as("a").join(sh.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(TextOps.jaccard(col("a.shingles"), col("b.shingles")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
