package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Deterministic corpus-trained byte-pair encoding (VERDICT r14 #3):
  * real training-data budgeting is SUBWORD-token-based, so the
  * whitespace counts `text_token_count` / `pipeline_token_budget` use
  * get a production-shaped twin here.
  *
  * The spec (implemented identically by this object and the DuckDB
  * mirror in [[graft.TextQueries]], so every artifact hash-gates):
  *
  *  - initial symbols: the word's characters; training corpus: the
  *    whitespace word-frequency table ([[TextOps.tokens]]).
  *  - each of [[NumMerges]] steps picks the adjacent symbol pair with
  *    the highest frequency-weighted sliding-window count, ties broken
  *    lexicographically by (left, right) — fully deterministic.
  *  - the merge applies LEFT-TO-RIGHT, non-overlapping (in `aaaa`,
  *    merge (a,a) produces `[aa, aa]`, never `[a, aa, a]`) — the
  *    standard greedy BPE application.
  *  - token ids: the distinct symbols of the final word states, sorted
  *    lexicographically, numbered from 0.
  *
  * Scale shape: training reads ONE map-side-combined word-count
  * aggregate and materializes a VOCAB-bounded model on the driver (the
  * same bounded-model epoch as the unigram/bigram LM tables — a
  * tokenizer-train run in a real pipeline is exactly this); encoding
  * broadcasts the model and runs narrow per-partition work with
  * per-partition word memoization — scan-bound, zero shuffle, the only
  * wide edge is whatever the downstream query (budget window) needs. */
object Bpe {

  /** Fixed merge count — threaded through BOTH engines (the oracle
    * generates one CTE layer per merge). */
  val NumMerges = 12

  /** A trained tokenizer: the ordered merge table, each training
    * word's final symbol state, and the symbol → id vocabulary. */
  case class Model(merges: Seq[(String, String)],
      wordSyms: Map[String, Array[String]], vocab: Map[String, Int])

  /** Greedy left-to-right non-overlapping application of one merge. */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Apply the full merge sequence to one word (for words outside the
    * training table — the rules are global, so any word encodes). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }

  /** Train [[NumMerges]] greedy merges over a word-frequency table —
    * pure, deterministic, vocab-bounded driver work (microseconds next
    * to the corpus aggregate that feeds it). */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int = NumMerges): Model = {
    var states = wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      states.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        states = states.map { case (syms, c) =>
          (applyMerge(syms, best._1, best._2), c)
        }
        step += 1
      }
    }
    val wordSyms = wordCounts.map(_._1).zip(states.map(_._1)).toMap
    val vocab = wordSyms.valuesIterator.flatten.toSeq.distinct.sorted
      .zipWithIndex.toMap
    Model(merges.toSeq, wordSyms, vocab)
  }

  // one trained model per (session, dir) — the train epoch runs once
  // and every BPE query in the session reuses it (the in-memory analog
  // of EpochRegistry's table epochs). Keyed by EpochRegistry's WEAK
  // session uuid, not the SparkSession object (ADVICE r15): the map
  // never pins a stopped session, and the vocab-bounded Model is the
  // only thing retained. The corpus aggregate runs OUTSIDE any map
  // lock (double-checked get/putIfAbsent) so two sessions training
  // concurrently never serialize on a ConcurrentHashMap bin.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Model]()

  /** The tokenizer-train epoch: one word-count aggregate (map-side
    * combined — the only corpus pass) collected to the driver
    * (VOCAB-bounded, like the LM model tables) and trained in memory. */
  def modelFor(spark: SparkSession, docs: DataFrame, dir: String): Model = {
    val key = (graft.EpochRegistry.idOf(spark), dir)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val wc = docs
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val built = train(wc)
      val raced = cache.putIfAbsent(key, built)
      if (raced != null) raced else built
    }
  }

  /** Per-doc encoded-stream summary, every field integer-exact: token
    * count, id sum, and a position-weighted checksum Σ id·pos (1-based
    * global position) that gates token ORDER, not just the bag. */
  case class DocTokens(doc_id: Long, n_tokens: Long, sum_ids: Long,
      checksum: Long)

  /** Encode every doc against the broadcast model: narrow
    * mapPartitions (the media-decode shape), per-partition word
    * memoization — word tokenization work is vocab-bounded per
    * partition, the stream fold is O(tokens). */
  def encodeDocs(docs: DataFrame, model: Model): Dataset[DocTokens] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Array[Int]]
        it.map { case (id, text) =>
          var n = 0L; var sum = 0L; var chk = 0L; var pos = 0L
          text.split(" ").foreach { w =>
            if (w.nonEmpty) {
              val ids = memo.getOrElseUpdate(w,
                m.wordSyms.getOrElse(w, encodeWord(w, m.merges))
                  .map(s => m.vocab(s)))
              var i = 0
              while (i < ids.length) {
                n += 1; pos += 1
                sum += ids(i); chk += ids(i).toLong * pos
                i += 1
              }
            }
          }
          DocTokens(id, n, sum, chk)
        }
      }
  }

  /** (doc meta passthrough, BPE token count) per doc — the budget
    * query's input: quality is computed as a Column BEFORE the narrow
    * encode stage so the whole per-doc pass stays in one scan. */
  case class DocMetaTokens(doc_id: Long, lang: String, _q: Double,
      n_tokens: Long)

  def countDocsWithMeta(docs: DataFrame, model: Model): Dataset[DocMetaTokens] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).cast("double").as("q"), col("text"))
      .as[(Long, String, Double, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Long]
        it.map { case (id, lang, q, text) =>
          var n = 0L
          text.split(" ").foreach { w =>
            if (w.nonEmpty)
              n += memo.getOrElseUpdate(w,
                m.wordSyms.getOrElse(w, encodeWord(w, m.merges)).length.toLong)
          }
          DocMetaTokens(id, lang, q, n)
        }
      }
  }
}
