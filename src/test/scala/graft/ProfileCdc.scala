package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (test scope, r21): decompose the two most expensive
  * cold entries — `stream_graph_cdc` / `stream_dedup_cdc` — into their
  * epoch phases: base-epoch build, clone, corruption appends, the
  * multi-micro-batch drain, and the settle. The entries themselves are
  * probes; the cost is the once-per-session CDC maintenance epoch, and
  * this names which phase owns it (VERDICT r20 #2: "a written breakdown
  * of where the remaining floor lives"). Phases mirror
  * [[StreamingQueries.graphCdcNamesFor]] / `bandCdcNamesFor` verbatim.
  */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.streaming.{CdcStream, IngestStream}
    val s = spark

    // ---- graph CDC epoch, phase by phase -----------------------------
    val base = time("graph: base graph epoch (graphIndexFor)") {
      GraphQueries.graphIndexFor(s, dir)
    }
    val evDir = time("graph: event fixture dir") {
      StreamingQueries.cdcVecEventsDir(s, dir)
    }
    val src = "graft_prof_graph_src"
    val dest = "graft_prof_graph_dest"
    val paths = (1 to 3).map(_ => java.nio.file.Files
      .createTempDirectory("graft_prof_graph_").toString)
    time("graph: cloneGraphIndex") {
      graft.operators.GraphOps.cloneGraphIndex(s, base, src, paths(0))
    }
    val emb = Tables.embeddings(s, dir)
    val dups = SimilarityQueries.dupVectors(emb)
      .filter(col("vec_id") >= 100000)
      .select(col("vec_id"), col("embedding"))
    time("graph: append wave 1 (negated %20==0)") {
      graft.operators.GraphOps.appendToGraphIndex(s, src,
        dups.filter(col("vec_id") % 20 === 0)
          .select(col("vec_id"),
            expr("transform(embedding, x -> -x)").cast("array<float>")
              .as("embedding")))
    }
    time("graph: append wave 2 (%20==4 true)") {
      graft.operators.GraphOps.appendToGraphIndex(s, src,
        dups.filter(col("vec_id") % 20 === 4))
    }
    time("graph: append wave 3 (poison twins)") {
      graft.operators.GraphOps.appendToGraphIndex(s, src,
        emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")))
    }
    time("graph: drain 5 micro-batches (cdcGraphSink)") {
      val ev = CdcStream.readEventStream(s, evDir, maxFilesPerTrigger = 1)
      IngestStream.cdcGraphSink(ev, src, paths(1)).awaitTermination()
    }
    time("graph: settleGraphUpserts") {
      IngestStream.settleGraphUpserts(s, src, dest, paths(2))
    }
    time("graph: probe (the bench entry's own work)") {
      graft.operators.GraphOps.probeGraphIndex(s, dest,
          emb.filter(col("vec_id") < 10), k = 3)
        .orderBy(col("query_id"), col("rk")).count()
    }

    // ---- band CDC epoch, phase by phase ------------------------------
    val bEvDir = time("band: event fixture dir") {
      StreamingQueries.bandCdcEventsDir(s, dir)
    }
    val bSrc = "graft_prof_band_src"
    val bDest = "graft_prof_band_dest"
    val bPaths = (1 to 3).map(_ => java.nio.file.Files
      .createTempDirectory("graft_prof_band_").toString)
    val corpus = TextQueries.dupCorpus(Tables.documents(s, dir))
    val stale = corpus
      .filter(col("doc_id") < 100000 && col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, concat(lit("xdup "), col("text")))
          .otherwise(col("text")).as("text"))
    val poison = corpus
      .filter(col("doc_id") >= 100000 && col("doc_id") < 200000)
      .select((col("doc_id") + 400000).as("doc_id"), col("text"))
    time("band: writeBandIndex (stale ∪ poison)") {
      graft.operators.Dedup.writeBandIndex(
        stale.unionByName(poison), "doc_id", "text", bSrc, bPaths(0))
    }
    time("band: drain 5 micro-batches (cdcBandSink)") {
      val ev = CdcStream.readEventStream(s, bEvDir, maxFilesPerTrigger = 1)
      IngestStream.cdcBandSink(ev, bSrc, bPaths(1)).awaitTermination()
    }
    time("band: settleBandUpserts") {
      IngestStream.settleBandUpserts(s, bSrc, bDest, bPaths(2))
    }
    time("band: probe (the bench entry's own work)") {
      graft.operators.Dedup.probeBandIndex(s, bDest,
          corpus.filter(col("doc_id") >= 100000), "doc_id", "text",
          threshold = 0.5)
        .orderBy(col("new_id"), col("old_id")).count()
    }
    spark.stop()
  }
}
