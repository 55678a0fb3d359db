package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Connected-components semantics of [[Dedup.nearDupClusters]]: pairs are
  * edges, a cluster is a component, the label is the component's min id. */
class DedupClustersSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clusters(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.nearDupClusters(pairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (1,3 never paired directly), triangle 10-11-12,
    // isolated pair 20-21
    val got = clusters((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("incremental merge equals full recompute, including cluster bridges") {
    // standing: {1,2} and {3,4}; the batch's doc 5 BRIDGES both (the
    // case where reusing either standing label is wrong — the merged
    // component must re-label to the common minimum), doc 8 extends a
    // standing cluster, and 6-7 arrive as a new standalone pair
    val standing = Dedup.nearDupClusters(
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    val newPairs = Seq((2L, 5L), (5L, 3L), (6L, 7L), (4L, 8L))
      .toDF("id_a", "id_b")
    val merged = Dedup.mergeClusters(standing, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = clusters((1L, 2L), (3L, 4L),
      (2L, 5L), (5L, 3L), (6L, 7L), (4L, 8L))
    assert(merged == full,
      s"incremental merge diverged from the full recompute: $merged vs $full")
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 1L, 6L -> 6L, 7L -> 6L))
  }

  test("random graphs: endpoints share labels, labels are component minima") {
    val edgeGen = Gen.listOfN(14, for {
      a <- Gen.chooseNum(0L, 19L); b <- Gen.chooseNum(0L, 19L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    (0 until 4).flatMap(i => edgeGen(Gen.Parameters.default, Seed(63L + i)))
      .foreach { edges =>
        val got = clusters(edges: _*)
        // reference: tiny in-memory union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        assert(got == want, s"edges=$edges")
      }
  }

  test("a 1000-link chain converges in O(log n) rounds, not O(diameter)") {
    // the adversarial case for plain min-label propagation (VERDICT r6
    // #4): a path graph 0-1-2-…-1000 has diameter 1000; the large-star/
    // small-star alternation must close it in ~log n rounds
    // localFinishEdges = 0 pins the ALL-DISTRIBUTED path: by default a
    // 1000-edge input would finish locally without a single round
    val edges = (0L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.nearDupClustersCounted(edges, 0L)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 1000L).toSet)
    assert(got.values.forall(_ == 0L), "every chain vertex joins component 0")
    // measured: 11 rounds (≈ 1.1·log₂ 1000); 15 leaves margin while still
    // failing instantly if anyone regresses to O(diameter) propagation
    assert(rounds <= 15, s"chain took $rounds rounds — not O(log n)")
  }

  // allocation isolated in its own frame: once it returns, nothing
  // reachable references the result plan, so the GC poll below can
  // observe the ContextCleaner freeing the labels blocks (references
  // held in the SAME frame — even dead locals — defeat the poll)
  private def runAndMeasure(): Unit = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (labels, _) = Dedup.nearDupClustersCounted(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"), 0L)
    assert(labels.count() == 5L)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    // every per-round edge handle — including the one live at convergence,
    // which used to stay pinned for the app's lifetime — is freed inside
    // the call; the single surviving block set is the labels RDD the
    // returned plan reads
    assert(added.size <= 1, s"leaked persisted RDDs from the loop: $added")
  }

  test("no loop persist handle outlives the call (ADVICE r7 #1)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // two back-to-back calls: each may leave its own labels RDD pinned
    // while recently used (the driver keeps a transient reference to the
    // latest query's RDDs until displaced), but the FIRST call's blocks
    // must be collectable by the time the second settles — the pre-fix
    // code pinned one edge set per call for the app's lifetime, which
    // shows up here as a tail that never drops below 2
    runAndMeasure()
    runAndMeasure()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var tail = (sc.getPersistentRDDs.keySet -- before).size
    while (tail > 1 && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
      tail = (sc.getPersistentRDDs.keySet -- before).size
    }
    assert(tail <= 1,
      s"$tail label/edge block sets still pinned after two calls — " +
        "handles are leaking instead of being reference-tracked")
  }

  test("local finish equals the all-distributed fixpoint on random graphs") {
    // the default path collects the contracted edge set and closes it
    // with a sequential union-find; the two paths must be row-identical —
    // same vertices, same component-min labels — on every graph shape
    val edgeGen = Gen.listOfN(16, for {
      a <- Gen.chooseNum(0L, 23L); b <- Gen.chooseNum(0L, 23L) if a != b
    } yield (a, b))
    (0 until 4).flatMap(i => edgeGen(Gen.Parameters.default, Seed(17L + i)))
      .foreach { edges =>
        val df = edges.toDF("id_a", "id_b")
        val local = Dedup.nearDupClustersCounted(df)._1
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Dedup.nearDupClustersCounted(df, 0L)._1
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(local == dist, s"paths diverged on edges=$edges")
      }
  }

  test("an input over the local-finish bound still takes distributed rounds") {
    // threshold BETWEEN the input size and the contracted size: the first
    // rounds must run distributed, the tail may close locally — and the
    // answer is still the chain's single component
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.nearDupClustersCounted(edges, 150L)
    assert(rounds >= 1, "contraction below the bound requires at least one round")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 200L).toSet)
    assert(got.values.forall(_ == 0L))
  }

  test("every vertex appears exactly once and survivors are labels") {
    val df = Dedup.nearDupClusters(
      Seq((5L, 3L), (3L, 9L), (7L, 8L)).toDF("id_a", "id_b"))
    assert(df.groupBy("id").count().filter(col("count") > 1).isEmpty)
    val labels = df.select("label").distinct().as[Long].collect().toSet
    assert(labels == Set(3L, 7L))
  }
}
