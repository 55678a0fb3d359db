package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r9 #3 "done" criterion: three create/use/stop session
  * generations show no registry growth and no orphaned temp dirs. The
  * old per-file ConcurrentHashMaps keyed by the SparkSession OBJECT
  * held strong references to stopped sessions forever and never
  * reclaimed the UUID tables / temp dirs — an unbounded slow leak
  * across session churn in one JVM (exactly what a test suite, or a
  * long-lived serving process cycling sessions, does). */
class EpochRegistryLifecycleSpec extends AnyFunSuite {

  test("entries and temp dirs are reclaimed when the owning session stops") {
    (1 to 3).foreach { gen =>
      val s = SparkTestSession.spark // revives a fresh context per generation
      val uuid = EpochRegistry.idOf(s)
      // a representative resource: a catalog table + a temp dir, built
      // through the same acquire path the real indexes use
      val table = s"graft_lifecycle_spec_$gen"
      val got = EpochRegistry.acquire(s, "lifecycle_spec", s"gen$gen") { () =>
        val path = Files.createTempDirectory("graft_lifecycle_spec_").toString
        import s.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
          .write.mode("overwrite").format("parquet")
          .option("path", path).saveAsTable(table)
        EpochRegistry.Resource(table, dropTables = Seq(table),
          deleteDirs = Seq(path))
      }
      assert(got == table)
      // scope to this spec's kind — on the FIRST generation the shared
      // session may carry other suites' index entries (they evict with
      // the same context stop below)
      val mine = EpochRegistry.liveEntries(uuid, Some("lifecycle_spec"))
      val dirs = mine.flatMap(_.deleteDirs)
      assert(dirs.nonEmpty && dirs.forall(d => Files.exists(Paths.get(d))))
      // acquire is per-key idempotent: no second build, no second entry
      assert(EpochRegistry.acquire(s, "lifecycle_spec", s"gen$gen")(() =>
        fail("build must not re-run for a live key")) == table)
      assert(EpochRegistry.liveEntries(uuid, Some("lifecycle_spec")).size == 1)

      s.stop() // SparkContext.stop drains the listener bus before returning

      assert(EpochRegistry.liveEntries(uuid).isEmpty,
        s"generation $gen left registry entries after stop")
      dirs.foreach(d => assert(!Files.exists(Paths.get(d)),
        s"generation $gen orphaned temp dir $d"))
    }
    // three generations, zero accumulation (other suites' live session
    // entries would be keyed by a different, still-running context; at
    // this point OUR three are gone)
  }

  test("GC'd sessions' entries are swept on acquire within ONE live context (ADVICE r10)") {
    val parent = SparkTestSession.spark
    // churn: newSession clones acquire a resource each, then become
    // unreachable — the pattern of a long-lived server cycling sessions
    // while its SparkContext stays up. Before the r10 sweep, these dirs
    // survived until APPLICATION end.
    def churn(gen: Int): (String, java.lang.ref.WeakReference[AnyRef], String) = {
      val clone = parent.newSession()
      val uuid = EpochRegistry.idOf(clone)
      val dir = EpochRegistry.acquire(clone, "churn_spec", s"gen$gen") { () =>
        val path = Files.createTempDirectory("graft_churn_spec_").toString
        EpochRegistry.Resource(path, deleteDirs = Seq(path))
      }
      (uuid, new java.lang.ref.WeakReference[AnyRef](clone), dir)
    }
    val gens = (1 to 3).map(churn)
    gens.foreach { case (uuid, _, dir) =>
      assert(EpochRegistry.liveEntries(uuid, Some("churn_spec")).size == 1)
      assert(Files.exists(Paths.get(dir)))
    }
    // drop the only strong references; wait for the collector to clear
    // the weak refs (same signal the registry's owner refs see)
    gens.foreach { case (_, ref, _) =>
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (ref.get() != null && System.nanoTime() < deadline) {
        System.gc(); Thread.sleep(50)
      }
      assert(ref.get() == null, "session clone not collected within 30s")
    }
    // the NEXT acquire — from any session — sweeps the dead owners
    EpochRegistry.acquire(parent, "churn_spec", "sweep_trigger")(() =>
      EpochRegistry.Resource("live"))
    gens.foreach { case (uuid, _, dir) =>
      assert(EpochRegistry.liveEntries(uuid).isEmpty,
        "dead session's registry entries not swept")
      assert(!Files.exists(Paths.get(dir)),
        s"dead session's temp dir not reclaimed: $dir")
    }
  }
}
