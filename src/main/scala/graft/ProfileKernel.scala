package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Builder-side dev tool: pure-JVM microbenchmark of the ShingleHash
  * kernel, isolating its per-shingle cost from Spark plan overhead.
  * Usage: runMain graft.ProfileKernel
  */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val words = Array.fill(500)(rnd.alphanumeric.take(3 + rnd.nextInt(8)).mkString)
    // ~7700 docs x ~52 shingles of 3 tokens, matching sf0.1 shape
    val docs: Array[ArrayData] = Array.tabulate(7700) { _ =>
      val toks = Array.fill(54)(words(rnd.nextInt(words.length)))
      val sh = toks.sliding(3).map(w => UTF8String.fromString(w.mkString(" "))).toArray
      ArrayData.toArrayData(sh.asInstanceOf[Array[AnyRef]])
    }
    val nSh = docs.map(_.numElements()).sum
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      var acc = 0L
      docs.foreach { d => acc += graft.functions.ShingleHash.sketch(d).getArray(0).numElements() }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[kernel] run$i sketch: $s%.3f s for $nSh shingles (${s * 1e9 / nSh}%.0f ns/shingle) acc=$acc")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      var acc = 0L
      docs.foreach { d => acc += graft.functions.ShingleHash.hashedSet(d).numElements() }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[kernel] run$i hashedSet: $s%.3f s for $nSh shingles (${s * 1e9 / nSh}%.0f ns/shingle) acc=$acc")
    }
  }
}
