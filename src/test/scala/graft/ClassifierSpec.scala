package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

/** Hand-computed gates for the perceptron trainer: the exact first-two
  * epoch arithmetic on a toy set, convergence on a separable set, and
  * the feature/label frame's weak-label agreement with gopherStats. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // feats schema: doc_id, y, x0..x5, is_train
  private def toyFeats(rows: Seq[(Long, Long, Long, Long)]) =
    rows.map { case (id, y, x1, x2) =>
      (id, y, 1L, x1, x2, 0L, 0L, 0L, true) }
      .toDF("doc_id", "y", "x0", "x1", "x2", "x3", "x4", "x5", "is_train")

  test("epoch 1 from w=0 treats every row as misclassified: w1 = sum y*x") {
    // rows: (+1, x=(1,2,3)), (-1, x=(1,5,1))
    val f = toyFeats(Seq((1L, 1L, 2L, 3L), (2L, -1L, 5L, 1L)))
    val t = Classifier.train(f, epochs = 1)
    // w1 = (+1)*(1,2,3) + (-1)*(1,5,1) = (0, -3, 2)
    assert(t.epochs.head.take(3).toSeq == Seq(0L, -3L, 2L))
  }

  test("epoch 2 updates only the still-misclassified rows") {
    val f = toyFeats(Seq((1L, 1L, 2L, 3L), (2L, -1L, 5L, 1L)))
    val t = Classifier.train(f, epochs = 2)
    // w1 = (0,-3,2): row1 margin = -6+6 = 0 -> y*m = 0 <= 0 MISclassified;
    // row2 margin = -15+2 = -13 -> y*m = 13 > 0 correct.
    // w2 = w1 + (+1)*(1,2,3) = (1,-1,5)
    assert(t.epochs(1).take(3).toSeq == Seq(1L, -1L, 5L))
  }

  test("separable toy set converges: final epochs stop updating") {
    // y = sign(x1 - 3): clearly separable with margin
    val f = toyFeats((1L to 10L).map(i =>
      (i, if (i > 3) 1L else -1L, i, 1L)))
    val t = Classifier.train(f, epochs = 12)
    val last = t.epochs.last.toSeq
    assert(t.epochs(10).toSeq == last, "converged weights must be stable")
    // and the converged weights separate the training set
    val w = t.epochs.last
    val wrong = Classifier.score(f.withColumn("is_train", lit(false)), w)
      .filter((col("label") === 1L) =!= col("pred")).count()
    assert(wrong == 0)
  }

  test("labeledFeatures weak label matches gopherStats keep verdict") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val lf = Classifier.labeledFeatures(docs).select(col("doc_id"),
      (col("y") === 1L).as("keep_lf"))
    val gs = graft.operators.TextOps.gopherStats(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("keep_gs"))
    assert(lf.join(gs, "doc_id").filter(col("keep_lf") =!= col("keep_gs"))
      .count() == 0)
  }
}
