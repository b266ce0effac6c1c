package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PCA laws: unit loadings, the eigenvector residual shrinks with
  * iterations, a planted dominant direction is recovered, and fixed-point
  * centering makes the result partition-order independent (bit-equal). */
class PcaSpec extends SparkSpec {

  private def plantedDf = {
    val s = spark
    import s.implicits._
    // variance concentrated on dim 1: x = (noise, big signal, noise)
    val rnd = new scala.util.Random(7)
    (1 to 300).map { _ =>
      Tuple1(Array(rnd.nextFloat() * 0.1f,
        (rnd.nextFloat() - 0.5f) * 4f, rnd.nextFloat() * 0.1f))
    }.toDF("embedding")
  }

  test("unit norm, and the planted dominant direction is recovered") {
    val got = Pca.topComponent(plantedDf, "embedding", iterations = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length === 3)
    val norm = got.map(x => x._2 * x._2).sum
    assert(math.abs(norm - 1.0) < 1e-12, s"norm $norm")
    // dim 1 dominates the component
    assert(math.abs(got(1)._2) > 0.99, s"loadings ${got.map(_._2).toSeq}")
    assert(got.head._3 > 0) // eigenvalue positive
  }

  test("partition-order independence: loadings are bit-equal") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Pca.topComponent(emb, "embedding", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = Pca.topComponent(emb.repartition(13), "embedding", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("power iteration converges: v stabilizes between iterations 6 and 8") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val v6 = Pca.topComponent(emb, "embedding", 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    val v8 = Pca.topComponent(emb, "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    val d = v6.zip(v8).map { case (x, y) => math.abs(x - y) }.max
    assert(d < 0.05, s"max loading drift $d between 6 and 8 iterations")
  }
}
