package graft.curation

import graft.SparkSpec

/** Laws for the length-bucket batching audit. */
class LengthBucketSpec extends SparkSpec {

  private def docs(lens: Int*) = {
    val s = spark
    import s.implicits._
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("t").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("bucket arithmetic on a handcrafted corpus") {
    // lengths 5, 10 -> bucket 0; 20 -> bucket 1; 40, 47 -> bucket 2
    val out = Curation.lengthBucketAudit(docs(5, 10, 20, 40, 47), "text",
      bucketWidth = 16, batchSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6))).toMap
    // bucket 0: 2 docs, max 10, 1 batch, waste = 2*10 - 15 = 5
    assert(out(0L) === ((2L, 10L, 1L, 5L)))
    assert(out(1L) === ((1L, 20L, 1L, 0L)))
    // bucket 2: 2 docs, max 47, 1 batch, waste = 2*47 - 87 = 7
    assert(out(2L) === ((2L, 47L, 1L, 7L)))
  }

  test("bucketing never wastes more than one global bucket") {
    val d = docs(3, 9, 18, 33, 60, 77, 12, 45)
    def totalWaste(width: Int) =
      Curation.lengthBucketAudit(d, "text", bucketWidth = width, batchSize = 4)
        .collect().map(_.getLong(6)).sum
    // width large enough to hold everything = pad-to-global-longest
    assert(totalWaste(16) <= totalWaste(1024))
  }
}
