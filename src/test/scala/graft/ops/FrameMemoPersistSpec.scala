package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-session persistence of [[FrameMemo.cachedPersistent]]: the
  * parquet spill must (a) round-trip the built frame hash-identically,
  * (b) actually SERVE the reload path (a second "session" — modeled by
  * invalidating the in-JVM memo — must not rebuild), (c) miss on a
  * changed fingerprint or version-bearing key, and (d) treat a dir
  * without `_SUCCESS` as crash debris, not a hit. */
class FrameMemoPersistSpec extends SparkSpec {

  private def withRoot[T](body: String => T): T = {
    val root = tmpDir("graft-memo-spec")
    val prev = spark.conf.getOption("spark.graft.memo.dir")
    spark.conf.set("spark.graft.memo.dir", root)
    try body(root)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.memo.dir", v)
        case None => spark.conf.unset("spark.graft.memo.dir")
      }
      FrameMemo.invalidate()
    }
  }

  private def frame() = spark.range(500).toDF("id")
    .withColumn("v", md5(col("id").cast("string")))

  test("load-vs-build hash parity, and the reload path serves without rebuilding") {
    withRoot { root =>
      FrameMemo.invalidate()
      var builds = 0
      def build = { builds += 1; frame() }
      val first = FrameMemo.cachedPersistent(spark, "pmemo-spec:v1", "fp-a")(build)
      val want = first.orderBy("id").collect().toSeq
      assert(builds === 1)
      assert(want.size === 500)
      // same session, same key: in-memory hit, no disk relist
      FrameMemo.cachedPersistent(spark, "pmemo-spec:v1", "fp-a")(build)
      assert(builds === 1)
      // "new session": drop the in-JVM memo; a build that would THROW
      // proves the parquet reload path is what serves the frame
      FrameMemo.invalidate()
      val reloaded = FrameMemo.cachedPersistent(spark, "pmemo-spec:v1", "fp-a")(
        sys.error("reload path must not rebuild"))
      assert(reloaded.orderBy("id").collect().toSeq === want)
    }
  }

  test("fingerprint or version change misses and rebuilds") {
    withRoot { root =>
      FrameMemo.invalidate()
      var builds = 0
      def build = { builds += 1; frame() }
      FrameMemo.cachedPersistent(spark, "pmemo-spec:v1", "fp-a")(build)
      assert(builds === 1)
      FrameMemo.invalidate()
      FrameMemo.cachedPersistent(spark, "pmemo-spec:v1", "fp-CHANGED")(build)
      assert(builds === 2, "regenerated source (new fingerprint) must rebuild")
      FrameMemo.invalidate()
      FrameMemo.cachedPersistent(spark, "pmemo-spec:v2", "fp-a")(build)
      assert(builds === 3, "bumped builder version must rebuild")
    }
  }

  test("a spill dir without _SUCCESS is crash debris: cleared and rebuilt") {
    withRoot { root =>
      FrameMemo.invalidate()
      var builds = 0
      def build = { builds += 1; frame() }
      FrameMemo.cachedPersistent(spark, "pmemo-debris:v1", "fp-a")(build)
      assert(builds === 1)
      // simulate a crashed writer: remove the success marker
      val dir = new java.io.File(root).listFiles()
        .find(_.getName.startsWith("pmemo-debris")).get
      assert(new java.io.File(dir, "_SUCCESS").delete())
      FrameMemo.invalidate()
      val again = FrameMemo.cachedPersistent(spark, "pmemo-debris:v1", "fp-a")(build)
      assert(builds === 2, "missing _SUCCESS must not be served as a hit")
      assert(again.count() === 500)
    }
  }
}
