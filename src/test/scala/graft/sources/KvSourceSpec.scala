package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the graft-kv DSv2 write path: upsert semantics, overwrite
  * (truncate), crash-orphan invisibility, bucketed read planning, schema
  * enforcement, and round-trip fidelity for every supported column type. */
class KvSourceSpec extends SparkSpec {

  import spark.implicits._

  private def write(df: org.apache.spark.sql.DataFrame, dir: String,
      mode: String = "append"): Unit =
    df.write.format("graft-kv").option("path", dir).mode(mode).save()

  private def read(dir: String) =
    spark.read.format("graft-kv").load(dir)

  test("round trip: write then read returns exactly the rows (typed columns survive)") {
    val dir = tmpDir("kv1")
    val df = Seq(
      ("k1", 1L, 1.5, true, "hello world"),
      ("k2", -2L, -0.0, false, "tabs\tand\nnewlines ok"),
      ("k3", 3L, Double.NaN, true, "")
    ).toDF("data_key", "n", "x", "b", "s")
    write(df, dir)
    val back = read(dir).orderBy("data_key").collect()
    assert(back.length === 3)
    assert(back(0).getString(0) === "k1" && back(0).getLong(1) === 1L
      && back(0).getDouble(2) === 1.5 && back(0).getBoolean(3)
      && back(0).getString(4) === "hello world")
    assert(back(1).getString(4) === "tabs\tand\nnewlines ok")
    // -0.0 and NaN survive bit-exactly (hex-bits serialization)
    assert(java.lang.Double.doubleToLongBits(back(1).getDouble(2)) ===
      java.lang.Double.doubleToLongBits(-0.0))
    assert(back(2).getDouble(2).isNaN)
  }

  test("upsert: second append wins per key; count = distinct keys") {
    val dir = tmpDir("kv2")
    write(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("data_key", "v"), dir)
    write(Seq(("b", 20L), ("d", 40L)).toDF("data_key", "v"), dir)
    val m = read(dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 1L, "b" -> 20L, "c" -> 3L, "d" -> 40L))
  }

  test("overwrite truncates: only the new generation survives") {
    val dir = tmpDir("kv3")
    write(Seq(("a", 1L), ("b", 2L)).toDF("data_key", "v"), dir)
    write(Seq(("z", 9L)).toDF("data_key", "v"), dir, mode = "overwrite")
    val rows = read(dir).collect()
    assert(rows.length === 1 && rows.head.getString(0) === "z")
  }

  test("crash orphans are invisible: unmanifested data + staging files ignored") {
    val dir = tmpDir("kv4")
    write(Seq(("a", 1L)).toDF("data_key", "v"), dir)
    // simulate a crash after data write but before manifest rename
    Files.write(Paths.get(dir, "data", "g999999-b0000-p00000-t00000000.seg"),
      "zz\t99\n".getBytes)
    Files.createDirectories(Paths.get(dir, "staging"))
    Files.write(Paths.get(dir, "staging", "b0000-p00009-t00000009.seg"),
      "yy\t88\n".getBytes)
    val rows = read(dir).collect()
    assert(rows.length === 1 && rows.head.getString(0) === "a")
  }

  test("bucketed read: one partition per non-empty bucket, no shuffle needed for dedup") {
    val dir = tmpDir("kv5")
    val df = (1 to 100).map(i => (s"key$i", i.toLong)).toDF("data_key", "v")
    df.write.format("graft-kv").option("path", dir).option("buckets", 4)
      .mode("append").save()
    val back = read(dir)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 100)
    // per-bucket segment files exist
    val segs = Files.list(Paths.get(dir, "data")).iterator()
    var buckets = Set.empty[String]
    while (segs.hasNext) buckets += segs.next().getFileName.toString.substring(8, 13)
    assert(buckets === Set("b0000", "b0001", "b0002", "b0003"))
  }

  test("schema enforcement: append with a different schema is rejected") {
    val dir = tmpDir("kv6")
    write(Seq(("a", 1L)).toDF("data_key", "v"), dir)
    val bad = intercept[Exception] {
      write(Seq(("a", "not-a-long")).toDF("data_key", "v"), dir)
    }
    assert(bad.getMessage.contains("schema mismatch"))
  }

  test("column pruning: reading a projection touches only required fields") {
    val dir = tmpDir("kv7")
    write(Seq(("a", 1L, "xx"), ("b", 2L, "yy")).toDF("data_key", "v", "s"), dir)
    val vs = read(dir).select("v").orderBy("v").collect().map(_.getLong(0))
    assert(vs.toSeq === Seq(1L, 2L))
    // physical scan description carries the pruned column list
    val plan = read(dir).select("v").queryExecution.executedPlan.toString
    assert(plan.contains("cols=v") || plan.contains("ReadSchema: struct<v"))
  }

  test("within-batch duplicate keys resolve deterministically (last segment order wins)") {
    val dir = tmpDir("kv8")
    // single partition => single writer => file order deterministic
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("data_key", "v")
      .repartition(1)
    write(df, dir)
    val rows = read(dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 3L) // last row in the segment wins
  }

  test("many generations replay in order (LSM discipline)") {
    val dir = tmpDir("kv9")
    (1 to 5).foreach { g =>
      write(Seq(("k", g.toLong)).toDF("data_key", "v"), dir)
    }
    val rows = read(dir).collect()
    assert(rows.length === 1 && rows.head.getLong(1) === 5L)
    val m = KvStore.readManifest(Paths.get(dir)).get
    assert(m.gen === 5L && m.segments.length === 5)
  }
}
