package graft.ops

import graft.SparkSpec

/** Diff laws: every status class, null-safe column compares. */
class ReconcileSpec extends SparkSpec {

  test("diff: added/removed/changed/same with null-safe compares") {
    val s = spark
    import s.implicits._
    val left = Seq[(Long, java.lang.Long, String)](
      (1L, 10L, "a"),   // same
      (2L, 20L, "b"),   // changed value
      (3L, null, "c"),  // null stays null -> same (null-safe)
      (4L, 40L, null),  // null -> value: changed
      (5L, 50L, "e"))   // removed
      .toDF("k", "v", "tag")
    val right = Seq[(Long, java.lang.Long, String)](
      (1L, 10L, "a"),
      (2L, 21L, "b"),
      (3L, null, "c"),
      (4L, 40L, "d"),
      (6L, 60L, "f"))   // added
      .toDF("k", "v", "tag")
    val got = Reconcile.diff(left, right, Seq("k"), Seq("v", "tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "changed", 5L -> "removed", 6L -> "added"))
  }
}
