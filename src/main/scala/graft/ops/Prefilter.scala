package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Runtime-filter semi-join (sideways information passing): reduce a fact
 * table by a dimension-derived key set as a SCAN-SIDE PREDICATE instead of
 * a join operator.
 *
 * The key set collapses to ONE row holding a sorted long array (8 bytes
 * per key — a 10M-key filter is an 80 MB broadcast, where a broadcast hash
 * join's build map would be several times that); the probe is the
 * codegen'd [[graft.functions.SortedContains]] binary search, so the fact
 * side pays log₂|keys| long compares per row inside whole-stage codegen —
 * no shuffle, no join build, and the filter composes with any downstream
 * plan without entering join reordering. Exact keys ⇒ the result IS the
 * semi-join (no false positives to re-verify), which is the law the
 * oracle asserts.
 *
 * Use when the key side fits comfortably in executor memory as an array;
 * past that, fall back to a shuffle semi-join (Spark's own planner shape).
 */
object Prefilter {

  /** fact rows whose `factKey` appears in `keys.keyCol` (exact semi-join,
    * computed as a broadcast sorted-array predicate). */
  def semiJoinBySortedKeys(fact: DataFrame, factKey: String,
      keys: DataFrame, keyCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(fact.sparkSession)
    val arr = keys.agg(
      sort_array(collect_set(col(keyCol).cast("long"))).as("__keys"))
    fact.crossJoin(broadcast(arr))
      .filter(GraftFunctions.sortedContains(col(factKey).cast("long"), col("__keys")))
      .drop("__keys")
  }
}
