package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row (key, t), attach the most recent right row
 * with the same key and right.t <= t — the standard point-in-time lookup
 * (enrich an order with the customer's last activity, a trade with the
 * prevailing quote).
 *
 * Spark has no built-in as-of join; the preference-order choice here is
 * composition (SURVEY.md §7.2(a)): a UNION of both sides sorted per key by
 * (time, side-marker, tiebreak) with a last_value(ignoreNulls) carry-forward
 * window. One shuffle on the key, no range-join explosion, no per-key
 * driver loop — the plan is shuffle + sort + window, which scales linearly
 * and partitions cleanly at 100 TB (same shape Flink/kdb as-of joins
 * lower to).
 *
 * Ties (right.t == left.t) take the right row — "as of now" includes now —
 * and among equal right timestamps the largest tiebreak column wins,
 * making the result deterministic and oracle-reproducible.
 */
object AsofJoin {

  /** Natural order over external row values (Long, Timestamp, String, ...,
    * all Comparable) — a module object so executor closures serialize. */
  private object NaturalOrdering extends Ordering[Any] with Serializable {
    override def compare(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /**
   * @param left      left frame
   * @param right     right frame
   * @param keyCols   (leftKey, rightKey) equi-key column names
   * @param tsCols    (leftTs, rightTs) event-time column names (same type)
   * @param tieCol    right column giving a total order among equal right
   *                  timestamps (e.g. an event id)
   * @param rightVals right columns to carry onto the left rows
   */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: (String, String),
      tsCols: (String, String),
      tieCol: String,
      rightVals: Seq[String]): DataFrame = {
    val (lk, rk) = keyCols
    val (lt, rt) = tsCols
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with left column names — " +
        "alias the right-side payload columns before the as-of join")

    val l = left
      .withColumn("__k", col(lk))
      .withColumn("__t", col(lt))
      .withColumn("__side", lit(1)) // left sorts after right at equal time
      .withColumn("__tie", lit(null).cast(right.schema(tieCol).dataType))
    val rPayload = struct((tieCol +: rightVals).distinct.map(col): _*)
    val r = right.select(
      col(rk).as("__k"),
      col(rt).as("__t"),
      lit(0).as("__side"),
      col(tieCol).as("__tie"),
      rPayload.as("__payload"))

    val lAligned = l.select(
      col("__k") +: col("__t") +: col("__side") +: col("__tie") +:
        lit(null).cast(r.schema("__payload").dataType).as("__payload") +:
        leftCols.map(col): _*)
    val rAligned = r.select(
      col("__k") +: col("__t") +: col("__side") +: col("__tie") +: col("__payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"__carried.$v").as(v)): _*)
  }

  /** Convenience overload carrying one value column. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieCol: String, value: String): DataFrame =
    asof(left, right, (key, key), (ts, ts), tieCol, Seq(value))

  /**
   * Fused sorted-merge as-of over PRE-BUCKETED storage — the zero-exchange
   * form of [[asof]] for repeated point-in-time lookups between two large
   * tables (SURVEY.md §2.12's named future-work item).
   *
   * Both tables must be `bucketBy(n, key)` catalog tables with the SAME
   * bucket count: Spark's bucketed scan then yields exactly one partition
   * per bucket, with bucket i of both tables holding the same key-hash
   * residues, so `zipPartitions` pairs co-located buckets and runs the
   * classic two-pointer sorted-merge as-of per bucket — the plan the union
   * + window [[asof]] needs one exchange for costs ZERO here, because the
   * shuffle was paid once at write time and is reused by every subsequent
   * as-of (the same economics as the bucketed equi-join, BucketingSpec).
   *
   * The merge sorts each bucket in memory first: `sortBy` at write time
   * sorts per FILE, so a multi-file bucket is not globally sorted and the
   * partition-local sort re-establishes the invariant without any exchange
   * (production note: a k-way merge of the pre-sorted files would avoid
   * even this; the sort is O(bucket log bucket) and bucket-local, so it
   * scales out with numBuckets like everything else here).
   *
   * Same contract as [[asof]]: most recent right row with right.ts <=
   * left.ts per key; ties at equal ts take the largest `tieCol`; left rows
   * with no match carry nulls. Null join keys / timestamps are not
   * supported (clean them upstream). Law-tested equal to [[asof]].
   */
  def asofBucketed(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String,
      keyCols: (String, String),
      tsCols: (String, String),
      tieCol: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    def spec(t: String) = catalog.getTableMetadata(TableIdentifier(t)).bucketSpec
      .getOrElse(throw new IllegalArgumentException(s"$t is not a bucketed table"))
    val (ls, rs) = (spec(leftTable), spec(rightTable))
    require(ls.numBuckets == rs.numBuckets,
      s"bucket counts differ: $leftTable=${ls.numBuckets} vs $rightTable=${rs.numBuckets}")
    require(ls.bucketColumnNames == Seq(keyCols._1),
      s"$leftTable must be bucketed by exactly ${keyCols._1}, got ${ls.bucketColumnNames}")
    require(rs.bucketColumnNames == Seq(keyCols._2),
      s"$rightTable must be bucketed by exactly ${keyCols._2}, got ${rs.bucketColumnNames}")
    // The output schema is left.* ++ rightVals appended verbatim; a payload
    // name colliding with a left column would build a frame with duplicate
    // column names that only fails later, at the caller's first ambiguous
    // select — fail here with the actual offenders instead.
    val leftNames = spark.table(leftTable).schema.fieldNames.toSet
    val clash = rightVals.filter(leftNames.contains)
    require(clash.isEmpty,
      s"rightVals ${clash.mkString(", ")} collide with $leftTable column names; " +
        "rename them on the right table (or project the left side) before the as-of")

    // Force the bucketed scan: with autoBucketedScan enabled Spark may fall
    // back to size-based file splits when no operator requires the
    // distribution (an RDD zip is invisible to the optimizer), which would
    // silently misalign partitions with buckets. Conf is read at planning
    // time — the .rdd calls below — so restoring it afterwards is safe.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = spark.conf.getOption(autoKey)
    spark.conf.set(autoKey, "false")
    val (leftRdd, rightRdd, leftSchema, payloadFields, idx) =
      try {
        val left = spark.table(leftTable)
        val right = spark.table(rightTable)
          .selectExpr((Seq(keyCols._2, tsCols._2, tieCol) ++ rightVals).distinct: _*)
        val li = (left.schema.fieldIndex(keyCols._1), left.schema.fieldIndex(tsCols._1))
        val ri = (right.schema.fieldIndex(keyCols._2), right.schema.fieldIndex(tsCols._2),
          right.schema.fieldIndex(tieCol), rightVals.map(right.schema.fieldIndex))
        val pf = rightVals.map(v => right.schema(v).copy(nullable = true))
        (left.rdd, right.rdd, left.schema, pf, (li, ri))
      } finally prior.fold(spark.conf.unset(autoKey))(spark.conf.set(autoKey, _))
    require(leftRdd.getNumPartitions == ls.numBuckets &&
      rightRdd.getNumPartitions == rs.numBuckets,
      "bucketed scan did not yield one partition per bucket")

    val ((lKey, lTs), (rKey, rTs, rTie, rVals)) = idx
    val cmp: Ordering[Any] = NaturalOrdering
    val nVals = rightVals.length
    val merged = leftRdd.zipPartitions(rightRdd) { (li, ri) =>
      implicit val c = cmp
      val lbuf = li.toArray.sortBy(r => (r.get(lKey), r.get(lTs)))
      val rbuf = ri.toArray.sortBy(r => (r.get(rKey), r.get(rTs), r.get(rTie)))
      var j = 0
      var cur: org.apache.spark.sql.Row = null
      var curKey: Any = null
      lbuf.iterator.map { l =>
        val k = l.get(lKey); val t = l.get(lTs)
        if (curKey == null || cmp.compare(curKey, k) != 0) { cur = null; curKey = k }
        while (j < rbuf.length && cmp.compare(rbuf(j).get(rKey), k) < 0) j += 1
        while (j < rbuf.length && cmp.compare(rbuf(j).get(rKey), k) == 0 &&
          cmp.compare(rbuf(j).get(rTs), t) <= 0) { cur = rbuf(j); j += 1 }
        val payload =
          if (cur == null) Seq.fill[Any](nVals)(null) else rVals.map(cur.get)
        org.apache.spark.sql.Row.fromSeq(l.toSeq ++ payload)
      }
    }
    spark.createDataFrame(merged,
      org.apache.spark.sql.types.StructType(leftSchema.fields ++ payloadFields))
  }
}
