package graft.queries

import graft.SparkSpec

/** Laws for the newest relational-surface queries: unpivot (q140),
  * VARIANT extraction (q141), attribution (q143), trigram motifs (q144)
  * and the TPC-H classics' shape invariants. */
class RelationalParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("unpivot: 4 rows per source row, measures complete, values preserved") {
    import org.apache.spark.sql.functions._
    val wide = graft.Tables.lineitem(spark, sf).filter(col("l_orderkey") % 50 === 0)
    val long = CatalogExt.q140Unpivot(spark, sf)
    assert(long.count() === wide.count() * 4)
    val ms = long.select("measure").distinct().collect().map(_.getString(0)).toSet
    assert(ms === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val qSum = long.filter(col("measure") === "l_quantity")
      .agg(sum("value")).collect().head.getDouble(0)
    val wSum = wide.agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(qSum === wSum)
  }

  test("variant extraction: present path typed, missing path NULL") {
    val out = CatalogExt.q141VariantJson(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(1)))  // $.k always present in fixture
    assert(out.forall(_.isNullAt(2)))   // $.missing never present
  }

  test("attribution: clicks never postdate their purchase; verdict implies window") {
    import org.apache.spark.sql.functions._
    val out = CatalogExt.q143Attribution(spark, sf)
    assert(out.filter(col("click_ts") > col("ts")).count() === 0L)
    assert(out.filter(col("attributed") &&
      col("click_ts") < col("ts") - expr("INTERVAL 1 HOUR")).count() === 0L)
  }

  test("trigram motifs: counts positive, at most 20 rows, sorted cut is total") {
    val out = CatalogExt.q144EventTrigrams(spark, sf).collect()
    assert(out.length <= 20)
    assert(out.forall(_.getLong(3) > 0L))
  }

  test("TPC-H Q5: revenue only from the named region's nations") {
    import org.apache.spark.sql.functions._
    val nations = CatalogExt.q152TpchQ5(spark, sf)
      .select("n_name").collect().map(_.getString(0)).toSet
    val asia = graft.Tables.nation(spark, sf)
      .join(graft.Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(nations.subsetOf(asia) && nations.nonEmpty)
  }
}
