package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 top-k retrieval over a document corpus — the ranking function the
 * reference pipeline's Elasticsearch sink exists to serve
 * (`/root/reference/bexley_spark_stream_msk_es.py:508-517` ships curated
 * rows into an ES index precisely so BM25 queries can rank them). This
 * operator brings the ranking itself into the engine as one declarative
 * dataflow: inverted postings → per-term IDF → per-(query, doc) score →
 * bounded-heap top-k.
 *
 * Scoring (Robertson–Spärck Jones BM25, k1/b form):
 *
 *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 *
 * with idf in BITS via the engine's exact-arithmetic piecewise-linear log2
 * (see Curation.lg): idf(t) = lg(N+1) − lg(df_t) — integer arguments only,
 * so the whole score is reproducible bit-for-bit by any IEEE-754 engine
 * that mirrors the parenthesization (which the DuckDB oracle does):
 * avgdl is ONE divide of two exact integers, dl/avgdl one more, and the
 * per-(query, doc) sum is a FIXED-ORDER fold over matched terms ascending.
 *
 * Scale shape (the 100 TB posture):
 *  - the corpus is tokenized ONCE and immediately filtered to the query
 *    vocabulary (a broadcast `isin` BEFORE any shuffle) — postings volume
 *    is O(occurrences of query terms), not O(corpus tokens);
 *  - df and the query table are term-keyed and tiny → broadcast joins;
 *  - corpus stats (N, Σdl) are one map-side-combinable aggregate
 *    broadcast as a single row;
 *  - the final top-k is the bounded-heap TopKAgg (map-side partial top-k:
 *    the shuffle carries O(k · partitions) rows per query, never the full
 *    scored posting list — same argument as Similarity.cosineKnnAgg).
 */
object Bm25 {

  import graft.curation.Curation.lg

  /**
   * @param queries (query_id, terms) — the query workload; small by
   *                definition (it is broadcast twice).
   * @return (query_id, doc_id, rk, n_terms, score) — top `k` docs per
   *         query, rank 1-based by (score DESC, doc_id ASC); `n_terms` =
   *         how many of the query's terms the doc matched.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "empty query workload")
    val spark = docs.sparkSession
    import spark.implicits._

    val qdf = broadcast(
      queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
        .toDF("query_id", "tok"))
    val vocab = queries.flatMap(_._2).distinct

    val toks = docs.select(
      col(idCol).as("doc_id"),
      graft.text.TextOps.tokens(col(textCol)).as("w"))
    val dl = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    // one row: corpus size and total length (exact integers)
    val stats = dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

    // postings restricted to the query vocabulary BEFORE the shuffle
    val post = toks
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("tok"))
      .filter(col("tok").isin(vocab.map(v => v: Any): _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val dft = post.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))

    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    val norm = lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)
    val idf = lg(col("n_docs") + 1) - lg(col("df_t"))
    val contrib = idf *
      ((col("tf").cast("double") * (lit(k1) + lit(1.0))) /
        (col("tf").cast("double") + lit(k1) * norm))

    val scored = post
      .join(qdf, "tok")
      .join(broadcast(dft), "tok")
      .crossJoin(broadcast(graft.ops.Guards.scalar(stats)))
      .select(col("query_id"), col("doc_id"), col("tok"), contrib.as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_terms"),
        aggregate(
          transform(sort_array(collect_list(struct(col("tok"), col("contrib")))),
            e => e("contrib")),
          lit(0.0), (acc: Column, x: Column) => acc + x).as("score"))

    val top = scored
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._4, r._2))
      .agg(graft.functions.TopKAgg.topK(k).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"), col("col._1").as("score"))

    // re-attach n_terms: the winner set is O(queries × k) → broadcast it
    broadcast(top)
      .join(scored.select(col("query_id"), col("doc_id"), col("n_terms")),
        Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("rk"), col("n_terms"),
        col("score"))
  }
}
