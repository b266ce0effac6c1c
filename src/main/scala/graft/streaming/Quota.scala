package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted document: the input's identity plus its 1-based admission
  * rank within its domain. */
case class QuotaDoc(doc_id: Long, domain: String)
case class QuotaOut(doc_id: Long, domain: String, rank_in_domain: Long)

/**
 * Streaming per-domain admission quota — the in-stream form of
 * [[graft.curation.Curation.domainCap]]'s "no host dominates" rule, for
 * ingest pipelines where the corpus ARRIVES as a stream and the cap must
 * hold continuously rather than in a batch pass: admit the first `cap`
 * documents per domain over the stream's lifetime (admission order =
 * arrival batch, ties within a batch broken by doc id — deterministic
 * for a fixed batch sequence, QuotaSpec pins it).
 *
 * State per domain is ONE long (the admitted count) — O(|domains|) total,
 * never O(rows): the stream can run forever against any corpus size, and
 * a mega-domain costs exactly the same 8 bytes as a tiny one. No timeout:
 * a quota is lifetime semantics by definition (wire a TTL timeout in if
 * the product wants sliding quotas).
 *
 * The same function body serves batch frames (Spark runs
 * flatMapGroupsWithState over a bounded frame with batch GroupState), so
 * the batch law "first cap by id per domain" is directly checkable.
 */
object Quota {

  def domainQuota(docs: Dataset[QuotaDoc], cap: Int): Dataset[QuotaOut] = {
    require(cap > 0, s"cap must be positive, got $cap")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (domain: String, rows: Iterator[QuotaDoc], state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = List.newBuilder[QuotaOut]
          // sort the batch's arrivals by id: micro-batch-internal order is
          // a shuffle artifact, and a quota decision must be replayable
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (admitted < cap) {
              admitted += 1L
              out += QuotaOut(d.doc_id, domain, admitted)
            }
          }
          state.update(admitted)
          out.result().iterator
      }
  }
}
