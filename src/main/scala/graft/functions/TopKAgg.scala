package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k typed aggregator (SURVEY.md §7.2's anticipated custom
 * `Aggregator`): keeps the k best (score, id) pairs, score descending with
 * ascending-id tiebreak.
 *
 * Scale rationale: the window-function top-k
 * (`row_number().over(partitionBy(q).orderBy(score))`) shuffles and sorts
 * EVERY scored row; this aggregator reduces each map partition to at most k
 * pairs before the exchange (partial aggregation), so the shuffle carries
 * O(k × partitions) rows instead of O(candidates) — the difference between
 * moving 10 rows and 10 million per query key at 100 TB.
 *
 * The buffer is a plain sorted Vector (k is small); insertion keeps it
 * bounded, merge is a merge of two bounded lists — both O(k).
 */
object TopKAgg {

  type Pair = (Double, Long) // (score, id)

  def topK(k: Int): Aggregator[Pair, Seq[Pair], Seq[Pair]] =
    new Aggregator[Pair, Seq[Pair], Seq[Pair]] {
      // ordering: better = higher score, then smaller id
      private def better(a: Pair, b: Pair): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

      private def insert(buf: Seq[Pair], p: Pair): Seq[Pair] = {
        if (buf.size >= k && better(buf.last, p)) buf
        else {
          val (front, back) = buf.span(better(_, p))
          (front :+ p) ++ back.take(k - front.size - 1)
        }
      }

      override def zero: Seq[Pair] = Vector.empty
      override def reduce(buf: Seq[Pair], in: Pair): Seq[Pair] = insert(buf, in)
      override def merge(a: Seq[Pair], b: Seq[Pair]): Seq[Pair] =
        b.foldLeft(a)(insert)
      override def finish(buf: Seq[Pair]): Seq[Pair] = buf
      override def bufferEncoder: Encoder[Seq[Pair]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
      override def outputEncoder: Encoder[Seq[Pair]] =
        bufferEncoder
    }
}
