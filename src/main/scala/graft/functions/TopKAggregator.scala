package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per group.
  *
  * The `Aggregator[IN, BUF, OUT]` form of a custom aggregate (SURVEY.md
  * §2.6): partial buffers merge associatively, so Spark runs it
  * map-side-combined like any built-in — each partition contributes at most
  * k entries to the shuffle regardless of row count, which is what makes
  * group-wise top-k cheap at 100 TB (vs. the window/row_number form that
  * shuffles every row).
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Nil

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    // ties broken by id ascending for determinism
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
