package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` showcase (SURVEY.md §2.11 "UDF/UDAF surface"):
  * keep-last-by-ordinal — the reference's positional
  * `drop_duplicates(keep="last")` (A1, etl/transform.py:33-38) as a
  * distributed aggregate: `groupBy(pk).agg(keepLast(struct(ord, payload)))`
  * keeps the payload with the greatest ordinal.
  *
  * The window-function form (graft.ops.Relational.dedupKeepLast) is the
  * production path — this exists to demonstrate the
  * Aggregator[IN, BUF, OUT] extension surface with merge semantics that
  * hold under partial (map-side) aggregation: max-by is associative and
  * commutative, so Spark can combine partial buffers in any order.
  */
object KeepLast {

  /** IN/BUF: (ordinal, payload-as-json-ish string); OUT: payload. */
  class KeepLastString extends Aggregator[(Long, String), (Long, String), String] {
    override def zero: (Long, String) = (Long.MinValue, null)
    override def reduce(b: (Long, String), a: (Long, String)): (Long, String) =
      if (a._1 >= b._1) a else b
    override def merge(x: (Long, String), y: (Long, String)): (Long, String) =
      if (x._1 >= y._1) x else y
    override def finish(b: (Long, String)): String = b._2
    override def bufferEncoder: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column form usable in `agg(...)`: keeps `payload` of the row with
    * the largest `ord`.
    */
  def keepLast(ord: Column, payload: Column): Column =
    udaf(new KeepLastString, Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .apply(ord, payload)
}
