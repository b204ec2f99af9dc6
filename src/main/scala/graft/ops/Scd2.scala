package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Type-2 slowly-changing-dimension merge: dimension history kept as
  * versioned validity intervals (`valid_from`, `valid_to`; an open row
  * has `valid_to IS NULL`). Merging an incoming snapshot at `version`
  *  - leaves unchanged open rows (and all closed history) untouched,
  *  - closes the open row (valid_to = version) and opens a new one for
  *    keys whose tracked attributes changed (null-safe comparison),
  *  - opens a row for keys never seen before.
  *
  * Scale design (100 TB dimension): ONE full-outer shuffle join on the
  * business key; the keep/close/open classification is a single
  * expression producing a 1- or 2-element array of row structs that an
  * explode unrolls — no second pass, no driver logic, no window. The
  * closed-history partition is untouched and unions back in unshuffled,
  * so per-merge cost is proportional to the OPEN slice + the snapshot,
  * not to accumulated history.
  *
  * The reference's warehouse only keeps last-write-wins state
  * (etl/load.py upsert); this is the standard history-preserving
  * generalization a training-data warehouse needs for reproducible
  * "as-of version N" snapshots (pairs with graft.plans.AsofJoin on the
  * query side).
  */
object Scd2 {

  def merge(current: DataFrame, incoming: DataFrame, pk: Seq[String],
            track: Seq[String], version: Long): DataFrame = {
    require(pk.nonEmpty && track.nonEmpty, "scd2 merge needs pk and track columns")
    val sys = Seq("valid_from", "valid_to")
    val missing = (pk ++ track ++ sys).filterNot(current.columns.contains)
    require(missing.isEmpty, s"current frame lacks columns: $missing")
    // the emitted row struct carries exactly pk ++ track ++ sys, so an
    // extra attribute column would be SILENTLY dropped from the merged
    // dimension — reject it loudly instead (add it to `track` to keep it)
    val extra = current.columns.filterNot((pk ++ track ++ sys).contains)
    require(extra.isEmpty,
      s"current has columns outside pk/track/valid_*: ${extra.toSeq} — " +
        "include them in `track` or project them away first")
    // same hazard on the snapshot side: an attribute arriving in
    // `incoming` but missing from `track` (a NEW dimension column)
    // would vanish from every opened row without a trace
    val incExtra = incoming.columns.filterNot((pk ++ track).contains)
    require(incExtra.isEmpty,
      s"incoming has columns outside pk/track: ${incExtra.toSeq} — " +
        "include them in `track` or project them away first")

    val open = current.filter(col("valid_to").isNull)
    val hist = current.filter(col("valid_to").isNotNull)
    // duplicate business keys in one snapshot would fan the join out and
    // emit conflicting open rows; keep-last mirrors the warehouse upsert
    // precedent (Load.upsert / reference etl/load.py dedupe-then-merge)
    val incDeduped = Relational.dedupKeepLastPositional(incoming, pk)
    val incR = incDeduped.select(
      pk.map(col) ++ track.map(c => col(c).as(s"__i_$c")) :+
        lit(true).as("__inc"): _*)
    val j = open.withColumn("__cur", lit(true))
      .join(incR, pk, "full_outer")

    val changed: Column = track.map(c => !(col(c) <=> col(s"__i_$c")))
      .reduce(_ || _)
    def row(trackOf: String => Column, from: Column, to: Column): Column =
      struct(pk.map(c => col(c).as(c)) ++ track.map(c => trackOf(c).as(c)) :+
        from.as("valid_from") :+ to.as("valid_to"): _*)
    val keep = row(col, col("valid_from"), col("valid_to"))
    val close = row(col, col("valid_from"), lit(version))
    val opened = row(c => col(s"__i_$c"), lit(version), lit(null).cast(LongType))

    val emitted = when(col("__inc").isNull, array(keep)) // not in snapshot
      .when(col("__cur").isNull, array(opened)) // brand-new key
      .when(changed, array(close, opened)) // close old, open new
      .otherwise(array(keep)) // unchanged
    val out = j.select(explode(emitted).as("r")).select(col("r.*"))
    hist.select(out.columns.map(col).toIndexedSeq: _*).unionByName(out)
  }
}
