package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Relational operator library (SURVEY.md §2.7–2.8 + §2.2).
  *
  * Scale notes: every operator here is a lazy plan fragment — no
  * collect(), no driver-side loops. Dedup/semi/anti ops shuffle exactly
  * once on their key; at 100 TB the shuffle key is the table PK, which
  * is what downstream joins partition on anyway, so the exchange is
  * reusable by AQE.
  */
object Relational {

  /** Keep-last dedup by key (A1, etl/transform.py:33-38 et al.).
    *
    * pandas `drop_duplicates(keep="last")` is positional; a distributed
    * engine needs an explicit ordering, so the caller supplies the
    * tiebreaker columns (latest wins). One shuffle on `keys`.
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-last in encounter order for single-node-deterministic input
    * (faithful to the reference's positional semantics; only safe when
    * the upstream plan preserves input order, e.g. a fresh file scan).
    */
  def dedupKeepLastPositional(df: DataFrame, keys: Seq[String]): DataFrame = {
    val withIdx = df.withColumn("__idx", monotonically_increasing_id())
    dedupKeepLast(withIdx, keys, Seq(col("__idx"))).drop("__idx")
  }

  /** Left-semi join on equal-named key columns (J1/J2). Catalyst picks
    * broadcast vs shuffled by size/AQE; callers with a known-small right
    * side should pass `broadcast(right)`.
    */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right.select(keys.map(col): _*), keys, "left_semi")

  /** Left-anti join on equal-named key columns (J3–J5). */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right.select(keys.map(col): _*), keys, "left_anti")

  /** Required-non-null split (W3, etl/load.py:33-37,136-154):
    * returns (rows with all required columns non-null, quarantined rest).
    * Both sides are lazy plans off the same scan — cache the input when
    * both are materialized.
    */
  def requireNonNull(df: DataFrame, cols: Seq[String]): (DataFrame, DataFrame) = {
    val ok = cols.map(col(_).isNotNull).reduce(_ && _)
    (df.filter(ok), df.filter(!ok))
  }

  /** Union by name tolerating asymmetric schemas (A4 + N7): missing
    * columns are synthesized as nulls on either side.
    */
  def unionByNameSafe(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** Drop positionally-duplicated column names, keep first (N6).
    * Duplicate names are unreferencable in Spark, so rename positionally
    * to unique temps, select the first occurrence of each, rename back.
    */
  def dropDuplicateColumns(df: DataFrame): DataFrame = {
    val names = df.columns
    val temps = names.indices.map(i => s"__c$i")
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val keep = names.zipWithIndex.collect {
      case (c, i) if seen.add(c.toLowerCase) => (temps(i), c)
    }
    df.toDF(temps: _*)
      .select(keep.map { case (t, c) => col(t).as(c) }.toIndexedSeq: _*)
  }

  /** Synthesize an all-null column if absent (N7, etl/extract.py:292-295). */
  def ensureColumn(df: DataFrame, name: String, dt: DataType): DataFrame =
    if (df.columns.contains(name)) df
    else df.withColumn(name, lit(null).cast(dt))

  /** Persist AND materialize a frame that fans out into independent
    * downstream query stages (e.g. both sides of a self-join). AQE
    * materializes independent broadcast/shuffle stages in parallel, so
    * with a lazy persist each stage recomputes the full plan before the
    * cache is populated ("Block already exists" churn); one eager count
    * makes every consumer a cache read.
    */
  def eager(df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    p
  }

  /** Append a 1-based rank column to an ALREADY-ORDERED bounded frame
    * (an `orderBy(...).limit(k)` — TakeOrderedAndProject returns rows
    * in exactly that order): the rows collect to the driver and come
    * back as a LocalRelation with `rankCol` = position. Replaces the
    * `row_number().over(Window.orderBy(...))` idiom on top-k cuts,
    * whose unpartitioned WindowExec is a single-partition funnel (fine
    * for k rows, a cliff if the bound ever slips — and a warning wall
    * in every log). Callers MUST pass a deterministically ordered,
    * bounded frame.
    */
  def withLocalRank(spark: org.apache.spark.sql.SparkSession,
                    ordered: DataFrame, rankCol: String): DataFrame = {
    val rows = ordered.collect()
    val schema = org.apache.spark.sql.types.StructType(
      ordered.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.IntegerType, nullable = false))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        rows.toSeq.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
        }).asJava, schema)
  }

  /** Dataset-version diff — the audit every corpus release pipeline
    * runs between two snapshots (what changed since the last training
    * set was cut): rows keyed by `idCol`, content identity =
    * md5 over `cmpCols` joined with a 0x01 separator (unambiguous —
    * the separator cannot occur in the columns' text domains). NULL
    * cells hash DISTINCTLY via a 0x02-prefixed sentinel: concat_ws
    * alone silently SKIPS nulls, so ('x', NULL) and (NULL, 'x') —
    * or any split of the same concatenation — would collide and a
    * genuinely changed row could classify 'unchanged'.
    * Output: (id, old_hash, new_hash, status ∈ added | removed |
    * changed | unchanged).
    *
    * Plan shape: hash both sides expression-only, ONE full-outer
    * equi-join on the id — with both snapshots bucketed/sorted by id
    * at rest (the warehouse layout) the join is co-located,
    * zero-shuffle; otherwise it is the one unavoidable exchange pair.
    * Never a content join: content enters only through the 16-byte
    * hash, so the exchange width is id + 2 hashes regardless of
    * document size.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   cmpCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", cmpCols.map(c =>
        coalesce(col(c).cast(StringType), lit("\u0002NULL"))): _*)).as(as))
    hashed(a, "old_hash").join(hashed(b, "new_hash"), Seq(idCol),
        "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** Rename all columns through a normalizer (N1-style pass).
    * Duplicate post-rename names are suffixed `_1`, `_2`, … with the
    * suffix probed against BOTH already-emitted and upcoming names, so
    * a generated suffix can never collide with a later original
    * (['a','a','a_1'] → ['a','a_2','a_1'], never 'a_1' twice).
    */
  def renameNormalized(df: DataFrame, f: String => String): DataFrame = {
    val renames = df.columns.map(c => c -> f(c))
    val taken = scala.collection.mutable.Set[String](renames.map(_._2).toIndexedSeq: _*)
    val used = scala.collection.mutable.Set[String]()
    val unique = renames.map { case (orig, n) =>
      val name =
        if (!used(n)) n
        else {
          var k = 1
          while (used(s"${n}_$k") || taken(s"${n}_$k")) k += 1
          s"${n}_$k"
        }
      used += name
      orig -> name
    }
    df.withColumnsRenamed(unique.toMap)
  }
}
