package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions._
import graft.ops.Relational._
import graft.tables.Tables

/** One named query per reference operator family (SURVEY.md §2.1–2.8)
  * plus the gap-analysis relational surface (§2.11), each paired with
  * DuckDB oracle SQL over the same parquet tables.
  *
  * Conventions for oracle hash-stability:
  *  - every query output has an explicit ORDER BY on a unique key;
  *  - money aggregates are computed exactly in DECIMAL and cast to
  *    DOUBLE once at the end (identical bits in both engines);
  *  - ORDER BY on nullable keys always spells NULLS FIRST (Spark's
  *    default) because DuckDB defaults to NULLS LAST;
  *  - column aliases match between Spark and SQL exactly.
  */
object RelationalQueries {

  /** A catalog entry: query + optional DuckDB oracle. */
  case class Q(name: String,
               run: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  /** DuckDB equivalent of Spark's `initcap` (DuckDB has none). */
  def duckInitcap(e: String): String =
    s"array_to_string(list_transform(string_split($e, ' '), " +
      s"x -> upper(substr(x,1,1)) || lower(substr(x,2))), ' ')"

  /** DuckDB CASE translation of a Scala lookup map over a key expr. */
  def duckMapCase(keyExpr: String, m: Map[String, String], elseExpr: String): String =
    "CASE " + m.map { case (k, v) =>
      s"WHEN $keyExpr = '${k.replace("'", "''")}' THEN '${v.replace("'", "''")}'"
    }.mkString(" ") + s" ELSE $elseExpr END"

  // =====================================================================
  // §2.1/§2.3 — scans, projections, casts
  // =====================================================================

  val q01ScanProject = Q("q01_scan_project",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // sort on every output column for a hash-stable row order
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      l_returnflag FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      l_returnflag"""))

  val q02FilterDate = Q("q02_filter_date",
    // W1 — strict-equality daily filter (etl/pipeline.py:120-127)
    (s, d) => Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) === lit("1997-03-15").cast(DateType))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE CAST(o_orderdate AS DATE) = DATE '1997-03-15'
      ORDER BY o_orderkey"""))

  val q03ProjectCast = Q("q03_project_cast",
    // P1/P6/P7/P8 — wide projection with casts and money coercion
    (s, d) => Tables.lineitem(s, d)
      .select(
        col("l_orderkey").cast(StringType).as("okey_str"),
        col("l_linenumber").cast(IntegerType).as("lnum"),
        col("l_quantity").cast(StringType).try_cast(DecimalType(18, 2))
          .cast(DoubleType).as("qty_dec"),
        col("l_extendedprice").cast(DecimalType(18, 2))
          .cast(DoubleType).as("price_dec"))
      .orderBy(col("okey_str"), col("lnum"), col("qty_dec"), col("price_dec")),
    Some("""SELECT CAST(l_orderkey AS VARCHAR) AS okey_str,
      CAST(l_linenumber AS INTEGER) AS lnum,
      CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS qty_dec,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
      FROM lineitem ORDER BY okey_str, lnum, qty_dec, price_dec"""))

  // =====================================================================
  // §2.4 — string functions
  // =====================================================================

  val q04StringFuncs = Q("q04_string_funcs",
    // F1/F4–F7 over part names
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        firstToken(col("p_name")).as("first_tok"),
        upper(trim(col("p_name"))).as("up"),
        lower(col("p_brand")).as("lo"),
        initcap(col("p_name")).as("title"),
        length(col("p_name")).as("len"))
      .orderBy(col("p_partkey")),
    Some(s"""SELECT p_partkey, split_part(p_name, ' ', 1) AS first_tok,
      upper(trim(p_name)) AS up, lower(p_brand) AS lo,
      ${duckInitcap("p_name")} AS title,
      length(p_name) AS len FROM part ORDER BY p_partkey"""))

  val q05ConditionalExpr = Q("q05_conditional_expr",
    // F2/F3 — conditional course-code extract + conditional zeroing over
    // synthesized sheet-like strings
    (s, d) => {
      val course = when(col("p_size") > 15,
        concat(lit("P"), col("p_partkey"), lit(" "), col("p_name")))
        .otherwise(col("p_name"))
      Tables.part(s, d)
        .select(col("p_partkey"), course.as("course_raw"),
          courseCode(course).as("codigo_curso"),
          numCursosFixed(course, col("p_size")).as("num_cursos"))
        .orderBy(col("p_partkey"))
    },
    Some("""WITH t AS (SELECT p_partkey,
        CASE WHEN p_size > 15 THEN 'P' || p_partkey || ' ' || p_name
             ELSE p_name END AS course_raw, p_size FROM part)
      SELECT p_partkey, course_raw,
        CASE WHEN course_raw IS NOT NULL AND starts_with(trim(course_raw), 'P')
             THEN split_part(trim(course_raw), ' ', 1) ELSE course_raw END
          AS codigo_curso,
        CASE WHEN course_raw IS NOT NULL AND starts_with(trim(course_raw), 'P')
             THEN coalesce(TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER), 0)
             ELSE 0 END AS num_cursos
      FROM t ORDER BY p_partkey"""))

  val q06AccountMap = Q("q06_account_map",
    // F8 — dict-lookup normalization with initcap fallback, falsy → null
    (s, d) => {
      val method = when(col("o_orderpriority") === "1-URGENT", lit("YAPE"))
        .when(col("o_orderpriority") === "2-HIGH", lit("bcp"))
        .when(col("o_orderpriority") === "3-MEDIUM", lit("banco de la nación"))
        .when(col("o_orderpriority") === "5-LOW", lit("efectivo tienda"))
        .otherwise(lit(null).cast(StringType))
      Tables.orders(s, d)
        .select(col("o_orderkey"), method.as("metodo_raw"),
          accountNormalize(method, AccountMapRegular).as("metodo_pago"),
          currencyForMethod(method).as("moneda"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""WITH t AS (SELECT o_orderkey,
        CASE WHEN o_orderpriority = '1-URGENT' THEN 'YAPE'
             WHEN o_orderpriority = '2-HIGH' THEN 'bcp'
             WHEN o_orderpriority = '3-MEDIUM' THEN 'banco de la nación'
             WHEN o_orderpriority = '5-LOW' THEN 'efectivo tienda'
             ELSE NULL END AS metodo_raw FROM orders)
      SELECT o_orderkey, metodo_raw,
        CASE WHEN metodo_raw IS NULL OR metodo_raw = '' THEN NULL
             ELSE coalesce(
               ${duckMapCase("upper(trim(metodo_raw))", graft.functions.Functions.AccountMapRegular, "NULL")},
               ${duckInitcap("metodo_raw")}) END AS metodo_pago,
        CASE WHEN metodo_raw IN ('Banco de México','Banco de Mexico',
               'Banco de México / P','Banco de Ecuador / P') THEN 'MXN'
             WHEN metodo_raw IN ('Banco de Ecuador','PAYPAL','Paypal') THEN 'USD'
             WHEN metodo_raw = 'Banco de Chile' THEN 'CLP'
             ELSE 'PEN' END AS moneda
      FROM t ORDER BY o_orderkey"""))

  // =====================================================================
  // §2.4 F10–F12 — phone-country detection
  // =====================================================================

  private val phonePrefixes = Seq("549", "569", "51", "57", "593", "591",
    "507", "521", "52", "55", "1", "39", "34", "33", "49", "99")

  val q07PhoneCountry = Q("q07_phone_country",
    (s, d) => {
      val idx = (col("c_custkey") % 16).cast(IntegerType)
      val prefix = element_at(typedLit(phonePrefixes), idx + 1)
      val body = when(prefix === "1",
        lpad((col("c_custkey") % 1000000).cast(StringType), 10, "0"))
        .otherwise(lpad((col("c_custkey") % 1000000).cast(StringType), 9, "0"))
      val phone = concat(lit("+"), prefix, lit("-"), body)
      // digits staged in their own projection: every prefix rule
      // references them, and CollapseProject won't re-inline a
      // non-cheap expression referenced more than once — one regexp
      // per row instead of one per rule×field (was 250 µs/row)
      val staged = Tables.customer(s, d)
        .select(col("c_custkey"), phone.as("numero_raw"),
          digitsOnly(phone).as("__digits"))
      val info = phoneInfoFromDigits(col("numero_raw"), col("__digits"))
      staged
        .select(col("c_custkey"), col("numero_raw"),
          phoneCountryFromDigits(col("numero_raw"), col("__digits")).as("pais"),
          info.getField("codigo_pais").as("codigo_pais"),
          info.getField("numero_e164").as("numero_e164"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH t AS (
        SELECT c_custkey,
          (['549','569','51','57','593','591','507','521','52','55','1','39','34','33','49','99'])[CAST(c_custkey % 16 AS INTEGER) + 1] AS pfx,
          lpad(CAST(c_custkey % 1000000 AS VARCHAR),
               CASE WHEN c_custkey % 16 = 10 THEN 10 ELSE 9 END, '0') AS body
        FROM customer),
      p AS (SELECT c_custkey, '+' || pfx || '-' || body AS numero_raw,
                   pfx || body AS num FROM t)
      SELECT c_custkey, numero_raw,
        CASE WHEN starts_with(num,'549') THEN 'Argentina'
             WHEN starts_with(num,'569') THEN 'Chile'
             WHEN starts_with(num,'51') THEN 'Perú'
             WHEN starts_with(num,'57') THEN 'Colombia'
             WHEN starts_with(num,'593') THEN 'Ecuador'
             WHEN starts_with(num,'591') THEN 'Bolivia'
             WHEN starts_with(num,'507') THEN 'Panamá'
             WHEN starts_with(num,'521') OR starts_with(num,'52') THEN 'México'
             WHEN starts_with(num,'55') THEN 'Brasil'
             WHEN length(num) = 11 AND starts_with(num,'1')
               THEN 'Estados Unidos / Puerto Rico'
             WHEN starts_with(num,'39') THEN 'Italia'
             WHEN starts_with(num,'34') THEN 'España'
             WHEN starts_with(num,'33') THEN 'Francia'
             WHEN starts_with(num,'49') THEN 'Alemania'
             ELSE 'Desconocido' END AS pais,
        CASE WHEN starts_with(num,'549') THEN '54'
             WHEN starts_with(num,'569') THEN '56'
             WHEN starts_with(num,'51') THEN '51'
             WHEN starts_with(num,'57') THEN '57'
             WHEN starts_with(num,'593') THEN '593'
             WHEN starts_with(num,'591') THEN '591'
             WHEN starts_with(num,'507') THEN '507'
             WHEN starts_with(num,'521') OR starts_with(num,'52') THEN '52'
             WHEN starts_with(num,'55') THEN '55'
             WHEN length(num) = 11 AND starts_with(num,'1') THEN '1'
             WHEN starts_with(num,'39') THEN '39'
             WHEN starts_with(num,'34') THEN '34'
             WHEN starts_with(num,'33') THEN '33'
             WHEN starts_with(num,'49') THEN '49'
             ELSE NULL END AS codigo_pais,
        '+' || num AS numero_e164
      FROM p ORDER BY c_custkey"""))

  // =====================================================================
  // §2.5 — lenient day-first dates
  // =====================================================================

  val q08LenientDate = Q("q08_lenient_date",
    (s, d) => {
      val k = col("o_orderkey")
      val raw = when(k % 97 === 0, lit("not a date"))
        .when(k % 3 === 0, date_format(col("o_orderdate"), "d/M/yyyy"))
        .when(k % 3 === 1, date_format(col("o_orderdate"), "d/M/yyyy H:mm:ss"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      Tables.orders(s, d)
        .select(k.as("o_orderkey"), raw.as("raw_date"),
          isoDate(lenientDate(raw)).as("fecha_iso"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH t AS (SELECT o_orderkey,
        CASE WHEN o_orderkey % 97 = 0 THEN 'not a date'
             WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%-d/%-m/%Y')
             WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%-d/%-m/%Y %-H:%M:%S')
             ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw_date
        FROM orders)
      SELECT o_orderkey, raw_date,
        strftime(try_strptime(raw_date,
          ['%d/%m/%Y %H:%M:%S','%d/%m/%Y %H:%M','%d/%m/%Y',
           '%Y-%m-%d %H:%M:%S','%Y-%m-%d']), '%Y-%m-%d') AS fecha_iso
      FROM t ORDER BY o_orderkey"""))

  // =====================================================================
  // §2.8 — dedup / distinct / union
  // =====================================================================

  val q09DedupKeepLast = Q("q09_dedup_keeplast",
    // A1 — keep-last by key with explicit (latest-date, highest-key) order
    (s, d) => dedupKeepLast(Tables.orders(s, d), Seq("o_custkey"),
      Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      WHERE rn = 1 ORDER BY o_custkey"""))

  val q10DistinctKeys = Q("q10_distinct_keys",
    // A2 — distinct non-null key extraction
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .na.drop().distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
      ORDER BY l_returnflag, l_linestatus"""))

  val q11SemiJoin = Q("q11_semi_join",
    // J1/J2 — lineitem ⋉ finished orders
    (s, d) => {
      val valid = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      semiJoin(Tables.lineitem(s, d), valid, Seq("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus='F')
      ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  val q12AntiJoin = Q("q12_anti_join",
    // J3–J5 — orders whose customer is NOT in the rich-customer set
    (s, d) => {
      val rich = Tables.customer(s, d).filter(col("c_acctbal") >= 1000)
        .select(col("c_custkey").as("o_custkey"))
      Tables.orders(s, d).join(rich, Seq("o_custkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal >= 1000)
      ORDER BY o_orderkey"""))

  val q13Union = Q("q13_union",
    // A4 + N7 — union-by-name of asymmetric payment-like branches
    (s, d) => {
      val a = Tables.lineitem(s, d).select(
        col("l_orderkey").as("key"),
        col("l_extendedprice").cast(DecimalType(18, 2)).cast(DoubleType).as("amount"),
        lit("lineitem").as("source"),
        col("l_returnflag").as("flag"))
      val b = Tables.orders(s, d).select(
        col("o_orderkey").as("key"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("amount"),
        lit("orders").as("source"))
      unionByNameSafe(a, b)
        .orderBy(col("source"), col("key"), col("amount"), col("flag"))
    },
    Some("""SELECT key, amount, source, flag FROM (
        SELECT l_orderkey AS key,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
               'lineitem' AS source, l_returnflag AS flag FROM lineitem
        UNION ALL
        SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE),
               'orders', NULL
        FROM orders)
      ORDER BY source, key, amount, flag NULLS FIRST"""))

  val q14QuarantineNonNull = Q("q14_quarantine_nonnull",
    // W3 — required-non-null split with quarantine tag
    (s, d) => {
      val df = Tables.orders(s, d).withColumn("fecha_pago",
        when(col("o_orderkey") % 7 === 0, lit(null).cast(StringType))
          .otherwise(isoDate(col("o_orderdate"))))
      val (good, bad) = requireNonNull(df, Seq("fecha_pago"))
      good.withColumn("bucket", lit("ok"))
        .unionByName(bad.withColumn("bucket", lit("quarantine")))
        .select(col("o_orderkey"), col("fecha_pago"), col("bucket"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH t AS (SELECT o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN NULL
             ELSE strftime(o_orderdate, '%Y-%m-%d') END AS fecha_pago FROM orders)
      SELECT o_orderkey, fecha_pago,
        CASE WHEN fecha_pago IS NOT NULL THEN 'ok' ELSE 'quarantine' END AS bucket
      FROM t ORDER BY o_orderkey"""))

  // =====================================================================
  // §2.11 — gap surface: joins, aggregates, windows, set ops, top-k
  // =====================================================================

  val q15InnerJoin = Q("q15_inner_join",
    // enriching 3-way join; nation broadcast (25 rows at any SF)
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name ORDER BY c_custkey"""))

  val q16OuterJoin = Q("q16_outer_join",
    // left-outer + zero-fill counts
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType),
          lit(0.0)).as("revenue"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
          AS revenue
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  val q17GroupbyAgg = Q("q17_groupby_agg",
    // TPC-H Q1 shape: the canonical scan→filter→partial-agg→final-agg
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(25, 6))).cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
          AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val q18Rollup = Q("q18_rollup",
    (s, d) => Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("bal"))
      .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first),
    Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST"""))

  val q19Cube = Q("q19_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  val q20WindowFuncs = Q("q20_window_funcs",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        lag(col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType), 1)
          .over(w).as("prev_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey,
        row_number() OVER w AS rn,
        lag(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w
          AS prev_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn"""))

  val q21TopK = Q("q21_topk",
    // orderBy+limit → TakeOrderedAndProject (no full sort at scale)
    (s, d) => Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(100),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  val q22Intersect = Q("q22_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      ORDER BY o_custkey"""))

  val q23Except = Q("q23_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      ORDER BY o_custkey"""))

  val q24Having = Q("q24_having",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
      .filter(col("n_orders") >= 5)
      .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
      ORDER BY o_custkey"""))

  val q41ArrayFuncs = Q("q41_array_funcs",
    // §2.11 array functions: per-order sorted line-number array, then
    // scalar derivations (size/element_at/contains) — scalars only in
    // the output so the oracle hash-compare stays type-simple
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
      .select(col("l_orderkey"),
        size(col("lines")).as("n_lines"),
        element_at(col("lines"), 1).as("first_line"),
        element_at(col("lines"), -1).as("last_line"),
        array_contains(col("lines"), 3).as("has_line3"))
      .orderBy(col("l_orderkey")),
    Some("""WITH t AS (SELECT l_orderkey,
        list_sort(list(l_linenumber)) AS lines FROM lineitem
        GROUP BY l_orderkey)
      SELECT l_orderkey, len(lines) AS n_lines,
        lines[1] AS first_line, lines[-1] AS last_line,
        list_contains(lines, 3) AS has_line3
      FROM t ORDER BY l_orderkey"""))

  val q43DistinctAgg = Q("q43_distinct_agg",
    // multiple DISTINCT aggregates in one group-by — Spark plans this
    // via Expand (one row replica per distinct set), the scalable
    // alternative to per-column subqueries; all-integer outputs keep
    // the oracle comparison exact
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_suppkey")).as("n_supp"),
        count_distinct(col("l_partkey")).as("n_part"),
        count_distinct(col("l_orderkey"), col("l_linenumber")).as("n_lines"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_lines,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q44ApproxSketches = Q("q44_approx_sketches",
    // approximate aggregates for the 100 TB path: HyperLogLog++ distinct
    // counts and quantile sketches replace exact distinct/percentile
    // when a shuffle of the full key set is unaffordable. Raw sketch
    // values differ across engines by design, so the oracle gates the
    // sketches' ERROR CONTRACT instead: Spark computes both sketch and
    // exact per group and emits within-bound booleans (HLL++: |approx -
    // exact| <= 3*rsd*exact; KLL-style quantiles: approx percentile
    // lands between the exact percentiles at p +/- 0.02, far looser
    // than the rank-error n/accuracy guarantee at every test SF); the
    // DuckDB oracle emits the same exact values and literal TRUEs.
    // Hash-match then machine-checks the bounds. Exact percentile here
    // is Spark `percentile` == DuckDB quantile_cont (both type-7,
    // proven bit-equal by q70).
    (s, d) => {
      val quartiles = percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.75)), lit(10000))
      val qtyBounds = percentile(col("l_quantity"),
        array(lit(0.23), lit(0.27), lit(0.73), lit(0.77)))
      val li = Tables.lineitem(s, d)
      // THREE aggregates joined on the (tiny) group key, NOT one.
      // Mixing buffer-typed aggs with the multi-DISTINCT Expand plan
      // is pathological: every non-distinct agg buffer is keyed by the
      // expanded (group, gid, value) stream, so HLL++ registers (and
      // percentile buffers) get allocated PER DISTINCT VALUE instead
      // of per group — measured 31 s for the HLL×Expand mix and 100 s
      // with percentile buffers riding along, vs ~1 s per split agg at
      // sf0.1. Each agg below keeps one buffer per return flag; the
      // re-joins are broadcasts over one row per flag.
      val distincts = li.groupBy(col("l_returnflag"))
        .agg(
          count_distinct(col("l_orderkey")).as("exact_orders"),
          count_distinct(col("l_partkey")).as("exact_parts"))
      val approxes = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey")).as("ao"),
          approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap"))
      val pcts = li.groupBy(col("l_returnflag"))
        .agg(
          // one exact-percentile buffer for all three price points —
          // each percentile() agg keeps its own value buffer per group,
          // so folding 0.48/0.5/0.52 into one call is one sort instead
          // of two over the price column
          percentile(col("l_extendedprice"),
            array(lit(0.48), lit(0.5), lit(0.52))).as("mb"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("am"),
          quartiles.as("q"),
          qtyBounds.as("qb"))
      distincts.join(broadcast(approxes), Seq("l_returnflag"))
        .join(broadcast(pcts), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
          element_at(col("mb"), 2).as("exact_median_price"),
          // HLL++ default rsd = 0.05 -> 15% bound; explicit rsd = 0.01 -> 3%
          (abs(col("ao") - col("exact_orders")) <=
            lit(3 * 0.05) * col("exact_orders")).as("orders_ok"),
          (abs(col("ap") - col("exact_parts")) <=
            lit(3 * 0.01) * col("exact_parts")).as("parts_ok"),
          (col("am").between(element_at(col("mb"), 1),
            element_at(col("mb"), 3))).as("median_ok"),
          (element_at(col("q"), 1).between(element_at(col("qb"), 1),
            element_at(col("qb"), 2))).as("p25_ok"),
          (element_at(col("q"), 2).between(element_at(col("qb"), 3),
            element_at(col("qb"), 4))).as("p75_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_orderkey) AS exact_orders,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
        TRUE AS orders_ok, TRUE AS parts_ok, TRUE AS median_ok,
        TRUE AS p25_ok, TRUE AS p75_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q97BucketedJoin = Q("q97_bucketed_join",
    // bucketed-layout join under the oracle gate: both fact tables are
    // written through Scale.writeBucketed (8 hash buckets on the order
    // key, sorted within buckets), then joined bucket-to-bucket. The
    // merge hint pins sort-merge regardless of size thresholds, and the
    // require() proves the layout claim — the join plans with ZERO
    // exchanges (the shuffle was paid once at write time and is
    // amortized over every later join on the key; at 100 TB this is
    // the difference between re-shuffling the fact table per query and
    // never shuffling it again). Results are layout-invariant, so the
    // oracle is the plain join.
    (s, d) => {
      graft.ops.Scale.writeBucketed(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority")),
        "graft_bkt_orders", 8, "o_orderkey")
      graft.ops.Scale.writeBucketed(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity")),
        "graft_bkt_lineitem", 8, "l_orderkey")
      val joined = s.table("graft_bkt_orders").hint("merge")
        .join(s.table("graft_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      require(!joinPlan.contains("Exchange"),
        s"bucketed join must plan without exchanges:\n$joinPlan")
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
        .select(col("o_orderpriority"), col("n_lines"),
          col("q").cast(DoubleType).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_lines,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val q112CboStats = Q("q112_cbo_stats",
    // cost-based planning from CATALOG COLUMN STATISTICS, no hints:
    // file sizes alone can size a raw table, but only column stats can
    // size a FILTERED one — exactly the case where a selective dim is
    // "the output of an upstream stage" and the optimizer can't see
    // the selectivity. Setup: orders filtered to the top ~3% of
    // o_totalprice's range (min + 0.97·span, computed from data so the
    // oracle can restate it), joined hint-free to lineitem; the
    // broadcast threshold sits at half the orders FILE size, so the
    // unfiltered estimate can never broadcast. Before ANALYZE, filter
    // estimation has no column stats → the filter's size estimate is
    // the whole table → sort-merge (pinned in-plan). After ANALYZE
    // ... FOR ALL COLUMNS, CBO's range interpolation estimates ~3%
    // → the SAME hint-free plan broadcasts (pinned in-plan). At
    // 100 TB this is how plans stay good without per-query broadcast()
    // hints. (sparkPlan, not executedPlan: AQE could rescue the
    // stats-less plan at runtime — the claim is the STATIC choice.)
    // Results are plan-invariant, so the oracle is the plain join.
    (s, d) => {
      graft.ops.Scale.saveManagedTable(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice")), "graft_cbo_orders")
      graft.ops.Scale.saveManagedTable(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        "graft_cbo_lineitem")
      val Array(mn, mx) = s.table("graft_cbo_orders")
        .agg(min(col("o_totalprice")), max(col("o_totalprice")))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val cut = mn + 0.97 * (mx - mn)
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(s"$wh/graft_cbo_orders")
      val fileBytes = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(loc).getLength
      val prior = Seq("spark.sql.cbo.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (fileBytes / 2).toString)
        def joined = s.table("graft_cbo_lineitem")
          .join(s.table("graft_cbo_orders")
            .filter(col("o_totalprice") >= cut),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
          .select(col("l_returnflag"), col("n_lines"),
            col("q").cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_returnflag"))
        val before = joined.queryExecution.sparkPlan.toString
        require(!before.contains("BroadcastHashJoin"),
          s"without column stats the planner must not broadcast:\n$before")
        Seq("graft_cbo_orders", "graft_cbo_lineitem").foreach(t =>
          s.sql(s"ANALYZE TABLE `$t` COMPUTE STATISTICS FOR ALL COLUMNS"))
        val result = joined
        val after = result.queryExecution.sparkPlan.toString
        require(after.contains("BroadcastHashJoin"),
          s"with column stats the hint-free plan must broadcast:\n$after")
        result
      } finally prior.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    },
    Some("""SELECT l_returnflag, count(*) AS n_lines,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice >= (SELECT min(o_totalprice)
          + 0.97 * (max(o_totalprice) - min(o_totalprice)) FROM orders)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q120JsonSource = Q("q120_json_source",
    // JSON-lines as a first-class SOURCE format (alongside sheet-CSV,
    // parquet and ORC): write orders as JSON, read back with an
    // EXPLICIT schema — at 100 TB schema inference is a full second
    // pass over the data, so production JSON reads declare their
    // schema — filter, aggregate. The oracle reads the same files
    // with DuckDB's read_json_auto, so the round-trip (double
    // shortest-representation text, string days) is pinned
    // cross-engine. Fixed path because the oracle SQL is a static
    // string; Verify rewrites it every run.
    (s, d) => {
      val path = "/tmp/graft_q120_json"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
          col("o_totalprice"))
        .write.mode("overwrite").json(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", LongType),
        org.apache.spark.sql.types.StructField("o_custkey", LongType),
        org.apache.spark.sql.types.StructField("o_day", StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", DoubleType)))
      s.read.schema(schema).json(path)
        .filter(col("o_day") >= "1996-01-01")
        .groupBy(col("o_day"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("o_day"))
    },
    Some("""SELECT o_day, count(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM read_json('/tmp/graft_q120_json/*.json',
        format = 'newline_delimited',
        columns = {o_orderkey: 'BIGINT', o_custkey: 'BIGINT',
                   o_day: 'VARCHAR', o_totalprice: 'DOUBLE'})
      WHERE o_day >= '1996-01-01'
      GROUP BY o_day ORDER BY o_day"""))

  val q122XmlSource = Q("q122_xml_source",
    // XML as the FIFTH source format (after sheet-CSV, parquet, ORC,
    // JSON-lines, raw text): Spark 4 ships a native XML datasource
    // (`XmlFileFormat` in sql/core), so document-style feeds plan
    // through the same DSv1 scan machinery as CSV — no extra jars.
    // Part rows round-trip through <part> elements and are read back
    // with an EXPLICIT schema (same rationale as q120: inference is a
    // second full pass at 100 TB). Money goes through DECIMAL(12,2) so
    // both engines see identical canonical text. DuckDB cannot parse
    // XML, so the oracle replays the same projection+aggregate from
    // the base parquet table — any XML escaping/round-trip corruption
    // of the string or numeric columns would break the hash compare.
    (s, d) => {
      val path = PipelineQueries.tempRoot("graft_q122") + "/xml"
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"),
          col("p_retailprice").cast(DecimalType(12, 2)).as("p_price"))
        .write.mode("overwrite").option("rowTag", "part")
        .format("xml").save(path)
      val schema = StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_brand", StringType),
        StructField("p_type", StringType),
        StructField("p_size", LongType),
        StructField("p_price", DecimalType(12, 2))))
      s.read.schema(schema).option("rowTag", "part").format("xml")
        .load(path)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_size")).as("total_size"),
          min(col("p_type")).as("min_type"),
          sum(col("p_price")).cast(DoubleType).as("total_price"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n,
        CAST(SUM(p_size) AS BIGINT) AS total_size,
        min(p_type) AS min_type,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
          AS total_price
      FROM part GROUP BY p_brand ORDER BY p_brand"""))

  val q123LateralJoin = Q("q123_lateral_join",
    // LATERAL correlated derived table — the "top-N related rows per
    // outer row" idiom that window functions can't always replace
    // (the subquery can filter/sort on its own columns before the
    // limit). Catalyst decorrelates the LATERAL into a ranked join —
    // no per-outer-row re-execution, so the shape scales as one
    // shuffle + window rather than O(customers) subquery runs.
    // DuckDB runs the identical SQL: LATERAL is standard in both.
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer_v c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_v o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey, t.o_orderkey""")
    },
    Some("""SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      FROM customer c
      JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
      ) t ON true
      WHERE c.c_custkey <= 300
      ORDER BY c.c_custkey, t.o_orderkey"""))

  val q125RecursiveCte = Q("q125_recursive_cte",
    // WITH RECURSIVE — iterative queries inside one SQL statement
    // (hierarchy walks, transitive closure), new in Spark 4. Each
    // customer key walks the implicit binary-tree hierarchy
    // parent(k) = floor(k/2) up to the root; output is the depth
    // distribution. Each recursion step is one self-referential
    // iteration Catalyst unrolls as a loop of plans — O(log maxKey)
    // rounds here, each a narrow projection+filter (the same
    // pointer-walk shape Graph.connectedComponents implements by hand
    // for when convergence needs checkpointing). DuckDB runs the
    // identical standard SQL.
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(recursiveCteSql("customer_v"))
    },
    Some(recursiveCteSql("customer")))

  private def recursiveCteSql(tbl: String): String =
    s"""WITH RECURSIVE walk(start_id, cur, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM $tbl
        UNION ALL
        SELECT start_id, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
        FROM walk WHERE cur > 1
      )
      SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n,
        CAST(MIN(start_id) AS BIGINT) AS min_id,
        CAST(MAX(start_id) AS BIGINT) AS max_id
      FROM walk WHERE cur = 1
      GROUP BY depth ORDER BY depth"""

  val q126NullSafeJoin = Q("q126_nullsafe_join",
    // null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    // keys match each other — the semantics needed when joining on a
    // nullable business key without first null-filtering both sides.
    // Plans as a normal equi-join (the null-safe operator is a valid
    // hash key because NULL hashes to a single bucket), NOT a
    // cartesian with a filter — same one-shuffle shape at any scale.
    // Keys are synthesized with NULLIF so every SF exercises the
    // NULL-matches-NULL row.
    (s, d) => {
      val left = Tables.orders(s, d)
        .groupBy(nullif(col("o_custkey") % 7, lit(0)).as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val right = Tables.orders(s, d)
        .groupBy(nullif(col("o_custkey") % 7, lit(0)).as("k2"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("total"))
      left.join(right, col("k") <=> col("k2"))
        .select(col("k"), col("n_orders"), col("total"))
        .orderBy(col("k").asc_nulls_first)
    },
    Some("""WITH l AS (SELECT NULLIF(o_custkey % 7, 0) AS k,
          count(*) AS n_orders FROM orders GROUP BY 1),
        r AS (SELECT NULLIF(o_custkey % 7, 0) AS k2,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders GROUP BY 1)
      SELECT k, n_orders, total FROM l JOIN r ON k IS NOT DISTINCT FROM k2
      ORDER BY k NULLS FIRST"""))

  val q127ShuffleHashJoin = Q("q127_shuffle_hash_join",
    // physical join-strategy control: the SHUFFLE_HASH hint forces a
    // ShuffledHashJoin where Catalyst would default to sort-merge.
    // At scale SHJ skips BOTH sort passes when the per-partition build
    // side fits in memory — the right call for a medium dimension too
    // big to broadcast but far smaller than the fact side. The require
    // pins the physical operator in-plan (q97-style), so a planner
    // regression that silently falls back to SMJ fails the query; the
    // oracle pins that the strategy change never changes results.
    (s, d) => {
      val ord = Tables.orders(s, d).hint("shuffle_hash")
      val li = Tables.lineitem(s, d)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total_qty"))
        .orderBy(col("o_orderpriority"))
      val phys = joined.queryExecution.executedPlan.toString
      require(phys.contains("ShuffledHashJoin"),
        s"SHUFFLE_HASH hint did not produce a ShuffledHashJoin:\n$phys")
      joined
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val q128CorruptJson = Q("q128_corrupt_json",
    // corrupt-record-tolerant ingestion — the reference's robust-scan
    // ethos (S6/W3) applied to JSON feeds: at 100 TB some producer
    // always emits garbage lines, and failing the whole scan (or
    // silently dropping them) is wrong. Every 13th line is
    // deterministically mangled; the PERMISSIVE reader surfaces each
    // malformed line in `columnNameOfCorruptRecord` instead of
    // aborting, so bad rows are counted/quarantined in the same pass
    // that aggregates the good ones — one scan, no retry loop. The
    // oracle replays the same validity split with DuckDB's
    // json_valid over the identical bytes.
    (s, d) => {
      val path = "/tmp/graft_q128_json"
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"))).as("j"))
        .select(when(col("o_orderkey") % 13 === 0,
            concat(lit("{corrupt "), col("j"))).otherwise(col("j"))
          .as("value"))
        .write.mode("overwrite").text(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_totalprice", DoubleType),
        StructField("_bad", StringType)))
      // materialize the parsed rows before the validity split: Spark
      // refuses raw-file scans whose pruned schema is ONLY the corrupt
      // -record column (a count() over the validity grouping prunes to
      // exactly that), and its documented remedy is to cache/save the
      // parse first — which is also the production shape: parse once,
      // land the typed+quarantine columns, query the landed copy.
      graft.ops.Relational.eager(s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path))
        .groupBy(col("_bad").isNull.as("valid"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("valid"))
    },
    Some("""SELECT json_valid(line) AS valid, count(*) AS n,
        CAST(SUM(CASE WHEN json_valid(line) THEN
          CAST(CAST(line AS JSON)->>'$.o_totalprice' AS DECIMAL(18,2))
        END) AS DOUBLE) AS total
      FROM read_csv('/tmp/graft_q128_json/*.txt',
        columns = {line: 'VARCHAR'}, delim = e'\t',
        quote = '', escape = '', header = false)
      GROUP BY 1 ORDER BY valid"""))

  val q129UnionByName = Q("q129_union_by_name",
    // union-by-NAME with missing-column synthesis — schema-drift union
    // across frames whose column sets disagree (the in-memory twin of
    // q113's on-disk drift, and the reference's N7 missing-column
    // synthesis applied to set operations): positional UNION would
    // mis-bind or reject, unionByName aligns by name and null-fills
    // what either side lacks. DuckDB's UNION ALL BY NAME is the same
    // standard semantics.
    (s, d) => {
      val sup = Tables.supplier(s, d)
      val a = sup.filter(col("s_suppkey") % 2 === 0)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      val b = sup.filter(col("s_suppkey") % 2 === 1)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name, s_nationkey, NULL AS s_acctbal
        FROM supplier WHERE s_suppkey % 2 = 0
      UNION ALL BY NAME
      SELECT s_suppkey, s_name, s_acctbal
        FROM supplier WHERE s_suppkey % 2 = 1
      ORDER BY s_suppkey"""))

  val q169GlobalRownum = Q("q169_global_rownum",
    // contiguous 0-based global row numbers WITHOUT the single-
    // partition window collapse (ops/Scale.globalRowNumber): a naive
    // row_number() OVER (ORDER BY …) with no PARTITION BY plans every
    // row through ONE task — Exchange SinglePartition, the classic
    // 100 TB trap (GlobalIndexSpec pins both plan shapes). The
    // two-pass form range-sorts normally, counts per partition (one
    // bounded job, #partitions rows to the driver), and adds
    // prefix-sum offsets to a streaming per-partition index. Ordered
    // by (source, doc_id) — a composite total order whose doc_id
    // tiebreaker makes the numbering engine-independent.
    (s, d) => {
      graft.ops.Scale.globalRowNumber(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "row_num", col("source"), col("doc_id"))
        .orderBy(col("row_num"))
    },
    Some("""SELECT doc_id, source,
        row_number() OVER (ORDER BY source, doc_id) - 1 AS row_num
      FROM documents ORDER BY row_num"""))

  val q113SchemaDrift = Q("q113_schema_drift",
    // schema-DRIFT ingestion for the big-data path — the reference's
    // hostile-header ethos (S2-S6/N7) applied to parquet: one table
    // directory whose files disagree on schema, the long-lived-table
    // reality at 100 TB (producers add columns, old files stay). Two
    // generations written into ONE dir (gen1 carries o_custkey, gen2
    // replaces it with o_orderpriority); `mergeSchema` unions the
    // footers by name, null-filling what each generation lacks — the
    // require pins that every generation's columns surfaced. The
    // oracle restates the same union in SQL (DuckDB's union_by_name
    // semantics over the base table).
    (s, d) => {
      val dir = PipelineQueries.tempRoot("graft_q113") + "/drift"
      val ord = Tables.orders(s, d)
      ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(dir)
      ord.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("append").parquet(dir)
      val merged = s.read.option("mergeSchema", "true").parquet(dir)
      require(merged.columns.toSet == Set("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderpriority"),
        s"mergeSchema must surface every generation's columns, " +
          s"got ${merged.columns.mkString(",")}")
      merged.select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
        NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, NULL, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
      ORDER BY o_orderkey"""))

  val q100BloomPrune = Q("q100_bloom_prune",
    // runtime bloom pruning under the oracle gate: a ~10%-selective
    // dimension (urgent, high-value orders) builds a mergeable
    // BloomFilterAggregate sketch; the fact scan drops non-candidate
    // rows BEFORE the join shuffle via might_contain on the same
    // xxhash64 key. False positives are removed by the join itself, so
    // the prune is semantically invisible — the oracle is the plain
    // join. The require() pins the plan claim: the sketch probe sits
    // in the fact scan's filter, i.e. shuffle bytes scale with the
    // dimension's selectivity, not the fact's row count.
    (s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") >= 200000)
        .select(col("o_orderkey").as("okey"),
          to_date(col("o_orderdate")).as("oday"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
      val joined = graft.ops.Scale.bloomPrunedJoin(fact, dim, Seq("okey"),
        expectedItems = 1L << 16)
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("might_contain"),
        s"bloom prune must reach the fact side's filter:\n$plan")
      joined
        .groupBy(date_format(col("oday"), "yyyy-MM").as("omonth"))
        .agg(count(lit(1)).as("n_lines"), sum(col("price")).as("rev"))
        .select(col("omonth"), col("n_lines"),
          col("rev").cast(DoubleType).as("revenue"))
        .orderBy(col("omonth"))
    },
    Some("""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS omonth,
        count(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 200000
      GROUP BY 1 ORDER BY omonth"""))

  val q101OrcSource = Q("q101_orc_source",
    // ORC as an alternate columnar source/sink: write a lineitem
    // projection as ORC, read it back, and run a filtered aggregate
    // over the round-trip. The require() pins that the scan really is
    // the ORC reader with the quantity predicate pushed into it —
    // format choice must not cost the filter/prune machinery the
    // parquet path gets. Results are format-invariant, so the oracle
    // is the same aggregate over the original parquet.
    (s, d) => {
      val dir = PipelineQueries.tempRoot("graft_orc_") + "/lineitem_orc"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        .write.mode("overwrite").orc(dir)
      val back = s.read.orc(dir).filter(col("l_quantity") >= 30)
      val plan = back.queryExecution.executedPlan.toString
      require(plan.contains("Format: orc") || plan.toLowerCase.contains("orc"),
        s"round-trip must scan ORC:\n$plan")
      require(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
        s"quantity predicate must push into the ORC scan:\n$plan")
      back.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev"))
        .select(col("l_returnflag"), col("n_lines"),
          col("rev").cast(DoubleType).as("revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem WHERE l_quantity >= 30
      GROUP BY 1 ORDER BY l_returnflag"""))

  val q102IncrementalAgg = Q("q102_incremental_agg",
    // incremental aggregate maintenance under the oracle gate: the
    // orders table arrives as three batches (split by order key — any
    // partitioning works, the merge is a monoid fold); each batch is
    // reduced to partial (sum, cnt) rows and folded into the running
    // state via Scale.incrementalAgg. The folded state must equal the
    // full recompute exactly — which is what the oracle is: one plain
    // GROUP BY over everything. Sums stay DECIMAL through the fold so
    // the equality is bit-exact, not approximate.
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val batches = (0 until 3).map(i =>
        base.filter(col("o_orderkey") % 3 === i).drop("o_orderkey"))
      val state = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (st, b) => Some(graft.ops.Scale.incrementalAgg(
          st, b, Seq("o_orderpriority"), "price"))
      }.get
      state.select(col("o_orderpriority"),
        col("agg_sum").cast(DoubleType).as("total_price"),
        col("agg_cnt").as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        COUNT(o_totalprice) AS n_orders
      FROM orders GROUP BY 1 ORDER BY o_orderpriority"""))

  val q103HllMerge = Q("q103_hll_merge",
    // mergeable distinct-count sketches — the 100 TB distinct path:
    // one Datasketches HLL sketch per month (partial-aggregated, never
    // a global shuffle of raw values), merged downstream with
    // hll_union_agg into the all-time estimate WITHOUT revisiting the
    // rows. Correctness contract is the q44 pattern: Spark emits the
    // exact distinct count plus a sketch-vs-exact within-5% boolean;
    // the oracle computes the same exacts and pins the booleans to
    // TRUE — hash-match then machine-checks the sketches' error bound.
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
          col("o_custkey"))
      // sketches and exact distincts in SEPARATE aggregates (the q44
      // lesson: a buffer agg sharing a plan with count_distinct gets
      // keyed by the Expand stream — one HLL buffer per distinct
      // (month, custkey) instead of per month), re-joined on the
      // bounded month key
      val sketches = base.groupBy(col("m"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val exacts = base.groupBy(col("m"))
        .agg(countDistinct(col("o_custkey")).as("exact_customers"))
      val monthly = sketches.join(broadcast(exacts), Seq("m"))
        .transform(graft.ops.Relational.eager)
      val per = monthly.select(col("m"), col("exact_customers"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("within_bound"))
      val tot = monthly.agg(hll_union_agg(col("sk")).as("sk"))
        .crossJoin(base.agg(countDistinct(col("o_custkey"))
          .as("exact_customers")))
        .select(lit("ALL").as("m"), col("exact_customers"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_customers")) <=
            col("exact_customers") * 0.05).as("within_bound"))
      per.unionByName(tot).orderBy(col("m"))
    },
    Some("""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
        count(DISTINCT o_custkey) AS exact_customers, TRUE AS within_bound
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 'ALL' AS m, count(DISTINCT o_custkey), TRUE FROM orders
      ORDER BY m"""))

  val q104ThetaSetops = Q("q104_theta_setops",
    // Theta sketches — the sketch family that supports SET ALGEBRA on
    // distinct counts: |A|, |B|, |A∪B| via theta_union_agg and |A∩B|
    // via theta_intersection_agg, all from per-segment sketches built
    // in one pass each and merged WITHOUT revisiting rows (audience-
    // overlap analytics at 100 TB: per-segment sketches are tiny,
    // overlap questions compose after the fact). Error contract per
    // the q44 pattern: exact values + within-bound booleans the oracle
    // pins to TRUE. Intersection error scales with union size (Theta
    // intersection is estimated from sampled unions), so its bound is
    // relative to the union, not the intersection.
    (s, d) => {
      val base = Tables.orders(s, d).select(col("o_custkey"),
        (col("o_orderpriority") === "1-URGENT").as("in_a"),
        (col("o_orderstatus") === "F").as("in_b"))
      // per-customer membership: a customer is in a segment if ANY of
      // their orders is — one partial-agg shuffle on custkey
      val memb = base.groupBy(col("o_custkey"))
        .agg(max(col("in_a")).as("a"), max(col("in_b")).as("b"))
        .transform(graft.ops.Relational.eager)
      val exact = memb.agg(
        count_if(col("a")).as("exact_a"),
        count_if(col("b")).as("exact_b"),
        count_if(col("a") || col("b")).as("exact_union"),
        count_if(col("a") && col("b")).as("exact_inter"))
      val sketches = memb
        .select(col("o_custkey"),
          explode(concat(
            when(col("a"), array(lit("A"))).otherwise(array().cast("array<string>")),
            when(col("b"), array(lit("B"))).otherwise(array().cast("array<string>"))))
            .as("seg"))
        .groupBy(col("seg"))
        .agg(expr("theta_sketch_agg(o_custkey)").as("sk"))
      val ests = sketches.agg(
        expr("theta_sketch_estimate(theta_union_agg(sk))").as("est_union"),
        expr("theta_sketch_estimate(theta_intersection_agg(sk))").as("est_inter"))
      val perSeg = sketches
        .select(col("seg"), expr("theta_sketch_estimate(sk)").as("est"))
        .groupBy()
        .pivot(col("seg"), Seq("A", "B")).agg(first(col("est")))
      exact.crossJoin(ests).crossJoin(perSeg)
        .select(col("exact_a"), col("exact_b"),
          col("exact_union"), col("exact_inter"),
          (abs(col("A") - col("exact_a")) <= col("exact_a") * 0.05)
            .as("a_ok"),
          (abs(col("B") - col("exact_b")) <= col("exact_b") * 0.05)
            .as("b_ok"),
          (abs(col("est_union") - col("exact_union")) <=
            col("exact_union") * 0.05).as("union_ok"),
          (abs(col("est_inter") - col("exact_inter")) <=
            col("exact_union") * 0.05).as("inter_ok"))
    },
    Some("""WITH memb AS (SELECT o_custkey,
          bool_or(o_orderpriority = '1-URGENT') AS a,
          bool_or(o_orderstatus = 'F') AS b
        FROM orders GROUP BY o_custkey)
      SELECT count(*) FILTER (a) AS exact_a,
        count(*) FILTER (b) AS exact_b,
        count(*) FILTER (a OR b) AS exact_union,
        count(*) FILTER (a AND b) AS exact_inter,
        TRUE AS a_ok, TRUE AS b_ok, TRUE AS union_ok, TRUE AS inter_ok
      FROM memb"""))

  val q105ApproxTopk = Q("q105_approx_topk",
    // mergeable frequent-items sketches: per-day approx_top_k_accumulate
    // states combined downstream (approx_top_k_combine) and estimated
    // once — the per-partition-sketch-then-merge shape again, here for
    // "top items" instead of distinct counts. With the tracked-item
    // capacity above the column's true cardinality the sketch counts
    // are EXACT, so the oracle is the plain exact GROUP BY top-k —
    // a hash-match, not an error bound.
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        .agg(expr("approx_top_k_accumulate(event_type, 5)").as("acc"))
      daily.agg(expr("approx_top_k_combine(acc)").as("st"))
        .select(explode(expr("approx_top_k_estimate(st, 5)")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS cnt FROM events
      GROUP BY event_type ORDER BY cnt DESC, event_type"""))

  val q106KllQuantiles = Q("q106_kll_quantiles",
    // mergeable quantile sketches (KLL): one sketch per month of order
    // totals, merged with kll_sketch_merge_double into the all-time
    // sketch — the percentile analogue of q103's HLL merge (at 100 TB
    // the exact percentile's global sort is the thing you cannot
    // afford; per-partition KLL states merge in O(sketch) instead).
    // Gate: the merged sketch's median must land inside the exact
    // p47–p53 bracket (default k=200 ⇒ ~1.65% rank error at 99%
    // confidence; the ±3% bracket is conservative), plus exact bracket
    // values themselves — Spark percentile ≡ DuckDB quantile_cont
    // (type-7, proven bit-equal by q70).
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
          col("o_totalprice"))
        .groupBy(col("m"))
        .agg(expr("kll_sketch_agg_double(o_totalprice)").as("sk"))
      // kll_sketch_merge_double is a pairwise scalar merge, so the
      // per-month sketches (one small binary each) fold via a lambda —
      // the collect_list is bounded by the number of months, not rows
      val merged = monthly
        .agg(collect_list(col("sk")).as("sks"))
        .select(expr("""aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)),
            sks[0], (acc, x) -> kll_sketch_merge_double(acc, x))""").as("sk"))
        .select(expr("kll_sketch_get_quantile_double(sk, 0.5)").as("est"),
          expr("kll_sketch_get_n_double(sk)").as("n"))
      val exact = Tables.orders(s, d).agg(
        percentile(col("o_totalprice"),
          array(lit(0.47), lit(0.5), lit(0.53))).as("p"),
        count(col("o_totalprice")).as("n_exact"))
      merged.crossJoin(exact)
        .select(col("n"), col("n_exact"),
          element_at(col("p"), 1).as("exact_p47"),
          element_at(col("p"), 2).as("exact_median"),
          element_at(col("p"), 3).as("exact_p53"),
          (col("n") === col("n_exact")).as("n_ok"),
          col("est").between(element_at(col("p"), 1),
            element_at(col("p"), 3)).as("median_ok"))
    },
    Some("""SELECT count(o_totalprice) AS n, count(o_totalprice) AS n_exact,
        quantile_cont(o_totalprice, 0.47) AS exact_p47,
        quantile_cont(o_totalprice, 0.5) AS exact_median,
        quantile_cont(o_totalprice, 0.53) AS exact_p53,
        TRUE AS n_ok, TRUE AS median_ok
      FROM orders"""))

  val q108QualityChecks = Q("q108_quality_checks",
    // declarative data-quality gate (graft.ops.Quality, the deequ
    // shape): null-fraction, key-uniqueness, range and pattern rules
    // evaluated as one shared aggregate for the row-local rules plus
    // one tiny distinct aggregate per uniqueness rule (the q44 Expand
    // lesson baked into the operator), returning a (rule, metric,
    // passed) report. The oracle recomputes every metric in closed
    // form — exact long counts and IEEE double divisions, so the
    // report hash-matches.
    (s, d) => graft.ops.Quality.check(Tables.orders(s, d), Seq(
      graft.ops.Quality.NotNull("o_custkey"),
      graft.ops.Quality.NotNull("o_orderdate"),
      graft.ops.Quality.Unique(Seq("o_orderkey")),
      graft.ops.Quality.InRange("o_totalprice", 0.0, 1000000.0),
      graft.ops.Quality.Matches("o_orderpriority", "^[1-5]-[A-Z]+$", 0.75))),
    Some("""WITH m AS (SELECT count(*) AS n,
          count(o_totalprice) AS n_price,
          count(o_orderpriority) AS n_prio,
          sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
          sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS null_date,
          sum(CASE WHEN o_totalprice BETWEEN 0 AND 1000000
              THEN 1 ELSE 0 END) AS in_range,
          sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
              THEN 1 ELSE 0 END) AS re_match,
          count(*) - count(DISTINCT o_orderkey) AS dups
        FROM orders)
      SELECT * FROM (
        SELECT 'in_range:o_totalprice' AS rule,
          CAST(in_range AS DOUBLE) / n_price AS metric,
          CAST(in_range AS DOUBLE) / n_price >= 1.0 AS passed FROM m
        UNION ALL SELECT 'matches:o_orderpriority',
          CAST(re_match AS DOUBLE) / n_prio,
          CAST(re_match AS DOUBLE) / n_prio >= 0.75 FROM m
        UNION ALL SELECT 'not_null:o_custkey',
          CAST(null_cust AS DOUBLE) / n,
          CAST(null_cust AS DOUBLE) / n <= 0.0 FROM m
        UNION ALL SELECT 'not_null:o_orderdate',
          CAST(null_date AS DOUBLE) / n,
          CAST(null_date AS DOUBLE) / n <= 0.0 FROM m
        UNION ALL SELECT 'unique:o_orderkey',
          CAST(dups AS DOUBLE), CAST(dups AS DOUBLE) = 0.0 FROM m)
      ORDER BY rule"""))

  val q46SaltedAgg = Q("q46_salted_agg",
    // skew tool under the correctness gate: l_returnflag has only a
    // handful of distinct values, so EVERY group key is a hot reduce key
    // — exactly the shape Scale.saltedSumCount exists for. Salting must
    // be semantically invisible, so the oracle is the plain GROUP BY.
    // Values are summed in DECIMAL (exact, order-independent): a salted
    // two-phase DOUBLE sum would be legal Spark but not bit-stable.
    (s, d) => graft.ops.Scale.saltedSumCount(
      Tables.lineitem(s, d).select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty")),
      Seq("l_returnflag"), "qty", salts = 16)
      .select(col("l_returnflag"),
        col("sum_qty").cast(DoubleType).as("sum_qty"), col("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first),
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag
      ORDER BY l_returnflag ASC NULLS FIRST"""))

  val q48SaltedJoin = Q("q48_salted_join",
    // the second skew tool under the correctness gate: a salted inner
    // equi-join (left's key spread over 8 sub-keys, right replicated ×8)
    // must produce exactly the rows of the plain join — the oracle IS
    // the plain join. Aggregated output keeps the comparison small;
    // DECIMAL sums stay order-independent under the salt.
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
      val right = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.ops.Scale.saltedJoin(li, right, Seq("l_orderkey"), salts = 8)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("qty")).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    },
    Some("""SELECT o_orderstatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS FIRST"""))

  val q53SqlExists = Q("q53_sql_exists",
    // the SQL entry path: temp views + spark.sql with correlated
    // EXISTS / NOT EXISTS — Catalyst rewrites both to left-semi /
    // left-anti joins (the same physical shapes as q11/q12), proving
    // the textual interface plans identically to the Column API.
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_custkey, c_name FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM orders_v o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  val q54GroupingSets = Q("q54_grouping_sets",
    // explicit GROUPING SETS (the general form rollup/cube specialize)
    // + grouping_id to disambiguate which set produced each row —
    // planned through Expand exactly like q18/q19, one shuffle
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
          grouping_id(o_orderstatus, o_orderpriority) AS gid,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          (o_orderstatus), ())
        ORDER BY gid, o_orderstatus ASC NULLS FIRST,
          o_orderpriority ASC NULLS FIRST""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
        GROUPING(o_orderstatus, o_orderpriority) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        (o_orderstatus), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        o_orderpriority ASC NULLS FIRST"""))

  val q55Calendar = Q("q55_calendar",
    // §2.5 calendar surface beyond the parse ladder: month truncation,
    // end-of-month, day arithmetic — restricted to functions whose
    // semantics Spark and DuckDB share exactly (dayofweek numbering and
    // months_between conventions differ across engines; excluded)
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        datediff(lit("1998-12-31").cast(DateType),
          col("o_orderdate").cast(DateType)).as("days_to_eoy"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
          AS days_to_eoy,
        year(o_orderdate) AS y,
        quarter(o_orderdate) AS q
      FROM orders ORDER BY o_orderkey"""))

  val q56WindowRangeFrame = Q("q56_window_range_frame",
    // RANGE window frame over a numeric day index: trailing-30-day
    // revenue per customer. RANGE (not ROWS) so same-day peer rows
    // aggregate identically regardless of intra-day row order —
    // deterministic under any shuffle. One shuffle on o_custkey, then
    // a sorted single-pass window scan per partition.
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_rf")
      s.sql("""SELECT o_orderkey, o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS rev_30d
        FROM orders_rf ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey
          ORDER BY date_diff('day', DATE '1992-01-01',
            CAST(o_orderdate AS DATE))
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
      FROM orders ORDER BY o_orderkey"""))

  val q58ListAgg = Q("q58_listagg",
    // ordered string aggregation (LISTAGG / STRING_AGG): per-order
    // concatenation made deterministic by sorting the collected values
    // before joining; collect_list is a partial-aggregable buffer, so
    // the plan keeps map-side combine (one shuffle on l_orderkey)
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(array_sort(collect_list(col("l_linestatus"))), ",")
          .as("statuses"),
        array_join(
          transform(array_sort(collect_list(col("l_linenumber"))),
            x => x.cast(StringType)), ",").as("lines"),
        count(lit(1)).as("n"))
      .orderBy(col("l_orderkey")),
    Some("""SELECT l_orderkey,
        string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        string_agg(CAST(l_linenumber AS VARCHAR), ','
          ORDER BY l_linenumber) AS lines,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  val q59FilterAgg = Q("q59_filter_agg",
    // FILTER-clause conditional aggregation: one scan computes several
    // differently-predicated aggregates (vs N self-joined subqueries).
    // DECIMAL sums keep the values order-independent and bit-identical
    // across engines; one shuffle on the group key.
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_fa")
      s.sql("""SELECT l_returnflag,
          COUNT(*) AS n,
          COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01')
            AS DOUBLE) AS rev_95plus,
          CAST(SUM(CAST(l_quantity AS BIGINT))
            FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
        FROM lineitem_fa GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
        COUNT(*) AS n,
        COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
          FILTER (WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01')
          AS DOUBLE) AS rev_95plus,
        CAST(SUM(CAST(l_quantity AS BIGINT))
          FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q60Explode = Q("q60_explode",
    // lateral explode (Generate): row-expanding operator distinct from
    // project/filter/agg — narrow (no shuffle), output rows carry their
    // parent key so downstream joins/aggs shuffle on the expanded rows
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        explode(sequence(lit(1L), pmod(col("o_orderkey"), lit(3)) + 1))
          .as("val"))
      .orderBy(col("o_orderkey"), col("val")),
    Some("""SELECT o_orderkey,
        unnest(generate_series(1, o_orderkey % 3 + 1)) AS val
      FROM orders ORDER BY o_orderkey, val"""))

  val q62RankingWindows = Q("q62_ranking_windows",
    // the ranking-function family beyond q20: dense_rank, ntile,
    // percent_rank, cume_dist — all over one window, so one shuffle +
    // one sort serves four functions. Ordering key is the unique
    // (l_orderkey, l_linenumber) pair, making every rank deterministic;
    // percent_rank/cume_dist are exact integer ratios, so the doubles
    // are bit-identical across engines.
    // NOTE the synthetic lineitem has duplicate (orderkey, linenumber)
    // pairs, so ranks over the raw table would be tie-order-dependent;
    // the pre-aggregation makes the ordering key genuinely unique.
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_rw")
      s.sql("""WITH li AS (
          SELECT l_orderkey, l_linenumber, min(l_returnflag) AS rf
          FROM lineitem_rw GROUP BY l_orderkey, l_linenumber)
        SELECT l_orderkey, l_linenumber, rf,
          dense_rank()   OVER w AS drank,
          ntile(4)       OVER w AS quartile,
          percent_rank() OVER w AS prank,
          cume_dist()    OVER w AS cdist
        FROM li
        WINDOW w AS (PARTITION BY rf ORDER BY l_orderkey, l_linenumber)
        ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""WITH li AS (
        SELECT l_orderkey, l_linenumber, min(l_returnflag) AS rf
        FROM lineitem GROUP BY l_orderkey, l_linenumber)
      SELECT l_orderkey, l_linenumber, rf,
        dense_rank()   OVER w AS drank,
        ntile(4)       OVER w AS quartile,
        percent_rank() OVER w AS prank,
        cume_dist()    OVER w AS cdist
      FROM li
      WINDOW w AS (PARTITION BY rf ORDER BY l_orderkey, l_linenumber)
      ORDER BY l_orderkey, l_linenumber"""))

  val q63ConditionalFuncs = Q("q63_conditional_funcs",
    // scalar conditional family: greatest/least/coalesce/nullif/CASE
    // in one expression-only projection (zero shuffles; codegen'd)
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        // floor() BEFORE the long conversion on both sides: a bare
        // double→long cast truncates toward zero in Spark but rounds to
        // nearest in DuckDB (28.999999... → 28 vs 29), so the bit-exact
        // gate would break on any non-ladder discount value
        greatest(floor(col("l_quantity")),
          floor(col("l_discount") * 100)).as("g"),
        least(floor(col("l_quantity")),
          col("l_linenumber").cast(LongType)).as("l"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("flag_or_none"),
        when(col("l_quantity") > 25, "bulk")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("small").as("bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
        greatest(CAST(floor(l_quantity) AS BIGINT),
          CAST(floor(l_discount * 100) AS BIGINT)) AS g,
        least(CAST(floor(l_quantity) AS BIGINT),
          CAST(l_linenumber AS BIGINT)) AS l,
        coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        CASE WHEN l_quantity > 25 THEN 'bulk'
             WHEN l_quantity > 10 THEN 'mid'
             ELSE 'small' END AS bucket
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  val q64StringLadder = Q("q64_string_ladder",
    // the remaining shared string surface in one projection: pad,
    // translate, repeat, reverse, substring, position, concat_ws
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        concat_ws("|", col("c_mktsegment"),
          reverse(col("c_name"))).as("joined"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        instr(col("c_name"), "#").as("hash_pos"),
        repeat(lit("ab"), 3).as("abab"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        concat_ws('|', c_mktsegment, reverse(c_name)) AS joined,
        substring(c_name, 1, 8) AS prefix8,
        instr(c_name, '#') AS hash_pos,
        repeat('ab', 3) AS abab
      FROM customer ORDER BY c_custkey"""))

  val q65HigherOrderFuncs = Q("q65_higher_order_funcs",
    // lambda higher-order functions (transform/filter/aggregate) over a
    // per-group array — the codegen-friendly alternative to exploding
    // and re-aggregating (one shuffle for the collect, then
    // expression-only). Scalars only in the output (pandas-harness
    // rule); sums cast to BIGINT on both sides (DuckDB widens to
    // HUGEINT).
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_hof")
      s.sql("""WITH t AS (SELECT l_orderkey,
          sort_array(collect_list(CAST(l_linenumber AS BIGINT))) AS arr
        FROM lineitem_hof GROUP BY l_orderkey)
        SELECT l_orderkey,
          aggregate(transform(arr, x -> x * x), 0L, (a, x) -> a + x)
            AS sq_sum,
          size(filter(arr, x -> x % 2 = 0)) AS n_even,
          element_at(transform(arr, x -> x + 1), -1) AS last_plus1
        FROM t ORDER BY l_orderkey""")
    },
    Some("""WITH t AS (SELECT l_orderkey,
        list_sort(list(CAST(l_linenumber AS BIGINT))) AS arr
      FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
        CAST(list_aggregate(list_transform(arr, x -> x * x), 'sum')
          AS BIGINT) AS sq_sum,
        CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INTEGER) AS n_even,
        list_transform(arr, x -> x + 1)[-1] AS last_plus1
      FROM t ORDER BY l_orderkey"""))

  val q67SetOpsAll = Q("q67_setops_all",
    // multiset set-ops (INTERSECT ALL / EXCEPT ALL): duplicate
    // multiplicity is part of the semantics, unlike q22/q23's
    // set-variants. Spark plans both through a single aggregate +
    // generate (replicate min/residual counts) — one shuffle each.
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_linenumber") <= 4)
        .select(col("l_suppkey"), col("l_returnflag"))
      val b = li.filter(col("l_linenumber") >= 3)
        .select(col("l_suppkey"), col("l_returnflag"))
      a.intersectAll(b)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_intersect"))
        .join(
          a.exceptAll(b).groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("n_except")),
          Seq("l_returnflag"), "full_outer")
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH a AS (SELECT l_suppkey, l_returnflag FROM lineitem
        WHERE l_linenumber <= 4),
      b AS (SELECT l_suppkey, l_returnflag FROM lineitem
        WHERE l_linenumber >= 3),
      i AS (SELECT l_returnflag, COUNT(*) AS n_intersect
        FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        GROUP BY l_returnflag),
      e AS (SELECT l_returnflag, COUNT(*) AS n_except
        FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        GROUP BY l_returnflag)
      SELECT coalesce(i.l_returnflag, e.l_returnflag) AS l_returnflag,
        n_intersect, n_except
      FROM i FULL OUTER JOIN e ON i.l_returnflag = e.l_returnflag
      ORDER BY l_returnflag"""))

  val q68Unpivot = Q("q68_unpivot",
    // wide→long melt (Dataset.unpivot): the inverse of q52's pivot.
    // Measures are cast to DECIMAL(18,4) BEFORE the melt so the value
    // column has one exact type and the downstream sums are
    // order-independent (the q46 lesson: double sums differ in the last
    // ulp between engines/partitionings). Unpivot itself is a local
    // Expand — rows × 4, zero shuffles — and the only shuffle is the
    // 4-group aggregate after it.
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_quantity").cast(DecimalType(18, 4)).as("l_quantity"),
        col("l_extendedprice").cast(DecimalType(18, 4)).as("l_extendedprice"),
        col("l_discount").cast(DecimalType(18, 4)).as("l_discount"),
        col("l_tax").cast(DecimalType(18, 4)).as("l_tax"))
      li.unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        // sums stay DECIMAL (exact, order-independent) through the
        // aggregate; the FINAL cast to double is one deterministic
        // conversion both engines format identically
        .agg(count(lit(1)).as("n"),
          sum(col("value")).cast(DoubleType).as("sum_value"),
          min(col("value")).cast(DoubleType).as("min_value"),
          max(col("value")).cast(DoubleType).as("max_value"))
        .orderBy(col("metric"))
    },
    Some("""WITH u AS (
        SELECT 'l_quantity' AS metric,
          CAST(l_quantity AS DECIMAL(18,4)) AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice',
          CAST(l_extendedprice AS DECIMAL(18,4)) FROM lineitem
        UNION ALL SELECT 'l_discount',
          CAST(l_discount AS DECIMAL(18,4)) FROM lineitem
        UNION ALL SELECT 'l_tax',
          CAST(l_tax AS DECIMAL(18,4)) FROM lineitem)
      SELECT metric, COUNT(*) AS n,
        CAST(SUM(value) AS DOUBLE) AS sum_value,
        CAST(MIN(value) AS DOUBLE) AS min_value,
        CAST(MAX(value) AS DOUBLE) AS max_value
      FROM u GROUP BY metric ORDER BY metric"""))

  val q69ScalarSubquery = Q("q69_scalar_subquery",
    // scalar subqueries through the SQL interface: a correlated scalar
    // aggregate (per-brand average) and an uncorrelated one (global
    // max). Catalyst decorrelates the former into an aggregate +
    // broadcast-able join on p_brand and evaluates the latter once as a
    // one-row subquery plan — no per-row re-execution anywhere, which is
    // what makes the textual form safe at 100 TB.
    (s, d) => {
      // no multiplier on the correlated average: the synthetic price
      // range tightens with SF (900–920 at sf0.001), so any scaled
      // threshold empties the result at some SF and the oracle gate
      // becomes vacuous (empty-vs-empty proves nothing)
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql("""SELECT p_partkey, p_brand, p_retailprice FROM part_v p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice)
                                      FROM part_v p2
                                      WHERE p2.p_brand = p.p_brand)
          AND p_retailprice < (SELECT max(p3.p_retailprice) FROM part_v p3) - 1.0
        ORDER BY p_partkey""")
    },
    Some("""SELECT p_partkey, p_brand, p_retailprice FROM part p
      WHERE p_retailprice > (SELECT avg(p2.p_retailprice)
                                    FROM part p2
                                    WHERE p2.p_brand = p.p_brand)
        AND p_retailprice < (SELECT max(p3.p_retailprice) FROM part p3) - 1.0
      ORDER BY p_partkey"""))

  val q70Percentiles = Q("q70_exact_percentiles",
    // EXACT percentiles (type-7 linear interpolation, the convention
    // both Spark's `percentile` and DuckDB's `quantile_cont` implement).
    // Exact quantiles buffer each group's values in the aggregator, so
    // this is the bounded-cardinality complement to q44's HLL/KLL
    // sketches: right when groups are few (3 flags here), wrong at
    // 100 TB with high-cardinality groups — use q44's approx sketches
    // there. Plan: one partial/final aggregate shuffle on l_returnflag.
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25D)").as("p25"),
        expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.75D)").as("p75"),
        expr("median(l_extendedprice)").as("med_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS p25,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.75) AS p75,
        median(l_extendedprice) AS med_price,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q76Profile = Q("q76_profile",
    // column profiling (graft.ops.Profile): row/null/distinct counts for
    // every column of `customer` in ONE aggregate pass — the per-column
    // rows come from exploding an array of structs on the single result
    // row, not from one job per column. Exact distincts plan through
    // Expand (×5 here); Profile(approx = true) swaps in HLL++ partials
    // for the 100 TB variant.
    (s, d) => graft.ops.Profile.profile(Tables.customer(s, d)),
    Some("""WITH p AS (
        SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          COUNT(DISTINCT c_custkey) AS n_distinct FROM customer
        UNION ALL SELECT 'c_name', COUNT(*),
          CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT c_name) FROM customer
        UNION ALL SELECT 'c_nationkey', COUNT(*),
          CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT c_nationkey) FROM customer
        UNION ALL SELECT 'c_acctbal', COUNT(*),
          CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT c_acctbal) FROM customer
        UNION ALL SELECT 'c_mktsegment', COUNT(*),
          CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT c_mktsegment) FROM customer)
      SELECT col_name, n_rows, n_nulls, n_distinct
      FROM p ORDER BY col_name"""))

  /** Exact decimal revenue term: extprice × (1 − discount), the TPC-H
    * money expression, in DECIMAL so group sums are order-independent.
    */
  private def revenueDec: Column =
    col("l_extendedprice").cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(18, 4)) -
        col("l_discount").cast(DecimalType(18, 4)))

  private val revenueDuck =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"

  val q77MultijoinTopk = Q("q77_multijoin_topk",
    // TPC-H Q3 shape: two fact-fact joins + a selective dimension
    // filter, aggregate, global top-10. The filtered customer side is
    // ~1/5 of all customers — NOT broadcastable at 100 TB, so both joins
    // are honest shuffle joins on their keys (AQE may still demote at
    // small SF); the final top-10 plans as TakeOrderedAndProject (per-
    // partition heaps + driver merge of 10 rows), never a full sort.
    (s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(to_date(col("o_orderdate")) < to_date(lit("1998-01-01")))
        .select(col("o_orderkey"), col("o_custkey"),
          // ISO string, not DateType: the check harness renders duckdb
          // DATE cells as midnight timestamps, so string is the stable
          // cross-engine form for a computed date output
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .filter(to_date(col("l_shipdate")) > to_date(lit("1998-01-01")))
        .select(col("l_orderkey"), revenueDec.as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_date"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        o_orderpriority, CAST(SUM($revenueDuck) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
      GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  val q78StarJoin = Q("q78_star_join",
    // TPC-H Q5 shape: a star join with the local-supplier twist
    // (c_nationkey = s_nationkey rides on the lineitem⋈supplier join).
    // Dimension chain region→nation→supplier collapses to a broadcast
    // (10s of rows even at 100 TB — suppliers-per-nation is the only
    // fact-sized dim and it joins by key); the fact-side joins
    // lineitem⋈orders⋈customer shuffle on their keys.
    (s, d) => {
      val n = Tables.nation(s, d).join(
        broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, d).join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .filter(to_date(col("o_orderdate")).between("1996-01-01", "1997-12-31"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), revenueDec.as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name, CAST(SUM($revenueDuck) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
          AND DATE '1997-12-31'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  val q79Scd2 = Q("q79_scd2_merge",
    // graft.ops.Scd2 over a synthetic dimension change: customers with
    // c_custkey % 10 < 3 change segment, 25 brand-new keys arrive.
    // Changed keys yield a closed interval [0,1) plus an open row at
    // version 1; everything else passes through. One full-outer shuffle
    // join + explode — see Scd2's scaladoc for the 100 TB rationale.
    (s, d) => {
      val cust = Tables.customer(s, d)
      val current = cust
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast(LongType))
      val incoming = cust.select(col("c_custkey"),
        when(col("c_custkey") % 10 < 3,
          concat(col("c_mktsegment"), lit("_V2")))
          .otherwise(col("c_mktsegment")).as("segment"))
        .unionByName(Tables.nation(s, d).select(
          (col("n_nationkey").cast(LongType) + 10000000L).as("c_custkey"),
          lit("NEW").as("segment")))
      graft.ops.Scd2.merge(current, incoming,
          Seq("c_custkey"), Seq("segment"), version = 1L)
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    Some("""WITH cur AS (SELECT c_custkey, c_mktsegment AS segment
        FROM customer)
      SELECT c_custkey, segment, CAST(0 AS BIGINT) AS valid_from,
        CAST(NULL AS BIGINT) AS valid_to
      FROM cur WHERE c_custkey % 10 >= 3
      UNION ALL SELECT c_custkey, segment, 0, 1
      FROM cur WHERE c_custkey % 10 < 3
      UNION ALL SELECT c_custkey, segment || '_V2', 1, NULL
      FROM cur WHERE c_custkey % 10 < 3
      UNION ALL SELECT CAST(n_nationkey AS BIGINT) + 10000000, 'NEW', 1, NULL
      FROM nation
      ORDER BY c_custkey, valid_from"""))

  val q83FeatureScale = Q("q83_feature_scale",
    // ML feature scaling: per-group z-score and min-max normalization.
    // Group statistics come from DECIMAL-exact sums (order-independent);
    // mean/variance/z are then IDENTICAL double expressions over those
    // exact inputs on both engines, so results are bit-equal with no
    // rounding fudge. Plan: one partial-agg shuffle for the stats + a
    // broadcast join back onto the rows (stats are one row per group —
    // broadcastable at any scale).
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      val stats = li.groupBy(col("l_returnflag")).agg(
        sum(col("l_quantity").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("s1"),
        sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(28, 4)))
          .cast(DoubleType).as("s2"),
        count(lit(1)).cast(DoubleType).as("cnt"),
        min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax"))
      val mean = col("s1") / col("cnt")
      val variance = (col("s2") - col("s1") * col("s1") / col("cnt")) /
        (col("cnt") - 1)
      li.filter(col("l_orderkey") < 100)
        .join(broadcast(stats), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          ((col("l_quantity") - mean) / sqrt(variance)).as("z"),
          ((col("l_quantity") - col("qmin")) / (col("qmax") - col("qmin")))
            .as("minmax"))
        // (orderkey, linenumber) is NOT unique in the synthetic data —
        // include flag + quantity for a total order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
    },
    Some("""WITH stats AS (SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s2,
        CAST(COUNT(*) AS DOUBLE) AS cnt,
        MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
      FROM lineitem GROUP BY l_returnflag)
      SELECT l_orderkey, l_linenumber, l.l_returnflag, l_quantity,
        (l_quantity - s1 / cnt) / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS z,
        (l_quantity - qmin) / (qmax - qmin) AS minmax
      FROM lineitem l JOIN stats st ON l.l_returnflag = st.l_returnflag
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber, l.l_returnflag, l_quantity"""))

  val q84Histogram = Q("q84_histogram",
    // equal-width histogram: bin = clamp(floor((x - lo) / w), 0, n-1)
    // with bounds from a one-row aggregate joined back by broadcast —
    // two scans, one tiny shuffle, the distributed histogram shape
    // (never a driver-side pass). Double floor/div are IEEE-identical
    // across engines given identical inputs.
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      val w = (col("hi") - col("lo")) / 10.0
      li.join(broadcast(bounds))
        .select(least(floor((col("l_extendedprice") - col("lo")) / w), lit(9))
          .cast(IntegerType).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (SELECT min(l_extendedprice) AS lo,
        max(l_extendedprice) AS hi FROM lineitem)
      SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 10.0)), 9)
          AS INTEGER) AS bin, COUNT(*) AS n
      FROM lineitem, b GROUP BY 1 ORDER BY bin"""))

  val q87CorrRegression = Q("q87_corr_regression",
    // correlation / covariance / least-squares line per group via the
    // one-pass moments method — THE distributed form (n, Σx, Σy, Σxy,
    // Σx², Σy² are map-side-combinable; the statistics are closed-form
    // over them). Moments are DECIMAL-exact and small enough that the
    // decimal→double conversion is exact (unscaled values < 2^53 even at
    // sf1), so both engines run identical IEEE math — bit-equal output
    // with no rounding fudge. One aggregate shuffle total.
    (s, d) => {
      val x = col("l_quantity")
      val y = col("l_discount")
      val st = Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(x.cast(DecimalType(18, 4))).cast(DoubleType).as("sx"),
        sum(y.cast(DecimalType(18, 4))).cast(DoubleType).as("sy"),
        sum((x * y).cast(DecimalType(28, 6))).cast(DoubleType).as("sxy"),
        sum((x * x).cast(DecimalType(28, 6))).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(28, 6))).cast(DoubleType).as("syy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      st.select(col("l_returnflag"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
            .as("covar_samp"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr"),
          slope.as("slope"),
          ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH st AS (SELECT l_returnflag,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
        (sxy - sx * sy / n) / (n - 1) AS covar_samp,
        (n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
      FROM st ORDER BY l_returnflag"""))

  val q88FuzzyMatch = Q("q88_fuzzy_match",
    // entity resolution: blocking + pairwise edit distance. Candidate
    // pairs come from an equi-join on the blocking key (last name token
    // + size) — never an all-pairs cross join; levenshtein runs only on
    // in-block candidates. The classic record-linkage shape: block →
    // score → match; at corpus scale the block key bounds per-task pair
    // counts exactly like the LSH band keys in q30/q32.
    (s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_size"), element_at(split(col("p_name"), " "), -1).as("blk"))
      val a = p.select(col("blk"), col("p_size"),
        col("p_partkey").as("ka"), col("p_name").as("na"))
      val b = p.select(col("blk"), col("p_size"),
        col("p_partkey").as("kb"), col("p_name").as("nb"))
      a.join(b, Seq("blk", "p_size"))
        .filter(col("ka") < col("kb"))
        .withColumn("dist", levenshtein(col("na"), col("nb")))
        .filter(col("dist").between(1, 3))
        .select(col("ka"), col("kb"), col("na"), col("nb"), col("dist"))
        .orderBy(col("ka"), col("kb"))
    },
    Some("""SELECT a.p_partkey AS ka, b.p_partkey AS kb,
        a.p_name AS na, b.p_name AS nb,
        CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
      FROM part a JOIN part b
        ON string_split(a.p_name, ' ')[-1] = string_split(b.p_name, ' ')[-1]
       AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
      ORDER BY ka, kb"""))

  val q92BitwiseAgg = Q("q92_bitwise_agg",
    // bitwise aggregate family (bit_and/bit_or/bit_xor) + scalar bit
    // ops — order-independent by algebra, so no decimal staging needed;
    // one partial-agg shuffle. The flag-mask shape used for permission
    // sets / feature-presence rollups.
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        (col("l_linenumber").cast(LongType) % 64).as("m"))
      // shiftleft's Scala overload takes a STATIC bit count — the
      // column-valued shift goes through the SQL function form
      .select(col("l_returnflag"), col("m"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(m AS INT))").as("mask"))
      .groupBy(col("l_returnflag"))
      .agg(bit_and(col("mask")).as("and_mask"),
        bit_or(col("mask")).as("or_mask"),
        bit_xor(col("mask")).as("xor_mask"),
        sum(bit_count(col("mask")).cast(LongType)).as("total_bits"))
      .orderBy(col("l_returnflag")),
    Some("""WITH t AS (SELECT l_returnflag,
        (CAST(l_linenumber AS BIGINT) % 64) AS m FROM lineitem),
      u AS (SELECT l_returnflag, (CAST(1 AS BIGINT) << m) AS mask FROM t)
      SELECT l_returnflag,
        bit_and(mask) AS and_mask, bit_or(mask) AS or_mask,
        bit_xor(mask) AS xor_mask,
        CAST(SUM(bit_count(mask)) AS BIGINT) AS total_bits
      FROM u GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q93TryFuncs = Q("q93_try_funcs",
    // error-safe arithmetic (try_divide/try_add/try_cast): invalid
    // operations yield NULL instead of failing the job — the semantics
    // a 100 TB pipeline needs (one malformed row must not kill a
    // 10-hour run). The oracle states the same null outcomes with
    // guard expressions, since DuckDB's plain operators throw.
    (s, d) => Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"),
          col("l_quantity") - col("l_quantity")).as("div0"),
        try_divide(round(col("l_extendedprice"), 2), lit(4.0)).as("div_ok"),
        // +1 first: orderkey 0 plus Long.MaxValue would NOT overflow
        try_add(col("l_orderkey") + 1, lit(Long.MaxValue)).as("add_over"),
        expr("try_cast(l_returnflag AS BIGINT)").as("cast_bad"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("div_ok")),
    Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_quantity - l_quantity = 0 THEN NULL
             ELSE l_extendedprice / (l_quantity - l_quantity) END AS div0,
        round(l_extendedprice, 2) / 4.0 AS div_ok,
        CAST(NULL AS BIGINT) AS add_over,
        TRY_CAST(l_returnflag AS BIGINT) AS cast_bad
      FROM lineitem WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber, div_ok"""))

  val q94Codecs = Q("q94_codecs",
    // binary codec ladder: hex, base64 round-trip, byte length of the
    // utf8 encoding — expression-only. DuckDB's to_base64 operates on
    // BLOB and hex() uppercases, so the oracle normalizes case
    // explicitly; the round-trip re-decodes to prove both directions.
    (s, d) => Tables.part(s, d).filter(col("p_partkey") < 300)
      .select(col("p_partkey"),
        lower(hex(col("p_name").cast(BinaryType))).as("name_hex"),
        base64(col("p_name").cast(BinaryType)).as("name_b64"),
        unbase64(base64(col("p_name").cast(BinaryType))).cast(StringType)
          .as("roundtrip"),
        octet_length(col("p_name")).as("n_bytes"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
        lower(hex(CAST(p_name AS BLOB))) AS name_hex,
        to_base64(CAST(p_name AS BLOB)) AS name_b64,
        p_name AS roundtrip,
        octet_length(CAST(p_name AS BLOB)) AS n_bytes
      FROM part WHERE p_partkey < 300 ORDER BY p_partkey"""))

  val q175AggPushdown = Q("q175_agg_pushdown",
    // parquet AGGREGATE pushdown (SPARK-34952): a filterless
    // COUNT/MIN/MAX over a parquet table is answerable from row-group
    // footer statistics alone — the DSv2 scan returns one pre-aggregated
    // row per row group and never materializes data pages. At 100 TB
    // that is the difference between a fleet-wide table scan and a
    // metadata-only pass (footers are ~KB per file) for the table-stats
    // queries every pipeline runs before planning (row counts, key
    // ranges, freshness checks). The require pins `PushedAggregation`
    // into the scan; the result (1 row) is collected eagerly so the
    // session confs (DSv2 routing + pushdown flag, both restored in
    // finally) cannot leak into other catalog entries' plans.
    (s, d) => {
      val keyPd = "spark.sql.parquet.aggregatePushdown"
      val keyV1 = "spark.sql.sources.useV1SourceList"
      val (oldPd, oldV1) = (s.conf.get(keyPd), s.conf.get(keyV1))
      s.conf.set(keyPd, "true")
      s.conf.set(keyV1, oldV1.split(",").filterNot(_ == "parquet")
        .mkString(","))
      try {
        val agg = Tables.lineitem(s, d).agg(
          count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        val phys = agg.queryExecution.executedPlan.toString
        require(phys.contains("PushedAggregation: [COUNT(*)"),
          s"aggregate did not push into the parquet scan:\n$phys")
        val rows = agg.collect() // exactly 1 row — bounded by construction
        s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1),
          agg.schema)
      } finally { s.conf.set(keyPd, oldPd); s.conf.set(keyV1, oldV1) }
    },
    Some("""SELECT count(*) AS n_rows,
        min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      FROM lineitem"""))

  val all: Seq[Q] = Seq(
    q01ScanProject, q02FilterDate, q03ProjectCast, q04StringFuncs,
    q05ConditionalExpr, q06AccountMap, q07PhoneCountry, q08LenientDate,
    q09DedupKeepLast, q10DistinctKeys, q11SemiJoin, q12AntiJoin, q13Union,
    q14QuarantineNonNull, q15InnerJoin, q16OuterJoin, q17GroupbyAgg,
    q18Rollup, q19Cube, q20WindowFuncs, q21TopK, q22Intersect, q23Except,
    q24Having, q41ArrayFuncs, q43DistinctAgg, q44ApproxSketches,
    q46SaltedAgg, q48SaltedJoin, q53SqlExists, q54GroupingSets, q55Calendar,
    q56WindowRangeFrame, q58ListAgg, q59FilterAgg, q60Explode,
    q62RankingWindows, q63ConditionalFuncs, q64StringLadder,
    q65HigherOrderFuncs, q67SetOpsAll, q68Unpivot, q69ScalarSubquery,
    q70Percentiles, q76Profile, q77MultijoinTopk, q78StarJoin, q79Scd2,
    q83FeatureScale, q84Histogram, q87CorrRegression, q88FuzzyMatch,
    q92BitwiseAgg, q93TryFuncs, q94Codecs, q97BucketedJoin, q100BloomPrune,
    q101OrcSource, q102IncrementalAgg, q103HllMerge, q104ThetaSetops,
    q105ApproxTopk, q106KllQuantiles, q108QualityChecks, q112CboStats,
    q113SchemaDrift, q120JsonSource, q122XmlSource, q123LateralJoin,
    q125RecursiveCte, q126NullSafeJoin, q127ShuffleHashJoin,
    q128CorruptJson, q129UnionByName, q169GlobalRownum, q175AggPushdown)
}
