package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._

/** The canonical §2.12 verification query inventory (SURVEY.md §2.12).
  *
  * Each entry is one `SparkEntry.queries` key, paired with equivalent DuckDB
  * SQL in [[Q.oracle]]. Invariants required by the driver's hash compare:
  *   - deterministic: explicit total ORDER BY, pinned date constants, no
  *     wall-clock or randomness;
  *   - every computed column aliased to the SAME name in both Spark and SQL;
  *   - no raw double aggregation (only counts / min / max — exact in FP).
  *
  * Queries take (spark, sfDir) and are side-effect-free and cheap to
  * recompute (Bench counts them repeatedly).
  */
object Q {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(spark, dir, name)

  // ---------------------------------------------------------------- scans

  // Determinism rule used throughout: the ORDER BY covers ALL output columns
  // (ties are then full-duplicate rows, indistinguishable under any order) —
  // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem.

  /** S2+P1: projection pushdown scan. */
  def qScanProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  // -------------------------------------------------------------- filters

  private val WidgetPat = "(?i)(^|[ _])widget([ _]|$)"

  /** F1/F2: case-insensitive anchored regex filter (reference file picking,
    * etl_payroll_pipeline_demo.py:77-85).
    */
  def qFilterRlike(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").rlike(WidgetPat))
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  /** F3: IN-list filter. */
  def qFilterIsin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "N"))
      .select("l_orderkey", "l_linenumber", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag")

  /** F4/F5: (case-insensitive) literal equality. */
  def qFilterEq(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(lower(col("o_orderstatus")) === "f")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")

  /** F6: closed fiscal-year date range, pinned to FY1998 (Jul 1 1997 –
    * Jun 30 1998) instead of wall-clock (SURVEY §7.6 risk 4).
    */
  def qFilterRangeDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(Temporal.betweenDates(col("o_orderdate"),
        java.time.LocalDate.of(1997, 7, 1), java.time.LocalDate.of(1998, 6, 30)))
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("o_orderdate_d"))
      .orderBy("o_orderkey")

  /** F7/V5: rows whose derived code fails the expected format. */
  def qValidateFormat(spark: SparkSession, dir: String): DataFrame = {
    val withCode = t(spark, dir, "customer")
      .withColumn("code", Derive.concatKey("-", col("c_custkey"), col("c_nationkey")))
    Validate.formatViolations(withCode, col("code"), "^[0-9]-[0-9]{1,2}$")
      .select("c_custkey", "code")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------- derivations

  /** E3/E4/E11: null-propagating vs "nan"-regime concat keys + 4-way concat. */
  def qDeriveConcatKey(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val seg = when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
      .otherwise(col("c_mktsegment"))
    c.select(
      col("c_custkey"),
      Derive.concatKey("-", col("c_custkey"), seg).as("key_null"),
      Derive.concatKeyNan("-", col("c_custkey"), seg).as("key_nan"),
      Derive.concatAll(col("c_custkey"), col("c_nationkey"),
        Derive.prefix(col("c_mktsegment"), 2), Derive.prefix(col("c_name"), 4)).as("key4"))
      .orderBy("c_custkey")
  }

  /** E2: trailing-".0" strip of numeric codes. */
  def qDeriveStripDecimal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        Normalize.stripDecimal(col("l_quantity")).as("qty_code"))
      .orderBy("l_orderkey", "l_linenumber")

  /** E5: fixed-width prefix. */
  def qDeriveSubstr(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), Derive.prefix(col("p_type"), 5).as("type5"))
      .orderBy("p_partkey")

  /** E6: split-once into two columns, null tail when separator absent. */
  def qDeriveSplit(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val (bhead, btail) = Derive.splitOnce(col("p_brand"), "#")
    val (nhead, ntail) = Derive.splitOnce(col("p_type"), " ")
    p.select(col("p_partkey"),
        bhead.as("brand_head"), btail.as("brand_tail"),
        nhead.as("type_head"), ntail.as("type_tail"))
      .orderBy("p_partkey")
  }

  /** E7: to-timestamp with coercion — invalid day-of-month strings null out. */
  def qDeriveCastDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ds", concat(lit("2024-01-"),
        lpad((col("user_id") % 45).cast("string"), 2, "0")))
      .select(col("event_id"), col("ds"),
        Temporal.coerceTimestamp(col("ds")).cast("date").cast("string").as("parsed_d"))
      .orderBy("event_id")

  /** E8/F8: fill null/blank/'nan' with a default. */
  def qDeriveFillDefault(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val base = when(col("o_orderstatus") === "P", lit(null).cast("string"))
      .when(col("o_orderstatus") === "O", lit("  "))
      .otherwise(col("o_orderpriority"))
    o.select(col("o_orderkey"),
        Normalize.fillBlankWith(base, lit("INT")).as("filled"))
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------- order/limit

  /** O1: deterministic first-match selection (explicit order + limit 1). */
  def qSortLimitFirst(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").rlike("(?i)bolt"))
      .orderBy("p_partkey")
      .limit(1)
      .select("p_partkey", "p_name")

  // ------------------------------------------------------------- joins

  /** J2/J4/J5/J7 + D1: deduped broadcast lookup left join. */
  def qJoinLookupLeft(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    // dimUnique: c_custkey is customer's primary key — the defensive
    // dedup is a semantic no-op costing an exchange (round-20, same
    // rationale as pretam's dims; oracle-checked)
    val joined = LookupJoin.lookupLeft(
      orders.withColumnRenamed("o_custkey", "c_custkey"),
      t(spark, dir, "customer"), keys = Seq("c_custkey"), dimCols = Seq("c_mktsegment"),
      dimUnique = true)
    joined.select("o_orderkey", "c_mktsegment").orderBy("o_orderkey")
  }

  /** J3/J6 + E9: lookup with fallback coalesce on a partial dim. */
  def qJoinLookupFallback(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val dim = t(spark, dir, "region").filter(col("r_regionkey") < 3)
      .select("r_regionkey", "r_name")
    val joined = LookupJoin.lookupLeftOn(nation, dim,
      nation("n_regionkey") === dim("r_regionkey"), dropRight = Seq("r_regionkey"))
    LookupJoin.withFallback(joined, "resolved", col("r_name"), col("n_name"))
      .select("n_nationkey", "n_name", "resolved")
      .orderBy("n_nationkey")
  }

  /** J8: composite-key lookup left join. */
  def qJoinLeftMultiKey(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val dim = t(spark, dir, "supplier")
      .select(col("s_suppkey"), (col("s_nationkey") % 5).as("bucket"), col("s_name"))
    val joined = LookupJoin.lookupLeftOn(li, dim,
      li("l_suppkey") === dim("s_suppkey") && (li("l_partkey") % 5) === dim("bucket"),
      dropRight = Seq("s_suppkey", "bucket"))
    joined.select("l_orderkey", "l_linenumber", "s_name")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("s_name").asc_nulls_first)
  }

  /** J1/A4/V2: before/after row-count guard around a fan-out join. */
  def qJoinRowcountGuard(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val dim = t(spark, dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    val joined = orders.join(dim, orders("o_custkey") % 25 === dim("c_nationkey"), "left")
    LookupJoin.rowcountGuard(orders, joined)
  }

  // -------------------------------------------------------- aggregates

  /** A1: deterministic per-key mode (count desc, value asc). */
  def qAggModePerKey(spark: SparkSession, dir: String): DataFrame =
    ModeMap.modePerKey(t(spark, dir, "customer"), "c_mktsegment", "c_nationkey",
        modeCol = "mode_nationkey")
      .select("c_mktsegment", "mode_nationkey", "cnt")
      .orderBy("c_mktsegment")

  /** A2/V3: min/max over a timestamp column. */
  def qAggMinmax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").agg(
      min(col("o_orderdate")).cast("date").cast("string").as("min_od"),
      max(col("o_orderdate")).cast("date").cast("string").as("max_od"),
      count(lit(1)).as("cnt"))

  /** A3/V6: null count over a coerced column. */
  def qAggNullCount(spark: SparkSession, dir: String): DataFrame = {
    val parsed = t(spark, dir, "events")
      .withColumn("ds", concat(lit("2024-01-"),
        lpad((col("user_id") % 45).cast("string"), 2, "0")))
      .withColumn("parsed", Temporal.coerceTimestamp(col("ds")))
    Validate.nullCount(parsed, col("parsed"))
  }

  // ------------------------------------------------------------- dedup

  /** D2/D4: keep-first per business key under an explicit order — the
    * all-ascending case, so the algebraic form applies (min(struct)
    * partial-agg: the exchange carries one candidate per key per partition
    * instead of every row; A/B'd 0.28 s vs 0.70 s window at sf0.1).
    */
  def qDedupBusinessKey(spark: SparkSession, dir: String): DataFrame =
    Dedup.keepFirstAsc(t(spark, dir, "lineitem"),
        keys = Seq("l_orderkey"), orderCols = Seq("l_linenumber", "l_partkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_orderkey")

  /** D3: full-row distinct. */
  def qDedupFullRow(spark: SparkSession, dir: String): DataFrame =
    Dedup.fullRow(t(spark, dir, "lineitem").select("l_returnflag", "l_linestatus"))
      .orderBy("l_returnflag", "l_linestatus")

  // -------------------------------------------------------------- union

  /** U1: union by name with missing-column null fill. */
  def qUnionHarmonize(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val b = o.filter(col("o_orderstatus") =!= "F")
      .select("o_orderkey", "o_orderstatus")
    Reshape.unionHarmonize(Seq(a, b)).orderBy("o_orderkey")
  }

  // -------------------------------------------------------- projections

  /** P2/P3/P4: ordered rename projection with an injected all-null column. */
  def qProjectRename(spark: SparkSession, dir: String): DataFrame =
    Reshape.orderedProjectWithNulls(t(spark, dir, "customer"), Seq(
        "cust_id" -> "c_custkey",
        "customer_name" -> "c_name",
        "segment" -> "c_mktsegment",
        "middle_name" -> "__absent__",
        "nation_code" -> "c_nationkey"))
      .orderBy("cust_id")

  // ----------------------------------------------------------- flagship

  /** End-to-end mini-PreTAM (mirrors the PUA pipeline shape, reference
    * etl_payroll_pipeline_demo.py:252-407): fact scan + FY filter → derived
    * concat/strip keys → two deduped broadcast lookup joins → fallback
    * coalesce → keep-first business-key dedup → ordered rename projection
    * with default fill.
    */
  def qPipelinePretam(spark: SparkSession, dir: String): DataFrame = {
    val fact = t(spark, dir, "lineitem")
      .filter(Temporal.betweenDates(col("l_shipdate"),
        java.time.LocalDate.of(1997, 7, 1), java.time.LocalDate.of(1998, 6, 30)))
      .withColumn("li_key", Derive.concatKey("-", col("l_orderkey"), col("l_linenumber")))
      .withColumn("qty_code", Normalize.stripDecimal(col("l_quantity")))

    // dimUnique: o_orderkey / p_partkey are the tables' primary keys, so
    // the lookup's defensive dedup is a semantic no-op — skipping it
    // removes one hash exchange per dim from the broadcast-build path
    // (round-20; result hash-identical, oracle-checked)
    val withOrd = LookupJoin.lookupLeft(
      fact.withColumnRenamed("l_orderkey", "o_orderkey"),
      t(spark, dir, "orders"), keys = Seq("o_orderkey"), dimCols = Seq("o_orderstatus"),
      dimUnique = true)
      .withColumnRenamed("o_orderkey", "l_orderkey")

    val partDim = t(spark, dir, "part").filter(col("p_size") <= 25)
      .select("p_partkey", "p_name", "p_brand")
    val joined = LookupJoin.lookupLeft(
      withOrd.withColumnRenamed("l_partkey", "p_partkey"),
      partDim, keys = Seq("p_partkey"), dimUnique = true)
      .withColumnRenamed("p_partkey", "l_partkey")

    val withItem = LookupJoin.withFallback(joined, "item_name", col("p_name"), lit("UNKNOWN"))

    // (l_orderkey, l_linenumber, l_partkey, l_quantity) is unique in the
    // testdata, so this ascending order is total within each key —
    // algebraic keep-first applies (no sort-window, partial-agg shuffle)
    val deduped = Dedup.keepFirstAsc(withItem,
      keys = Seq("l_orderkey", "l_partkey"),
      orderCols = Seq("l_linenumber", "l_quantity"))

    val projected = Reshape.orderedProjectWithNulls(deduped, Seq(
      "row_key" -> "li_key",
      "item_code" -> "l_partkey",
      "order_status" -> "o_orderstatus",
      "item_name" -> "item_name",
      "brand" -> "p_brand",
      "qty_code" -> "qty_code",
      "adj_reason_code" -> "__absent__"))

    projected
      .withColumn("adj_reason_code",
        Normalize.fillBlankWith(col("adj_reason_code"), lit("INT")))
      .orderBy("row_key", "item_code")
  }

  // ============================================================ registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> (qScanProject _),
    "q_filter_rlike" -> (qFilterRlike _),
    "q_filter_isin" -> (qFilterIsin _),
    "q_filter_eq" -> (qFilterEq _),
    "q_filter_range_date" -> (qFilterRangeDate _),
    "q_validate_format" -> (qValidateFormat _),
    "q_derive_concat_key" -> (qDeriveConcatKey _),
    "q_derive_strip_decimal" -> (qDeriveStripDecimal _),
    "q_derive_substr" -> (qDeriveSubstr _),
    "q_derive_split" -> (qDeriveSplit _),
    "q_derive_cast_date" -> (qDeriveCastDate _),
    "q_derive_fill_default" -> (qDeriveFillDefault _),
    "q_sort_limit_first" -> (qSortLimitFirst _),
    "q_join_lookup_left" -> (qJoinLookupLeft _),
    "q_join_lookup_fallback" -> (qJoinLookupFallback _),
    "q_join_left_multi_key" -> (qJoinLeftMultiKey _),
    "q_join_rowcount_guard" -> (qJoinRowcountGuard _),
    "q_agg_mode_per_key" -> (qAggModePerKey _),
    "q_agg_minmax" -> (qAggMinmax _),
    "q_agg_null_count" -> (qAggNullCount _),
    "q_dedup_business_key" -> (qDedupBusinessKey _),
    "q_dedup_full_row" -> (qDedupFullRow _),
    "q_union_harmonize" -> (qUnionHarmonize _),
    "q_project_rename" -> (qProjectRename _),
    "q_pipeline_pretam" -> (qPipelinePretam _),
  )

  /** DuckDB oracle SQL — same tables (registered by file name), same aliases,
    * same ORDER BY as the Spark queries above.
    */
  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_filter_rlike" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '(?i)(^|[ _])widget([ _]|$)')
        |ORDER BY p_partkey""".stripMargin,

    "q_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A','N')
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin,

    "q_filter_eq" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE lower(o_orderstatus) = 'f' ORDER BY o_orderkey""".stripMargin,

    "q_filter_range_date" ->
      """SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate_d
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1997-07-01 00:00:00'
        |                      AND TIMESTAMP '1998-06-30 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "q_validate_format" ->
      """SELECT c_custkey,
        |       CAST(c_custkey AS VARCHAR) || '-' || CAST(c_nationkey AS VARCHAR) AS code
        |FROM customer
        |WHERE NOT regexp_matches(
        |  CAST(c_custkey AS VARCHAR) || '-' || CAST(c_nationkey AS VARCHAR),
        |  '^[0-9]-[0-9]{1,2}$')
        |ORDER BY c_custkey""".stripMargin,

    "q_derive_concat_key" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) || '-' || NULLIF(c_mktsegment, 'BUILDING') AS key_null,
        |  CAST(c_custkey AS VARCHAR) || '-'
        |    || COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'nan') AS key_nan,
        |  CAST(c_custkey AS VARCHAR) || CAST(c_nationkey AS VARCHAR)
        |    || substring(c_mktsegment, 1, 2) || substring(c_name, 1, 4) AS key4
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_derive_strip_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        |       regexp_replace(TRIM(CAST(l_quantity AS VARCHAR)), '\.0$', '') AS qty_code
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_derive_substr" ->
      """SELECT p_partkey, substring(p_type, 1, 5) AS type5
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_derive_split" ->
      """SELECT p_partkey,
        |  str_split(p_brand, '#')[1] AS brand_head,
        |  CASE WHEN strpos(p_brand, '#') > 0
        |       THEN substr(p_brand, strpos(p_brand, '#') + 1) END AS brand_tail,
        |  str_split(p_type, ' ')[1] AS type_head,
        |  CASE WHEN strpos(p_type, ' ') > 0
        |       THEN substr(p_type, strpos(p_type, ' ') + 1) END AS type_tail
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_derive_cast_date" ->
      """SELECT event_id, ds,
        |       CAST(CAST(TRY_CAST(ds AS TIMESTAMP) AS DATE) AS VARCHAR) AS parsed_d
        |FROM (SELECT event_id,
        |        '2024-01-' || lpad(CAST(user_id % 45 AS VARCHAR), 2, '0') AS ds
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_derive_fill_default" ->
      """SELECT o_orderkey,
        |  CASE WHEN base IS NULL OR TRIM(base) IN ('', 'nan', 'NaN') THEN 'INT'
        |       ELSE base END AS filled
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderstatus = 'P' THEN NULL
        |             WHEN o_orderstatus = 'O' THEN '  '
        |             ELSE o_orderpriority END AS base
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sort_limit_first" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '(?i)bolt')
        |ORDER BY p_partkey LIMIT 1""".stripMargin,

    "q_join_lookup_left" ->
      """SELECT o_orderkey, c_mktsegment
        |FROM orders LEFT JOIN (SELECT DISTINCT c_custkey, c_mktsegment FROM customer) d
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_lookup_fallback" ->
      """SELECT n_nationkey, n_name, COALESCE(r_name, n_name) AS resolved
        |FROM nation LEFT JOIN
        |  (SELECT DISTINCT r_regionkey, r_name FROM region WHERE r_regionkey < 3) d
        |  ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q_join_left_multi_key" ->
      """SELECT l_orderkey, l_linenumber, s_name
        |FROM lineitem LEFT JOIN
        |  (SELECT DISTINCT s_suppkey, s_nationkey % 5 AS bucket, s_name FROM supplier) d
        |  ON l_suppkey = s_suppkey AND l_partkey % 5 = bucket
        |ORDER BY l_orderkey, l_linenumber, s_name NULLS FIRST""".stripMargin,

    "q_join_rowcount_guard" ->
      """SELECT before_cnt, after_cnt, after_cnt - before_cnt AS fanout
        |FROM (SELECT count(*) AS before_cnt FROM orders),
        |     (SELECT count(*) AS after_cnt
        |      FROM orders LEFT JOIN
        |        (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) d
        |        ON o_custkey % 25 = c_nationkey)""".stripMargin,

    "q_agg_mode_per_key" ->
      """SELECT c_mktsegment, c_nationkey AS mode_nationkey, cnt
        |FROM (SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY count(*) DESC, c_nationkey ASC) AS rn
        |      FROM customer WHERE c_nationkey IS NOT NULL
        |      GROUP BY c_mktsegment, c_nationkey)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    "q_agg_minmax" ->
      """SELECT CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_od,
        |       CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_od,
        |       count(*) AS cnt
        |FROM orders""".stripMargin,

    "q_agg_null_count" ->
      """SELECT count(*) - count(parsed) AS n_null, count(*) AS n_total
        |FROM (SELECT TRY_CAST('2024-01-' || lpad(CAST(user_id % 45 AS VARCHAR), 2, '0')
        |        AS TIMESTAMP) AS parsed
        |      FROM events)""".stripMargin,

    "q_dedup_business_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey,
        |        row_number() OVER (PARTITION BY l_orderkey
        |                           ORDER BY l_linenumber, l_partkey) AS rn
        |      FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "q_dedup_full_row" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_union_harmonize" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) FROM orders
        |WHERE o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "q_project_rename" ->
      """SELECT c_custkey AS cust_id, c_name AS customer_name,
        |       c_mktsegment AS segment, CAST(NULL AS VARCHAR) AS middle_name,
        |       c_nationkey AS nation_code
        |FROM customer ORDER BY cust_id""".stripMargin,

    "q_pipeline_pretam" ->
      """WITH fact AS (
        |  SELECT *,
        |    CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS li_key,
        |    regexp_replace(TRIM(CAST(l_quantity AS VARCHAR)), '\.0$', '') AS qty_code
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN TIMESTAMP '1997-07-01 00:00:00'
        |                       AND TIMESTAMP '1998-06-30 00:00:00'
        |), odim AS (SELECT DISTINCT o_orderkey, o_orderstatus FROM orders),
        |   pdim AS (SELECT DISTINCT p_partkey, p_name, p_brand FROM part WHERE p_size <= 25),
        |   joined AS (
        |     SELECT f.*, o.o_orderstatus, p.p_name, p.p_brand
        |     FROM fact f
        |     LEFT JOIN odim o ON f.l_orderkey = o.o_orderkey
        |     LEFT JOIN pdim p ON f.l_partkey = p.p_partkey
        |), deduped AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                               ORDER BY l_linenumber, l_quantity) AS rn
        |  FROM joined
        |)
        |SELECT li_key AS row_key, l_partkey AS item_code,
        |       o_orderstatus AS order_status,
        |       COALESCE(p_name, 'UNKNOWN') AS item_name, p_brand AS brand,
        |       qty_code, 'INT' AS adj_reason_code
        |FROM deduped WHERE rn = 1 ORDER BY row_key, item_code""".stripMargin,
  )
}
