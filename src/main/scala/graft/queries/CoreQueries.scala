package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** One registered query: a Spark implementation over a testdata dir and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL. Column names
  * and row order are deterministic on both sides — the driver hash-compares.
  */
final case class Q(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Core relational query surface, mirroring the reference's operator
  * inventory (SURVEY.md §2: scans S2-S6, filters/projections P1-P7, joins
  * J1-J3, aggregates A1-A10, nested U3-U4) re-expressed over the driver
  * testdata. Reference behaviors cited per query.
  *
  * Determinism rules (SURVEY.md §5): every multi-row result carries a
  * total ORDER BY; double aggregates go through DECIMAL(18,2) (exact,
  * order-independent) and convert to double once at the end; timestamps
  * are emitted as TIMESTAMP_NTZ to match DuckDB's naive timestamps.
  */
object CoreQueries {

  // shared determinism helpers — single definition in Helpers.scala
  private def ntz(c: Column): Column = Helpers.ntz(c)
  private def dsum(c: Column): Column = Helpers.dsum(c)

  val all: Seq[Q] = Seq(

    // ---- scans / projection / literals (S2, S3, P1; collector.py:96-111,136-154)
    Q("q_scan",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), ntz(col("ts")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id"),
      Some("""SELECT event_id, ts, user_id, event_type, value
             FROM events ORDER BY event_id""")),

    Q("q_project",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // constant column per source feed (S5; collector.py:110)
    Q("q_lit",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), lit("bbc_news").as("src"))
        .orderBy("event_id"),
      Some("SELECT event_id, 'bbc_news' AS src FROM events ORDER BY event_id")),

    // timestamp parse (S4; collector.py:65-72): format then re-parse
    Q("q_ts_parse",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          ntz(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")))
            .as("parsed"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
               strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
             FROM events ORDER BY event_id""")),

    // date truncation (P7; visualizer.py:89-90,115). Emitted as yyyy-MM-dd
    // string: parquet date32 vs DuckDB DATE land as different pandas dtypes
    // in the driver compare; strings are dtype-stable on both engines.
    Q("q_date_trunc",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .orderBy("event_id"),
      Some("SELECT event_id, strftime(ts, '%Y-%m-%d') AS d FROM events ORDER BY event_id")),

    // ---- filters (P3-P5; visualizer.py:87-99)
    Q("q_filter_isin",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type FROM events
             WHERE event_type IN ('click', 'purchase') ORDER BY event_id""")),

    Q("q_filter_range",
      (s, d) => Tables.events(s, d)
        .filter(to_date(col("ts"))
          .between(lit("2024-01-10"), lit("2024-01-20")))
        .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .orderBy("event_id"),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d') AS d FROM events
             WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
             ORDER BY event_id""")),

    // negated case-insensitive contains, null-safe (P5; visualizer.py:96-99
    // `.str.contains(case=False, na=False)` negated)
    Q("q_filter_contains",
      (s, d) => Tables.documents(s, d)
        .filter(!coalesce(lower(col("text")).contains("spark"), lit(false)))
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             WHERE NOT coalesce(contains(lower(text), 'spark'), false)
             ORDER BY doc_id""")),

    // string concat fed to the analyzer (P6; collector.py:182)
    Q("q_concat",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(" | ", col("lang"), col("source")).as("tag"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, concat_ws(' | ', lang, source) AS tag
             FROM documents ORDER BY doc_id""")),

    // ---- joins (J1-J3, T1; visualizer.py:93,175-180, collector.py:89)
    Q("q_semi_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             ORDER BY c_custkey""")),

    Q("q_anti_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             ORDER BY c_custkey""")),

    Q("q_left_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        // customer grows with scale factor: no forced broadcast hint — AQE
        // broadcasts while it measures small and falls back to shuffle at scale.
        o.join(c, o("o_custkey") === c("c_custkey"), "left")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("c_name"), col("c_mktsegment"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
             FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             ORDER BY o_orderkey""")),

    Q("q_inner_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        // customer is sf-proportional (no hint; AQE decides); nation is a
        // fixed 25-row table, safe to pin broadcast at any scale.
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
             FROM orders
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name ORDER BY n_name""")),

    // ---- aggregates / top-k (A1-A10; visualizer.py:105-161)
    Q("q_count",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM events WHERE event_type = 'click'")),

    Q("q_count_distinct",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
             FROM events GROUP BY event_type ORDER BY event_type""")),

    Q("q_count_if",
      (s, d) => Tables.events(s, d)
        .agg(count(when(col("value") > 50, 1)).as("n_big"),
          count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) FILTER (WHERE value > 50) AS n_big, COUNT(*) AS n
             FROM events""")),

    Q("q_groupby_day",
      (s, d) => Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy("d"),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS d, COUNT(*) AS n
             FROM events GROUP BY 1 ORDER BY 1""")),

    Q("q_groupby_count",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n
             FROM events GROUP BY event_type ORDER BY event_type""")),

    Q("q_groupby_multi",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 100).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket"),
      Some("""SELECT event_type, user_id % 100 AS bucket, COUNT(*) AS n
             FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""")),

    Q("q_min_max",
      (s, d) => Tables.events(s, d)
        .agg(ntz(min(col("ts"))).as("ts_min"), ntz(max(col("ts"))).as("ts_max")),
      Some("SELECT min(ts) AS ts_min, max(ts) AS ts_max FROM events")),

    // top-10 with deterministic tie-break (A5/A10; visualizer.py:136)
    Q("q_topk",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("user_id"))
        .limit(10),
      Some("""SELECT user_id, COUNT(*) AS n FROM events
             GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""")),

    // restrict rows to the top-k key set (A6; visualizer.py:139)
    Q("q_topk_semi",
      (s, d) => {
        val e = Tables.events(s, d)
        val top = e.groupBy("user_id").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("user_id")).limit(10)
          .select("user_id")
        e.join(broadcast(top), Seq("user_id"), "left_semi")
          .select("event_id", "user_id")
          .orderBy("event_id")
      },
      Some("""WITH top AS (SELECT user_id FROM (
               SELECT user_id, COUNT(*) AS n FROM events
               GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10))
             SELECT event_id, user_id FROM events
             WHERE EXISTS (SELECT 1 FROM top WHERE top.user_id = events.user_id)
             ORDER BY event_id""")),

    // union of per-feed batches before one append (§2.5 note; collector.py:231-240)
    Q("q_union",
      (s, d) => {
        val e = Tables.events(s, d)
        val a = e.filter(col("event_type") === "click")
        val b = e.filter(col("event_type") === "view")
        a.unionByName(b)
          .select("event_id", "event_type")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type FROM (
               SELECT event_id, event_type FROM events WHERE event_type = 'click'
               UNION ALL
               SELECT event_id, event_type FROM events WHERE event_type = 'view')
             ORDER BY event_id""")),

    // set operations (completing the family beyond q_union)
    Q("q_intersect",
      (s, d) => {
        val e = Tables.events(s, d)
        e.filter(col("event_type") === "click").select("user_id").distinct()
          .intersect(
            e.filter(col("event_type") === "purchase").select("user_id").distinct())
          .orderBy("user_id")
      },
      Some("""SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
             INTERSECT
             SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    Q("q_except",
      (s, d) => {
        val e = Tables.events(s, d)
        e.select("user_id").distinct()
          .except(
            e.filter(col("event_type") === "purchase").select("user_id").distinct())
          .orderBy("user_id")
      },
      Some("""SELECT DISTINCT user_id FROM events
             EXCEPT
             SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    // explode nested arrays to rows (U3; collector.py:168-213)
    Q("q_explode",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .orderBy("doc_id", "token"),
      Some("""SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents ORDER BY doc_id, token""")),

    // enum-constrained category normalization (U4; processor.py:31-35)
    Q("q_enum_norm",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          when(col("event_type").isin("click", "view", "purchase"),
            col("event_type")).otherwise("Others").as("category"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
               CASE WHEN event_type IN ('click', 'view', 'purchase')
                    THEN event_type ELSE 'Others' END AS category
             FROM events ORDER BY event_id""")),

    // semi-structured JSON extraction (props column; the analyzer-output
    // parse path of processor.py:107-117 as a columnar op)
    Q("q_json_extract",
      // fanoutIfNarrow: per-row JSON parsing otherwise runs on the one
      // scan task of the single-row-group events file
      (s, d) => Helpers.fanoutIfNarrow(Tables.events(s, d),
          col("event_id"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, json_extract(props, '$.k')::INT AS k
             FROM events ORDER BY event_id""")),

    // full JSON parse to typed struct + aggregate over the parsed field
    Q("q_json_agg",
      // fanoutIfNarrow: from_json per row, same rationale as
      // q_json_extract (integer sum → partitioning-invariant)
      (s, d) => Helpers.fanoutIfNarrow(Tables.events(s, d),
          col("event_id"))
        .select(col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
               SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
               MIN(json_extract(props, '$.k')::INT) AS min_k,
               MAX(json_extract(props, '$.k')::INT) AS max_k
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // deterministic field extraction (U1 analog; processor.py:63-121)
    Q("q_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "([0-9]+)", 1).as("k_val"))
        .orderBy("event_id"),
      Some("""SELECT event_id, regexp_extract(props, '([0-9]+)', 1) AS k_val
             FROM events ORDER BY event_id""")),

    // ranking window: per-user event sequence (generalizes A5 top-k)
    Q("q_window_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("user_id", "rn", "event_id")
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, rn, event_id FROM (
               SELECT user_id, event_id,
                      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events)
             WHERE rn <= 3 ORDER BY user_id, rn""")),

    // exact percentiles (linear interpolation — same semantics as
    // DuckDB's quantile_cont; values here are integral-valued doubles so
    // interpolation is exact on both engines). Computed from the
    // (flag, quantity, count) histogram via ExactPercentile: no
    // per-group value→count aggregation buffer at any corpus scale.
    Q("q_percentile",
      // NO fan-out here (r16, measured): the histogram partial
      // aggregation is highly reductive (600k rows -> ~300), so the
      // map-side combine on the scan task is cheaper than shipping raw
      // rows through a fan-out exchange (0.28 s vs 0.51 s co-partitioned)
      (s, d) => ExactPercentile.overHistogram(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity",
          Seq(("p50", 0.5), ("p90", 0.9)))
        .select(col("l_returnflag"), col("p50"), col("p90"), col("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.9) AS p90,
               COUNT(l_quantity) AS n
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // scalar string-function battery (case, pad, trim, replace, slice)
    Q("q_string_funcs",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("pre"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          length(col("c_name")).as("len"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
               substr(c_name, 1, 8) AS pre,
               lpad(c_custkey::VARCHAR, 10, '0') AS padded,
               regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
               length(c_name) AS len
             FROM customer ORDER BY c_custkey""")),

    // rollup subtotals (beyond the reference's flat group-bys; NULL
    // subtotal markers need explicit NULLS FIRST to match across engines)
    Q("q_rollup",
      // r17: pre-aggregate to (flag, status, partition) base cells in
      // LONG cent-units first (the q_cube treatment) — rollup's Expand
      // multiplies the tiny cell table, not the corpus, and no per-row
      // DECIMAL buffer remains. The r16 fan-out is DROPPED with it:
      // once the per-row work is a long add, the highly-reductive
      // map-side combine on the narrow scan task beats shipping the
      // corpus through a fan-out exchange (the q_percentile rule;
      // measured 0.62 -> 0.35 s at sf0.1)
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("part_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("l_quantity") * 100 + 0.5).cast("long"))
            .as("qty_c"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("cnt").as("n"),
          (sum(col("qty_c").cast("decimal(28,0)")) *
            lit(new java.math.BigDecimal("0.01"))).cast("double")
            .as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // running aggregate window (frame-based analytic function)
    Q("q_window_running",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // LONG cent-units in the running window sum (the q_agg_pricing
        // r16 treatment: <= 2-decimal inputs, per-customer running
        // totals far under 2^53 — identical doubles, no BigDecimal in
        // the per-row frame update)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).over(w)
              .cast("double") / 100.0).as("running_total"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_total
             FROM orders ORDER BY o_orderkey""")),

    // ---- headline analytics (bench drivers; TPC-H Q1/Q3 shapes)
    Q("q_agg_pricing",
      // r17: the r16 fan-out is dropped — with the per-row work down
      // to long adds, the highly-reductive map-side combine on the
      // narrow scan task beats shipping 13 MB through a fan-out
      // exchange (the q_percentile rule; measured 0.84 -> 0.43 s at
      // sf0.1; the production wide-scan plan is identical either way).
      (s, d) => Tables.lineitem(s, d)
            .filter(col("l_shipdate") <= lit("2001-09-01"))
        // r16: the exact DECIMAL sums run in LONG cent-units per row.
        // cast(decimal(18,2)) of these doubles is exact (the column
        // values carry <= 2 decimal digits, so shortest-repr setScale
        // never rounds), and floor(x*100 + 0.5) lands on the same
        // integer (the float error in x*100 is orders of magnitude
        // below the 0.5 slack).
        //
        // r17 (VERDICT r16 #1): the aggregate has only ~6 (flag, status)
        // groups, so a single-level long sum grows with CORPUS size —
        // exactness past 2^53 and the long range past 2^63 both break at
        // 10^10..10^11 rows/group, i.e. a 100 TB lineitem. Two-level
        // combine instead: level 1 sums longs per (group, partition) —
        // a compact primitive aggregation buffer, no BigDecimal per row
        // (the whole point of the r16 change), and a PER-TASK bound that
        // is corpus-independent: a partition is capped by the scan split
        // (spark.sql.files.maxPartitionBytes / AQE advisory size), so at
        // worst-case cent² magnitudes (1.04e9/row) even a 10^9-row
        // partition stays < 1.1e18 < 2^63, with exactness not required
        // until level 2. Level 2 sums the ~6-per-partition partials as
        // DECIMAL (exact, unbounded) and converts once: multiplying by
        // the exact decimal literal 0.01/0.0001 keeps scale 2/4 with no
        // precision overflow (values <= ~1e20 fit decimal(38,2/4)), so
        // the final cast(double) is the same single correctly-rounded
        // conversion the oracle's CAST(SUM(DECIMAL) AS DOUBLE) performs.
        // spark_partition_id() only SUBDIVIDES groups (never routes
        // rows), so the grand total is invariant to the partitioning and
        // to task retries (a retried partition recomputes the same id).
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("part_id"))
        .agg(
          sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty_c"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("base_c"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
            .as("disc_c2"),
          count(lit(1)).as("cnt"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(col("qty_c").cast("decimal(28,0)")) *
            lit(new java.math.BigDecimal("0.01"))).cast("double").as("sum_qty"),
          (sum(col("base_c").cast("decimal(28,0)")) *
            lit(new java.math.BigDecimal("0.01"))).cast("double")
            .as("sum_base_price"),
          (sum(col("disc_c2").cast("decimal(28,0)")) *
            lit(new java.math.BigDecimal("0.0001"))).cast("double")
            .as("sum_disc_price"),
          sum("cnt").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    Q("q_join_topn",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"), "left_semi")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE EXISTS (SELECT 1 FROM customer
                           WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
             GROUP BY l_orderkey
             ORDER BY revenue DESC, l_orderkey LIMIT 10"""))
  )
}
