package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended engine surface beyond the reference's own queries (SURVEY §2
  * "declared surface" rows): JSON extraction, date/string/math scalar
  * families, percentiles, min_by/max_by, time-window aggregation, and
  * additional analytic window functions — every one a Catalyst built-in
  * (codegen'd, pushdown-friendly), oracled against DuckDB. */
object ExtendedOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** JSON field extraction (the events `props` column is JSON). */
  val fnJson: GraftQuery = GraftQuery(
    "fn_json_extract",
    (s, dir) => t(s, dir, "events").select(col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_num")),
    Some(
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events""".stripMargin))

  /** Date/time scalar family: extract parts, truncate, shift, diff. */
  val fnDates: GraftQuery = GraftQuery(
    "fn_dates",
    (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .as("days_since")),
    Some(
      """SELECT o_orderkey,
        |  CAST(extract(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
        |  CAST(extract(day FROM o_orderdate) AS INTEGER) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |       CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders""".stripMargin))

  /** String scalar family: pad, concat, locate, translate, trim, case. */
  val fnStrings: GraftQuery = GraftQuery(
    "fn_strings",
    (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
      lpad(col("o_orderstatus"), 5, "_").as("padded"),
      concat_ws("-", col("o_orderstatus"), col("o_orderpriority"))
        .as("joined"),
      locate("-", col("o_orderpriority")).as("dash_at"),
      translate(col("o_orderpriority"), "-", " ").as("spaced"),
      lower(col("o_orderpriority")).as("lowered"),
      trim(lit("  x  ")).as("trimmed")),
    Some(
      """SELECT o_orderkey, lpad(o_orderstatus, 5, '_') AS padded,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS joined,
        |  CAST(instr(o_orderpriority, '-') AS INTEGER) AS dash_at,
        |  translate(o_orderpriority, '-', ' ') AS spaced,
        |  lower(o_orderpriority) AS lowered, trim('  x  ') AS trimmed
        |FROM orders""".stripMargin))

  /** Math scalar family (rounded for cross-engine float equality). */
  val fnMath: GraftQuery = GraftQuery(
    "fn_math",
    (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
      round(abs(col("o_totalprice") - 200000), 2).as("abs_delta"),
      ceil(col("o_totalprice") / 1000).cast("long").as("kceil"),
      floor(col("o_totalprice") / 1000).cast("long").as("kfloor"),
      round(sqrt(col("o_totalprice")), 4).as("root"),
      round(log(col("o_totalprice")), 6).as("nat_log")),
    Some(
      """SELECT o_orderkey,
        |  round(abs(o_totalprice - 200000), 2) AS abs_delta,
        |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS kceil,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS kfloor,
        |  round(sqrt(o_totalprice), 4) AS root,
        |  round(ln(o_totalprice), 6) AS nat_log
        |FROM orders""".stripMargin))

  /** Array functions with string-rendered output (engine-stable compare). */
  val fnArrays: GraftQuery = GraftQuery(
    "fn_arrays",
    (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
      array_join(sort_array(split(col("o_orderpriority"), "-")), ",")
        .as("parts_sorted"),
      size(split(col("o_orderpriority"), "-")).as("n_parts"),
      array_join(slice(split(col("o_orderpriority"), "-"), 1, 1), ",")
        .as("head_part")),
    Some(
      """SELECT o_orderkey,
        |  array_to_string(list_sort(regexp_split_to_array(
        |    o_orderpriority, '-')), ',') AS parts_sorted,
        |  len(regexp_split_to_array(o_orderpriority, '-')) AS n_parts,
        |  array_to_string(regexp_split_to_array(o_orderpriority, '-')[1:1],
        |    ',') AS head_part
        |FROM orders""".stripMargin))

  /** Interpolated percentiles (exact; matches DuckDB quantile_cont). */
  val aggPercentiles: GraftQuery = GraftQuery(
    "agg_percentiles",
    (s, dir) => t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
      round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
      round(avg(col("o_totalprice")).cast("decimal(28,6)"), 4)
        .cast("double").as("mean")),
    Some(
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(CAST(avg(o_totalprice) AS DECIMAL(28,6)), 4) AS mean
        |FROM orders GROUP BY o_orderstatus""".stripMargin))

  /** Argmin/argmax aggregation. */
  val aggMinMaxBy: GraftQuery = GraftQuery(
    "agg_minmax_by",
    (s, dir) => t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
      min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_key"),
      max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_key")),
    Some(
      """SELECT o_orderstatus,
        |  min_by(o_orderkey, o_totalprice) AS cheapest_key,
        |  max_by(o_orderkey, o_totalprice) AS priciest_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin))

  /** Tumbling time-window aggregation (the batch shape of the streaming
    * windowed agg, OP-STR surface; window start == time_bucket). */
  val aggTimeWindow: GraftQuery = GraftQuery(
    "agg_time_window",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start")
        .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
          .as("total")),
    Some(
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |    AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS total
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** Additional analytic window functions: ntile, lead, first/last value
    * over a deterministic frame. */
  val winExtras: GraftQuery = GraftQuery(
    "win_extras",
    (s, dir) => {
      val byKey = Window.orderBy(col("o_orderkey"))
      val perStatus = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(col("o_orderkey"),
        ntile(4).over(byKey).as("quartile"),
        lead(col("o_orderkey"), 1).over(byKey).as("next_key"),
        first(col("o_orderkey")).over(perStatus).as("first_in_status"),
        last(col("o_orderkey")).over(perStatus).as("last_in_status"))
    },
    Some(
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_orderkey) AS INTEGER) AS quartile,
        |  lead(o_orderkey, 1) OVER (ORDER BY o_orderkey) AS next_key,
        |  first_value(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    UNBOUNDED FOLLOWING) AS first_in_status,
        |  last_value(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    UNBOUNDED FOLLOWING) AS last_in_status
        |FROM orders""".stripMargin))

  /** Scale path for [[winExtras]]: the same four analytics with no window
    * over more than one bucket of rows. The decomposition (the idiom of
    * `ChainOps.identityMismatchesScalable`):
    *
    *   - global row position = per-bucket `row_number` (parallel windows,
    *     hash-partitioned by bucket) + the cumulative row count of lower
    *     buckets, carried by a broadcast one-row-per-bucket metadata frame;
    *   - `ntile(4)` = arithmetic on (position, total count) — the same
    *     ceil-division tiling Spark's NTile computes (first `n % 4` tiles
    *     get `n div 4 + 1` rows, the rest `n div 4`);
    *   - `lead(key)` = per-bucket lead; the one null row per bucket (its
    *     last) is patched with the next non-empty bucket's first key from
    *     the same metadata frame (key gaps can leave buckets empty, so the
    *     successor is found with a bucket-level lead, not `b + 1`);
    *   - `first/last_value` over an unbounded frame ordered by the key =
    *     per-status min/max, broadcast-joined back.
    *
    * The only single-partition exchange is the bucket-metadata window (one
    * row per bucket — offsets, successor first-key, total); the data path
    * shuffles once by bucket hash. Result-identical to [[winExtras]], same
    * oracle SQL; on a 1000-executor table the global-sort form would
    * single-partition the entire table, this runs as a normal job.
    *
    * Sizing: `bucketSize` must scale with the KEY SPAN so the metadata
    * frame stays driver-bounded — a fixed size over a 1e12 keyspace means
    * 1e9 bucket rows and the "bounded" window/broadcast stop being
    * bounded. [[spanBucketSize]] (what the driver query uses) targets a
    * constant bucket count from one min/max aggregate; callers with
    * pathological in-bucket skew trade bucket count against per-bucket
    * window width. */
  def winExtrasScalableFn(s: SparkSession, dir: String,
      bucketSize: Long): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr(s"o_orderkey div $bucketSize").as("b"))
    val wOrd = Window.orderBy(col("b"))
    val meta = orders.groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"), min(col("o_orderkey")).as("first_key"))
      .select(col("b"),
        coalesce(sum(col("cnt"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("offset"),
        lead(col("first_key"), 1).over(wOrd).as("next_first"),
        sum(col("cnt"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))
          .as("n_total"))
    val statusBounds = orders.groupBy(col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("first_in_status"),
        max(col("o_orderkey")).as("last_in_status"))
    val wB = Window.partitionBy(col("b")).orderBy(col("o_orderkey"))
    orders
      .withColumn("rn_b", row_number().over(wB).cast("long"))
      .withColumn("lead_b", lead(col("o_orderkey"), 1).over(wB))
      .join(broadcast(meta), Seq("b"))
      .join(broadcast(statusBounds), Seq("o_orderstatus"))
      .withColumn("rn", col("rn_b") + col("offset"))
      .withColumn("tile_q", expr("n_total div 4"))
      .withColumn("tile_r", expr("n_total % 4"))
      .select(col("o_orderkey"),
        when(col("rn") <= col("tile_r") * (col("tile_q") + lit(1)),
          expr("(rn - 1) div (tile_q + 1) + 1"))
          // n_total < 4 ⇒ tile_q = 0, but then tile_r = n_total and the
          // when-branch covers every rn — this branch is unreachable.
          // greatest(tile_q, 1) pins that invariant structurally: no
          // refactor (e.g. precomputing the branch as a column) can
          // reintroduce a div-by-zero here.
          .otherwise(expr(
            "tile_r + (rn - tile_r * (tile_q + 1) - 1)" +
              " div greatest(tile_q, 1) + 1"))
          .cast("int").as("quartile"),
        coalesce(col("lead_b"), col("next_first")).as("next_key"),
        col("first_in_status"), col("last_in_status"))
  }

  /** Bucket size targeting ~`buckets` buckets over `keyCol`'s span — one
    * tiny min/max aggregate (two longs to the driver), then every
    * downstream per-bucket structure is bounded by `buckets` at ANY data
    * scale. */
  def spanBucketSize(df: DataFrame, keyCol: String,
      buckets: Long = 4096L): Long = {
    // cast: the corpus has shipped key columns as both int32 and int64
    // (the schema canary deliberately pins "integral", not the width)
    val r = df.agg(min(col(keyCol).cast("long")),
      max(col(keyCol).cast("long"))).head()
    if (r.isNullAt(0)) 1L
    else {
      // max - min overflows for mixed-sign extremes; saturating at
      // Long.MaxValue errs toward FEWER, wider buckets — the safe
      // direction (too small a size would unbound the metadata frame)
      val span =
        try Math.subtractExact(r.getLong(1), r.getLong(0))
        catch { case _: ArithmeticException => Long.MaxValue }
      span / buckets + 1L // divide-then-+1: no +1 overflow, always >= 1
    }
  }

  /** Bucket-size memo for the scalable-window demo queries: the sizing
    * aggregate ([[spanBucketSize]] — one min/max job and a second read of
    * the keyed table) otherwise runs inside EVERY query construction, so
    * a benchmarked timing's first run silently includes that driver
    * round-trip. The memo is keyed by (dir, table, key) PLUS a cheap
    * file fingerprint (mtime, length of `dir/table.parquet` — one stat
    * call, no data read), so a process that rewrites the table in place
    * (the corpus-drift regime: a long-lived session regenerating
    * testdata) re-sizes instead of bucketing on stale extremes. Library
    * callers with mutable MULTI-FILE inputs still use [[spanBucketSize]]
    * directly — the fingerprint only watches the single-file driver
    * layout. */
  private val sizingCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (Long, Long, Long)]() // fp mtime/len, size
  private[operators] def cachedSpanBucketSize(dir: String, table: String,
      keyCol: String)(df: => DataFrame): Long = {
    // `table` may be a VIRTUAL cache name ("orders:gaps" — same file,
    // different derived keys); the fingerprint watches the backing file,
    // so strip the ":variant" suffix or the stat would hit a
    // never-existing path and pin (0, 0) forever — the exact staleness
    // this fingerprint exists to prevent.
    // The fingerprint lives in the VALUE, not the key: a stale-keyed
    // map would grow by one dead entry per corpus regeneration in a
    // long-lived session; compute() replaces in place instead.
    val f = new java.io.File(s"$dir/${table.takeWhile(_ != ':')}.parquet")
    val (mtime, len) = (f.lastModified(), f.length())
    sizingCache.compute((dir, table, keyCol), (_, old) =>
      if (old != null && old._1 == mtime && old._2 == len) old
      else (mtime, len, spanBucketSize(df, keyCol)))._3
  }

  /** NB: the first invocation per (process, dir) pays the sizing
    * aggregate inside query construction; repeats hit the memo above, so
    * best-of-2 bench timings isolate the main job. */
  val winExtrasScalable: GraftQuery = GraftQuery(
    "win_extras_scalable",
    (s, dir) => winExtrasScalableFn(s, dir,
      cachedSpanBucketSize(dir, "orders", "o_orderkey")(
        t(s, dir, "orders"))),
    winExtras.oracle) // result-identical by construction — same full oracle

  /** Session-window aggregation (batch shape of the streaming
    * sessionization): Spark's session_window vs the classic SQL
    * gap-flag + running-sum session id derivation in DuckDB. */
  val aggSessionWindow: GraftQuery = GraftQuery(
    "agg_session_window",
    (s, dir) => graft.streaming.StreamOps.sessionizeBatch(
      s, t(s, dir, "events")),
    Some(
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |m AS (SELECT *,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(ts) AS started_at, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS total_value
        |FROM g GROUP BY user_id, sid""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    fnJson, fnDates, fnStrings, fnMath, fnArrays, aggPercentiles,
    aggMinMaxBy, aggTimeWindow, winExtras, winExtrasScalable,
    aggSessionWindow)
}
