package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.OrderByOnce.Ops
import graft.tables.Tables
import util._

/** Scalar-function surface (SURVEY.md §2.7): string / datetime / math /
  * array-HOF / json families, all `org.apache.spark.sql.functions`
  * built-ins (codegen'd, pushdown-transparent — never UDFs).
  *
  * Cross-engine gotchas pinned here: DuckDB regexp_replace needs the 'g'
  * flag to match Spark's replace-all; Spark dayofweek is 1=Sunday vs
  * DuckDB 0=Sunday (normalized via -1); float math goes through exact
  * DECIMAL accumulation wherever summation order could differ.
  */
object Scalars {

  def scalarString(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lo"),
        upper(col("c_mktsegment")).as("up"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 1, 8).as("sub"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("cat"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("pad"),
        regexp_replace(col("c_name"), "[0-9]", "").as("nodigits"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").like("%1%").as("has1"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy("c_custkey")

  val scalarStringSql: String =
    """SELECT c_custkey, lower(c_name) AS lo, upper(c_mktsegment) AS up,
      | length(c_name) AS len, substring(c_name, 1, 8) AS sub,
      | concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS cat,
      | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
      | regexp_replace(c_name, '[0-9]', '', 'g') AS nodigits,
      | regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      | c_name LIKE '%1%' AS has1,
      | trim('  x  ') AS trimmed
      |FROM customer ORDER BY c_custkey""".stripMargin

  def scalarDatetime(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        (dayofweek(col("ts")) - 1).as("dow"),
        date_format(col("ts"), "EEEE").as("dayname"),
        fmtTs(date_trunc("hour", col("ts"))).as("hour_trunc"),
        datediff(col("ts"), to_date(lit("2024-01-01"))).as("days_since"),
        fmtTs(col("ts") + expr("INTERVAL 90 MINUTE")).as("plus90m"))
      .orderBy("event_id")

  val scalarDatetimeSql: String =
    """SELECT event_id, year(ts) AS y, month(ts) AS m, day(ts) AS d,
      | hour(ts) AS h, minute(ts) AS mi, dayofweek(ts) AS dow,
      | dayname(ts) AS dayname,
      | strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_trunc,
      | date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
      | strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m
      |FROM events ORDER BY event_id""".stripMargin

  def scalarMath(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .filter(col("l_orderkey") <= 2000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(log(col("l_extendedprice") + 1), 4).as("price_ln"),
        (col("l_linenumber") % 3).as("ln_mod"),
        expr("l_orderkey div 8").as("ok_div"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // fixture; (abs_dev, price_floor, disc_sq) pin the remaining
      // source columns, making the order total
      .orderBy("l_orderkey", "l_linenumber", "abs_dev", "price_floor", "disc_sq")

  val scalarMathSql: String =
    """SELECT l_orderkey, l_linenumber,
      | abs(l_quantity - 25) AS abs_dev,
      | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      | round(sqrt(l_quantity), 6) AS qty_sqrt,
      | round(pow(l_discount, 2), 6) AS disc_sq,
      | round(ln(l_extendedprice + 1), 4) AS price_ln,
      | l_linenumber % 3 AS ln_mod,
      | l_orderkey // 8 AS ok_div
      |FROM lineitem WHERE l_orderkey <= 2000
      |ORDER BY l_orderkey, l_linenumber, abs_dev, price_floor, disc_sq""".stripMargin

  /** Array higher-order functions over the embedding column. The squared
    * l2 norm accumulates per-element products as 1e14-scaled integers —
    * exact and order-independent, so neither engine's fold order can
    * shift the last ulp (SURVEY.md §4.2).
    */
  def scalarArray(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).embeddings
      .filter(col("vec_id") < 50)
      .selectExpr(
        "vec_id",
        "size(embedding) AS dim",
        "round(CAST(element_at(embedding, 1) AS DOUBLE), 6) AS first_val",
        // list output is stringified (scaled-int elements, engine-neutral
        // formatting): the driver's pandas compare cannot sort/hash raw
        // array cells
        "concat_ws(',', transform(slice(embedding, 1, 3), x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS STRING))) AS head3",
        "size(filter(embedding, x -> x > 0)) AS n_pos",
        """round(sqrt(CAST(aggregate(embedding, CAST(0 AS BIGINT),
          | (acc, x) -> acc + CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e14) AS BIGINT)) AS DOUBLE) / 1e14), 6) AS l2""".stripMargin)
      .orderBy("vec_id")

  val scalarArraySql: String =
    """SELECT vec_id, len(embedding) AS dim,
      | round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
      | array_to_string(list_transform(embedding[1:3], x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS VARCHAR)), ',') AS head3,
      | len(list_filter(embedding, x -> x > 0)) AS n_pos,
      | round(sqrt(CAST(list_sum(list_transform(embedding,
      |   x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e14) AS BIGINT))) AS DOUBLE) / 1e14), 6) AS l2
      |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin

  /** JSON extraction: from_json with an explicit schema (the scale path —
    * one parse, typed result) plus get_json_object for ad-hoc paths.
    */
  def scalarJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k_typed"))
      .withColumn("k_mod", col("k_typed") % 7)
      .orderByOnce("event_id")

  val scalarJsonSql: String =
    """SELECT event_id,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
      |FROM events ORDER BY event_id""".stripMargin

  /** Spark 4 VARIANT ingestion — the modern semi-structured path
    * (`parse_json` → binary variant → typed `variant_get`), the
    * replacement for string-JSON re-parsing per field: the document is
    * parsed ONCE into the shredded binary encoding and every field
    * access is a cheap typed probe, the exact pattern a 100 TB
    * semi-structured lake wants (contrast [[scalarJson]], which
    * re-parses `props` per extraction). Results are plain typed
    * columns, so the oracle is the ordinary JSON read.
    */
  def scalarVariant(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .select(col("event_id"),
        parse_json(col("props")).as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("variant_get(v, '$.missing', 'string') IS NULL").as("missing_is_null"))
      .withColumn("k_bucket", pmod(col("k"), lit(5L)))
      .orderByOnce("event_id")

  val scalarVariantSql: String =
    """SELECT event_id,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      | json_extract_string(props, '$.k') AS k_str,
      | json_extract(props, '$.missing') IS NULL AS missing_is_null,
      | (CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 + 5) % 5 AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  /** pandas `axis=1` row-wise statistics — min / lower-median / max
    * across a row's numeric columns (`df[cols].min(axis=1)` etc.), the
    * cross-COLUMN reduction pandas users reach for constantly and
    * columnar engines make awkward: here it is one codegen
    * `array_sort` over a 4-element array per row — no explode, no
    * unpivot shuffle, no UDF; scale cost is exactly one projection.
    * Cents lattice in, one descale out.
    */
  def scalarRowwiseStats(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => round(col(c) * 100).cast("long"))
    Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        array_sort(array(cents: _*)).as("s"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (element_at(col("s"), 1).cast("double") / 100.0).as("row_min"),
        (element_at(col("s"), 2).cast("double") / 100.0).as("row_median_lo"),
        (element_at(col("s"), 4).cast("double") / 100.0).as("row_max"))
      // l_linenumber is NOT unique per order in this fixture (the
      // denorm_order_lines finding) — totalize on the stat columns;
      // residual full-duplicate rows sort-stably either way
      .orderByOnce("l_orderkey", "l_linenumber", "row_min", "row_median_lo", "row_max")
  }

  val scalarRowwiseStatsSql: String =
    """WITH s AS (
      |  SELECT l_orderkey, l_linenumber,
      |    list_sort([CAST(round(l_quantity * 100) AS BIGINT),
      |               CAST(round(l_extendedprice * 100) AS BIGINT),
      |               CAST(round(l_discount * 100) AS BIGINT),
      |               CAST(round(l_tax * 100) AS BIGINT)]) AS s
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(s[1] AS DOUBLE) / 100.0 AS row_min,
      |  CAST(s[2] AS DOUBLE) / 100.0 AS row_median_lo,
      |  CAST(s[4] AS DOUBLE) / 100.0 AS row_max
      |FROM s ORDER BY l_orderkey, l_linenumber, row_min, row_median_lo, row_max""".stripMargin
}
