package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key below is a qname from SURVEY.md §2's operator inventory; the
  * implementation lives in `graft.queries.*` (thin declared queries) on
  * top of `graft.engine.*` (the reusable operator library).
  */
object SparkEntry {

  /** All declared queries with their optional DuckDB oracle twins. */
  def registry: Map[String, Declared] = Map(
    // §2.1 scans
    "scan_parquet" -> Declared(Scans.scanParquet _, Scans.scanParquetSql),
    "scan_csv" -> Declared(Scans.scanCsv _, Scans.scanCsvSql),
    "scan_json" -> Declared(Scans.scanJson _, Scans.scanJsonSql),
    // §2.2 row ops
    "project_rename" -> Declared(RowOps.projectRename _, RowOps.projectRenameSql),
    "filter_pred" -> Declared(RowOps.filterPred _, RowOps.filterPredSql),
    "cast_types" -> Declared(RowOps.castTypes _, RowOps.castTypesSql),
    "null_handling" -> Declared(RowOps.nullHandling _, RowOps.nullHandlingSql),
    "case_when_isin" -> Declared(RowOps.caseWhenIsin _, RowOps.caseWhenIsinSql),
    "explode_array" -> Declared(RowOps.explodeArray _, RowOps.explodeArraySql),
    "melt_unpivot" -> Declared(RowOps.meltUnpivot _, RowOps.meltUnpivotSql),
    // §2.3 joins
    "join_inner_equi" -> Declared(Joins.joinInnerEqui _, Joins.joinInnerEquiSql),
    "join_left" -> Declared(Joins.joinLeft _, Joins.joinLeftSql),
    "join_full" -> Declared(Joins.joinFull _, Joins.joinFullSql),
    "join_semi" -> Declared(Joins.joinSemi _, Joins.joinSemiSql),
    "join_anti" -> Declared(Joins.joinAnti _, Joins.joinAntiSql),
    "join_broadcast" -> Declared(Joins.joinBroadcast _, Joins.joinBroadcastSql),
    "join_cross" -> Declared(Joins.joinCross _, Joins.joinCrossSql),
    "join_range_theta" -> Declared(Joins.joinRangeTheta _, Joins.joinRangeThetaSql),
    "join_asof" -> Declared(Joins.joinAsof _, Joins.joinAsofSql),
    // §2.4 aggregations
    "agg_basic" -> Declared(Aggregations.aggBasic _, Aggregations.aggBasicSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.aggBasic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Declared(_, Some(sql))) => k -> sql }
}
