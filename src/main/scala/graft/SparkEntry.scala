package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, ExtendedQueries, LakehouseQueries, LlmQueries, SamplingQueries, StructureQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Exposes every named query in [[graft.queries.CoreQueries]] (the
  * SURVEY.md §2 operator inventory mapped onto the driver corpus) plus its
  * DuckDB oracle SQL where expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q17 is the reference's full TOP_ITEMS pipeline (dedup → grouped count
    * → per-group top-K → broadcast left join with "Unknown" default).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q17_top_items").fn(spark, "/root/testdata/sf0.001")

  private def allQueries =
    CoreQueries.queries ++ LlmQueries.queries ++ ExtendedQueries.queries ++
      LakehouseQueries.queries ++ SamplingQueries.queries ++
      StructureQueries.queries

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline tier (dedup / text analysis / similarity). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect {
      case (name, q) if q.oracle.isDefined => name -> q.oracle.get
    }
}
