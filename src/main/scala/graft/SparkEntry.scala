package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into [[graft.queries.QueryPack]]s, one per SURVEY §2
  * area; this object is the flat union the driver consumes.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries,
    ScalarQueries,
    AggQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    SqlQueries,
    MultimodalQueries,
    CurationQueries,
    CdcQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap

  /** Bench-headline-only queries, deliberately outside the gate; each has
    * a hash-checked semantic pin among `queries` (see QueryPack.benchOnly). */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.benchOnly).toMap
}
