package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.Tables
import graft.operators.Cdc

/** CDC changelog processing gate queries (SURVEY §2.1 connector row).
  *
  * The reference's mysql/postgres/mongo CDC connectors run as external
  * Debezium containers (conf/hstream.yaml:129-143); the engine only stores
  * task metadata. These queries run the PROCESSING half of that pipeline
  * in-engine end-to-end: a deterministic changelog is derived from `orders`
  * (insert for every order, update for keys ≡ 0 mod 3, delete for keys
  * ≡ 0 mod 5), serialized through the real JSON envelope encode → decode
  * round-trip, then materialized with [[Cdc.applyLatest]]. The DuckDB
  * oracle computes the same final state DIRECTLY from `orders` with no
  * JSON anywhere — a hash match proves envelope encode, decode, ordering,
  * and delete semantics all the way through.
  *
  * Scale: the changelog build is three map-side passes over one scan
  * (union of narrow projections), and applyLatest is one partial-agg
  * shuffle — see Cdc.scala's header for why this survives 100 TB.
  */
object CdcQueries extends QueryPack {

  private val rowSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  private val payloadCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** The synthetic changelog as JSON envelope strings (column `value`).
    * ts = orderkey*10 + {0 insert, 1 update, 2 delete} gives every change a
    * distinct total-order position; seq carries the same order so either
    * component alone would suffice (both are exercised). */
  private def changelog(s: SparkSession, dir: String): DataFrame =
    changelogFrom(Tables.load(s, dir, "orders"))

  /** Frame-based changelog build — shared with ScaleProbe, which feeds a
    * 10× orders frame through the identical encode path. */
  private[graft] def changelogFrom(o0: DataFrame): DataFrame = {
    // RESTRUCTURED r15 (guide §2.4 remove shuffles / §2.3 scan once): the
    // three-way union scanned orders three times; the per-order change set
    // is now one conditional array explode — ONE scan, one map-side pass,
    // identical envelope multiset (the encode below is unchanged and the
    // oracle pins the result). The preceding hash-repartition spreads the
    // to_json/from_json encode — the dominant map cost — across the
    // session's cores: the local parquet reads as 3 splits, which
    // serialized it (at 100 TB the scan's own splits do this, and a real
    // changelog arrives pre-partitioned from the transport).
    val okey = col("o_orderkey")
    val ops = filter(array(
      struct(lit("c").as("_op"), (okey * 10).as("_ts")),
      when(okey % 3 === 0,
        struct(lit("u").as("_op"), (okey * 10 + 1).as("_ts"))),
      when(okey % 5 === 0,
        struct(lit("d").as("_op"), (okey * 10 + 2).as("_ts")))),
      x => x.isNotNull)
    o0.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .repartition(o0.sparkSession.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .select(okey, col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), explode(ops).as("_o"))
      .withColumn("_op", col("_o._op"))
      .withColumn("_ts", col("_o._ts"))
      .withColumn("o_orderstatus",
        when(col("_op") === "u", lit("U")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("_op") === "u", col("o_totalprice") + 100.0)
          .otherwise(col("o_totalprice")))
      .select(Cdc.encode(col("_op"), col("_ts"), col("_ts"), payloadCols)
        .as("value"))
  }

  private def decoded(s: SparkSession, dir: String): DataFrame =
    Cdc.decode(changelog(s, dir), rowSchema)

  private[graft] def decodedFrom(o: DataFrame): DataFrame =
    Cdc.decode(changelogFrom(o), rowSchema)

  override def queries: Map[String, Q] = Map(
    // Full materialized state after the changelog replays — every surviving
    // key with its last-write values. The JSON round-trip and the delete
    // filter are both on the hashed path.
    "q_cdc_apply" -> ((s, dir) => {
      Cdc.applyLatest(decoded(s, dir), Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Downstream aggregation over the materialized state — the "query the
    // CDC-maintained table" half of the pipeline (pull query on a
    // connector-fed table).
    "q_cdc_state_agg" -> ((s, dir) => {
      Cdc.applyLatest(decoded(s, dir), Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // Operational envelope counters (post-decode, so the JSON path is
    // included): inserts/updates/deletes seen.
    "q_cdc_ops" -> ((s, dir) => Cdc.opCounts(decoded(s, dir)))
  )

  override def oracleSql: Map[String, String] = Map(
    "q_cdc_apply" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  ROUND(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END, 2) AS o_totalprice
        |FROM orders WHERE o_orderkey % 5 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_cdc_state_agg" ->
      """SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END), 2) AS total
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cdc_ops" ->
      """SELECT op, COUNT(*) AS n FROM (
        |  SELECT 'c' AS op FROM orders
        |  UNION ALL SELECT 'u' FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL SELECT 'd' FROM orders WHERE o_orderkey % 5 = 0
        |) GROUP BY op ORDER BY op""".stripMargin
  )
}
