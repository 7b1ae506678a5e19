package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch of driver-checkable queries.
  *
  * Contract (driver): every key in `queries` runs at sf0.01 via
  * [[graft.Verify]]; keys present in `oracleSql` are hash-compared against
  * DuckDB running the same SQL on the same parquet tables. Column names must
  * match exactly between the Spark result and the oracle SQL (the driver
  * sorts columns by name before hashing).
  *
  * Determinism rules used throughout:
  *   - every query ends in an orderBy over a unique key set;
  *   - floating-point aggregates are rounded identically on both sides.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
  /** Headline/bench-only queries that deliberately stay OUT of the
    * correctness gate — each must have a hash-checked semantic pin in
    * `queries` instead (e.g. the xxhash64 LSH twin, whose pair-set
    * equality to the md5 pipeline is itself a gate row). Keeping them out
    * of `queries` keeps the gate free of rows-only entries. */
  def benchOnly: Map[String, Q] = Map.empty
}
