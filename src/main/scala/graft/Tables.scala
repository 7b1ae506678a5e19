package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale note: `spark.read.parquet` is the columnar, splittable scan path —
  * filters and column pruning push into the parquet reader, so the same code
  * runs on sf0.001 locally and 100 TB on a cluster without change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); Spark's TimestampType is
      // micros and the reader rejects nanos outright. Read nanos as long,
      // then truncate to micros (`div` keeps full int64 precision; a double
      // roundtrip would corrupt ~1.7e18 values). DuckDB's ns->us cast
      // truncates identically, so oracle SQL does ts::TIMESTAMP.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** DuckDB-side view of `events` with the same ns->us truncation the Spark
    * loader applies; prepend to any oracle SQL touching event timestamps. */
  val eventsUsCte /* reference it as `ev` */: String =
    "WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) "

  /** Register every table as a temp view named after itself (idempotent;
    * skips when this dir's views are already in place — schema inference
    * over 10 parquet footers isn't free when called per query). One marker
    * tracks the CURRENTLY registered dir: switching dirs re-registers, and
    * switching back re-registers again (a per-dir marker would go stale and
    * silently serve the other dir's data). Weak keys: a discarded
    * SparkSession must not be pinned for the process lifetime by this cache
    * (long-lived multi-session processes/tests). A sentinel-view existence
    * check guards against temp views dropped out-of-band while the marker
    * still claims the dir is registered. */
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      val fresh = registeredDir.get(spark) != dir ||
        !spark.catalog.tableExists(all.head)
      if (fresh) {
        all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, dir)
      }
    }
}
