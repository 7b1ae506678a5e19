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
      // events.ts has shipped in two physical encodings across testdata
      // generations: parquet TIMESTAMP(NANOS) (Spark's micros TimestampType
      // rejects nanos outright — read as long via the legacy flag, truncate
      // with `div` to keep full int64 precision) and plain timestamp[us]
      // (read natively as TIMESTAMP_NTZ). Normalize both to session-TZ
      // TimestampType (session is pinned UTC, so NTZ->TZ is the identity on
      // wall-clock values) so every downstream query sees one type. DuckDB's
      // cast truncates/passes through identically: oracle does ts::TIMESTAMP.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      normalizeEventsTs(raw)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Fold either ts generation (nanos-as-long or native timestamp[us]/NTZ)
    * into session-TZ TimestampType. Works on batch AND streaming frames —
    * the dispatch is on the static schema, not data. Shared by the batch
    * loader, StreamBench, and the streaming twin tests so all paths agree. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation: int64 `div` keeps precision
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ generation (UTC session => identity wall-clock)
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** DuckDB-side view of `events` with the same ts normalization the Spark
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
