package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always passes exactly two args, running everything)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // checkpoint-file checksum sidecars off — see Bench.scala (r16):
      // every state-store commit otherwise blocks on an async checksum
      // file write; env knob to re-enable
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      // FileSystem-based checkpoint manager + raw local fs (r16, thread
      // dumps): the default FileContext manager renames each checkpoint
      // file through Hadoop's ChecksumFs, which (no native libs here)
      // FORKS a shell process per rename (readlink) and writes a .crc
      // sidecar per file — executor threads showed ProcessImpl.forkAndExec
      // under finalizeDeltaFile. FileSystemBased renames via
      // File.renameTo (atomic on a local fs), no fork. (fs.file.impl =
      // RawLocalFileSystem was tried for the .crc sidecars too and
      // REVERTED: Hadoop's FileSystem.getLocal casts the file:// fs to
      // LocalFileSystem, which RocksDB's checkpoint upload relies on —
      // StreamFuzzSpec caught the ClassCastException.) FileSystemBased
      // is Spark's own fallback manager for schemes without FileContext
      // support, so HDFS/S3 deployments are untouched.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // progress + per-query seconds on stderr: at big SFs one
        // pathological plan can eat the whole run — the log must say
        // WHICH query is live and what each one cost (r14 sf1 sidecar)
        System.err.println(
          f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries may persist() intermediates for intra-query reuse; nothing
      // is shared across queries, so drop it all to keep the session flat
      // (incl. any AQE sizing a CDC query set)
      finally {
        spark.catalog.clearCache()
        graft.operators.Cdc.restoreShuffleSizing(spark)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
