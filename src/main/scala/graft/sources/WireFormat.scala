package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's sink/source wire encoding: MongoDB-extended JSON
  * (flowValueToJsonValue / jsonValueToFlowValue,
  * hstream-sql/src/HStream/SQL/Rts/Old.hs:134-198):
  *
  *   int       → {"$numberLong":"n"}         float  → {"$numberDouble":"x"}
  *   bytes     → {"$binary":{"base64":"…","subType":"00"}}
  *   date      → {"$date":"ISO8601"}         time   → {"$time":"ISO8601"}
  *   timestamp → {"$timestamp":"ISO8601"}
  *   bool/text → plain JSON                  array/object → recursive
  *
  * Encode/decode are pure Catalyst expressions (string concat + from_json),
  * so the wire layer rides whole-stage codegen and scales like any other
  * projection. A consumer of the reference's sink topics can read ours and
  * vice versa.
  *
  * Divergence (documented): float rendering uses Spark's double→string
  * (shortest round-trip), not Haskell `show` — values round-trip exactly,
  * exponent formatting can differ.
  */
object WireFormat {

  /** Render a string column as a quoted JSON string literal with FULL
    * escaping (control chars, quotes, backslashes, unicode) — by round-
    * tripping through to_json, whose Jackson writer is the exact inverse of
    * the from_json reader used on decode. `{"v":<escaped>}` minus the fixed
    * 5-char prefix and 1-char suffix is the quoted literal itself. */
  private def jsonStringLit(c: Column): Column = {
    val obj = to_json(struct(c.as("v")))
    obj.substr(lit(6), length(obj) - 6)
  }

  private def nullable(c: Column, enc: Column): Column =
    when(c.isNull, lit("null")).otherwise(enc)

  /** Encode one column to its extended-JSON text. */
  def encodeValue(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      nullable(c, concat(lit("{\"$numberLong\":\""), c.cast("string"), lit("\"}")))
    case DoubleType | FloatType =>
      nullable(c, concat(lit("{\"$numberDouble\":\""), c.cast("string"), lit("\"}")))
    case BooleanType => nullable(c, c.cast("string"))
    case StringType => nullable(c, jsonStringLit(c))
    case BinaryType => nullable(c, concat(
      lit("{\"$binary\":{\"base64\":\""), base64(c), lit("\",\"subType\":\"00\"}}")))
    case DateType => nullable(c, concat(
      lit("{\"$date\":\""), date_format(c, "yyyy-MM-dd"), lit("\"}")))
    case TimestampType => nullable(c, concat(
      lit("{\"$timestamp\":\""),
      // microsecond pattern: Spark timestamps carry micros, and a .SSS
      // pattern would silently truncate them on the wire (encode/decode
      // must round-trip exactly)
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"), lit("\"}")))
    case ArrayType(et, _) => nullable(c, concat(
      lit("["), array_join(transform(c, x => encodeValue(x, et)), ","), lit("]")))
    case st: StructType => nullable(c, concat(
      (lit("{") +: st.fields.zipWithIndex.flatMap { case (f, i) =>
        val kv = concat(lit(s""""${f.name}":"""), encodeValue(c.getField(f.name), f.dataType))
        if (i == 0) Seq(kv) else Seq(lit(","), kv)
      } :+ lit("}")).toIndexedSeq: _*))
    case other => throw new IllegalArgumentException(s"no wire encoding for $other")
  }

  /** Encode every column of `df` into a single `value` JSON text column —
    * the shape a sink task appends to the output stream. */
  def encode(df: DataFrame): DataFrame = {
    val parts = df.schema.fields.zipWithIndex.flatMap { case (f, i) =>
      val kv = concat(lit(s""""${f.name}":"""), encodeValue(col(f.name), f.dataType))
      if (i == 0) Seq(kv) else Seq(lit(","), kv)
    }
    df.select(concat((lit("{") +: parts :+ lit("}")).toIndexedSeq: _*).as("value"))
  }

  /** The from_json-compatible schema of a wire-encoded payload. */
  def wireSchema(dt: DataType): DataType = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      StructType(Seq(StructField("$numberLong", StringType)))
    case DoubleType | FloatType =>
      StructType(Seq(StructField("$numberDouble", StringType)))
    case BinaryType => StructType(Seq(StructField("$binary",
      StructType(Seq(StructField("base64", StringType),
        StructField("subType", StringType))))))
    case DateType => StructType(Seq(StructField("$date", StringType)))
    case TimestampType => StructType(Seq(StructField("$timestamp", StringType)))
    case BooleanType | StringType => dt
    case ArrayType(et, n) => ArrayType(wireSchema(et), n)
    case StructType(fields) => StructType(fields.map(f =>
      StructField(f.name, wireSchema(f.dataType))))
    case other => throw new IllegalArgumentException(s"no wire schema for $other")
  }

  /** Decode a parsed wire value back to its typed column. NULL-on-error
    * throughout (try_cast): the reference DROPS records whose decode
    * fails (Codegen Lefts skip the row, V1.hs:235-240) — under Spark 4's
    * default ANSI mode the previous plain cast/to_timestamp would instead
    * ABORT the whole continuous query on ONE corrupt record arriving at a
    * live socket/ledger topic (r13 find, pinned in WireFormatSpec).
    * try_cast string→date/timestamp uses the same ISO parser as
    * to_date/to_timestamp-without-format, so well-formed payloads decode
    * identically. */
  def decodeValue(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      c.getField("$numberLong").try_cast(dt)
    case DoubleType | FloatType => c.getField("$numberDouble").try_cast(dt)
    // try_to_binary, not unbase64: unbase64 THROWS on malformed base64 in
    // Spark 3.3+/4.x, so one corrupt $binary field would abort the whole
    // continuous query — the same failure class the r13 try_cast sweep
    // closed for the other types (r14 ADVICE find)
    case BinaryType =>
      try_to_binary(c.getField("$binary").getField("base64"), lit("base64"))
    case DateType => c.getField("$date").try_cast(dt)
    case TimestampType => c.getField("$timestamp").try_cast(dt)
    case BooleanType | StringType => c
    case ArrayType(et, _) => transform(c, x => decodeValue(x, et))
    case StructType(fields) => struct(fields.toIndexedSeq.map(f =>
      decodeValue(c.getField(f.name), f.dataType).as(f.name)): _*)
    case other => throw new IllegalArgumentException(s"no wire decoding for $other")
  }

  /** Decode a `value` JSON text column produced by [[encode]] back into the
    * typed columns of `schema`. */
  def decode(df: DataFrame, schema: StructType): DataFrame = {
    val wire = wireSchema(schema).asInstanceOf[StructType]
    val parsed = df.select(from_json(col("value"), wire).as("r"))
    parsed.select(schema.fields.toIndexedSeq.map(f =>
      decodeValue(col(s"r.${f.name}"), f.dataType).as(f.name)): _*)
  }
}
