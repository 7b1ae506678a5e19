package graft.sources

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Round-trip + golden-shape tests for the extended-JSON wire format
  * (Rts/Old.hs:134-198). */
class WireFormatSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("i", LongType), StructField("f", DoubleType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("d", DateType),
    StructField("t", TimestampType),
    StructField("arr", ArrayType(LongType))))

  private val row = Row(42L, 1.5d, true, """he said "hi"\now""",
    Array[Byte](1, 2, 255.toByte), Date.valueOf("2024-03-01"),
    Timestamp.valueOf("2024-03-01 12:30:45.123"), Seq(1L, 2L))

  private def df = spark.createDataFrame(
    java.util.List.of(row, Row(null, null, null, null, null, null, null, null)),
    schema)

  test("encode produces the reference's $-shapes (flowValueToJsonValue)") {
    val json = WireFormat.encode(df).head().getString(0)
    assert(json.contains(""""i":{"$numberLong":"42"}"""), json)
    assert(json.contains(""""f":{"$numberDouble":"1.5"}"""), json)
    assert(json.contains(""""b":true"""), json)
    assert(json.contains(""""bin":{"$binary":{"base64":"AQL/","subType":"00"}}"""), json)
    assert(json.contains(""""d":{"$date":"2024-03-01"}"""), json)
    assert(json.contains(""""t":{"$timestamp":"2024-03-01T12:30:45.123Z"}"""), json)
    assert(json.contains(""""arr":[{"$numberLong":"1"},{"$numberLong":"2"}]"""), json)
    // nulls encode as JSON null (FlowNull)
    val nullJson = WireFormat.encode(df).collect()(1).getString(0)
    assert(nullJson.contains(""""i":null"""), nullJson)
  }

  test("decode(encode(x)) round-trips every type") {
    val back = WireFormat.decode(WireFormat.encode(df), schema).head()
    assert(back.getLong(0) == 42L)
    assert(back.getDouble(1) == 1.5d)
    assert(back.getBoolean(2))
    assert(back.getString(3) == """he said "hi"\now""")
    assert(back.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 255.toByte))
    assert(back.getDate(5) == Date.valueOf("2024-03-01"))
    assert(back.getTimestamp(6) == Timestamp.valueOf("2024-03-01 12:30:45.123"))
    assert(back.getSeq[Long](7) == Seq(1L, 2L))
  }

  test("decoder reads hand-written reference payloads (jsonValueToFlowValue)") {
    import spark.implicits._
    val wire = Seq(
      """{"i":{"$numberLong":"7"},"f":{"$numberDouble":"2.25"},"b":false,
         "s":"x","bin":null,"d":{"$date":"2020-01-02"},
         "t":{"$timestamp":"2020-01-02T03:04:05.000Z"},"arr":[]}""".replaceAll("\n\\s*", ""))
      .toDF("value")
    val r = WireFormat.decode(wire, schema).head()
    assert(r.getLong(0) == 7L && r.getDouble(1) == 2.25 && !r.getBoolean(2))
    assert(r.getDate(5) == Date.valueOf("2020-01-02"))
  }
}
