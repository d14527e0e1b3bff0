package graft

import org.apache.spark.sql.types._

import graft.sources.LakeReader

/** Testdata-drift canary. The driver has re-encoded `events.ts` once
  * already (parquet TIMESTAMP(NANOS) → TIMESTAMP_MICROS isAdjustedToUTC=0),
  * which silently broke five downstream artifacts in round 7. This suite
  * makes the NEXT re-encode cost one readable failure naming the encoding
  * found, instead of five opaque DATATYPE_MISMATCH errors.
  */
class TestdataCanarySpec extends SparkTestBase {

  /** Encodings `LakeReader.table` knows how to normalize. */
  private val accepted: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  test("events.ts raw parquet encoding is one LakeReader.table understands") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val dt = raw.schema("ts").dataType
    assert(accepted.contains(dt),
      s"TESTDATA DRIFT: events.ts now reads as $dt (raw parquet). " +
        s"LakeReader.table accepts ${accepted.mkString(", ")} — teach it " +
        "this new encoding (sources/LakeReader.scala) and update this spec.")
  }

  test("LakeReader.table normalizes events.ts to session-zoned timestamp") {
    val ev = LakeReader.table(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType,
      s"normalized events.ts must be TimestampType, got ${ev.schema("ts").dataType}")
    // and the values are sane instants, not nanos-longs misread as seconds
    val r = ev.selectExpr("min(year(ts))", "max(year(ts))").head
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"normalized ts years [${r.getInt(0)}, ${r.getInt(1)}] out of range — " +
        "unit mismatch in the normalization?")
  }
}
