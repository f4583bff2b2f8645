package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.ops.Temporal

/** The temporal operators must work on BOTH timestamp encodings: plain
  * TIMESTAMP and TIMESTAMP_NTZ (what Spark 4 infers for untagged parquet
  * micros when `inferTimestampNTZ` is left on — i.e. a caller who did NOT
  * go through `Tables`). `epochMicros`/`epochSeconds` make the operator
  * layer encoding-agnostic; these cases drive each operator over an
  * NTZ-typed frame and check results against the TIMESTAMP-typed run.
  */
class TemporalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** (user, ts, value) fixture in both encodings. */
  private def fixture: (DataFrame, DataFrame) = {
    val ltz = Seq(
      (1L, 0L), (1L, 30L), (1L, 95L), (1L, 4000L),
      (2L, 10L), (2L, 11L), (2L, 7200L))
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        (col("sec") % 7).cast("double").as("value"))
    val ntz = ltz.withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    (ltz, ntz)
  }

  test("epochMicros/epochSeconds accept both encodings and agree") {
    val (ltz, ntz) = fixture
    def us(df: DataFrame) =
      df.select(Temporal.epochMicros(col("ts"))).as[Long].collect().sorted
    def s(df: DataFrame) =
      df.select(Temporal.epochSeconds(col("ts"))).as[Long].collect().sorted
    assert(us(ltz) === us(ntz))
    assert(s(ltz) === s(ntz))
    assert(us(ltz).head == 0L && s(ltz).last == 7200L)
  }

  test("resampleWithGapFill runs identically on an NTZ frame") {
    val (ltz, ntz) = fixture
    def run(df: DataFrame) = Temporal
      .resampleWithGapFill(df, "user_id", "ts", "value", 60L)
      .select("user_id", "bucket", "n", "ff_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val expected = run(ltz)
    assert(run(ntz) == expected)
    // user 1 spans buckets 0..66 densely: 67 rows, gaps carry n=0
    assert(expected.count(_._1 == 1L) == 67)
    assert(expected.exists(t => t._1 == 1L && t._3 == 0L))
  }

  test("intervalJoinBinned runs identically on an NTZ frame") {
    val (ltz, ntz) = fixture
    def run(df: DataFrame) = {
      val l = df.select(col("user_id"), col("ts").as("lts"))
      val r = df.select(col("user_id"), col("ts").as("rts"))
      Temporal.intervalJoinBinned(l, r, "user_id", "lts", "rts", 60L)
        .select(Temporal.epochSeconds(col("lts")),
          Temporal.epochSeconds(col("rts")))
        .as[(Long, Long)].collect().toSet
    }
    val expected = run(ltz)
    assert(run(ntz) == expected)
    // spot: rts=0 is within 60s before lts=30 for user 1; rts=30 is NOT
    // within 60s of lts=95 (65s gap); 4000 pairs only with itself
    assert(expected.contains((30L, 0L)))
    assert(!expected.contains((95L, 30L)))
    assert(!expected.exists(t => t._1 == 4000L && t._2 != 4000L))
  }

  test("asofJoin runs identically on an NTZ frame") {
    val (ltz, ntz) = fixture
    def run(df: DataFrame) = {
      val l = df.select(col("user_id"), col("ts"))
      val r = df.select(col("user_id"), col("ts").as("rts"),
        col("value"), col("ts").as("tie"))
      Temporal.asofJoin(l, r, "user_id", "ts", "rts", Seq("value"), "tie")
        .select(Temporal.epochSeconds(col("ts")), col("asof_value"))
        .as[(Long, Double)].collect().toSet
    }
    assert(run(ltz) == run(ntz))
  }
}
