package graft

import graft.tables.Tables
import org.apache.spark.sql.types._

/** Fixture-schema smoke test: the driver regenerates /root/testdata between
  * rounds, and a silent physical-type change (e.g. events.ts flipping from
  * parquet TIMESTAMP(NANOS) to native TIMESTAMP(MICROS, NTZ)) should fail
  * HERE, loudly, at round start — not downstream inside the correctness
  * gate. Asserts every logical type the query registry depends on, reading
  * each table through the same `Tables` loaders the registry uses.
  */
class FixtureSchemaSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def fieldType(df: org.apache.spark.sql.DataFrame, name: String): DataType =
    df.schema(name).dataType

  test("events loads with ts as TimestampType regardless of fixture vintage") {
    val ev = Tables.events(spark, dir)
    assert(fieldType(ev, "ts") === TimestampType,
      s"events.ts must normalize to TimestampType, got ${fieldType(ev, "ts")}")
    assert(fieldType(ev, "event_id") === LongType)
    assert(fieldType(ev, "user_id") === LongType)
    assert(fieldType(ev, "event_type") === StringType)
    assert(fieldType(ev, "value") === DoubleType)
    // ts must be usable in arithmetic/windowing — this is exactly the
    // expression shape that broke when the loader assumed one vintage.
    val n = ev.selectExpr("window(ts, '1 hour')", "unix_micros(ts)").limit(1).count()
    assert(n === 1)
  }

  test("documents has the text-pipeline columns") {
    val d = Tables.documents(spark, dir)
    assert(fieldType(d, "doc_id") === LongType)
    assert(fieldType(d, "text") === StringType)
    assert(fieldType(d, "lang") === StringType)
    assert(fieldType(d, "source") === StringType)
    assert(fieldType(d, "n_chars") === LongType)
  }

  test("embeddings has array<float> vectors") {
    val e = Tables.embeddings(spark, dir)
    assert(fieldType(e, "vec_id") === LongType)
    assert(fieldType(e, "embedding") === ArrayType(FloatType, containsNull = true) ||
           fieldType(e, "embedding") === ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must be array<float>, got ${fieldType(e, "embedding")}")
    assert(fieldType(e, "label") === IntegerType)
  }

  test("lineitem numeric and temporal columns") {
    val l = Tables.lineitem(spark, dir)
    assert(fieldType(l, "l_orderkey") === LongType)
    assert(fieldType(l, "l_quantity") === DoubleType)
    assert(fieldType(l, "l_extendedprice") === DoubleType)
    assert(fieldType(l, "l_discount") === DoubleType)
    assert(fieldType(l, "l_returnflag") === StringType)
    val temporal = Set[DataType](TimestampType, TimestampNTZType, DateType)
    assert(temporal.contains(fieldType(l, "l_shipdate")),
      s"l_shipdate must be temporal, got ${fieldType(l, "l_shipdate")}")
  }

  test("orders/customer/supplier/part/nation/region join keys are integral") {
    // Join keys may ship as int32 or int64 — Catalyst widens on join — but
    // a flip to string/decimal would silently change join semantics.
    val integral = Set[DataType](IntegerType, LongType)
    assert(fieldType(Tables.orders(spark, dir), "o_orderkey") === LongType)
    assert(fieldType(Tables.orders(spark, dir), "o_custkey") === LongType)
    assert(fieldType(Tables.customer(spark, dir), "c_custkey") === LongType)
    assert(integral.contains(fieldType(Tables.customer(spark, dir), "c_nationkey")))
    assert(fieldType(Tables.supplier(spark, dir), "s_suppkey") === LongType)
    assert(fieldType(Tables.part(spark, dir), "p_partkey") === LongType)
    assert(integral.contains(fieldType(Tables.nation(spark, dir), "n_nationkey")))
    assert(integral.contains(fieldType(Tables.region(spark, dir), "r_regionkey")))
  }
}
