package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Pins the ENGINE-FACING schema of every driver table, at every SF the
  * box carries. The driver regenerates testdata between rounds and has
  * already drifted once (round 6: `events.ts` flipped from parquet
  * TIMESTAMP(NANOS) to plain `timestamp[us]`/NTZ, silently breaking
  * q42 + 8 specs). This spec turns the next drift into a named failure
  * with the table, column, and type in the message.
  *
  * The pinned types are post-[[Tables.apply]] normalization — the
  * contract operators compile against — NOT the raw parquet types.
  * `events.ts` MUST be `timestamp` (TimestampType): `unix_millis`,
  * `unix_micros`, and streaming event-time watermarks all reject NTZ.
  * `o_orderdate`/`l_shipdate` are pinned at their current NTZ reading
  * (oracle-green through every date query); if the generator changes
  * them, this fails and the queries get re-audited rather than
  * silently re-hashed.
  */
class TableSchemaSpec extends AnyFunSuite {
  import TestSpark.spark

  private val expected: Map[String, String] = Map(
    "region"     -> "r_regionkey:int, r_name:string",
    "nation"     -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer"   -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
                     "c_acctbal:double, c_mktsegment:string"),
    "supplier"   -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part"       -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
                     "p_size:int, p_retailprice:double"),
    "orders"     -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
                     "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem"   -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
                     "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
                     "l_discount:double, l_tax:double, l_returnflag:string, " +
                     "l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events"     -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
                     "event_type:string, value:double, props:string"),
    "documents"  -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int"
  )

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(d).isDirectory)

  test("at least one testdata SF dir exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs — harness layout changed")
  }

  for (dir <- sfDirs; name <- Tables.all)
    test(s"engine-facing schema pinned: $name @ ${dir.split('/').last}") {
      val got = Tables(spark, dir, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got == expected(name),
        s"\nDRIVER TESTDATA SCHEMA DRIFT on '$name' ($dir):" +
        s"\n  expected: ${expected(name)}\n  got:      $got" +
        "\nIf the new type is intentional, normalize it in Tables.apply" +
        " (engine contract) or re-pin here AND re-audit every query" +
        " touching the changed column.")
    }
}
