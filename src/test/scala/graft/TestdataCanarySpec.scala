package graft

import org.apache.spark.sql.types._

/** Whole-testdata drift canary (companion to TsEncodingSpec's events
  * canary): the driver regenerates `/root/testdata` between rounds and
  * has already changed a physical encoding twice (BASELINE.md §7).
  * This spec pins the COLUMN CONTRACT the library actually depends on
  * — presence + broad type family, deliberately looser than exact
  * types so int32↔int64 or float↔double regenerations don't false-
  * alarm — and fails with the table.column and found type, so a drift
  * is diagnosed from one test name instead of a pile of downstream
  * analysis exceptions.
  */
class TestdataCanarySpec extends SparkSpec {

  private sealed trait Family { def ok(t: DataType): Boolean }
  private case object Integral extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Num extends Family {
    def ok(t: DataType): Boolean = t.isInstanceOf[NumericType]
  }
  private case object Str extends Family {
    def ok(t: DataType): Boolean = t == StringType
  }
  private case object TimeLike extends Family {
    // raw scans may surface naive encodings; loaders normalize
    def ok(t: DataType): Boolean = t match {
      case TimestampType | TimestampNTZType | DateType | LongType => true
      case _ => false
    }
  }
  private case object NumArray extends Family {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(e, _) => e.isInstanceOf[NumericType]
      case _ => false
    }
  }

  private val contract: Map[String, Seq[(String, Family)]] = Map(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Num,
      "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Num),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Str,
      "p_brand" -> Str, "p_type" -> Str, "p_size" -> Num,
      "p_retailprice" -> Num),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Num,
      "o_orderdate" -> TimeLike, "o_orderpriority" -> Str),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Num, "l_extendedprice" -> Num,
      "l_discount" -> Num, "l_tax" -> Num, "l_returnflag" -> Str,
      "l_linestatus" -> Str, "l_shipdate" -> TimeLike),
    "events" -> Seq("event_id" -> Integral, "ts" -> TimeLike,
      "user_id" -> Integral, "event_type" -> Str, "value" -> Num,
      "props" -> Str),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
      "lang" -> Str, "source" -> Str, "n_chars" -> Num),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> NumArray,
      "label" -> Num))

  test("CANARY: every testdata table still satisfies the column " +
      "contract the library depends on") {
    val drifted = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = graft.io.Tables.table(spark, sfDir, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (c, fam) =>
        byName.get(c) match {
          case None => Some(s"$table.$c: MISSING (have: " +
            schema.fieldNames.mkString(", ") + ")")
          case Some(t) if !fam.ok(t) => Some(s"$table.$c: $t not in $fam")
          case _ => None
        }
      }
    }
    assert(drifted.isEmpty,
      "testdata drifted — fix the loaders (BASELINE.md §7 policy):\n" +
        drifted.mkString("\n"))
  }

  test("CANARY: documents.text is pure ASCII (media oracles equate " +
      "codepoint with byte)") {
    // q_media_neardup / q_frame_features oracle the FakeCodec byte
    // pipeline through DuckDB CHARACTER functions — sound only while
    // UTF-8 encoding is the identity on the corpus. If this trips, the
    // testdata gained multi-byte characters: switch those oracles to
    // blob functions (or drop to rows-only) rather than loosening this.
    import org.apache.spark.sql.functions._
    val nonAscii = graft.io.Tables.documents(spark, sfDir)
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L,
      s"$nonAscii documents contain non-ASCII text")
  }
}
