package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structure-preserving N× scale-up of a driver testdata dir — the
  * sf1.0 spot-probe generator (dev tool, like Bench/BenchOne; see
  * SCALE.md §"sf1.0 spot-probe").
  *
  * Design: replica r of each fact table gets a DISJOINT key space
  * (`id + r·10^9`) and, for text columns, a per-replica ALPHABET
  * ROTATION (letters rotate by r within their case class, digits rotate
  * mod 10; punctuation/space fixed). A character bijection preserves
  * every within-replica relation the engine's text operators consume —
  * gram/token distinctness, set sizes, Jaccard, equality, length — so
  * each replica's answer to a similarity/dedup query is IDENTICAL to
  * the source SF's, while cross-replica token/gram domains are disjoint
  * (no spurious cross-replica pairs, and corpus token frequencies stay
  * per-replica). Expected output of per-pair queries at N× is therefore
  * EXACTLY N× the source count — a precise scale-cliff detector, not a
  * statistical one. Embeddings rotate their dimensions by r (cosine-
  * invariant within a replica, decorrelated across). Dimension tables
  * (nation/region) are NOT replicated — fixed cardinality, like real
  * dims — so star-join group counts stay fixed while fact mass scales.
  *
  * Usage: runMain graft.MakeScale <srcSfDir> <destDir> <n>
  */
object MakeScale {

  private val Off = 1000000000L

  /** Per-replica character bijection as a single codegen translate(). */
  private def rot(c: Column, r: Int): Column = {
    val lower = ('a' to 'z').mkString
    val upper = ('A' to 'Z').mkString
    val digit = ('0' to '9').mkString
    def shift(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    translate(c, lower + upper + digit,
      shift(lower, r) + shift(upper, r) + shift(digit, r))
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, nStr) = args.take(3)
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.ts passes through OPAQUELY in whatever flavor the source
    // generation carries (nanos int64 <= r8, micros TIMESTAMP_NTZ >= r9);
    // consumers normalize via Tables.normalizeTs. The legacy conf makes
    // the nanos vintage readable as raw int64 and is harmless otherwise,
    // so set it ONCE up front.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.load(spark, src, name)
      (0 until n).map(r => f(base, r)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }

    replicate("documents") { (d, r) =>
      d.select((col("doc_id") + r * Off).as("doc_id"),
        rot(col("text"), r).as("text"), col("lang"), col("source"),
        col("n_chars"))
    }
    replicate("embeddings") { (d, r) =>
      // rotate dims by r: ||.|| and dot products within a replica are
      // unchanged; cross-replica cosines decorrelate
      val e = if (r % 64 == 0) col("embedding")
        else concat(slice(col("embedding"), r % 64 + 1, 64 - r % 64),
          slice(col("embedding"), 1, r % 64))
      d.select((col("vec_id") + r * Off).as("vec_id"), e.as("embedding"),
        col("label"))
    }
    replicate("events") { (d, r) =>
      d.select((col("event_id") + r * Off).as("event_id"), col("ts"),
        (col("user_id") + r * Off).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }
    replicate("customer") { (d, r) =>
      d.select((col("c_custkey") + r * Off).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }
    replicate("orders") { (d, r) =>
      d.select((col("o_orderkey") + r * Off).as("o_orderkey"),
        (col("o_custkey") + r * Off).as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    }
    replicate("lineitem") { (d, r) =>
      d.select((col("l_orderkey") + r * Off).as("l_orderkey"),
        (col("l_partkey") + r * Off).as("l_partkey"),
        (col("l_suppkey") + r * Off).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    replicate("supplier") { (d, r) =>
      d.select((col("s_suppkey") + r * Off).as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }
    replicate("part") { (d, r) =>
      d.select((col("p_partkey") + r * Off).as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }
    Seq("nation", "region").foreach { name => // fixed dims: copy once
      Tables.load(spark, src, name)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    println(s"[makescale] wrote $dst at ${n}x $src")
    spark.stop()
  }
}
