package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Network-address analytics for log/crawl pipelines — IPv4 math as plain
  * integer columns (an address IS a 32-bit integer; keeping it one makes
  * every comparison codegen'd and engine-exact).
  */
object NetTools {

  /** Dotted-quad string → numeric address. NULL for anything that isn't
    * four in-range octets (quarantine contract, never a throw). */
  def ipv4ToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    // regex-guard BEFORE the cast: ANSI mode throws on a junk octet, and
    // the quarantine contract is NULL, never a task failure
    val octs = (0 to 3).map { i =>
      val raw = element_at(parts, i + 1)
      when(raw.rlike("^[0-9]{1,3}$"), raw.cast("long"))
    }
    when(size(parts) === 4 &&
      octs.map(o => o.isNotNull && o <= 255).reduce(_ && _),
      octs.reduce((acc, o) => acc * 256 + o))
  }

  /** Longest-prefix CIDR classification — the GeoIP/allowlist lookup of
    * every access-log pipeline, with REAL router semantics: when networks
    * nest, the most specific (longest prefix) containing range wins.
    *
    * `nets` is (name, network address, prefix length), driver-side because
    * routing tables are dimension-sized; it broadcasts, so the fact
    * stream is never shuffled for the join itself. A row can match
    * several nested ranges (≤ nesting depth, a small constant), and the
    * winner is resolved by ONE skinny regroup on `rowIdCol` carrying
    * (prefix_len, net) pairs — max(struct) picks the longest prefix
    * deterministically (ties impossible: equal-length prefixes cannot
    * nest). Unmatched rows keep a NULL net (left join), so the caller
    * decides the default-route policy. Returns the skinny
    * (rowId, net, prefix_len) mapping — callers join it back (or, for
    * aggregates, never need to: group the mapping directly). */
  def cidrLookup(df: DataFrame, ipLongCol: String, rowIdCol: String,
      nets: Seq[(String, Long, Int)]): DataFrame = {
    require(nets.nonEmpty, "need at least one network")
    require(nets.forall { case (_, _, p) => p >= 0 && p <= 32 }, "prefix in [0,32]")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = nets.map { case (name, addr, plen) =>
      val span = 1L << (32 - plen)
      val lo = (addr / span) * span // normalize a sloppy network address
      (name, plen.toLong, lo, lo + span - 1)
    }.toDF("__net", "__plen", "__lo", "__hi")
    val matches = df.join(broadcast(dim),
      col(ipLongCol) >= col("__lo") && col(ipLongCol) <= col("__hi"), "left")
    matches.groupBy(col(rowIdCol))
      .agg(max(struct(col("__plen"), col("__net"))).as("__best"))
      .select(col(rowIdCol), col("__best.__net").as("net"),
        col("__best.__plen").as("prefix_len"))
  }
}
