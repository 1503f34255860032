package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract checks on the query registry itself: SparkEntry concatenates
  * per-domain maps with flatMap(...).toMap, where a duplicate name would
  * silently shadow an earlier query and an oracle without a query would
  * silently never be checked. */
class RegistrySpec extends AnyFunSuite with Matchers {

  private val registries = Seq(
    RefQueries, RelationalQueries, TextQueries, DedupQueries,
    AnnQueries, MultimodalQueries, EventQueries, TemporalQueries,
    GraphQueries, GovernanceQueries)

  test("no query name collides across registries") {
    val all = registries.flatMap(_.defs.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    dups shouldBe empty
    SparkEntry.queries.size shouldBe all.size
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    orphans shouldBe empty
  }

  test("every oracle aliases its ORDER BY deterministically (has one)") {
    // hash compare needs a total order; an oracle without ORDER BY would
    // pass or fail by accident of DuckDB's scan order. Global aggregates
    // that provably emit a single row are exempt.
    val singleRowAggregates = Set("dedup_exact_stats", "events_key_skew",
      "corpus_drift_tv", "events_chi2_type_dow", "join_bloom_semi",
      "events_did_lift", "graph_assortativity", "sql_tpch_q6",
      "events_ab_srm", "sql_tpch_q17", "sql_tpch_q19",
      "events_cramers_v")
    val unordered = SparkEntry.oracleSql.filterNot(_._2.toUpperCase
      .contains("ORDER BY")).keys.toSet -- singleRowAggregates
    unordered shouldBe empty
  }
}
