package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Contract checks on the query registry itself: SparkEntry concatenates
  * per-domain maps with flatMap(...).toMap, where a duplicate name would
  * silently shadow an earlier query and an oracle without a query would
  * silently never be checked. */
class RegistrySpec extends SparkSpec {

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
    // pass or fail by accident of DuckDB's scan order. The exemption is
    // SHAPE-based, not a name list: a query is exempt iff its own Spark
    // plan PROVES at most one output row (maxRows <= 1 — a global
    // aggregate with no grouping, however projected), in which case any
    // row order is the total order. A name list here grew once per new
    // 1-row statistic and proved nothing about the query it named.
    val unordered = SparkEntry.oracleSql.filterNot(_._2.toUpperCase
      .contains("ORDER BY")).keys.toSet
    val notProvablySingleRow = unordered.filterNot { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      qe.analyzed.maxRows.orElse(qe.optimizedPlan.maxRows).exists(_ <= 1L)
    }
    notProvablySingleRow shouldBe empty
  }
}
