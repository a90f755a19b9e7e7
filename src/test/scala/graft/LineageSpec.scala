package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Lineage

/** The dbt-docs parity artifact: lineage is derived from analyzed plans,
  * so these assertions pin that the derivation sees the real upstreams —
  * if a KPI view gains or loses a source table, this spec moves with it
  * only via the actual code change, never a stale declaration. */
class LineageSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "graft-lineage-test")
  val sfDir = "/root/testdata/sf0.001"

  test("every KPI view has at least one physical upstream table") {
    val edges = Lineage.kpiEdges(spark, sfDir)
    val views = graft.kpi.Kpi.registerAll(spark, sfDir)
    views.foreach { v =>
      val ups = edges.filter(_._1 == v).map(_._2)
      assert(ups.exists(u => !u.startsWith("generated:")),
        s"$v reads no physical table: $ups")
    }
  }

  test("headcount and resignations views read orders; expense views read orders+lineitem") {
    val edges = Lineage.kpiEdges(spark, sfDir).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(edges("vw_kpi_monthly_headcount").contains("orders"))
    assert(edges("vw_kpi_monthly_resignations").contains("orders"))
    assert(edges.keys.filter(_.contains("expense")).nonEmpty)
    edges.filter(_._1.contains("expense")).foreach { case (v, ups) =>
      assert(ups.contains("lineitem") || ups.contains("orders"),
        s"$v upstreams: $ups")
    }
  }

  test("lineage is a 2-layer DAG: tables at layer 0, views above") {
    val edges = Lineage.kpiEdges(spark, sfDir)
    val layers = Lineage.layers(edges)
    assert(layers.length === 2, s"expected tables->views, got $layers")
    val views = graft.kpi.Kpi.registerAll(spark, sfDir).toSet
    assert(layers(0).forall(n => !views.contains(n)), "a view sits at layer 0")
    assert(views.subsetOf(layers(1).toSet), "a view is missing from layer 1")
  }

  test("docs artifact is valid JSON with every view present") {
    val json = Lineage.docsJson(spark, sfDir)
    // minimal structural check without a JSON lib: balanced and parseable
    // by the same escaping contract Verify's oracle dump uses
    assert(json.startsWith("{\"nodes\": [") && json.endsWith("]}"))
    graft.kpi.Kpi.registerAll(spark, sfDir).foreach(v =>
      assert(json.contains("\"" + v + "\""), s"docs missing $v"))
    val out = java.nio.file.Files.createTempDirectory("graft_lineage")
    Lineage.writeDocs(spark, sfDir, s"$out/lineage.json")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/lineage.json")) === json)
  }
}
