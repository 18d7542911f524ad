package graft.operators

import graft.SparkSpec
import graft.api.{ColumnSelection, IngestError}
import graft.core.Tables

/** R1–R6 (SURVEY.md §2.2) + B7 minimum-slice fixture. */
class ExporterSpec extends SparkSpec {

  private def resolve: Exporter.Resolver = Tables.load(spark, sf, _)

  test("B7: comma-join customer x orders on c_custkey = o_custkey") {
    val df = Exporter.buildQuery(
      ColumnSelection(
        "customer",
        Seq("c_name", "o_totalprice"),
        Seq("orders"),
        Some("customer.c_custkey = orders.o_custkey")),
      resolve)
    assert(df.columns.toSeq == Seq("c_name", "o_totalprice"))
    assert(df.count() == Tables.load(spark, sf, "orders").count())
  }

  test("comma-join with equality predicate plans as a real join, not cartesian") {
    val df = Exporter.buildQuery(
      ColumnSelection(
        "customer",
        Seq("c_name", "o_totalprice"),
        Seq("orders"),
        Some("customer.c_custkey = orders.o_custkey")),
      resolve)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"))
  }

  test("projection preserves request order") {
    val df = Exporter.buildQuery(
      ColumnSelection("customer", Seq("c_acctbal", "c_name")), resolve)
    assert(df.columns.toSeq == Seq("c_acctbal", "c_name"))
  }

  test("theta predicate produces theta-join semantics") {
    val df = Exporter.buildQuery(
      ColumnSelection(
        "region", Seq("r_name", "n_name"), Seq("nation"),
        Some("region.r_regionkey < nation.n_regionkey")),
      resolve)
    // 5 regions x 25 nations, keys 0..4 each side x5 → sum_{r<n} pairs
    assert(df.count() == 50)
  }

  test("join_tables without condition falls back to single-table select (main.py:178-180)") {
    // The reference builds the comma-join only when BOTH join_tables and
    // join_condition are present; otherwise it's a plain SELECT on the base
    // table — NOT an unfiltered cartesian product.
    val df = Exporter.buildQuery(
      ColumnSelection("nation", Seq("n_name"), Seq("region"), None), resolve)
    assert(df.count() == 25)
    assert(Exporter.renderSql(
      ColumnSelection("nation", Seq("n_name"), Seq("region"), None)) ==
      "SELECT n_name FROM nation")
  }

  test("condition ignored when join_tables empty (reference parity main.py:178)") {
    val df = Exporter.buildQuery(
      ColumnSelection("nation", Seq("n_name"), Nil, Some("n_nationkey < 0")),
      resolve)
    assert(df.count() == 25) // filter NOT applied — matches reference behavior
  }

  test("invalid table name rejected") {
    intercept[IngestError.InvalidTableName] {
      Exporter.buildQuery(ColumnSelection("bad-name", Seq("x")), resolve)
    }
    intercept[IngestError.InvalidTableName] {
      Exporter.buildQuery(
        ColumnSelection("customer", Seq("x"), Seq("1bad"), Some("1=1")), resolve)
    }
  }

  test("export envelope: empty result short-circuits with message") {
    val r = Exporter.export(
      spark,
      ColumnSelection(
        "orders", Seq("o_orderkey"), Seq("customer"),
        Some("orders.o_totalprice < 0 AND orders.o_custkey = customer.c_custkey")),
      resolve)
    assert(r.count == 0 && r.data == "" && r.message == "No data found")
  }

  test("renderSql matches the reference's string shapes") {
    assert(
      Exporter.renderSql(ColumnSelection("t", Seq("a", "b"))) == "SELECT a, b FROM t")
    assert(
      Exporter.renderSql(
        ColumnSelection("t", Seq("a"), Seq("u", "v"), Some("t.x = u.y"))) ==
        "SELECT a FROM t, u, v WHERE t.x = u.y")
  }
}
