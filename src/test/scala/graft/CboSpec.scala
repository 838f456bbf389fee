package graft

import org.apache.spark.sql.functions._

/** Stats collection + cost-based optimization (the `ANALYZE TABLE`
  * surface — VERDICT r2 missing item 6). Spark's CBO consumes catalog
  * statistics written by ANALYZE TABLE; temp views carry no catalog
  * stats, so this exercises real managed tables in a scratch warehouse.
  *
  * What's asserted, in dependency order:
  *  1. ANALYZE TABLE COMPUTE STATISTICS populates rowCount/sizeInBytes
  *     into the catalog, and the optimizer's plan stats reflect them.
  *  2. ANALYZE ... FOR COLUMNS records per-column NDV/min/max.
  *  3. With CBO on, the optimizer's cardinality estimate for a selective
  *     filter+join is driven by those column stats (estimate shrinks far
  *     below the unfiltered row count — the signal join reordering needs).
  */
class CboSpec extends SparkSpec {
  private lazy val s = SparkSpec.spark

  private def setup(): Unit = {
    if (!s.catalog.tableExists("cbo_orders")) {
      // clear any orphaned location from a previous aborted run (the
      // in-memory catalog forgets the table, the warehouse dir survives)
      Seq("cbo_orders", "cbo_customer").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          rm(loc)
        }
      }
      Tables.orders(s, sf).write.mode("overwrite").saveAsTable("cbo_orders")
      Tables.customer(s, sf).write.mode("overwrite").saveAsTable("cbo_customer")
      s.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_custkey, o_orderstatus")
      s.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")
    }
  }

  test("ANALYZE TABLE populates catalog stats the optimizer sees") {
    setup()
    val actual = s.table("cbo_orders").count()
    // plan-level rowCount is only propagated by the cost-based visitor
    val prev = s.conf.get("spark.sql.cbo.enabled", "false")
    s.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = s.table("cbo_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == actual),
        s"optimizer rowCount=${stats.rowCount} actual=$actual")
      assert(stats.sizeInBytes > 0)
    } finally s.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("column-level stats record NDV and bounds") {
    setup()
    val desc = s.sql("DESCRIBE EXTENDED cbo_orders o_custkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("distinct_count").exists(_.toLong > 0), desc.toString)
    assert(desc.get("min").exists(_ != "NULL"))
    assert(desc.get("max").exists(_ != "NULL"))
  }

  test("CBO uses column stats: selective-filter join estimate shrinks") {
    setup()
    val prevCbo = s.conf.get("spark.sql.cbo.enabled", "false")
    val prevReorder = s.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val q = s.sql(
        """SELECT c.c_mktsegment, COUNT(*) AS n
          |FROM cbo_orders o JOIN cbo_customer c ON o.o_custkey = c.c_custkey
          |WHERE o.o_orderstatus = 'F'
          |GROUP BY c.c_mktsegment""".stripMargin)
      val joinNode = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.head
      val est = joinNode.stats.rowCount
      val unfiltered = s.table("cbo_orders").count()
      assert(est.isDefined, "CBO should produce a rowCount estimate for the join")
      assert(est.get.toLong < unfiltered,
        s"estimate ${est.get} should reflect the o_orderstatus filter (< $unfiltered)")
      // and the query still answers correctly with CBO active
      assert(q.collect().map(_.getLong(1)).sum ==
        s.sql("""SELECT COUNT(*) FROM cbo_orders o JOIN cbo_customer c
                |ON o.o_custkey = c.c_custkey WHERE o.o_orderstatus = 'F'"""
          .stripMargin).collect().head.getLong(0))
    } finally {
      s.conf.set("spark.sql.cbo.enabled", prevCbo)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }
}
