package graft

import graft.presto.PrestoSql

/** Judge round-5 scratch probe — DELETE AFTER USE. */
class JudgeScratchSpec extends SparkSpec {

  test("multi-arg UNNEST of two EMPTY arrays must produce zero rows (Presto)") {
    val rows = PrestoSql.sql(spark,
      """SELECT x, y FROM (VALUES (ARRAY[], ARRAY[])) AS t(a, b)
        |CROSS JOIN UNNEST(a, b) AS u(x, y)""".stripMargin)
      .collect()
    assert(rows.isEmpty, s"expected 0 rows, got ${rows.length}: ${rows.mkString(";")}")
  }

  test("spark sequence(1, 0) behavior probe") {
    val s = spark.sql("SELECT sequence(1, 0) AS s").collect().head.getSeq[Int](0)
    info(s"sequence(1,0) = $s")
    assert(s.isEmpty || s.nonEmpty) // always passes; info line is the probe
  }
}
