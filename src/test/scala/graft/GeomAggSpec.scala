package graft

import graft.functions.{GeomAggregators => GA, WktCore}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Geometry aggregates (r13): the dissolve and hull-of-group UDAFs must
  * return the SAME canonical text under every fold shape — reduce order,
  * merge order, and partition count are all execution accidents. */
class GeomAggSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  // a 3×3 tiling of [0,3]² plus one overlapping square — the dissolve
  // must return the 3×3 square text-exactly from ANY fold order
  private val tiles: Seq[String] =
    (for (i <- 0 until 3; j <- 0 until 3)
      yield s"POLYGON (($i $j, ${i + 1} $j, ${i + 1} ${j + 1}, " +
        s"$i ${j + 1}, $i $j))") :+
      "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"

  private val square3 =
    "POLYGON ((0.0 0.0, 3.0 0.0, 3.0 3.0, 0.0 3.0, 0.0 0.0))"

  test("geometry_union_agg dissolve is fold-order invariant") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val shuffled = rnd.shuffle(tiles)
      for (parts <- Seq(1, 3, 7)) {
        val got = shuffled.toDF("g").repartition(parts)
          .agg(GA.geometryUnion($"g").as("u"))
          .collect().head.getString(0)
        assert(got == square3, s"trial $trial parts $parts: $got")
      }
    }
    // sequential fold through the raw Aggregator agrees too
    val seq = tiles.foldLeft(GA.unionOf.zero)(GA.unionOf.reduce)
    assert(GA.unionOf.finish(seq) == square3)
  }

  test("geometry_union_agg: disjoint groups, EMPTY and NULL inputs") {
    val rows = Seq(
      ("a", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      ("a", "POLYGON ((5 0, 6 0, 6 1, 5 1, 5 0))"),
      ("a", "POLYGON EMPTY"),
      ("b", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("b", null))
    val got = rows.toDF("k", "g").groupBy($"k")
      .agg(GA.geometryUnion($"g").as("u"))
      .orderBy($"k").collect()
    val ua = got(0).getString(1)
    assert(ua.startsWith("MULTIPOLYGON"), ua)
    assert(WktCore.area(u(ua)) == 2.0)
    assert(WktCore.area(u(got(1).getString(1))) == 4.0)
  }

  test("convex_hull_agg: hull of group, collinear carry, loud degenerate") {
    // points that stay collinear until the last row arrives
    val rows = Seq(
      ("a", "POINT (0 0)"), ("a", "POINT (1 1)"), ("a", "POINT (2 2)"),
      ("a", "POINT (2 0)"),
      ("b", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      ("b", "POINT (9 2)"))
    val got = rows.toDF("k", "g").groupBy($"k")
      .agg(GA.convexHull($"g").as("h")).orderBy($"k").collect()
    assert(got(0).getString(1) ==
      "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 0.0))", got(0).getString(1))
    // square + an outlier point: 5-vertex hull
    assert(WktCore.area(u(got(1).getString(1))) == 16.0 + 0.5 * 5 * 4)
    // an all-collinear group is loud, like st_convexhull
    val e = intercept[org.apache.spark.SparkException] {
      Seq(("c", "POINT (0 0)"), ("c", "POINT (1 1)"))
        .toDF("k", "g").groupBy($"k")
        .agg(GA.convexHull($"g").as("h")).collect()
    }
    assert(e.getMessage.contains("collinear") ||
      e.getCause != null && e.getCause.getMessage.contains("collinear"))
  }

  test("st_boundary renders rings closed and measurable") {
    val donut =
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    val b = WktCore.boundaryWkt(u(donut)).toString
    assert(b.startsWith("MULTILINESTRING"), b)
    assert(WktCore.length(u(b)) == 16.0 + 8.0)
    assert(WktCore.boundaryWkt(u("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toString ==
      "LINESTRING (0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0)")
    assert(WktCore.boundaryWkt(u("POLYGON EMPTY")).toString ==
      "LINESTRING EMPTY")
  }
}
