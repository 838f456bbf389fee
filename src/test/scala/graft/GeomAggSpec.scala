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
    // an all-collinear group degenerates Trino-style as of r16: the
    // segment between the lexicographic extremes (r13-r15 threw)
    val deg = Seq(("c", "POINT (0 0)"), ("c", "POINT (1 1)"),
        ("d", "POINT (5 6)"), ("d", "POINT (5 6)"))
      .toDF("k", "g").groupBy($"k")
      .agg(GA.convexHull($"g").as("h")).orderBy($"k").collect()
    assert(deg(0).getString(1) == "LINESTRING (0.0 0.0, 1.0 1.0)",
      deg(0).getString(1))
    assert(deg(1).getString(1) == "POINT (5.0 6.0)", deg(1).getString(1))
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

  test("st_boundary of line kinds: OGC mod-2 endpoints; points have an " +
      "empty boundary (r14)") {
    // open line: the two terminals as a sorted MULTIPOINT
    assert(WktCore.boundaryWkt(u("LINESTRING (1 0, 0 0)")).toString ==
      "MULTIPOINT ((0.0 0.0), (1.0 0.0))")
    // closed line: EMPTY (each endpoint counts twice)
    assert(WktCore.boundaryWkt(
      u("LINESTRING (0 0, 1 0, 1 1, 0 0)")).toString == "MULTIPOINT EMPTY")
    // elbow multiline: the shared endpoint cancels mod-2
    assert(WktCore.boundaryWkt(
      u("MULTILINESTRING ((0 0, 1 0), (1 0, 1 1))")).toString ==
      "MULTIPOINT ((0.0 0.0), (1.0 1.0))")
    // T-junction: mod-2 counts ENDPOINTS only — all four are boundary
    assert(WktCore.numGeometries(u(WktCore.boundaryWkt(
      u("MULTILINESTRING ((0 0, 2 0), (1 0, 1 1))")).toString)) == 4)
    assert(WktCore.boundaryWkt(u("POINT (3 4)")).toString ==
      "GEOMETRYCOLLECTION EMPTY")
  }

  test("geometry_union_agg over MIXED dimensions emits a collection; " +
      "covered parts are absorbed (r14)") {
    // polygon + line inside + line outside + point inside + point
    // outside (twice — exact dedupe)
    val rows = Seq(
      "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))",
      "LINESTRING (1 1, 3 1)", // inside → absorbed
      "LINESTRING (0 5, 4 5)", // outside → kept
      "POINT (2 1)", // inside → absorbed
      "POINT (7 7)", "POINT (7 7)" // outside, duplicated → one survivor
    ).map(("k", _))
    val got = rows.toDF("k", "g").groupBy($"k")
      .agg(GA.geometryUnion($"g").as("u")).collect()(0).getString(1)
    assert(got ==
      "GEOMETRYCOLLECTION (POLYGON ((0.0 0.0, 4.0 0.0, 4.0 2.0, " +
        "0.0 2.0, 0.0 0.0)), LINESTRING (0.0 5.0, 4.0 5.0), " +
        "POINT (7.0 7.0))", got)
    // a point ON a kept line is absorbed by it; reversed duplicate
    // chains dedupe through the canonical direction
    val rows2 = Seq(
      "LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 0 0)",
      "POINT (1 0)", "MULTIPOINT ((5 5), (1 0))").map(("k", _))
    val got2 = rows2.toDF("k", "g").groupBy($"k")
      .agg(GA.geometryUnion($"g").as("u")).collect()(0).getString(1)
    assert(got2 ==
      "GEOMETRYCOLLECTION (LINESTRING (0.0 0.0, 2.0 0.0), " +
        "POINT (5.0 5.0))", got2)
    // all-areal groups keep the r13 plain-polygon output (no wrapper)
    val rows3 = Seq(
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))").map(("k", _))
    val got3 = rows3.toDF("k", "g").groupBy($"k")
      .agg(GA.geometryUnion($"g").as("u")).collect()(0).getString(1)
    assert(got3.startsWith("POLYGON"), got3)
    assert(WktCore.area(u(got3)) == 2.0)
  }
}
