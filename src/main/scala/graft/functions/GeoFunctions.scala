package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial starter family (r3 verdict missing #5) — the lat/lon
  * primitives a Presto `ST_*`/`great_circle_distance` user reaches for
  * first, composed from codegen'd builtins (sin/cos/asin/sqrt), no UDF.
  *
  * Cross-engine determinism: every step is either an IEEE-exact operation
  * (+ − × ÷ sqrt) or a libm-style transcendental (sin/cos/asin) that
  * agrees with other engines to ~1 ulp; consumers that need byte-stable
  * results across engines quantize the final distance (the sc21 query
  * emits floor(km·1e6 + 0.5)). Expression shapes below are written to
  * match the oracle SQL text operation-for-operation so association
  * order (and therefore rounding) is identical on both engines.
  */
object GeoFunctions {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm = 6371.0088

  private def rad(deg: Column): Column = deg * lit(math.Pi / 180.0)

  /** Great-circle (haversine) distance in km between two lat/lon points
    * in degrees — Presto's great_circle_distance argument order
    * (lat1, lon1, lat2, lon2). `least(a, 1)` clamps the half-chord
    * against floating drift before asin. */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val sdp = sin((rad(lat2) - rad(lat1)) / 2)
    val sdl = sin((rad(lon2) - rad(lon1)) / 2)
    val a = sdp * sdp + cos(rad(lat1)) * cos(rad(lat2)) * sdl * sdl
    lit(2 * EarthRadiusKm) * asin(sqrt(least(a, lit(1.0))))
  }

  /** Axis-aligned bounding-box containment (inclusive bounds) — the
    * ST_Contains(ST_MakeEnvelope(…), point) fast path. */
  def inBbox(lat: Column, lon: Column,
      latMin: Double, lonMin: Double, latMax: Double, lonMax: Double): Column =
    lat >= lit(latMin) && lat <= lit(latMax) &&
      lon >= lit(lonMin) && lon <= lit(lonMax)
}
