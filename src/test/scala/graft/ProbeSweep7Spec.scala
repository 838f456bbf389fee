package graft

import graft.presto.PrestoSql
import org.scalatest.funsuite.AnyFunSuite

/** SCRATCH probe harness for r16 sweep 7 — prints resolution failures
  * over the remaining published PrestoDB/Trino pages (color, Teradata,
  * URL, IP, HMAC/binary, PrestoDB array/map extras, JSON helpers,
  * listagg, remaining geospatial accessors). Deleted or folded into
  * DialectCanarySpec once the gaps are adjudicated. */
class ProbeSweep7Spec extends SparkSpec {
  test("sweep 7 probes: print failures") {
    val probes = Seq(
      // color page
      "bar(0.75, 10)",
      "render(true)",
      "rgb(255, 0, 0)",
      "color('red')",
      "color('#ff0000')",
      // Teradata / string extras
      "char2hexint('A')",
      "word_stem('marcher', 'fr')",
      "format('%s-%03d', 'x', 7)",
      "format_number(123456)",
      "strpos('aXbXc', 'X', 2)",
      "strrpos('aXbXc', 'X')",
      "strrpos('aXbXc', 'X', 1)",
      "from_utf8(to_utf8('ab'))",
      "from_utf8(X'61FF62', '?')",
      "normalize('a', NFKC)",
      "levenshtein('abc','abd')",
      // regex extras
      "regexp_count('a1b2c3', '[0-9]')",
      "regexp_position('a1b2c3', '[0-9]')",
      "regexp_position('a1b2c3', '[0-9]', 3)",
      "regexp_position('a1b2c3', '[0-9]', 1, 2)",
      "regexp_replace('abc', '(b)', x -> upper(x[1]))",
      "regexp_split('a1b2c', '[0-9]')",
      "regexp_extract_all('a1b2', '[0-9]')",
      "regexp_extract('a1b2', '([a-z])([0-9])', 2)",
      "regexp_like('abc', 'b')",
      // datetime remaining
      "parse_datetime('2020/01/02', 'yyyy/MM/dd')",
      "format_datetime(TIMESTAMP '2020-01-02 03:04:05', 'yyyy-MM-dd HH:mm')",
      "at_timezone(TIMESTAMP '2020-01-02 03:04:05', 'America/New_York')",
      "with_timezone(TIMESTAMP '2020-01-02 03:04:05', 'America/New_York')",
      "from_iso8601_timestamp('2020-01-02T03:04:05Z')",
      "from_iso8601_date('2020-01-02')",
      "from_iso8601_timestamp_nanos('2020-01-02T03:04:05.123456789Z')",
      "current_timezone()",
      "timezone(TIMESTAMP '2020-01-02 03:04:05')",
      "date_format(TIMESTAMP '2020-01-02 03:04:05', '%Y-%m-%d')",
      "date_parse('2020-01-02', '%Y-%m-%d')",
      "to_unixtime(TIMESTAMP '2020-01-02 03:04:05')",
      // url page
      "url_extract_host('https://h:8080/p?q=1#f')",
      "url_extract_path('https://h:8080/p?q=1#f')",
      "url_extract_port('https://h:8080/p?q=1#f')",
      "url_extract_protocol('https://h:8080/p?q=1#f')",
      "url_extract_query('https://h:8080/p?q=1#f')",
      "url_extract_fragment('https://h:8080/p?q=1#f')",
      "url_extract_parameter('https://h/p?q=1&r=2', 'r')",
      // ip page
      "ip_prefix('192.168.255.255', 9)",
      "ip_subnet_min('192.64.0.0/9')",
      "ip_subnet_max('192.64.0.0/9')",
      "ip_subnet_range('192.64.0.0/9')",
      "is_subnet_of('192.64.0.0/9', '192.144.1.2')",
      "is_subnet_of('192.64.0.0/9', '192.64.0.0/10')",
      "is_private_ip('10.0.0.1')",
      // hmac / hash / binary
      "hmac_md5(to_utf8('m'), to_utf8('k'))",
      "hmac_sha1(to_utf8('m'), to_utf8('k'))",
      "hmac_sha256(to_utf8('m'), to_utf8('k'))",
      "hmac_sha512(to_utf8('m'), to_utf8('k'))",
      "md5(to_utf8('abc'))",
      "sha1(to_utf8('abc'))",
      "sha256(to_utf8('abc'))",
      "sha512(to_utf8('abc'))",
      "xxhash64(to_utf8('abc'))",
      "to_base64url(to_utf8('ab?cd'))",
      "from_base64url(to_base64url(to_utf8('ab')))",
      "to_base32(to_utf8('ab'))",
      "from_base32(to_base32(to_utf8('ab')))",
      "to_base64(to_utf8('ab'))",
      "from_base64(to_base64(to_utf8('ab')))",
      "to_hex(to_utf8('ab'))",
      "from_hex('6162')",
      "reverse(to_utf8('ab'))",
      "lpad(to_utf8('ab'), 4, to_utf8('0'))",
      "rpad(to_utf8('ab'), 4, to_utf8('0'))",
      "substr(to_utf8('abcd'), 2, 2)",
      "length(to_utf8('abcd'))",
      "concat(to_utf8('a'), to_utf8('b'))",
      // PrestoDB array extras
      "array_cum_sum(ARRAY[1, 2, 3])",
      "array_frequency(ARRAY[1, 1, 2])",
      "array_least_frequent(ARRAY[1, 1, 2])",
      "array_least_frequent(ARRAY[1, 1, 2, 2, 3], 2)",
      "array_max_by(ARRAY['a', 'bbb'], x -> length(x))",
      "array_min_by(ARRAY['a', 'bbb'], x -> length(x))",
      "array_sort_desc(ARRAY[1, 3, 2])",
      "array_split_into_chunks(ARRAY[1,2,3,4,5], 2)",
      "remove_nulls(ARRAY[1, NULL, 2])",
      "array_position(ARRAY[1,2,1], 1, 2)",
      "array_remove(ARRAY[1,2,1], 1)",
      "find_first(ARRAY[1,2,3], x -> x > 1)",
      "find_first_index(ARRAY[1,2,3], x -> x > 1)",
      "any_match(ARRAY[1,2], x -> x > 1)",
      "all_match(ARRAY[1,2], x -> x > 0)",
      "none_match(ARRAY[1,2], x -> x > 5)",
      "slice(ARRAY[1,2,3,4], 2, 2)",
      "sequence(DATE '2020-01-01', DATE '2020-01-05', INTERVAL '2' DAY)",
      "sequence(1, 9, 3)",
      // PrestoDB map extras
      "map_remove_null_values(map(ARRAY['a','b'], ARRAY[1, NULL]))",
      "map_key_exists(map(ARRAY['a'], ARRAY[1]), 'a')",
      "map_keys_by_top_n_values(map(ARRAY['a','b'], ARRAY[1,2]), 1)",
      "map_subset(map(ARRAY['a','b'], ARRAY[1,2]), ARRAY['a','z'])",
      "all_keys_match(map(ARRAY['ab'], ARRAY[1]), k -> length(k) = 2)",
      "any_keys_match(map(ARRAY['ab'], ARRAY[1]), k -> length(k) = 2)",
      "no_keys_match(map(ARRAY['ab'], ARRAY[1]), k -> length(k) = 9)",
      "any_values_match(map(ARRAY['a'], ARRAY[1]), v -> v = 1)",
      "no_values_match(map(ARRAY['a'], ARRAY[1]), v -> v = 9)",
      "map_filter(map(ARRAY['a'], ARRAY[1]), (k,v) -> v > 0)",
      "transform_keys(map(ARRAY['a'], ARRAY[1]), (k,v) -> upper(k))",
      "transform_values(map(ARRAY['a'], ARRAY[1]), (k,v) -> v + 1)",
      // json helpers
      "is_json_scalar('1')",
      "json_array_contains('[1,2]', 2)",
      "json_array_length('[1,2]')",
      "json_size('{\"a\":{\"b\":1}}', '$.a')",
      "json_parse('[1,2]')",
      "json_format(json_parse('[1,2]'))",
      "json_extract_scalar('{\"a\":1}', '$.a')",
      // aggregates / window odds
      "listagg('x', ',') WITHIN GROUP (ORDER BY 1)",
      "geometric_mean(2.0)",
      "kurtosis(2.0)",
      "skewness(2.0)",
      "bitwise_and_agg(7)",
      "bitwise_or_agg(7)",
      "bool_and(true)",
      "bool_or(true)",
      "every(true)",
      "arbitrary('x')",
      "any_value('x')",
      "max_by('a', 1, 2)",
      "min_by('a', 1, 2)",
      // session / misc
      "version()",
      "current_catalog",
      "current_schema",
      "current_user",
      "uuid()",
      "fail('boom')",
      // geospatial accessors possibly missing
      "ST_IsValid(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "geometry_invalid_reason(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "ST_ExteriorRing(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "ST_NumInteriorRing(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "ST_InteriorRingN(ST_GeometryFromText('POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'), 1)",
      "ST_PointN(ST_GeometryFromText('LINESTRING (0 0, 1 1, 2 2)'), 2)",
      "ST_StartPoint(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_EndPoint(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_GeometryN(ST_GeometryFromText('MULTIPOINT (0 0, 1 1)'), 1)",
      "ST_NumGeometries(ST_GeometryFromText('MULTIPOINT (0 0, 1 1)'))",
      "ST_X(ST_GeometryFromText('POINT (1 2)'))",
      "ST_Y(ST_GeometryFromText('POINT (1 2)'))",
      "ST_XMin(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_XMax(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_YMin(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_YMax(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_CoordDim(ST_GeometryFromText('POINT (1 2)'))",
      "ST_Dimension(ST_GeometryFromText('POINT (1 2)'))",
      "ST_GeometryType(ST_GeometryFromText('POINT (1 2)'))",
      "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 10 0)'), ST_GeometryFromText('POINT (3 1)'))",
      "line_interpolate_point(ST_GeometryFromText('LINESTRING (0 0, 10 0)'), 0.3)",
      "line_interpolate_points(ST_GeometryFromText('LINESTRING (0 0, 10 0)'), 0.4)",
      "great_circle_distance(36.12, -86.67, 33.94, -118.40)",
      "geometry_union(ARRAY[ST_GeometryFromText('POINT (0 0)'), ST_GeometryFromText('POINT (1 1)')])",
      "simplify_geometry(ST_GeometryFromText('LINESTRING (0 0, 1 0, 2 0)'), 0.5)",
      "ST_Boundary(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_Points(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
      "ST_Length(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))")
    val bad = probes.flatMap { ex =>
      try { PrestoSql.sql(spark, s"SELECT ${ex} AS v").collect(); None }
      catch { case t: Throwable =>
        Some(ex + "  ==>  " + Option(t.getMessage).getOrElse(t.toString)
          .linesIterator.take(2).mkString(" | ").take(200)) }
    }
    println("==== SWEEP7 FAILURES (" + bad.size + "/" + probes.size + ") ====")
    bad.foreach(b => println("FAIL: " + b))
    println("==== END SWEEP7 ====")
  }

  test("sweep 7 value sanity") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  strrpos('aXbXcX', 'X', 2) AS sr2,
        |  strrpos('aXbXcX', 'X', 4) AS sr4,
        |  regexp_position('a1b22c3', '[0-9]+', 1, 2) AS rp2,
        |  regexp_position('a1b22c3', '[0-9]+', 4, 1) AS rp_s4,
        |  regexp_position('abc', '[0-9]', 1, 1) AS rp_none,
        |  ip_subnet_min('192.64.0.0/9') AS smin,
        |  ip_subnet_max('192.64.0.0/9') AS smax,
        |  is_subnet_of('192.64.0.0/9', '192.144.1.2') AS iso1,
        |  is_subnet_of('192.64.0.0/9', '192.64.0.0/10') AS iso2,
        |  is_subnet_of('192.64.0.0/9', '192.0.0.0/8') AS iso3,
        |  array_position(ARRAY[7,8,7,7], 7, 2) AS ap2,
        |  array_position(ARRAY[7,8,7,7], 7, -1) AS apm1,
        |  array_position(ARRAY[7,8], 9, 1) AS ap0,
        |  array_join(array_least_frequent(ARRAY[3,3,1,2,2]), ',') AS alf,
        |  array_join(array_least_frequent(ARRAY[3,3,1,2,2], 2), ',') AS alf2,
        |  find_first(ARRAY[1,5,9], x -> x > 3) AS ff,
        |  find_first_index(ARRAY[1,5,9], x -> x > 3) AS ffi,
        |  find_first(ARRAY[1,2], x -> x > 9) AS ffn,
        |  map_key_exists(map(ARRAY['a'], ARRAY[1]), 'b') AS mke,
        |  cardinality(map_subset(map(ARRAY['a','b'], ARRAY[1,2]),
        |    ARRAY['a','z'])) AS msub,
        |  CAST(from_iso8601_timestamp_nanos(
        |    '2020-01-02T03:04:05.123456789') AS STRING) AS nanos,
        |  geometry_union(ARRAY['POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))',
        |    'POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))']) AS gu
        |""".stripMargin).head()
    assert(r.getLong(0) == 4L, "sr2=" + r.getLong(0))
    assert(r.getLong(1) == 0L, "sr4=" + r.getLong(1))
    assert(r.getLong(2) == 4L, "rp2=" + r.getLong(2))
    assert(r.getLong(3) == 4L, "rp_s4=" + r.getLong(3))
    assert(r.getLong(4) == -1L)
    assert(r.getString(5) == "192.0.0.0") // /9 canonical base: bit 9 of .64. is 0
    assert(r.getString(6) == "192.127.255.255", r.getString(6))
    assert(!r.getBoolean(7))
    assert(r.getBoolean(8))
    assert(!r.getBoolean(9))
    assert(r.getLong(10) == 3L)
    assert(r.getLong(11) == 4L)
    assert(r.getLong(12) == 0L)
    assert(r.getString(13) == "1")
    assert(r.getString(14) == "1,2", r.getString(14))
    assert(r.getInt(15) == 5)
    assert(r.getLong(16) == 2L)
    assert(r.isNullAt(17))
    assert(!r.getBoolean(18))
    assert(r.getInt(19) == 1)
    assert(r.getString(20) == "2020-01-02 03:04:05.123456", r.getString(20))
    assert(r.getString(21).startsWith("POLYGON"), r.getString(21))
    // weighted approx_percentile → exact percentile with frequency
    spark.sql("SELECT CAST(x AS DOUBLE) AS x, w FROM VALUES (1.0, 1), (10.0, 3) AS t(x, w)")
      .createOrReplaceTempView("wp_t")
    val wp = PrestoSql.sql(spark,
      "SELECT approx_percentile(x, w, 0.5) AS p FROM wp_t").head()
    assert(wp.getDouble(0) == 10.0, wp.getDouble(0))
    val acc = PrestoSql.sql(spark,
      "SELECT approx_percentile(x, 0.5, 0.01) AS p FROM wp_t").head()
    assert(acc.getDouble(0) >= 1.0)
  }

  test("sweep 7 agg probes over a table") {
    val aggProbes = Seq(
      "listagg(c, ',') WITHIN GROUP (ORDER BY c)",
      "geometric_mean(x)",
      "kurtosis(x)",
      "skewness(x)",
      "bitwise_and_agg(k)",
      "bitwise_or_agg(k)",
      "bitwise_xor_agg(k)",
      "bool_and(k > 0)",
      "every(k > 0)",
      "arbitrary(c)",
      "any_value(c)",
      "max_by(c, x, 2)",
      "min_by(c, x, 2)",
      "approx_distinct(c)",
      "approx_distinct(c, 0.01)",
      "approx_percentile(x, 0.5)",
      "approx_percentile(x, ARRAY[0.25, 0.75])",
      "approx_percentile(x, k, 0.5)",
      "geometry_union_agg(g)",
      "convex_hull_agg(g)")
    spark.sql(
      """SELECT * FROM VALUES (1, 2.0, 'a', 'POINT (0 0)'),
        |  (3, 4.0, 'b', 'POINT (2 2)') AS t(k, x, c, g)""".stripMargin)
      .createOrReplaceTempView("probe_t")
    val bad = aggProbes.flatMap { ex =>
      try {
        PrestoSql.sql(spark, s"SELECT ${ex} AS v FROM probe_t").collect()
        None
      } catch { case t: Throwable =>
        Some(ex + "  ==>  " + Option(t.getMessage).getOrElse(t.toString)
          .linesIterator.take(2).mkString(" | ").take(200)) }
    }
    println("==== SWEEP7 AGG FAILURES (" + bad.size + "/" + aggProbes.size + ") ====")
    bad.foreach(b => println("FAIL: " + b))
    println("==== END SWEEP7 AGG ====")
  }
}
