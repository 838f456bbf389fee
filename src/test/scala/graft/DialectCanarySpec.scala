package graft

import graft.presto.PrestoSql
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-surface canary (r13): ~90 published Trino function
  * spellings must keep resolving through PrestoSql. The probe that
  * built this list found eight gaps (closed in the dialect) and the
  * DOCUMENTED scope-outs: destructure_/construct_tdigest (they expose
  * Trino's internal centroid layout) and bare `localtime` (Spark has
  * no TIME type); the spooky_hash_v2_* / murmur3 wire hashes scoped
  * out here in r13–r16 closed in r17 as native expressions (p2ak +
  * WireHashSpec). Sweep 6 (r16, 61
  * probes) closed the last inverse-CDF page plus tdigest_agg /
  * scale_qdigest / bare localtimestamp. Sweep 7 (r16, 159 probes)
  * closed the COLOR page, the CIDR subnet family, base32, the
  * occurrence forms, and the generic-array helpers r13 had scoped out
  * (they went in as inline rewrites, not temp functions); word_stem
  * beyond 'en' is its loud scope-out, and timezone() closed as the
  * session zone (the pinned-zone contract: zoneless instants carry
  * the session zone by definition). */
class DialectCanarySpec extends SparkSpec {
  test("published Trino spellings resolve through the dialect") {
    val probes = Seq(
      "ngrams(ARRAY['a','b','c'], 2)",
      "map_top_n(map(ARRAY['a','b'], ARRAY[1,2]), 1)",
      "map_top_n_keys(map(ARRAY['a','b'], ARRAY[1,2]), 1)",
      "map_top_n_values(map(ARRAY['a','b'], ARRAY[1,2]), 1)",
      "array_top_n(ARRAY[3,1,2], 2)",
      "array_has_duplicates(ARRAY[1,1,2])",
      "array_duplicates(ARRAY[1,1,2])",
      "array_intersect(ARRAY[1,2], ARRAY[2,3])",
      "array_union(ARRAY[1,2], ARRAY[2,3])",
      "array_except(ARRAY[1,2], ARRAY[2,3])",
      "arrays_overlap(ARRAY[1,2], ARRAY[2,3])",
      "array_normalize(ARRAY[3.0,4.0], 2)",
      "array_average(ARRAY[1.0,2.0])",
      "array_sum(ARRAY[1,2])",
      "levenshtein_distance('abc','abd')",
      "hamming_distance('abc','abd')",
      "mismatches('abc','abd')",
      "soundex('Robert')",
      "translate('abc','ab','xy')",
      "concat_ws('-','a','b')",
      "luhn_check('79927398713')",
      "from_base('ff', 16)",
      "to_base(255, 16)",
      "cosine_similarity(map(ARRAY['a'],ARRAY[1.0]), map(ARRAY['a'],ARRAY[1.0]))",
      "dot_product(map(ARRAY['a'],ARRAY[1.0]), map(ARRAY['a'],ARRAY[1.0]))",
      "beta_cdf(2.0, 3.0, 0.5)",
      "inverse_beta_cdf(2.0, 3.0, 0.5)",
      "normal_cdf(0.0, 1.0, 1.0)",
      "inverse_normal_cdf(0.0, 1.0, 0.5)",
      "wilson_interval_lower(10, 100, 1.96)",
      "wilson_interval_upper(10, 100, 1.96)",
      "binomial_cdf(10, 0.5, 5)",
      "poisson_cdf(3.0, 2)",
      "cauchy_cdf(0.0, 1.0, 0.5)",
      "chi_squared_cdf(2.0, 1.0)",
      "f_cdf(2.0, 3.0, 1.5)",
      "gamma_cdf(2.0, 3.0, 1.5)",
      "laplace_cdf(0.0, 1.0, 0.5)",
      "weibull_cdf(1.0, 1.0, 0.5)",
      "inverse_weibull_cdf(1.0, 1.0, 0.5)",
      "truncate(3.78)",
      "cosh(1.0)", "sinh(1.0)", "tanh(1.0)",
      "infinity()", "nan()",
      "index('hello','l')",
      "starts_with('abc','ab')", "ends_with('abc','bc')",
      "codepoint('A')", "chr(65)",
      "url_encode('a b')", "url_decode('a%20b')",
      "to_milliseconds(INTERVAL '2' SECOND)",
      "parse_duration('5m')",
      "human_readable_seconds(96)",
      "date_diff('day', DATE '2020-01-01', DATE '2020-02-01')",
      "date_add('day', 3, DATE '2020-01-01')",
      "last_day_of_month(DATE '2020-02-10')",
      "week(DATE '2020-02-10')", "week_of_year(DATE '2020-02-10')",
      "quarter(DATE '2020-02-10')",
      "millisecond(TIMESTAMP '2020-01-01 00:00:00.123')",
      "timezone_hour(TIMESTAMP '2020-01-01 00:00:00')",
      "timezone_minute(TIMESTAMP '2020-01-01 00:00:00')",
      "crc32(to_utf8('abc'))",
      "from_big_endian_64(to_big_endian_64(42))",
      "reverse('abc')", "normalize('à')",
      "word_stem('running')",
      "split_to_multimap('a=1,a=2', ',', '=')",
      "multimap_from_entries(ARRAY[ROW('a',1),ROW('a',2)])",
      "map_from_entries(ARRAY[ROW('a',1)])",
      "map_entries(map(ARRAY['a'],ARRAY[1]))",
      "map_normalize(map(ARRAY['a','b'],ARRAY[1.0,3.0]))",
      "map_zip_with(map(ARRAY['a'],ARRAY[1]), map(ARRAY['a'],ARRAY[2]), (k,v1,v2)->v1+v2)",
      "flatten(ARRAY[ARRAY[1],ARRAY[2]])",
      "zip(ARRAY[1],ARRAY['a'])",
      "zip_with(ARRAY[1],ARRAY[2],(x,y)->x+y)",
      "repeat('ab', 2)",
      "bit_count(7, 64)",
      "bitwise_and(5, 3)", "bitwise_or(5, 3)", "bitwise_xor(5, 3)",
      "bitwise_not(5)",
      "typeof(1)")
    val bad = probes.filter { ex =>
      try { PrestoSql.sql(spark, s"SELECT $ex AS v").collect(); false }
      catch { case _: Throwable => true }
    }
    assert(bad.isEmpty, s"spellings no longer resolving: ${bad.mkString("; ")}")
    // spot-check the r13 closures' VALUES, not just resolution
    val r = PrestoSql.sql(spark,
      """SELECT mismatches('abc','abd') AS m,
        |  index('hello','l') AS i,
        |  ends_with('abc','bc') AS e,
        |  dot_product(map(ARRAY['a','b'], ARRAY[2.0, 3.0]),
        |    map(ARRAY['a','b'], ARRAY[4.0, 5.0])) AS dp,
        |  millisecond(TIMESTAMP '2020-01-01 00:00:00.123') AS ms,
        |  timezone_hour(TIMESTAMP '2020-01-01 00:00:00') AS tzh,
        |  inverse_weibull_cdf(1.0, 2.0, 0.5) AS iw
        |""".stripMargin).head()
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 3L)
    assert(r.getBoolean(2))
    assert(r.getDouble(3) == 23.0)
    assert(r.getLong(4) == 123L)
    assert(r.getLong(5) == 0L) // session zone is UTC in tests
    assert(r.getDouble(6) == 2.0 * math.log(2.0), r.getDouble(6))
  }

  test("r15 probe sweep 5: VALUE pins for spellings that resolved unpinned") {
    // resolution probes prove a spelling parses; this sweep pins the
    // VALUES against Trino's documented examples — the silent-wrongness
    // guard for the long tail
    def one(q: String) = PrestoSql.sql(spark, s"SELECT $q AS v").head()
    // repeat is Trino's ARRAY constructor (not string repetition)
    assert(one("array_join(repeat(7, 3), ',')").getString(0) == "7,7,7")
    // split: LITERAL delimiter ('.' must not behave as a regex), and
    // the limit form keeps the remainder in the last slot
    assert(one("array_join(split('a.b.c', '.'), '|')").getString(0)
      == "a|b|c")
    assert(one("array_join(split('a-b-c', '-', 2), '|')").getString(0)
      == "a|b-c")
    // ngrams: overlapping n-grams in order
    assert(one("array_join(transform(ngrams(ARRAY['a','b','c'], 2)," +
      " g -> array_join(g, '')), ',')").getString(0) == "ab,bc")
    // 3-arg strpos: the Nth occurrence
    assert(one("strpos('ababa', 'a', 2)").getLong(0) == 3L)
    assert(one("strpos('ababa', 'a', 4)").getLong(0) == 0L)
    // element_at accepts negative indexes (from the end)
    assert(one("element_at(ARRAY[10, 20, 30], -1)").getInt(0) == 30)
    // to/from_base round-trip + luhn
    assert(one("to_base(255, 16)").getString(0) == "ff")
    assert(one("from_base('ff', 16)").getLong(0) == 255L)
    assert(one("luhn_check('79927398713')").getBoolean(0))
    assert(!one("luhn_check('79927398714')").getBoolean(0))
    // zip pairs positionally, shorter side null-padded (field names are
    // positional `0`/`1` — Trino's ROW fields are anonymous too, so no
    // dot-access migration trap exists)
    assert(one("array_join(transform(zip(ARRAY[1, 2], ARRAY['a']), " +
      "p -> concat(CAST(p.`0` AS VARCHAR), coalesce(p.`1`, '_')))," +
      " ',')").getString(0) == "1a,2_")
    // width_bucket 4-arg edges: below range → 0, above → buckets+1
    assert(one("width_bucket(-1.0, 0.0, 10.0, 5)").getLong(0) == 0L)
    assert(one("width_bucket(11.0, 0.0, 10.0, 5)").getLong(0) == 6L)
    // to_iso8601 / from_iso8601 round trips — sweep-5 FINDING: the old
    // TIMESTAMP-typed temp fn rendered DATE args as midnight timestamps;
    // now a native dual-dispatch expression (the cosine pattern)
    assert(one("to_iso8601(DATE '2020-01-02')").getString(0)
      == "2020-01-02")
    assert(one("to_iso8601(TIMESTAMP '2024-03-01 12:30:45.125')")
      .getString(0) == "2024-03-01T12:30:45.125")
    assert(one("CAST(from_iso8601_date('2020-01-02') AS VARCHAR)")
      .getString(0) == "2020-01-02")
    // MySQL-style date_format/date_parse mirror each other
    assert(one("date_format(TIMESTAMP '2020-01-02 03:04:05', " +
      "'%Y-%m-%d %H:%i:%s')").getString(0) == "2020-01-02 03:04:05")
    assert(one("CAST(date_parse('2020-01-02 03:04:05', " +
      "'%Y-%m-%d %H:%i:%s') AS VARCHAR)").getString(0)
      == "2020-01-02 03:04:05")
    // json accessors on the documented examples
    assert(one("json_array_get('[10, 20, 30]', 1)").getString(0) == "20")
    assert(one("json_extract_scalar('{\"a\": {\"b\": 7}}', '$.a.b')")
      .getString(0) == "7")
    assert(one("json_size('{\"a\": {\"b\": 1, \"c\": 2}}', '$.a')")
      .getLong(0) == 2L)
    // great_circle_distance: the Trino docs' worked example (km)
    val gcd = one("great_circle_distance(36.12, -86.67, 33.94, -118.40)")
      .getDouble(0)
    assert(math.abs(gcd - 2886.4) < 0.5, gcd)
    // line_locate_point / line_interpolate_point are inverse on the
    // simple fixture
    assert(one("line_locate_point(ST_GeometryFromText(" +
      "'LINESTRING (0 0, 4 0)'), ST_GeometryFromText('POINT (1 0)'))")
      .getDouble(0) == 0.25)
    assert(one("ST_AsText(line_interpolate_point(ST_GeometryFromText(" +
      "'LINESTRING (0 0, 4 0)'), 0.25))").getString(0)
      == "POINT (1.0 0.0)")
  }

  test("r15 probe-sweep-4 closures: array_histogram, 2-arg width_bucket, numeric typed literals") {
    // the fourth published-spelling sweep (111 probes) found exactly
    // three gaps; each is closed and value-checked here
    val r = PrestoSql.sql(spark,
      """SELECT
        |  array_histogram(ARRAY[1, 1, 2]) AS ah,
        |  array_histogram(ARRAY[CAST(NULL AS BIGINT)]) AS ah_null,
        |  width_bucket(3.0, ARRAY[1.0, 2.0, 4.0]) AS wb_mid,
        |  width_bucket(0.5, ARRAY[1.0, 2.0, 4.0]) AS wb_below,
        |  width_bucket(9.0, ARRAY[1.0, 2.0, 4.0]) AS wb_above,
        |  width_bucket(3.5, 0.0, 10.0, 5) AS wb4,
        |  DOUBLE '1.5' + 1 AS dlit,
        |  TINYINT '7' AS tlit,
        |  BIGINT '123' AS blit,
        |  CAST(REAL '1.5' AS DOUBLE) AS rlit
        |""".stripMargin).head()
    assert(r.getMap[Long, Long](0) == Map(1L -> 2L, 2L -> 1L))
    assert(r.getMap[Long, Long](1) == Map.empty[Long, Long])
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(4) == 3L)
    assert(r.getLong(5) == 2L) // Spark's own 4-arg equal-width form
    assert(r.getDouble(6) == 2.5)
    assert(r.getByte(7) == 7)
    assert(r.getLong(8) == 123L)
    assert(r.getDouble(9) == 1.5)
    // typed-literal keywords inside STRING literals stay untouched
    assert(PrestoSql.sql(spark,
      "SELECT 'a REAL ''thing''' AS v").head().getString(0) ==
      "a REAL 'thing'")
  }

  test("cosine_similarity / dot_product dual forms: ARRAY dense + MAP sparse (r15)") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  cosine_similarity(ARRAY[1e0, 0e0], ARRAY[0e0, 1e0]) AS cs_orth,
        |  cosine_similarity(ARRAY[3e0, 4e0], ARRAY[3e0, 4e0]) AS cs_self,
        |  dot_product(ARRAY[1e0, 2e0, 3e0], ARRAY[4e0, 5e0, 6e0]) AS dp,
        |  dot_product(ARRAY[1.0, 2.0], ARRAY[3.0, 4.0]) AS dp_dec,
        |  cosine_similarity(map(ARRAY['a','b'], ARRAY[1e0, 2e0]),
        |    map(ARRAY['b','c'], ARRAY[3e0, 4e0])) AS cs_map,
        |  dot_product(map(ARRAY['a','b'], ARRAY[2.0, 3.0]),
        |    map(ARRAY['a','b'], ARRAY[4.0, 5.0])) AS dp_map
        |""".stripMargin).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 1.0, r.getDouble(1)) // dot==nx==ny==25 exactly
    assert(r.getDouble(2) == 32.0)
    assert(r.getDouble(3) == 11.0) // decimal literals widen per element
    // map form: dot = 2*3 over the shared key 'b'; norms sqrt(5)*sqrt(25)
    assert(math.abs(r.getDouble(4) -
      6.0 / (math.sqrt(5.0) * 5.0)) < 1e-15, r.getDouble(4))
    assert(r.getDouble(5) == 23.0) // the pre-r15 temp-fn value, unchanged
    // zero-norm cosine is NaN (IEEE 0/0), both forms
    assert(PrestoSql.sql(spark,
      "SELECT cosine_similarity(ARRAY[0e0], ARRAY[1e0]) AS v")
      .head().getDouble(0).isNaN)
    // length mismatch and NULL elements are loud in the dense form
    intercept[Exception] { PrestoSql.sql(spark,
      "SELECT dot_product(ARRAY[1e0], ARRAY[1e0, 2e0]) AS v").collect() }
    intercept[Exception] { PrestoSql.sql(spark,
      "SELECT cosine_similarity(ARRAY[1e0, CAST(NULL AS DOUBLE)]," +
        " ARRAY[1e0, 2e0]) AS v").collect() }
    // embeddings-style float arrays work (the migration case)
    val f = PrestoSql.sql(spark,
      "SELECT dot_product(transform(ARRAY[1e0, 2e0], x -> CAST(x AS REAL))," +
        " transform(ARRAY[3e0, 4e0], x -> CAST(x AS REAL))) AS v").head()
    assert(f.getDouble(0) == 11.0)
  }

  test("syntax spellings resolve: bare FROM UNNEST, DECIMAL literals, quantifiers, YOW (r13)") {
    // Trino syntax probes closed this round; the known loud scope-outs
    // are ROW-type cast field access (needs type-aware parsing) and
    // non-equality ALL/ANY quantifiers (no exact IN equivalent)
    val probes = Seq(
      "SELECT x FROM (VALUES 1, 2) AS t (x)",
      "SELECT e, o FROM UNNEST(ARRAY['a','b']) WITH ORDINALITY AS t (e, o)",
      "SELECT DECIMAL '1.5' + DECIMAL '2.5' AS v",
      "SELECT 1 WHERE 1 = ANY (SELECT 1)",
      "SELECT 1 WHERE 1 = SOME (SELECT 1)",
      "SELECT 1 WHERE 1 <> ALL (SELECT 2)",
      "SELECT extract(YOW FROM DATE '2020-01-01') AS v")
    val bad = probes.filter { q =>
      try { PrestoSql.sql(spark, q).collect(); false }
      catch { case _: Throwable => true } }
    assert(bad.isEmpty, bad.mkString("; "))
    // value checks
    val r1 = PrestoSql.sql(spark,
      "SELECT e, o FROM UNNEST(ARRAY['a','b']) WITH ORDINALITY AS t (e, o)")
      .orderBy("o").collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(r1.map(_.get(1).toString.toLong).toSeq == Seq(1L, 2L)) // 1-based
    val d = PrestoSql.sql(spark,
      "SELECT DECIMAL '1.25' + DECIMAL '2.50' AS v").head().getDecimal(0)
    assert(d.compareTo(new java.math.BigDecimal("3.75")) == 0, d)
    assert(PrestoSql.sql(spark,
      "SELECT extract(YOW FROM DATE '2021-01-01') AS v").head().getInt(0)
      == 2020) // Jan 1 2021 belongs to ISO week-year 2020
    assert(PrestoSql.sql(spark,
      "SELECT count(*) AS n FROM (SELECT 1 AS x) WHERE 1 = ANY (SELECT 1)")
      .head().getLong(0) == 1L)
    // TABLESAMPLE BERNOULLI/SYSTEM (r13): Trino's after-alias placement
    // hoists over the alias to Spark's before-alias form; the 100% and
    // 0% edges are deterministic
    assert(PrestoSql.sql(spark,
      "SELECT x FROM (VALUES (1), (2), (3)) AS t (x)" +
        " TABLESAMPLE BERNOULLI (100)").count() == 3L)
    assert(PrestoSql.sql(spark,
      "SELECT x FROM (VALUES (1), (2), (3)) AS t (x)" +
        " TABLESAMPLE SYSTEM (0)").count() == 0L)
  }

  test("datetime/string/json closures: from_unixtime zone form, strrpos, day_of_month, is_json_scalar (r13)") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  CAST(to_unixtime(from_unixtime(1577836800, 'UTC')) AS BIGINT)
        |    AS rt,
        |  hour(from_unixtime(1577836800, 'Asia/Kolkata')) AS h_kol,
        |  from_unixtime(1577836800) AS ts1,
        |  day_of_month(DATE '2020-02-10') AS dom,
        |  strrpos('ababab', 'ab') AS rp,
        |  strrpos('hello', 'x') AS rp0,
        |  is_json_scalar('1') AS js1,
        |  is_json_scalar('[1,2]') AS js2
        |""".stripMargin).head()
    assert(r.getLong(0) == 1577836800L)
    assert(r.get(1).toString.toLong == 5L) // 00:00 UTC = 05:30 Kolkata
    assert(r.getTimestamp(2).toInstant.getEpochSecond == 1577836800L)
    assert(r.getLong(3) == 10L)
    assert(r.getLong(4) == 5L && r.getLong(5) == 0L)
    assert(r.getBoolean(6) && !r.getBoolean(7))
    // the empty-needle edge stays loud
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT strrpos('abc', '') AS v").collect()
    }
    // the 3-arg offset form is DEFINED as of r15: the wall clock at a
    // fixed ±hh:mm offset (same instant-shift contract as the 2-arg
    // zone form); 4+ args stay loud
    val off = PrestoSql.sql(spark,
      "SELECT hour(from_unixtime(0, 5, 30)) AS h," +
        " minute(from_unixtime(0, 5, 30)) AS m," +
        " hour(from_unixtime(0, -3, -15)) AS hn," +
        " minute(from_unixtime(0, -3, -15)) AS mn").head()
    assert(off.get(0).toString.toInt == 5 && off.get(1).toString.toInt == 30)
    assert(off.get(2).toString.toInt == 20 && off.get(3).toString.toInt == 45)
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT from_unixtime(0, 5, 30, 1) AS v")
        .collect()
    }
  }

  test("URL accessors, base64url, NULL-sketch reads (r13)") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  url_extract_port('https://a.io:8080/p') AS port,
        |  url_extract_port('https://a.io/p') AS noport,
        |  url_extract_fragment('https://a.io/p#frag') AS frag,
        |  url_extract_parameter('https://a.io/p?q=1&r=2', 'r') AS param,
        |  to_base64url(to_utf8('a~~b?')) AS b64u,
        |  from_utf8(from_base64url(to_base64url(to_utf8('xyz')))) AS rt,
        |  value_at_quantile(NULL, 0.5) AS nullq
        |""".stripMargin).head()
    assert(r.getLong(0) == 8080L && r.isNullAt(1))
    assert(r.getString(2) == "frag" && r.getString(3) == "2")
    // URL-safe alphabet: '-' where standard base64 has '+'
    assert(r.getString(4) == "YX5-Yj8=")
    assert(r.getString(5) == "xyz" && r.isNullAt(6))
  }

  test("Trino literal faithfulness + lambda regexp_replace (r13)") {
    // Trino literals keep backslashes as REGULAR characters; without
    // the escape pre-pass Spark read '\d' as 'd' — the silent
    // wrong-pattern class for every migrated regex
    val r = PrestoSql.sql(spark,
      """SELECT
        |  regexp_like('a7', '\d') AS rl,
        |  length('a\b') AS len3,
        |  regexp_replace('new york', '(\w)(\w*)',
        |    x -> upper(x[1]) || x[2]) AS title,
        |  regexp_replace('a1b22c', '(\d+)',
        |    x -> concat('<', x[1], '>')) AS marks,
        |  'it''s' AS q
        |""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(r.get(1).toString.toLong == 3L)
    assert(r.getString(2) == "New York")
    assert(r.getString(3) == "a<1>b<22>c")
    assert(r.getString(4) == "it's")
    // lambda limits stay loud: anchored patterns, non-subscript uses
    intercept[Throwable] {
      PrestoSql.sql(spark,
        """SELECT regexp_replace('x', '^a', y -> y[1]) AS v""").collect()
    }
    intercept[Throwable] {
      PrestoSql.sql(spark,
        """SELECT regexp_replace('x', 'a', y -> upper(y)) AS v""").collect()
    }
  }

  test("aggregate spellings resolve with value checks; reduce_agg/numeric_histogram stay loud (r13)") {
    val rel = "(VALUES (1, 2.0, 'a', ARRAY[1, 2]), (3, 4.0, 'b'," +
      " ARRAY[2, 3]), (3, 6.0, 'a', ARRAY[3, 4])) AS t (x, y, s, arr)"
    // the full aggregate-spelling battery keeps resolving
    val aggs = Seq(
      "approx_distinct(x)", "approx_percentile(x, 0.5)",
      "approx_most_frequent(2, s, 10)", "arbitrary(x)", "any_value(x)",
      "bool_and(x > 0)", "bool_or(x > 1)", "every(x > 0)",
      "checksum(s)", "corr(x, y)", "count_if(x > 1)",
      "covar_pop(x, y)", "covar_samp(x, y)", "entropy(x)",
      "geometric_mean(y)", "histogram(s)", "kurtosis(y)", "skewness(y)",
      // map_agg needs distinct keys (Spark's dup-key policy is loud
      // where Trino picks arbitrarily — documented divergence)
      "map_agg(concat(s, CAST(x AS STRING)), x)",
      "map_union(map(ARRAY[s], ARRAY[x]))",
      "max_by(s, x)", "min_by(s, x)", "max_by(s, x, 2)", "min_by(s, x, 2)",
      "max(x, 2)", "min(x, 2)", "multimap_agg(s, x)",
      "regr_intercept(y, x)", "regr_slope(y, x)", "regr_r2(y, x)",
      "set_agg(s)", "set_union(arr)",
      "bitwise_and_agg(x)", "bitwise_or_agg(x)", "bitwise_xor_agg(x)")
    val bad = aggs.filter { a =>
      try { PrestoSql.sql(spark, s"SELECT $a AS v FROM $rel").collect(); false }
      catch { case _: Throwable => true } }
    assert(bad.isEmpty, s"aggregate spellings not resolving: ${bad.mkString("; ")}")
    // value checks on the r13 closures
    val r = PrestoSql.sql(spark,
      s"""SELECT
         |  entropy(x) AS ent,
         |  array_join(array_sort(set_agg(s)), ',') AS sa,
         |  array_join(array_sort(set_union(transform(arr,
         |    e -> CAST(e AS STRING)))), ',') AS su,
         |  array_join(transform(max(x, 2), e -> CAST(e AS STRING)), ',')
         |    AS top2,
         |  array_join(transform(min(x, 2), e -> CAST(e AS STRING)), ',')
         |    AS bot2,
         |  CAST(bitwise_and_agg(x) AS BIGINT) AS ba,
         |  CAST(bitwise_or_agg(x) AS BIGINT) AS bo,
         |  CAST(bitwise_xor_agg(x) AS BIGINT) AS bx
         |FROM $rel""".stripMargin).head()
    // counts (1,3,3): S=7, H = log2(7) − (0 + 2·3·log2 3)/7
    val expEnt = (math.log(7) / math.log(2)) -
      2 * 3 * (math.log(3) / math.log(2)) / 7
    assert(math.abs(r.getDouble(0) - expEnt) < 1e-12, r.getDouble(0))
    assert(r.getString(1) == "a,b")
    assert(r.getString(2) == "1,2,3,4")
    assert(r.getString(3) == "3,3" && r.getString(4) == "1,3")
    assert(r.getLong(5) == 1L && r.getLong(6) == 3L && r.getLong(7) == 1L)
    // map_union keeps one value per key, keys sorted in the rendering
    val mu = PrestoSql.sql(spark,
      s"""SELECT array_join(array_sort(transform(map_entries(map_union(
         |  map(ARRAY[s], ARRAY[x]))), e -> concat(e.key, '=', e.value))),
         |  ';') AS mu FROM $rel""".stripMargin).head().getString(0)
    assert(mu == "a=1;b=3", mu)
    // r14: the literal-lambda reduce_agg and 2-arg numeric_histogram
    // now TRANSLATE (p2af oracles them); value-check both here
    val ra = PrestoSql.sql(spark,
      s"SELECT reduce_agg(x, 0, (a, b) -> a + b, (a, b) -> a + b) AS v" +
        s" FROM $rel").head().getInt(0)
    assert(ra == 7, ra)
    val nhm = PrestoSql.sql(spark,
      s"SELECT numeric_histogram(2, y) AS v FROM $rel")
      .head().getMap[Double, Double](0)
    assert(nhm == Map(2.0 -> 1.0, 5.0 -> 2.0), nhm)
    // non-literal lambdas stay loud
    intercept[Throwable] {
      PrestoSql.sql(spark,
        s"SELECT reduce_agg(x, 0, some_fn, (a, b) -> a + b) FROM $rel")
        .collect()
    }
  }

  test("spherical geography spellings resolve: to_spherical_geography + geography ST_Distance (r13)") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  ST_Distance(to_spherical_geography(ST_Point(0, 0)),
        |              to_spherical_geography(ST_Point(1, 0))) AS d,
        |  ST_Area(to_spherical_geography(ST_GeometryFromText(
        |    'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))) AS a,
        |  ST_AsText(to_geometry(to_spherical_geography(
        |    ST_Point(10, 20)))) AS rt,
        |  great_circle_distance(0, 0, 0, 1) AS gc_km
        |""".stripMargin).head()
    // one degree of longitude at the equator: πR/180 m (R = 6371008.8)
    assert(math.abs(r.getDouble(0) - math.Pi * 6371008.8 / 180.0) < 1e-4)
    assert(r.getDouble(1) > 1.2e10 && r.getDouble(1) < 1.24e10)
    assert(r.getString(2) == "POINT (10.0 20.0)")
    // the dialect's km haversine agrees with the meters kernel
    assert(math.abs(r.getDouble(3) * 1000.0 - r.getDouble(0)) < 1e-6)
  }

  test("bing_tile_polygon / geometry_to_bing_tiles resolve with worked-example values (r13)") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  geometry_to_bing_tiles('POLYGON ((10 10, 20 10, 20 20, 10 20,
        |    10 10))', 1) AS cover,
        |  st_xmin(bing_tile_polygon(bing_tile(0, 0, 1))) AS w,
        |  st_xmax(bing_tile_polygon(bing_tile(0, 0, 1))) AS e,
        |  st_ymin(bing_tile_polygon(bing_tile(0, 0, 1))) AS s,
        |  st_ymax(bing_tile_polygon(bing_tile(0, 0, 1))) AS n
        |""".stripMargin).head()
    // a NE-quadrant rectangle at zoom 1 is covered by exactly tile (1,0)
    val cover = r.getSeq[org.apache.spark.sql.Row](0)
    assert(cover.length == 1 &&
      cover.head.getInt(0) == 1 && cover.head.getInt(1) == 0)
    // tile (0,0) at zoom 1: west −180, east 0 (exact dyadic bounds);
    // south = the equator, north = the Mercator clip latitude
    assert(r.getDouble(1) == -180.0 && r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(3)) < 1e-9)
    assert(math.abs(r.getDouble(4) - 85.05112878) < 1e-6)
  }

  test("WKB spellings resolve through the dialect: ST_AsBinary / ST_GeomFromBinary (r13)") {
    // native registrations carry Trino's exact names, so the geospatial
    // page's WKB pair runs unmodified through the dialect path
    val r = PrestoSql.sql(spark,
      """SELECT
        |  lower(to_hex(ST_AsBinary(ST_GeometryFromText('POINT (1 2)')))) AS h,
        |  ST_AsText(ST_GeomFromBinary(ST_AsBinary(
        |    ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))) AS rt
        |""".stripMargin).head()
    assert(r.getString(0) ==
      "0101000000000000000000f03f0000000000000040")
    assert(r.getString(1) ==
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))")
  }

  test("r16 ADVICE regressions: width_bucket NULLs, dot_product missing-key non-finites, whitespace-prefixed WKT") {
    // 2-arg width_bucket: NULL x returns NULL (Trino), never bucket 0
    assert(PrestoSql.sql(spark,
      "SELECT width_bucket(CAST(NULL AS DOUBLE), ARRAY[1.0, 2.0]) AS v")
      .head().isNullAt(0))
    // NULL bin bounds are Trino errors -- raised loud, not counted 0
    intercept[Throwable] {
      PrestoSql.sql(spark,
        "SELECT width_bucket(3.0, ARRAY[1.0, CAST(NULL AS DOUBLE)]) AS v")
        .head()
    }
    // map dot_product: a key MISSING from b contributes nothing even
    // when its a-value is non-finite (interpreted eval used to fold
    // Infinity * 0.0 sentinel = NaN while codegen skipped; both skip
    // now). Literal form exercises interpreted eval (constant folding);
    // the FROM-VALUES form keeps a column reference so whole-stage
    // codegen fires.
    val lit = PrestoSql.sql(spark,
      "SELECT dot_product(map(ARRAY['a'], ARRAY[infinity()]), " +
        "map(ARRAY['b'], ARRAY[1e0])) AS v").head().getDouble(0)
    assert(lit == 0.0, s"interpreted: $lit")
    val gen = spark.sql(
      "SELECT dot_product(map_from_arrays(array('a'), " +
        "array(cast('Infinity' as double) * v)), " +
        "map_from_arrays(array('b'), array(1.0d))) AS r " +
        "FROM VALUES (1.0d) t(v)")
      .head().getDouble(0)
    assert(gen == 0.0, s"codegen: $gen")
    // whitespace-prefixed WKT dispatches like the trimmed text: the
    // byte probes now skip tab/newline/CR, not just spaces
    val ws = PrestoSql.sql(spark,
      "SELECT ST_Intersects(ST_GeometryFromText(" +
        "'\t\nGEOMETRYCOLLECTION (POINT (1 1))'), " +
        "ST_GeometryFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS v")
      .head().getBoolean(0)
    assert(ws)
    // geometry_nearest_points tolerates a MULTIPOINT EMPTY GC member
    // (it used to crash in parseMultiPoint)
    val np = PrestoSql.sql(spark,
      "SELECT ST_AsText(geometry_nearest_points(ST_GeometryFromText(" +
        "'GEOMETRYCOLLECTION (MULTIPOINT EMPTY, POINT (0 0))'), " +
        "ST_GeometryFromText('POINT (3 4)'))[1]) AS v").head().getString(0)
    assert(np == "POINT (0.0 0.0)", np)
  }

  test("r16 probe sweep 6: inverse-CDF closure, tdigest/scale_qdigest, datetime/binary pins") {
    def one(q: String) = PrestoSql.sql(spark, s"SELECT $q AS v").head()
    // the six newly-closed inverses, pinned on worked values
    assert(one("inverse_poisson_cdf(3.0, 0.5)").getLong(0) == 3L)
    assert(one("inverse_poisson_cdf(100.0, 0.999999)").getLong(0) == 151L)
    assert(one("inverse_binomial_cdf(20, 0.5, 0.5)").getLong(0) == 10L)
    assert(one("inverse_binomial_cdf(1000, 0.25, 0.975)").getLong(0)
      == 277L)
    // χ²(2) median = 2·ln(2); cauchy q3 at (0,1) = tan(π/4) = 1;
    // laplace q1 at (0,1) = ln(0.5)
    assert(math.abs(one("inverse_chi_squared_cdf(2.0, 0.5)").getDouble(0)
      - 2 * math.log(2)) < 1e-12)
    assert(math.abs(one("inverse_cauchy_cdf(0.0, 1.0, 0.75)")
      .getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(one("inverse_laplace_cdf(0.0, 1.0, 0.25)")
      .getDouble(0) - math.log(0.5)) < 1e-12)
    // F round trip through the shared beta kernel
    assert(math.abs(one("f_cdf(2.0, 3.0, inverse_f_cdf(2.0, 3.0, 0.25))")
      .getDouble(0) - 0.25) < 1e-9)
    // domain errors stay loud
    intercept[Throwable] { one("inverse_poisson_cdf(3.0, 1.0)") }
    intercept[Throwable] { one("inverse_cauchy_cdf(0.0, -1.0, 0.5)") }
    // tdigest_agg is the same t-digest kernel; scale_qdigest scales
    // centroid weights, leaving quantile reads invariant; a
    // non-positive scale factor is loud
    val rows = PrestoSql.sql(spark,
      """SELECT value_at_quantile(qdigest_agg(c), 0.5) AS q,
        |  value_at_quantile(tdigest_agg(c), 0.5) AS t,
        |  value_at_quantile(scale_qdigest(qdigest_agg(c), 2.5), 0.5)
        |    AS sq
        |FROM (SELECT CAST(id AS DOUBLE) AS c
        |      FROM range(1, 101))""".stripMargin).head()
    assert(rows.getDouble(0) == rows.getDouble(1))
    assert(rows.getDouble(0) == rows.getDouble(2))
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT value_at_quantile(" +
        "scale_qdigest(qdigest_agg(c), 0.0), 0.5) AS v FROM " +
        "(SELECT CAST(id AS DOUBLE) AS c FROM range(1, 11))").head()
    }
    // bare localtimestamp parses (Trino spelling); bare localtime has
    // no Spark TIME type and stays loud — documented scope-out
    assert(!one("localtimestamp IS NULL").getBoolean(0))
    intercept[Throwable] { one("localtime") }
    // datetime/binary value pins from the published pages
    assert(one("soundex('Miller')").getString(0) == "M460")
    assert(one("word_stem('walking')").getString(0) == "walk")
    assert(one("crc32(to_utf8('CRC me!'))").getLong(0) == 38028046L)
    assert(one("bit_count(9, 64)").getLong(0) == 2L)
    assert(one("to_hex(to_big_endian_64(1234))").getString(0)
      == "00000000000004D2")
    assert(one("from_big_endian_64(to_big_endian_64(-7))").getLong(0)
      == -7L)
    assert(one("from_ieee754_32(to_ieee754_32(1.5))").getFloat(0) == 1.5f)
    assert(one("CAST(day_of_week(DATE '2022-03-07') AS BIGINT)")
      .getLong(0) == 1L) // ISO Monday
    assert(one("CAST(week(DATE '2020-07-01') AS BIGINT)")
      .getLong(0) == 27L)
    assert(one("CAST(date_trunc('week', TIMESTAMP " +
      "'2022-10-20 05:10:00') AS VARCHAR)").getString(0)
      == "2022-10-17 00:00:00")
    // destructure/construct_tdigest and the wire-format hashes stay
    // loud — documented scope-outs (engine-internal representations)
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT destructure_tdigest(tdigest_agg(c))" +
        " AS v FROM (SELECT CAST(id AS DOUBLE) AS c FROM range(1, 11))")
        .head()
    }
  }

  test("r16 probe sweep 7: the remaining published pages resolve") {
    // the seventh published-spelling sweep (159 probes over the COLOR,
    // Teradata, URL, IP, HMAC/binary, PrestoDB array/map-extra, JSON
    // and geospatial-accessor pages) found the gaps closed this round:
    // the COLOR page, the CIDR subnet family, base32, occurrence forms
    // (strrpos/regexp_position/array_position), find_first(+index),
    // array_least_frequent, map_key_exists/map_subset, the scalar
    // geometry_union fold, weighted approx_percentile, bare
    // current_catalog/current_schema, fail(), and
    // from_iso8601_timestamp_nanos. timezone() closed as the session
    // zone (zoneless instants carry the session zone under the
    // pinned-zone contract). Documented scope-outs that stay LOUD:
    // non-'en' word_stem languages (Snowball stemmers beyond Porter
    // are out of scope) and the wire-format hashes from earlier
    // sweeps.
    val probes = Seq(
      // color page
      "bar(0.75, 10)",
      "render(true)",
      "rgb(255, 0, 0)",
      "color('red')",
      "color('#ff0000')",
      // Teradata / string extras
      "char2hexint('A')",
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
    val bad = probes.filter { ex =>
      try { PrestoSql.sql(spark, s"SELECT $ex AS v").collect(); false }
      catch { case _: Throwable => true }
    }
    assert(bad.isEmpty, s"sweep-7 spellings not resolving: ${bad.mkString("; ")}")
    // the scope-outs stay loud, and fail() raises (its published job)
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT word_stem('marcher', 'fr') AS v").collect()
    }
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT fail('boom') AS v").collect()
    }
  }

  test("r16 sweep-7 value pins: occurrence forms, CIDR family, array/map extras") {
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
    // r16 review fixes: the INTEGER literal 1 is a legal degenerate
    // WEIGHT (typed dispatch — only decimal-spelled literals are
    // percentages), so this is the unweighted exact median, not a
    // 1.0-percentile
    val w1 = PrestoSql.sql(spark,
      "SELECT approx_percentile(x, 1, 0.5) AS p FROM wp_t").head()
    assert(w1.getDouble(0) == 5.5, w1.getDouble(0))
    // inverse_cauchy_cdf now guards p like its siblings
    intercept[Throwable] {
      PrestoSql.sql(spark,
        "SELECT inverse_cauchy_cdf(0.0, 1.0, 1.5) AS v").collect()
    }
    // scale_qdigest's factor guard fires on an EMPTY sketch too
    intercept[Throwable] {
      PrestoSql.sql(spark, "SELECT scale_qdigest(" +
        "CAST(array() AS ARRAY<DOUBLE>), -1.0) AS v").collect()
    }
    // find_first's single-scan form keeps the loud matched-NULL rule
    intercept[Throwable] {
      PrestoSql.sql(spark,
        "SELECT find_first(ARRAY[1, NULL, 3], x -> x IS NULL) AS v")
        .collect()
    }
  }

  test("r16 sweep-7 value pins: COLOR page escapes + RFC 4648 base32 vectors") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  color('#f00') AS c3,
        |  color('#ff0000') AS c6,
        |  color('red') AS cn,
        |  rgb(255, 0, 0) AS crgb,
        |  render(true) AS rt,
        |  render('hi', color('blue')) AS rv,
        |  bar(0.5, 4) AS b4,
        |  bar(0.0, 3) AS b0,
        |  to_base32(to_utf8('f')) AS e1,
        |  to_base32(to_utf8('fo')) AS e2,
        |  to_base32(to_utf8('foo')) AS e3,
        |  to_base32(to_utf8('foob')) AS e4,
        |  to_base32(to_utf8('fooba')) AS e5,
        |  to_base32(to_utf8('foobar')) AS e6,
        |  from_utf8(from_base32(to_base32(to_utf8('foobar')))) AS rt32
        |""".stripMargin).head()
    assert(r.getLong(0) == 0xff0000L)
    assert(r.getLong(1) == 0xff0000L)
    assert(r.getLong(2) == -2L)
    assert(r.getLong(3) == 0xff0000L)
    assert(r.getString(4) == "[33m✓[0m".replace("[33m", "[32m"))
    assert(r.getString(5) == "[34mhi[0m", r.getString(5))
    // 2 filled blocks (round(0.5*4)), first pure red (196 in the cube),
    // then padding to width 4
    assert(r.getString(6).endsWith("  "), r.getString(6))
    assert(r.getString(6).contains("█"))
    assert(r.getString(6).startsWith("[38;5;196m█[0m"),
      r.getString(6).replace("", "<ESC>"))
    assert(r.getString(7) == "   ")
    // RFC 4648 test vectors
    assert(r.getString(8) == "MY======")
    assert(r.getString(9) == "MZXQ====")
    assert(r.getString(10) == "MZXW6===")
    assert(r.getString(11) == "MZXW6YQ=")
    assert(r.getString(12) == "MZXW6YTB")
    assert(r.getString(13) == "MZXW6YTBOI======")
    assert(r.getString(14) == "foobar")
    // loud decode
    val e = intercept[Exception] {
      PrestoSql.sql(spark, "SELECT from_base32('mzxq====') AS v").collect()
    }
    assert(e.getMessage != null)
  }

  test("r17 advice fixes: unpadded base32, literal-safe lambda rebind, " +
      "cast-wrapped percentages") {
    val r = PrestoSql.sql(spark,
      """SELECT
        |  from_utf8(from_base32('MZXW6')) AS u1,
        |  from_utf8(from_base32('MZXW6YTBOI')) AS u2,
        |  from_utf8(from_base32('MZXW6===')) AS p1,
        |  find_first_index(ARRAY['a','n','b'], n -> n = 'n') AS ffi_lit,
        |  find_first_index(ARRAY[1,5,9], v -> v > 3 AND 'vv' != 'v')
        |    AS ffi_lit2
        |""".stripMargin).head()
    assert(r.getString(0) == "foo", r.getString(0))
    assert(r.getString(1) == "foobar", r.getString(1))
    assert(r.getString(2) == "foo")
    // the r17 wire-hash closure resolves through the DIALECT path too
    val wh = PrestoSql.sql(spark,
      """SELECT to_hex(murmur3_x64_128(to_utf8('hello'))) AS m,
        |  to_hex(murmur3(to_utf8('hello'))) AS mt,
        |  to_hex(spooky_hash_v2_64(to_utf8('hello'))) AS s64,
        |  to_hex(spooky_hash_v2_32(to_utf8('hello'))) AS s32
        |""".stripMargin).head()
    assert(wh.getString(0) == "CBD8A7B341BD9B025B1E906A48AE1D19")
    assert(wh.getString(1) == wh.getString(0))
    assert(wh.getString(2) == "3768826AD382E6CA")
    assert(wh.getString(3) == "D382E6CA")
    assert(r.getLong(3) == 2L, "literal 'n' must not be rebound: " +
      r.getLong(3))
    assert(r.getLong(4) == 2L, r.getLong(4))
    // padding, when present, must complete the final block
    intercept[Exception] {
      PrestoSql.sql(spark, "SELECT from_base32('MZXW6=') AS v").collect()
    }
    spark.sql(
      "SELECT CAST(x AS DOUBLE) AS x, w FROM VALUES (1.0, 1), (10.0, 3) AS t(x, w)")
      .createOrReplaceTempView("wp17_t")
    // CAST/paren/exponent-spelled percentages classify as percentages
    // (previously routed to the weighted form → analysis error)
    val p = PrestoSql.sql(spark,
      """SELECT approx_percentile(x, CAST(0.5 AS DOUBLE), 0.01) AS pc,
        |  approx_percentile(x, (0.5), 0.01) AS pp,
        |  approx_percentile(x, 5e-1, 0.01) AS pe,
        |  approx_percentile(x, 1e+0, 0.01) AS pe2
        |FROM wp17_t""".stripMargin).head()
    assert(p.getDouble(0) >= 1.0 && p.getDouble(0) <= 10.0)
    assert(p.getDouble(1) == p.getDouble(0))
    assert(p.getDouble(2) == p.getDouble(0))
    assert(p.getDouble(3) == 10.0, p.getDouble(3))
  }
}
