package graft.tmp
import org.apache.spark.sql.SparkSession
object O12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    graft.Tables.registerAll(spark, d)
    def time(tag: String)(f: => Long): Unit = { val t0=System.nanoTime(); val n=f; println(f"PROBE $tag%-22s ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n") }
    spark.sql("SELECT COUNT(*) FROM orders").collect()
    time("recursive-12") { spark.sql("WITH RECURSIVE spine(m) AS (SELECT CAST('1995-01-01' AS DATE) UNION ALL SELECT add_months(m,1) FROM spine WHERE m < CAST('1995-12-01' AS DATE)) SELECT * FROM spine").count() }
    time("recursive-12-hint") { spark.sql("WITH RECURSIVE spine(m) AS (SELECT CAST('1995-01-01' AS DATE) UNION ALL SELECT /*+ REPARTITION(1) */ add_months(m,1) FROM spine WHERE m < CAST('1995-12-01' AS DATE)) SELECT * FROM spine").count() }
    time("recursive-4") { spark.sql("WITH RECURSIVE spine(q) AS (SELECT CAST('1995-01-01' AS DATE) UNION ALL SELECT add_months(q,3) FROM spine WHERE q < CAST('1995-10-01' AS DATE)) SELECT * FROM spine").count() }
    time("recursive-12-b") { spark.sql("WITH RECURSIVE spine(m) AS (SELECT CAST('1995-02-01' AS DATE) UNION ALL SELECT add_months(m,1) FROM spine WHERE m < CAST('1996-01-01' AS DATE)) SELECT * FROM spine").count() }
    time("full-o12-current") { graft.SparkEntry.queries("o12_recursive_spine")(spark, d).count() }
    time("sequence-spine") { spark.sql("SELECT explode(sequence(DATE'1995-01-01', DATE'1995-12-01', INTERVAL 1 MONTH)) AS m").count() }
    spark.stop()
  }
}
