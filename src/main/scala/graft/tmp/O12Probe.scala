package graft.tmp
import org.apache.spark.sql.SparkSession
object O12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries("p2_presto_sql")(spark, d)
    df.printSchema()
    df.show(5, false)
    spark.stop()
  }
}
