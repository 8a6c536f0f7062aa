package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(8, "explain")
    val d = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
