package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.TokenData

/** One-off: is the nested-column vectorized parquet reader on by
  * default, and how much does it matter for the token arrays?
  */
object VecProbe {
  def session(flag: Boolean): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", flag)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val path = s"${TokenData.dataRoot}/scaling_4000000_128/token_seqs"
    var s = session(true)
    println("DEFAULT nested vectorized = " + s.conf.get("spark.sql.parquet.enableNestedColumnVectorizedReader"))
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to 3).foreach { r =>
      Seq(true, false).foreach { flag =>
        s = session(flag)
        val q = s.read.parquet(path).agg(sum(size(col("tokens"))))
        q.head()
        val t0 = System.nanoTime(); q.head(); val sec = (System.nanoTime() - t0) / 1e9
        val tag = s"vectorized=$flag"
        if (sec < best(tag)) best(tag) = sec
        println(f"VEC round$r $tag $sec%6.2f s")
      }
    }
    best.toSeq.sortBy(_._1).foreach { case (t, v) => println(f"VECBEST $t ${v}%6.2f s") }
    s.stop()
  }
}
