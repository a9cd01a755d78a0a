package graft.tools
import org.apache.spark.sql.SparkSession
object XxCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val strs = Seq("", "a", "abc", "abcd", "abcdefgh", "the quick brown fox",
      "x"*31, "y"*32, "z"*33, "w"*64, "v"*100, "Grüße 中文")
    strs.toDF("s").select(col("s"), xxhash64(col("s")).as("h")).collect()
      .foreach(r => println(s"STR\t${r.getString(0).length}\t${r.getLong(1)}"))
    // int-seeded long chain: xxhash64(lit(i), col) as minhash uses
    Seq((0, 123456789L), (5, -987654321L), (63, Long.MinValue)).toDF("i", "v")
      .select(col("i"), col("v"), xxhash64(col("i"), col("v")).as("h")).collect()
      .foreach(r => println(s"CHAIN\t${r.getInt(0)}\t${r.getLong(1)}\t${r.getLong(2)}"))
    spark.stop()
  }
}
