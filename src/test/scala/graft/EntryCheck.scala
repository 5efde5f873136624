package graft

/** Smoke the driver's t1 path: SparkEntry.entry rows > 0 at sf0.001. */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[EntryCheck] entry rows = $n (schema: ${df.columns.mkString(",")})")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
