package graft

/** Dump formatted physical plans for plan-quality review
  * (Test/runMain graft.PlanDebug [queryName...]).
  */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_range", "q_join_3way", "q_topk", "q_agg_multi",
        "q_simsearch_topk", "q_neardup_jaccard", "q_scan_limit")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Queries.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
