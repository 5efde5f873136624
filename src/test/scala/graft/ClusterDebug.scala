package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Scratch timing harness for the near-dup clustering path. `ignore`d so
  * the gate suite doesn't pay its sf0.1 wall clock (and doesn't break on
  * machines without the testdata); flip to `test` to profile manually.
  */
class ClusterDebug extends SparkSpec {

  ignore("time pairs vs clustering at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[clusterdebug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = DedupOps.lshVerifiedJaccardPairs(docs, 24, 2, 80)
      .select("a_id", "b_id")
    t("pairs.count")(println(s"[clusterdebug] pairs=${pairs.count()}"))
    val cc = t("connectedComponents build+iterate")(
      DedupOps.connectedComponents(pairs))
    t("cc.count")(println(s"[clusterdebug] nodes=${cc.count()}"))
    val full = t("nearDupKeepers end-to-end")(
      DedupOps.nearDupKeepers(docs, 24, 2, 80).count())
    println(s"[clusterdebug] keeper rows=$full")
  }
}
