package graft

/** The bench warmup must actually RUN (round 19): runSuite wraps each
  * warmup domain in a belt-and-braces catch, so a warmup job that
  * throws warms nothing and nobody notices — exactly what happened in
  * round 18, where warmupSubsystems' raw sum(xxhash64) overflowed
  * int64 under ANSI on every host ("Task 0 in stage 24 … aborting
  * job" at bench start in the r18 driver artifact) and the
  * mapPartitions-codec and parquet-committer warmups behind it were
  * silently skipped. Running both domains here WITHOUT the catch
  * turns that failure class into a test failure.
  */
class WarmupSpec extends SparkSpec {
  test("both warmup domains complete without throwing at sf0.001") {
    Bench.warmupRelational(spark, "/root/testdata/sf0.001")
    Bench.warmupSubsystems(spark, "/root/testdata/sf0.001")
  }
}
