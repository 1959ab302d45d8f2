package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-slice generator for the above-sf0.1 scale evidence runs: replicates
  * the driver's sf0.1 testdata `mult`× with disjoint key ranges so the
  * flagship bench rows can be timed at 10× the gate scale (VERDICT r15
  * "Next round" #6). NOT part of the engine surface — a measurement tool,
  * like Bench.
  *
  * Replication semantics (what keeps the workload HONEST at 10×):
  *  - every entity key shifts by `rep * 1e9` so replicas are disjoint and
  *    referential integrity holds within each replica (orders→customer,
  *    lineitem→orders/part/supplier, events→user);
  *  - `documents.text` is vocabulary-salted per replica (the
  *    ScaleProbeSpec convention: each token gets a `_r<rep>` suffix,
  *    rep 0 left verbatim) — UNsalted replication would give every doc
  *    10 exact copies and near-dup pair counts would grow ~mult² instead
  *    of tracking the corpus, destroying the linear-scale comparison the
  *    run exists to make;
  *  - dims (region, nation) are NOT replicated — dims don't grow with
  *    fact volume, and replicating them would break broadcast-join shapes;
  *  - each output table is written as a DIRECTORY of `files` part files
  *    (a real corpus layout — scans parallelize without the single-file
  *    bench workarounds; tools/duck_time.py globs directories).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dest = if (args.length > 1) args(1) else "/dev/shm/graft_sf1"
    val mult = if (args.length > 2) args(2).toInt else 10
    val files = if (args.length > 3) args(3).toInt else 8
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val SHIFT = 1000000000L

    def reps(df: DataFrame): DataFrame =
      df.withColumn("__rep", explode(sequence(lit(0), lit(mult - 1))))

    def shift(c: String) = (col(c) + col("__rep") * SHIFT).as(c)

    def write(name: String, df: DataFrame): Unit = {
      df.drop("__rep").repartition(files)
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scalegen] $name done")
    }

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // dims: one copy
    Seq("region", "nation").foreach(t => write(t, read(t)))

    write("customer", reps(read("customer"))
      .withColumn("c_custkey", shift("c_custkey")))
    write("supplier", reps(read("supplier"))
      .withColumn("s_suppkey", shift("s_suppkey")))
    write("part", reps(read("part"))
      .withColumn("p_partkey", shift("p_partkey")))
    write("orders", reps(read("orders"))
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")))
    write("lineitem", reps(read("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey"))
      .withColumn("l_partkey", shift("l_partkey"))
      .withColumn("l_suppkey", shift("l_suppkey")))
    write("events", reps(read("events"))
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id")))
    write("documents", reps(read("documents"))
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text",
        when(col("__rep") === 0, col("text")).otherwise(
          concat_ws(" ", expr(
            "transform(split(text, ' '), w -> concat(w, '_r', __rep))")))))
    write("embeddings", reps(read("embeddings"))
      .withColumn("vec_id", shift("vec_id")))

    spark.stop()
  }
}
