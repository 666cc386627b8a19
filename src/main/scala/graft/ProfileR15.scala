package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 optimization profiler: splits the stored-index lifecycle
  * chains (the bench's dominant family) into their phases and times
  * each with a calm JVM, so optimization targets the measured phase,
  * not a guess. Dev-only — never run by the driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileR15"
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Explicit-cell-path reads (stored-index probes, incremental
      // stats recounts) pass ≤ `cells` directories per read; above this
      // threshold Spark schedules a distributed listing JOB (~0.2 s of
      // fixed latency at microbatch scale) where a driver-side listing
      // is microseconds per directory on local/HDFS namenodes. 1024
      // covers every artifact geometry the gates build; deployments
      // with larger cell counts on object stores should lower it (or
      // commit a manifest, which skips listing entirely).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job breakdown: jobId, wall ms, tasks, and the action callsite
    @volatile var jobLog = false
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
          val tasks = e.stageInfos.map(_.numTasks).sum
          starts.put(e.jobId, (System.nanoTime(), site, tasks))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = starts.remove(e.jobId)
          if (jobLog && st != null) System.err.println(
            f"[job] id=${e.jobId}%4d ${(System.nanoTime() - st._1) / 1e6}%7.1f ms tasks=${st._3}%4d  ${st._2}")
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(label)
      val r = f
      spark.sparkContext.setJobDescription(null)
      System.err.println(
        f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // Bench's warmups so phase 1 isn't charged session-startup cost
    t("warmup") {
      try {
        spark.range(1000000).selectExpr("sum(id * 2)").collect()
        SparkEntry.queries("q01_agg_pricing_summary")(spark, sfDir).count()
        spark.range(4)
          .selectExpr("count(distinct lower(concat('Warm', id)))",
            "count(distinct upper(concat('Up', id)))").collect()
      } catch { case _: Throwable => () }
    }

    import graft.engine.Aql
    import graft.transforms.NearDup
    val dir = sfDir
    for (round <- 1 to 2) {
    System.err.println(s"[prof] ===== round $round =====")
    jobLog = round == 2
    val qBase = java.nio.file.Files.createTempDirectory("graft_prof_")
    val idx = s"$qBase/band_index"
    val out = s"$qBase/kept"

    // ---- q161 phase split -------------------------------------------
    t("q161 A: engine INDEX build (odds%4==1)") {
      Aql.run(spark,
        s"""CONNECTION 'Docs' (
           |  DRIVER = 'file', FILE = '$dir/documents.parquet',
           |  FORMAT = 'parquet'
           |)
           |QUERY 'Corpus' FROM CONNECTION Docs (
           |  SELECT * FROM Docs WHERE doc_id % 4 = 1
           |)
           |TRANSFORM 'Built' FROM BLOCK Corpus (
           |  INDEX ON text KEY doc_id METHOD LSH THRESHOLD 0.5 CELLS 64
           |    INTO '$idx'
           |) INTO CONSOLE""".stripMargin)
    }
    // 4 appends, direct (no stream scaffold) — the foreachBatch body
    val slice = Tables.load(spark, dir, "documents")
      .where(col("doc_id") % 4 === 3)
      .select(col("doc_id"), col("text"))
    val parts = slice.withColumn("b", pmod(col("doc_id"), lit(16)))
    for (i <- 0 until 4) {
      t(s"q161 B: bandStoreAppend microbatch $i") {
        val batch = parts.where(col("b") === (3 + 4 * i)).drop("b")
        val reps = batch
          .select(xxhash64(col("text")).as("th"), col("text").as("txt"))
          .distinct()
        NearDup.bandStoreAppend(idx, NearDup.shingled(reps, "th", "txt"))
      }
    }
    t("q161 C: engine NEARDEDUP AGAINST STORED probe") {
      Aql.run(spark,
        s"""CONNECTION 'Docs' (
           |  DRIVER = 'file', FILE = '$dir/documents.parquet',
           |  FORMAT = 'parquet'
           |)
           |CONNECTION 'Out' (
           |  DRIVER = 'file', FILE = '$out', FORMAT = 'parquet'
           |)
           |QUERY 'Batch' FROM CONNECTION Docs (
           |  SELECT * FROM Docs WHERE doc_id % 2 = 0
           |)
           |TRANSFORM 'Kept' FROM BLOCK Batch (
           |  NEARDEDUP Batch AGAINST STORED '$idx' ON text KEY doc_id
           |    THRESHOLD 0.5 METHOD LSH
           |)
           |QUERY 'Final' FROM BLOCK Kept (
           |  SELECT doc_id, lang, source, n_chars FROM Kept
           |) INTO CONNECTION Out""".stripMargin).outputs("FINAL").count()
    }
    // stream scaffold cost: same 4 batches via streamMutate-equivalent
    t("q161 D: streaming scaffold (4 no-op batches)") {
      val inBase = java.nio.file.Files.createTempDirectory("graft_prof_in_")
      val inDir = s"$inBase/in"
      slice.repartition(4).write.mode("overwrite").parquet(inDir)
      val schema = spark.read.parquet(inDir).schema
      val shm = java.nio.file.Paths.get("/dev/shm")
      val ckpt = java.nio.file.Files.createTempDirectory(shm, "graft_ck_")
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream.outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.count(); ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000); q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }

    // ---- q172 phase split: 4 delete microbatches against the grown
    // artifact (idx now holds %4==1 build + %4==3 appends) ------------
    val delSlice = Tables.load(spark, dir, "documents")
      .where(col("doc_id") % 4 === 3)
      .select(col("doc_id"), col("text"))
      .withColumn("b", pmod(col("doc_id"), lit(16)))
    for (i <- 0 until 4) {
      t(s"q172 B: bandStoreDelete microbatch $i") {
        val batch = delSlice.where(col("b") === (3 + 4 * i)).drop("b")
        val reps = batch
          .select(xxhash64(col("text")).as("th"), col("text").as("txt"))
          .distinct()
        NearDup.bandStoreDelete(idx, NearDup.shingled(reps, "th", "txt"))
      }
    }

    // ---- probe phases, finer ---------------------------------------
    t("probe: direct minhashCrossMatchesStored") {
      val meta = spark.read.parquet(s"$idx/meta").head()
      val batch = Tables.load(spark, dir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(xxhash64(col("text")).as("th"), col("text").as("txt"))
        .distinct()
      NearDup.minhashCrossMatchesStored(spark, idx,
        NearDup.shingled(batch, "th", "txt"), 0.5,
        meta.getAs[Int]("num_perm"), meta.getAs[Int]("num_bands"),
        meta.getAs[Int]("rows_per_band")).count()
    }
    t("engine: trivial script (DATA->CONSOLE)") {
      Aql.run(spark,
        """DATA 'One' ([[1]]) WITH (COLUMNS = 'X')
          |QUERY 'Q' FROM BLOCK One (SELECT * FROM One) INTO CONSOLE"""
          .stripMargin)
    }
    t("engine: read docs -> filter -> console") {
      Aql.run(spark,
        s"""CONNECTION 'Docs' (
           |  DRIVER = 'file', FILE = '$dir/documents.parquet',
           |  FORMAT = 'parquet'
           |)
           |QUERY 'Corpus' FROM CONNECTION Docs (
           |  SELECT COUNT(*) AS n FROM Docs WHERE doc_id % 4 = 1
           |) INTO CONSOLE""".stripMargin)
    }
    }
    spark.stop()
  }
}
