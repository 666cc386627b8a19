package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Round-15 optimization plan dump: writes
  * `plans/r15/<query>_<suffix>.txt` (`explain("formatted")`) for every
  * query the optimization round touched, plus the maintenance
  * write-frame plans (the stored-index append/build writes execute
  * EAGERLY inside the lifecycle gates' build(), so the gate's own
  * explain shows only the serving leg — the write-side Exchange change
  * is shown here on the exact frame `NearDup.bandStoreRows` writes).
  *
  *   GRAFT_PLANS_SUFFIX=before|after sbt "runMain graft.PlansR15"
  */
object PlansR15 {
  private val touched = Seq(
    // lifecycle gates: the serving leg (probe / read-back) plan
    "q144_neardedup_stored", "q148_aql_neardedup_stored_verb",
    "q151_aql_index_lsh_build_probe", "q152_aql_index_ivf_knn",
    "q153_aql_cosine_stored", "q154_aql_typo_stored",
    "q156_aql_index_lsh_append", "q158_aql_index_compact",
    "q159_aql_index_delete", "q160_aql_index_describe",
    "q161_stream_index_append", "q162_aql_index_rebuild",
    "q163_aql_index_ivf_pq", "q164_aql_knn_cosine_stored",
    "q165_aql_index_rebuild_threshold", "q167_aql_index_rebuild_geometry",
    "q168_aql_knn_jaccard_stored", "q171_aql_index_rebuild_cells",
    "q172_stream_index_delete", "q174_aql_index_manifest_probe",
    "q175_stream_manifest_append")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r15")
    Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plans] $name")
    }
    touched.foreach { name =>
      try dump(name, SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    // the maintenance WRITE frame (executes eagerly inside the gates):
    // the exact pre-write frame of a band-store append — its Exchange
    // is the round-15 change (hashpartitioning(pc, <shuffle.partitions>)
    // + AQE coalesce-to-1 before; hashpartitioning(pc, cells-capped)
    // after)
    try {
      import graft.transforms.NearDup
      val batch = Tables.load(spark, sfDir, "documents")
        .where(col("doc_id") % 16 === 3)
        .select(xxhash64(col("text")).as("th"), col("text").as("txt"))
        .distinct()
      val sh = NearDup.shingled(batch, "th", "txt")
      val keyed = NearDup.bandKeys(sh, 128, 64, 2)
        .withColumn("pc",
          pmod(xxhash64(col("band"), col("bh")), lit(64L)).cast("int"))
      // = IndexMaintenance.cellWriteParts(spark, 64) — inlined so this
      // dump tool also compiles against the pre-round-15 tree when
      // generating the `before` plans
      val parts = 64
      val frame =
        if (suffix == "before") keyed.repartition(col("pc"))
        else keyed.repartition(parts, col("pc"))
      dump("bandstore_append_write", frame)
    } catch { case e: Throwable =>
      System.err.println(s"[plans] write-frame FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
