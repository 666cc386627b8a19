package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import java.nio.file.{Files, Paths}

/** Round-16 optimization plan dump: writes
  * `plans/r16/<query>_<suffix>.txt` (`explain("formatted")`) for every
  * query this optimization round touches — the in-plan dedup/KNN family
  * (whose tokenize→shingle(→minhash) chains are being materialized once
  * per statement instead of recomputed per consumer) plus any lifecycle
  * gate a later wave touches.
  *
  *   GRAFT_PLANS_SUFFIX=before|after sbt "runMain graft.PlansR16"
  */
object PlansR16 {
  private val touched = Seq(
    // in-plan dedup / retrieval family (wave 1: checkpoint shared
    // shingle/band/variant/bucket frames)
    "q31_dedup_ngram_jaccard", "q32_dedup_minhash_lsh",
    "q47_dedup_clusters", "q85_dedup_incremental",
    "q106_dedup_containment", "q118_cluster_canonical",
    "q120_aql_neardedup_verb", "q124_aql_neardedup_lsh",
    "q128_aql_neardedup_against", "q141_aql_neardedup_cosine",
    "q142_aql_cosine_against", "q143_aql_typo_verb",
    "q170_aql_knn_jaccard_inplan",
    // later waves (stats epilogue / delete residue) — serving-leg plans
    "q159_aql_index_delete", "q165_aql_index_rebuild_threshold",
    "q172_stream_index_delete")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "after")
    val only = sys.env.get("GRAFT_PLANS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r16")
    Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plans] $name")
    }
    touched.filter(n => only.forall(_.exists(n.startsWith))).foreach { name =>
      try dump(name, SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
