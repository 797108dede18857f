package graft.bbc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.types._
import graft.cluster.Clustering
import graft.cluster.Clustering.LloydResult

/** Reference task 2.1: K-Means (K=3, Euclidean, max 20 iterations,
  * tol 1e-5) over a 2-D points CSV (`sources/2.1/source/task2_1.java:
  * 26-28`).
  */
object Points {

  /** S7: CSV source with header and malformed-row drop (the reference
    * skips non-numeric rows by catch-and-continue, `task2_1.java:84-86,
    * 163-169` — declaratively that is DROPMALFORMED).
    */
  def readPoints(spark: SparkSession, csvPath: String): DataFrame =
    spark.read
      .option("header", true)
      .option("mode", "DROPMALFORMED")
      .schema(StructType(Seq(
        StructField("class", IntegerType),
        StructField("x", DoubleType),
        StructField("y", DoubleType))))
      .csv(csvPath)
      .filter(col("x").isNotNull && col("y").isNotNull)

  /** The task 2.1 run: points → features vector → explicit Lloyd loop
    * (per-iteration artifacts, convergence at `tol`). Row id = (x, y)
    * insertion is not stable in the reference either; we use a
    * deterministic synthetic id ordered by (x, y).
    */
  def kmeans2D(spark: SparkSession, points: DataFrame, k: Int = 3,
               maxIter: Int = 20, tol: Double = 1e-5,
               onIteration: Option[(Int, DataFrame) => Unit] = None): LloydResult = {
    val feats = points
      .select(array_to_vector(array(col("x"), col("y"))).as("features"),
        col("x"), col("y"))
      .withColumn("pid",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("x", "y")))
    // the iteration hook sees (cluster, x, y) rows — the reference's
    // per-iteration snapshot shape — by joining coordinates back on pid
    Clustering.lloydLoop(spark, feats, "pid", k, maxIter, tol,
      onIteration = onIteration.map(f => (i: Int, asg: org.apache.spark.sql.DataFrame) =>
        f(i, feats.select("pid", "x", "y")
          .join(asg.select("pid", "cluster"), "pid")
          .select(col("cluster"), col("x"), col("y")))))
  }

  /** `.classes` rows in the 2.1 golden format: `cluster,x,y`. */
  def classesRows(points: DataFrame, result: LloydResult): DataFrame = {
    val feats = points
      .withColumn("pid",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("x", "y")))
    feats.join(result.assignments.select("pid", "cluster"), "pid")
      .select(col("cluster"), col("x"), col("y"))
  }
}
