package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY/pipeline requirement):
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline;
  *     O(|Q|·|V|·d) but fully codegen'd (zip_with/aggregate fold).
  *   - [[lshTopK]] — random-hyperplane LSH: deterministic pseudo-random
  *     planes (seeded hash coefficients), sign-bit signature → bucket;
  *     candidates = same bucket ∪ multi-probe (1-bit flips), exact cosine
  *     re-rank on candidates only. At 100 TB the bucket join replaces the
  *     cross join: cost O(|Q|·bucket) and the signature build is one scan.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def nrm(x: Column) = sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))
    dot(a, b) / (nrm(a) * nrm(b))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Deterministic hyperplane coefficient for (plane, dim): uniform in
    * [-1, 1] from a seeded hash — reproducible across runs/levels.
    */
  private def planeCoef(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d, lit(1337L)), lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** Sign-bit LSH signature of the embedding column (`nPlanes` ≤ 62). */
  def lshSignature(v: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * planeCoef(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact brute-force cosine top-k: queries × all vectors. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val sims = q.crossJoin(v).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qv"), col("v")).as("sim"))
    topK(sims, k)
  }

  /** LSH-bucketed approximate top-k with multi-probe (Hamming ≤ 1). */
  def lshTopK(vectors: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 4): DataFrame = {
    val v = vectors.select(col("vec_id"), asDouble(col("embedding")).as("v"),
      lshSignature(col("embedding"), nPlanes).as("sig"))
    val probes = (0 until nPlanes).map(b => col("sig").bitwiseXOR(lit(1L << b))) :+ col("sig")
    val q = queries.select(col("vec_id").as("qid"),
        asDouble(col("embedding")).as("qv"),
        lshSignature(col("embedding"), nPlanes).as("sig"))
      .select(col("qid"), col("qv"), explode(array(probes: _*)).as("bucket"))
    val sims = q.join(v, col("bucket") === col("sig"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .dropDuplicates("qid", "vec_id")
    topK(sims, k)
  }

  private def topK(sims: DataFrame, k: Int): DataFrame =
    sims.withColumn("sim_e6", round(col("sim") * 1000000).cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim_e6").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank").cast("long").as("rank"),
        col("sim_e6"))
}
