package graft.queries

import org.apache.spark.sql.{Column, SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Determinism: vectors are cast float→double (exact) and the dot/norm
  * folds are explicit left-to-right `aggregate` reductions, so Spark's
  * result is bit-deterministic. Cosine values are rounded to 4 dp before
  * ordering/compare so engine-level summation-order differences (1e-15)
  * can never flip the oracle hash.
  *
  * Scale notes: the brute-force top-k broadcasts the single query vector
  * — a map-only scan + a k-row reduce, which is exactly the right plan at
  * 100 TB too. All-pairs work (not done here) goes through LSH bucketing
  * (see graft.operators.Similarity).
  */
object SimilarityQueries {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** dot(a,b) via zip_with + left-fold in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (vec_id=0). */
  val q34 = Q(
    "q34_ann_bruteforce",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("label"),
          round(cosine(col("v"), col("qv")), 4).as("sim"))
        .orderBy(desc("sim"), asc("vec_id"))
        .limit(10)
    },
    Some("""
      WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, label,
             ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 4) AS sim
      FROM embeddings, q
      WHERE vec_id <> 0
      ORDER BY sim DESC, vec_id
      LIMIT 10"""))

  /** Vector norms — checks the numeric fold itself over every row. */
  val q35 = Q(
    "q35_vector_norms",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(norm(asDouble(col("embedding"))), 4).as("l2"),
          size(col("embedding")).cast("long").as("dims"))
        .orderBy("vec_id"),
    Some("""
      SELECT vec_id,
             ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2,
             CAST(len(embedding) AS BIGINT) AS dims
      FROM embeddings ORDER BY vec_id"""))

  def all: Seq[Q] = Seq(q34, q35)
}
