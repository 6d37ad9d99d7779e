package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>[64], label). Brute-force cosine top-k is the exact
 * baseline (pure `aggregate`/`zip_with` expressions — codegen'd, no UDF,
 * trivially parallel). The scale paths query the MATERIALIZED AnnIndex
 * structures (built once, partitioned by probe key): an LSH query reads
 * only its bucket partition and an IVF query only its probed centroid
 * partitions — partition pruning does the candidate narrowing, no full
 * scan per query. Every query here has an exact DuckDB oracle (the hash
 * planes / seed centroids are SQL-reproducible).
 */
object AnnOps {
  import Tables._
  import AnnIndex.{IvfCentroids, IvfProbes, NumPlanes, Dim, Bucket6Mask, Bucket6Bits}

  /** Cast to double once; all math in doubles (matches the DuckDB oracle). */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  import AnnIndex.readSegs

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine with DuckDB's division semantics on degenerate input: a
    * zero-norm vector (an empty doc's hashed histogram) yields NULL —
    * Spark 4's ANSI mode otherwise THROWS on double 0/0 (found by the
    * adversarial-corpus fuzz), while DuckDB returns NULL on x/0; NULL
    * drops out of threshold filters and sorts last in both engines, so
    * parity holds row-for-row. try_divide evaluates the O(dim) norm
    * fold ONCE (a CASE-guarded divide would carry the fold in both the
    * predicate and the branch). */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), l2(a) * l2(b))

  /** Fold-safe 6-decimal rounding (Tables.rd: double-floor semantics,
    * bit-identical to the DuckDB twin even at extreme magnitudes). */
  def r6(c: Column): Column = Tables.rd(c, 6)
  def r6Sql(e: String): String = Tables.rdSql(e, 6)

  /** The cosine spelled as SEQUENTIAL left folds in DuckDB SQL — the same
    * operands in the same order as the Spark `cosine` expression above
    * (list_reduce's first-element init equals aggregate's 0.0 + x0), so
    * the two engines compute bit-identical doubles. The builtin
    * list_cosine_similarity does NOT pin its summation order and is never
    * used in an oracle. */
  def cosineSql(a: String, b: String): String = {
    def dotSql(x: String, y: String) =
      s"list_reduce(list_transform(list_zip($x, $y), z -> z[1] * z[2]), (acc, v) -> acc + v)"
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
  }

  /** Exact brute-force cosine top-10 vs the vec_id=0 query vector. */
  def qAnnBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteTopK(spark, dir, k = 10, qid = 0L)

  /** Parse a string-encoded query vector ('0.1,-0.2,…') — the serving-
    * time path where the caller BRINGS a vector instead of naming a
    * stored vec_id. Dimension-checked loudly: zip_with would silently
    * truncate a short vector into wrong cosines. */
  def parseVecLiteral(s: String): Array[Double] = {
    // split with -1 keeps empty slots; an empty component ('0.1,,0.3')
    // must FAIL, not be dropped — dropping would shift every later
    // component and could still pass the length check (a Dim+1-slot
    // literal with one empty parses to Dim silently-misaligned values)
    val parts = s.split(",", -1).map(_.trim)
    val empties = parts.zipWithIndex.collect { case ("", i) => i }
    require(empties.isEmpty,
      s"query vector has empty component(s) at position(s) " +
        s"${empties.mkString(",")} — components must all be numbers")
    val vs = parts.map(x => x.toDoubleOption.getOrElse(
      throw new IllegalArgumentException(
        s"query vector component '$x' is not a number")))
    require(vs.length == Dim,
      s"query vector has ${vs.length} components, expected $Dim")
    vs
  }

  def bruteTopK(spark: SparkSession, dir: String, k: Int,
                qid: Long, qvec: Option[Array[Double]] = None): DataFrame = {
    // same loud missing-qid contract as the store-backed methods (the
    // empty broadcast side would otherwise read as "no similar vectors");
    // applies to EVERY qid — vec_id 0 may be absent in filtered datasets
    val qvArr = qvec.getOrElse(queryVec(spark, dir, qid))
    val emb = t(spark, dir, "embeddings")
    val e = asDouble(col("embedding"))
    // the fetched vector doubles as the comparison side (literal array:
    // one scan of embeddings total, no single-row cross join)
    emb
      .select(col("vec_id"), col("label"),
        r6(cosine(e, typedLit(qvArr.toSeq))).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Vector norms + global norm stats (sanity surface, SQL-oracled;
    * fold-safe rounding like the cosine family). */
  def qEmbedNorms(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), r6(l2(asDouble(col("embedding")))).as("norm"))
      .orderBy("vec_id")

  /** The L2 norm as a sequential fold in DuckDB SQL (same op order as
    * the Spark l2 expression). */
  def normSql(a: String): String =
    s"sqrt(list_reduce(list_transform($a, v -> v * v), (acc, v) -> acc + v))"

  /** The query vector (vec_id = qid; the oracled queries pin 0) as a
    * driver-side double array — point lookup, row-group pruned. */
  private def queryVec(spark: SparkSession, dir: String,
                       qid: Long = 0L): Array[Double] = {
    import spark.implicits._
    val rows = t(spark, dir, "embeddings").where(col("vec_id") === qid)
      .select(asDouble(col("embedding"))).as[Seq[Double]].take(1)
    require(rows.nonEmpty, s"query vector vec_id=$qid not found in $dir")
    rows.head.toArray
  }

  /** Query vector for STORE-backed probes: the source table first (row-
    * group pruned point lookup), else the store's own committed rows —
    * vectors that arrived via append() micro-batches exist only in the
    * store, and "query by the newest ingested item" is the common
    * streaming ask. The store lookup is a pushed vec_id filter over the
    * manifest-resolved LSH segments (no bucket is derivable from an id,
    * so all partitions are listed — fallback-only cost, never paid when
    * the id is in the source table). */
  private def queryVecStore(spark: SparkSession, dir: String, qid: Long,
                            paths: AnnIndex.AnnPaths): Array[Double] = {
    import spark.implicits._
    val src = t(spark, dir, "embeddings").where(col("vec_id") === qid)
      .select(asDouble(col("embedding"))).as[Seq[Double]].take(1)
    if (src.nonEmpty) return src.head.toArray
    val stored = readSegs(spark, paths.lshDirs)
      .where(col("vec_id") === qid)
      .select(asDouble(col("embedding"))).as[Seq[Double]].take(1)
    require(stored.nonEmpty,
      s"query vector vec_id=$qid not found in $dir nor in its ANN store")
    stored.head.toArray
  }

  /** LSH bucket inventory — reads the MATERIALIZED table, which the
    * oracle recomputes from raw embeddings: the materialization itself
    * is hash-verified. */
  def qAnnLshBuckets(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(spark, dir, AnnIndex.BuildParams())

  def lshBuckets(spark: SparkSession, dir: String,
                 p: AnnIndex.BuildParams): DataFrame = {
    val paths = AnnIndex.ensure(spark, dir, p)
    readSegs(spark, paths.lshDirs)
      .select(col("vec_id"), col("bucket16").as("bucket"))
      .orderBy("vec_id")
  }

  /** Bucketed ANN top-10: the query's coarse bucket is computed driver-
    * side, then ONLY that bucket6 partition is read (partition pruning —
    * the 100 TB path: per-query work is the bucket size, not the corpus). */
  def qAnnLshTopK(spark: SparkSession, dir: String): DataFrame =
    lshTopK(spark, dir, AnnIndex.BuildParams())

  def lshTopK(spark: SparkSession, dir: String,
              p: AnnIndex.BuildParams, k: Int = 10,
              qid: Long = 0L, qvec: Option[Array[Double]] = None): DataFrame = {
    import spark.implicits._
    val paths = AnnIndex.ensure(spark, dir, p)
    val qv = qvec.getOrElse(queryVecStore(spark, dir, qid, paths))
    val qb6 = AnnIndex.lshBucket16(qv.map(_.toFloat)) & p.lshMask
    val cand = readSegs(spark, paths.lshDirs)
      .where(col("bucket6") === qb6) // partition filter, prunes 63/64 dirs
    val qvDf = Seq(Tuple1(qv.toSeq)).toDF("qv")
    cand.crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        r6(cosine(asDouble(col("embedding")), col("qv"))).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Multi-probe LSH probe set: the query's bucket6 plus the
    * (LshProbes - 1) Hamming-adjacent codes whose sign decision had the
    * SMALLEST margin |plane · q| — the least-confident bits flip first
    * (multi-probe LSH, Lv et al. VLDB '07). Computed driver-side from
    * the same plane dots that chose the bucket; ties break on plane id
    * (the oracle orders identically). */
  def lshProbeCodes(qv: Array[Double],
                    bits: Int = AnnIndex.Bucket6Bits): Seq[Long] = {
    val dots = (0 until bits).map { p =>
      var s = 0.0
      var d = 0
      val n = math.min(qv.length, Dim)
      while (d < n) { s += AnnIndex.Planes(p)(d) * qv(d); d += 1 }
      (p, s)
    }
    val qb6 = dots.foldLeft(0) { case (b, (p, s)) => if (s > 0) b | (1 << p) else b }
    val flips = dots.map { case (p, s) => (math.abs(s), p) }
      .sortBy { case (m, p) => (m, p) }
      .take(AnnIndex.LshProbes - 1).map(_._2)
    qb6.toLong +: flips.map(p => (qb6 ^ (1 << p)).toLong)
  }

  /** Multi-probe bucketed ANN top-10: reads the LshProbes probed bucket6
    * partitions (4 of 64 — partition pruning in the plan), exact cosine
    * inside. Strictly higher recall than the single-probe q53 at 4x the
    * per-query read — the recall/cost dial the verdict asked for. */
  def qAnnLshMultiProbe(spark: SparkSession, dir: String): DataFrame =
    lshMultiProbe(spark, dir, AnnIndex.BuildParams())

  def lshMultiProbe(spark: SparkSession, dir: String,
                    p: AnnIndex.BuildParams, k: Int = 10,
                    qid: Long = 0L, qvec: Option[Array[Double]] = None): DataFrame = {
    import spark.implicits._
    val paths = AnnIndex.ensure(spark, dir, p)
    val qv = qvec.getOrElse(queryVecStore(spark, dir, qid, paths))
    val probes = lshProbeCodes(qv, p.lshBits)
    val cand = readSegs(spark, paths.lshDirs)
      .where(col("bucket6").isin(probes: _*)) // partition filter, 4/64 dirs
    val qvDf = Seq(Tuple1(qv.toSeq)).toDF("qv")
    cand.crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        r6(cosine(asDouble(col("embedding")), col("qv"))).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** IVF assignment inventory — reads the materialized inverted lists;
    * the oracle recomputes argmin-to-seed-centroids from raw embeddings. */
  def qAnnIvfAssign(spark: SparkSession, dir: String): DataFrame =
    ivfAssign(spark, dir, AnnIndex.BuildParams())

  def ivfAssign(spark: SparkSession, dir: String,
                p: AnnIndex.BuildParams): DataFrame = {
    val paths = AnnIndex.ensure(spark, dir, p)
    readSegs(spark, paths.ivfDirs)
      .select(col("vec_id"), col("centroid").cast("long").as("centroid"))
      .orderBy("vec_id")
  }

  /** IVF top-10: probe the IvfProbes nearest centroids (16-row driver
    * lookup), read ONLY those centroid partitions, exact cosine inside —
    * the standard recall/cost dial, with pruning in the plan. */
  def qAnnIvfTopK(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(spark, dir, AnnIndex.BuildParams())

  def ivfTopK(spark: SparkSession, dir: String, p: AnnIndex.BuildParams,
              probes: Int = IvfProbes, k: Int = 10,
              qid: Long = 0L, qvec: Option[Array[Double]] = None): DataFrame = {
    import spark.implicits._
    val paths = AnnIndex.ensure(spark, dir, p)
    val qv = qvec.getOrElse(queryVecStore(spark, dir, qid, paths))
    val cents = spark.read.parquet(paths.centroidsDir)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val probed: Seq[Long] = cents.map { case (c, ce) =>
      var d = 0.0
      var i = 0
      val n = math.min(qv.length, ce.length)
      while (i < n) { val x = qv(i) - ce(i); d += x * x; i += 1 }
      (c, d)
    }.sortBy { case (c, d) => (d, c) }.take(probes).map(_._1).toSeq
    val cand = readSegs(spark, paths.ivfDirs)
      .where(col("centroid").isin(probed: _*)) // partition filter
    val qvDf = Seq(Tuple1(qv.toSeq)).toDF("qv")
    cand.crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        r6(cosine(asDouble(col("embedding")), col("qv"))).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** q77: query-by-LITERAL-vector through the ann_topk operator plan —
    * the serving-time shape (a caller brings an embedding; nothing is
    * looked up by id). The vector is a fixed exact-binary 64-dim
    * pattern both engines rebuild from the same integer formula, so the
    * cosines are bit-identical. Runs through the AnnTopK Catalyst
    * operator (the SQL TVF's plan), so the SQL surface itself is what
    * the oracle checks. */
  val QueryVecLiteral: String =
    Array.tabulate(Dim)(i => ((i * 37) % 64 - 32) / 64.0).mkString(",")

  def qAnnVecLiteral(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSql.ensureStrategy(spark)
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      graft.plans.AnnTopK(dir, "brute", 10, qvecStr = Some(QueryVecLiteral)))
      .select(col("vec_id"), col("cos"))
  }

  // ---- DuckDB oracles (planes/centroids are SQL-reproducible) ---------

  private def planeList(p: Int): String =
    (0 until Dim).map(d => AnnIndex.planeWeight(p, d).toString)
      .mkString("[", ", ", "]::DOUBLE[]")

  /** Sequential-fold dot product of vector column `v` with plane p
    * (bit-exact vs the Scala while-loop: same operands, same order). */
  private def planeDot(p: Int, v: String = "e"): String =
    s"list_reduce(list_transform(list_zip($v, ${planeList(p)}), z -> z[1] * z[2]), (a, b) -> a + b)"

  private def bucketExpr(planes: Int): String =
    (0 until planes).map(p =>
      s"(CASE WHEN ${planeDot(p)} > 0 THEN (1::BIGINT << $p) ELSE 0::BIGINT END)")
      .mkString(" + ")

  private val eCte =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"

  /** Squared L2 between two double lists, sequential fold. */
  private def distSql(a: String, b: String): String =
    s"list_reduce(list_transform(range($Dim), i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])), (x, y) -> x + y)"

  private val assignCtes =
    s"""c AS (SELECT vec_id AS centroid, e AS ce FROM e WHERE vec_id < $IvfCentroids),
       |d AS (SELECT e.vec_id, c.centroid, ${distSql("e.e", "c.ce")} AS dist FROM e, c),
       |assign AS (SELECT vec_id, centroid FROM (
       |  SELECT vec_id, centroid,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid) AS rn
       |  FROM d) WHERE rn = 1)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q77_ann_vec_literal" ->
      s"""WITH $eCte,
         |q AS (SELECT list_transform(range($Dim),
         |        i -> CAST(((i * 37) % 64) - 32 AS DOUBLE) / 64.0) AS qe)
         |SELECT vec_id, ${r6Sql(cosineSql("e.e", "q.qe"))} AS cos
         |FROM e, q ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "q52_ann_lsh_buckets" ->
      s"""WITH $eCte
         |SELECT vec_id, ${bucketExpr(NumPlanes)} AS bucket
         |FROM e ORDER BY vec_id""".stripMargin,
    "q53_ann_lsh_topk" ->
      s"""WITH $eCte,
         |b AS (SELECT vec_id, e, ${bucketExpr(Bucket6Bits)} AS b6 FROM e),
         |q AS (SELECT e AS qe, b6 AS qb6 FROM b WHERE vec_id = 0)
         |SELECT vec_id, ${r6Sql(cosineSql("b.e", "q.qe"))} AS cos
         |FROM b, q WHERE b.b6 = q.qb6
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "q56_ann_lsh_multiprobe" ->
      s"""WITH $eCte,
         |b AS (SELECT vec_id, e, ${bucketExpr(Bucket6Bits)} AS b6 FROM e),
         |q AS (SELECT e AS qe, b6 AS qb6 FROM b WHERE vec_id = 0),
         |margins AS (${(0 until Bucket6Bits).map(p =>
              s"SELECT $p AS p, abs(${planeDot(p, "qe")}) AS m FROM q")
              .mkString(" UNION ALL ")}),
         |flips AS (SELECT p FROM margins ORDER BY m, p LIMIT ${AnnIndex.LshProbes - 1}),
         |probes AS (SELECT qb6 AS code FROM q
         |           UNION ALL SELECT xor(qb6, (1::BIGINT << p)) AS code FROM flips, q)
         |SELECT vec_id, ${r6Sql(cosineSql("b.e", "q.qe"))} AS cos
         |FROM b, q WHERE b.b6 IN (SELECT code FROM probes)
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "q54_ann_ivf_assign" ->
      s"""WITH $eCte, $assignCtes
         |SELECT vec_id, centroid FROM assign ORDER BY vec_id""".stripMargin,
    "q55_ann_ivf_topk" ->
      s"""WITH $eCte, $assignCtes,
         |q AS (SELECT e AS qe FROM e WHERE vec_id = 0),
         |qd AS (SELECT c.centroid, ${distSql("q.qe", "c.ce")} AS dist FROM c, q),
         |probes AS (SELECT centroid FROM qd ORDER BY dist, centroid LIMIT $IvfProbes)
         |SELECT vec_id, ${r6Sql(cosineSql("e.e", "q.qe"))} AS cos
         |FROM e JOIN assign USING (vec_id), q
         |WHERE assign.centroid IN (SELECT centroid FROM probes)
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
}
