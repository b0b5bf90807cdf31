package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 sixth wave: embedding-space ML primitives — kNN label
  * classification, random-projection dimensionality reduction with a
  * fidelity audit, and the dominant principal direction by exact
  * integer power iteration. These close the loop the similarity family
  * opened: q25/q37/q71 find neighbors; q154 uses them to PREDICT, q155
  * makes the vectors cheaper to search, q156 summarizes the cloud's
  * dominant axis (the drift/health diagnostic next to q83's cluster
  * cohesion).
  *
  * Determinism: dot products fold left in index order through the
  * native `graft_dot` (bit-equal to the oracle's list_reduce); every
  * cross-row sum in q156 is BIGINT-exact over e4-quantized components
  * with documented int64 headroom; selection/vote ties are pinned by
  * total orders (the q129 rule).
  */
object ProjectionQueries {

  private val dim = 64
  private val rpDim = 8

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** rpSigns(k)(d) = ±1.0 from the first hex digit of md5("rp{k}_{d}") —
    * the Achlioptas-style sign matrix, derived (not stored) so both
    * engines rebuild it bit-identically. Distinct seed family from the
    * q26 LSH planes. */
  private val rpSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until rpDim).map { k =>
      (0 until dim).map { d =>
        if ("89abcdef".contains(md5hex(s"rp${k}_$d").charAt(0))) 1.0 else -1.0
      }
    }

  // ---------------------------------------------------------------- q154

  /** kNN CLASSIFICATION, leave-one-out: each probe's label is predicted
    * by majority vote of its 5 nearest neighbors (cosine), ties to the
    * smallest label — the standard eval for "are these embeddings any
    * good for this labeling", and the simplest similarity-search
    * CONSUMER (q25 finds the neighbors; this acts on them).
    *
    * Scale: the probe side is a bounded literal set (the q25 broadcast
    * rule) — brute-force exact scoring over the corpus is the
    * correctness baseline; the LSH (q26) / IVF (q37) / PQ (q71)
    * candidate generators are the drop-in scale path for an unbounded
    * probe set, trading the recall their specs bound. Vote counting and
    * argmax ride bounded per-probe frames (<= 5 rows each). */
  def q154KnnClassify(s: SparkSession, dir: String): DataFrame = {
    val lbl = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val e = SimilarityQueries.normed(s, dir).join(lbl, "vec_id")
    val probes = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"), col("label").as("true_label"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos", expr("graft_dot(pv, v) / (pn * nrm)"))
    val wTop = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    val votes = scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .groupBy("probe_id", "true_label", "label")
      .agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy("probe_id").orderBy(desc("votes"), asc("label"))
    votes.withColumn("rn", row_number().over(wVote)).filter(col("rn") === 1)
      .select(col("probe_id").cast("bigint").as("probe_id"),
        col("true_label").cast("int").as("true_label"),
        col("label").cast("int").as("predicted_label"),
        col("votes").cast("bigint").as("votes"),
        (col("label") === col("true_label")).as("correct"))
      .orderBy("probe_id")
  }

  // ---------------------------------------------------------------- q155

  /** Random-projection reduction (64 → 8 dims, derived ±1 signs) with a
    * cosine-fidelity audit over a bounded probe pair set — the
    * Johnson-Lindenstrauss trade made measurable: each pair reports its
    * original-space and projected-space cosine and the e6-quantized
    * absolute error. The q92 quantization-audit pattern applied to
    * dimensionality instead of precision.
    *
    * Scale: the projection is a narrow per-row map (8 index-ordered
    * dots against literal sign vectors — codegen'd, no shuffle); at
    * 100 TB it shrinks every downstream ANN structure 8x. The audit
    * joins a bounded probe set against itself (66 pairs). */
  def q155RandomProjection(s: SparkSession, dir: String): DataFrame = {
    val projCols = (0 until rpDim).map { k =>
      val arr = rpSigns(k).map(v => s"${v}D").mkString("array(", ", ", ")")
      expr(s"graft_dot(v, $arr)").as(s"pj$k")
    }
    val base = SimilarityQueries.normed(s, dir).filter(col("vec_id") < 12)
      .select(Seq(col("vec_id"), col("v"), col("nrm")) ++ projCols: _*)
      .withColumn("pv", array((0 until rpDim).map(k => col(s"pj$k")): _*))
      .withColumn("pnrm", expr("sqrt(graft_dot(pv, pv))"))
      .select("vec_id", "v", "nrm", "pv", "pnrm")
    val a = base.select(col("vec_id").as("va"), col("v").as("xa"),
      col("nrm").as("na"), col("pv").as("pa"), col("pnrm").as("pna"))
    val b = base.select(col("vec_id").as("vb"), col("v").as("xb"),
      col("nrm").as("nb"), col("pv").as("pb"), col("pnrm").as("pnb"))
    a.join(broadcast(b), col("va") < col("vb"))
      .withColumn("cos_orig", expr("graft_dot(xa, xb) / (na * nb)"))
      .withColumn("cos_proj", expr("graft_dot(pa, pb) / (pna * pnb)"))
      .select(col("va").cast("bigint").as("vec_a"),
        col("vb").cast("bigint").as("vec_b"),
        col("cos_orig"), col("cos_proj"),
        floor(abs(col("cos_orig") - col("cos_proj")) * lit(1000000.0))
          .cast("bigint").as("err_e6"))
      .orderBy("vec_a", "vec_b")
  }

  // ---------------------------------------------------------------- q156

  /** Dominant principal direction by POWER ITERATION in exact integer
    * arithmetic: three passes of v ← normalize(Aᵀ(A v)) over the
    * e4-quantized embedding matrix. Each pass is two scaling-key
    * aggregations over the staged exploded matrix — u = A v (per-vector
    * dot via a broadcast join against the 64-row v table), then
    * y = Aᵀ u (per-dimension sum via an equi-join on vec_id) — and one
    * bounded 64-value driver collect (the q19 scalar-mirror class) that
    * renormalizes to max|v| = 1e4 by floor division. All cross-row sums
    * are BIGINT-exact with documented headroom (|a| <= ~6e3 e4-units,
    * |u| <= 64·6e3·1e4 ≈ 3.8e9, |y| <= n·6e3·3.8e9 ≈ 4.6e16 at sf0.1 —
    * 200x inside int64, and the bound scales linearly in corpus rows so
    * a 100 TB run re-quantizes v to a smaller scale, a documented knob).
    * Sign and convergence are deterministic because v0 and every op
    * are. The loop stages its one reused frame and collects only
    * bounded scalars — the pagerankConverged discipline at 64 values
    * per pass. */
  def q156PowerIteration(s: SparkSession, dir: String): DataFrame = {
    val stage = graft.Staging.fresh("pow")
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))")))
      .select(col("vec_id"), (col("pos") + 1).as("d"), col("col").as("aq"))
      .write.mode("overwrite").parquet(s"$stage/a")
    val a = s.read.parquet(s"$stage/a")
    var v: Array[Long] = Array.fill(dim)(10000L)
    for (_ <- 1 to 3) {
      val vdf = {
        val s2 = s
        import s2.implicits._
        v.zipWithIndex.map { case (vq, i) => (i + 1, vq) }.toSeq.toDF("d", "vq")
      }
      val u = a.join(broadcast(vdf), "d")
        .groupBy("vec_id").agg(sum(col("aq") * col("vq")).as("u"))
      val y = a.join(u, "vec_id")
        .groupBy("d").agg(sum(col("aq") * col("u")).as("yd"))
        .orderBy("d").collect().map(r => r.getLong(1))
      val ymax = y.map(math.abs).max
      // a degenerate all-zero quantized matrix would renormalize by 0
      // into NaN-floored garbage — fail with a message instead
      require(ymax > 0L,
        "q156: power iteration hit an all-zero A'Av — degenerate matrix")
      v = y.map(yd =>
        math.floor(yd.toDouble / ymax.toDouble * 10000.0).toLong)
    }
    val s2 = s
    import s2.implicits._
    v.zipWithIndex.map { case (vq, i) => (i + 1, vq) }.toSeq
      .toDF("d", "vq").select(col("d").cast("int").as("d"), col("vq"))
      .orderBy("d")
  }

  // ---------------------------------------------------------------- q157

  /** Top-20 most-covarying embedding dimension PAIRS in fully exact
    * integer arithmetic — the feature-redundancy diagnostic feeding
    * q155's reduction and q156's principal direction (a large |cov(i,j)|
    * is exactly what a projection should collapse). Population
    * covariance cross-multiplied to the integer lattice:
    * cov_e8(i,j) = n·P_ij − S_i·S_j over e4-quantized components, so the
    * RANKING key is a BIGINT — no floating point anywhere in selection;
    * the reported double is one mirrored per-row chain. Headroom:
    * n·P <= 2000·7.2e10 ≈ 1.4e14, S_i·S_j the same — 60000x inside
    * int64, linear in n (the quantization-scale knob documented at
    * q156 applies).
    *
    * Scale: ONE corpus scan; each row folds its dim(dim−1)/2 pairwise
    * products into a flat array and `graft_vecsum` adds rows
    * componentwise — the shuffle carries one SCHEMA²-wide vector per
    * map partition, never per-vector rows; per-dim sums ride the same
    * aggregate. */
  def q157CovarianceTopk(s: SparkSession, dir: String): DataFrame = {
    // Round-15 optimization (guide §2.3/§2.4 — aggregate before you
    // shuffle, in the strongest form: aggregate INSIDE the row): the
    // previous shape exploded every vector to its dim(dim-1)/2 = 2016
    // pair structs and hash-aggregated 2000 × 2016 = 4 M (i, j)-keyed
    // rows (plus a second corpus scan for the per-dim sums). Now ONE
    // scan computes, per row, the 2016 pairwise products as a flat
    // array (identical lattice arithmetic, identical (i asc, j asc)
    // order) and `graft_vecsum` folds rows componentwise — the exchange
    // carries one 2016-long vector per map partition instead of 4 M
    // keyed rows, and the per-dim sums ride the same single aggregate.
    // Long addition is order-invariant, so every pij/si/n is
    // bit-identical to the exploded form; the oracle is unchanged.
    // Measured at sf0.1: 2.57 s before → see OPTIMIZATION_r15.md.
    val s2 = s
    import s2.implicits._
    val summed = Tables.embeddings(s, dir).select(
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))")
          .as("aq"))
      .agg(
        // graft_pairprods = the HOF
        // flatten(transform(sequence(1, dim-1), i ->
        //   transform(sequence(i+1, dim), j -> aq[i-1]*aq[j-1])))
        // as one codegen'd loop, same (i asc, j asc) order
        expr("graft_vecsum(graft_pairprods(aq))").as("pij_vec"),
        expr("graft_vecsum(aq)").as("sd_vec"),
        count(lit(1)).as("n"))
    // pos → (i, j): the same flattened upper-triangle order the products
    // were emitted in, as a bounded literal frame (dim² schema size)
    val idx = (1 to dim - 1).flatMap(i => (i + 1 to dim).map(j => (i, j)))
      .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
      .toDF("pos", "i", "j")
    summed
      .select(col("n"), col("sd_vec"),
        posexplode(col("pij_vec")).as(Seq("pos", "pij")))
      .join(broadcast(idx), "pos")
      .withColumn("si", expr("sd_vec[i - 1]"))
      .withColumn("sj", expr("sd_vec[j - 1]"))
      .withColumn("cov_e8", col("n") * col("pij") - col("si") * col("sj"))
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("cov_e8").cast("bigint").as("cov_e8"),
        (col("cov_e8").cast("double") /
          (col("n") * col("n")).cast("double") / lit(1.0e8)).as("cov"))
      .orderBy(abs(col("cov_e8")).desc, col("i"), col("j")).limit(20)
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_knn_classify" -> (q154KnnClassify _),
    "q155_random_projection" -> (q155RandomProjection _),
    "q156_power_iteration" -> (q156PowerIteration _),
    "q157_covariance_topk" -> (q157CovarianceTopk _),
  )

  private val oracleSigns = (0 until rpDim).map { k =>
    val arr = rpSigns(k).mkString("[", ", ", "]")
    s"list_reduce(list_transform(generate_series(1, $dim), i -> v[i] * (CAST($arr AS DOUBLE[]))[i]), (a, b) -> a + b) AS pj$k"
  }.mkString(",\n    ")

  /** Unrolled 3-pass power-iteration CTE chain mirroring
    * [[q156PowerIteration]]'s exact arithmetic. */
  private def q156Oracle: String = {
    val passes = (1 to 3).map { k =>
      s"""u$k AS (SELECT a.vec_id, SUM(a.aq * v${k - 1}.vq) AS u
         |  FROM a JOIN v${k - 1} ON v${k - 1}.d = a.d GROUP BY a.vec_id),
         |y$k AS (SELECT a.d, CAST(SUM(a.aq * u$k.u) AS BIGINT) AS yd
         |  FROM a JOIN u$k ON u$k.vec_id = a.vec_id GROUP BY a.d),
         |m$k AS (SELECT MAX(ABS(yd)) AS m FROM y$k),
         |v$k AS (SELECT d, CAST(FLOOR(CAST(yd AS DOUBLE) /
         |    CAST((SELECT m FROM m$k) AS DOUBLE) * 10000.0) AS BIGINT) AS vq
         |  FROM y$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH a AS (SELECT vec_id, i AS d,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS aq
       |  FROM embeddings, unnest(generate_series(1, $dim)) AS t(i)),
       |v0 AS (SELECT i AS d, CAST(10000 AS BIGINT) AS vq
       |  FROM unnest(generate_series(1, $dim)) AS t(i)),
       |$passes
       |SELECT CAST(d AS INTEGER) AS d, vq FROM v3 ORDER BY d""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q154_knn_classify" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        |  FROM e),
        |j AS (SELECT p.vec_id AS probe_id, p.label AS true_label,
        |    c.label AS clabel, c.vec_id AS cid,
        |    list_reduce(list_transform(generate_series(1, 64), i -> p.v[i] * c.v[i]),
        |      (a, b) -> a + b) / (p.nrm * c.nrm) AS cos
        |  FROM n p JOIN n c ON c.vec_id <> p.vec_id WHERE p.vec_id < 16),
        |r AS (SELECT probe_id, true_label, clabel,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cid ASC)
        |      AS rank
        |  FROM j),
        |vt AS (SELECT probe_id, true_label, clabel, COUNT(*) AS votes
        |  FROM r WHERE rank <= 5 GROUP BY probe_id, true_label, clabel),
        |p AS (SELECT probe_id, true_label, clabel, votes,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY votes DESC, clabel ASC) AS rn
        |  FROM vt)
        |SELECT CAST(probe_id AS BIGINT) AS probe_id,
        |  CAST(true_label AS INTEGER) AS true_label,
        |  CAST(clabel AS INTEGER) AS predicted_label,
        |  CAST(votes AS BIGINT) AS votes,
        |  clabel = true_label AS correct
        |FROM p WHERE rn = 1 ORDER BY probe_id""".stripMargin,
    "q155_random_projection" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id < 12),
         |n AS (SELECT vec_id, v,
         |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm,
         |    $oracleSigns
         |  FROM e),
         |pn AS (SELECT vec_id, v, nrm,
         |    [${(0 until rpDim).map(k => s"pj$k").mkString(", ")}] AS pv
         |  FROM n),
         |pp AS (SELECT vec_id, v, nrm, pv,
         |    sqrt(list_reduce(list_transform(pv, x -> x * x), (a, b) -> a + b)) AS pnrm
         |  FROM pn),
         |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    list_reduce(list_transform(generate_series(1, $dim), i -> a.v[i] * b.v[i]),
         |      (x, y) -> x + y) / (a.nrm * b.nrm) AS cos_orig,
         |    list_reduce(list_transform(generate_series(1, $rpDim), i -> a.pv[i] * b.pv[i]),
         |      (x, y) -> x + y) / (a.pnrm * b.pnrm) AS cos_proj
         |  FROM pp a JOIN pp b ON a.vec_id < b.vec_id)
         |SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
         |  cos_orig, cos_proj,
         |  CAST(FLOOR(ABS(cos_orig - cos_proj) * 1000000.0) AS BIGINT) AS err_e6
         |FROM pairs ORDER BY vec_a, vec_b""".stripMargin,
    "q156_power_iteration" -> q156Oracle,
    // pure-integer covariance lattice: the ranking key is exact BIGINT
    "q157_covariance_topk" ->
      s"""WITH a AS (SELECT vec_id, i AS d,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS aq
         |  FROM embeddings, unnest(generate_series(1, $dim)) AS t(i)),
         |s AS (SELECT d, SUM(aq) AS sd, COUNT(*) AS n FROM a GROUP BY d),
         |p AS (SELECT x.d AS i, y.d AS j, SUM(x.aq * y.aq) AS pij
         |  FROM a x JOIN a y ON y.vec_id = x.vec_id AND y.d > x.d
         |  GROUP BY x.d, y.d),
         |c AS (SELECT p.i, p.j,
         |    CAST(si.n * p.pij - si.sd * sj.sd AS BIGINT) AS cov_e8, si.n AS n
         |  FROM p JOIN s si ON si.d = p.i JOIN s sj ON sj.d = p.j)
         |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, cov_e8,
         |  CAST(cov_e8 AS DOUBLE) / CAST(n * n AS DOUBLE) / 100000000.0 AS cov
         |FROM c ORDER BY ABS(cov_e8) DESC, i, j LIMIT 20""".stripMargin,
  )
}
