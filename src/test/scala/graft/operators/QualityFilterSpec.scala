package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The in-engine trained quality filter (q205/q206): the staged driver
  * loop must be bit-equal to the unrolled pure-lineage replay (the same
  * exact integer arithmetic, so ANY divergence — a trunc-vs-floor slip,
  * a float sneaking in — breaks equality), training must actually
  * LEARN (accuracy above the majority baseline on the fixture, perfect
  * separation on a separable toy), and the arithmetic must be
  * deterministic under repartitioning (integer sums are associative —
  * the reason the design is fixed-point). */
class QualityFilterSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def fixtureFeats =
    QualityFilterQueries.features(graft.Tables.documents(spark, sfDir))

  test("staged driver loop == unrolled pure-lineage replay, bit-equal") {
    val (w, n) = QualityFilterQueries.train(fixtureFeats)
    val u = QualityFilterQueries.trainUnrolled(fixtureFeats).collect().head
    assert(Seq(u.getLong(0), u.getLong(1), u.getLong(2), u.getLong(3))
      === w.toSeq, "every GD step must replay to the identical weights")
    assert(u.getLong(4) === n)
  }

  test("training learns: fixture accuracy beats the majority baseline") {
    val r = graft.SparkEntry.queries("q205_train_quality_filter")(spark, sfDir)
      .collect().head
    val (n, correct) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"))
    val majority = {
      val pos = fixtureFeats.agg(sum("y")).collect().head.getLong(0)
      math.max(pos, n - pos).toDouble / n
    }
    assert(correct.toDouble / n > 0.9, s"accuracy ${correct.toDouble / n}")
    assert(correct.toDouble / n > majority + 0.2,
      s"must beat majority $majority by a margin, got ${correct.toDouble / n}")
  }

  test("a linearly separable toy is learned perfectly") {
    // y == 1 exactly when x1 is large; x2/x3 carry no signal
    val feats = (0 until 200).map { i =>
      val y = i % 2
      (i.toLong, 10L, if (y == 1) 90L else 10L, 50L, 50L, y.toLong)
    }.toDF("doc_id", "x0", "x1", "x2", "x3", "y")
    val (w, n) = QualityFilterQueries.train(feats)
    assert(n === 200L)
    val wrong = feats.filter(
      expr(s"((${w(0)}*x0 + ${w(1)}*x1 + ${w(2)}*x2 + ${w(3)}*x3) >= 0)" +
        " != (y = 1)")).count()
    assert(wrong === 0L, s"separable toy must classify perfectly, w=${w.toSeq}")
  }

  test("training is invariant under repartitioning (integer sums associative)") {
    val a = QualityFilterQueries.train(fixtureFeats.repartition(1))._1.toSeq
    val b = QualityFilterQueries.train(fixtureFeats.repartition(13))._1.toSeq
    assert(a === b)
  }

  test("q213: the hashed-ngram filter learns well above the majority baseline") {
    // the fastText bag-of-ngrams variant must learn the same weak label
    // from 16 hashed bucket counts alone — no hand features
    val r = graft.SparkEntry.queries("q213_ngram_quality_filter")(spark, sfDir)
      .collect().head
    val (n, correct) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"))
    val majority = {
      val pos = fixtureFeats.agg(sum("y")).collect().head.getLong(0)
      math.max(pos, n - pos).toDouble / n
    }
    assert(correct.toDouble / n > 0.9, s"accuracy ${correct.toDouble / n}")
    assert(correct.toDouble / n > majority + 0.2,
      s"must beat majority $majority by a margin, got ${correct.toDouble / n}")
  }

  test("q213 features: bucket counts conserve the total gram count") {
    // sum over buckets == unigrams + bigrams per doc (= 2L-1 for L >= 2):
    // the hash PARTITIONS the grams, it must not drop or double-count
    val f = QualityFilterQueries.ngramFeatures(
      graft.Tables.documents(spark, sfDir))
    val xsum = (0 until 16).map(j => col(s"x$j")).reduce(_ + _)
    val bad = f.join(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), expr("size(split(text, ' '))").as("len")),
        Seq("doc_id"))
      .filter(xsum =!= expr("len + greatest(len - 1, 0)"))
      .count()
    assert(bad === 0L, "hashed buckets must partition the gram multiset exactly")
  }

  test("q206 scorecard is consistent with the trained decision rule") {
    val sc = graft.SparkEntry.queries("q206_quality_scorecard")(spark, sfDir)
      .collect()
    assert(sc.nonEmpty)
    sc.foreach { r =>
      val (nd, nk) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"))
      assert(nk >= 0 && nk <= nd)
      assert(r.getAs[Long]("keep_share_e6") ===
        math.floor(nk.toDouble / nd.toDouble * 1e6).toLong)
    }
    // totals must cover the whole corpus exactly once
    assert(sc.map(_.getAs[Long]("n_docs")).sum ===
      graft.Tables.documents(spark, sfDir).count())
  }
}
