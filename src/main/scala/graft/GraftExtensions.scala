package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BlockAudit, BloomTest, CharGrams, DotProduct, GramCounts, Hist, Kmv, LongDot, MinhashSig, PairProds, Topk, VecSum, Winnow, WinnowPos, WordShingles}

/** Engine extensions, installed via `spark.sql.extensions`
  * (GraftSession sets it): registers the native functions so they are
  * callable from both the DataFrame DSL (`expr("graft_dot(a, b)")`) and
  * plain SQL — the standard public extension point for custom Catalyst
  * expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_winnow expects (text, gram, window)")
        Winnow(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[Kmv].getName, "graft_kmv"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kmv expects (hash_col, k)")
        Kmv(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[Topk].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_topk expects (sort_key, payload, k)")
        Topk(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_test"),
      new ExpressionInfo(classOf[BloomTest].getName, "graft_bloom_test"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bloom_test expects (hex_string, bits_literal)")
        BloomTest(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hist"),
      new ExpressionInfo(classOf[Hist].getName, "graft_hist"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_hist expects (bin, nbins_literal)")
        Hist(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_pos"),
      new ExpressionInfo(classOf[WinnowPos].getName, "graft_winnow_pos"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_winnow_pos expects (text, gram, window)")
        WinnowPos(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ldot expects exactly 2 arguments")
        LongDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pairprods"),
      new ExpressionInfo(classOf[PairProds].getName, "graft_pairprods"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_pairprods expects exactly 1 argument (array<bigint>)")
        PairProds(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_shingles expects exactly 2 arguments (toks, k)")
        WordShingles(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_chargrams"),
      new ExpressionInfo(classOf[CharGrams].getName, "graft_chargrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_chargrams expects exactly 2 arguments (text, n)")
        CharGrams(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gramcounts"),
      new ExpressionInfo(classOf[GramCounts].getName, "graft_gramcounts"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_gramcounts expects exactly 1 argument (text)")
        GramCounts(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_blockaudit"),
      new ExpressionInfo(classOf[BlockAudit].getName, "graft_blockaudit"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_blockaudit expects exactly 2 arguments (blocks, stopwords)")
        BlockAudit(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhashsig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhashsig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_minhashsig expects exactly 2 arguments (shingles, n)")
        MinhashSig(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[VecSum].getName, "graft_vecsum"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_vecsum expects exactly 1 argument (array<bigint>)")
        VecSum(children.head)
      }))
  }
}
