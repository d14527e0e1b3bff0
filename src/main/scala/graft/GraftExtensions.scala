package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftFunctions._
import graft.functions.QSketchCodec

/** Session-extension entry point: registers the graft native functions at
  * session build time, so any deployment can enable them declaratively with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), instead of calling
  * [[graft.functions.GraftFunctions.register]] imperatively. This is also
  * where a future `ASOF JOIN` SQL surface would inject its parser rule +
  * planner strategy (SURVEY.md §7.3 — deferred; the DataFrame API
  * [[graft.operators.AsOfJoin]] covers parity).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator as-of join (AsOfJoinNode -> AsOfMergeJoinExec) and
    // its SQL surface: JOIN ... ON <equi> AND graft_asof(lt, rt)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteAsOfJoin)
    // catalog-level change data feed: readChangeFeed on
    // read/readStream.table + the table_changes(...) SQL TVF
    ext.injectResolutionRule(s =>
      graft.sources.CdfCatalogSupport.ResolveCdfRead(s))
    ext.injectTableFunction((new FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "table_changes"),
      graft.sources.CdfCatalogSupport.tableChanges))
    // lake metadata tables (Iceberg t.history/t.files, Delta DESCRIBE
    // HISTORY) as TVFs — manifest reads only, never a data scan
    ext.injectTableFunction((new FunctionIdentifier("graft_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_history"),
      graft.sources.LakeMetaFunctions.history))
    ext.injectTableFunction((new FunctionIdentifier("graft_files"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_files"),
      graft.sources.LakeMetaFunctions.files))
    ext.injectFunction(fn("graft_asof",
      es => graft.plans.GraftAsOfMarker(es(0), es(1))))
    ext.injectFunction(fn("graft_cosine", es => CosineSim(es(0), es(1))))
    ext.injectFunction(fn("graft_hamming",
      es => { val a = QSketchCodec.arity(es, 2, "graft_hamming")
        graft.functions.GraftFunctions.HammingDist(a(0), a(1)) }))
    ext.injectFunction(fn("graft_bmp_encode",
      es => graft.operators.Multimodal.BmpEncodeExpr(
        QSketchCodec.arity(es, 4, "graft_bmp_encode"))))
    ext.injectFunction(fn("graft_bmp_decode",
      es => graft.operators.Multimodal.BmpDecodeExpr(
        QSketchCodec.arity(es, 1, "graft_bmp_decode").head)))
    ext.injectFunction(fn("graft_png_encode",
      es => graft.operators.Multimodal.PngEncodeExpr(
        QSketchCodec.arity(es, 3, "graft_png_encode"))))
    ext.injectFunction(fn("graft_png_decode",
      es => graft.operators.Multimodal.PngDecodeExpr(
        QSketchCodec.arity(es, 1, "graft_png_decode").head)))
    ext.injectFunction(fn("graft_png_resize",
      es => graft.operators.Multimodal.PngResizeExpr(
        QSketchCodec.arity(es, 3, "graft_png_resize"))))
    ext.injectFunction(fn("graft_qoi_encode",
      es => graft.operators.Multimodal.QoiEncodeExpr(
        QSketchCodec.arity(es, 3, "graft_qoi_encode"))))
    ext.injectFunction(fn("graft_qoi_decode",
      es => graft.operators.Multimodal.QoiDecodeExpr(
        QSketchCodec.arity(es, 1, "graft_qoi_decode").head)))
    ext.injectFunction(fn("graft_wav_encode",
      es => graft.operators.Multimodal.WavEncodeExpr(
        QSketchCodec.arity(es, 4, "graft_wav_encode"))))
    ext.injectFunction(fn("graft_wav_decode",
      es => graft.operators.Multimodal.WavDecodeExpr(
        QSketchCodec.arity(es, 1, "graft_wav_decode").head)))
    ext.injectFunction(fn("graft_wav_frames",
      es => graft.operators.Multimodal.WavFramesExpr(
        QSketchCodec.arity(es, 3, "graft_wav_frames").head,
        QSketchCodec.intArg(es, 1, "graft_wav_frames"),
        QSketchCodec.intArg(es, 2, "graft_wav_frames"))))
    ext.injectFunction(fn("graft_feature_hash",
      es => FeatureHash(
        QSketchCodec.arity(es, 2, "graft_feature_hash").head,
        QSketchCodec.intArg(es, 1, "graft_feature_hash"))))
    ext.injectFunction(fn("graft_damerau",
      es => { val a = QSketchCodec.arity(es, 2, "graft_damerau")
        DamerauLevenshtein(a(0), a(1)) }))
    ext.injectFunction(fn("graft_jaccard", es => JaccardLong(es(0), es(1))))
    ext.injectFunction(fn("graft_overlap", es => OverlapLong(es(0), es(1))))
    ext.injectFunction(fn("graft_simhash64", es => SimHash64(es.head)))
    ext.injectFunction(fn("graft_gopher_stats",
      es => GopherStats(
        QSketchCodec.arity(es, 1, "graft_gopher_stats").head)))
    ext.injectFunction(fn("graft_gopher_quality",
      es => GopherQuality(
        QSketchCodec.arity(es, 1, "graft_gopher_quality").head)))
    ext.injectFunction(fn("graft_c4_stats",
      es => C4Stats(
        QSketchCodec.arity(es, 1, "graft_c4_stats").head)))
    ext.injectFunction(fn("graft_ngram_hashes",
      es => NgramHashes(QSketchCodec.arity(es, 2, "graft_ngram_hashes").head,
        QSketchCodec.intArg(es, 1, "graft_ngram_hashes"))))
    ext.injectFunction(fn("graft_minhash_sig",
      es => MinHashSig(QSketchCodec.arity(es, 2, "graft_minhash_sig").head,
        QSketchCodec.intArg(es, 1, "graft_minhash_sig"))))
    ext.injectFunction(fn("graft_freq_items",
      es => graft.functions.FreqItems(
        QSketchCodec.arity(es, 2, "graft_freq_items").head,
        QSketchCodec.intArg(es, 1, "graft_freq_items"))))
    ext.injectFunction(fn("graft_topk",
      es => graft.functions.TopKPairs(
        QSketchCodec.arity(es, 3, "graft_topk").head, es(1),
        QSketchCodec.intArg(es, 2, "graft_topk"))))
    ext.injectFunction(fn("graft_quantile_sketch",
      es => graft.functions.QuantileSketchAgg(es.head,
        if (es.length > 1) graft.functions.QSketchCodec.numArg(es(1))
        else 1e-4)))
    ext.injectFunction(fn("graft_countmin",
      es => graft.functions.CountMinAgg(
        QSketchCodec.arity(es, 3, "graft_countmin").head,
        QSketchCodec.intArg(es, 1, "graft_countmin"),
        QSketchCodec.intArg(es, 2, "graft_countmin"))))
    ext.injectFunction(fn("graft_cm_merge",
      es => graft.functions.CmMergeAgg(es.head)))
    ext.injectFunction(fn("graft_cm_union",
      es => graft.functions.CmUnion(es.head, es(1))))
    ext.injectFunction(fn("graft_cm_estimate",
      es => graft.functions.CmEstimate(es.head, es(1))))
    ext.injectFunction(fn("graft_theta",
      es => graft.functions.ThetaSketchAgg(
        QSketchCodec.arity(es, 2, "graft_theta").head,
        QSketchCodec.intArg(es, 1, "graft_theta"))))
    ext.injectFunction(fn("graft_theta_merge",
      es => graft.functions.ThetaMergeAgg(
        QSketchCodec.arity(es, 1, "graft_theta_merge").head)))
    ext.injectFunction(fn("graft_theta_estimate",
      es => graft.functions.ThetaEstimate(
        QSketchCodec.arity(es, 1, "graft_theta_estimate").head)))
    ext.injectFunction(fn("graft_theta_setop",
      es => {
        val a = QSketchCodec.arity(es, 3, "graft_theta_setop")
        graft.functions.ThetaSetOp(a.head, a(1), a(2))
      }))
    ext.injectFunction(fn("graft_quantile_merge",
      es => graft.functions.QuantileMergeAgg(es.head)))
    ext.injectFunction(fn("graft_quantile_estimate",
      es => graft.functions.QuantileEstimate(es.head, es(1))))
    ext.injectFunction(fn("graft_quantile_union",
      es => graft.functions.QuantileUnion(es.head, es(1))))
  }
}
