package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.catalog.CatalogOracle
import graft.llm.{Als, BinaryQuantization, BradleyTerry, Calibration, ClusterEval, CdcChunking, BpeTrain, CompressionSignal, DiversityStats, Lsa, Pca, UnigramLm, Contamination, CorpusOps, DedupQueries, EmbeddingDedup, ImportanceWeights, KMeans, Matryoshka, MultimodalOracle, PerceptualHash, LogisticRegression, NaiveBayes, PiiRedaction, ProductQuantization, TextAnalysis, TextPipeline, VectorSearch, VectorStats}
import graft.relational.{AllocationQueries, BenfordAudit, SlidingDistinct, VariantQueries, Sql4Surfaces, HierarchyRollup, SplitFinding, TreeGrow, AnalyticalQueries, BitemporalQueries, BitmapQueries, BucketedQueries, FeaturePrepQueries, IncrementalQueries, JourneyQueries, PrivacyAudit, RelationalQueries, ReplicaReconcile, NullSemantics, ReshapeStatsQueries, ScalarQueries, SelectionMedian, SketchAggregates, StatInference, SurrogateKeys, TableStatsQueries, TimeSeriesQueries, TpchCompletionQueries, TpchShapeQueries, WindowAggQueries}
import graft.operators.{Dbscan, GeoGridJoin, Hits, IntervalJoin, Isotonic, KCore, LabelPropagation, PageRank, ShortestPaths, Skyline, TriangleCount}
import graft.sources.{BinaryFiles, CsvScan, FixedWidthScan, DynamicOverwrite, FbcSource, Federation, HilbertLayout, K8sObjects, LayoutQueries, OrcSource, QuarantineIngest, SchemaEvolution, XmlSource, ZOrderQueries}
import graft.streaming.StreamShapeQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query maps; every entry here is an operator
  * from SURVEY.md §2.b, and every oracle-checkable one has a matching
  * DuckDB SQL string with identical output column names.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  private val modules = Seq(
    (RelationalQueries.queries, RelationalQueries.oracleSql),
    (WindowAggQueries.queries, WindowAggQueries.oracleSql),
    (ScalarQueries.queries, ScalarQueries.oracleSql),
    (StreamShapeQueries.queries, StreamShapeQueries.oracleSql),
    (DedupQueries.queries, DedupQueries.oracleSql),
    (EmbeddingDedup.queries, EmbeddingDedup.oracleSql),
    (TextAnalysis.queries, TextAnalysis.oracleSql),
    (VectorSearch.queries, VectorSearch.oracleSql),
    (TextPipeline.queries, TextPipeline.oracleSql),
    (CsvScan.queries, CsvScan.oracleSql),
    (CatalogOracle.queries, CatalogOracle.oracleSql),
    (K8sObjects.queries, K8sObjects.oracleSql),
    (BucketedQueries.queries, BucketedQueries.oracleSql),
    (AnalyticalQueries.queries, AnalyticalQueries.oracleSql),
    (ReshapeStatsQueries.queries, ReshapeStatsQueries.oracleSql),
    (IncrementalQueries.queries, IncrementalQueries.oracleSql),
    (TimeSeriesQueries.queries, TimeSeriesQueries.oracleSql),
    (graft.relational.QualityAuditQueries.queries, graft.relational.QualityAuditQueries.oracleSql),
    (LayoutQueries.queries, LayoutQueries.oracleSql),
    (IntervalJoin.queries, IntervalJoin.oracleSql),
    (OrcSource.queries, OrcSource.oracleSql),
    (ZOrderQueries.queries, ZOrderQueries.oracleSql),
    (TableStatsQueries.queries, TableStatsQueries.oracleSql),
    (QuarantineIngest.queries, QuarantineIngest.oracleSql),
    (CorpusOps.queries, CorpusOps.oracleSql),
    (VectorStats.queries, VectorStats.oracleSql),
    (PageRank.queries, PageRank.oracleSql),
    (BpeTrain.queries, BpeTrain.oracleSql),
    (SchemaEvolution.queries, SchemaEvolution.oracleSql),
    (TriangleCount.queries, TriangleCount.oracleSql),
    (ProductQuantization.queries, ProductQuantization.oracleSql),
    (graft.plans.TopK.queries, graft.plans.TopK.oracleSql),
    (BinaryFiles.queries, BinaryFiles.oracleSql),
    (Federation.queries, Federation.oracleSql),
    (DynamicOverwrite.queries, DynamicOverwrite.oracleSql),
    (MultimodalOracle.queries, MultimodalOracle.oracleSql),
    (graft.plans.SortedRuns.queries, graft.plans.SortedRuns.oracleSql),
    (graft.sources.DeletionVectors.queries, graft.sources.DeletionVectors.oracleSql),
    (TpchShapeQueries.queries, TpchShapeQueries.oracleSql),
    (Skyline.queries, Skyline.oracleSql),
    (XmlSource.queries, XmlSource.oracleSql),
    (TpchCompletionQueries.queries, TpchCompletionQueries.oracleSql),
    (Contamination.queries, Contamination.oracleSql),
    (PiiRedaction.queries, PiiRedaction.oracleSql),
    (NullSemantics.queries, NullSemantics.oracleSql),
    (SketchAggregates.queries, SketchAggregates.oracleSql),
    (ImportanceWeights.queries, ImportanceWeights.oracleSql),
    (PrivacyAudit.queries, PrivacyAudit.oracleSql),
    (Matryoshka.queries, Matryoshka.oracleSql),
    (PerceptualHash.queries, PerceptualHash.oracleSql),
    (BitemporalQueries.queries, BitemporalQueries.oracleSql),
    (HilbertLayout.queries, HilbertLayout.oracleSql),
    (graft.plans.AsOfMergeJoin.queries, graft.plans.AsOfMergeJoin.oracleSql),
    (JourneyQueries.queries, JourneyQueries.oracleSql),
    (StatInference.queries, StatInference.oracleSql),
    (ShortestPaths.queries, ShortestPaths.oracleSql),
    (VariantQueries.queries, VariantQueries.oracleSql),
    (Sql4Surfaces.queries, Sql4Surfaces.oracleSql),
    (BinaryQuantization.queries, BinaryQuantization.oracleSql),
    (KMeans.queries, KMeans.oracleSql),
    (FbcSource.queries, FbcSource.oracleSql),
    (LabelPropagation.queries, LabelPropagation.oracleSql),
    (Dbscan.queries, Dbscan.oracleSql),
    (graft.plans.PlanLineage.queries, graft.plans.PlanLineage.oracleSql),
    (graft.plans.PlanMetrics.queries, graft.plans.PlanMetrics.oracleSql),
    (BitmapQueries.queries, BitmapQueries.oracleSql),
    (Pca.queries, Pca.oracleSql),
    (UnigramLm.queries, UnigramLm.oracleSql),
    (CompressionSignal.queries, CompressionSignal.oracleSql),
    (Isotonic.queries, Isotonic.oracleSql),
    (KCore.queries, KCore.oracleSql),
    (FeaturePrepQueries.queries, FeaturePrepQueries.oracleSql),
    (GeoGridJoin.queries, GeoGridJoin.oracleSql),
    (AllocationQueries.queries, AllocationQueries.oracleSql),
    (FixedWidthScan.queries, FixedWidthScan.oracleSql),
    (SurrogateKeys.queries, SurrogateKeys.oracleSql),
    (SelectionMedian.queries, SelectionMedian.oracleSql),
    (Hits.queries, Hits.oracleSql),
    (Lsa.queries, Lsa.oracleSql),
    (ReplicaReconcile.queries, ReplicaReconcile.oracleSql),
    (NaiveBayes.queries, NaiveBayes.oracleSql),
    (LogisticRegression.queries, LogisticRegression.oracleSql),
    (HierarchyRollup.queries, HierarchyRollup.oracleSql),
    (CdcChunking.queries, CdcChunking.oracleSql),
    (Als.queries, Als.oracleSql),
    (SplitFinding.queries, SplitFinding.oracleSql),
    (TreeGrow.queries, TreeGrow.oracleSql),
    (BradleyTerry.queries, BradleyTerry.oracleSql),
    (ClusterEval.queries, ClusterEval.oracleSql),
    (Calibration.queries, Calibration.oracleSql),
    (DiversityStats.queries, DiversityStats.oracleSql),
    (graft.llm.Winnowing.queries, graft.llm.Winnowing.oracleSql),
    (graft.sources.Sharding.queries, graft.sources.Sharding.oracleSql),
    (graft.llm.FeatureHashing.queries, graft.llm.FeatureHashing.oracleSql),
    (graft.llm.RandomProjection.queries, graft.llm.RandomProjection.oracleSql),
    (graft.llm.ClassifierAgreement.queries, graft.llm.ClassifierAgreement.oracleSql),
    (SlidingDistinct.queries, SlidingDistinct.oracleSql),
    (graft.sources.PostingsIndex.queries, graft.sources.PostingsIndex.oracleSql),
    (graft.llm.DelongAuc.queries, graft.llm.DelongAuc.oracleSql),
    (graft.llm.WordPieceQuery.queries, graft.llm.WordPieceQuery.oracleSql),
    (graft.llm.SuffixArray.queries, graft.llm.SuffixArray.oracleSql),
    (graft.operators.Louvain.queries, graft.operators.Louvain.oracleSql),
    (graft.llm.Opq.queries, graft.llm.Opq.oracleSql),
    (graft.operators.GraphServe.queries, graft.operators.GraphServe.oracleSql),
    (graft.llm.BbitMinhash.queries, graft.llm.BbitMinhash.oracleSql),
    (graft.llm.PmiFeatures.queries, graft.llm.PmiFeatures.oracleSql),
    (graft.operators.IsolationTree.queries, graft.operators.IsolationTree.oracleSql),
    (graft.operators.Hnsw.queries, graft.operators.Hnsw.oracleSql),
    (graft.operators.RecordLinkage.queries, graft.operators.RecordLinkage.oracleSql),
    (graft.operators.Coreset.queries, graft.operators.Coreset.oracleSql),
    (graft.operators.SubmodularSelect.queries, graft.operators.SubmodularSelect.oracleSql),
    (BenfordAudit.queries, BenfordAudit.oracleSql),
    (graft.operators.GraphInsert.queries, graft.operators.GraphInsert.oracleSql),
    (graft.llm.BinPacking.queries, graft.llm.BinPacking.oracleSql),
    (graft.operators.FilteredServe.queries, graft.operators.FilteredServe.oracleSql),
    (graft.llm.RefinedServe.queries, graft.llm.RefinedServe.oracleSql),
    (graft.operators.FunctionalScc.queries, graft.operators.FunctionalScc.oracleSql),
    (graft.llm.MmrSelect.queries, graft.llm.MmrSelect.oracleSql),
    (graft.relational.QuantileNormalize.queries, graft.relational.QuantileNormalize.oracleSql),
    (graft.llm.Word2vecPrep.queries, graft.llm.Word2vecPrep.oracleSql),
    (graft.relational.CausalStratification.queries, graft.relational.CausalStratification.oracleSql),
    (graft.relational.Raking.queries, graft.relational.Raking.oracleSql),
    (graft.relational.SpearmanCorr.queries, graft.relational.SpearmanCorr.oracleSql),
    (graft.relational.KendallTau.queries, graft.relational.KendallTau.oracleSql),
    (graft.relational.CountSketch.queries, graft.relational.CountSketch.oracleSql),
    (graft.operators.ButterflyCount.queries, graft.operators.ButterflyCount.oracleSql),
    (graft.relational.DynamicPivot.queries, graft.relational.DynamicPivot.oracleSql),
    (graft.operators.Hits.queries, graft.operators.Hits.oracleSql),
    (graft.llm.BprTriplets.queries, graft.llm.BprTriplets.oracleSql),
    (graft.relational.DictionaryEncode.queries, graft.relational.DictionaryEncode.oracleSql),
    (graft.llm.BlocklistScan.queries, graft.llm.BlocklistScan.oracleSql),
    (graft.llm.HuffmanCost.queries, graft.llm.HuffmanCost.oracleSql),
    (graft.llm.RankOverlap.queries, graft.llm.RankOverlap.oracleSql),
    (graft.operators.HyperBall.queries, graft.operators.HyperBall.oracleSql),
    (graft.operators.RandomWalks.queries, graft.operators.RandomWalks.oracleSql),
    (graft.relational.VOptimalHistogram.queries, graft.relational.VOptimalHistogram.oracleSql),
    (graft.relational.WaveletSynopsis.queries, graft.relational.WaveletSynopsis.oracleSql))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
