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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ WindowAggQueries.queries ++
      ScalarQueries.queries ++ StreamShapeQueries.queries ++
      DedupQueries.queries ++ EmbeddingDedup.queries ++ TextAnalysis.queries ++ VectorSearch.queries ++
      TextPipeline.queries ++ CsvScan.queries ++ CatalogOracle.queries ++
      K8sObjects.queries ++ BucketedQueries.queries ++
      AnalyticalQueries.queries ++ ReshapeStatsQueries.queries ++
      IncrementalQueries.queries ++ TimeSeriesQueries.queries ++
      graft.relational.QualityAuditQueries.queries ++ LayoutQueries.queries ++
      IntervalJoin.queries ++ OrcSource.queries ++ ZOrderQueries.queries ++
      TableStatsQueries.queries ++ QuarantineIngest.queries ++
      CorpusOps.queries ++ VectorStats.queries ++ PageRank.queries ++
      BpeTrain.queries ++ SchemaEvolution.queries ++ TriangleCount.queries ++
      ProductQuantization.queries ++ graft.plans.TopK.queries ++ BinaryFiles.queries ++ Federation.queries ++ DynamicOverwrite.queries ++
      MultimodalOracle.queries ++ graft.plans.SortedRuns.queries ++
      graft.sources.DeletionVectors.queries ++ TpchShapeQueries.queries ++
      Skyline.queries ++ XmlSource.queries ++ TpchCompletionQueries.queries ++ Contamination.queries ++ PiiRedaction.queries ++ NullSemantics.queries ++ SketchAggregates.queries ++
      ImportanceWeights.queries ++ PrivacyAudit.queries ++ Matryoshka.queries ++
      PerceptualHash.queries ++ BitemporalQueries.queries ++ HilbertLayout.queries ++
      graft.plans.AsOfMergeJoin.queries ++ JourneyQueries.queries ++
      StatInference.queries ++ ShortestPaths.queries ++ VariantQueries.queries ++ Sql4Surfaces.queries ++
      BinaryQuantization.queries ++ KMeans.queries ++ FbcSource.queries ++
      LabelPropagation.queries ++ Dbscan.queries ++ graft.plans.PlanLineage.queries ++
      graft.plans.PlanMetrics.queries ++ BitmapQueries.queries ++ Pca.queries ++ UnigramLm.queries ++ CompressionSignal.queries ++ Isotonic.queries ++ KCore.queries ++ FeaturePrepQueries.queries ++ GeoGridJoin.queries ++ AllocationQueries.queries ++ FixedWidthScan.queries ++ SurrogateKeys.queries ++ SelectionMedian.queries ++ Hits.queries ++ Lsa.queries ++ ReplicaReconcile.queries ++ NaiveBayes.queries ++ LogisticRegression.queries ++ HierarchyRollup.queries ++ CdcChunking.queries ++ Als.queries ++ SplitFinding.queries ++ TreeGrow.queries ++ BradleyTerry.queries ++ ClusterEval.queries ++ Calibration.queries ++ DiversityStats.queries ++ graft.llm.Winnowing.queries ++ graft.sources.Sharding.queries ++ graft.llm.FeatureHashing.queries ++ graft.llm.RandomProjection.queries ++ graft.llm.ClassifierAgreement.queries ++ SlidingDistinct.queries ++ graft.sources.PostingsIndex.queries ++ graft.llm.DelongAuc.queries ++ graft.llm.WordPieceQuery.queries ++ graft.llm.SuffixArray.queries ++ graft.operators.Louvain.queries ++ graft.llm.Opq.queries ++ graft.operators.GraphServe.queries ++ graft.llm.BbitMinhash.queries ++ graft.llm.PmiFeatures.queries ++ graft.operators.IsolationTree.queries ++ graft.operators.Hnsw.queries ++ graft.operators.RecordLinkage.queries ++ graft.operators.Coreset.queries ++ graft.operators.SubmodularSelect.queries ++ BenfordAudit.queries ++ graft.operators.GraphInsert.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ WindowAggQueries.oracleSql ++
      ScalarQueries.oracleSql ++ StreamShapeQueries.oracleSql ++
      DedupQueries.oracleSql ++ EmbeddingDedup.oracleSql ++ TextAnalysis.oracleSql ++
      VectorSearch.oracleSql ++ TextPipeline.oracleSql ++
      CsvScan.oracleSql ++ CatalogOracle.oracleSql ++ K8sObjects.oracleSql ++
      BucketedQueries.oracleSql ++ AnalyticalQueries.oracleSql ++
      ReshapeStatsQueries.oracleSql ++ IncrementalQueries.oracleSql ++
      TimeSeriesQueries.oracleSql ++
      graft.relational.QualityAuditQueries.oracleSql ++
      LayoutQueries.oracleSql ++ IntervalJoin.oracleSql ++
      OrcSource.oracleSql ++ ZOrderQueries.oracleSql ++
      TableStatsQueries.oracleSql ++ QuarantineIngest.oracleSql ++
      CorpusOps.oracleSql ++ VectorStats.oracleSql ++ PageRank.oracleSql ++
      BpeTrain.oracleSql ++ SchemaEvolution.oracleSql ++
      TriangleCount.oracleSql ++ ProductQuantization.oracleSql ++
      graft.plans.TopK.oracleSql ++ BinaryFiles.oracleSql ++ Federation.oracleSql ++ DynamicOverwrite.oracleSql ++
      MultimodalOracle.oracleSql ++ graft.plans.SortedRuns.oracleSql ++
      graft.sources.DeletionVectors.oracleSql ++ TpchShapeQueries.oracleSql ++
      Skyline.oracleSql ++ XmlSource.oracleSql ++ TpchCompletionQueries.oracleSql ++ Contamination.oracleSql ++ PiiRedaction.oracleSql ++ NullSemantics.oracleSql ++ SketchAggregates.oracleSql ++
      ImportanceWeights.oracleSql ++ PrivacyAudit.oracleSql ++ Matryoshka.oracleSql ++
      PerceptualHash.oracleSql ++ BitemporalQueries.oracleSql ++ HilbertLayout.oracleSql ++
      graft.plans.AsOfMergeJoin.oracleSql ++ JourneyQueries.oracleSql ++
      StatInference.oracleSql ++ ShortestPaths.oracleSql ++ VariantQueries.oracleSql ++ Sql4Surfaces.oracleSql ++
      BinaryQuantization.oracleSql ++ KMeans.oracleSql ++ FbcSource.oracleSql ++
      LabelPropagation.oracleSql ++ Dbscan.oracleSql ++ graft.plans.PlanLineage.oracleSql ++
      graft.plans.PlanMetrics.oracleSql ++ BitmapQueries.oracleSql ++ Pca.oracleSql ++ UnigramLm.oracleSql ++ CompressionSignal.oracleSql ++ Isotonic.oracleSql ++ KCore.oracleSql ++ FeaturePrepQueries.oracleSql ++ GeoGridJoin.oracleSql ++ AllocationQueries.oracleSql ++ FixedWidthScan.oracleSql ++ SurrogateKeys.oracleSql ++ SelectionMedian.oracleSql ++ Hits.oracleSql ++ Lsa.oracleSql ++ ReplicaReconcile.oracleSql ++ NaiveBayes.oracleSql ++ LogisticRegression.oracleSql ++ HierarchyRollup.oracleSql ++ CdcChunking.oracleSql ++ Als.oracleSql ++ SplitFinding.oracleSql ++ TreeGrow.oracleSql ++ BradleyTerry.oracleSql ++ ClusterEval.oracleSql ++ Calibration.oracleSql ++ DiversityStats.oracleSql ++ graft.llm.Winnowing.oracleSql ++ graft.sources.Sharding.oracleSql ++ graft.llm.FeatureHashing.oracleSql ++ graft.llm.RandomProjection.oracleSql ++ graft.llm.ClassifierAgreement.oracleSql ++ SlidingDistinct.oracleSql ++ graft.sources.PostingsIndex.oracleSql ++ graft.llm.DelongAuc.oracleSql ++ graft.llm.WordPieceQuery.oracleSql ++ graft.llm.SuffixArray.oracleSql ++ graft.operators.Louvain.oracleSql ++ graft.llm.Opq.oracleSql ++ graft.operators.GraphServe.oracleSql ++ graft.llm.BbitMinhash.oracleSql ++ graft.llm.PmiFeatures.oracleSql ++ graft.operators.IsolationTree.oracleSql ++ graft.operators.Hnsw.oracleSql ++ graft.operators.RecordLinkage.oracleSql ++ graft.operators.Coreset.oracleSql ++ graft.operators.SubmodularSelect.oracleSql ++ BenfordAudit.oracleSql ++ graft.operators.GraphInsert.oracleSql
}
