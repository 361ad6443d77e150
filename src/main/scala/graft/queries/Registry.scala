package graft.queries

import graft.QuerySpec

/** Single source of truth for the engine's declared query inventory. */
object Registry {
  def all: Seq[QuerySpec] =
    Parity.all ++ Parity2.all ++ Parity3.all ++ Benchmarkish.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      StreamingQueries.all ++ ScaleQueries.all ++ IngestQueries.all ++
      E2eQueries.all ++ OpsQueries.all ++ AnalyticsQueries.all ++
      LinkageQueries.all ++ QoiQueries.all ++ WarehouseQueries.all ++
      LayoutQueries.all ++ EvalQueries.all ++ StatsQueries.all ++
      IntervalQueries.all ++ GraphQueries.all ++ EngineQueries.all ++
      AqpQueries.all ++ JourneyQueries.all ++ MlQueries.all ++
      MatchQueries.all ++ PlanningQueries.all ++ VisionQueries.all ++
      Wave15Queries.all ++ Wave16Queries.all ++ Wave17Queries.all ++
      Wave18Queries.all ++ Wave19Queries.all ++ Wave20Queries.all
}
