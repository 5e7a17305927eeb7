from lsh_forest_for_multi_vector_retrieval_spark.sinks.plots import (
    cluster_size_histogram_png,
    dedup_report_pngs,
    forest_statistics_png,
    histogram_bins,
    histogram_png,
    line_png,
    scatter_identity_png,
    scatter_trend_png,
    similarity_heatmap_png,
)

__all__ = [
    "cluster_size_histogram_png",
    "dedup_report_pngs",
    "forest_statistics_png",
    "histogram_bins",
    "histogram_png",
    "line_png",
    "scatter_identity_png",
    "scatter_trend_png",
    "similarity_heatmap_png",
]
