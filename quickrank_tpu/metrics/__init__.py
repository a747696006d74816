from quickrank_tpu.metrics.metrics import (
    Dcg,
    Map,
    Metric,
    Ndcg,
    Rmse,
    Tndcg,
    metric_factory,
)

__all__ = [
    "Dcg",
    "Map",
    "Metric",
    "Ndcg",
    "Rmse",
    "Tndcg",
    "metric_factory",
]
