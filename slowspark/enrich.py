"""Broadcast-lookup enrichment (BASELINE.json north_star).

The reference has no joins (SURVEY.md §2.2); these are target-only stages.
Both dims are tiny (host_dc ~1k rows, lang_locale <=50), so the joins are
explicit broadcast hash joins — zero shuffle of the 10^12-row fact side.
Left joins: unmatched hosts/langs keep NULL enrichment, never drop rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich(entries: DataFrame, host_dc: DataFrame, lang_locale: DataFrame) -> DataFrame:
    """entries + datacenter (host->dc) + locale (lang->locale).

    .explain() must show BroadcastHashJoin on both — pinned by
    tests/test_pipeline.py::test_enrich_plan_is_broadcast.
    """
    return (
        entries
        .join(F.broadcast(host_dc), on="host", how="left")
        .join(F.broadcast(lang_locale), on="lang", how="left")
    )
