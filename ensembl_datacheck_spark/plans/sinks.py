"""Optional result sinks.

The reference optionally ships results to Elasticsearch
(Pipeline/StoreResultToES.pm, opt-in via DbDataChecks_conf.pm:80-84) and
emails a summary (DataCheckSummary.pm:110-176).  Both are deliberate
stub interfaces here (SURVEY.md §7.4): the engine's durable outputs are
the checkpoint + violations tables and the JSON/TAP reports
(plans/reports.py); network sinks are deployment concerns."""

from __future__ import annotations

from ensembl_datacheck_spark.verdict import RunSummary


def store_to_elasticsearch(summary: RunSummary, index: str, hosts: list[str]) -> None:
    raise NotImplementedError(
        "Elasticsearch sink is a deployment-side integration: POST "
        "summary.to_dict() documents to the ES bulk API (the reference's "
        "StoreResultToES analogue). Kept as a stub — no network sinks in "
        "this environment."
    )


def email_summary(summary: RunSummary, to: list[str], smtp_host: str) -> None:
    raise NotImplementedError(
        "Email sink stub (DataCheckSummary.pm analogue): render "
        "reports.summary_line(summary) + failures into a message. "
        "Deployment-side integration."
    )
