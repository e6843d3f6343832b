"""Optional result sinks: Elasticsearch documents and the summary email.

The reference optionally ships results to Elasticsearch
(Pipeline/StoreResultToES.pm:35-92, opt-in via DbDataChecks_conf.pm:80-84)
and emails a per-database rollup (DataCheckSummary.pm:110-176).  Here the
same facts are produced by *pure renderers* — `es_bulk_payload` builds the
ES `_bulk` NDJSON body, `render_summary_email` builds the RFC-2822 message
— with thin transports on top.  Both transports accept a filesystem
`path`, so an air-gapped cluster (this sandbox included) writes the exact
wire payload to durable storage for a deployment-side relay to ship;
live HTTP/SMTP delivery is attempted only when an endpoint is configured.

The engine's durable outputs remain the checkpoint + violations tables
and the JSON/TAP reports (plans/reports.py); these sinks are additive,
exactly like the reference's opt-in pipeline stages.
"""

from __future__ import annotations

import json
import smtplib
import urllib.request
from email.message import EmailMessage
from pathlib import Path
from typing import Any

from ensembl_datacheck_spark.plans.fleet import FleetSummary
from ensembl_datacheck_spark.verdict import RunSummary

# DataCheckSummary.pm:164 — the JSON report is attached only under 2 MB
_ATTACH_LIMIT_BYTES = 2_000_000


# --------------------------------------------------------------------------
# Elasticsearch (StoreResultToES.pm analogue)
# --------------------------------------------------------------------------

def es_documents(
    summary: RunSummary | FleetSummary,
    *,
    run_id: str | None = None,
    input_details: dict[str, Any] | None = None,
) -> list[tuple[str, dict[str, Any]]]:
    """(doc_id, document) pairs for one run.

    One run-level document mirrors the reference's single indexed report
    (StoreResultToES.pm:76-86: job_id + full JSON content + the submitted
    input parameters); one document per check is added on top so the
    index is aggregable by check name / status without client-side JSON
    parsing — the per-check granularity the reference keeps in its
    datacheck_results table (DataCheckSummary.pm:53-57).

    A FleetSummary fans out per database — doc ids gain a ``/dbname``
    segment (the reference indexes one report per database run too:
    StoreResultToES.pm:51 takes dbname from the job) — and each errored
    target contributes a ``run_error`` document so an aborted database
    is visible in the index, not silently absent.
    """
    rid = run_id or "run"
    if isinstance(summary, FleetSummary):
        docs: list[tuple[str, dict[str, Any]]] = []
        for dbname in sorted(summary.by_db):
            docs.extend(
                es_documents(
                    summary.by_db[dbname],
                    run_id=f"{rid}/{dbname}",
                    input_details={**(input_details or {}), "dbname": dbname},
                )
            )
        for dbname in sorted(summary.errors):
            docs.append(
                (
                    f"{rid}/{dbname}:error",
                    {
                        "doc_kind": "run_error",
                        "run_id": f"{rid}/{dbname}",
                        "error": summary.errors[dbname],
                        "input_details": {**(input_details or {}),
                                          "dbname": dbname},
                    },
                )
            )
        return docs
    docs: list[tuple[str, dict[str, Any]]] = [
        (
            f"{rid}:summary",
            {
                "doc_kind": "run_summary",
                "run_id": rid,
                "passed": summary.n_passed,
                "failed": summary.n_failed,
                "skipped": summary.n_skipped,
                "wall_runtime_sec": round(summary.wall_runtime, 3),
                "content": summary.to_json(failures_only=True, indent=None),
                "input_details": input_details or {},
            },
        )
    ]
    for r in summary.results:
        doc = r.to_dict()
        doc["doc_kind"] = "check_result"
        doc["run_id"] = rid
        # reserved-prefix scheme: per-check ids live under ':check/' so a
        # check literally named 'summary' can never collide with the run
        # document's '{rid}:summary' id (ES upserts silently on _id ties)
        docs.append((f"{rid}:check/{r.check_name}", doc))
    return docs


def es_bulk_payload(
    summary: RunSummary | FleetSummary,
    index: str,
    *,
    run_id: str | None = None,
    input_details: dict[str, Any] | None = None,
) -> str:
    """ES ``_bulk`` NDJSON body: alternating action and source lines,
    newline-terminated (the bulk API rejects a body without the trailing
    newline).  Deterministic doc ids make re-runs idempotent upserts."""
    lines: list[str] = []
    for doc_id, doc in es_documents(summary, run_id=run_id, input_details=input_details):
        lines.append(json.dumps({"index": {"_index": index, "_id": doc_id}}))
        lines.append(json.dumps(doc, sort_keys=True, default=str))
    return "\n".join(lines) + "\n"


def store_to_elasticsearch(
    summary: RunSummary | FleetSummary,
    index: str,
    hosts: list[str] | None = None,
    *,
    path: str | Path | None = None,
    run_id: str | None = None,
    input_details: dict[str, Any] | None = None,
    timeout: float = 10.0,
) -> str:
    """Ship the run to Elasticsearch (StoreResultToES.pm run() analogue).

    Exactly one destination: ``path`` writes the bulk payload to a file
    (the offline/relay mode); ``hosts`` POSTs it to ``{host}/_bulk`` via
    stdlib urllib — no client-library dependency.  Returns the payload so
    callers can log or re-ship it.
    """
    payload = es_bulk_payload(
        summary, index, run_id=run_id, input_details=input_details
    )
    if (path is None) == (hosts is None):
        raise ValueError("exactly one of `path` (bulk file) or `hosts` required")
    if path is not None:
        Path(path).write_text(payload)
        return payload
    errors: list[str] = []
    for host in hosts:  # type: ignore[union-attr]
        url = host.rstrip("/") + "/_bulk"
        req = urllib.request.Request(
            url,
            data=payload.encode("utf-8"),
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = json.loads(resp.read().decode("utf-8"))
            if body.get("errors"):
                failed = [
                    item["index"].get("error")
                    for item in body.get("items", [])
                    if item.get("index", {}).get("error")
                ]
                raise RuntimeError(f"ES bulk partial failure on {url}: {failed[:5]}")
            return payload  # first healthy node wins, like cxn_pool=Static
        except (OSError, ValueError) as exc:  # connection/parse errors: next node
            errors.append(f"{url}: {exc}")
    raise ConnectionError(f"all ES hosts failed: {errors}")


# --------------------------------------------------------------------------
# Summary email (DataCheckSummary.pm:110-176 analogue)
# --------------------------------------------------------------------------

def _per_db(summary: RunSummary | FleetSummary) -> dict[str, RunSummary]:
    if isinstance(summary, FleetSummary):
        return dict(summary.by_db)
    return {"default": summary}


def render_summary_email(
    summary: RunSummary | FleetSummary,
    *,
    tag: str | None = None,
    history_file: str | None = None,
    output_dir: str | None = None,
    json_output_file: str | None = None,
    json_passed: bool = False,
) -> tuple[str, str]:
    """(subject, body) with the reference's exact information content
    (DataCheckSummary.pm:set_email_parameters): PASS/FAIL subject with
    optional tag; totals counted per *database* (a db fails if any of its
    checks failed, :68); per-db passed/failed/skipped detail lines;
    history-file / output-dir / JSON-file provenance notes."""
    per_db = _per_db(summary)
    fleet_errors = summary.errors if isinstance(summary, FleetSummary) else {}
    failed_total = sum(1 for s in per_db.values() if s.n_failed) + len(fleet_errors)
    passed_total = sum(1 for s in per_db.values() if not s.n_failed)

    subject = "FAIL: Datacheck Summary" if failed_total else "PASS: Datacheck Summary"
    if tag is not None:
        subject += f" ({tag})"

    passed_db = "database" if passed_total == 1 else "databases"
    failed_db = "database" if failed_total == 1 else "databases"
    text = (
        "All datachecks have completed.\n"
        f"{passed_total} {passed_db} passed all datachecks, "
        f"{failed_total} {failed_db} failed one or more datachecks.\n"
    )
    if tag is not None:
        text += f"Submission tag: {tag}\n"

    db_text = ""
    for dbname in sorted(per_db):
        s = per_db[dbname]
        db_text += (
            f"\tpassed: {s.n_passed}\tfailed: {s.n_failed}"
            f"\tskipped: {s.n_skipped}\t{dbname}\n"
        )
    for dbname in sorted(fleet_errors):
        db_text += f"\terror (run aborted): {dbname}\n"
    text += f"Details:\n{db_text}"

    if history_file is not None:
        text += f"The datacheck results were stored in a history file: {history_file}\n"
    else:
        text += "The datacheck results were not stored in a history file.\n"
    if output_dir is not None:
        text += f"The full output of the datachecks were stored in: {output_dir}\n"
    else:
        text += "The full output of the datachecks were not stored.\n"
    if json_output_file is not None:
        kind = "All results" if json_passed else "Failures"
        text += f"{kind} were stored in JSON format: {json_output_file}\n"
    else:
        text += "The results were not stored in JSON format.\n"
    return subject, text


def email_summary(
    summary: RunSummary | FleetSummary,
    to: list[str],
    smtp_host: str | None = None,
    *,
    path: str | Path | None = None,
    sender: str = "datachecks@localhost",
    tag: str | None = None,
    history_file: str | None = None,
    output_dir: str | None = None,
    json_output_file: str | None = None,
    json_passed: bool = False,
) -> EmailMessage:
    """Build — and optionally deliver — the summary email.

    ``path`` writes the RFC-2822 message to a ``.eml`` file (offline
    mode); ``smtp_host`` hands it to stdlib smtplib.  The JSON report is
    attached when present and under the reference's 2 MB cap
    (DataCheckSummary.pm:164-168); above the cap a body note explains the
    omission, byte-for-byte the reference's behavior.
    """
    subject, text = render_summary_email(
        summary,
        tag=tag,
        history_file=history_file,
        output_dir=output_dir,
        json_output_file=json_output_file,
        json_passed=json_passed,
    )
    attach: Path | None = None
    if json_output_file is not None:
        candidate = Path(json_output_file)
        if candidate.is_file():
            if candidate.stat().st_size < _ATTACH_LIMIT_BYTES:
                attach = candidate
            else:
                text += "(JSON file not attached because it exceeds 2MB limit)"

    msg = EmailMessage()
    msg["Subject"] = subject
    msg["From"] = sender
    msg["To"] = ", ".join(to)
    msg.set_content(text)
    if attach is not None:
        msg.add_attachment(
            attach.read_bytes(),
            maintype="application",
            subtype="json",
            filename=attach.name,
        )

    if path is not None:
        Path(path).write_bytes(bytes(msg))
    if smtp_host is not None:
        host, _, port = smtp_host.partition(":")
        with smtplib.SMTP(host, int(port) if port else 25, timeout=10) as smtp:
            smtp.send_message(msg)
    return msg
