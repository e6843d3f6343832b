"""Sinks: ES bulk payload (StoreResultToES.pm analogue) and summary email
(DataCheckSummary.pm:110-176 analogue).  Pure renderers — no Spark, no
network; the offline `path` transports are exercised for real."""

from __future__ import annotations

import json
from email import message_from_bytes

import pytest

from ensembl_datacheck_spark.plans import sinks
from ensembl_datacheck_spark.plans.fleet import FleetSummary
from ensembl_datacheck_spark.verdict import (
    AssertionResult,
    CheckResult,
    RunSummary,
    Status,
)


def _summary(n_ok: int = 1, n_fail: int = 1) -> RunSummary:
    results = []
    for i in range(n_ok):
        results.append(
            CheckResult(
                check_name=f"ok_{i}",
                assertions=[AssertionResult("rows match", Status.OK)],
            ).finish()
        )
    for i in range(n_fail):
        results.append(
            CheckResult(
                check_name=f"fail_{i}",
                assertions=[
                    AssertionResult(
                        "no orphans", Status.FAIL, expected=0, got=3,
                        diag=["doc_id=a", "doc_id=b"],
                    )
                ],
                n_violations=3,
            ).finish()
        )
    return RunSummary(results=results)


def test_es_bulk_payload_shape():
    s = _summary(n_ok=2, n_fail=1)
    payload = sinks.es_bulk_payload(
        s, "datachecks", run_id="r1", input_details={"tag": "rel42"}
    )
    assert payload.endswith("\n")  # the bulk API requires the trailing newline
    lines = payload.strip().split("\n")
    # one action + one source line per doc; docs = 1 summary + 3 checks
    assert len(lines) == 2 * (1 + 3)
    actions = [json.loads(l) for l in lines[0::2]]
    sources = [json.loads(l) for l in lines[1::2]]
    assert all(a["index"]["_index"] == "datachecks" for a in actions)
    assert actions[0]["index"]["_id"] == "r1:summary"
    run_doc = sources[0]
    assert run_doc["doc_kind"] == "run_summary"
    assert (run_doc["passed"], run_doc["failed"]) == (2, 1)
    assert run_doc["input_details"] == {"tag": "rel42"}
    # content mirrors the reference's single-report document: the full
    # JSON report text (StoreResultToES.pm:83)
    assert json.loads(run_doc["content"])["failed"] == 1
    check_doc = next(d for d in sources if d.get("check_name") == "fail_0")
    assert check_doc["status"] == "fail" and check_doc["run_id"] == "r1"
    # deterministic ids -> idempotent re-index
    assert payload == sinks.es_bulk_payload(
        s, "datachecks", run_id="r1", input_details={"tag": "rel42"}
    )


def test_store_to_elasticsearch_file_mode_and_arg_guard(tmp_path):
    s = _summary()
    out = tmp_path / "bulk.ndjson"
    payload = sinks.store_to_elasticsearch(s, "idx", path=out, run_id="r2")
    assert out.read_text() == payload
    with pytest.raises(ValueError):
        sinks.store_to_elasticsearch(s, "idx")  # neither destination
    with pytest.raises(ValueError):
        sinks.store_to_elasticsearch(
            s, "idx", hosts=["http://x"], path=out
        )  # both


def test_render_summary_email_single_run():
    subject, text = sinks.render_summary_email(_summary(n_fail=1), tag="rel42")
    assert subject == "FAIL: Datacheck Summary (rel42)"
    assert "Submission tag: rel42" in text
    assert "0 databases passed all datachecks, 1 database failed" in text
    assert "\tpassed: 1\tfailed: 1\tskipped: 0\tdefault\n" in text
    # provenance notes present even when nothing was stored
    # (DataCheckSummary.pm:146-170 else-branches)
    assert "were not stored in a history file" in text
    assert "The results were not stored in JSON format." in text

    subject_ok, text_ok = sinks.render_summary_email(
        _summary(n_fail=0), history_file="/h.json", json_output_file="/r.json",
        json_passed=True,
    )
    assert subject_ok == "PASS: Datacheck Summary"
    assert "1 database passed all datachecks, 0 databases failed" in text_ok
    assert "history file: /h.json" in text_ok
    assert "All results were stored in JSON format: /r.json" in text_ok


def test_render_summary_email_fleet_counts_databases_not_checks():
    fleet = FleetSummary(
        by_db={"core_db": _summary(n_ok=3, n_fail=2), "ft_db": _summary(n_fail=0)},
        errors={"broken_db": "Traceback: boom"},
    )
    subject, text = sinks.render_summary_email(fleet)
    assert subject == "FAIL: Datacheck Summary"
    # 1 passing db, 1 failing db + 1 errored db (a broken run counts
    # against the fleet, fleet.py isolation semantics)
    assert "1 database passed all datachecks, 2 databases failed" in text
    assert "\tpassed: 3\tfailed: 2\tskipped: 0\tcore_db\n" in text
    assert "\terror (run aborted): broken_db\n" in text


def test_email_summary_eml_file_with_attachment(tmp_path):
    report = tmp_path / "report.json"
    report.write_text('{"failed": 1}\n')
    eml = tmp_path / "summary.eml"
    msg = sinks.email_summary(
        _summary(), ["ops@example.org"], path=eml,
        json_output_file=str(report), tag="rel42",
    )
    parsed = message_from_bytes(eml.read_bytes())
    assert parsed["Subject"] == "FAIL: Datacheck Summary (rel42)"
    assert parsed["To"] == "ops@example.org"
    attachments = [
        p for p in parsed.walk() if p.get_filename() == "report.json"
    ]
    assert len(attachments) == 1
    assert json.loads(attachments[0].get_payload(decode=True)) == {"failed": 1}
    assert msg["Subject"] == parsed["Subject"]


def test_email_summary_oversize_attachment_noted_not_attached(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(sinks, "_ATTACH_LIMIT_BYTES", 4)
    report = tmp_path / "report.json"
    report.write_text('{"failed": 0}\n')
    msg = sinks.email_summary(
        _summary(n_fail=0), ["ops@example.org"], json_output_file=str(report)
    )
    assert "exceeds 2MB limit" in msg.get_content()
    assert not any(p.get_filename() for p in msg.walk())


def test_es_documents_fleet_fans_out_per_database():
    fleet = FleetSummary(
        by_db={"core_db": _summary(n_ok=1, n_fail=1), "ft_db": _summary(n_fail=0)},
        errors={"broken_db": "Traceback: boom"},
    )
    docs = dict(sinks.es_documents(fleet, run_id="r9", input_details={"tag": "t"}))
    # per-db: summary + per-check docs, namespaced ids; plus the error doc
    assert "r9/core_db:summary" in docs and "r9/ft_db:summary" in docs
    assert docs["r9/core_db:summary"]["failed"] == 1
    # reserved-prefix ids: per-check docs live under ':check/' so a
    # check named 'summary' (or 'error') can never shadow the run docs
    assert docs["r9/core_db:check/fail_0"]["status"] == "fail"
    assert docs["r9/core_db:summary"]["input_details"] == {
        "tag": "t", "dbname": "core_db"
    }
    err = docs["r9/broken_db:error"]
    assert err["doc_kind"] == "run_error" and "boom" in err["error"]
    # bulk payload assembles without error and stays idempotent
    p = sinks.es_bulk_payload(fleet, "idx", run_id="r9")
    assert p == sinks.es_bulk_payload(fleet, "idx", run_id="r9")
    assert len(p.strip().split("\n")) == 2 * len(docs)


# ---------------------------------------------------------------------------
# live HTTP arm (StoreResultToES.pm run() over a real socket)
# ---------------------------------------------------------------------------

import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _EsStub(ThreadingHTTPServer):
    """Minimal ES _bulk endpoint: records requests, replies with a
    canned JSON body."""

    def __init__(self, response: dict):
        self.requests: list[tuple[str, str, bytes]] = []
        self.response = json.dumps(response).encode()
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API)
                body = self.rfile.read(int(self.headers["Content-Length"]))
                stub.requests.append(
                    (self.path, self.headers.get("Content-Type", ""), body)
                )
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(stub.response)))
                self.end_headers()
                self.wfile.write(stub.response)

            def log_message(self, *a):  # silence test output
                pass

        super().__init__(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server_address[1]}"
        threading.Thread(target=self.serve_forever, daemon=True).start()


def _dead_host() -> str:
    # a port that was bound then closed: connection refused, never a
    # live service
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return f"http://127.0.0.1:{port}"


def test_store_to_elasticsearch_http_posts_bulk_body():
    stub = _EsStub({"errors": False, "items": []})
    try:
        s = _summary()
        payload = sinks.store_to_elasticsearch(
            s, "idx", hosts=[stub.url], run_id="r3"
        )
        path, ctype, body = stub.requests[0]
        assert path == "/_bulk"
        assert ctype == "application/x-ndjson"
        assert body.decode() == payload
        assert body.endswith(b"\n")  # bulk API requires trailing newline
    finally:
        stub.shutdown()


def test_store_to_elasticsearch_fails_over_to_next_host():
    stub = _EsStub({"errors": False})
    try:
        payload = sinks.store_to_elasticsearch(
            _summary(), "idx", hosts=[_dead_host(), stub.url], run_id="r4"
        )
        assert len(stub.requests) == 1  # dead node skipped, live one hit
        assert stub.requests[0][2].decode() == payload
    finally:
        stub.shutdown()


def test_store_to_elasticsearch_partial_bulk_failure_raises():
    # errors:true is an HTTP-200 response — the client must read the
    # body to notice (the reference's ES client does the same); a
    # partial failure is NOT retried on the next node (dup upserts)
    stub = _EsStub(
        {"errors": True, "items": [{"index": {"error": {"reason": "boom"}}}]}
    )
    fallback = _EsStub({"errors": False})
    try:
        with pytest.raises(RuntimeError, match="boom"):
            sinks.store_to_elasticsearch(
                _summary(), "idx", hosts=[stub.url, fallback.url], run_id="r5"
            )
        assert len(fallback.requests) == 0
    finally:
        stub.shutdown()
        fallback.shutdown()


def test_store_to_elasticsearch_all_hosts_dead_raises_connectionerror():
    with pytest.raises(ConnectionError, match="all ES hosts failed"):
        sinks.store_to_elasticsearch(
            _summary(), "idx", hosts=[_dead_host(), _dead_host()], run_id="r6"
        )


# ---------------------------------------------------------------------------
# live SMTP arm (DataCheckSummary.pm email delivery)
# ---------------------------------------------------------------------------


class _SmtpStub:
    """Just enough SMTP to accept one message: 220 greeting, 250 to
    every command, 354 for DATA, records the DATA payload."""

    def __init__(self):
        self.messages: list[bytes] = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.host = f"127.0.0.1:{self._srv.getsockname()[1]}"
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        conn, _ = self._srv.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 stub ESMTP\r\n")
        data_mode = False
        buf = []
        for line in f:
            if data_mode:
                if line.rstrip(b"\r\n") == b".":
                    self.messages.append(b"".join(buf))
                    conn.sendall(b"250 OK\r\n")
                    data_mode = False
                else:
                    buf.append(line)
            elif line.upper().startswith(b"DATA"):
                conn.sendall(b"354 go ahead\r\n")
                data_mode = True
            elif line.upper().startswith(b"QUIT"):
                conn.sendall(b"221 bye\r\n")
                break
            elif line.upper().startswith(b"EHLO"):
                # no extensions: plain 250, so smtplib stays on basic SMTP
                conn.sendall(b"250 stub\r\n")
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self._srv.close()


def test_email_summary_smtp_delivery():
    stub = _SmtpStub()
    msg = sinks.email_summary(
        _summary(n_fail=0),
        to=["dba@example.org"],
        smtp_host=stub.host,
        tag="rel42",
    )
    assert msg["Subject"] == "PASS: Datacheck Summary (rel42)"
    # the stub accepted exactly one DATA payload carrying the message
    for _ in range(100):
        if stub.messages:
            break
        import time

        time.sleep(0.02)
    assert len(stub.messages) == 1
    wire = stub.messages[0]
    assert b"Subject: PASS: Datacheck Summary (rel42)" in wire
    assert b"To: dba@example.org" in wire
    assert b"All datachecks have completed." in wire
