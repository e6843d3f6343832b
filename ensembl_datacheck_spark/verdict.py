"""Verdict model: the engine's analogue of the reference's TAP stream.

Reference semantics reproduced here (see SURVEY.md §2.6):

* a check emits an ordered list of named assertions, each ok/fail/skip
  (reference BaseCheck.pm:149-190 captures TAP; pass = every assertion ok,
  BaseCheck.pm:184-186);
* a check body that raises becomes a *failed* check with the error as
  diagnostic, never a crash of the run (BaseCheck.pm:131-139);
* failing zero-checks carry at most MAX_DIAG_ROWS=10 diagnostic rows
  (Test/DataCheck.pm:47,163-178) — the full violation set is persisted to
  the violations table instead of being collected;
* checks are critical or advisory (BaseCheck.pm:74-78);
* skip carries a reason (BaseCheck.pm:158-168).
"""

from __future__ import annotations

import enum
import json
import time
from dataclasses import dataclass, field
from typing import Any

MAX_DIAG_ROWS = 10  # reference Test/DataCheck.pm:47


class Status(str, enum.Enum):
    OK = "ok"
    FAIL = "fail"
    SKIP = "skip"


class Severity(str, enum.Enum):
    CRITICAL = "critical"  # reference DATACHECK_TYPE 'critical'
    ADVISORY = "advisory"  # reference DATACHECK_TYPE 'advisory'


@dataclass
class AssertionResult:
    """One TAP `ok`/`not ok` line equivalent."""

    name: str
    status: Status
    expected: Any = None
    got: Any = None
    diag: list[Any] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.status in (Status.OK, Status.SKIP)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "status": self.status.value,
            "expected": self.expected,
            "got": self.got,
            "diag": [str(d) for d in self.diag[:MAX_DIAG_ROWS]],
        }


@dataclass
class CheckResult:
    """Aggregated result of one check run (one TAP subtest equivalent)."""

    check_name: str
    assertions: list[AssertionResult] = field(default_factory=list)
    skip_reason: str | None = None
    error: str | None = None
    started: float = field(default_factory=time.time)
    finished: float | None = None
    n_rows_checked: int = 0
    n_violations: int = 0
    # per-bucket violation counts, when the check computed them itself in
    # its own aggregation (saves the runner a second pass over violations)
    partition_violations: dict[int, int] = field(default_factory=dict)
    # critical|advisory, copied from the CheckSpec by the runner
    # (BaseCheck.pm:74-78); advisory failures don't gate the exit code
    severity: str = "critical"

    @property
    def status(self) -> Status:
        # error-in-check = fail, not crash (BaseCheck.pm:131-139)
        if self.error is not None:
            return Status.FAIL
        if self.skip_reason is not None:
            # a mid-check skip (after some assertions ran) still aborts
            # the subtest: the TAP skip_all semantics — partial passes
            # must not masquerade as a full OK, but recorded failures
            # still count as failures
            # (a.ok is already True for SKIP assertions, so this counts
            # only genuine FAILs)
            if any(not a.ok for a in self.assertions):
                return Status.FAIL
            return Status.SKIP
        if not self.assertions:
            # a body that asserted nothing is a vacuous run, not a pass
            # (Test::More: "No tests run!" is a failure)
            return Status.FAIL
        if all(a.ok for a in self.assertions):
            return Status.OK
        return Status.FAIL

    @property
    def passed(self) -> bool:
        return self.status in (Status.OK, Status.SKIP)

    def finish(self) -> CheckResult:
        if self.finished is None:
            self.finished = time.time()
        return self

    @property
    def runtime(self) -> float:
        return (self.finished or time.time()) - self.started

    def to_dict(self) -> dict[str, Any]:
        return {
            "check_name": self.check_name,
            "severity": self.severity,
            "status": self.status.value,
            "skip_reason": self.skip_reason,
            "error": self.error,
            "runtime_sec": round(self.runtime, 3),
            "n_rows_checked": self.n_rows_checked,
            "n_violations": self.n_violations,
            "assertions": [a.to_dict() for a in self.assertions],
        }

    def to_tap(self, test_number: int | None = None) -> str:
        """TAP-ish text rendering (information parity with the reference's
        TAP output — name, ok/not ok, skip reason, diagnostics, plan line —
        not byte-format parity; see SURVEY.md §7.4).  ``test_number``
        numbers the top-level line so a multi-check report has
        sequential, plan-matching test ids (skips included)."""
        num = "" if test_number is None else f" {test_number}"
        lines = [f"# Subtest: {self.check_name}"]
        if (self.skip_reason is not None and not self.assertions
                and self.status == Status.SKIP):
            # status guard: skip_reason + error together resolve to FAIL
            # (error wins) — rendering that as 'ok ... # SKIP' would make
            # TAP consumers count a failing check as a pass, contradicting
            # the JSON report and the exit code
            lines.append(f"ok{num} - {self.check_name} # SKIP {self.skip_reason}")
        else:
            for i, a in enumerate(self.assertions, 1):
                prefix = "ok" if a.ok else "not ok"
                skip_note = a.diag[0] if a.diag else "skipped"
                suffix = f" # SKIP {skip_note}" if a.status == Status.SKIP else ""
                lines.append(f"    {prefix} {i} - {a.name}{suffix}")
                if not a.ok:
                    if a.expected is not None or a.got is not None:
                        lines.append(f"    # expected: {a.expected} got: {a.got}")
                    for d in a.diag[:MAX_DIAG_ROWS]:
                        lines.append(f"    # {d}")
            lines.append(f"    1..{len(self.assertions)}")
            mark = "ok" if self.passed else "not ok"
            # a mid-check skip (assertions ran, then the body skipped)
            # surfaces its reason on the subtest line — but NEVER on a
            # failed check: TAP consumers honor SKIP directives as
            # non-failures, which would contradict the exit code
            note = (
                f" # SKIP (mid-check) {self.skip_reason}"
                if self.skip_reason is not None and self.status == Status.SKIP
                else ""
            )
            lines.append(f"{mark}{num} - {self.check_name}{note}")
        if self.error:
            lines.append(f"# ERROR: {self.error}")
        return "\n".join(lines)


@dataclass
class RunSummary:
    """Funnel-level aggregate (reference DataCheckFunnel.pm:47-51,
    DataCheckSummary.pm:36-109): counts of passed / failed / skipped plus
    total runtime, rendered to JSON."""

    results: list[CheckResult] = field(default_factory=list)

    @property
    def n_passed(self) -> int:
        return sum(1 for r in self.results if r.status == Status.OK)

    @property
    def n_failed(self) -> int:
        return sum(1 for r in self.results if r.status == Status.FAIL)

    @property
    def n_skipped(self) -> int:
        return sum(1 for r in self.results if r.status == Status.SKIP)

    @property
    def all_passed(self) -> bool:
        return self.n_failed == 0

    @property
    def wall_runtime(self) -> float:
        """max(finished) − min(started): the run's true wall time.
        Summing per-check runtimes over-counts shared work — every fused
        check carries the single shared scan's duration, and
        thread-parallel checks overlap."""
        if not self.results:
            return 0.0
        start = min(r.started for r in self.results)
        end = max(r.finished or r.started for r in self.results)
        return max(end - start, 0.0)

    def to_dict(self, failures_only: bool = False) -> dict[str, Any]:
        # failures-only default mirrors ConvertTapToJson.pm:40-48
        results = [
            r.to_dict()
            for r in self.results
            if not failures_only or r.status == Status.FAIL
        ]
        return {
            "passed": self.n_passed,
            "failed": self.n_failed,
            "skipped": self.n_skipped,
            "wall_runtime_sec": round(self.wall_runtime, 3),
            # per-check runtimes summed (over-counts shared/parallel
            # work; kept for per-check accounting parity)
            "total_runtime_sec": round(sum(r.runtime for r in self.results), 3),
            "datachecks": results,
        }

    def to_json(self, failures_only: bool = False, indent: int = 2) -> str:
        return json.dumps(self.to_dict(failures_only=failures_only), indent=indent)
