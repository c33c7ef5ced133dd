"""Pipeline orchestration: the run_etl DAG with cascade skip.

Re-expresses analytics/etl/run_etl.py's orchestration semantics
(statuses OK / SKIP / IGNORE / ERREUR; a failed step marks its
dependents IGNORE — run_etl.py:206-224, load_facts.py:726-734) over
in-process Spark jobs instead of OS subprocesses. Each step is a
callable returning an optional row count; per-step isolation mirrors
the reference's per-table try/except (load_facts.py:749-772).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


@dataclass
class Step:
    name: str
    run: Callable[[], int | None]
    depends_on: Sequence[str] = ()


@dataclass
class StepResult:
    name: str
    status: str  # OK | SKIP | IGNORE | ERREUR
    rows: int | None = None
    duration: float = 0.0
    error: str = ""


@dataclass
class PipelineReport:
    results: list[StepResult] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(r.status in ("OK", "SKIP") for r in self.results)

    def as_dict(self) -> dict:
        return {
            "ok": self.ok,
            "steps": [
                {
                    "name": r.name,
                    "status": r.status,
                    "rows": r.rows,
                    "duration_sec": round(r.duration, 3),
                    "error": r.error,
                }
                for r in self.results
            ],
        }


def run_pipeline(
    steps: Sequence[Step], skip: Sequence[str] = ()
) -> PipelineReport:
    """Run steps in order; a step whose dependency did not succeed is
    IGNOREd (cascade skip), an explicitly skipped step is SKIP."""
    report = PipelineReport()
    status: dict[str, str] = {}
    for step in steps:
        if step.name in skip:
            status[step.name] = "SKIP"
            report.results.append(StepResult(step.name, "SKIP"))
            continue
        bad_dep = next(
            (d for d in step.depends_on if status.get(d) not in ("OK", "SKIP")),
            None,
        )
        if bad_dep is not None:
            status[step.name] = "IGNORE"
            report.results.append(
                StepResult(step.name, "IGNORE", error=f"dependency {bad_dep} failed")
            )
            continue
        t0 = time.time()
        try:
            rows = step.run()
        except Exception as exc:  # noqa: BLE001 - isolated per step
            status[step.name] = "ERREUR"
            report.results.append(
                StepResult(
                    step.name, "ERREUR", duration=time.time() - t0,
                    error=str(exc)[:500],
                )
            )
            continue
        status[step.name] = "OK"
        report.results.append(
            StepResult(step.name, "OK", rows=rows, duration=time.time() - t0)
        )
    return report
