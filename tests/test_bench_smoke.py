"""Smoke tests: every bench suite runs end-to-end with --verify semantics
on the CPU backend at tiny sizes (kernels in interpret mode). Protects the
CLI from rot; the real numbers come from on-device runs (BENCHMARKS.md)."""
import pytest

from lsdradixsort_tpu.bench import runner


@pytest.mark.parametrize("suite", ["sort", "tile_sort", "shuffle",
                                   "histogram", "scan", "transpose",
                                   "query"])
def test_suite_runs_and_verifies(suite):
    records = runner.SUITES[suite](16, verify=True, sweep=False)
    assert records, f"suite {suite} produced no records"
    for rec in records:
        assert rec.verified in (True, None), rec.line()
        assert rec.device_ms > 0


def test_dist_suite_runs():
    records = runner.SUITES["dist"](13, verify=True, sweep=False)
    assert records and records[0].verified in (True, None)
