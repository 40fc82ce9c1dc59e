"""Memory-regression guard, mirroring the reference's RSS tail-growth
caps (/root/reference/python/tests/test_memory_regression.py:38-62).

At web scale a leaky kernel wedges long-lived Python workers; repeated
full extractions over the same documents must not grow RSS beyond a
small tail allowance.
"""

import gc
import os

import pytest


def _rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.mark.parametrize("mode", ["accuracy", "fast"])
def test_rss_tail_growth(mode):
    from zpdfspark import fixtures
    from zpdfspark.kernel import Document

    pdfs = [fixtures.big(60, seed=i)[0] for i in range(5)]
    # warm: first runs populate allocator pools / import caches
    for pdf in pdfs:
        Document(pdf).extract_all(mode)
    gc.collect()
    base = _rss_mb()
    for _ in range(20):
        for pdf in pdfs:
            Document(pdf).extract_all(mode)
    gc.collect()
    growth = _rss_mb() - base
    # reference cap: accuracy tail growth <= 80 MB over 20 runs
    assert growth <= 80, f"RSS tail growth {growth:.1f} MB over 20 runs"
