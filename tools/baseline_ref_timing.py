#!/usr/bin/env python3
"""Measure the reference pipeline's silver+gold wall time (BASELINE.md).

Runs the REFERENCE'S OWN functions (proj-eng-dados/main.py
process_bronze_to_silver / process_silver_to_gold) over its committed
bronze layer (477k rows), with the silver/gold sinks redirected to a
temp dir so the read-only checkout is never written. Driver-side
measurement tool (pandas/pyarrow are harness-side deps, not engine
deps); the repo-side twin is `sbt "runMain graft.BaselineGastos"`.

Usage: python3 tools/baseline_ref_timing.py [runs]
"""
import importlib.util
import os
import pathlib
import shutil
import sys
import tempfile
import time

REF_MAIN = "/root/reference/proj-eng-dados/main.py"


def load_reference():
    # main.py raises at import without an API token; silver+gold never
    # use it (no network), so a dummy satisfies the import-time check.
    os.environ.setdefault("API_TOKEN", "offline-baseline-timing")
    # The committed bronze mixes all-null (float NaN) and string pages in
    # data_pagamento, so the reference's INFORMATIONAL EDA print
    # (df['data_pagamento'].min()) raises TypeError on pandas 2.x
    # object-dtype reduction. Fall back to a string min/max for that one
    # print so the measured stages (clean, gate, write, aggregate) run
    # unmodified reference code.
    import pandas as pd

    for name in ("min", "max"):
        orig = getattr(pd.Series, name)

        def patched(self, *a, _orig=orig, _name=name, **k):
            try:
                return _orig(self, *a, **k)
            except TypeError:
                nn = self.dropna().astype(str)
                return getattr(nn, _name)() if len(nn) else float("nan")

        setattr(pd.Series, name, patched)
    spec = importlib.util.spec_from_file_location("refmain", REF_MAIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def time_once(mod):
    out = pathlib.Path(tempfile.mkdtemp(prefix="ref-baseline-"))
    try:
        mod.SILVER_PATH = out / "silver"
        mod.GOLD_PATH = out / "gold"
        mod.SILVER_PATH.mkdir(parents=True)
        mod.GOLD_PATH.mkdir(parents=True)
        t0 = time.monotonic()
        mod.process_bronze_to_silver()
        t1 = time.monotonic()
        mod.process_silver_to_gold()
        t2 = time.monotonic()
        n_gold = sum(1 for _ in mod.GOLD_PATH.rglob("*.parquet"))
        assert n_gold > 0, "gold produced no parquet files - run failed"
        return t1 - t0, t2 - t1
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mod = load_reference()
    results = [time_once(mod) for _ in range(runs)]
    best = min(results, key=sum)
    for i, (s, g) in enumerate(results):
        print(f"run {i}: silver={s:.2f}s gold={g:.2f}s total={s + g:.2f}s")
    print(
        '{"reference_silver_s": %.2f, "reference_gold_s": %.2f, '
        '"reference_total_s": %.2f, "rows_bronze": 477000, "runs": %d}'
        % (best[0], best[1], best[0] + best[1], runs)
    )


if __name__ == "__main__":
    main()
