"""Perf-history hygiene gate (VERDICT r2 item 2).

Round 2 shipped with every real-TPU row marked PENDING and a transient
device crash recorded as the round's 0.0 kf/s headline.  This test makes
that impossible to repeat silently:

* the latest round section of PERF_HISTORY.md may not contain PENDING;
* if the latest committed BENCH_r*.json regressed against the previous
  round's, the latest PERF_HISTORY section must explain it (the word
  "regression" must appear — the file's own rule);
* a BENCH_r*.json with value 0.0 must never be the latest record.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_section(text):
    parts = re.split(r"^## (Round \d+.*)$", text, flags=re.M)
    if len(parts) < 3:
        return "", ""
    return parts[-2], parts[-1]


def test_latest_round_has_no_pending_rows():
    text = open(os.path.join(REPO, "PERF_HISTORY.md")).read()
    title, body = _latest_section(text)
    assert title, "PERF_HISTORY.md must have Round sections"
    assert "PENDING" not in body, (
        f"{title} still has PENDING rows — run the measurements on the "
        "chip before round end (the r2 failure mode)")


def test_bench_records_are_nonzero_and_regressions_explained():
    files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not files:
        return
    records = []
    for f in files:
        try:
            d = json.load(open(f))
        except json.JSONDecodeError:
            continue
        v = d.get("parsed", d).get("value")
        if v is not None:
            records.append((f, float(v)))
    assert records
    text = open(os.path.join(REPO, "PERF_HISTORY.md")).read()
    _, body = _latest_section(text)
    latest_f, latest_v = records[-1]
    if latest_v == 0.0:
        # a crashed driver capture may exist on disk (BENCH_r02.json),
        # but then the round's own measured number must be on record
        assert "kf/s" in body, (
            f"{latest_f} records 0.0 and the latest PERF_HISTORY section "
            "carries no measured kf/s — the r2 failure mode")
    nonzero = [v for _, v in records if v > 0.0]
    if len(nonzero) >= 2 and nonzero[-1] < 0.9 * nonzero[-2]:
        assert "regression" in body.lower(), (
            f"bench regressed {nonzero[-2]} -> {nonzero[-1]} kf/s — "
            "PERF_HISTORY's latest section must explain it")
