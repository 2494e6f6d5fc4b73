"""Falsifiable locks on the torch-vs-repo parity aggregates.

The round-4 verdict asked for the Rainbow statistical treatment --
n >= 8 seeds per side, mode-aware bands, a 2-SEM difference-of-means
test that could actually fail -- to be applied to DQN and HDQN
(VERDICT r4 item 3).  The aggregates live in docs/parity/*.json and are
produced by benchmarks/reference_torch_{dqn,hdqn,rainbow}.py
--aggregate over the per-seed runs in docs/parity/torch_*_seeds/
against the repo bands from examples/parity_{dqn,hdqn}.py --aggregate.

This test pins the CLAIMS, not the machinery: if a regenerated
aggregate ever drops below n=8, loses a metric, or lands a metric
outside 2 combined SEMs, the suite goes red -- making "parity" a
statement the CI actually checks rather than a JSON the docs assert.
(SEMs here are small enough to fail on a real shift: combined SEM_win
is ~0.005-0.012, so a 2.5% win-rate regression trips it.)
"""

import json
import os

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs", "parity")
METRICS = ("collision_rate", "win_rate", "reward")

# (file, algo, min torch seeds, min episodes/run, unimodal)
# Rainbow's 200-episode protocol matches the reference's own run length
# and its seeds split between racing/timeout equilibria, so its
# falsifiable claims are the WITHIN-MODE 2-SEM tests + the racing
# fraction, not the (bimodally wide) overall bands.
CASES = [
    ("reference_torch_runs.json", "dqn", 8, 2000, True),
    ("reference_torch_hdqn.json", "hdqn", 8, 2000, True),
    ("reference_torch_rainbow.json", "rainbow", 10, 200, False),
]


def _load(name):
    with open(os.path.join(DOCS, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("fname,algo,min_n,min_ep,unimodal", CASES,
                         ids=[c[1] for c in CASES])
def test_aggregate_has_enough_seeds(fname, algo, min_n, min_ep, unimodal):
    doc = _load(fname)
    runs = doc["runs"]
    assert len(runs) >= min_n, f"{algo}: {len(runs)} torch seeds < {min_n}"
    seeds = {r["seed"] for r in runs}
    assert len(seeds) == len(runs), f"{algo}: duplicate seeds in aggregate"
    for r in runs:
        assert r["episodes"] >= min_ep, f"{algo}: short run for seed {r['seed']}"


@pytest.mark.parametrize("fname,algo,min_n,min_ep,unimodal", CASES,
                         ids=[c[1] for c in CASES])
def test_torch_vs_repo_within_2sem(fname, algo, min_n, min_ep, unimodal):
    comp = _load(fname)["comparison"]
    for k in METRICS:
        c = comp[k]
        assert c["combined_sem"] > 0, f"{algo}/{k}: degenerate SEM"
        # The falsifiable claim: |mean_torch - mean_repo| <= 2 * SEM.
        assert c["within_2sem"] is True, (
            f"{algo}/{k}: abs_diff {c['abs_diff']:.4f} > "
            f"2 * SEM {c['combined_sem']:.4f}")
        if unimodal:
            # The SEM must be tight enough that the test CAN fail: a
            # metric shift of half its own size must exceed the band.
            scale = max(abs(c["reference_torch"]["mean"]), 1e-6)
            assert 2 * c["combined_sem"] < 0.5 * scale, (
                f"{algo}/{k}: band too wide to falsify anything")
    if not unimodal:
        # Bimodal (rainbow): the sharp claims are mode-aware.
        rf = comp["racing_fraction"]
        assert rf["abs_diff"] <= 0.2, f"{algo}: racing fractions diverge"
        within = comp["within_mode"]
        assert within, f"{algo}: no within-mode comparison"
        for mode, ms in within.items():
            for k, c in ms.items():
                if c["within_2sem"] is not None:
                    assert c["within_2sem"] is True, (
                        f"{algo}/{mode}/{k}: outside 2 SEM")


def test_repo_side_seed_counts():
    for name, min_n in (("seed_variance.json", 8),
                        ("hdqn_seed_variance.json", 8),
                        ("rainbow_seed_variance.json", 8)):
        doc = _load(name)
        n = doc["summary"].get("seeds") or len(doc.get("runs", []))
        assert n >= min_n, f"{name}: {n} repo seeds < {min_n}"
