"""Shared statistics for the torch-vs-repo parity aggregates.

The round-4 Rainbow upgrade (mode-aware bands + a falsifiable 2-SEM
difference-of-means test, VERDICT r3 item 3) lived only in
benchmarks/reference_torch_rainbow.py; round 5 applies the same
machinery to the DQN and HDQN harnesses (VERDICT r4 item 3) through
this module so the statistics have one definition.

A "run" dict needs: collision_rate, win_rate, reward, episodes,
env_steps, seed.  Mode = racing vs timeout equilibrium, split on mean
episode length (reference_torch_rainbow.py's TIMEOUT_MODE_STEPS
rationale; for DQN/HDQN-vs-L0 all seeds historically land in the
racing mode and the mode machinery degrades gracefully to the plain
bands).
"""

import numpy as np

TIMEOUT_MODE_STEPS = 1250
METRICS = ("collision_rate", "win_rate", "reward")


def mode_of(r):
    return ("timeout" if r["env_steps"] / max(r["episodes"], 1)
            > TIMEOUT_MODE_STEPS else "racing")


def band(vals):
    return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
            "min": float(np.min(vals)), "max": float(np.max(vals)),
            "n": len(vals),
            "sem": float(np.std(vals) / np.sqrt(max(len(vals), 1)))}


def bands(rs):
    return {k: band([r[k] for r in rs]) for k in METRICS}


def by_mode(runs):
    modes = {m: [r for r in runs if mode_of(r) == m]
             for m in ("racing", "timeout")}
    return {
        "racing_fraction": len(modes["racing"]) / len(runs),
        "racing": bands(modes["racing"]) if modes["racing"] else None,
        "timeout": bands(modes["timeout"]) if modes["timeout"] else None,
    }, modes


def comparison(summary, runs, repo_doc):
    """Torch-vs-repo comparison block: the historical 2-sigma band test
    plus the falsifiable 2-SEM difference-of-means test, overall and
    within-mode (cf. reference_torch_rainbow.aggregate)."""
    repo = repo_doc["summary"]
    repo_runs = repo_doc.get("runs", [])
    out = {}
    for k in METRICS:
        ref_m, ref_s, n_ref = (summary[k]["mean"], summary[k]["std"],
                               summary[k]["n"])
        rep_m, rep_s = repo[k]["mean"], repo[k]["std"]
        n_rep = repo.get(k, {}).get("n") or repo.get("seeds", len(repo_runs))
        comb = float(np.hypot(ref_s, rep_s))
        sem = float(np.hypot(ref_s / np.sqrt(n_ref),
                             rep_s / np.sqrt(max(n_rep, 1))))
        out[k] = {
            "reference_torch": {"mean": ref_m, "std": ref_s, "n": n_ref},
            "repo_faithful": {"mean": rep_m, "std": rep_s, "n": n_rep},
            "abs_diff": abs(ref_m - rep_m),
            "combined_std": comb,
            "within_2sigma": bool(abs(ref_m - rep_m) <= 2 * comb),
            "combined_sem": sem,
            "within_2sem": bool(abs(ref_m - rep_m) <= 2 * sem),
        }
    tmodes = {m: [r for r in runs if mode_of(r) == m]
              for m in ("racing", "timeout")}
    if repo_runs and all("env_steps" in r for r in repo_runs):
        rf_t = len(tmodes["racing"]) / len(runs)
        rf_r = sum(mode_of(r) == "racing" for r in repo_runs) / len(repo_runs)
        out["racing_fraction"] = {
            "reference_torch": rf_t, "repo_faithful": rf_r,
            "abs_diff": abs(rf_t - rf_r),
        }
        rmodes = {m: [r for r in repo_runs if mode_of(r) == m]
                  for m in ("racing", "timeout")}
        within = {}
        for m in ("racing", "timeout"):
            if not tmodes[m] or not rmodes[m]:
                continue
            tb, rb = bands(tmodes[m]), bands(rmodes[m])
            within[m] = {}
            for k in METRICS:
                sem = float(np.hypot(tb[k]["sem"], rb[k]["sem"]))
                within[m][k] = {
                    "reference_torch": {"mean": tb[k]["mean"],
                                        "n": tb[k]["n"]},
                    "repo_faithful": {"mean": rb[k]["mean"],
                                      "n": rb[k]["n"]},
                    "abs_diff": abs(tb[k]["mean"] - rb[k]["mean"]),
                    "combined_sem": sem,
                    "within_2sem": bool(
                        abs(tb[k]["mean"] - rb[k]["mean"]) <= 2 * sem)
                    if sem > 0 else None,
                }
        out["within_mode"] = within
    return out


def aggregate_doc(runs, repo_doc, what):
    """Full parity document: bands, mode split, torch-vs-repo tests."""
    runs = sorted(runs, key=lambda r: r["seed"])
    summary = bands(runs)
    modes, _ = by_mode(runs)
    doc = {
        "what": what,
        "runs": [{k: v for k, v in r.items() if k != "curves"}
                 for r in runs],
        "summary": summary,
        "by_mode": modes,
        "comparison": (comparison(summary, runs, repo_doc)
                       if repo_doc else None),
    }
    return doc
