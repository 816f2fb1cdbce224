"""Collect round-3 chip-campaign artifacts into RESULTS-ready tables.

Reads (whatever exists):
  /root/data/torus_li/study.json    — torus_li trial/attribution study
  /root/data/kol3d/kol3d_results.json — 3D probe + generate + train
  /root/data/li_ref2/li_reference_trial0.json — LI reference protocol
  /root/data/torus_vis/study.json   — torus_vis conditioning study

Prints markdown fragments for RESULTS.md. Safe to run anytime (skips
missing files); no TPU access.
"""

import json
import os

import numpy as np

DATA = os.environ.get("FFTPU_DATA", "/root/data")


def load(path):
    p = os.path.join(DATA, path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def torus_li():
    r = load("torus_li/study.json")
    if not r:
        return
    print("### torus_li trials (shared native dataset, registry configs)\n")
    print("| job | test rollout N-MSE | mean rho | time_until | wall |")
    print("|---|---|---|---|---|")
    for name, row in sorted(r.items()):
        print(f"| {name} | {row.get('test_loss', float('nan')):.4f} "
              f"| {row.get('test_mean_rho', float('nan')):.4f} "
              f"| {row.get('test_time_until', float('nan')):.1f} "
              f"| {row.get('wall_s', 0) / 60:.0f} min |")
    for model in ("ffno24", "fno4"):
        losses = [v["test_loss"] for k, v in r.items()
                  if k.startswith(f"{model}_trial")]
        if losses:
            print(f"\n{model}: test_loss {np.mean(losses):.4f} ± "
                  f"{np.std(losses):.4f} (n={len(losses)})")
    pairs = []
    for t in range(5):
        a, b = f"ffno24_trial{t}", f"fno4_trial{t}"
        if a in r and b in r:
            pairs.append(1 - r[a]["test_loss"] / r[b]["test_loss"])
    if pairs:
        print(f"reduction: {np.mean(pairs) * 100:.1f}% ± "
              f"{np.std(pairs) * 100:.1f}% over {len(pairs)} paired trials")
    for t in range(2):
        a, b = f"ffno24_dt2e-5_trial{t}", f"fno4_dt2e-5_trial{t}"
        if a in r and b in r:
            print(f"dt2e-5 ablation trial {t}: reduction "
                  f"{(1 - r[a]['test_loss'] / r[b]['test_loss']) * 100:.1f}%")
    print()


def kol3d():
    r = load("kol3d/kol3d_results.json")
    if not r:
        return
    print("### 3D Kolmogorov on chip\n")
    for k, v in r.items():
        print(f"- {k}: {v}")
    print()


def li_ref():
    for trial in range(3):
        r = (load(f"li_ref2/li_reference_trial{trial}.json")
             or load(f"li_ref/li_reference_trial{trial}.json"))
        if not r:
            continue
        print(f"### LI reference protocol trial {trial}\n")
        for k in ("train_loss", "valid_loss", "valid_rho",
                  "valid_reduced_time_until", "control_reduced_time_until",
                  "control_rho", "train_time_s", "step_size", "aborted"):
            if k in r:
                print(f"- {k}: {r[k]}")
        corr = r.get("valid_correlations")
        ctrl = r.get("control_correlations")
        times = r.get("valid_times")
        if corr and times:
            idx = [0, 4, 9, 19, 39, 69, 99]
            print("| t (sim-s) | " + " | ".join(f"{times[i]:.1f}" for i in idx
                                                if i < len(times)) + " |")
            print("|---|" + "---|" * len([i for i in idx if i < len(times)]))
            print("| learned rho | " + " | ".join(
                f"{corr[i]:.3f}" for i in idx if i < len(corr)) + " |")
            if ctrl:
                print("| unlearned rho | " + " | ".join(
                    f"{ctrl[i]:.3f}" for i in idx if i < len(ctrl)) + " |")
        print()


def torus_vis():
    r = load("torus_vis/study.json")
    if not r:
        return
    print("### torus_vis conditioning study (24-layer, reference budgets)\n")
    print("| config | test rollout N-MSE | test corr | time_until | wall |")
    print("|---|---|---|---|---|")
    for name, row in r.items():
        print(f"| {name} | {row.get('test_loss', float('nan')):.4f} "
              f"| {row.get('test_corr', float('nan')):.4f} "
              f"| {row.get('test_time_until', float('nan')):.2f} "
              f"| {row.get('wall_s', 0) / 60:.0f} min |")
    print()


if __name__ == "__main__":
    torus_li()
    kol3d()
    li_ref()
    torus_vis()
