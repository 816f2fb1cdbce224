"""MeshGraphNets trained on REAL flow data via a documented stand-in
(upgrades the round-3 "synthetic random graphs only" evidence gap).

DeepMind's cylinder_flow TFRecords need egress this environment doesn't
have (reference:fourierflow/builders/cylinder_flow.py). This builds a
cylinder_flow.h5-format dataset from the framework's own TPU-generated
Navier-Stokes velocity fields instead: nodes are a 32x32 sample of the
64^2 staggered-velocity grid (triangulated patch mesh, 1,922 cells),
node features are the true (vx, vy) at each node, targets are next-frame
velocity deltas at a 4-frame stride of the model cadence. The mesh is
fixed across samples (no padding needed; NodeType 0 interior / 6 on the
outer ring). Then the registry config `cylinder_flow/baseline` trains
UNCHANGED on it (same 15-layer/128-latent GraphProcessor, same budget:
10 epochs x 150 batches) and the 50-step rollout eval runs.

Absolute numbers are NOT comparable to the DeepMind benchmark (different
flow, no cylinder); what this demonstrates is the full MGN pipeline —
HDF5 splits -> graph build -> delta training -> scanned rollout —
learning real advective dynamics end to end. The persistence baseline
(predict zero delta) is reported for scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/mgn_standin.py --data-dir /root/data/mgn
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

STRIDE_SPACE = 2  # 64^2 -> 32x32 nodes
STRIDE_TIME = 4   # model-cadence frames -> training cadence (default; the
                  # round-5 run showed stride-4 deltas are so small that
                  # persistence is near-optimal — --stride-time 16 makes
                  # the one-step task non-trivial)


def _mesh(n):
    """Triangulated n x n grid patch: positions, cells, node types."""
    xs = np.linspace(0, 2 * np.pi, n, endpoint=False).astype(np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    pos = np.stack([gx.ravel(), gy.ravel()], axis=-1)  # [n*n, 2]
    idx = np.arange(n * n).reshape(n, n)
    a, b = idx[:-1, :-1].ravel(), idx[1:, :-1].ravel()
    c, d = idx[:-1, 1:].ravel(), idx[1:, 1:].ravel()
    cells = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]
    ).astype(np.int32)  # [2*(n-1)^2, 3]
    node_type = np.zeros(n * n, np.int32)
    ring = np.zeros((n, n), bool)
    ring[0], ring[-1], ring[:, 0], ring[:, -1] = True, True, True, True
    node_type[ring.ravel()] = 6  # WALL_BOUNDARY on the patch border
    return pos, cells, node_type


def build_h5(src, out, n_train, n_valid, n_test, stride_time=STRIDE_TIME):
    import h5py

    with h5py.File(src, "r") as f:
        vx = f["vx"][...]  # [S, T, 64, 64]
        vy = f["vy"][...]
    S = vx.shape[0]
    assert S >= n_train + n_valid + n_test, f"only {S} trajectories in {src}"
    n = vx.shape[-1] // STRIDE_SPACE
    pos, cells, node_type = _mesh(n)
    v = np.stack([vx, vy], axis=-1)[:, ::stride_time,
                                    ::STRIDE_SPACE, ::STRIDE_SPACE]
    v = v.reshape(S, v.shape[1], -1, 2).astype(np.float32)  # [S, T', N, 2]
    vel, tgt = v[:, :-1], v[:, 1:]
    splits = {
        "train": slice(0, n_train),
        "valid": slice(n_train, n_train + n_valid),
        "test": slice(n_train + n_valid, n_train + n_valid + n_test),
    }
    with h5py.File(out, "w") as f:
        for name, sl in splits.items():
            g = f.create_group(name)
            b = vel[sl].shape[0]
            g["velocity"] = vel[sl]
            g["target_velocity"] = tgt[sl]
            g["cells"] = np.broadcast_to(cells, (b,) + cells.shape).copy()
            g["mesh_pos"] = np.broadcast_to(pos, (b,) + pos.shape).copy()
            g["node_type"] = np.broadcast_to(node_type, (b, len(node_type))).copy()
            g["n_cells"] = np.full(b, len(cells), np.int32)
            g["n_nodes"] = np.full(b, len(pos), np.int32)
    print(f"[data] {out}: {S} traj -> {vel.shape[1]} steps x "
          f"{vel.shape[2]} nodes, {len(cells)} cells", flush=True)
    return vel, tgt, splits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/data/mgn")
    p.add_argument("--source", default="/root/data/li_ref/train_64_1.h5",
                   help="any generated 64^2 velocity trajectory file")
    p.add_argument("--n-train", type=int, default=24)
    p.add_argument("--n-valid", type=int, default=4)
    p.add_argument("--n-test", type=int, default=4)
    p.add_argument("--stride-time", type=int, default=STRIDE_TIME)
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args()

    os.makedirs(args.data_dir, exist_ok=True)
    h5_path = os.path.join(args.data_dir, "cylinder_flow.h5")
    vel, tgt, splits = build_h5(args.source, h5_path, args.n_train,
                                args.n_valid, args.n_test,
                                stride_time=args.stride_time)

    # Persistence baseline: one-step loss of predicting zero delta,
    # same normalization as MeshGraphNetRoutine._loss.
    deltas = (tgt - vel)[splits["test"]]
    persistence = float((0.5 * deltas**2).sum(-1).mean())
    # Persistence 50-step rollout under the valid_step convention (state
    # frozen at t=0, per-step target delta measured from that state).
    tv, v0 = tgt[splits["test"]][:, :50], vel[splits["test"]][:, 0]
    persistence_roll = float((0.5 * (tv - v0[:, None]) ** 2).sum(-1).mean())

    from fourierflow_tpu.commands import train as train_cmd

    t0 = time.time()
    trainer, _ = train_cmd.main(
        "cylinder_flow/baseline",
        overrides=[f"builder.path={h5_path}", *args.override],
        trial=0, force=True,
        config_dir=os.path.join(args.data_dir, "runs", "baseline"))
    out = {k: float(v) for k, v in trainer.logs.items() if np.ndim(v) == 0}
    out["persistence_one_step_loss"] = persistence
    out["persistence_rollout_loss"] = persistence_roll
    out["stride_time"] = args.stride_time
    out["wall_s"] = round(time.time() - t0, 1)
    out["standin_source"] = args.source
    with open(os.path.join(args.data_dir, "mgn_standin.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"[job] cylinder_flow/baseline on stand-in: train_loss "
          f"{out.get('train_loss', float('nan')):.4f}, 50-step rollout test_loss "
          f"{out.get('test_loss', float('nan')):.4f}, persistence {persistence:.4f} "
          f"({out['wall_s']:.0f}s)", flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
