"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each OS process owns 2 CPU devices; the 4-device mesh spans both processes,
so every psum / ppermute in the sharded BA and ring matcher actually crosses
the process boundary (the DCN analog).  Exercises
tpusfm.parallel.mesh.initialize_distributed — the multi-host entry point.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""
import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

from tpusfm.parallel import mesh as mesh_mod

mesh_mod.initialize_distributed(coordinator=coordinator,
                                num_processes=num_procs, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpusfm.ba import bundle_adjust as ba
from tpusfm.parallel import dist_ba, ring_match

n_dev = len(jax.devices())
assert n_dev == 2 * num_procs, f"expected {2*num_procs} global devices, got {n_dev}"
mesh = mesh_mod.make_mesh(n_dev)


def to_global(x, spec):
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


# --- deterministic consistent BA problem (identical in both processes) -----
rng = np.random.default_rng(42)
C, Pts = 8, 60
intr = np.tile([120.0, 120, 40, 30, 0, 0, 0], (C, 1)).astype(np.float32)
rot_gt = rng.normal(scale=0.02, size=(C, 3)).astype(np.float32)
t_gt = np.concatenate([rng.normal(scale=0.1, size=(C, 2)),
                       np.full((C, 1), 5.0)], 1).astype(np.float32)
pts_gt = rng.uniform(-1, 1, size=(Pts, 3)).astype(np.float32)


def aa_rot(aa, X):
    th = np.linalg.norm(aa) + 1e-12
    k = aa / th
    return (X * np.cos(th) + np.cross(k, X) * np.sin(th)
            + k * (k @ X) * (1 - np.cos(th)))


obs = []
for ci in range(C):
    for pi in range(Pts):
        Xc = aa_rot(rot_gt[ci], pts_gt[pi]) + t_gt[ci]
        obs.append((ci, pi, 120.0 * Xc[0] / Xc[2] + 40.0,
                    120.0 * Xc[1] / Xc[2] + 30.0))
obs = np.asarray(obs, np.float32)
O = -(-len(obs) // n_dev) * n_dev
pad = O - len(obs)
ocam = np.concatenate([obs[:, 0].astype(np.int32), np.zeros(pad, np.int32)])
opt = np.concatenate([obs[:, 1].astype(np.int32), np.zeros(pad, np.int32)])
ouv = np.concatenate([obs[:, 2:4] + rng.normal(scale=0.3, size=(len(obs), 2)).astype(np.float32),
                      np.zeros((pad, 2), np.float32)]).astype(np.float32)
omask = np.arange(O) < len(obs)
rot0 = rot_gt + rng.normal(scale=0.01, size=(C, 3)).astype(np.float32)
t0 = t_gt + rng.normal(scale=0.03, size=(C, 3)).astype(np.float32)
pts0 = pts_gt + rng.normal(scale=0.05, size=(Pts, 3)).astype(np.float32)

cfg = ba.BAConfig(max_iters=6, cg_iters=10)

# --- sharded solve across the 2-process mesh -------------------------------
out = dist_ba.bundle_adjust_sharded(
    mesh,
    to_global(intr, P()), to_global(rot0, P()), to_global(t0, P()),
    to_global(np.ones(C, bool), P()),
    to_global(pts0, P()), to_global(np.ones(Pts, bool), P()),
    to_global(ocam, P("shard")), to_global(opt, P("shard")),
    to_global(ouv, P("shard")), to_global(omask, P("shard")),
    cfg=cfg,
)
jax.block_until_ready(out)
rot_sh = np.asarray(out[1].addressable_data(0))
t_sh = np.asarray(out[2].addressable_data(0))
pts_sh = np.asarray(out[3].addressable_data(0))
fc_sh = float(np.asarray(out[4]["final_cost"].addressable_data(0)))
ic_sh = float(np.asarray(out[4]["initial_cost"].addressable_data(0)))

# --- single-device reference (local computation, same data) ----------------
ref = ba.bundle_adjust(
    jnp.asarray(intr), jnp.asarray(rot0), jnp.asarray(t0), jnp.ones(C, bool),
    jnp.asarray(pts0), jnp.ones(Pts, bool), jnp.asarray(ocam),
    jnp.asarray(opt), jnp.asarray(ouv), jnp.asarray(omask), cfg=cfg,
)
fc_ref = float(ref[4]["final_cost"])

assert fc_sh < 0.5 * ic_sh, f"sharded BA did not optimize: {ic_sh} -> {fc_sh}"
assert abs(fc_sh - fc_ref) <= 0.02 * max(fc_ref, 1e-6), (
    f"sharded final cost {fc_sh} != single-device {fc_ref}")
np.testing.assert_allclose(rot_sh, np.asarray(ref[1]), atol=5e-4)
np.testing.assert_allclose(t_sh, np.asarray(ref[2]), atol=2e-3)
np.testing.assert_allclose(pts_sh, np.asarray(ref[3]), atol=5e-3)

# --- ring matching across the process boundary -----------------------------
V, N, D = n_dev * 2, 16, 32
desc = rng.normal(size=(V, N, D)).astype(np.float32)
ridx, rok = ring_match.ring_match_all_pairs(
    mesh, to_global(desc, P("shard")), to_global(np.ones((V, N), bool), P("shard")))
jax.block_until_ready((ridx, rok))
ridx_np = np.asarray(ridx.addressable_data(0)) if pid == 0 else None

if pid == 0:
    # Spot-check one cross-process pair (view 0 on proc 0 vs view V-1 whose
    # shard lives on proc 1) against local brute-force matching.
    from tpusfm.matching import match as match_mod
    li, lok = match_mod.match_descriptors(
        jnp.asarray(desc[0]), jnp.asarray(desc[V - 1]),
        jnp.ones(N, bool), jnp.ones(N, bool), ratio=0.8, cross_check=False)
    # ridx rows are the local shard (views 0..V/num_procs-1 on proc 0).
    np.testing.assert_array_equal(
        ridx_np[0, V - 1][np.asarray(lok)], np.asarray(li)[np.asarray(lok)])

print(f"MULTIHOST_WORKER_OK pid={pid} ba {ic_sh:.2f}->{fc_sh:.2f} "
      f"(ref {fc_ref:.2f})", flush=True)
