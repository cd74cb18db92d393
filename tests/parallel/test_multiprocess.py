"""REAL multi-process (multi-host analogue) runs via jax.distributed.

Spawns two fresh Python processes that form a 2-process JAX cluster over
localhost (Gloo) with one CPU device each, then solves a decomposed PDE with
trackers/storage — executing the controller's process-0 tracker protocol,
interrupt-time broadcast, status propagation, and per-interrupt host gather
for real (the unit tests in test_controller_depth.py mock these). The TPU
analogue is a multi-host pod slice; the reference's equivalent is its
`mpiexec -n 2` CI lane (`/root/reference/pde/solvers/controller.py:146-342`).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]

WORKER = """
import json, os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
jax.config.update("jax_enable_x64", True)
import numpy as np
import pde_tpu as pde

grid = pde.UnitGrid([16, 16], periodic=True)
field = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
eq = pde.DiffusionPDE(0.1)

# reference trajectory computed redundantly on every process (no sharding)
ref = eq.solve(field, t_range=0.03, dt=1e-3, tracker=None)

# decomposed run with host-side trackers (process-0 protocol + host gather)
calls = []
storage = pde.MemoryStorage()
tracker = [pde.CallbackTracker(lambda s, t: calls.append(t), interrupts=0.01),
           storage.tracker(0.01)]
result, info = eq.solve(field, t_range=0.03, dt=1e-3, tracker=tracker,
                        decomposition=[2, 1], ret_info=True)

# the returned state is host-replicated on EVERY process
final = np.asarray(result.data)
out = {
    "proc": proc_id,
    "maxdiff": float(np.max(np.abs(final - np.asarray(ref.data)))),
    "tracker_calls": len(calls),
    "storage_frames": len(storage),
    "frame_shape": list(np.asarray(storage[0].data).shape) if len(storage) else None,
    "successful": bool(info["controller"]["successful"]),
}

# gather_mode="main": interrupt state is fetched to process 0 only; client
# processes skip the host copy and get None back (the reference's client
# ranks return None too, `solvers/controller.py:300`)
storage_m = pde.MemoryStorage()
res_m, info_m = eq.solve(field, t_range=0.03, dt=1e-3,
                         tracker=storage_m.tracker(0.01),
                         decomposition=[2, 1], gather_mode="main",
                         ret_info=True)
if proc_id == 0:
    out["main_maxdiff"] = float(
        np.max(np.abs(np.asarray(res_m.data) - np.asarray(ref.data)))
    )
    out["main_frames"] = len(storage_m)
else:
    out["main_result_none"] = res_m is None
out["main_successful"] = bool(info_m["controller"]["successful"])

# a mid-run abort on process 0 must propagate successful=False to clients
def abort(state, t):
    if t > 0.005:
        raise StopIteration("abort for test")

_, info2 = eq.solve(field, t_range=0.03, dt=1e-3,
                    tracker=pde.CallbackTracker(abort, interrupts=0.005),
                    decomposition=[2, 1], ret_info=True)
out["abort_successful"] = bool(info2["controller"]["successful"])

# an abort at the FINAL tracker interrupt must propagate too (the while-else
# path has its own status broadcast)
def abort_final(state, t):
    if t >= 0.03 - 1e-9:
        raise StopIteration("final abort")

_, info3 = eq.solve(field, t_range=0.03, dt=1e-3,
                    tracker=pde.CallbackTracker(abort_final, interrupts=0.03),
                    decomposition=[2, 1], ret_info=True)
out["final_abort_successful"] = bool(info3["controller"]["successful"])

# adaptive dt (pmax error sync inside the compiled loop) across processes
ref_ad = eq.solve(field, t_range=0.02, dt=1e-3, solver="runge-kutta",
                  adaptive=True, tracker=None)
res_ad = eq.solve(field, t_range=0.02, dt=1e-3, solver="runge-kutta",
                  adaptive=True, tracker=None, decomposition=[2, 1])
out["adaptive_maxdiff"] = float(
    np.max(np.abs(np.asarray(res_ad.data) - np.asarray(ref_ad.data)))
)

# SDE stepping across processes (per-shard decorrelated noise; finite)
eq_sde = pde.DiffusionPDE(0.1, noise=0.01)
res_sde = eq_sde.solve(field, t_range=0.01, dt=1e-3, tracker=None,
                       decomposition=[2, 1])
out["sde_finite"] = bool(np.all(np.isfinite(np.asarray(res_sde.data))))

# RADIAL decomposition across processes: each process's shard slices its own
# r-coefficients from the global arrays (grids.base.axis_coords_traced)
polar = pde.PolarSymGrid(1.0, 32)
pfield = pde.ScalarField.random_uniform(polar, rng=np.random.default_rng(1))
ref_rad = eq.solve(pfield, t_range=0.02, dt=1e-4, tracker=None)
res_rad = eq.solve(pfield, t_range=0.02, dt=1e-4, tracker=None,
                   decomposition=[2])
out["radial_maxdiff"] = float(
    np.max(np.abs(np.asarray(res_rad.data) - np.asarray(ref_rad.data)))
)
print("RESULT:" + json.dumps(out), flush=True)
"""


def test_two_process_distributed_run(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": str(REPO_ROOT),
        "PDE_TPU_DISABLE_FUSED": "1",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO_ROOT, env=env,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out)
    finally:
        # never leave orphan jax.distributed workers holding the
        # coordinator port (a hung handshake would wedge later runs)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for p, out in zip(procs, outputs, strict=True):
        assert p.returncode == 0, out[-2000:]

    results = {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("RESULT:"):
                r = json.loads(line[len("RESULT:"):])
                results[r["proc"]] = r
    assert set(results) == {0, 1}, outputs

    for proc, r in results.items():
        # decomposed trajectory matches the redundant serial one bit for bit
        assert r["maxdiff"] == 0.0, r
        assert r["successful"] is True, r
        # process 0's abort status propagates to the client
        assert r["abort_successful"] is False, r
        # adaptive dt (pmax sync) stays bit-identical too; SDE runs finite
        assert r["adaptive_maxdiff"] == 0.0, r
        assert r["sde_finite"] is True, r
        # radial decomposition across processes stays bit-identical
        assert r["radial_maxdiff"] == 0.0, r
        # final-interrupt aborts propagate their status too
        assert r["final_abort_successful"] is False, r
    # gather_mode="main": full-resolution result on process 0, None on clients
    assert results[0]["main_maxdiff"] == 0.0, results[0]
    assert results[0]["main_frames"] > 0, results[0]
    assert results[1]["main_result_none"] is True, results[1]
    assert all(r["main_successful"] for r in results.values())
    # trackers and storage run on process 0 only, on full-resolution data
    assert results[0]["tracker_calls"] > 0
    assert results[1]["tracker_calls"] == 0
    assert results[0]["storage_frames"] > 0
    assert results[0]["frame_shape"] == [16, 16]
    assert results[1]["storage_frames"] == 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
