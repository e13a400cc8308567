"""Real 2-process jax.distributed test (multi-host DP on CPU controllers).

The reference has no distributed support at all (SURVEY.md §2 parallelism
census); this pins OUR multi-host design (parallel/sharding.py): coordinator
bring-up through initialize_distributed, a global mesh spanning processes,
per-host input sharding (pipeline.py TrainLoader + put_global), gradient
all-reduce across controllers, and process-0-gated checkpoint writes — by
actually launching two controller processes (tests/mp_worker.py) against a
shared synthetic dataset and comparing their results.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_tree(root: str) -> None:
    # exactly patch-sized (32x32): host-side crop randomness — the ONLY
    # per-host (topology-dependent) randomness in the pipeline — becomes a
    # no-op, making epoch batches bit-identical across process counts for
    # the cross-process-count resume leg below
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/Derain/rainy", exist_ok=True)
    os.makedirs(f"{root}/Derain/gt", exist_ok=True)
    os.makedirs(f"{root}/manifests/rainy", exist_ok=True)
    clean = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    rain = np.clip(clean.astype(int) + rng.integers(0, 60, clean.shape),
                   0, 255).astype(np.uint8)
    Image.fromarray(rain).save(f"{root}/Derain/rainy/rain-0.png")
    Image.fromarray(clean).save(f"{root}/Derain/gt/norain-0.png")
    with open(f"{root}/manifests/rainy/rainTrain.txt", "w") as f:
        f.write("rainy/rain-0.png\n")


def test_four_process_distributed_training(tmp_path):
    """4 controllers x 1 device each (VERDICT r3 #6): >2-party rendezvous,
    the strided per-host index split at pc=4, gradient all-reduce across
    four processes, and lead-only writes with three non-leads racing.
    Same global program as the 2-process test (4 devices, global batch 4)."""
    tree = str(tmp_path / "tree")
    out = str(tmp_path / "out")
    os.makedirs(out)
    _make_tree(tree)
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(ROOT, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "4", coord, tree, out,
             "1", "1"],  # 1 local device, per-host batch 1
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("4-process workers timed out")
        outs.append(stdout)
    for p, stdout in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    results = []
    for pid in range(4):
        with open(os.path.join(out, f"result_p{pid}.json")) as f:
            results.append(json.load(f))

    # identical post-epoch params on ALL four controllers
    for r in results[1:]:
        assert r["t_checksum"] == results[0]["t_checksum"]
        assert r["f_checksum"] == results[0]["f_checksum"]
    assert np.isfinite(results[0]["t_loss"])

    # checkpoint + log written by process 0 only, three racing non-leads
    assert results[0]["ckpt_written"]
    assert not any(r["ckpt_written"] for r in results[1:])
    for pid in range(1, 4):
        d = os.path.join(out, f"ckpt_p{pid}")
        assert not os.path.isdir(d) or not os.listdir(d)
    assert os.path.getsize(os.path.join(out, "log_p0.jsonl")) > 0


def test_two_process_distributed_training(tmp_path):
    tree = str(tmp_path / "tree")
    out = str(tmp_path / "out")
    os.makedirs(out)
    _make_tree(tree)
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    worker = os.path.join(ROOT, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord, tree, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(stdout)
    for p, stdout in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    results = []
    for pid in (0, 1):
        with open(os.path.join(out, f"result_p{pid}.json")) as f:
            results.append(json.load(f))

    # identical post-epoch params on both controllers (all-reduced grads
    # over per-host batches)
    assert results[0]["t_checksum"] == results[1]["t_checksum"]
    assert results[0]["f_checksum"] == results[1]["f_checksum"]
    assert np.isfinite(results[0]["t_loss"])

    # checkpoint written by process 0 only
    assert results[0]["ckpt_written"] and not results[1]["ckpt_written"]
    assert os.listdir(os.path.join(out, "ckpt_p0"))
    assert not os.path.isdir(os.path.join(out, "ckpt_p1")) or \
        not os.listdir(os.path.join(out, "ckpt_p1"))

    # process-0-gated logging: only the lead's JSONL has events
    lead_log = os.path.join(out, "log_p0.jsonl")
    assert os.path.exists(lead_log) and os.path.getsize(lead_log) > 0

    # ---- cross-process-count resume (the one resume topology the
    # single-process tests can't cover): the SAME epoch-1 checkpoint from
    # the 2-process run above continues for one epoch BOTH 2-process
    # (2 local devices x per-host batch 2) and 1-process (4 devices x
    # batch 4). Global batch content is topology-invariant (see mp_worker
    # docstring), so the continuations must agree to collective reduction
    # order.
    ckpt = os.path.join(out, "ckpt_p0", "latest.npz")
    assert os.path.exists(ckpt)

    def _run_resume(nproc: int, n_local: int, batch: int) -> None:
        coord = f"127.0.0.1:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), coord, tree,
                 out, str(n_local), str(batch), ckpt],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for pid in range(nproc)
        ]
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail(f"resume workers (nproc={nproc}) timed out")
            assert p.returncode == 0, f"resume worker failed:\n{stdout[-4000:]}"

    _run_resume(2, 2, 2)
    _run_resume(1, 4, 4)

    with np.load(os.path.join(out, "resumed_np2.npz")) as a, \
            np.load(os.path.join(out, "resumed_np1.npz")) as b:
        assert list(a.files) == list(b.files)
        worst = 0.0
        for k in a.files:
            x, y = a[k].astype(np.float64), b[k].astype(np.float64)
            denom = np.abs(x).max() + 1e-12
            worst = max(worst, float(np.abs(x - y).max() / denom))
        # identical batches + identical math; only the grad all-reduce's
        # summation order may differ between 1 and 2 processes
        assert worst < 1e-5, f"cross-process-count resume drift: {worst:.3e}"
