"""Multi-host SPMD correctness: 2 localhost processes × 4 virtual CPU
devices (jax.distributed + gloo) must produce identical replicated
state on both processes, AND match a single-process emulation of the
same per-host sampling on the in-process 8-device mesh.

This is the no-TPU-pod stand-in for BASELINE.md's ≥2-host scaling
target: it proves the process-spanning mesh, the host-sharded data
pipeline, and the cross-process gradient psum are correct; real pods
only change the transport (ICI/DCN instead of gloo/localhost).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")

STEPS = 3
BATCH = 32


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # keep only the repo on the path: .axon_site would re-register the
    # TPU backend inside the workers
    env["PYTHONPATH"] = REPO
    return env


@pytest.fixture(scope="module")
def worker_results():
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--steps", str(STEPS), "--batch_size", str(BATCH)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.strip().splitlines()
                if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    return sorted(outs, key=lambda r: r["process_id"])


class TestMultiProcess:
    def test_two_processes_span_one_mesh(self, worker_results):
        r0, r1 = worker_results
        assert r0["process_count"] == r1["process_count"] == 2
        assert r0["n_devices"] == r1["n_devices"] == 8

    def test_replicated_state_agrees_across_processes(self, worker_results):
        r0, r1 = worker_results
        np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
        np.testing.assert_allclose(r0["param_sum"], r1["param_sum"],
                                   rtol=1e-6)

    def test_matches_single_process_emulation(self, worker_results):
        """Same per-host sampling emulated on the in-process 8-device
        mesh must reproduce the 2-process losses/params."""
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        try:
            from distributed_worker import build_tiny_problem
        finally:
            sys.path.pop(0)
        from ibl_nerf_tpu.parallel import distributed as dist

        (rcfg, lcfg, phase, optimizer, consts, state, arrays,
         h, w) = build_tiny_problem()

        mesh = dist.global_mesh()
        assert mesh.devices.size == 8
        samplers = [
            dist.HostShardedSampler(arrays, mesh, BATCH, h, w,
                                    process_index=p, process_count=2)
            for p in range(2)
        ]
        rays_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("rays"))

        def sample_global(i):
            locals_ = [s.sample_local(i) for s in samplers]
            pixel_info = {
                k: jax.device_put(
                    np.concatenate([np.asarray(loc[0][k])
                                    for loc in locals_]), rays_sh)
                for k in locals_[0][0]
            }
            rays_o = jax.device_put(
                np.concatenate([np.asarray(loc[1]) for loc in locals_]),
                rays_sh)
            rays_d = jax.device_put(
                np.concatenate([np.asarray(loc[2]) for loc in locals_]),
                rays_sh)
            return pixel_info, rays_o, rays_d

        step_fn, place_state = dist.make_global_train_step(
            rcfg, lcfg, phase, optimizer, consts, BATCH,
            prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
        state = place_state(state)

        losses = []
        for i in range(STEPS):
            pixel_info, rays_o, rays_d = sample_global(i)
            key = jax.random.fold_in(jax.random.key(7), i)
            state, scalars = step_fn(state, key, pixel_info, rays_o, rays_d)
            losses.append(float(scalars["loss_total"]))

        param_sum = float(sum(
            np.abs(np.asarray(x)).sum()
            for x in jax.tree.leaves(state.variables)))

        r0 = worker_results[0]
        np.testing.assert_allclose(losses, r0["losses"], rtol=2e-5)
        np.testing.assert_allclose(param_sum, r0["param_sum"], rtol=1e-4)

    def test_full_train_loop_two_processes(self, tmp_path):
        """The actual train driver end-to-end across 2 processes: both
        join one mesh, process 0 writes metrics/checkpoints/summary."""
        sys.path.insert(0, os.path.join(REPO, "tests"))
        try:
            from make_synthetic_scene import make_scene
        finally:
            sys.path.pop(0)
        scene_dir = make_scene(str(tmp_path / "scene"))
        logbase = str(tmp_path / "logs")

        port = _free_port()
        procs = []
        for pid in range(2):
            argv = [
                sys.executable, "-m", "ibl_nerf_tpu.cli.train",
                "--datadir", scene_dir, "--basedir", logbase,
                "--expname", "mp",
                "--dataset_type", "mitsuba",
                "--netdepth", "2", "--netwidth", "32",
                "--N_rand", "16", "--N_samples", "8", "--N_importance", "8",
                "--N_iter", "12", "--coarse_radiance_number", "2",
                "--N_iter_ignore_approximated_radiance", "4",
                "--N_iter_ignore_prior", "100000",
                "--calculating_normal_type",
                "normal_map_from_depth_gradient_epsilon",
                "--i_weights", "10", "--i_testset", "100000",
                "--summary_step", "4", "--use_viewdirs",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
            ]
            procs.append(subprocess.Popen(
                argv, env=_worker_env(), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True, cwd=REPO))
        for p in procs:
            try:
                out, err = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, f"train worker failed:\n{err[-4000:]}"

        logdir = os.path.join(logbase, "mp")
        assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
        assert os.path.exists(os.path.join(logdir,
                                           "train_info_step_time.json"))
        assert os.path.isdir(os.path.join(logdir, "ckpt_000010"))
        with open(os.path.join(logdir, "metrics.jsonl")) as f:
            recs = [json.loads(ln) for ln in f]
        assert all(np.isfinite(r["loss_total"]) for r in recs)

    def test_host_shard_slicing(self):
        """Each host sees a disjoint image shard; K is shared."""
        from ibl_nerf_tpu.parallel.distributed import _slice_host_arrays

        arrays = {
            "images": np.arange(5 * 2 * 2 * 3, dtype=np.float32
                                ).reshape(5, 2, 2, 3),
            "prefiltered_images": np.zeros((2, 5, 2, 2, 3), np.float32),
            "poses": np.stack([np.eye(4, dtype=np.float32)] * 5),
            "K": np.eye(3, dtype=np.float32),
        }
        s0 = _slice_host_arrays(arrays, 0, 2)
        s1 = _slice_host_arrays(arrays, 1, 2)
        assert s0["images"].shape[0] == 3 and s1["images"].shape[0] == 2
        assert s0["prefiltered_images"].shape[1] == 3
        np.testing.assert_array_equal(s0["K"], arrays["K"])
        # disjoint cover
        all_rows = np.concatenate([s0["images"], s1["images"]])
        assert all_rows.shape[0] == 5
