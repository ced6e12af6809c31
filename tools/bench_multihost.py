"""Two-process jax.distributed throughput harness (localhost DCN analog).

Measures the multi-PROCESS scaling of the production workload — the
sharded scenario-parallel closed loop — with real `jax.distributed`
coordination (the same bring-up path a 2-host TPU pod uses over DCN),
instead of the thread-oversubscribed single-process CPU-mesh proxy in
``tools/bench_scaling_cpu.py``:

  python tools/bench_multihost.py [--batch 64] [--steps 40] [--procs 2]

Runs the workload under P=1 and P=2 processes (same per-process device
count, weak scaling: the global batch doubles with P) and reports

  - closed-loop solves/s at P=1 and P=2 and the process-boundary weak
    scaling efficiency  eff = T(2)/ (2 T(1)),
  - the measured cross-process psum latency on an EDMD-Gram-sized pytree
    (the one collective the production pipeline issues per fit), which is
    the genuinely new path a second host adds.

HONEST CAVEATS (read before quoting the numbers):
  * Both "processes" share one localhost CPU — compute oversubscription
    pushes the efficiency DOWN on small machines, and the "DCN" is a
    loopback gRPC socket, which pushes the collective latency UP versus
    real DCN NICs. The numbers bound the coordination overhead of the
    process boundary; they are NOT a 2-host TPU measurement (no such
    hardware is reachable here — see BENCHMARKS.md "Scaling evidence").
  * The closed loop itself has ZERO per-step cross-scenario collectives
    (time is sequential, scenarios are independent) — that structural
    fact, plus the measured psum cost at fit time, is the basis of the
    >=80%-at-2-hosts claim, and this harness checks the collective path
    end-to-end rather than proving TPU efficiency.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys, time, json
    sys.path.insert(0, os.environ["KX_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    nproc = int(os.environ["KX_NPROC"])
    rank = int(os.environ["KX_RANK"])
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["KX_COORD"],
            num_processes=nproc,
            process_id=rank,
        )
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as PS
    from jax.experimental import multihost_utils

    from koopmanx import configs as C
    from koopmanx.engine.scenario import sample_scenarios
    from koopmanx.parallel import sharded_closed_loop
    from koopmanx.run import build_pipeline
    from koopmanx.systems import get_system

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("data",))
    steps = int(os.environ["KX_STEPS"])
    b_local = int(os.environ["KX_LOCAL_BATCH"])  # per-process scenarios

    def trace(msg):
        print(f"[rank {rank}] {msg}", file=sys.stderr, flush=True)

    # co-run mode (independent workers, no jax.distributed): a file-system
    # barrier aligns the benchmark reps across workers so the parent can
    # take the minimum over PER-REP GLOBAL walls — combining independent
    # per-worker best-of-N minima (taken from different reps) made the
    # hardware-contention baseline optimistic and overstated the
    # process-boundary overhead (advisor finding, round 3)
    corun_dir = os.environ.get("KX_BARRIER_DIR", "")
    corun_world = int(os.environ.get("KX_WORLD", "1"))
    corun_rank = int(os.environ.get("KX_CORUN_RANK", "0"))

    def file_barrier(name):
        open(os.path.join(corun_dir, f"{name}.{corun_rank}"), "w").close()
        deadline = time.perf_counter() + 600.0
        while True:
            done = sum(
                os.path.exists(os.path.join(corun_dir, f"{name}.{r}"))
                for r in range(corun_world)
            )
            if done == corun_world:
                return
            if time.perf_counter() > deadline:
                raise RuntimeError(f"file barrier {name} timed out")
            time.sleep(0.002)

    def barrier(name):
        # coordination-service barrier (gRPC, minutes-scale timeout).
        # multihost_utils.sync_global_devices would spin up gloo, whose
        # 30 s key-exchange deadline trips when the peer process is still
        # jit-compiling (routinely > 30 s on a small shared CPU).
        trace(f"-> barrier {name}")
        if nproc > 1:
            from jax._src import distributed
            distributed.global_state.client.wait_at_barrier(name, 600_000)
        elif corun_dir and corun_world > 1:
            file_barrier(name)
        trace(f"<- barrier {name}")

    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.data = C.DataConfig(n_step=16, n_traj=16)
    pipe = build_pipeline(cfg)  # identical on every process (same seed)

    sc = sample_scenarios(
        get_system("duffing"), jax.random.PRNGKey(rank), batch=b_local,
        param_scale=0.15, dtype=jnp.float32,
    )
    rep = lambda v: jnp.broadcast_to(v, (b_local,) + v.shape)
    local_args = (
        jax.tree_util.tree_map(rep, pipe.params),
        sc.x0,
        jax.tree_util.tree_map(rep, pipe.model0),
        jax.tree_util.tree_map(rep, pipe.rls0),
        sc.theta0,
        sc.theta1,
    )
    barrier("built")  # align gloo bring-up after the slow pipeline build
    to_global = lambda x: multihost_utils.host_local_array_to_global_array(
        x, mesh, PS("data")
    )
    gargs = jax.tree_util.tree_map(to_global, local_args)

    def run():
        _, logs = sharded_closed_loop(pipe.closed_loop, mesh, *gargs)
        jax.block_until_ready(logs.x)
        return logs

    trace("compile/warm run")
    run()  # compile + warm
    # best-of-N: single timings on a 2-core shared host bounce +-20%
    # (background daemons, DRAM arbitration); the minimum is the stable
    # capacity estimate
    reps = int(os.environ.get("KX_REPS", "5"))
    rep_walls = []
    for r_i in range(reps):
        barrier(f"bench_start_{r_i}")
        t0 = time.perf_counter()
        logs = run()
        barrier(f"bench_end_{r_i}")  # global completion (no cross-proc collective in-loop)
        rep_walls.append(time.perf_counter() - t0)
    wall = min(rep_walls)
    b_global = b_local * nproc
    solves_per_s = b_global * steps / wall

    # ---- cross-process collective microbench: the EDMD Gram psum ----
    d = pipe.dictionary.nlift + 1  # lifted dim + m
    gram_local = jnp.ones((b_local, d, d), jnp.float32)
    gram_g = to_global(gram_local)

    @jax.jit  # jit outside shard_map: an un-jitted shard_map re-traces
    # per call (~100 ms), which would swamp the collective being measured
    @partial(jax.shard_map, mesh=mesh, in_specs=PS("data"), out_specs=PS())
    def gram_psum(v):
        return jax.lax.psum(jnp.sum(v, axis=0), "data")

    trace("compile gram_psum")
    jax.block_until_ready(gram_psum(gram_g))  # compile
    reps = 50
    barrier("psum_start")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = gram_psum(gram_g)
    jax.block_until_ready(out)
    psum_us = (time.perf_counter() - t0) / reps * 1e6

    # finiteness over the GLOBAL sharded log: must be a collective program
    # executed by EVERY process (np.asarray on a non-fully-addressable
    # array would hang/crash the printing rank while the peer exits)
    trace("finiteness collective")
    finite = bool(jax.jit(lambda v: jnp.isfinite(v).all())(logs.x))
    trace("finiteness done")

    if rank == 0:
        print(json.dumps({
            "procs": nproc,
            "devices_global": int(devs.size),
            "batch_global": b_global,
            "steps": steps,
            "wall_s": round(wall, 4),
            "rep_walls": [round(w, 4) for w in rep_walls],
            "solves_per_s": round(solves_per_s, 1),
            "gram_psum_us": round(psum_us, 1),
            "finite": finite,
        }))
    barrier("done")  # align shutdown so neither rank trips the 60 s
    # coordination shutdown-barrier while the other still runs
    if nproc > 1:
        jax.distributed.shutdown()  # explicit, aligned teardown: the atexit
        # hook fires at rank-dependent times and logs spurious barrier errors
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_config(nproc: int, local_batch: int, steps: int, dev_per_proc: int,
               pin_cores: bool = False, distributed: bool = True):
    """``distributed=False`` co-runs nproc INDEPENDENT single-process
    workers (no jax.distributed, no coordinator) — the hardware-contention
    baseline that separates shared-DRAM/core effects from the actual
    process-boundary (coordination + collective) overhead."""
    port = _free_port()
    env_base = {
        **os.environ,
        "KX_REPO": REPO,
        "KX_COORD": f"127.0.0.1:{port}",
        "KX_NPROC": str(nproc if distributed else 1),
        "KX_STEPS": str(steps),
        "KX_LOCAL_BATCH": str(local_batch),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={dev_per_proc}",
    }
    barrier_dir = None
    if not distributed and nproc > 1:
        # file barrier aligning reps across the independent co-run workers
        import tempfile

        barrier_dir = tempfile.mkdtemp(prefix="kx_corun_barrier_")
        env_base["KX_BARRIER_DIR"] = barrier_dir
        env_base["KX_WORLD"] = str(nproc)
    # stream each rank to its own log file: when one rank dies, the
    # coordination service kills the OTHERS with a generic barrier error —
    # the root cause is only in the failing rank's own stderr
    logdir = os.path.join(REPO, "logs")
    os.makedirs(logdir, exist_ok=True)
    procs, logs = [], []
    for rank in range(nproc):
        env = {**env_base, "KX_RANK": str(rank if distributed else 0),
               "KX_CORUN_RANK": str(rank)}
        tag = f"p{nproc}" if distributed else f"corun{nproc}"
        path = os.path.join(logdir, f"multihost_{tag}_r{rank}.log")
        f = open(path, "w")
        logs.append(path)
        cmd = [sys.executable, "-u", "-c", _WORKER]
        if pin_cores:
            # one dedicated core per rank: the FAIR weak-scaling setup
            # (resources per process constant as P grows) — without it
            # P=1 grabs every core and P=2 fights over them, understating
            # the process-boundary efficiency on small hosts
            cmd = ["taskset", "-c", str(rank)] + cmd
        procs.append(
            subprocess.Popen(
                cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
            )
        )
    failed = []
    for rank, p in enumerate(procs):
        try:
            p.wait(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            failed.append((rank, "timeout after 900s"))
            continue
        if p.returncode != 0:
            failed.append((rank, f"rc={p.returncode}"))
    if failed:
        msgs = []
        for rank, why in failed:
            with open(logs[rank]) as f:
                tail = f.read()[-2000:]
            msgs.append(f"--- rank {rank} ({why}) tail of {logs[rank]}:\n{tail}")
        raise RuntimeError("worker(s) failed:\n" + "\n".join(msgs))
    results = []
    for path in logs:
        r = None
        with open(path) as f:
            for line in f:
                if line.startswith("{"):
                    r = json.loads(line)
        results.append(r)
    if distributed or nproc == 1:
        return results[0]
    # co-run: reps are file-barrier-aligned across workers, so rep i of
    # every worker overlaps in time — the honest combined throughput is
    # min over reps of (total solves / the rep's GLOBAL wall = max across
    # workers). Taking max over independent per-worker best-of-N minima
    # (pre-round-4 behavior) mixed walls from different reps and could
    # flatter the contention baseline.
    total = sum(r["batch_global"] * r["steps"] for r in results)
    n_reps = min(len(r["rep_walls"]) for r in results)
    global_walls = [
        max(r["rep_walls"][i] for r in results) for i in range(n_reps)
    ]
    wall = min(global_walls)
    if barrier_dir:
        import shutil

        shutil.rmtree(barrier_dir, ignore_errors=True)
    return {
        "procs": nproc,
        "independent": True,
        "batch_global": sum(r["batch_global"] for r in results),
        "steps": results[0]["steps"],
        "wall_s": round(wall, 4),
        "rep_walls_global": [round(w, 4) for w in global_walls],
        "solves_per_s": round(total / wall, 1),
        "finite": all(r["finite"] for r in results),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64, help="per-process scenarios")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--dev-per-proc", type=int, default=1)
    ap.add_argument("--no-pin", action="store_true",
                    help="disable per-rank core pinning (the pre-r3, "
                         "oversubscribed measurement)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat the full (single, corun, multi) "
                         "measurement N times and report median +- IQR of "
                         "each efficiency — single runs on a shared host "
                         "bounce enough that a point estimate over-claims")
    args = ap.parse_args()

    pin = (not args.no_pin) and os.cpu_count() >= args.procs
    runs = []
    for rep in range(args.repeat):
        single = run_config(1, args.batch, args.steps, args.dev_per_proc,
                            pin_cores=pin)
        corun = run_config(args.procs, args.batch, args.steps,
                           args.dev_per_proc, pin_cores=pin,
                           distributed=False)
        multi = run_config(args.procs, args.batch, args.steps,
                           args.dev_per_proc, pin_cores=pin)
        eff = multi["solves_per_s"] / (args.procs * single["solves_per_s"])
        eff_hw = corun["solves_per_s"] / (args.procs * single["solves_per_s"])
        eff_boundary = multi["solves_per_s"] / corun["solves_per_s"]
        runs.append({
            "single_process": single,
            "independent_corun": corun,
            "multi_process": multi,
            "weak_scaling_efficiency": round(eff, 3),
            "hardware_contention_efficiency": round(eff_hw, 3),
            "process_boundary_efficiency": round(eff_boundary, 3),
        })
        if args.repeat > 1:
            print(json.dumps({"rep": rep, **{
                k: runs[-1][k] for k in (
                    "weak_scaling_efficiency",
                    "hardware_contention_efficiency",
                    "process_boundary_efficiency",
                )
            }}), flush=True)

    def med_iqr(key):
        import numpy as np

        v = np.asarray([r[key] for r in runs])
        q25, q50, q75 = np.percentile(v, [25, 50, 75])
        return {"median": round(float(q50), 3),
                "iqr": [round(float(q25), 3), round(float(q75), 3)],
                "min": round(float(v.min()), 3),
                "max": round(float(v.max()), 3),
                "n": len(runs)}

    out = dict(runs[-1])
    if args.repeat > 1:
        out["summary"] = {
            k: med_iqr(k) for k in (
                "weak_scaling_efficiency",
                "hardware_contention_efficiency",
                "process_boundary_efficiency",
            )
        }
    out["cores_pinned_per_rank"] = pin
    out["caveat"] = (
        "localhost CPU: shared cores depress efficiency, loopback gRPC "
        "inflates psum latency vs real DCN; this validates the "
        "jax.distributed collective path, it is not a TPU-pod number"
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
