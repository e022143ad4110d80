"""Worker process for the multi-host DP rehearsal test.

Usage: python mh_worker.py <process_id> <num_processes> <port> <devices_per_proc>

Each process owns ``devices_per_proc`` fake CPU devices; together they form
one global ``data`` mesh (gloo collectives over the distributed runtime —
the CPU stand-in for a DCN-spanning TPU slice). Runs ONE DP train step of
the tiny SVDFormer with each process feeding only its local shard via
``shard_host_local_batch`` and prints the resulting global loss — for BOTH
step implementations (train/state.py::make_train_step's mesh= switch):
GSPMD and the shard_map per-device body. One process pair covering both
legs shares the spawn, jax.distributed init, imports, and train-state init
that dominated the previous two-pair version's wall time (VERDICT r2
next #7).
"""

import os
import sys


def main() -> None:
    pid, nprocs, port, dpp = (int(a) for a in sys.argv[1:5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dpp}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np

    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.parallel import (
        make_mesh,
        replicated_sharding,
        shard_host_local_batch,
    )
    from svdformer_pointsea_tpu.train import create_train_state, make_train_step
    from svdformer_pointsea_tpu.train.state import make_optimizer

    n_global = nprocs * dpp
    assert len(jax.devices()) == n_global
    mesh = make_mesh()

    # Geometry mirrors test_multihost_dp_rehearsal's single-process
    # reference run; shrunk (512->256 pts etc.) because 8 fake devices on
    # one CPU serialize — the multi-process sharding semantics under test
    # are size-independent.
    model = SVDFormer(step1=2, step2=2, merge_points=32, local_points=32)
    B, N, res = n_global, 256, 16
    rng = np.random.RandomState(0)
    # The full global batch is derived from one seed everywhere; each
    # process contributes only its slice, as a real multi-host loader would.
    partial = rng.rand(B, N, 3).astype(np.float32)
    depth = rng.rand(B, 3, res, res).astype(np.float32)
    gt = rng.rand(B, 512, 3).astype(np.float32)
    lo, hi = pid * dpp, (pid + 1) * dpp
    local = {"partial": partial[lo:hi], "depth": depth[lo:hi], "gt": gt[lo:hi]}

    optimizer = make_optimizer()
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (jnp.asarray(partial[:1]), jnp.asarray(depth[:1])),
        optimizer,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_host_local_batch(local, mesh)

    from jax._src import distributed  # test-only use of the private client

    for impl in ("gspmd", "shard_map"):
        train_step = make_train_step(
            model, optimizer, donate=False,
            mesh=mesh if impl == "shard_map" else None,
        )
        # AOT-compile, then rendezvous at a coordination-service barrier
        # before executing: gloo's collective-context init times out after
        # 30 s, and on a loaded single-CPU host the two processes can finish
        # compiling minutes apart — executing without this barrier makes the
        # early process's gloo connect expire while the peer is still
        # compiling.
        args = (
            state,
            batch["partial"],
            batch["depth"],
            batch["gt"],
            jnp.float32(1e-4),
        )
        compiled = train_step.lower(*args).compile()
        distributed.global_state.client.wait_at_barrier(
            f"mh_worker_compiled_{impl}", 1_200_000
        )
        _, metrics = compiled(*args)
        # The loss is replicated (psum in-step): read the local shard
        # directly. float() on a multi-process global array goes through
        # process_allgather — an extra gloo clique whose 30 s context-init
        # flakes on a loaded single-CPU host.
        loss = float(np.asarray(metrics["loss"].addressable_data(0)))
        print(f"MHLOSS {impl} {pid} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
