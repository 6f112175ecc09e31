"""Worker for tests/test_multihost.py::test_cli_two_process: runs the REAL
CLI entry (train.run) as one of N jax.distributed processes on the CPU
backend, exactly per the documented launch recipe (JAX_* env vars +
tpu.multihost=True + shared checkpoint.dir)."""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, root = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mh_env import force_cpu_backend

    force_cpu_backend(2)
    # the documented launch recipe [README "Multi-host"]
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fixtures
    import train as train_cli

    cfg = fixtures.make_config(root, "Gwilliams2022")
    cfg.epochs = 1
    cfg.batch_size = 8
    cfg.updates = 2
    cfg.D1 = 16
    cfg.D2 = 16
    cfg.K = 4
    cfg.F = 16
    cfg.preprocs.last4layers = False
    cfg.split_mode = "shallow"
    cfg.reproducible = False  # exercises the shared-seed broadcast
    cfg.set_path("gwilliams.num_subjects", 2)
    cfg.set_path("gwilliams.num_sessions", 2)
    cfg.set_path("gwilliams.num_tasks", 2)
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.set_path("tpu.multihost", True)
    cfg.set_path("checkpoint.dir", os.path.join(root, "shared_ckpts"))
    train_cli.run(cfg)

    assert jax.process_count() == nproc
    print(f"RESULT {json.dumps({'pid': pid, 'ok': True})}", flush=True)


if __name__ == "__main__":
    main()
