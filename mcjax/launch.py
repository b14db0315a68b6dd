"""Multi-process launcher / dryrun: ``python -m mcjax.launch --processes 2``.

Removes the reference's single-process ceiling (its host-mediated
``d_Eblocks`` reduction, kernel.cu:672-677, is the closest thing it has to a
communication backend). The launcher starts N localhost processes, each
contributing ``--devices-per-process`` virtual CPU devices; every process
runs the SAME single-controller program: build a global mesh spanning all
processes (mcjax.parallel.multihost.spatial_mesh), shard the cell grid over
it, and run the sharded checkerboard sweep — halo exchange crosses the
process boundary through the distributed runtime exactly as it would cross
DCN between pod slices.

Exit code 0 means every process finished with particle conservation and
live acceptance — the multi-host analogue of __graft_entry__.dryrun_multichip.

On a real pod there is no parent: run one process per host with
``--child --process-id $i --processes $N --coordinator host0:port`` (or let
the env vars / cluster auto-detection fill them in).
"""

from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys


def child_main(args) -> None:
    """One process of the multi-process dryrun (also the pod entrypoint)."""
    import jax

    # This box's sitecustomize force-registers a remote-TPU backend; the
    # dryrun must be CPU-hermetic (same reasoning as dryrun_multichip).
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mcjax.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.processes,
                         process_id=args.process_id,
                         local_device_count=args.devices_per_process)
    print(multihost.process_summary(), flush=True)

    import jax.numpy as jnp

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.parallel import mesh as pmesh

    n = 1024
    phi = 0.4
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 1.0)
    # half_cps divisible by every mesh axis (global device count is a
    # power of two here: factors are too)
    ndev = jax.device_count()
    cps -= cps % (2 * ndev)
    if cps < 4:
        raise ValueError("config too small for the global mesh")
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=4, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)

    mesh = multihost.spatial_mesh(("y", "x"))
    # identical host state in every process (deterministic from cfg.seed)
    st_host = init_state(cfg)
    st = multihost.make_global_state(cfg, st_host, mesh, ("y", "x"))
    run = pmesh.make_sharded_run_sweeps(cfg, pot, mesh, ("y", "x"),
                                        args.sweeps)
    st2, met = run(st)

    total = int(jax.jit(lambda x: jnp.sum(x))(st2.occ))
    accepted = int(jnp.sum(met.accepted))
    assert total == cfg.n_atoms, f"conservation violated: {total}"
    assert accepted > 0, "no accepted moves"
    print(f"process {jax.process_index()}: ok "
          f"(atoms {total}, accepted {accepted})", flush=True)
    jax.distributed.shutdown()


def parent_main(args) -> int:
    """Spawn N localhost children and aggregate their exit codes."""
    from mcjax.parallel.multihost import coordinator_on_localhost

    coord = args.coordinator or coordinator_on_localhost(args.port)
    procs = []
    for i in range(args.processes):
        cmd = [sys.executable, "-m", "mcjax.launch", "--child",
               "--process-id", str(i),
               "--processes", str(args.processes),
               "--devices-per-process", str(args.devices_per_process),
               "--coordinator", coord,
               "--sweeps", str(args.sweeps)]
        procs.append(subprocess.Popen(cmd, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
    rc = 0
    try:
        for p in procs:
            try:
                rc |= p.wait(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                rc |= 1
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    print("launch: " + ("ok" if rc == 0 else "FAILED"), flush=True)
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (default: localhost)")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--no-cpu", dest="cpu", action="store_false",
                    help="don't force the CPU backend (real pods)")
    args = ap.parse_args(argv)
    if args.child:
        child_main(args)
        return 0
    return parent_main(args)


if __name__ == "__main__":
    sys.exit(main())
